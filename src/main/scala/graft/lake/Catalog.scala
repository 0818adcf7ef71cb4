package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Name → location catalog abstraction over graft tables. The reference
  * makes the catalog pluggable (`catalog_type = 'pg' | 'rest'`,
  * pg_lakehouse_iceberg/README.md:30-36; catalog_bridge.cpp dispatches on
  * it) — graft mirrors that split: the catalog owns ONLY the name→location
  * mapping; all data/metadata IO goes straight to the location through the
  * Hadoop FS API, so any backing service scales independently of table
  * size. Implementations: [[GraftCatalog]] (warehouse directory),
  * [[RestCatalog]] (HTTP service).
  */
trait Catalog {
  def spark: SparkSession

  /** Location of `name` (whether or not the table exists yet). */
  def tableLocation(name: String): String
  def exists(name: String): Boolean
  def list(): Seq[String]
  /** Drops the table: its files AND its catalog entry. */
  def drop(name: String): Boolean

  /** Renames `from` to `to` — a user-visible lifecycle op the reference
    * exposes as pg_catalog_rename_table (catalog_bridge.h:115-120). On a
    * location-assigning catalog (REST) this is a pure registry change —
    * the data/metadata location does NOT move, the new name simply
    * resolves to it (how real lakehouse catalogs rename); the directory
    * catalog, whose names ARE locations, moves the directory. Fails
    * loudly when `from` is missing or `to` exists; the decision is
    * atomic against racing renames/creates of `to`. */
  def rename(from: String, to: String): Unit

  /** Commit arbiter for `name`: when defined, [[GraftTable]] routes its
    * COMMIT POINT through the catalog's atomic compare-and-swap of the
    * version pointer instead of a filesystem rename. Required on object
    * stores — S3-class rename is copy+delete and does not fail on an
    * existing destination, so two racing committers could both "win" a
    * renamed version file (the reference's target deployment is exactly
    * such storage, pg_lakehouse_iceberg/README.md:7-8, src/io/s3_io.c;
    * its PG incarnation arbitrates through PG transactions,
    * commit_ops.c:41-86). None = FS-rename atomicity, correct for
    * HDFS-class stores and local paths. */
  def arbiter(name: String): Option[CommitArbiter] = None

  /** Reserves `name` in the catalog and returns the location to build it
    * at (directory catalogs derive it; a service may assign it). */
  protected def register(name: String): String

  /** register() for sibling-package callers (the DSv2 SQL catalog builds
    * the table itself after reserving the name). */
  private[lake] def reserve(name: String): String = register(name)

  def create(
      name: String,
      df: DataFrame,
      partitionBy: Seq[String] = Nil,
      keyColumns: Seq[String] = Nil): GraftTable =
    GraftTable.create(spark, register(name), df, partitionBy, keyColumns,
      arbiter = arbiter(name))

  def table(name: String): GraftTable =
    GraftTable.load(spark, tableLocation(name), arbiter(name))

  /** Atomically advance SEVERAL tables' version pointers: every commit
    * applies, or none does (one synchronized multi-key CAS server-side).
    * This is the cross-table half of the reference's "full transactional
    * support across lakehouse and local tables" (README.md:14-16), which
    * its PG incarnation inherits from the PG transaction manager wrapping
    * commit_ops.c — here the CATALOG is the transaction arbiter, so the
    * guarantee survives object stores. Only catalogs that arbitrate
    * commits can offer it. */
  def commitAll(commits: Seq[TableCommit]): Boolean =
    throw new UnsupportedOperationException(
      "multi-table transactions need a commit-arbitrating catalog (e.g. RestCatalog)")

  /** Multi-table transaction: `ops` runs against handles whose commits
    * STAGE instead of publishing; `transact` then CASes every touched
    * table's pointer in one [[commitAll]] call. If ANY table's pointer
    * moved underneath (a racing writer), nothing is published and the
    * whole transaction re-runs against fresh metadata — tables never
    * advance independently, so a reader can never observe the ingest
    * without the retire. Data files written by a lost attempt are
    * unreferenced and reclaimed by `vacuum()` (same posture as a lost
    * single-table commit retry). */
  def transact(names: Seq[String], maxAttempts: Int = 5)(
      ops: Map[String, GraftTable] => Unit): Unit = {
    require(names.nonEmpty && names.distinct.size == names.size,
      s"transact needs distinct table names, got $names")
    require(names.forall(arbiter(_).isDefined),
      "transact needs a commit-arbitrating catalog (e.g. RestCatalog)")
    var attempt = 0
    while (true) {
      attempt += 1
      val handles = names.map { n =>
        n -> GraftTable.loadStaged(spark, tableLocation(n), arbiter(n),
          new StagingBuffer)
      }
      ops(handles.toMap)
      val commits = handles.flatMap { case (n, t) =>
        t.writeStagedBlob().map { case (exp, nv, file) =>
          TableCommit(n, exp, nv, file)
        }
      }
      if (commits.isEmpty) return // ops staged nothing: vacuous success
      if (commitAll(commits)) return
      handles.foreach(_._2.discardStaged())
      if (attempt >= maxAttempts)
        sys.error(s"multi-table transaction on $names lost the commit race " +
          s"$maxAttempts times")
    }
  }
}

/** One table's pointer advance inside a multi-table transaction. */
case class TableCommit(
    name: String,
    expectedVersion: Long,
    newVersion: Long,
    metadataFile: String)

/** Atomic version-pointer arbitration for one table — the catalog-side
  * half of an object-store-safe commit protocol. The committer writes its
  * metadata blob to a nonce-named (collision-free, create-only) path and
  * then calls [[commitVersion]]; the arbiter's compare-and-swap IS the
  * commit point, so storage rename semantics never matter. Readers resolve
  * the current blob through [[currentVersion]] instead of listing. */
trait CommitArbiter {
  /** CAS: record (`newVersion`, `metadataFile`) as current iff the
    * currently recorded version is `expectedVersion` (or nothing is
    * recorded yet — the first arbitrated commit of a table). Returns
    * false when another committer advanced the pointer first. */
  def commitVersion(expectedVersion: Long, newVersion: Long, metadataFile: String): Boolean
  /** The committed (version, table-relative metadata file), if recorded. */
  def currentVersion(): Option[(Long, String)]
}
