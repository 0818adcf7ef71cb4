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
}

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
