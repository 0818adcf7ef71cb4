package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Warehouse-directory catalog: maps table names to locations under one
  * root, one directory per table. The Spark-side analog of the reference's
  * PG-backed Iceberg catalog (pg_lakehouse_iceberg/src/catalog/
  * pg_catalog.cpp:46-340 create/stage/commit/lookup, catalog_bridge.cpp) —
  * minus the SQL transaction layer, which GraftTable's optimistic metadata
  * rename replaces. Listing is an O(tables) directory scan on the driver.
  */
class GraftCatalog(val spark: SparkSession, warehouse: String) extends Catalog {
  private val root = new Path(warehouse)
  private val fs = root.getFileSystem(spark.sessionState.newHadoopConf())

  override def tableLocation(name: String): String = s"$warehouse/$name"

  /** directory catalogs derive the location; existence IS registration */
  override protected def register(name: String): String = tableLocation(name)

  override def exists(name: String): Boolean =
    fs.exists(new Path(new Path(root, name), "metadata"))

  override def drop(name: String): Boolean = fs.delete(new Path(root, name), true)

  /** Name IS location here, so rename moves the directory — atomic on
    * HDFS-class stores (the same atomicity class this catalog's
    * FS-rename commit point already assumes; object stores use
    * [[RestCatalog]], whose rename is a registry CAS). The move itself
    * uses `FileContext.rename` with `Options.Rename.NONE`, which FAILS
    * when the destination exists — a plain check-then-`fs.rename` would,
    * on a racing create of `to`, move `from` INTO the new directory as a
    * nested table instead of failing (ADVICE r10). The pre-checks stay
    * for clean error messages; the rename is the atomic arbiter. */
  override def rename(from: String, to: String): Unit = {
    require(exists(from), s"catalog: no table '$from'")
    require(!fs.exists(new Path(root, to)), s"catalog: table '$to' already exists")
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      root.toUri, spark.sessionState.newHadoopConf())
    try fc.rename(fc.makeQualified(new Path(root, from)),
      fc.makeQualified(new Path(root, to)))
    catch {
      case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
        throw new IllegalArgumentException(
          s"catalog: table '$to' already exists (lost a racing rename)", e)
      case e: java.io.IOException =>
        throw new IllegalStateException(
          s"catalog: rename '$from' -> '$to' failed: ${e.getMessage}", e)
    }
  }

  override def list(): Seq[String] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).filter(_.isDirectory).map(_.getPath.getName)
      .filter(exists).sorted.toSeq

  /** Registers every catalog table (plus `<name>__snapshots` /
    * `<name>__files` metadata tables) as temp views, so the whole
    * warehouse is queryable from `spark.sql` — the SQL-access analog of
    * the reference's catalog lookup feeding its table AM
    * (pg_catalog.cpp:204-260).
    *
    * Data views are defined THROUGH the DataSourceV2 catalog
    * (`SELECT * FROM <v2cat>.<name>`), so each query re-resolves the
    * table and reads the CURRENT snapshot — commits after registration
    * are immediately visible (the r02 snapshot-at-registration staleness
    * is gone). Metadata views stay snapshot-at-registration: they
    * describe table state, and pinning the state they describe is the
    * useful semantic. */
  def registerViews(): Unit = {
    // sanitized path + hash: distinct warehouses get distinct catalog
    // names (hashCode alone can collide and silently repoint views)
    val v2cat = "graft_v2_" +
      warehouse.replaceAll("[^A-Za-z0-9]", "_").takeRight(40) + "_" +
      Integer.toHexString(warehouse.hashCode)
    spark.conf.set(s"spark.sql.catalog.$v2cat",
      classOf[graft.lake.sql.GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$v2cat.warehouse", warehouse)
    list().foreach { name =>
      val t = table(name)
      spark.sql(s"CREATE OR REPLACE TEMP VIEW $name AS SELECT * FROM $v2cat.`$name`")
      t.snapshots.createOrReplaceTempView(s"${name}__snapshots")
      t.files().createOrReplaceTempView(s"${name}__files")
    }
  }
}
