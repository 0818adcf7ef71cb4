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
class GraftCatalog(spark: SparkSession, warehouse: String) {
  private val root = new Path(warehouse)
  private val fs = root.getFileSystem(spark.sessionState.newHadoopConf())

  def tableLocation(name: String): String = s"$warehouse/$name"

  def create(
      name: String,
      df: DataFrame,
      partitionBy: Seq[String] = Nil,
      keyColumns: Seq[String] = Nil): GraftTable =
    GraftTable.create(spark, tableLocation(name), df, partitionBy, keyColumns)

  def table(name: String): GraftTable = GraftTable.load(spark, tableLocation(name))

  def exists(name: String): Boolean =
    fs.exists(new Path(new Path(root, name), "metadata"))

  def drop(name: String): Boolean = fs.delete(new Path(root, name), true)

  def list(): Seq[String] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).filter(_.isDirectory).map(_.getPath.getName)
      .filter(exists).sorted.toSeq
}
