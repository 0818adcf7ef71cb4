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
    GraftTable.create(spark, register(name), df, partitionBy, keyColumns)

  def table(name: String): GraftTable =
    GraftTable.load(spark, tableLocation(name))
}
