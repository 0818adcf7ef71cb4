package graft.lake.sql

import java.util

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, Filter, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.lake.delta.DeltaTable
import graft.lake.hudi.HudiTable
import graft.lake.iceberg.IcebergTable

/** DataSourceV2 batch READ connectors for the three interop formats — the
  * reference's headline usage is plain SQL over an Iceberg table
  * (pg_lakehouse_iceberg/README.md:40-58: `CREATE TABLE … USING
  * iceberg_am` then `SELECT * FROM orders WHERE ts > …`), and before
  * these providers graft could only serve that through Scala APIs
  * (`IcebergTable.load(...).scan(...)`). Now:
  *
  * {{{
  *   spark.read.format("graft-iceberg").load(loc)              // DataFrame
  *   spark.sql("SELECT * FROM `graft-delta`.`/path/tbl` ...")  // direct SQL
  *   spark.read.format("graft-iceberg").option("snapshot-id", id).load(loc)
  * }}}
  *
  * Time-travel options follow each format's own reader conventions:
  *  - `graft-iceberg`: `snapshot-id` | `as-of-timestamp` (epoch ms) |
  *    `ref` (branch or tag name)
  *  - `graft-delta`: `versionAsOf` | `timestampAsOf` (epoch ms or
  *    `yyyy-mm-dd hh:mm:ss[.f…]`)
  *  - `graft-hudi`: `as.of.instant` (timeline instant), `query.type`
  *    (`snapshot` default | `read_optimized`)
  *
  * Architecture: each provider resolves its options to an [[InteropRead]]
  * — schema + scan/stats closures over the existing table readers — and
  * the shared [[InteropReadTable]] bridge does the DSv2 work once:
  * pushed filters feed the format's `FilePruner` planning (manifest /
  * log-action / timeline metadata file skipping BEFORE any task is
  * scheduled), column pruning narrows the bridged plan (Catalyst then
  * pushes it into the parquet reader), and `estimateStatistics` reports
  * metadata-derived sizes so small interop dims broadcast. Filters stay
  * RESIDUAL (Spark re-applies them) — pruning is strictly an IO
  * optimization, so partial translation is always sound.
  *
  * At 100 TB: planning cost is each format's own O(metadata) driver walk
  * (no directory listing), the data path is the same distributed
  * vectorized parquet scan the Scala API produces, and the only cost the
  * V1 bridge adds is one Row boundary at the scan root carrying
  * already-filtered, already-projected rows.
  */
final case class InteropRead(
    name: String,
    schema: StructType,
    scan: Option[Column] => DataFrame,
    /** (bytes, rows) post-pruning, from metadata only; bytes < 0 = unknown. */
    stats: Option[Column] => (Long, Long))

abstract class InteropReadProvider extends TableProvider with DataSourceRegister {

  /** Resolve options (path + format-specific time travel) to a read. */
  protected def open(spark: SparkSession, options: CaseInsensitiveStringMap): InteropRead

  protected def path(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
      s"${shortName()} needs .load(<table location>)"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    open(SparkSession.active, options).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new InteropReadTable(
      open(SparkSession.active, new CaseInsensitiveStringMap(properties)))
}

class GraftIcebergSource extends InteropReadProvider {
  override def shortName(): String = "graft-iceberg"

  override protected def open(
      spark: SparkSession, options: CaseInsensitiveStringMap): InteropRead = {
    val loc = path(options)
    val t = IcebergTable.load(spark, loc)
    val snap: Long =
      Option(options.get("snapshot-id")).map(_.toLong)
        .orElse(Option(options.get("as-of-timestamp"))
          .map(ms => t.snapshotAsOfTime(ms.toLong)))
        .orElse(Option(options.get("ref")).map(t.refSnapshot))
        .getOrElse(-1L)
    InteropRead(s"graft-iceberg `$loc`", t.schema,
      f => t.scan(f, snap), f => t.scanStats(f, snap))
  }
}

class GraftDeltaSource extends InteropReadProvider {
  override def shortName(): String = "graft-delta"

  private def parseTs(s: String): Long =
    if (s.forall(c => c.isDigit || c == '-')) s.toLong
    else java.sql.Timestamp.valueOf(s).getTime

  override protected def open(
      spark: SparkSession, options: CaseInsensitiveStringMap): InteropRead = {
    val loc = path(options)
    val t = Option(options.get("versionAsOf")) match {
      case Some(v) => DeltaTable.loadVersion(spark, loc, v.toLong)
      case None => Option(options.get("timestampAsOf")) match {
        case Some(ts) => DeltaTable.loadAsOfTime(spark, loc, parseTs(ts))
        case None => DeltaTable.load(spark, loc)
      }
    }
    InteropRead(s"graft-delta `$loc`", t.schema, t.scan(_), t.scanStats(_))
  }
}

class GraftHudiSource extends InteropReadProvider {
  override def shortName(): String = "graft-hudi"

  override protected def open(
      spark: SparkSession, options: CaseInsensitiveStringMap): InteropRead = {
    val loc = path(options)
    val t = HudiTable.loadAsOf(spark, loc,
      options.get("as.of.instant")) // null = latest (loadAsOf's contract)
    val scan: Option[Column] => DataFrame =
      Option(options.get("query.type")).getOrElse("snapshot") match {
        case "snapshot" => t.scan(_)
        case "read_optimized" => t.scanReadOptimized(_)
        case other => throw new IllegalArgumentException(
          s"graft-hudi query.type must be snapshot|read_optimized, got '$other'")
      }
    InteropRead(s"graft-hudi `$loc`", t.schema, scan, t.scanStats(_))
  }
}

/** Direct SQL over an interop path — `` SELECT … FROM
  * `graft-iceberg`.`/path/tbl` `` — the reference's `SELECT * FROM orders
  * WHERE …` UX without even registering a view. Spark's own
  * `ResolveSQLOnFile` only accepts FILE formats for path queries (a plain
  * `TableProvider` throws `UNSUPPORTED_DATASOURCE_FOR_DIRECT_QUERY`), so
  * this rule runs in the HINTS batch — ahead of the resolution batch —
  * and rewrites `UnresolvedRelation([graft-iceberg|graft-delta|graft-hudi,
  * <path>])` into a `DataSourceV2Relation` over the provider's table
  * before the built-in rule ever sees it (the same move Delta's
  * `ResolveDeltaPathTable` makes for `` delta.`/path` ``). Installed by
  * [[graft.GraftExtensions]] via `injectHintResolutionRule`. */
class GraftInteropPathRule extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

  private val providers: Map[String, () => InteropReadProvider] = Map(
    "graft-iceberg" -> (() => new GraftIcebergSource),
    "graft-delta" -> (() => new GraftDeltaSource),
    "graft-hudi" -> (() => new GraftHudiSource))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedRelation if u.multipartIdentifier.length == 2 &&
        providers.contains(u.multipartIdentifier.head.toLowerCase(java.util.Locale.ROOT)) =>
      val fmt = u.multipartIdentifier.head.toLowerCase(java.util.Locale.ROOT)
      val loc = u.multipartIdentifier(1)
      val provider = providers(fmt)()
      val opts = new CaseInsensitiveStringMap(
        java.util.Collections.singletonMap("path", loc))
      val table = provider.getTable(
        provider.inferSchema(opts), Array.empty, opts)
      DataSourceV2Relation.create(table, None, None, opts)
  }
}

/** The shared read-only DSv2 table over a resolved [[InteropRead]]. */
class InteropReadTable(read: InteropRead) extends Table with SupportsRead {
  override def name(): String = read.name
  override def schema(): StructType = read.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new InteropScanBuilder(read)
}

/** Pushed filters drive metadata file-skipping inside the bridged scan;
  * every filter stays residual (sound under partial translation). Column
  * pruning narrows the bridged plan so the projection reaches parquet. */
class InteropScanBuilder(read: InteropRead) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = read.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => GraftFilters.toColumn(f).isDefined)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new InteropV1Scan(read, pushed, required)
}

class InteropV1Scan(read: InteropRead, pushed: Array[Filter],
    required: StructType) extends V1Scan with SupportsReportStatistics {

  private def pushedColumn: Option[Column] =
    pushed.flatMap(GraftFilters.toColumn).reduceOption(_ && _)

  override def readSchema(): StructType = required

  override def description(): String =
    s"${read.name} PushedFilters: [${pushed.mkString(", ")}]"

  /** Metadata-derived stats post-pruning: without this the V1 bridge
    * reports "huge" and a small interop dim would never broadcast. */
  override def estimateStatistics(): Statistics = {
    val (bytes, rows) =
      try read.stats(pushedColumn) catch { case _: Throwable => (-1L, -1L) }
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        if (bytes >= 0) java.util.OptionalLong.of(bytes)
        else java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong =
        if (rows >= 0) java.util.OptionalLong.of(rows)
        else java.util.OptionalLong.empty()
    }
  }

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = required
      override def needConversion: Boolean = true
      override def buildScan(): RDD[Row] = {
        val df = read.scan(pushedColumn)
        val projected =
          if (required.isEmpty) df.select() // e.g. SELECT count(*)
          else df.select(required.fieldNames.toIndexedSeq.map(col): _*)
        projected.rdd
      }
    }.asInstanceOf[T]
}
