package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.lake.GraftTable

/** Streaming SOURCE over a graft lake table — the read half of the
  * streaming story (the sink half is `GraftTable.appendStreamBatch`):
  * a downstream consumer tails a continuously-ingested table with
  * exactly-once offsets, paying O(new data) per micro-batch.
  *
  * {{{
  *   spark.readStream.format("graft-table").load(tableLocation)
  * }}}
  *
  * Offsets are SNAPSHOT IDS — the same dense commit ordinals the
  * incremental `changes()` scan consumes, so a micro-batch (start, end]
  * is exactly the rows appended/upserted by those commits (replace/
  * compaction snapshots add no rows and are skipped — rewrites don't
  * re-deliver data). `getOffset` re-reads table metadata, so new commits
  * are discovered without any listing of data files; recovery
  * deserializes the checkpointed snapshot id. Pass
  * `option("startingSnapshot", id)` to begin tailing after `id` instead
  * of from table creation (use it when history before `id` was expired).
  *
  * Lives in the shim package because marking a batch DataFrame as
  * streaming (`internalCreateDataFrame(..., isStreaming = true)`) is
  * `private[sql]` — the same boundary every V1 file/socket source uses.
  */
class GraftTableSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-table"

  private def location(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-table source needs .load(<table location>)"))

  private def isCdc(parameters: Map[String, String]): Boolean =
    parameters.get("cdc").exists(_.equalsIgnoreCase("true"))

  private def streamSchema(tableSchema: StructType, cdc: Boolean): StructType =
    if (!cdc) tableSchema
    else StructType(tableSchema.fields :+
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = false))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    ("graft-table",
      schema.getOrElse(streamSchema(
        GraftTable.load(sqlContext.sparkSession, location(parameters)).schema,
        isCdc(parameters))))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val loc = location(parameters)
    // reject a user schema that differs from the table's: batches are
    // produced in the table schema, and a silent mismatch would fail (or
    // misbind columns) mid-stream instead of at analysis
    val expected = streamSchema(
      GraftTable.load(sqlContext.sparkSession, loc).schema, isCdc(parameters))
    schema.filter(_ != expected).foreach { s =>
      throw new IllegalArgumentException(
        s"graft-table source reads the table schema $expected; " +
          s"drop .schema(...) or pass it verbatim (got $s)")
    }
    val starting = parameters.get("startingSnapshot").map(_.toLong).getOrElse(0L)
    new GraftTableStreamSource(sqlContext, loc, starting,
      cdc = isCdc(parameters),
      ac = AdmissionControl(parameters, metadataPath, sqlContext, starting))
  }
}

/** `cdc = true` switches micro-batches from the append-only `changes()`
  * read to `GraftTable.cdc` — rows tagged `_change_type` (insert|delete),
  * so delete/update/upsert commits reach the consumer instead of being
  * silently skipped. */
class GraftTableStreamSource(
    sqlContext: SQLContext,
    location: String,
    startingSnapshot: Long,
    cdc: Boolean = false,
    ac: AdmissionControl = new AdmissionControl(None, false, 0L)) extends Source {

  private val table = GraftTable.load(sqlContext.sparkSession, location)

  override def schema: StructType =
    if (!cdc) table.schema
    else StructType(table.schema.fields :+
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = false))

  override def getOffset: Option[OffsetV1] = {
    // ONE metadata refresh per poll: snapshotsAfter refreshes internally
    // and yields both the latest lineage id and the cap ordinals
    val ids = table.snapshotsAfter(startingSnapshot)
    ids.lastOption.map(latest =>
      LongOffset(ac.admit(latest, b => ids.filter(_ > b))))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(_.json.trim.toLong).getOrElse(startingSnapshot)
    val to = end.json.trim.toLong
    ac.noteBatchEnd(to)
    val batch = if (cdc) table.cdc(from, to) else table.changes(from, to)
    // V1 contract: the returned frame must carry isStreaming=true; rows
    // still evaluate lazily per micro-batch through the batch plan's RDD
    sqlContext.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(batch.queryExecution.toRdd, batch.schema,
        isStreaming = true)
  }

  override def stop(): Unit = ()
}
