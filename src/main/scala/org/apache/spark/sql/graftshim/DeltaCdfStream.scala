package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.lake.delta.DeltaTable

/** Streaming SOURCE over a Delta table's CHANGE DATA FEED — tails the
  * change feed of a CDF-enabled Delta table written by any engine:
  *
  * {{{
  *   spark.readStream.format("delta-cdf").load(tableLocation)
  * }}}
  *
  * Offsets are DELTA VERSIONS (the log's own dense commit ordinals): a
  * micro-batch (start, end] is exactly `DeltaTable.changes(start+1,
  * end)` — insert / delete / update_preimage / update_postimage rows
  * tagged `_change_type` + `_commit_version`, reconstructed per the
  * protocol's CDF rules. `getOffset` re-reads only the log head;
  * recovery replays from the checkpointed version, so delivery is
  * exactly-once per version. `option("startingVersion", v)` starts the
  * tail AFTER version `v` (default -1 = from table creation, version 0
  * included — engines that create+write in one commit put data adds in
  * version 0). A version
  * in range whose changes are not reconstructible (pre-CDF rewrite, DV
  * attachment without cdc) fails the stream LOUDLY — a change feed that
  * silently skips changes is worse than one that stops.
  *
  * Lives in the shim package for the same `private[sql]`
  * `internalCreateDataFrame(isStreaming = true)` boundary as
  * [[GraftTableStreamSource]]. */
class DeltaCdfSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "delta-cdf"

  private def location(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "delta-cdf source needs .load(<delta table location>)"))

  private def cdfSchema(sqlContext: SQLContext, loc: String): StructType = {
    val t = DeltaTable.load(sqlContext.sparkSession, loc)
    StructType(t.schema.fields ++ Seq(
      StructField("_change_type", StringType),
      StructField("_commit_version", LongType)))
  }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    ("delta-cdf", schema.getOrElse(cdfSchema(sqlContext, location(parameters))))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val loc = location(parameters)
    val expected = cdfSchema(sqlContext, loc)
    schema.filter(_ != expected).foreach { s =>
      throw new IllegalArgumentException(
        s"delta-cdf source produces $expected; drop .schema(...) or pass " +
          s"it verbatim (got $s)")
    }
    val starting = parameters.get("startingVersion").map(_.toLong).getOrElse(-1L)
    new DeltaCdfStreamSource(sqlContext, loc, starting,
      AdmissionControl(parameters, metadataPath, sqlContext, starting))
  }
}

class DeltaCdfStreamSource(
    sqlContext: SQLContext,
    location: String,
    startingVersion: Long,
    ac: AdmissionControl = new AdmissionControl(None, false, 0L)) extends Source {

  override val schema: StructType = {
    val t = DeltaTable.load(sqlContext.sparkSession, location)
    StructType(t.schema.fields ++ Seq(
      StructField("_change_type", StringType),
      StructField("_commit_version", LongType)))
  }

  override def getOffset: Option[OffsetV1] = {
    val v = DeltaTable.load(sqlContext.sparkSession, location).version
    if (v <= startingVersion) None
    else Some(LongOffset(ac.admit(v, b => (b + 1) to v))) // versions are dense
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(_.json.trim.toLong).getOrElse(startingVersion)
    val to = end.json.trim.toLong
    ac.noteBatchEnd(to)
    val batch = DeltaTable.changes(
      sqlContext.sparkSession, location, from + 1, to)
    sqlContext.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(batch.queryExecution.toRdd, batch.schema,
        isStreaming = true)
  }

  override def stop(): Unit = ()
}
