package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.lake.iceberg.IcebergTable

/** Streaming SOURCE over an Iceberg table's incremental APPEND scan —
  * with the graft-table, delta-cdf and hudi-incremental sources, graft
  * tails change reads on ITS OWN format and all three interop formats:
  *
  * {{{
  *   spark.readStream.format("iceberg-incremental").load(tableLocation)
  * }}}
  *
  * Offsets are SEQUENCE NUMBERS (snapshot IDs are random longs — not
  * orderable; the v2 sequence number is the log's monotonic ordinal).
  * A micro-batch (start, end] resolves both boundaries to ancestry-
  * chain snapshots and runs `incrementalAppends` between them — rows
  * tagged `_snapshot_id`; `replace` (compaction) snapshots deliver
  * nothing; delete/overwrite snapshots fail the stream LOUDLY (the
  * same appends-only contract Iceberg's own streaming read has). The
  * COLD START batch is the table's full content as of the first
  * offset (the graft-table source's convention), tagged with that
  * snapshot id. */
class IcebergIncrementalSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "iceberg-incremental"

  private def location(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "iceberg-incremental source needs .load(<iceberg table location>)"))

  private def incSchema(sqlContext: SQLContext, loc: String): StructType = {
    val t = IcebergTable.load(sqlContext.sparkSession, loc)
    StructType(t.schema.fields :+ StructField("_snapshot_id", LongType))
  }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    ("iceberg-incremental",
      schema.getOrElse(incSchema(sqlContext, location(parameters))))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val loc = location(parameters)
    val expected = incSchema(sqlContext, loc)
    schema.filter(_ != expected).foreach { s =>
      throw new IllegalArgumentException(
        s"iceberg-incremental source produces $expected; drop .schema(...) " +
          s"or pass it verbatim (got $s)")
    }
    new IcebergIncrementalStreamSource(sqlContext, loc,
      AdmissionControl(parameters, metadataPath, sqlContext, starting = 0L))
  }
}

class IcebergIncrementalStreamSource(
    sqlContext: SQLContext,
    location: String,
    ac: AdmissionControl = new AdmissionControl(None, false, 0L)) extends Source {

  override val schema: StructType = {
    val t = IcebergTable.load(sqlContext.sparkSession, location)
    StructType(t.schema.fields :+ StructField("_snapshot_id", LongType))
  }

  override def getOffset: Option[OffsetV1] = {
    val m = IcebergTable.load(sqlContext.sparkSession, location).meta
    if (m.currentSnapshotId.isEmpty) return None
    val latest = m.snapshot(m.currentSnapshotId.get).sequenceNumber
    // ancestry-chain sequence numbers after the base, ascending — the
    // admission-control ordinals (sequence numbers are the log's
    // monotonic ordinal; snapshot ids are random longs). The walk must
    // survive EXPIRED history: expireSnapshots drops ancestors, leaving
    // the oldest retained snapshot with a dangling parentId — stop there
    // (ordinals below retained history are not servable anyway) instead
    // of throwing on every poll.
    def seqsAfter(b: Long): Seq[Long] = {
      val buf = scala.collection.mutable.ArrayBuffer[Long]()
      var cur = m.currentSnapshotId.flatMap(IcebergIncrementalStreamSource.find(m, _))
      while (cur.exists(_.sequenceNumber > b)) {
        buf += cur.get.sequenceNumber
        cur = cur.get.parentId.flatMap(IcebergIncrementalStreamSource.find(m, _))
      }
      buf.reverse.toSeq
    }
    Some(LongOffset(ac.admit(latest, seqsAfter)))
  }

  /** Newest ancestry-chain snapshot with sequenceNumber <= seq —
    * expired-ancestor-safe like seqsAfter; falling off the retained
    * chain means the checkpointed boundary predates retention. */
  private def snapAtSeq(t: IcebergTable, seq: Long): Option[Long] = {
    val m = t.meta
    var cur = m.currentSnapshotId.flatMap(IcebergIncrementalStreamSource.find(m, _))
    while (cur.exists(_.sequenceNumber > seq))
      cur = cur.get.parentId.flatMap(IcebergIncrementalStreamSource.find(m, _))
    cur.map(_.id)
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val spark = sqlContext.sparkSession
    val t = IcebergTable.load(spark, location)
    val toSeq = end.json.trim.toLong
    ac.noteBatchEnd(toSeq)
    val toSnap = snapAtSeq(t, toSeq).getOrElse(
      throw new IllegalStateException(
        s"iceberg-incremental: no snapshot at or below sequence $toSeq"))
    val batch = start.map(_.json.trim.toLong) match {
      case Some(fromSeq) =>
        val fromSnap = snapAtSeq(t, fromSeq).getOrElse(
          throw new IllegalStateException(
            s"iceberg-incremental: checkpointed sequence $fromSeq predates " +
              "the retained history"))
        t.incrementalAppends(fromSnap, toSnap)
      case None => // cold start: full content as of the first offset
        t.scan(snapshotId = toSnap).withColumn("_snapshot_id", lit(toSnap))
    }
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(batch.queryExecution.toRdd, batch.schema,
        isStreaming = true)
  }

  override def stop(): Unit = ()
}

object IcebergIncrementalStreamSource {
  /** Lookup that tolerates ids expired out of metadata (IceMeta.snapshot
    * throws — wrong posture for an ancestry walk that may legitimately
    * reach beyond retained history). */
  private[graftshim] def find(m: graft.lake.iceberg.IceMeta, id: Long) =
    m.snapshots.find(_.id == id)
}
