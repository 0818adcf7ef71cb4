package org.apache.spark.sql.graftshim

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.lake.hudi.HudiTable

/** Streaming SOURCE over a Hudi table's INCREMENTAL QUERY — tails a
  * COW/MOR Hudi table written by any engine:
  *
  * {{{
  *   spark.readStream.format("hudi-incremental").load(tableLocation)
  * }}}
  *
  * Offsets are COMMIT INSTANTS (numeric, per Hudi's timeline ordering):
  * a micro-batch (start, end] is `loadAsOf(end).incrementalFrom(start)`
  * — the LATEST STATE of every record whose last update landed in the
  * window, tagged `commit_instant`. Exactly Hudi's own incremental-pull
  * semantics, including its documented property that records deleted
  * inside the window are dropped rather than delivered (a delete
  * STREAM needs a change feed — that's the delta-cdf source's job; the
  * incremental pull is the ingest-new-and-updated-rows shape).
  * `getOffset` lists only the timeline; recovery replays from the
  * checkpointed instant, exactly-once per commit.
  * `option("startingInstant", i)` starts the tail after instant `i`
  * (default 0 = from table creation). */
class HudiIncrementalSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "hudi-incremental"

  private def location(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "hudi-incremental source needs .load(<hudi table location>)"))

  private def incSchema(sqlContext: SQLContext, loc: String): StructType = {
    val t = HudiTable.load(sqlContext.sparkSession, loc)
    StructType(StructField("commit_instant", StringType) +: t.schema.fields)
  }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    ("hudi-incremental",
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
        s"hudi-incremental source produces $expected; drop .schema(...) " +
          s"or pass it verbatim (got $s)")
    }
    val starting = parameters.get("startingInstant").map(_.toLong).getOrElse(0L)
    new HudiIncrementalStreamSource(sqlContext, loc, starting,
      AdmissionControl(parameters, metadataPath, sqlContext, starting))
  }
}

class HudiIncrementalStreamSource(
    sqlContext: SQLContext,
    location: String,
    startingInstant: Long,
    ac: AdmissionControl = new AdmissionControl(None, false, 0L)) extends Source {

  override val schema: StructType = {
    val t = HudiTable.load(sqlContext.sparkSession, location)
    StructType(StructField("commit_instant", StringType) +: t.schema.fields)
  }

  /** Completed commit instants (ascending), from the timeline listing
    * alone — the last is the poll offset, the list feeds admission
    * control. `replacecommit` counts (r10): clustering adds no logical
    * rows — carried records keep their commit instants, so the batch
    * across it is empty — but the offset must still advance past it or
    * the stream would stall below later data. `savepoint`/`restore` fail
    * LOUDLY here (same posture as HudiTable.loadAsOf; getBatch's table
    * load would reject them anyway, this just fails at the poll). */
  /** (numeric value, ORIGINAL timeline string) per completed instant,
    * ascending. The string travels back into loadAsOf/incrementalFrom
    * verbatim: those compare instants LEXICOGRAPHICALLY against the
    * timeline's own strings, so re-rendering the checkpointed Long with
    * a fixed 17-digit pad would mis-window any table whose instants are
    * a different width (real Hudi stamps 14- or 17-digit timestamps
    * with no leading zeros). */
  private def completedInstants: Seq[(Long, String)] = {
    val meta = new Path(location, ".hoodie")
    val fs = meta.getFileSystem(
      sqlContext.sparkSession.sessionState.newHadoopConf())
    val names = fs.listStatus(meta).toSeq.map(_.getPath.getName)
    val UnsupportedRe = """\d+\.(savepoint|restore)""".r
    val unsupported = names.collect { case n @ UnsupportedRe(kind) => s"$n ($kind)" }
    require(unsupported.isEmpty,
      s"hudi incremental stream: timeline has completed instants this " +
        s"source does not replay — ${unsupported.mkString(", ")}")
    val InstantRe = """(\d+)\.(commit|deltacommit|replacecommit)""".r
    names.collect {
      case InstantRe(i, _) => (i.toLong, i)
    }.sortBy(_._1)
  }

  override def getOffset: Option[OffsetV1] = {
    val instants = completedInstants.map(_._1)
    val v = instants.lastOption.getOrElse(0L)
    if (v <= startingInstant) None
    else Some(LongOffset(ac.admit(v, b => instants.filter(_ > b))))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(_.json.trim.toLong).getOrElse(startingInstant)
    val to = end.json.trim.toLong
    ac.noteBatchEnd(to)
    val insts = completedInstants
    def instantStr(v: Long): String =
      insts.takeWhile(_._1 <= v).lastOption.map(_._2).getOrElse(f"$v%017d")
    val t = HudiTable.loadAsOf(sqlContext.sparkSession, location, instantStr(to))
    val batch = t.incrementalFrom(if (from == 0L) "" else instantStr(from))
    sqlContext.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(batch.queryExecution.toRdd, batch.schema,
        isStreaming = true)
  }

  override def stop(): Unit = ()
}
