package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.lake.delta.{DeltaTable, DeltaWriter}
import graft.lake.hudi.{HudiTable, HudiWriter}
import graft.lake.iceberg.{IcebergTable, IcebergWriter}

/** Exactly-once streaming-sink APPEND into the three interop formats
  * (r11) — each format's NATIVE idempotence convention, so any engine of
  * that format can audit which batches landed:
  *  - Delta: the protocol's `txn` (SetTransaction) action — what OSS
  *    Delta's streaming writer emits; retained by checkpoints per the
  *    protocol.
  *  - Iceberg: snapshot-summary entries — where Iceberg's own engines
  *    record engine state (Flink checkpoint ids).
  *  - Hudi: commit `extraMetadata` — the DeltaStreamer checkpoint
  *    convention.
  * Contract matches GraftTable.appendStreamBatch: replayed batchId is a
  * no-op, going backwards is a loud error, recovery works cross-process
  * through open(). */
class InteropStreamSinkSpec extends AnyFunSuite {
  import TestSpark._

  private def freshDir(name: String): String = {
    val d = s"/root/repo/target/graft-interop-sink-test/$name"
    val p = new Path(d)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    d
  }

  private lazy val ev = Tables.events(spark, sf).limit(400).cache()

  /** Stage `ev` as two parquet files and run a real Structured Streaming
    * query (maxFilesPerTrigger=1 → two micro-batches) through `sink`. */
  private def runStream(stage: String)(sink: (DataFrame, Long) => Unit): Unit = {
    ev.repartitionByRange(2, col("event_id")).write.parquet(stage)
    val q = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stage)
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) => sink(batch, id); () }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("delta sink: txn-action idempotence, checkpoint retention, reader recovery") {
    val loc = freshDir("delta")
    val w = DeltaWriter.create(spark, loc, ev.schema)
    runStream(freshDir("delta-in")) { (b, id) => w.appendStreamBatch(b, id, "q1") }
    assert(DeltaTable.load(spark, loc).scan(None).count() == ev.count())
    assert(w.txnVersion("q1") == 1L)

    // replay is a no-op (no new commit); backwards is loud
    val vBefore = DeltaTable.load(spark, loc).version
    w.appendStreamBatch(ev.limit(5), 1L, "q1")
    assert(DeltaTable.load(spark, loc).version == vBefore, "replay must not commit")
    intercept[IllegalArgumentException] { w.appendStreamBatch(ev.limit(5), 0L, "q1") }

    // cross-process recovery: reopened writer and independent reader
    // both see the marker
    assert(DeltaWriter.open(spark, loc).txnVersion("q1") == 1L)
    assert(DeltaTable.load(spark, loc).txnVersion("q1") == 1L)
    assert(DeltaTable.load(spark, loc).txnVersion("other") == -1L)

    // the protocol requires checkpoints to retain the newest txn per
    // appId: checkpoint, then read the checkpoint parquet directly
    w.checkpoint()
    val fs = new Path(loc).getFileSystem(spark.sessionState.newHadoopConf())
    val cp = fs.listStatus(new Path(loc, "_delta_log")).map(_.getPath)
      .filter(_.getName.endsWith(".checkpoint.parquet")).head
    val txns = spark.read.parquet(cp.toString)
      .filter(col("txn").isNotNull).select("txn.appId", "txn.version").collect()
    assert(txns.map(r => (r.getString(0), r.getLong(1))).toSet == Set(("q1", 1L)),
      "classic checkpoint must carry the txn action")
    // and a checkpoint-seeded reader still recovers it
    assert(DeltaTable.load(spark, loc).txnVersion("q1") == 1L)
  }

  test("iceberg sink: snapshot-summary idempotence and recovery") {
    val loc = freshDir("ice")
    val w = IcebergWriter.create(spark, loc, ev.schema)
    runStream(freshDir("ice-in")) { (b, id) => w.appendStreamBatch(b, id, "q1") }
    val t = IcebergTable.load(spark, loc)
    assert(t.scan(None).count() == ev.count())
    assert(w.lastStreamBatch("q1") == 1L)
    assert(w.lastStreamBatch("other") == -1L)

    val nSnaps = t.snapshotsDf.count()
    w.appendStreamBatch(ev.limit(5), 1L, "q1") // replay → no-op
    assert(IcebergTable.load(spark, loc).snapshotsDf.count() == nSnaps)
    intercept[IllegalArgumentException] { w.appendStreamBatch(ev.limit(5), 0L, "q1") }

    // recovery survives a reopen AND an interleaved non-stream commit
    val w2 = IcebergWriter.open(spark, loc)
    assert(w2.lastStreamBatch("q1") == 1L)
    w2.append(ev.limit(3))
    assert(w2.lastStreamBatch("q1") == 1L,
      "marker must be found past an interleaved plain append")
    assert(IcebergWriter.open(spark, loc).lastStreamBatch("q1") == 1L)
  }

  test("hudi sink: extraMetadata idempotence and recovery") {
    val loc = freshDir("hudi")
    val w = HudiWriter.create(spark, loc, ev.schema,
      partitionFields = Nil, keyField = "event_id")
    runStream(freshDir("hudi-in")) { (b, id) => w.appendStreamBatch(b, id, "q1") }
    assert(HudiTable.load(spark, loc).scan(None).count() == ev.count())
    assert(w.lastStreamBatch("q1") == 1L)
    assert(w.lastStreamBatch("other") == -1L)

    val fs = new Path(loc).getFileSystem(spark.sessionState.newHadoopConf())
    def nInstants: Int = fs.listStatus(new Path(loc, ".hoodie"))
      .count(_.getPath.getName.matches("""\d+\.(commit|deltacommit)"""))
    val before = nInstants
    w.appendStreamBatch(ev.limit(5), 1L, "q1") // replay → no-op
    assert(nInstants == before)
    intercept[IllegalArgumentException] { w.appendStreamBatch(ev.limit(5), 0L, "q1") }

    // recovery through a reopened writer, past an interleaved insert
    val w2 = HudiWriter.open(spark, loc)
    assert(w2.lastStreamBatch("q1") == 1L)
    w2.insert(ev.limit(3).withColumn("event_id", -col("event_id") - 1))
    assert(w2.lastStreamBatch("q1") == 1L)
  }
}
