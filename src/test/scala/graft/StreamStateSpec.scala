package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming state-store behavior: the watermark must actually BOUND the
  * dedup state (r02 verdict #8 — unbounded dropDuplicates state is a
  * non-starter for a continuously-ingested corpus). */
class StreamStateSpec extends AnyFunSuite {
  import TestSpark._

  test("dropDuplicatesWithinWatermark evicts keys the watermark has passed") {
    val sp = spark; import sp.implicits._
    val dir = "/root/repo/target/graft-lake-test/state-evict"
    val dst = new Path(dir)
    val fs = dst.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(dst, true)
    fs.mkdirs(dst)
    val base = 1700000000000000L // µs
    val year = 365L * 24 * 3600 * 1000000
    val now = System.currentTimeMillis()
    // single flat file per batch (the file source does not recurse), with
    // deterministic mod times so batch order is a..b
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmpd = new Path(dst, s"_tmp_$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmpd.toString)
      val part = fs.listStatus(tmpd).map(_.getPath)
        .find(_.getName.endsWith(".parquet")).get
      fs.rename(part, new Path(dst, name))
      fs.delete(tmpd, true)
      fs.setTimes(new Path(dst, name), mtime, -1)
    }
    // batch 1: keys 0..999 at T0; batch 2: keys 1000..1999 at T0 + 1 year
    writeOne((0L until 1000L).map(i => (i, base + i)).toDF("event_id", "ts_us"),
      "a.parquet", now - 600000)
    writeOne((1000L until 2000L).map(i => (i, base + year + i)).toDF("event_id", "ts_us"),
      "b.parquet", now)
    val deduped = spark.readStream
      .schema("event_id BIGINT, ts_us BIGINT")
      .option("maxFilesPerTrigger", 1)
      .option("latestFirst", "false")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream
      .format("memory").queryName("graft_state_evict")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // no key duplicated, none lost
    assert(spark.table("graft_state_evict").count() == 2000)
    // after the year-later batch, the watermark passed every batch-1 key's
    // expiry — the store must hold ONLY batch-2 keys, not all 2000
    val st = q.recentProgress.flatMap(_.stateOperators).lastOption
      .getOrElse(fail("no state operator metrics"))
    assert(st.numRowsTotal == 1000,
      s"expected batch-1 keys evicted, state holds ${st.numRowsTotal}")
  }

  test("stream_dedup_watermark equals the batch distinct count") {
    val got = streaming.Stream.streamDedupWatermark(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val want = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct(col("event_id")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want)
  }
}
