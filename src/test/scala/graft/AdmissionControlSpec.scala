package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `maxCommitsPerTrigger` admission control on the four streaming
  * sources ([[org.apache.spark.sql.graftshim.AdmissionControl]]): a
  * stream catching up on a backlog admits at most N commits per
  * micro-batch — the file source's maxFilesPerTrigger posture — instead
  * of folding the whole backlog into ONE batch (the 100 TB restart-loop
  * hazard). Receipts: batch boundaries land exactly every N commits,
  * totals stay exact, and a checkpointed RESTART neither re-delivers nor
  * regresses offsets. */
class AdmissionControlSpec extends AnyFunSuite {
  import TestSpark._

  private def fresh(base: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(base)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
  }

  /** Runs the stream to exhaustion under the default trigger and returns
    * each non-empty micro-batch's row count, in order. */
  private def batchCounts(reader: org.apache.spark.sql.DataFrame,
      ckpt: String): Seq[Long] = {
    val counts = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = reader.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val c = b.count(); if (c > 0) counts.add(c); ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    counts.asScala.toSeq
  }

  test("graft-table source: capped catch-up lands every 2 commits") {
    val base = "/root/repo/target/graft-admission-test/graft"
    fresh(base)
    val n = Tables.nation(spark, sf)
    val t = lake.GraftTable.create(spark, s"$base/table", n.limit(5),
      keyColumns = Seq("n_nationkey"))
    (1 to 4).foreach(i => t.append(n.limit(5 + i)
      .withColumn("n_nationkey", col("n_nationkey") + lit(i * 100))))
    // 5 commits, cap 2 → exactly ceil(5/2) = 3 batches, total exact
    val counts = batchCounts(
      spark.readStream.format("graft-table")
        .option("maxCommitsPerTrigger", "2").load(s"$base/table"),
      s"$base/ckpt")
    assert(counts.length == 3, s"5 commits / cap 2 must land 3 batches: $counts")
    assert(counts.sum == 5 + 6 + 7 + 8 + 9, s"totals stay exact: $counts")
    assert(counts.head == 5 + 6, "first batch = commits 1-2")
  }

  test("delta-cdf source: cap 1 = one version per batch; restart exact") {
    val base = "/root/repo/target/graft-admission-test/delta"
    fresh(base)
    val n = Tables.nation(spark, sf)
    val w = graft.lake.delta.DeltaWriter.create(spark, s"$base/table",
      n.schema, enableCdf = true)
    (1 to 4).foreach(i => w.append(n.limit(i)))
    def run(): Seq[Long] = batchCounts(
      spark.readStream.format("delta-cdf")
        .option("maxCommitsPerTrigger", "1").load(s"$base/table"),
      s"$base/ckpt")
    assert(run() == Seq(1L, 2L, 3L, 4L),
      "one version per batch, in version order")
    // restart on the same checkpoint: only NEW versions, still capped,
    // no re-delivery and no offset regression
    (5 to 6).foreach(i => w.append(n.limit(i)))
    assert(run() == Seq(5L, 6L), "restart delivers only the new versions")
    assert(run() == Seq.empty, "nothing new, nothing delivered")
  }

  test("hudi + iceberg sources honor the cap over sparse ordinals") {
    val base = "/root/repo/target/graft-admission-test/sparse"
    fresh(base)
    val n = Tables.nation(spark, sf)
    // hudi instants are timestamps — NOT dense; the cap must select the
    // k-th next listed instant, not base+k
    val hw = graft.lake.hudi.HudiWriter.create(spark, s"$base/hudi",
      n.schema, keyField = "n_nationkey")
    (1 to 3).foreach(i => hw.insert(n.limit(i)
      .withColumn("n_nationkey", col("n_nationkey") + lit(i * 100))))
    val hCounts = batchCounts(
      spark.readStream.format("hudi-incremental")
        .option("maxCommitsPerTrigger", "1").load(s"$base/hudi"),
      s"$base/hckpt")
    assert(hCounts == Seq(1L, 2L, 3L), s"one hudi instant per batch: $hCounts")

    val iw = graft.lake.iceberg.IcebergWriter.create(spark, s"$base/ice",
      n.schema)
    (1 to 3).foreach(i => iw.append(n.limit(i)
      .withColumn("n_nationkey", col("n_nationkey") + lit(i * 100))))
    val iCounts = batchCounts(
      spark.readStream.format("iceberg-incremental")
        .option("maxCommitsPerTrigger", "1").load(s"$base/ice"),
      s"$base/ickpt")
    // cold start = full content AS OF the first admitted snapshot, then
    // one snapshot per batch — bounded catch-up by construction
    assert(iCounts == Seq(1L, 2L, 3L), s"one iceberg snapshot per batch: $iCounts")
  }

  test("capped iceberg stream survives expired history (dangling parent)") {
    val base = "/root/repo/target/graft-admission-test/expired"
    fresh(base)
    val n = Tables.nation(spark, sf)
    val iw = graft.lake.iceberg.IcebergWriter.create(spark, s"$base/ice",
      n.schema)
    (1 to 3).foreach(i => iw.append(n.limit(5 + i)
      .withColumn("n_nationkey", col("n_nationkey") + lit(i * 100))))
    // drop all but the newest snapshot: the survivor keeps a DANGLING
    // parentId — the capped poll's ancestry walk must stop there, not
    // throw on every trigger
    val (dropped, _) = iw.expireSnapshots(keepLast = 1)
    assert(dropped > 0)
    val counts = batchCounts(
      spark.readStream.format("iceberg-incremental")
        .option("maxCommitsPerTrigger", "1").load(s"$base/ice"),
      s"$base/ickpt")
    assert(counts.sum == 6 + 7 + 8,
      s"cold start over retained history delivers everything: $counts")
  }

  test("invalid maxCommitsPerTrigger rejects loudly; absent = unthrottled") {
    val base = "/root/repo/target/graft-admission-test/invalid"
    fresh(base)
    val n = Tables.nation(spark, sf)
    val t = lake.GraftTable.create(spark, s"$base/table", n,
      keyColumns = Seq("n_nationkey"))
    val q = spark.readStream.format("graft-table")
      .option("maxCommitsPerTrigger", "0").load(s"$base/table")
      .writeStream
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .option("checkpointLocation", s"$base/ckpt0")
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable(); q.awaitTermination(10000)
    }
    assert(e.getMessage.contains("maxCommitsPerTrigger") ||
      String.valueOf(e.getCause).contains("maxCommitsPerTrigger"))
    // no option → single catch-up batch (the pre-existing behavior)
    val counts = batchCounts(
      spark.readStream.format("graft-table").load(s"$base/table"),
      s"$base/ckpt1")
    assert(counts == Seq(n.count()))
  }
}
