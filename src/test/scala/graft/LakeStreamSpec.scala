package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ingestion into the lake: one append snapshot per micro-batch. */
class LakeStreamSpec extends AnyFunSuite {
  import TestSpark._

  test("stream_lake_sink commits one snapshot per micro-batch, losing no rows") {
    val agg = streaming.Stream.streamLakeSink(spark, sf)
    val got = agg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    val sfTag = sf.replaceAll(".*/", "")
    val t = lake.GraftTable.load(spark,
      s"/root/repo/target/graft-lake/stream-lakesink-table-$sfTag")
    // create (empty) + 2 micro-batch appends
    assert(t.meta.snapshots.map(_.operation) == Seq("append", "append", "append"))
    assert(t.meta.snapshots.length == 3)
    // exactly-once: the sink recorded the last batch id, and a REPLAY of an
    // already-committed micro-batch is an idempotent no-op
    assert(t.property("stream.default.lastBatchId").contains("1"))
    val before = t.scan().count()
    val replayed = t.appendStreamBatch(Tables.events(spark, sf).limit(10), 1L)
    assert(replayed == t.meta.currentSnapshotId)
    assert(t.meta.snapshots.length == 3, "replayed batch must not commit")
    assert(t.scan().count() == before)
    // a batch id BELOW the last committed one = reset checkpoint → loud fail
    intercept[IllegalArgumentException] {
      t.appendStreamBatch(Tables.events(spark, sf).limit(10), 0L)
    }
    // a NEW batch id still appends
    t.appendStreamBatch(Tables.events(spark, sf).limit(10), 2L)
    assert(t.scan().count() == before + 10)
    // a SECOND query feeding the same table tracks its batches
    // independently — its batch 0 is not mistaken for a replay
    t.appendStreamBatch(Tables.events(spark, sf).limit(5), 0L, queryId = "q2")
    assert(t.scan().count() == before + 15)
    assert(t.property("stream.q2.lastBatchId").contains("0"))
    assert(t.property("stream.default.lastBatchId").contains("2"))
  }

  test("stream_lake_upsert: later batches replace rows by key, exactly-once") {
    val agg = streaming.Stream.streamLakeUpsert(spark, sf)
    val got = agg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // oracle shape: the corrected rows moved type, nothing was lost
    val want = Tables.events(spark, sf)
      .withColumn("event_type",
        when(col("event_id") % 5 === 0, lit("corrected")).otherwise(col("event_type")))
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    val sfTag = sf.replaceAll(".*/", "")
    val t = lake.GraftTable.load(spark,
      s"/root/repo/target/graft-lake/stream-lakeupsert-table-$sfTag")
    // create (empty) + 2 micro-batch upserts, delivered in staged order
    assert(t.meta.snapshots.map(_.operation) == Seq("append", "upsert", "upsert"))
    // row count proves replace-not-duplicate: re-delivered keys were
    // swallowed by their batch's equality delete
    val total = Tables.events(spark, sf).count()
    assert(t.scan().count() == total)
    // exactly-once: a replayed batchId is a no-op for the upsert sink too
    assert(t.property("stream.default.lastBatchId").contains("1"))
    val snaps = t.meta.snapshots.length
    val replayed = t.upsertStreamBatch(
      Tables.events(spark, sf).limit(10), 1L)
    assert(replayed == t.meta.currentSnapshotId)
    assert(t.meta.snapshots.length == snaps, "replayed batch must not commit")
    assert(t.scan().count() == total)
    // a reset checkpoint (batchId below last committed) fails loudly
    intercept[IllegalArgumentException] {
      t.upsertStreamBatch(Tables.events(spark, sf).limit(10), 0L)
    }
  }

  test("maintain.every-batches compacts inside the sink; bounded files and history") {
    val loc = "/root/repo/target/graft-lake-test/stream-maintain"
    val p = new org.apache.hadoop.fs.Path(loc)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    val ev = Tables.events(spark, sf).limit(200)
    val t = lake.GraftTable.createEmpty(spark, loc, ev.schema,
      keyColumns = Seq("event_id"),
      properties = Map(
        "maintain.every-batches" -> "4",
        "maintain.compact.min-files" -> "3",
        "maintain.expire.keep-last" -> "5"))
    // 8 micro-batches of 25 rows: maintain() fires after batches 3 and 7
    (0 until 8).foreach { b =>
      t.appendStreamBatch(ev.filter(col("event_id") % 8 === b), b.toLong)
    }
    val m = t.refresh()
    assert(t.scan().count() == ev.count(), "maintenance must not lose rows")
    assert(m.currentSnapshot.get.nDataFiles < 8,
      s"inline compaction should bound files, have ${m.currentSnapshot.get.nDataFiles}")
    assert(m.snapshots.exists(_.operation == "replace"), "a compaction committed")
    assert(m.snapshots.length <= 5, s"expire.keep-last bounds history, have ${m.snapshots.length}")
    // exactly-once tracking survives the maintenance commits
    assert(t.property("stream.default.lastBatchId").contains("7"))
  }

  test("pre-upgrade tables with the table-wide batch key stay exactly-once") {
    val loc = "/root/repo/target/graft-lake-test/legacy-batchid"
    val p = new org.apache.hadoop.fs.Path(loc)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    val t = lake.GraftTable.create(spark, loc,
      Tables.events(spark, sf).limit(20), keyColumns = Seq("event_id"))
    // simulate a table ingested before per-query tracking
    t.setProperty("stream.lastBatchId", "5")
    val before = t.scan().count()
    // replay of the legacy-committed batch must still be a no-op
    t.appendStreamBatch(Tables.events(spark, sf).limit(10), 5L)
    assert(t.scan().count() == before, "legacy replay must not duplicate rows")
    // and the next batch appends under the new per-query key
    t.appendStreamBatch(Tables.events(spark, sf).limit(10), 6L)
    assert(t.scan().count() == before + 10)
    assert(t.property("stream.default.lastBatchId").contains("6"))
  }

  test("graft-table streaming source tails appends incrementally across restarts") {
    import org.apache.spark.sql.streaming.Trigger
    val base = "/root/repo/target/graft-lake-test/lakesource"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val loc = s"$base/table"
    val ckpt = s"$base/ckpt"
    val ev = Tables.events(spark, sf)
    val t = lake.GraftTable.create(spark, loc, ev.limit(100),
      keyColumns = Seq("event_id"))
    def runOnce(): Long = {
      val delivered = new java.util.concurrent.atomic.AtomicLong(0)
      val q = spark.readStream.format("graft-table").load(loc)
        .writeStream
        // foreachBatch supports checkpointed recovery (memory sink doesn't)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          delivered.addAndGet(b.count()); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      delivered.get()
    }
    assert(runOnce() == 100, "first run delivers the table's current content")
    // append 150 new rows, then compact (a replace snapshot) — the
    // restarted stream must deliver ONLY the appended rows: offsets are
    // recovered from the checkpoint and rewrites never re-deliver
    t.append(ev.limit(150))
    t.compact()
    assert(runOnce() == 150, "restart delivers exactly the delta")
    // nothing new → empty run
    assert(runOnce() == 0, "no new commits, no rows")
  }

  test("delta-cdf stream tails change versions incrementally across restarts") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.functions._
    val base = "/root/repo/target/graft-lake-test/deltacdf"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val loc = s"$base/table"
    val ckpt = s"$base/ckpt"
    val n = Tables.nation(spark, sf)
    val w = graft.lake.delta.DeltaWriter.create(spark, loc, n.schema,
      enableCdf = true)
    w.append(n) // v1
    def runOnce(): Map[String, Long] = {
      val seen = new java.util.concurrent.ConcurrentHashMap[String, Long]()
      val q = spark.readStream.format("delta-cdf").load(loc)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.groupBy("_change_type").count().collect().foreach(r =>
            seen.merge(r.getString(0), r.getLong(1), (a, c) => a + c)); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      seen.asScala.toMap
    }
    assert(runOnce() == Map("insert" -> n.count()),
      "first run delivers the initial append as inserts")
    // an update + a delete land; the restarted stream delivers ONLY them
    w.updateWhere(col("n_nationkey") % 5 === 0, Map("n_name" -> lit("U")))
    w.deleteWhere(col("n_nationkey") === 7)
    val k = n.collect().map(_.getAs[Int]("n_nationkey")).count(_ % 5 == 0)
    assert(runOnce() == Map(
      "update_preimage" -> k.toLong, "update_postimage" -> k.toLong,
      "delete" -> 1L), "restart delivers exactly the new versions' changes")
    assert(runOnce() == Map.empty[String, Long], "no new versions, no rows")
  }

  test("hudi-incremental stream tails commit instants incrementally across restarts") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.functions._
    val base = "/root/repo/target/graft-lake-test/hudiincr"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val loc = s"$base/table"
    val ckpt = s"$base/ckpt"
    val n = Tables.nation(spark, sf)
    val w = graft.lake.hudi.HudiWriter.create(spark, loc, n.schema,
      keyField = "n_nationkey")
    w.insert(n) // instant 1
    def runOnce(): Set[Int] = {
      val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
      val q = spark.readStream.format("hudi-incremental").load(loc)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("n_nationkey").collect().foreach(r => seen.add(r.getInt(0))); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      seen.asScala.toSet
    }
    val allKeys = n.collect().map(_.getAs[Int]("n_nationkey")).toSet
    assert(runOnce() == allKeys, "first run delivers the initial insert")
    // a COW upsert lands; restart delivers ONLY its keys, final state
    w.upsert(n.filter(col("n_nationkey") % 6 === 0)
      .withColumn("n_name", lit("INC")))
    assert(runOnce() == allKeys.filter(_ % 6 == 0),
      "restart delivers exactly the upserted keys")
    assert(runOnce() == Set.empty[Int], "no new instants, no rows")
  }

  test("hudi-incremental stream advances through a replacecommit, no phantom rows") {
    // a clustering adds no logical rows: the batch across it must be
    // EMPTY but the offset must advance past it (a stalled offset would
    // hide later commits); subsequent commits deliver normally
    import org.apache.spark.sql.streaming.Trigger
    val base = "/root/repo/target/graft-lake-test/hudireplace"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val loc = s"$base/table"
    val n = Tables.nation(spark, sf)
    val w = graft.lake.hudi.HudiWriter.create(spark, loc, n.schema,
      keyField = "n_nationkey")
    w.insert(n.filter(col("n_nationkey") < 13))
    w.insert(n.filter(col("n_nationkey") >= 13))
    def runOnce(): Set[Int] = {
      val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
      val q = spark.readStream.format("hudi-incremental").load(loc)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("n_nationkey").collect().foreach(r => seen.add(r.getInt(0))); ()
        }
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      seen.asScala.toSet
    }
    val allKeys = n.collect().map(_.getAs[Int]("n_nationkey")).toSet
    assert(runOnce() == allKeys, "initial content delivered")
    assert(w.cluster() != null)
    assert(runOnce() == Set.empty[Int],
      "a clustering delivers no rows (carried records keep their instants)")
    w.upsert(n.filter(col("n_nationkey") % 7 === 0)
      .withColumn("n_name", lit("POSTCLUSTER")))
    assert(runOnce() == allKeys.filter(_ % 7 == 0),
      "the offset advanced past the replacecommit: later commits deliver")
  }

  test("iceberg-incremental stream tails appends across restarts; rejects deletes") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.functions._
    val base = "/root/repo/target/graft-lake-test/iceincr"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val loc = s"$base/table"
    val ckpt = s"$base/ckpt"
    val n = Tables.nation(spark, sf)
    val w = graft.lake.iceberg.IcebergWriter.create(spark, loc, n.schema)
    w.append(n.filter(col("n_nationkey") < 10))
    def runOnce(): Set[Int] = {
      val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
      val q = spark.readStream.format("iceberg-incremental").load(loc)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("n_nationkey").collect().foreach(r => seen.add(r.getInt(0))); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      seen.asScala.toSet
    }
    assert(runOnce() == (0 until 10).toSet, "cold start delivers the content")
    w.append(n.filter(col("n_nationkey") >= 10 && col("n_nationkey") < 20))
    assert(runOnce() == (10 until 20).toSet, "restart delivers only the append")
    assert(runOnce() == Set.empty[Int])
    // an eq-delete snapshot fails the stream loudly, never silently skips
    w.equalityDelete(n.filter(col("n_nationkey") === 3).select("n_nationkey"))
    w.append(n.filter(col("n_nationkey") >= 20))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce()
    }
    assert(String.valueOf(e.getCause.getMessage).contains("operation"))
  }

  test("cdc stream observes delete commits as _change_type=delete rows") {
    import org.apache.spark.sql.streaming.Trigger
    val base = "/root/repo/target/graft-lake-test/lakesource-cdc"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val loc = s"$base/table"
    val ckpt = s"$base/ckpt"
    val ev = Tables.events(spark, sf)
    val t = lake.GraftTable.create(spark, loc, ev.limit(100),
      keyColumns = Seq("event_id"))
    def runOnce(): Map[String, Long] = {
      val seen = new java.util.concurrent.ConcurrentHashMap[String, Long]()
      val q = spark.readStream.format("graft-table").option("cdc", "true").load(loc)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.groupBy("_change_type").count().collect()
            .foreach(r => seen.merge(r.getString(0), r.getLong(1), Long.box(_) + _))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      seen.asScala.toMap
    }
    assert(runOnce() == Map("insert" -> 100L), "initial content arrives as inserts")
    // a delete commit MUST reach the consumer (the append-only source
    // silently skips it — r03 verdict missing #3)
    val deleted = t.scan().filter(col("event_id") % 5 === 0).count()
    t.delete(col("event_id") % 5 === 0)
    assert(runOnce() == Map("delete" -> deleted),
      "delete commit must deliver the removed rows tagged delete")
    // an upsert arrives as delete(old) + insert(new) for matched keys
    val src = ev.limit(20).filter(col("event_id") % 5 =!= 0)
    val matched = t.scan().join(src.select("event_id"), Seq("event_id"), "left_semi").count()
    t.upsert(src)
    val got = runOnce()
    assert(got("insert") == src.count(), "upsert emits every source row as insert")
    assert(got("delete") == matched, "upsert emits prior versions as delete")
  }

  test("stream_classify: streamed model scoring equals the batch confusion") {
    // the batch entry's holdout split is irrelevant here — the stream
    // scores EVERY confident-band doc, so aggregate the batch confusion
    // over both splits before comparing
    val batch = graft.queries.Curation.curateQualityClassify(spark, sf)
      .groupBy("teacher_label", "pred_label")
      .agg(org.apache.spark.sql.functions.sum("n_docs").as("n_docs"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val streamed = graft.streaming.Stream.streamClassify(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch,
      s"micro-batched scoring must equal batch: $streamed vs $batch")
    assert(streamed.values.sum > 0)
  }

  test("stream staging survives a directory-layout corpus (r13 sf1 regression)") {
    // The r13 sf1 sweep caught six SILENT 0-row streams: a Spark-written
    // corpus has events.parquet/documents.parquet as DIRECTORIES, and
    // copying a directory under the staged source dir nests it where the
    // streaming file source never lists. Rebuild that corpus shape and
    // pin nonzero, batch-equal results.
    val dir = "/root/repo/target/graft-lake-test/dircorpus"
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(root, true)
    // directory-layout copies of the two streamed tables (2 part files
    // each — also pins multi-part reassembly, not just dir handling)
    graft.Tables.events(spark, sf).repartition(2)
      .write.parquet(s"$dir/events.parquet")
    spark.read.parquet(s"$sf/documents.parquet").repartition(2)
      .write.parquet(s"$dir/documents.parquet")

    val winDir = graft.streaming.Stream.streamWindowAgg(spark, dir)
    val winFile = graft.streaming.Stream.streamWindowAgg(spark, sf)
    assert(winDir.count() > 0, "directory corpus must not stage to an empty stream")
    assert(winDir.collect().toSet == winFile.collect().toSet,
      "directory and single-file corpora must stream identically")

    val dedupDir = graft.streaming.Stream.streamDedup(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val dedupFile = graft.streaming.Stream.streamDedup(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(dedupDir == dedupFile && dedupDir.nonEmpty)
  }
}
