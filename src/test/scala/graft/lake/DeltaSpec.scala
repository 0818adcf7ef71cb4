package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.lake.delta.{DeltaTable, DeltaWriter}

/** Round-trip receipts for the Delta Lake transaction-protocol reader:
  * the sandbox has no Delta artifacts, so [[DeltaWriter]] builds REAL
  * protocol layouts (%020d.json logs, stats JSON, hive partition dirs,
  * classic checkpoint + _last_checkpoint) and [[DeltaTable]] reads them
  * back. */
class DeltaSpec extends AnyFunSuite {
  import TestSpark._

  private def freshDir(name: String): String = {
    val d = s"/root/repo/target/graft-delta-test/$name"
    val p = new Path(d)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    d
  }

  test("unpartitioned round-trip: two appends read back exactly") {
    val n = Tables.nation(spark, sf)
    val w = DeltaWriter.create(spark, freshDir("roundtrip"), n.schema)
    w.append(n.filter(col("n_nationkey") < 13))
    w.append(n.filter(col("n_nationkey") >= 13))
    val t = DeltaTable.load(spark, freshDir2("roundtrip"))
    assert(t.schema.fieldNames.toSeq == n.schema.fieldNames.toSeq)
    assert(t.scan().orderBy("n_nationkey").collect().toSeq ==
      n.orderBy("n_nationkey").collect().toSeq)
  }

  private def freshDir2(name: String): String =
    s"/root/repo/target/graft-delta-test/$name" // same path, no clearing

  test("partition columns are injected from partitionValues and prune files") {
    val n = Tables.nation(spark, sf)
    val w = DeltaWriter.create(spark, freshDir("prune"), n.schema,
      partitionColumns = Seq("n_regionkey"))
    w.append(n)
    val t = DeltaTable.load(spark, freshDir2("prune"))
    val all = t.planFiles()
    val kept = t.planFiles(Some(col("n_regionkey") === 2))
    assert(all.size == 5, s"expected 5 partition files, got ${all.size}")
    assert(kept.size == 1, s"pruning kept ${kept.size} of ${all.size}")
    // injected partition column comes back with correct values and type
    assert(t.scan(Some(col("n_regionkey") === 2)).orderBy("n_nationkey").collect().toSeq ==
      n.filter(col("n_regionkey") === 2).orderBy("n_nationkey").collect().toSeq)
  }

  test("stats JSON prunes on column bounds without partitioning") {
    val o = Tables.orders(spark, sf).repartitionByRange(4, col("o_orderkey"))
    val w = DeltaWriter.create(spark, freshDir("stats"), o.schema)
    w.append(o)
    val t = DeltaTable.load(spark, freshDir2("stats"))
    val all = t.planFiles()
    val maxKey = o.agg(max(col("o_orderkey"))).head().getLong(0)
    val kept = t.planFiles(Some(col("o_orderkey") === maxKey))
    assert(all.size >= 4)
    assert(kept.size < all.size,
      s"stats pruning kept ${kept.size} of ${all.size}")
  }

  test("copy-on-write delete rewrites only affected files") {
    val n = Tables.nation(spark, sf)
    val w = DeltaWriter.create(spark, freshDir("cow"), n.schema,
      partitionColumns = Seq("n_regionkey"))
    w.append(n)
    val before = DeltaTable.load(spark, freshDir2("cow")).planFiles().toSet
    w.deleteWhere(col("n_regionkey") === 2 && col("n_nationkey") % 2 === 0)
    val t = DeltaTable.load(spark, freshDir2("cow"))
    val after = t.planFiles().toSet
    // only the r=2 file was rewritten; the other four are byte-identical
    assert((before -- after).size == 1, s"removed: ${before -- after}")
    assert((after -- before).size == 1, s"added: ${after -- before}")
    val want = n.filter(!(col("n_regionkey") === 2 && col("n_nationkey") % 2 === 0))
    assert(t.scan().orderBy("n_nationkey").collect().toSeq ==
      want.orderBy("n_nationkey").collect().toSeq)
  }

  test("version time travel replays a log prefix") {
    val n = Tables.nation(spark, sf)
    val w = DeltaWriter.create(spark, freshDir("travel"), n.schema)
    w.append(n.filter(col("n_nationkey") < 13))  // version 1
    w.append(n.filter(col("n_nationkey") >= 13)) // version 2
    val v1 = DeltaTable.loadVersion(spark, freshDir2("travel"), 1L)
    assert(v1.version == 1L)
    assert(v1.scan().count() == n.filter(col("n_nationkey") < 13).count())
    val head = DeltaTable.load(spark, freshDir2("travel"))
    assert(head.version == 2L && head.scan().count() == n.count())
  }

  test("checkpoint-seeded load equals full log replay") {
    val n = Tables.nation(spark, sf)
    val w = DeltaWriter.create(spark, freshDir("cp"), n.schema,
      partitionColumns = Seq("n_regionkey"))
    w.append(n.filter(col("n_nationkey") < 13))
    w.deleteWhere(col("n_nationkey") === 3)
    w.checkpoint()
    w.append(n.filter(col("n_nationkey") >= 13)) // after the checkpoint
    val t = DeltaTable.load(spark, freshDir2("cp"))
    val want = n.filter(col("n_nationkey") =!= 3)
    assert(t.scan().orderBy("n_nationkey").collect().toSeq ==
      want.orderBy("n_nationkey").collect().toSeq)
    // the checkpoint file really exists and is the seed
    val fs = new Path(freshDir2("cp")).getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new Path(freshDir2("cp"), "_delta_log/_last_checkpoint")))
  }

  test("tables requiring reader features are rejected, not misread") {
    val n = Tables.nation(spark, sf)
    val dir = freshDir("guard")
    val w = DeltaWriter.create(spark, dir, n.schema)
    w.append(n)
    // forge a protocol upgrade demanding column mapping
    val logPath = new Path(dir, "_delta_log/00000000000000000002.json")
    val fs = logPath.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(logPath, false)
    try out.write(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""".getBytes("UTF-8"))
    finally out.close()
    val e = intercept[IllegalArgumentException] {
      DeltaTable.load(spark, dir)
    }
    assert(e.getMessage.contains("minReaderVersion"))
  }
}
