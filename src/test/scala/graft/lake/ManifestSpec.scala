package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Receipts for the two r03-verdict write-path scale fixes:
  *  1. metadata written per commit is O(the commit's own files) — the
  *     pointer-log + manifest-list layout (Meta.scala) — not O(snapshots ×
  *     files) as in the pre-r04 single-document model;
  *  2. a large MoR DELETE writes multiple size-targeted delete shards
  *     instead of funneling every key through one `coalesce(1)` task.
  */
class ManifestSpec extends AnyFunSuite {
  import TestSpark._

  private def freshDir(name: String): String = {
    val d = s"/root/repo/target/graft-lake-test/$name"
    val p = new Path(d)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    d
  }

  private def hfs(loc: String) =
    new Path(loc).getFileSystem(spark.sessionState.newHadoopConf())

  private def metaBytes(loc: String): Long = {
    val fs = hfs(loc)
    fs.listStatus(new Path(loc, "metadata")).map(_.getLen).sum
  }

  private def newestVersionDoc(loc: String): String = {
    val fs = hfs(loc)
    val vs = fs.listStatus(new Path(loc, "metadata"))
      .filter(st => st.getPath.getName.startsWith("v") &&
        st.getPath.getName.endsWith(".json"))
    val latest = vs.maxBy(_.getPath.getName.stripPrefix("v").stripSuffix(".json").toLong)
    val in = fs.open(latest.getPath)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      bytes.toString("UTF-8")
    } finally in.close()
  }

  test("metadata written per commit stays bounded across 100 micro-batch appends") {
    val loc = freshDir("manifest-growth")
    val t = GraftTable.createEmpty(spark, loc,
      StructType.fromDDL("id BIGINT, v BIGINT"), keyColumns = Seq("id"))
    val one = spark.range(1).toDF("id").withColumn("v", lit(1L)).coalesce(1)
    var early = 0L // metadata bytes written by commit #10
    var late = 0L  // …and by commit #100
    (1 to 100).foreach { k =>
      val b0 = metaBytes(loc)
      t.append(one.withColumn("id", lit(k.toLong)))
      val b1 = metaBytes(loc)
      if (k == 10) early = b1 - b0
      if (k == 100) late = b1 - b0
    }
    // functional: every snapshot still readable
    assert(t.scan().count() == 100)
    assert(t.scan(asOf = 1L).count() == 1)
    assert(t.scan(asOf = 57L).count() == 57)
    // the version doc is a pure pointer log — no data-file paths inline
    val doc = newestVersionDoc(loc)
    assert(!doc.contains(".parquet"),
      "vN.json must hold manifest pointers, never file lists")
    assert(doc.length < 64 * 1024, s"pointer log too big: ${doc.length}")
    // manifest merging keeps the pointer list bounded
    assert(t.meta.currentSnapshot.get.manifestPaths.size <= 16,
      s"manifest list unbounded: ${t.meta.currentSnapshot.get.manifestPaths.size}")
    // per-commit metadata write is flat-ish: the old model wrote the FULL
    // history's file lists each commit (ratio ~100 at k=100); the pointer
    // log's only growth is one ~250-byte ref per snapshot
    assert(late < 64 * 1024, s"commit #100 wrote $late metadata bytes")
    assert(late < 25 * early,
      s"metadata per commit must not scale with history: #10=$early #100=$late")
  }

  test("snapshot summaries serve the snapshots table without manifest IO") {
    val loc = freshDir("manifest-summary")
    val o = Tables.orders(spark, sf).limit(100)
    val t = GraftTable.create(spark, loc, o, keyColumns = Seq("o_orderkey"))
    t.append(o.limit(40))
    val rows = t.snapshots.orderBy("snapshot_id").collect()
    assert(rows.map(_.getAs[Long]("total_rows")).toSeq == Seq(100L, 140L))
    assert(rows.map(_.getAs[Long]("n_data_files")).forall(_ > 0))
  }

  test("rollback reuses the target's manifest list by pointer") {
    val loc = freshDir("manifest-rollback")
    val o = Tables.orders(spark, sf).limit(100)
    val t = GraftTable.create(spark, loc, o, keyColumns = Seq("o_orderkey"))
    t.append(o.limit(30))
    t.rollback(1L)
    val m = t.meta
    assert(m.currentSnapshot.get.manifestList == m.snapshot(1L).manifestList,
      "rollback must be a pointer copy, not a file-list rewrite")
    assert(t.scan().count() == 100)
  }

  test("large MoR delete writes multiple size-targeted shards; read applies all") {
    val o = Tables.orders(spark, sf)
    val t = GraftTable.create(spark, freshDir("delete-shards"), o,
      keyColumns = Seq("o_orderkey"))
    t.setProperty("write.delete.target-file-size", "2048")
    t.delete(col("o_orderkey") % 2 === 0)
    val dels = t.meta.currentSnapshot.get.deleteFiles
    assert(dels.size > 1, s"expected sharded delete files, got ${dels.size}")
    assert(dels.map(_.rowCount).sum ==
      o.filter(col("o_orderkey") % 2 === 0).count())
    assert(t.scan().count() == o.filter(col("o_orderkey") % 2 =!= 0).count())
  }

  test("positional deletes: keyless table deletes exact rows across commits") {
    val o = Tables.orders(spark, sf)
    val t = GraftTable.create(spark, freshDir("pos-delete"), o.repartition(4))
    assert(t.meta.keyColumns.isEmpty)
    val before = t.meta.currentSnapshot.get.dataFiles.map(_.path).toSet
    t.delete(col("o_orderstatus") === "F")
    assert(t.meta.currentSnapshot.get.dataFiles.map(_.path).toSet == before,
      "positional delete must not rewrite data files")
    assert(t.meta.currentSnapshot.get.deleteFiles.forall(_.kindOr == "pos"))
    assert(t.scan().count() == o.filter(col("o_orderstatus") =!= "F").count())
    // second delete stacks: coordinates from the ALREADY-FILTERED view
    t.delete(col("o_orderkey") % 2 === 0)
    val want = o.filter(col("o_orderstatus") =!= "F" && col("o_orderkey") % 2 =!= 0)
    assert(t.scan().count() == want.count())
    // time travel still sees the pre-delete states
    assert(t.scan(asOf = 1L).count() == o.count())
    assert(t.scan(asOf = 2L).count() == o.filter(col("o_orderstatus") =!= "F").count())
    // CDC reconstructs the positionally-deleted rows
    val cdcRows = t.cdc(2L, 3L).groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cdcRows == Map("delete" ->
      (o.filter(col("o_orderstatus") =!= "F").count() - want.count())))
    // compaction folds positional deletes away; rows unchanged
    t.compact()
    assert(t.meta.currentSnapshot.get.deleteFiles.isEmpty)
    assert(t.scan().count() == want.count())
    // SQL DELETE FROM works on the keyless table too (positional commit)
    spark.conf.set("spark.sql.catalog.graft_pos",
      classOf[graft.lake.sql.GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_pos.warehouse",
      "/root/repo/target/graft-lake-test")
    spark.sql("DELETE FROM graft_pos.`pos-delete` WHERE o_custkey < 100")
    val fresh = GraftTable.load(spark, t.location)
    assert(fresh.meta.currentSnapshot.get.deleteFiles.forall(_.kindOr == "pos"))
    assert(fresh.scan().count() == want.filter(col("o_custkey") >= 100).count())
  }

  test("small MoR delete bin-packs to a single shard under the default target") {
    val o = Tables.orders(spark, sf)
    val t = GraftTable.create(spark, freshDir("delete-binpack"), o,
      keyColumns = Seq("o_orderkey"))
    t.delete(col("o_orderkey") <= 40) // handful of keys, scattered by distinct()
    val dels = t.meta.currentSnapshot.get.deleteFiles
    assert(dels.size == 1, s"small delete should bin-pack to 1 shard, got ${dels.size}")
    assert(t.scan().count() == o.filter(col("o_orderkey") > 40).count())
  }
}
