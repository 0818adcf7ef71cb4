package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.lake.iceberg.{IcebergExport, IcebergTable, IcebergTransforms}

/** Cross-engine layout assertions for the graft→Iceberg EXPORT path
  * (reference write bridge: iceberg_bridge.h:405-449 + commit_ops.c).
  * These check the physical layout an EXTERNAL reader depends on — field
  * ids in parquet footers, spec-hash bucket dirs, netted-out deletes —
  * not just that our own reader round-trips. */
class IcebergExportSpec extends AnyFunSuite {
  import TestSpark._

  private def freshDir(name: String): String = {
    val d = s"/root/repo/target/graft-iceberg-export-test/$name"
    val p = new Path(d)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    d
  }

  test("export nets out MoR deletes and reads back exactly") {
    val o = Tables.orders(spark, sf).limit(500)
    val t = GraftTable.create(spark, freshDir("src"), o,
      partitionBy = Seq("o_orderstatus"), keyColumns = Seq("o_orderkey"))
    t.delete(col("o_orderpriority") === "1-URGENT")
    val w = IcebergExport.export(spark, t, freshDir("dst"))
    val ice = IcebergTable.load(spark, w.location)
    val got = ice.scan().orderBy("o_orderkey").collect().toSeq
    val want = t.scan().orderBy("o_orderkey").collect().toSeq
    assert(got.nonEmpty && got == want)
    // provenance tag pins the exported snapshot
    assert(ice.scanRef(s"graft-snapshot-${t.meta.currentSnapshotId}").count()
      == want.size)
  }

  test("exported data files carry spec field ids in parquet footers") {
    val n = Tables.nation(spark, sf)
    val t = GraftTable.create(spark, freshDir("fid-src"), n)
    val w = IcebergExport.export(spark, t, freshDir("fid-dst"))
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(w.location, "data")
    val fs = root.getFileSystem(conf)
    val files = {
      val it = fs.listFiles(root, true)
      val b = Seq.newBuilder[Path]
      while (it.hasNext) { val f = it.next().getPath
        if (f.getName.endsWith(".parquet")) b += f }
      b.result()
    }
    assert(files.nonEmpty)
    files.foreach { f =>
      val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
      try {
        val mt = footer.getFileMetaData.getSchema
        val ids = mt.getFields.toArray.map(_.asInstanceOf[org.apache.parquet.schema.Type])
          .map(fld => fld.getName -> Option(fld.getId).map(_.intValue))
        // ids 1..n in schema order, per the export's field-id assignment
        assert(ids.forall(_._2.isDefined), s"missing field ids in $f: $ids")
        assert(ids.flatMap(_._2).toSeq == (1 to ids.length).toSeq)
      } finally footer.close()
    }
  }

  test("incremental export mirrors appends, updates, and deletes by final state") {
    val o = Tables.orders(spark, sf).limit(400)
    val t = GraftTable.create(spark, freshDir("inc-src"), o,
      keyColumns = Seq("o_orderkey"))
    val dst = freshDir("inc-dst")
    IcebergExport.export(spark, t, dst)
    // append new keys, delete some originals, AND delete some of the
    // new keys in the same range (insert-then-delete must not resurrect)
    t.append(o.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_orderkey", -col("o_orderkey")))
    t.delete(col("o_orderpriority") === "1-URGENT") // hits old AND new keys
    val commits = IcebergExport.exportIncremental(spark, t, dst)
    assert(commits == 2)
    // reopened reader sees exactly the graft table's current state
    val ice = IcebergTable.load(spark, dst)
    val got = ice.scan().orderBy("o_orderkey").collect().toSeq
    val want = t.scan().orderBy("o_orderkey").collect().toSeq
    assert(got.nonEmpty && got == want)
    // provenance advanced; up-to-date mirror is a no-op
    assert(ice.scanRef(s"graft-snapshot-${t.meta.currentSnapshotId}").count()
      == want.size)
    assert(IcebergExport.exportIncremental(spark, t, dst) == 0)
  }

  test("incremental export of a pure-append range mirrors exactly") {
    val n = Tables.nation(spark, sf)
    val t = GraftTable.create(spark, freshDir("inc2-src"),
      n.filter(col("n_nationkey") < 13), keyColumns = Seq("n_nationkey"))
    val dst = freshDir("inc2-dst")
    IcebergExport.export(spark, t, dst)
    t.append(n.filter(col("n_nationkey") >= 13))
    // always 2 commits: the eq-delete is issued even for append-only
    // ranges (it is what makes re-appended existing keys safe; a no-op
    // here since the appended keys are new to the mirror)
    assert(IcebergExport.exportIncremental(spark, t, dst) == 2)
    val ice = IcebergTable.load(spark, dst)
    assert(ice.scan().orderBy("n_nationkey").collect().toSeq ==
      n.orderBy("n_nationkey").collect().toSeq)
  }

  test("append touching EXISTING keys does not duplicate mirror rows") {
    // graft append is NOT upsert: appending a row whose key already
    // exists emits only insert events. The mirror must still eq-delete
    // the touched keys before re-appending their current rows, or the
    // previously exported rows of those keys duplicate.
    val n = Tables.nation(spark, sf)
    val t = GraftTable.create(spark, freshDir("inc3-src"), n,
      keyColumns = Seq("n_nationkey"))
    val dst = freshDir("inc3-dst")
    IcebergExport.export(spark, t, dst)
    // second copy of 5 existing keys — a pure-append range (no deletes)
    t.append(n.filter(col("n_nationkey") < 5))
    IcebergExport.exportIncremental(spark, t, dst)
    val ice = IcebergTable.load(spark, dst)
    val got = ice.scan().orderBy("n_nationkey", "n_name").collect().toSeq
    val want = t.scan().orderBy("n_nationkey", "n_name").collect().toSeq
    assert(got.size == want.size,
      s"mirror has ${got.size} rows, table has ${want.size} — duplicates survived")
    assert(got == want)
  }

  test("catalog-arbitrated commits: CAS is the commit point, stale writers lose") {
    import graft.lake.iceberg.{IcebergExport, IcebergWriter}
    // in-memory arbiter with GraftTable-CAS semantics
    val ptr = new java.util.concurrent.atomic.AtomicReference[(Long, String)](null)
    val arb = new CommitArbiter {
      def commitVersion(expected: Long, v: Long, f: String): Boolean = {
        val cur = ptr.get()
        (cur == null || cur._1 == expected) && ptr.compareAndSet(cur, (v, f))
      }
      def currentVersion(): Option[(Long, String)] = Option(ptr.get())
    }
    val n = Tables.nation(spark, sf)
    val t = GraftTable.create(spark, freshDir("arb-src"), n,
      keyColumns = Seq("n_nationkey"))
    val dst = freshDir("arb-dst")
    IcebergExport.export(spark, t, dst, Some(arb))
    val v1 = ptr.get()._1
    // two writers open the same version; the second to commit must lose
    val w1 = IcebergWriter.open(spark, dst, Some(arb))
    val w2 = IcebergWriter.open(spark, dst, Some(arb))
    w1.append(n.limit(3))
    intercept[java.util.ConcurrentModificationException] {
      w2.append(n.limit(2))
    }
    assert(ptr.get()._1 > v1)
    // a STALE hint must not fool an arbitrated reader: point the hint at
    // v2 (the first-append state) and check load(arbiter) still resolves
    // the CAS'd head
    val hintPath = new org.apache.hadoop.fs.Path(dst, "metadata/version-hint.text")
    val fs = hintPath.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(hintPath, true)
    try out.write("2".getBytes("UTF-8")) finally out.close()
    val viaArb = IcebergTable.load(spark, dst, Some(arb)).scan().count()
    val viaHint = IcebergTable.load(spark, dst).scan().count()
    assert(viaArb == n.count() + 3, "arbitrated read must see the CAS'd head")
    assert(viaHint == n.count(), "hint-following read sees the stale version")
  }

  test("bucket partition layout uses the Iceberg spec hash, not Spark's") {
    val n = Tables.nation(spark, sf)
    val t = GraftTable.create(spark, freshDir("bkt-src"), n,
      partitionBy = Seq("bucket(4,n_nationkey)"))
    val w = IcebergExport.export(spark, t, freshDir("bkt-dst"))
    val ice = IcebergTable.load(spark, w.location)
    // the exported rows must round-trip despite the re-bucketing
    assert(ice.scan().orderBy("n_nationkey").collect().toSeq ==
      t.scan().orderBy("n_nationkey").collect().toSeq)
    // an equality probe must prune to exactly the SPEC-hash bucket's files
    val k = n.orderBy("n_nationkey").head().getInt(
      n.schema.fieldIndex("n_nationkey"))
    val specBucket = IcebergTransforms.bucket(
      k, org.apache.spark.sql.types.IntegerType, 4).get
    val all = ice.planFiles()
    val kept = ice.planFiles(Some(col("n_nationkey") === k))
    assert(kept.nonEmpty && kept.size < all.size,
      s"bucket pruning kept ${kept.size} of ${all.size}")
    assert(kept.forall(_.contains(s"=$specBucket")),
      s"pruned files not in spec bucket $specBucket: $kept")
  }
}
