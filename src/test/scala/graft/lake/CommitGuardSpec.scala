package graft.lake

import org.scalatest.funsuite.AnyFunSuite

/** The optimistic-concurrency guard at the commit point: a writer that
  * lost the race (its target metadata version already exists) must fail
  * loudly instead of clobbering the winner's commit. (The public API can't
  * reach this state single-threaded — append() refreshes first — so the
  * guard is driven directly.) */
class CommitGuardSpec extends AnyFunSuite {
  import graft.TestSpark._

  test("a data commit racing a rename DDL fails loudly; additive DDL merges") {
    val loc = "/root/repo/target/graft-lake-test/epoch-race"
    val p = new org.apache.hadoop.fs.Path(loc)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    val t = GraftTable.create(spark, loc,
      graft.Tables.orders(spark, sf).limit(5), keyColumns = Seq("o_orderkey"))
    // appender state: files written under epoch E1 (simulated — the guard
    // fires before any file IO, so the meta entry never needs a real file)
    val base = t.meta
    val fake = DataFileMeta(s"data/s${base.currentSnapshotId + 1}-ffake-00000.parquet",
      base.currentSnapshotId + 1, 1L, 1L, Map.empty, Map.empty)
    // concurrent RENAME lands first; the racing appender enters with the
    // PRE-DDL meta → the commit must fail loudly, not null-fill
    t.renameColumn("o_totalprice", "o_price")
    val e = intercept[RuntimeException] {
      t.commitRetrying(base, "append", base.currentSnapshotId + 1,
        Seq(fake), Nil, GraftTable.MergeAny)
    }
    assert(e.getMessage.contains("schema epoch"), e.getMessage)
    // a concurrent ADD-COLUMN is additive: null-fill IS its semantics
    val base2 = t.refresh()
    t.addColumn("o_extra", "STRING")
    val id = t.commitRetrying(base2, "append", base2.currentSnapshotId + 1,
      Seq(fake.copy()), Nil, GraftTable.MergeAny)
    assert(id > 0, "additive DDL must not block the racing append")
  }

  test("widenColumn refuses partition-source and key columns") {
    val loc = "/root/repo/target/graft-lake-test/widen-guard"
    val p = new org.apache.hadoop.fs.Path(loc)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    val o = graft.Tables.orders(spark, sf).limit(50)
      .withColumn("k_int", org.apache.spark.sql.functions.col("o_orderkey").cast("int"))
    val t = GraftTable.createEmpty(spark, loc, o.schema,
      partitionBy = Seq("bucket(4,k_int)"), keyColumns = Seq("o_orderkey"))
    t.append(o)
    // bucket dirs hash the SOURCE TYPE: int and long hash differently —
    // widening would silently mis-prune every pre-widen bucket
    intercept[IllegalArgumentException] { t.widenColumn("k_int", "BIGINT") }
    // delete files hold the old width for key columns
    val p2 = new org.apache.hadoop.fs.Path(loc + "-key")
    p2.getFileSystem(spark.sessionState.newHadoopConf()).delete(p2, true)
    val t2 = GraftTable.create(spark,
      loc + "-key", o.withColumn("ki", org.apache.spark.sql.functions.col("k_int")),
      keyColumns = Seq("ki"))
    intercept[IllegalArgumentException] { t2.widenColumn("ki", "BIGINT") }
  }

  test("committing an already-taken metadata version fails") {
    val loc = "/root/repo/target/graft-lake-test/commit-guard"
    val p = new org.apache.hadoop.fs.Path(loc)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    val t = GraftTable.create(spark, loc,
      graft.Tables.orders(spark, sf).limit(5), keyColumns = Seq("o_orderkey"))
    val stale = t.meta // this version is already on disk — a lost race
    val e = intercept[RuntimeException] { t.writeMeta(stale) }
    assert(e.getMessage.contains("concurrent commit"))
    // table is still readable and unchanged
    assert(GraftTable.load(spark, loc).scan().count() == 5)
  }
}
