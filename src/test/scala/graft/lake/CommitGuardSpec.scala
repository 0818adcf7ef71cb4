package graft.lake

import org.scalatest.funsuite.AnyFunSuite

/** The optimistic-concurrency guard at the commit point: a writer that
  * lost the race (its target metadata version already exists) must fail
  * loudly instead of clobbering the winner's commit. (The public API can't
  * reach this state single-threaded — append() refreshes first — so the
  * guard is driven directly.) */
class CommitGuardSpec extends AnyFunSuite {
  import graft.TestSpark._

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
