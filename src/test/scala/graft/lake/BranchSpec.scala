package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Writable branch refs + write-audit-publish: commits target a branch
  * head while main stays untouched; fastForward publishes the audited
  * state as a pointer CAS. The workflow half of snapshot refs (tags are
  * the read half, r05) — what a lake crew uses for risky backfills. */
class BranchSpec extends AnyFunSuite {
  import TestSpark._

  private def freshDir(name: String): String = {
    val d = s"/root/repo/target/graft-lake-test/$name"
    val p = new org.apache.hadoop.fs.Path(d)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    d
  }

  test("write-audit-publish: branch commits invisible on main until fastForward") {
    val o = Tables.orders(spark, sf)
    val wh = freshDir("branch-wap-wh")
    val t = GraftTable.create(spark, s"$wh/t",
      o.filter(col("o_orderkey") % 2 === 0), keyColumns = Seq("o_orderkey"))
    val mainCount = t.scan().count()
    t.branch("audit")
    val audit = t.forBranch("audit")
    // WRITE: backfill the odd keys onto the branch
    audit.append(o.filter(col("o_orderkey") % 2 === 1))
    // the branch handle sees the write; main does not
    assert(audit.scan().count() == o.count())
    assert(t.refresh().currentSnapshotId == 1, "main pointer must not move")
    assert(t.scan().count() == mainCount, "branch write must be invisible on main")
    assert(GraftTable.load(spark, t.location).scan().count() == mainCount,
      "a fresh reader sees main, not the branch")
    // AUDIT: branch-side validation (row count doubles, no dup keys)
    assert(audit.scan().groupBy("o_orderkey").count()
      .filter(col("count") > 1).count() == 0)
    // branch ops beyond append work too: MoR delete on the branch only
    audit.delete(col("o_orderstatus") === "P")
    val audited = o.filter(col("o_orderstatus") =!= "P").count()
    assert(audit.scan().count() == audited)
    assert(t.scan().count() == mainCount, "branch delete invisible on main")
    // PUBLISH: pointer-only fast-forward
    val head = t.fastForward("audit")
    assert(head == t.branchHead("audit"))
    assert(t.scan().count() == audited)
    assert(GraftTable.load(spark, t.location).scan().count() == audited)
    // publishing created NO new snapshot — it moved the pointer
    assert(t.meta.currentSnapshotId == head)
  }

  test("incremental/CDC/timestamp readers never leak another branch's commits") {
    val sp = spark; import sp.implicits._
    val t = GraftTable.create(spark, freshDir("branch-leak"),
      Seq((1L, "a")).toDF("id", "v"), keyColumns = Seq("id"))
    t.branch("audit")
    // snapshot 2 lives ONLY on the branch; snapshot 3 advances main
    t.forBranch("audit").append(Seq((2L, "branch-only")).toDF("id", "v"))
    t.append(Seq((3L, "main")).toDF("id", "v"))
    // changes(): a main tail over (1, head] must deliver main's rows only
    val got = t.changes(1L, t.refresh().currentSnapshotId)
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(3L), s"branch snapshot leaked into changes(): $got")
    // cdc(): same lineage restriction (regression: the id-range walk
    // used to include the unpublished branch commit)
    val cdcIds = t.cdc(1L, t.refresh().currentSnapshotId)
      .select("id").as[Long].collect().toSeq
    assert(cdcIds == Seq(3L), s"branch snapshot leaked into cdc(): $cdcIds")
    // timestamp travel: "latest at now" on a MAIN handle must resolve to
    // main's head even though the branch head is newer in the log
    assert(t.snapshotAsOfTime(System.currentTimeMillis() + 60000) ==
      t.meta.currentSnapshotId)
    assert(t.scanAsOfTime(System.currentTimeMillis() + 60000)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    // the branch handle's own readers see the branch lineage
    assert(t.forBranch("audit").changes(1L, t.branchHead("audit"))
      .select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("fastForward refuses when main advanced off the branch lineage") {
    val o = Tables.orders(spark, sf)
    val t = GraftTable.create(spark, freshDir("branch-diverge"),
      o.limit(100), keyColumns = Seq("o_orderkey"))
    t.branch("audit")
    t.forBranch("audit").append(o.limit(10))
    // main diverges: a direct commit after the branch point
    t.append(o.limit(5))
    val e = intercept[IllegalArgumentException] { t.fastForward("audit") }
    assert(e.getMessage.contains("not an ancestor"))
    // both lineages intact and independently readable
    assert(t.scan().count() == 105)
    assert(t.forBranch("audit").scan().count() == 110)
    // global snapshot ids never collide across branches
    val ids = t.meta.snapshots.map(_.id)
    assert(ids.distinct.length == ids.length, s"duplicate snapshot ids: $ids")
  }

  test("SQL VERSION AS OF reads a branch head; refs pin retention") {
    val o = Tables.orders(spark, sf)
    val wh = freshDir("branch-sql-wh")
    val t = GraftTable.create(spark, s"$wh/t", o.limit(50),
      keyColumns = Seq("o_orderkey"))
    t.branch("audit")
    t.forBranch("audit").append(o.limit(20))
    spark.conf.set("spark.sql.catalog.graft_br",
      classOf[graft.lake.sql.GraftSqlCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_br.warehouse", wh)
    assert(spark.sql("SELECT count(*) FROM graft_br.t").head().getLong(0) == 50)
    assert(spark.sql("SELECT count(*) FROM graft_br.t VERSION AS OF 'audit'")
      .head().getLong(0) == 70)
    // churn main, then expire aggressively: the branch head must survive
    (1 to 3).foreach(_ => t.append(o.limit(1)))
    t.expireSnapshots(1)
    assert(t.forBranch("audit").scan().count() == 70,
      "branch heads are retention pins")
    // main diverged (3 appends), so publishing the stale branch refuses
    intercept[IllegalArgumentException] { t.fastForward("audit") }
  }

  test("all-digit ref names are rejected so snapshot-id travel stays unambiguous") {
    val sp = spark; import sp.implicits._
    val t = GraftTable.create(spark, freshDir("branch-digit"),
      Seq((1L, "a")).toDF("id", "v"), keyColumns = Seq("id"))
    intercept[IllegalArgumentException] { t.tag("3", 1L) }
    intercept[IllegalArgumentException] { t.branch("20240110") }
    t.tag("v3", 1L) // mixed names still fine
    t.branch("b3")
  }
}
