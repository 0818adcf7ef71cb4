package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Full table lifecycle through the REST catalog implementation (the
  * reference's catalog_type='rest' deployment shape) against the bundled
  * in-process catalog service. */
class RestCatalogSpec extends AnyFunSuite {
  import TestSpark._

  private def fresh(name: String): String = {
    val d = s"/root/repo/target/graft-lake-test/$name"
    val p = new org.apache.hadoop.fs.Path(d)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    d
  }

  test("create / load / list / append / scan / drop through the REST catalog") {
    val server = new InMemoryCatalogServer(fresh("rest-wh"))
    try {
      val cat = new RestCatalog(spark, server.uri)
      assert(cat.list().isEmpty && !cat.exists("orders_t"))
      val o = Tables.orders(spark, sf)
      cat.create("orders_t", o.limit(100), keyColumns = Seq("o_orderkey"))
      assert(cat.exists("orders_t"))
      assert(cat.list() == Seq("orders_t"))
      assert(cat.table("orders_t").scan().count() == 100)
      // append + MoR delete through a name-resolved handle
      cat.table("orders_t").append(o.limit(150))
      val t = cat.table("orders_t")
      t.delete(col("o_orderkey") < 0) // no-op delete commit
      assert(t.scan().count() == 250)
      assert(t.meta.snapshots.length == 3)
      // second catalog client sees the same registry (service-owned state)
      val cat2 = new RestCatalog(spark, server.uri)
      assert(cat2.list() == Seq("orders_t"))
      assert(cat2.table("orders_t").scan().count() == 250)
      // duplicate create is a catalog-level conflict
      intercept[RuntimeException] {
        cat2.create("orders_t", o.limit(10), keyColumns = Seq("o_orderkey"))
      }
      // drop removes files and the entry
      val loc = cat.tableLocation("orders_t")
      assert(cat.drop("orders_t"))
      assert(!cat2.exists("orders_t") && cat.list().isEmpty)
      val p = new org.apache.hadoop.fs.Path(loc)
      assert(!p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p),
        "drop must delete the table files")
      intercept[NoSuchElementException] { cat.tableLocation("orders_t") }
    } finally server.stop()
  }

  test("SQL DDL/DML through a REST-backed DSv2 catalog (catalog-type=rest)") {
    val server = new InMemoryCatalogServer(fresh("rest-sql-wh"))
    try {
      spark.conf.set("spark.sql.catalog.graft_rsql",
        classOf[graft.lake.sql.GraftSqlCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft_rsql.catalog-type", "rest")
      spark.conf.set("spark.sql.catalog.graft_rsql.uri", server.uri)
      val o = Tables.orders(spark, sf)
      o.limit(200).createOrReplaceTempView("rest_sql_src")
      spark.sql("DROP TABLE IF EXISTS graft_rsql.orders_t")
      spark.sql(
        """CREATE TABLE graft_rsql.orders_t TBLPROPERTIES('key.columns'='o_orderkey')
           AS SELECT * FROM rest_sql_src""")
      assert(spark.sql("SELECT count(*) FROM graft_rsql.orders_t").head().getLong(0) == 200)
      spark.sql("INSERT INTO graft_rsql.orders_t SELECT * FROM rest_sql_src WHERE o_orderkey % 2 = 0")
      val even = o.limit(200).filter(col("o_orderkey") % 2 === 0).count()
      assert(spark.sql("SELECT count(*) FROM graft_rsql.orders_t").head().getLong(0) == 200 + even)
      // the service owns the registry: the programmatic client sees it
      val cat = new RestCatalog(spark, server.uri)
      assert(cat.list() == Seq("orders_t"))
      assert(spark.sql("SHOW TABLES IN graft_rsql").collect().map(_.getString(1)).toSeq
        == Seq("orders_t"))
      assert(spark.sql("SELECT count(*) FROM graft_rsql.orders_t WHERE o_orderstatus = 'F'")
        .head().getLong(0) > 0)
      spark.sql("DROP TABLE graft_rsql.orders_t")
      assert(cat.list().isEmpty, "SQL drop must remove the service entry too")
    } finally server.stop()
  }

  test("rename: registry-only, data in place, version pointer carried; races arbitrated") {
    val server = new InMemoryCatalogServer(fresh("rest-ren-wh"))
    try {
      val cat = new RestCatalog(spark, server.uri)
      val o = Tables.orders(spark, sf)
      cat.create("orders_a", o.limit(100), keyColumns = Seq("o_orderkey"))
      cat.table("orders_a").append(o.limit(50)) // arbitrated commit → pointer
      val locBefore = cat.tableLocation("orders_a")
      cat.rename("orders_a", "orders_b")
      assert(!cat.exists("orders_a") && cat.exists("orders_b"))
      assert(cat.tableLocation("orders_b") == locBefore,
        "rename must not move data: the new name resolves to the old location")
      assert(cat.table("orders_b").scan().count() == 150,
        "committed version pointer must carry over")
      // the renamed table still commits through the arbiter under its new name
      cat.table("orders_b").append(o.limit(25))
      assert(cat.table("orders_b").scan().count() == 175)
      // missing source / existing destination fail loudly
      intercept[NoSuchElementException] { cat.rename("orders_a", "x") }
      cat.create("orders_c", o.limit(10), keyColumns = Seq("o_orderkey"))
      intercept[RuntimeException] { cat.rename("orders_b", "orders_c") }
      // race: two renames of the same source — exactly one wins
      cat.rename("orders_c", "contender_src") // fresh source for the race
      val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
      val threads = Seq("dst1", "dst2").map { dst =>
        new Thread(() => {
          try { cat.rename("contender_src", dst); results.add(true) }
          catch { case _: Exception => results.add(false) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      import scala.jdk.CollectionConverters._
      assert(results.asScala.count(identity) == 1,
        s"exactly one racing rename may win, got $results")
      assert(Seq("dst1", "dst2").count(cat.exists) == 1)
      assert(!cat.exists("contender_src"))
    } finally server.stop()
  }

  test("SQL ALTER TABLE RENAME through the REST-backed DSv2 catalog") {
    val server = new InMemoryCatalogServer(fresh("rest-ren-sql"))
    try {
      spark.conf.set("spark.sql.catalog.graft_rren",
        classOf[graft.lake.sql.GraftSqlCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft_rren.catalog-type", "rest")
      spark.conf.set("spark.sql.catalog.graft_rren.uri", server.uri)
      val o = Tables.orders(spark, sf)
      o.limit(80).createOrReplaceTempView("rest_ren_src")
      spark.sql(
        """CREATE TABLE graft_rren.t1 TBLPROPERTIES('key.columns'='o_orderkey')
           AS SELECT * FROM rest_ren_src""")
      spark.sql("ALTER TABLE graft_rren.t1 RENAME TO t2")
      assert(spark.sql("SELECT count(*) FROM graft_rren.t2").head().getLong(0) == 80)
      val e = intercept[Exception] { spark.sql("SELECT * FROM graft_rren.t1") }
      assert(e.getMessage.contains("t1"))
      val cat = new RestCatalog(spark, server.uri)
      assert(cat.list() == Seq("t2"))
    } finally server.stop()
  }

  test("maintain() applies property-driven compact + expire + vacuum") {
    val loc = fresh("maintain-auto")
    val o = Tables.orders(spark, sf)
    val t = GraftTable.create(spark, loc, o.repartition(8),
      keyColumns = Seq("o_orderkey"))
    t.delete(col("o_orderstatus") === "P")
    val filesBefore = t.meta.currentSnapshot.get.nDataFiles
    // no properties set → maintain is a no-op
    assert(t.maintain() == Map("compacted" -> 0L, "expired_snapshots" -> 0L,
      "removed_files" -> 0L))
    assert(t.meta.snapshots.length == 2)
    t.setProperty("maintain.compact.min-files", "4")
    t.setProperty("maintain.expire.keep-last", "1")
    t.setProperty("maintain.vacuum.min-age-ms", "0")
    val report = t.maintain()
    assert(report("compacted") == 1L)
    assert(report("expired_snapshots") >= 2L, report.toString) // create+delete+compact → keep 1
    assert(report("removed_files") > 0L, "old data/delete/manifest files must be GC'd")
    assert(t.meta.snapshots.length == 1, "history trimmed to keep-last")
    assert(t.meta.currentSnapshot.get.nDataFiles < filesBefore, "bin-packed")
    assert(t.meta.currentSnapshot.get.deleteFiles.isEmpty, "deletes folded")
    assert(t.scan().count() == o.filter(col("o_orderstatus") =!= "P").count())
    // steady state: run again, nothing left to do
    val again = t.maintain()
    assert(again("compacted") == 0L && again("expired_snapshots") == 0L)
    // a single small delete does NOT trigger a full-table rewrite (the
    // delete-file trigger has its own threshold — compacting on ANY
    // delete would be unbounded write amplification)
    t.delete(col("o_orderkey") % 97 === 0)
    assert(t.meta.currentSnapshot.get.nDeleteFiles == 1)
    assert(t.maintain()("compacted") == 0L,
      "one delete file must not force a compaction cycle")
    t.setProperty("maintain.compact.min-delete-files", "1")
    assert(t.maintain()("compacted") == 1L,
      "the delete-file threshold is property-driven")
  }
}
