package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Cross-table ACID through the catalog (the reference's "ACID
  * Transactions … across lakehouse and local tables", README.md:14-16):
  * `Catalog.transact` stages every table's commit and the catalog CASes
  * all version pointers in one atomic multi-key operation — the
  * ingest-then-retire pipeline either fully commits or fully retries. */
class TransactionSpec extends AnyFunSuite {
  import TestSpark._

  private def fresh(name: String): String = {
    val d = s"/root/repo/target/graft-lake-test/$name"
    val p = new org.apache.hadoop.fs.Path(d)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    d
  }

  test("ingest+retire across two tables commits atomically") {
    val server = new InMemoryCatalogServer(fresh("txn-wh"))
    try {
      val cat = new RestCatalog(spark, server.uri)
      val o = Tables.orders(spark, sf)
      cat.create("facts", o.limit(100), keyColumns = Seq("o_orderkey"))
      cat.create("staging", o.filter(col("o_orderkey") > 1000).limit(50),
        keyColumns = Seq("o_orderkey"))
      val stagedRows = cat.table("staging").scan()
      val moved = stagedRows.count()
      cat.transact(Seq("facts", "staging")) { t =>
        val rows = t("staging").scan().localCheckpoint()
        t("facts").append(rows)
        t("staging").delete(lit(true))
      }
      assert(cat.table("facts").scan().count() == 100 + moved)
      assert(cat.table("staging").scan().count() == 0)
      // both tables advanced exactly one commit
      assert(cat.table("facts").meta.snapshots.length == 2)
      assert(cat.table("staging").meta.snapshots.length == 2)
    } finally server.stop()
  }

  test("two ops on ONE table inside a transaction stack — the first is not lost") {
    val server = new InMemoryCatalogServer(fresh("txn-stack-wh"))
    try {
      val cat = new RestCatalog(spark, server.uri)
      val sp = spark; import sp.implicits._
      cat.create("t", Seq((1L, "a")).toDF("id", "v"), keyColumns = Seq("id"))
      // regression: each mutator starts with refresh(); inside a
      // transaction that must return the STAGED state, or the second op
      // bases itself on published metadata and silently drops the first
      // op's snapshot from the log it publishes
      cat.transact(Seq("t")) { h =>
        h("t").append(Seq((2L, "b")).toDF("id", "v"))
        h("t").append(Seq((3L, "c")).toDF("id", "v"))
      }
      val t = cat.table("t")
      assert(t.scan().count() == 3, "both staged appends must survive the CAS")
      assert(t.meta.snapshots.length == 3) // create + 2 stacked ops
      // mixed shapes stack too: append then delete sees the append
      cat.transact(Seq("t")) { h =>
        h("t").append(Seq((4L, "d")).toDF("id", "v"))
        h("t").delete(col("id") === 1L)
      }
      assert(cat.table("t").scan().select("id").as[Long].collect().sorted
        .toSeq == Seq(2L, 3L, 4L))
    } finally server.stop()
  }

  test("a racing writer forces the WHOLE transaction to retry — never a partial commit") {
    val server = new InMemoryCatalogServer(fresh("txn-race-wh"))
    try {
      val cat = new RestCatalog(spark, server.uri)
      val o = Tables.orders(spark, sf)
      cat.create("facts2", o.limit(100), keyColumns = Seq("o_orderkey"))
      cat.create("staging2", o.filter(col("o_orderkey") > 2000).limit(30),
        keyColumns = Seq("o_orderkey"))
      val moved = cat.table("staging2").scan().count()
      var attempts = 0
      var interfered = false
      cat.transact(Seq("facts2", "staging2")) { t =>
        attempts += 1
        val rows = t("staging2").scan().localCheckpoint()
        t("facts2").append(rows)
        t("staging2").delete(lit(true))
        if (!interfered) {
          // between staging and commitAll, an INDEPENDENT writer advances
          // facts2 — the transaction's CAS must lose on BOTH tables'
          // behalf and re-run from fresh metadata
          interfered = true
          cat.table("facts2").append(o.limit(7))
        }
      }
      assert(attempts == 2, s"expected exactly one retry, got $attempts attempts")
      assert(cat.table("facts2").scan().count() == 100 + 7 + moved)
      assert(cat.table("staging2").scan().count() == 0)
      // the interloper's snapshot AND the transaction's are both present
      assert(cat.table("facts2").meta.snapshots.length == 3)
    } finally server.stop()
  }

  test("concurrent transactions on overlapping tables serialize to a consistent total") {
    val server = new InMemoryCatalogServer(fresh("txn-conc-wh"))
    try {
      val cat = new RestCatalog(spark, server.uri)
      val sp = spark; import sp.implicits._
      cat.create("ledger", Seq((0L, 0L)).toDF("id", "amount"),
        keyColumns = Seq("id"))
      cat.create("journal", Seq((0L, 0L)).toDF("id", "amount"),
        keyColumns = Seq("id"))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      try {
        val futures = (1 to 4).map { k =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            override def call(): Unit =
              cat.transact(Seq("ledger", "journal"), maxAttempts = 20) { t =>
                t("ledger").append(Seq((k.toLong, 10L)).toDF("id", "amount"))
                t("journal").append(Seq((k.toLong, -10L)).toDF("id", "amount"))
              }
          })
        }
        futures.foreach(_.get())
      } finally pool.shutdown()
      // every transaction landed on BOTH tables: 4 appends each, and the
      // cross-table invariant (sum ledger + sum journal = 0) holds
      val ledger = cat.table("ledger").scan()
      val journal = cat.table("journal").scan()
      assert(ledger.count() == 5 && journal.count() == 5)
      assert(ledger.agg(sum("amount")).head().getLong(0) +
        journal.agg(sum("amount")).head().getLong(0) == 0L)
      assert(cat.table("ledger").meta.snapshots.length == 5)
      assert(cat.table("journal").meta.snapshots.length == 5)
    } finally server.stop()
  }

  test("directory catalogs refuse transact loudly (no false atomicity)") {
    val cat = new GraftCatalog(spark, fresh("txn-dir-wh"))
    val sp = spark; import sp.implicits._
    cat.create("a", Seq((1L, 1L)).toDF("id", "v"), keyColumns = Seq("id"))
    intercept[IllegalArgumentException] {
      cat.transact(Seq("a")) { t => t("a").append(Seq((2L, 2L)).toDF("id", "v")) }
    }
  }
}
