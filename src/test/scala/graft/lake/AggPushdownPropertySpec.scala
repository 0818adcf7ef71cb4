package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

import graft.{Tables, TestSpark}

/** Property test for the metadata aggregate pushdown: for a randomized
  * predicate grammar over a partition column (with a NULL partition in
  * play), grouped and ungrouped COUNT/MIN/MAX through the graft catalog
  * must equal the same SQL over the raw source — REGARDLESS of whether
  * the metadata fast path or the scan fallback executes. Wrong-but-fast
  * is the failure mode this pins down; which path ran is irrelevant to
  * the property (AggPushdownSpec asserts path selection separately). */
class AggPushdownPropertySpec extends AnyFunSuite {
  import TestSpark._

  test("randomized partition predicates: pushdown == source SQL") {
    val cat = "graft_aggprop"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.lake.sql.GraftSqlCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
      "/root/repo/target/graft-lake-test/aggprop-wh")
    val src = Tables.orders(spark, sf).withColumn("p",
      when(col("o_orderkey") % 11 === 0, lit(null: String))
        .otherwise(col("o_orderstatus")))
    val loc = "/root/repo/target/graft-lake-test/aggprop-wh/t"
    val hp = new Path(loc)
    hp.getFileSystem(spark.sessionState.newHadoopConf()).delete(hp, true)
    GraftTable.create(spark, loc, src, partitionBy = Seq("p"))
    src.createOrReplaceTempView("aggprop_src")

    val rnd = new Random(42)
    val lits = Seq("'F'", "'O'", "'P'")
    def leaf(): String = rnd.nextInt(8) match {
      case 0 => s"p = ${lits(rnd.nextInt(3))}"
      case 1 => s"p <> ${lits(rnd.nextInt(3))}"
      case 2 => s"p < ${lits(rnd.nextInt(3))}"
      case 3 => s"p >= ${lits(rnd.nextInt(3))}"
      case 4 => s"p IN (${lits(rnd.nextInt(3))}, ${lits(rnd.nextInt(3))})"
      case 5 => "p IS NULL"
      case 6 => "p IS NOT NULL"
      case _ => s"p <=> ${lits(rnd.nextInt(3))}"
    }
    def pred(depth: Int): String =
      if (depth == 0) leaf()
      else rnd.nextInt(3) match {
        case 0 => s"(${pred(depth - 1)} AND ${pred(depth - 1)})"
        case 1 => s"(${pred(depth - 1)} OR ${pred(depth - 1)})"
        case _ => s"(NOT ${pred(depth - 1)})"
      }

    def rows(sql: String): Seq[String] =
      spark.sql(sql).collect().map(_.toString).sorted.toSeq

    for (i <- 1 to 40) {
      val w = pred(rnd.nextInt(3))
      val flat =
        s"SELECT count(*) AS n, count(p) AS c, min(o_orderkey) AS mn, max(o_orderkey) AS mx"
      val grouped = s"SELECT p, count(*) AS n, max(o_orderkey) AS mx"
      assert(rows(s"$flat FROM $cat.t WHERE $w") ==
        rows(s"$flat FROM aggprop_src WHERE $w"),
        s"case $i flat diverged for WHERE $w")
      assert(rows(s"$grouped FROM $cat.t WHERE $w GROUP BY p") ==
        rows(s"$grouped FROM aggprop_src WHERE $w GROUP BY p"),
        s"case $i grouped diverged for WHERE $w")
    }
  }
}
