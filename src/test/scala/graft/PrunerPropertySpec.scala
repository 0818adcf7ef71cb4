package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite
import graft.lake.{ColStats, DataFileMeta, FilePruner, Meta}

import scala.util.Random

/** Property test for the scan planner's file skipping: for randomized
  * files (rows + derived min/max stats + partition values) and randomized
  * predicate trees, a file containing ANY matching row must survive
  * pruning. Pruning too much = wrong results at scale; this is the
  * invariant the whole lake read path rests on. (False keeps are fine —
  * the predicate re-applies to rows.)
  */
class PrunerPropertySpec extends AnyFunSuite {

  private val schema = StructType.fromDDL("a BIGINT, s STRING, p STRING, d DECIMAL(10,2)")
  private val pvals = Seq("x", "y", "z", null)
  private val svals = Vector("alpha", "beta", "delta", "gamma", "omega", "zeta")

  // predicate AST mirrored as (Column, row => Boolean-with-null-semantics);
  // rows are (a, s, p-partition, d-decimal-cents)
  private case class P(col: Column, eval: (Long, String, String, Long) => Option[Boolean])

  private def leafA(rnd: Random): P = {
    val v = rnd.between(-10L, 11L)
    rnd.nextInt(5) match {
      case 0 => P(org.apache.spark.sql.functions.col("a") === v, (a, _, _, _) => Some(a == v))
      case 1 => P(org.apache.spark.sql.functions.col("a") < v, (a, _, _, _) => Some(a < v))
      case 2 => P(org.apache.spark.sql.functions.col("a") <= v, (a, _, _, _) => Some(a <= v))
      case 3 => P(org.apache.spark.sql.functions.col("a") > v, (a, _, _, _) => Some(a > v))
      case _ => P(org.apache.spark.sql.functions.col("a") >= v, (a, _, _, _) => Some(a >= v))
    }
  }

  private def leafS(rnd: Random): P = {
    val v = svals(rnd.nextInt(svals.length))
    rnd.nextInt(4) match {
      case 0 => P(col("s") === v, (_, s, _, _) => Some(s == v))
      case 1 => P(col("s") < v, (_, s, _, _) => Some(s < v))
      case 2 => P(col("s") > v, (_, s, _, _) => Some(s > v))
      case _ => P(col("s") >= v, (_, s, _, _) => Some(s >= v))
    }
  }

  private def leafP(rnd: Random): P = {
    val v = pvals(rnd.nextInt(3)) // non-null literal
    rnd.nextInt(4) match {
      case 0 => P(col("p") === v, (_, _, p, _) => if (p == null) None else Some(p == v))
      case 1 => P(col("p") =!= v, (_, _, p, _) => if (p == null) None else Some(p != v))
      case 2 => P(col("p").isNull, (_, _, p, _) => Some(p == null))
      case _ => P(col("p").isNotNull, (_, _, p, _) => Some(p != null))
    }
  }

  /** decimal leaf: literal is a typed java BigDecimal with 2-dp scale,
    * rows carry cents — exercises the "c" stats domain end to end. */
  private def leafD(rnd: Random): P = {
    val cents = rnd.between(-1000L, 1001L)
    val v = java.math.BigDecimal.valueOf(cents, 2)
    val c = lit(v)
    rnd.nextInt(5) match {
      case 0 => P(col("d") === c, (_, _, _, d) => Some(d == cents))
      case 1 => P(col("d") < c, (_, _, _, d) => Some(d < cents))
      case 2 => P(col("d") <= c, (_, _, _, d) => Some(d <= cents))
      case 3 => P(col("d") > c, (_, _, _, d) => Some(d > cents))
      case _ => P(col("d") >= c, (_, _, _, d) => Some(d >= cents))
    }
  }

  private def gen(rnd: Random, depth: Int): P =
    if (depth == 0 || rnd.nextInt(3) == 0) {
      rnd.nextInt(4) match {
        case 0 => leafA(rnd)
        case 1 => leafS(rnd)
        case 2 => leafD(rnd)
        case _ => leafP(rnd)
      }
    } else {
      val l = gen(rnd, depth - 1)
      val r = gen(rnd, depth - 1)
      if (rnd.nextBoolean())
        P(l.col && r.col, (a, s, p, d) => (l.eval(a, s, p, d), r.eval(a, s, p, d)) match {
          case (Some(false), _) | (_, Some(false)) => Some(false)
          case (Some(true), Some(true)) => Some(true)
          case _ => None // SQL three-valued AND with NULL
        })
      else
        P(l.col || r.col, (a, s, p, d) => (l.eval(a, s, p, d), r.eval(a, s, p, d)) match {
          case (Some(true), _) | (_, Some(true)) => Some(true)
          case (Some(false), Some(false)) => Some(false)
          case _ => None
        })
    }

  test("a file with any matching row always survives pruning (1000 cases)") {
    val rnd = new Random(42)
    var checkedKeeps = 0
    for (i <- 1 to 1000) {
      val pv = pvals(rnd.nextInt(pvals.length))
      val rows = Seq.fill(rnd.between(1, 8))(
        (rnd.between(-10L, 11L), svals(rnd.nextInt(svals.length)),
          rnd.between(-1000L, 1001L)))
      val stats = Map(
        "a" -> ColStats("l", rows.map(_._1).min.toString, rows.map(_._1).max.toString, 0L),
        "s" -> ColStats("s", rows.map(_._2).min, rows.map(_._2).max, 0L),
        "d" -> ColStats("c",
          java.math.BigDecimal.valueOf(rows.map(_._3).min, 2).toPlainString,
          java.math.BigDecimal.valueOf(rows.map(_._3).max, 2).toPlainString, 0L))
      val file = DataFileMeta("data/s1-f.parquet", 1L, rows.size.toLong, 1L,
        Map("p" -> (if (pv == null) Meta.NullPartition else pv)), stats)
      val pred = gen(rnd, 2)
      val kept = FilePruner.prune(Seq(file), Some(pred.col), Seq("p"), schema).nonEmpty
      val anyMatch = rows.exists { case (a, s, d) => pred.eval(a, s, pv, d).contains(true) }
      if (anyMatch) {
        assert(kept, s"case $i: pruned a file with a matching row (p=$pv rows=$rows)")
        checkedKeeps += 1
      }
    }
    assert(checkedKeeps > 300, s"generator too weak: only $checkedKeeps positive cases")
  }
}
