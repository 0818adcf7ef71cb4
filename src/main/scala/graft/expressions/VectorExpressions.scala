package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression for the vector hot path.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) can express a
  * dot product but evaluate INTERPRETED — ~200 boxed lambda evals per
  * 64-dim pair. On LSH candidate verification that is millions of pairs
  * and was 55 s of the r02 bench. This expression generates a tight
  * primitive `double` loop inside whole-stage codegen instead (the brief's
  * escalation order: builtin functions → custom codegen Expression → UDF
  * never), turning candidate verification into ~64 fused multiply-adds per
  * pair.
  *
  * Element nulls are treated as 0.0 (embeddings are dense; parquet list
  * elements are non-null in practice). Mismatched lengths dot the common
  * prefix — callers pass fixed-dimension embedding columns.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot needs array<double> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Nearest-centroid assignment against a CLOSURE-SHIPPED centroid set —
  * the map-only form of `corpus × broadcast(centroids) → max_by(struct(
  * qround(dot, 4), -c_id))` (Ann.ivfAssign's single-level branch). The
  * join+aggregate shape sorts and re-shuffles every (vector × centroid)
  * row just to take a per-vector argmax; this expression computes the
  * same argmax inside the scan projection, so coarse assignment carries
  * NO shuffle at all (optimization guide §2.4; same posture as the PQ
  * codebook and semantic-dedup centroids — a bounded driver artifact in
  * the task closure, ≤ ceiling × dim × 8 B).
  *
  * Equality contract with the join form (the oracle replays it in SQL):
  *  - per-centroid similarity is floor(dot(u, cu) · 10⁴ + 0.5) / 10⁴ —
  *    the identical IEEE op sequence as qround(DotProduct, 4);
  *  - dot semantics match DotProduct exactly (min-length prefix, null
  *    elements skipped);
  *  - `cids` MUST be sorted ascending and `flat` laid out to match, so
  *    strict `>` keeps the smallest c_id on rounded ties — exactly
  *    max_by's (sim, -c_id) order. Callers guarantee a non-empty set
  *    (an empty one must keep the join shape: it yields zero rows, not
  *    an arbitrary assignment).
  */
case class NearestCentroidId(child: Expression, cids: Array[Long],
    flat: Array[Double], dim: Int) extends UnaryExpression {
  require(cids.nonEmpty && flat.length == cids.length * dim,
    s"graft_nearest_centroid: ${cids.length} ids × $dim dims != ${flat.length} values")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid needs array<double> input, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_nearest_centroid"

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[ArrayData]
    val m = math.min(u.numElements(), dim)
    var best = 0L
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < cids.length) {
      var s = 0.0
      val off = c * dim
      var j = 0
      while (j < m) {
        if (!u.isNullAt(j)) s += u.getDouble(j) * flat(off + j)
        j += 1
      }
      val sim = math.floor(s * 10000.0 + 0.5) / 10000.0
      if (c == 0 || sim > bestSim) { bestSim = sim; best = cids(c) }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, u => {
      val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
      val flatRef = ctx.addReferenceObj("flat", flat, "double[]")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val sim = ctx.freshName("sim")
      val best = ctx.freshName("best")
      val bestSim = ctx.freshName("bestSim")
      s"""
         |int $m = java.lang.Math.min($u.numElements(), $dim);
         |long $best = 0L;
         |double $bestSim = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $cidsRef.length; $c++) {
         |  double $s = 0.0;
         |  int $off = $c * $dim;
         |  for (int $j = 0; $j < $m; $j++) {
         |    if (!$u.isNullAt($j)) $s += $u.getDouble($j) * $flatRef[$off + $j];
         |  }
         |  double $sim = java.lang.Math.floor($s * 10000.0 + 0.5) / 10000.0;
         |  if ($c == 0 || $sim > $bestSim) { $bestSim = $sim; $best = $cidsRef[$c]; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** |A ∩ B| for two SORTED DISTINCT array<long> columns, as a codegen'd
  * merge walk — O(|A|+|B|), no per-element lambda dispatch and no hash-set
  * allocation per row (Spark's array_intersect builds one). Shingle sets
  * are hashed to long and sorted once per document; candidate-pair Jaccard
  * verification then runs entirely inside whole-stage codegen. Callers
  * guarantee sortedness (array_sort ∘ array_distinct); null elements are
  * not expected (xxhash64 never yields null).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count needs array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0
    var j = 0
    var c = 0L
    while (i < x.numElements() && j < y.numElements()) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
