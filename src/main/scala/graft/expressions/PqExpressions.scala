package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Product-quantization primitives (FAISS PQ shape, Jégou et al. 2011,
  * "Product Quantization for Nearest Neighbor Search"): a d-dim vector is
  * split into m subvectors, each quantized to its nearest of k per-subspace
  * centroids — m·log₂k bits per vector instead of 4·d bytes (64-dim float
  * → 8 codes of 4 bits = 4 bytes, 64× compression). Search uses
  * ASYMMETRIC DISTANCE (ADC): per query, a LUT of m×k exact
  * query-subvector-to-centroid distances is precomputed, and a corpus
  * vector's distance is m table lookups — no float math per candidate.
  *
  * The codebook is trained driver-side on a bounded sample (k-means per
  * subspace — FAISS trains on samples too; the codebook is a model
  * artifact, not data movement) and embedded in the expressions as
  * literal parameters, like the seeded hyperplanes of
  * [[HyperplaneBandKeys]]. Both expressions are map-only over the corpus.
  */

/** `PqEncode(vec)` → array<long> of m code indices: per subspace, the
  * argmin-distance centroid. `codebook` is flat m·k·(dim/m) doubles. */
case class PqEncode(child: Expression, m: Int, k: Int, dim: Int,
    codebook: Array[Double])
    extends UnaryExpression with CodegenFallback {
  require(dim % m == 0, s"dim $dim not divisible by m $m")
  require(codebook.length == m * k * (dim / m), "codebook size mismatch")
  private val sub = dim / m

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_pq_encode needs array<double>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val codes = new Array[Long](m)
    var s = 0
    while (s < m) {
      var best = 0L
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val off = (s * k + c) * sub
        var d = 0.0
        var j = 0
        while (j < sub) {
          val idx = s * sub + j
          val x = if (idx < n && !v.isNullAt(idx)) v.getDouble(idx) else 0.0
          val diff = x - codebook(off + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c.toLong }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `PqAdcDistance(codes, lut)` → double: Σ_s lut[s·k + codes[s]], the
  * asymmetric query-to-code distance. `lut` is the query's flat m×k
  * table (k inferred from the array sizes). */
case class PqAdcDistance(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_adc needs (array<long> codes, array<double> lut), got $l / $r")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m == 0) return 0.0
    val k = lut.numElements() / m
    var s = 0
    var d = 0.0
    while (s < m) {
      val c = if (codes.isNullAt(s)) 0L else codes.getLong(s)
      val i = s * k + c.toInt
      if (i < lut.numElements() && !lut.isNullAt(i)) d += lut.getDouble(i)
      s += 1
    }
    d
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
