package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.lake.iceberg.IcebergTransforms

/** Static hash kernels behind [[IcebergBucket]] — plain object methods so
  * generated code calls them through the class's static forwarders. The
  * long kernel inlines Murmur3 x86-32 over the value's 8-byte
  * little-endian form (spec Appendix B) without allocating the buffer:
  * the two 4-byte LE blocks of a long are just its low and high words. */
object IcebergBucketOps {
  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  def bucketOfLong(v: Long, n: Int): Int = {
    var h = 0
    var k = (v & 0xffffffffL).toInt
    k *= C1; k = Integer.rotateLeft(k, 15); k *= C2
    h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
    k = (v >>> 32).toInt
    k *= C1; k = Integer.rotateLeft(k, 15); k *= C2
    h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
    h ^= 8
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35; h ^= h >>> 16
    (h & Integer.MAX_VALUE) % n
  }

  def bucketOfUtf8(s: UTF8String, n: Int): Int =
    (IcebergTransforms.murmur3x86(s.getBytes, 0) & Integer.MAX_VALUE) % n
}

/** Iceberg `bucket[n]` as a native codegen expression (table spec
  * "Partition Transforms" + Appendix B: murmur3_x86_32 seed 0 over the
  * spec's byte serialization — NOT Spark's `hash()`, which uses seed 42
  * and different bytes). Replaces the per-row Scala UDF the export
  * writer used on its data-write hot path (r09 verdict #3): inputs stay
  * unboxed primitives / UTF8String inside whole-stage codegen.
  * DateType's internal form is epoch-day Int, which hashes through the
  * same 8-byte-LE long kernel the spec prescribes for dates. */
case class IcebergBucket(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"iceberg_bucket needs n > 0, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType | LongType | StringType | DateType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"iceberg_bucket supports int/long/string/date, got $other")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "iceberg_bucket"

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case IntegerType | DateType =>
      IcebergBucketOps.bucketOfLong(v.asInstanceOf[Int].toLong, n)
    case LongType => IcebergBucketOps.bucketOfLong(v.asInstanceOf[Long], n)
    case StringType =>
      IcebergBucketOps.bucketOfUtf8(v.asInstanceOf[UTF8String], n)
    case other => throw new IllegalStateException(s"iceberg_bucket over $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => child.dataType match {
      case IntegerType | LongType | DateType =>
        s"graft.expressions.IcebergBucketOps.bucketOfLong((long)$c, $n)"
      case StringType =>
        s"graft.expressions.IcebergBucketOps.bucketOfUtf8($c, $n)"
      case other => throw new IllegalStateException(s"iceberg_bucket over $other")
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
