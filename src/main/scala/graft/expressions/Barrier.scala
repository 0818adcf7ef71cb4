package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that pins its expression WHERE THE QUERY PUT IT, by
  * reporting itself non-deterministic to the optimizer (evaluation is the
  * child's, bit for bit — this changes placement, never values).
  *
  * Why it exists (r16 opt): `Tables.fanOut` round-robin-repartitions a
  * narrow source so expensive per-row work runs wide. But
  * PushDownPredicates happily pushes a deterministic Filter back through
  * the repartition — so a costly predicate (pipeline_end_to_end's fused
  * quality + langid gate: dozens of split/regexp evaluations per row)
  * lands BELOW the exchange, serialized into however few tasks the
  * source's split count allows (one, for a single gzip/small-parquet
  * input — guide §2.5 "input skew"). Wrapping the predicate keeps it
  * above the exchange: the scan stays a cheap read, the fan-out spreads
  * the regex work, and on an already-wide source (fanOut no-ops at real
  * scale, leaving no exchange) the wrapper costs nothing beyond forgoing
  * pushdown of a predicate the scan could never use anyway.
  *
  * Use ONLY on expensive predicates deliberately placed above a fan-out;
  * a barrier on a cheap or scan-pushable predicate just disables
  * legitimate optimization.
  */
case class PushdownBarrier(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  // the whole point: the optimizer may not move, duplicate or fold what
  // it believes is non-deterministic (the guide's §4.4 trick, natively)
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "graft_pinned"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
