package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.lake.delta.RoaringBitmapArray

/** Deletion-vector row mask as a native codegen expression — replaces
  * the per-row Scala UDF the Delta/Iceberg DV'd scans carried at six
  * sites (r10 verdict What's-wrong #4; [[IcebergBucket]] is the
  * precedent): `dv_keep(file_path, row_index)` is true iff the row's
  * file has no DV or its bitmap does not hold the row index.
  *
  * `lookup` maps a RAW file path to its bitmap (null = no DV for that
  * file); callers capture their broadcast descriptor map + executor
  * bitmap cache in the closure, exactly as the old UDFs did — but the
  * expression stays inside whole-stage codegen (no ScalaUDF
  * external-conversion boundary) and MEMOIZES the last file's bitmap:
  * parquet rows arrive file-contiguous, so the per-row cost collapses to
  * one UTF8String equality + one Roaring `contains`, with `lookup` (path
  * decode + map probe + cache hit) paid once per file per task. */
case class DvKeep(left: Expression, right: Expression,
    lookup: String => RoaringBitmapArray) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"dv_keep needs (string path, long row_index), got $other")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "dv_keep"

  // last-file memo: task-local (expressions deserialize per task), reset
  // per instance — safe because rows of one parquet file are contiguous
  @transient private var lastPath: UTF8String = _
  @transient private var lastBitmap: RoaringBitmapArray = _

  def keep(path: UTF8String, rowIndex: Long): Boolean = {
    if (lastPath == null || !lastPath.equals(path)) {
      lastPath = path.clone()
      lastBitmap = lookup(path.toString)
    }
    lastBitmap == null || !lastBitmap.contains(rowIndex)
  }

  override protected def nullSafeEval(p: Any, i: Any): Any =
    keep(p.asInstanceOf[UTF8String], i.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvKeep", this, classOf[DvKeep].getName)
    defineCodeGen(ctx, ev, (p, i) => s"$ref.keep($p, $i)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DvKeep {
  /** Column-API wrapper: `DvKeep.column(pathCol, idxCol, lookup)`. */
  def column(path: org.apache.spark.sql.Column,
      rowIndex: org.apache.spark.sql.Column,
      lookup: String => RoaringBitmapArray): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftshim.ColumnExpr.column(
      DvKeep(org.apache.spark.sql.graftshim.ColumnExpr.expression(path),
        org.apache.spark.sql.graftshim.ColumnExpr.expression(rowIndex), lookup))
}
