package graft.lake.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.LongType

/** Vectorized fast path for SQL reads of graft tables: once a plan is
  * fully resolved, every `DataSourceV2Relation` over a [[GraftSqlTable]]
  * is substituted with the table's NATIVE scan plan (the same vectorized
  * parquet + MoR anti-join tree the programmatic API builds), remapped to
  * the relation's attribute ids. The V1Scan bridge then never executes
  * for reads, which removes its `RDD[Row]` materialization boundary — the
  * whole query stays inside whole-stage codegen, and Catalyst pushes the
  * query's own filters/projections into the parquet scans.
  *
  * A `Filter` directly above the relation additionally feeds its resolved
  * predicate to `FilePruner`, so manifest-level file skipping happens at
  * analysis time — this is the scan-planner role the reference runs
  * before scheduling tasks (scan_ops.c:62-120). The Filter node itself is
  * kept, so pruning remains an IO-only optimization.
  *
  * Installed by [[graft.GraftExtensions]]
  * (`spark.sql.extensions=graft.GraftExtensions`). Sessions without the
  * extension fall back to the V1Scan read path — same results, one row
  * boundary slower. `spark.graft.nativeScan.enabled=false` disables the
  * substitution (used by specs to pin the fallback path).
  *
  * Write commands are left intact — only their `query` side is
  * substituted, never the write TARGET relation.
  */
class GraftNativeScanRule extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.nativeScan.enabled", "true") == "true"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled || !plan.resolved) plan
    else plan match {
      case w: org.apache.spark.sql.catalyst.plans.logical.V2WriteCommand =>
        w.withNewQuery(apply(w.query))
      // any other command (DELETE FROM, DDL, CTAS, …) keeps its relations:
      // row-level commands NEED the DSv2 table node, and a command's read
      // side still works through the V1 path
      case c: org.apache.spark.sql.catalyst.plans.logical.Command => c
      case _ => plan.transformDown {
        case MetadataAggregate(replaced) => replaced
        case Filter(cond, sa @ SubqueryAlias(_,
            rel @ DataSourceV2Relation(t: GraftSqlTable, _, _, _, _, _))) =>
          Filter(cond, sa.copy(child = substitute(rel, t, Some(cond))))
        case Filter(cond, rel @ DataSourceV2Relation(t: GraftSqlTable, _, _, _, _, _)) =>
          Filter(cond, substitute(rel, t, Some(cond)))
        case rel @ DataSourceV2Relation(t: GraftSqlTable, _, _, _, _, _) =>
          substitute(rel, t, None)
      }
    }

  /** Metadata-only aggregates: `Aggregate` (no GROUP BY; COUNT / MIN /
    * MAX only) over a graft relation, with every WHERE conjunct EXACTLY
    * decidable from identity partition values, collapses into a
    * `LocalRelation` holding the one driver-computed row — zero data
    * files opened (see [[AggPushdown]] for the refusal rules; Iceberg's
    * aggregate pushdown, here at analysis time because this rule replaces
    * the DSv2 relation before `V2ScanRelationPushDown` could run). */
  private object MetadataAggregate extends PredicateHelper {
    def unapply(plan: LogicalPlan): Option[LogicalPlan] = plan match {
      case agg @ Aggregate(Nil, aggExprs, child, _) =>
        // strip alias/filter wrappers down to the graft relation
        var filters: Seq[Expression] = Nil
        var cur = child
        var continue = true
        while (continue) cur match {
          case SubqueryAlias(_, c) => cur = c
          case Filter(cond, c) => filters = filters ++ splitConjunctivePredicates(cond); cur = c
          case Project(exprs, c) if exprs.forall(_.isInstanceOf[AttributeReference]) => cur = c
          case _ => continue = false
        }
        cur match {
          case DataSourceV2Relation(t: GraftSqlTable, _, _, _, _, _) =>
            try buildLocal(t, agg, aggExprs, filters)
            catch { case _: Throwable => None }
          case _ => None
        }
      case _ => None
    }

    private def buildLocal(
        t: GraftSqlTable,
        agg: Aggregate,
        aggExprs: Seq[NamedExpression],
        filters: Seq[Expression]): Option[LogicalPlan] = {
      // every result expression: an Alias over one plain aggregate call
      val metas = aggExprs.map {
        case Alias(AggregateExpression(fn, Complete, false, None, _), _) => fn match {
          case Count(Seq(Literal(v, _))) =>
            if (v == null) return None // count(NULL) ≡ 0 — rare; keep simple
            AggPushdown.MCountStar
          case Count(Seq(a: AttributeReference)) => AggPushdown.MCount(a.name)
          case Min(a: AttributeReference) => AggPushdown.MMin(a.name)
          case Max(a: AttributeReference) => AggPushdown.MMax(a.name)
          case _ => return None
        }
        case _ => return None
      }
      val v1Filters = filters.map(f =>
        org.apache.spark.sql.graftshim.ColumnExpr.toV1Filter(f)
          .getOrElse(return None))
      AggPushdown.computeAggs(t.table, t.asOf, metas, v1Filters).map { vals =>
        val row = InternalRow.fromSeq(vals.map {
          case Left(n) => n
          case Right((dt, v)) => v.map(AggPushdown.internal(_, dt)).orNull
        })
        // sanity: Aggregate output types must line up with what we computed
        aggExprs.zip(vals).foreach {
          case (e, Left(_)) => require(e.dataType == LongType, s"count type ${e.dataType}")
          case (e, Right((dt, _))) => require(e.dataType == dt, s"${e.dataType} != $dt")
        }
        LocalRelation(agg.output, Seq(row))
      }
    }
  }

  /** Native scan plan with the relation's output attribute ids. Any
    * failure leaves the relation in place — the V1Scan path still
    * produces correct results. */
  private def substitute(
      rel: DataSourceV2Relation,
      t: GraftSqlTable,
      pruneWith: Option[Expression]): LogicalPlan =
    try {
      // respect a time-travel pin (VERSION/TIMESTAMP AS OF → t.asOf)
      val native = t.table.scanPrunedOnly(pruneWith, t.asOf).queryExecution.analyzed
      // remap by NAME: hive discovery may order partition columns after
      // the data columns, so positional zip would misalign them
      val byName = native.output.map(a => a.name -> a).toMap
      val remapped: Seq[NamedExpression] = rel.output.map { to =>
        Alias(byName(to.name), to.name)(exprId = to.exprId)
      }
      Project(remapped, native)
    } catch { case _: Throwable => rel }
}
