package graft.lake.sql

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

/** DYNAMIC bucket-transform pruning for interop estates (r16, verdict
  * #3): Spark's own PartitionPruning rule fires only when the JOIN KEY
  * is itself a partition column — on a `bucket[N]`-partitioned Iceberg
  * estate the join runs on the SOURCE column while the dirs hold the
  * derived bucket ordinal, so a selective dim filter pruned nothing at
  * runtime (static bucket pruning of literal predicates has existed
  * since r05's transform pruning; the runtime half is what this adds —
  * reference context: pg_lakehouse_iceberg's scan-time file pruning,
  * iceberg_bridge.h parallel-plan).
  *
  * Mechanism: the verified hive-layout read ([[graft.lake.iceberg
  * .IcebergTable]]) exposes each verified bucket dir as a genuine int
  * partition column and records `graft.dpp.bucket.<dirCol> =
  * <sourceCol>:<N>` in the relation's options. For an equi-join
  * `fact.src = build.k` over such a relation, this rule inserts
  *
  *   Filter(DynamicPruningSubquery(dirCol, buildPlan,
  *          [iceberg_bucket(k, N)], [0], onlyInBroadcast = false), rel)
  *
  * directly above the relation: Spark's PlanDynamicPruningFilters plans
  * the build side as a distinct-aggregate subquery (or a reused
  * broadcast keyed on the SAME bucket expression) and the scan prunes
  * bucket directories at execution. [[graft.expressions.IcebergBucket]]
  * is the pinned spec hash (Murmur3 x86-32, seed 0, int promoted to
  * long), so the dim-side mapping lands in exactly the dirs the writer
  * hashed rows into — values can never be pruned away wrongly, the
  * filter only ever REMOVES buckets no build-side value hashes to.
  *
  * Injection guards mirror the stock rule: pruning-side join types
  * only, a likely-selective filter on the build side, and — because
  * `onlyInBroadcast = false` always pays the build-side subquery — a
  * size cap at the broadcast threshold (a build side that small
  * broadcasts for the join anyway, so the duplicate scan is one small
  * table read; an unfiltered fact-sized side never qualifies).
  */
class InteropBucketDppRule extends Rule[LogicalPlan] with PredicateHelper {

  private val OptPrefix = "graft.dpp.bucket."

  /** The bucketable types [[graft.expressions.IcebergBucket]] accepts;
    * int/long may MIX across the join (the Iceberg spec hashes int by
    * promoting to long, and the expression implements that), any other
    * pairing must match exactly. */
  private def compatible(fact: DataType, build: DataType): Boolean =
    (fact, build) match {
      case (IntegerType | LongType, IntegerType | LongType) => true
      case (a, b) => a == b && (a == StringType || a == DateType)
    }

  private def sizeCap: Long = {
    val t = conf.autoBroadcastJoinThreshold
    if (t > 0) t else 32L * 1024 * 1024
  }

  private def hasSelectivePredicate(plan: LogicalPlan): Boolean =
    plan.exists {
      case f: Filter => isLikelySelective(f.condition)
      case _ => false
    }

  private def canPruneLeft(j: JoinType): Boolean =
    j == Inner || j == LeftSemi || j == RightOuter
  private def canPruneRight(j: JoinType): Boolean =
    j == Inner || j == LeftSemi || j == LeftOuter

  /** The bucket-mapped relation under `side` serving `key`:
    * (relation, bucket partition attr, N). */
  private def bucketScanFor(side: LogicalPlan, key: Attribute)
      : Option[(LogicalRelation, Attribute, Int)] =
    side.collectFirst {
      case rel: LogicalRelation if rel.relation.isInstanceOf[HadoopFsRelation] &&
          rel.output.exists(_.exprId == key.exprId) &&
          rel.relation.asInstanceOf[HadoopFsRelation].options
            .exists(_._1.startsWith(OptPrefix)) => rel
    }.flatMap { rel =>
      val fs = rel.relation.asInstanceOf[HadoopFsRelation]
      fs.options.collectFirst {
        case (k, v) if k.startsWith(OptPrefix) &&
            v.split(':').headOption.contains(key.name) &&
            // the join key must BE the relation's source attr
            rel.output.exists(a => a.exprId == key.exprId && a.name == key.name) =>
          val dirCol = k.stripPrefix(OptPrefix)
          val n = v.split(':').last.toInt
          rel.output.find(_.name == dirCol).map(part => (rel, part, n))
      }.flatten
    }

  /** Already carries a dynamic-pruning filter on `part`? (idempotence
    * under the fixed-point batch, and respect for stock DPP output) */
  private def alreadyPruned(side: LogicalPlan, part: Attribute): Boolean =
    side.exists {
      case f: Filter => f.condition.exists {
        case d: DynamicPruningSubquery =>
          d.pruningKey.references.contains(part)
        case _ => false
      }
      case _ => false
    }

  private def insert(side: LogicalPlan, rel: LogicalRelation, part: Attribute,
      n: Int, buildPlan: LogicalPlan, buildKey: Attribute): LogicalPlan =
    side.transformUp {
      case r: LogicalRelation if r eq rel =>
        val bucketOf = graft.expressions.IcebergBucket(buildKey, n)
        Filter(DynamicPruningSubquery(
          part, buildPlan, Seq(bucketOf), Seq(0), onlyInBroadcast = false), r)
    }

  private def tryPrune(factSide: LogicalPlan, factKey: Expression,
      buildSide: LogicalPlan, buildKey: Expression): Option[LogicalPlan] =
    (factKey, buildKey) match {
      case (fk: AttributeReference, bk: AttributeReference)
          if compatible(fk.dataType, bk.dataType) &&
            hasSelectivePredicate(buildSide) &&
            buildSide.stats.sizeInBytes <= BigInt(sizeCap) =>
        bucketScanFor(factSide, fk).collect {
          case (rel, part, n) if !alreadyPruned(factSide, part) =>
            insert(factSide, rel, part, n, buildSide, bk)
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.dynamicPartitionPruningEnabled) return plan
    plan.transformUp {
      case j @ Join(left, right, joinType, Some(cond), _) =>
        var newLeft = left
        var newRight = right
        splitConjunctivePredicates(cond).foreach {
          case EqualTo(a: AttributeReference, b: AttributeReference) =>
            val (lk, rk) =
              if (a.references.subsetOf(left.outputSet)) (a, b) else (b, a)
            if (lk.references.subsetOf(newLeft.outputSet) &&
                rk.references.subsetOf(newRight.outputSet)) {
              // build plans are the PRISTINE sides: passing the
              // already-pruned opposite side would nest one
              // DynamicPruningSubquery inside the other's build plan
              // (circular pruning when both sides qualify)
              if (canPruneLeft(joinType))
                tryPrune(newLeft, lk, right, rk).foreach(newLeft = _)
              if (canPruneRight(joinType))
                tryPrune(newRight, rk, left, lk).foreach(newRight = _)
            }
          case _ =>
        }
        if ((newLeft eq left) && (newRight eq right)) j
        else j.copy(left = newLeft, right = newRight)
    }
  }
}
