package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `Dataset.ofRows` is `private[sql]` in Spark 4's classic module; graft's
  * SQL row-level commands (UPDATE / MERGE INTO rewrites) need to turn the
  * analyzed SOURCE plan of a MERGE back into a DataFrame to feed the
  * programmatic MoR commit path. Same shim posture as [[ColumnExpr]]: one
  * re-export, no Spark internals modified.
  */
object PlanDf {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
