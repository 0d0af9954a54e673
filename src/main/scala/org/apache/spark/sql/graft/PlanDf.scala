package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge for constructing a DataFrame from a custom LogicalPlan.
  *
  * `Dataset.ofRows` is `private[sql]`, so library code that introduces
  * its own logical operators (graft.plans.AsOfJoinPlan) needs this
  * one-liner inside the `org.apache.spark.sql` package tree — the same
  * technique every Spark extension library uses (Sedona, Delta, etc.).
  * Nothing else in the codebase lives outside the `graft` namespace.
  */
object PlanDf {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
