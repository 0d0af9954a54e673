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

  /** Column ↔ Expression bridges (`private[sql]` in Spark 4's classic
    * module) — needed when library code composes custom Catalyst
    * expressions (graft.functions.*) directly into Column trees.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    classic.ExpressionUtils.column(e)

  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
