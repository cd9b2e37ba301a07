package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the private[sql] Dataset constructor so graft can
  * materialize a DataFrame from a custom LogicalPlan (the standard
  * package-injection idiom Spark extension libraries use). */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** A Column over a raw Catalyst expression — the inverse of
    * `Column.expr`. Lets operators embed a pre-built node (e.g. one
    * struct Literal per range bound) instead of an equivalent
    * many-node `struct(lit(_).cast(_))` tree that analysis would have
    * to resolve and ConstantFolding re-collapse on every consumer. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
}
