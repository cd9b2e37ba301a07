package graft.plans

import org.apache.spark.sql.{DataFrame, GraftPlanBridge}

/** User-facing surface for the native as-of join. */
object AsOf {

  /** left-as-of join: every `left` row + `asof_ts` from the same user
    * key (NULL if none) — direction "backward" (default): greatest
    * strictly-earlier right time; "forward": smallest strictly-later;
    * "nearest": closer of the two, ties backward.
    * Key columns must be LONG, time columns TIMESTAMP. */
  def join(left: DataFrame, right: DataFrame,
      leftUserCol: String, leftTimeCol: String,
      rightUserCol: String, rightTimeCol: String,
      direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"unknown as-of direction: $direction")
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    Seq(PushFilterThroughAsOf, PruneColumnsThroughAsOf).foreach { rule =>
      if (!spark.experimental.extraOptimizations.contains(rule)) {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ rule
      }
    }
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name)}"))
    GraftPlanBridge.ofRows(spark, AsOfJoin(lPlan, rPlan,
      attr(lPlan, leftUserCol), attr(lPlan, leftTimeCol),
      attr(rPlan, rightUserCol), attr(rPlan, rightTimeCol), direction))
  }
}
