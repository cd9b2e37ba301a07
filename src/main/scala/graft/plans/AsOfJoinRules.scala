package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: push left-side predicates through AsOfJoin.
  *
  * Catalyst's PushDownPredicates cannot see through a custom node, so
  * without this rule a `Filter` above an as-of join scans both inputs in
  * full. The as-of result for each surviving left row is unchanged by
  * removing other left rows (matches depend only on the right side), so
  * any conjunct referencing left attributes alone may move below the
  * join — restoring parquet pushdown on the probe side.
  */
object PushFilterThroughAsOf extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoin) =>
      val (pushable, keep) = splitConjuncts(cond)
        .partition(_.references.subsetOf(j.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(pushable.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
