package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: push left-side predicates through AsOfJoin.
  *
  * Catalyst's PushDownPredicates cannot see through a custom node, so
  * without this rule a `Filter` above an as-of join scans both inputs in
  * full. The as-of result for each surviving left row is unchanged by
  * removing other left rows (matches depend only on the right side), so
  * any DETERMINISTIC conjunct referencing left attributes alone may
  * move below the join — restoring parquet pushdown on the probe side.
  * Nondeterministic conjuncts (rand(), a side-effecting UDF) stay put:
  * their references are empty or left-only, but moving them changes
  * which rows/order they evaluate over — the same refusal Catalyst's
  * own PushDownPredicates makes.
  */
object PushFilterThroughAsOf extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoin) =>
      // like Catalyst: only conjuncts BEFORE the first nondeterministic
      // one are candidates (a nondeterministic conjunct must see
      // exactly the rows its predecessors passed, in order)
      val conjuncts = splitConjuncts(cond)
      val candidates = conjuncts.takeWhile(_.deterministic)
      val rest = conjuncts.drop(candidates.length)
      val (pushable, keepDet) = candidates
        .partition(_.references.subsetOf(j.left.outputSet))
      val keep = keepDet ++ rest
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

/** Optimizer rule: column pruning through AsOfJoin.
  *
  * Catalyst's ColumnPruning stops at a custom node, so both inputs scan
  * every column. Two prunes are safe:
  *  - right side, unconditionally: the exec reads only the right user and
  *    time expressions (nothing else ever surfaces in the output);
  *  - left side, under a Project: keep only the attributes the projection
  *    or the join keys reference.
  * The inserted Projects sit above the file relations at the end of
  * optimization, so physical planning narrows the parquet ReadSchema —
  * on a wide table this is the difference between scanning 2 columns
  * and scanning all of them.
  */
object PruneColumnsThroughAsOf extends Rule[LogicalPlan] {

  private def pruneLeft(j: AsOfJoin, needed: AttributeSet): Option[AsOfJoin] = {
    val keep = needed ++ j.leftUser.references ++ j.leftTime.references
    val keptLeft = j.left.output.filter(keep.contains)
    if (keptLeft.size < j.left.output.size)
      Some(j.copy(left = Project(keptLeft, j.left)))
    else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList, j: AsOfJoin) =>
      pruneLeft(j, AttributeSet(projList.flatMap(_.references)))
        .map(nj => p.copy(child = nj)).getOrElse(p)
    // Project over a RESIDUAL Filter — the exact shape
    // PushFilterThroughAsOf itself produces whenever a conjunct
    // references asof_ts (it stays above the join). Without this case
    // the common select-after-filter query silently scans every left
    // column: the Project never sits directly on the join, and
    // Catalyst's ColumnPruning cannot see through the custom node.
    case p @ Project(projList, f @ Filter(cond, j: AsOfJoin)) =>
      pruneLeft(j, AttributeSet(projList.flatMap(_.references)) ++
          cond.references)
        .map(nj => p.copy(child = f.copy(child = nj))).getOrElse(p)
    case j: AsOfJoin =>
      val neededRight = j.rightUser.references ++ j.rightTime.references
      val keptRight = j.right.output.filter(neededRight.contains)
      if (keptRight.size < j.right.output.size)
        j.copy(right = Project(keptRight, j.right))
      else j
  }
}
