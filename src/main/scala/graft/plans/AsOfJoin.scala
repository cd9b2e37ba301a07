package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, BindReferences, Expression, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.TimestampType

/** Native as-of join (SURVEY §4.2's named candidate for the full
  * LogicalPlan -> Strategy -> SparkPlan stack; §2B q_join_asof keeps the
  * portable declarative formulation for the oracle, and AsOfJoinSpec
  * proves this operator equivalent).
  *
  * Semantics: for every left row, attach the greatest right `ts` that is
  * strictly earlier, within the same `user` key (NULL if none) — the
  * event-time as-of lookup every feature-store/backfill pipeline needs.
  *
  * Scale design: requiredChildDistribution co-partitions both sides on
  * the user key (Spark inserts the hash exchanges), requiredChildOrdering
  * demands (user, ts) sort within partitions (Spark inserts local sorts),
  * and the physical merge is a single forward pass per partition — the
  * same shape as a sort-merge join, no buffering beyond one scalar, so
  * it streams at any data size.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftUser: Expression,
    leftTime: Expression,
    rightUser: Expression,
    rightTime: Expression,
    // constructor param (not a body val) so the exprId survives plan
    // copies during analysis/optimization
    asOfOutput: AttributeReference =
      AttributeReference("asof_ts", TimestampType, nullable = true)())
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output :+ asOfOutput
  override def producedAttributes: AttributeSet = AttributeSet(asOfOutput)

  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsOfJoin = copy(left = l, right = r)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftUser: Expression,
    leftTime: Expression,
    rightUser: Expression,
    rightTime: Expression,
    asOfAttr: AttributeReference) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ asOfAttr
  override def producedAttributes: AttributeSet = AttributeSet(asOfAttr)

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftUser)),
    ClusteredDistribution(Seq(rightUser)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftUser, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightUser, Ascending), SortOrder(rightTime, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lUser = BindReferences.bindReference(leftUser, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rUser = BindReferences.bindReference(rightUser, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val nFields = left.output.size

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // exec contract: emit UnsafeRow (downstream shuffles serialize it);
      // consumers copy when they buffer, per Spark convention
      val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(output.map(_.dataType).toArray)
      new Iterator[InternalRow] {
        private var rHead: InternalRow = _
        private var rHasHead = false
        private var lastUser = 0L
        private var lastTs = 0L
        private var hasLast = false

        private def advanceRight(): Unit = {
          if (rIter.hasNext) { rHead = rIter.next(); rHasHead = true }
          else rHasHead = false
        }
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val u = lUser.eval(lRow).asInstanceOf[Long]
          val t = lTime.eval(lRow).asInstanceOf[Long]
          // consume right rows ordered before (u, t); remember the last
          // strictly-earlier ts belonging to user u
          var continue = rHasHead
          while (continue) {
            val ru = rUser.eval(rHead).asInstanceOf[Long]
            val rt = rTime.eval(rHead).asInstanceOf[Long]
            if (ru < u || (ru == u && rt < t)) {
              if (ru == u) { lastUser = u; lastTs = rt; hasLast = true }
              advanceRight()
              continue = rHasHead
            } else continue = false
          }
          val matched = hasLast && lastUser == u
          val out = new Array[Any](nFields + 1)
          var i = 0
          while (i < nFields) {
            out(i) = lRow.get(i, left.output(i).dataType); i += 1
          }
          out(nFields) = if (matched) lastTs else null
          proj(InternalRow.fromSeq(out.toIndexedSeq))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): AsOfJoinExec = copy(left = l, right = r)
}

/** Planner strategy: logical AsOfJoin -> AsOfJoinExec. Injected via
  * GraftExtensions (injectPlannerStrategy). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      AsOfJoinExec(planLater(j.left), planLater(j.right),
        j.leftUser, j.leftTime, j.rightUser, j.rightTime, j.asOfOutput) :: Nil
    case _ => Nil
  }
}
