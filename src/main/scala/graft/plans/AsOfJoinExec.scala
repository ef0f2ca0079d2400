package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Physical as-of join — the (c)-tier ladder completed: a custom
  * SparkPlan + SparkStrategy for [[AsOfJoin]], selectable with
  * `spark.graft.asof.impl=exec` (default stays the window-rewrite
  * lowering of [[RewriteAsOfJoin]]).
  *
  * Execution model: EnsureRequirements co-partitions both children on
  * the `by` keys (ClusteredDistribution) and sorts them (by, on[,
  * right cols]) — then each partition pair streams through ONE merge
  * pass: for every left row in order, the right cursor advances while
  * `rightOn <= leftOn` within the group, keeping only the latest
  * candidate. Per-partition state is a single buffered right row — vs
  * the rewrite's union+window, this skips materializing the unioned
  * sort and the running-max struct column, and left columns never
  * leave their original rows. This is the merge as-of dataflow of
  * kdb/QuestDB, expressed as a Spark operator.
  *
  * Semantics contract (shared with the rewrite, spec-pinned equal):
  * inclusive bound, SQL null semantics (null on/by matches nothing,
  * null-keyed left rows emit with null right), ties on (by, on) broken
  * by the remaining right columns ascending — the right sort order
  * makes "last seen" == "greatest tie-break tuple", exactly the
  * rewrite's max(struct) pick.
  */
final case class AsOfJoinExec(
    leftOn: Expression, rightOn: Expression,
    leftBy: Expression, rightBy: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // left rows pass through untouched → left's partitioning survives
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftBy)), ClusteredDistribution(Seq(rightBy)))

  // right additionally orders by its remaining columns so the merge's
  // "last row of an equal-(by,on) run" IS the deterministic tie-break
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftBy, Ascending), SortOrder(leftOn, Ascending)),
    Seq(SortOrder(rightBy, Ascending), SortOrder(rightOn, Ascending)) ++
      right.output.filterNot(a =>
        a.semanticEquals(rightBy) || a.semanticEquals(rightOn))
        .map(a => SortOrder(a, Ascending)))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val byType = leftBy.dataType
    val onType = leftOn.dataType
    val leftOutput = left.output
    val rightOutput = right.output
    val allOutput = output
    val lOnE = leftOn; val rOnE = rightOn; val lByE = leftBy; val rByE = rightBy
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lOn = BindReferences.bindReference(lOnE, leftOutput)
      val lBy = BindReferences.bindReference(lByE, leftOutput)
      val rOn = BindReferences.bindReference(rOnE, rightOutput)
      val rBy = BindReferences.bindReference(rByE, rightOutput)
      val byOrd = TypeUtils.getInterpretedOrdering(byType)
      val onOrd = TypeUtils.getInterpretedOrdering(onType)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOutput.length)
      // bind against NULLABLE right attrs: the no-match row is all-null
      // even where the right schema says non-nullable, and the bound
      // references must null-check accordingly
      val outProj = UnsafeProjection.create(allOutput,
        leftOutput ++ rightOutput.map(_.withNullability(true)))
      val rBuf = rIter.buffered
      // the single piece of per-partition state: the latest right row
      // that could still match, and its by-key (rows are reused by the
      // scan — the candidate must be a copy)
      var cand: InternalRow = null
      var candBy: Any = null
      lIter.map { l =>
        val lb = lBy.eval(l)
        val lo = lOn.eval(l)
        var advancing = lb != null
        while (advancing && rBuf.hasNext) {
          val r = rBuf.head
          val rb = rBy.eval(r)
          if (rb == null) rBuf.next() // null by matches nothing, ever
          else {
            val cmp = byOrd.compare(rb, lb)
            if (cmp < 0) rBuf.next() // group already passed, discard
            else if (cmp > 0) advancing = false
            else {
              val ro = rOn.eval(r)
              if (ro == null) rBuf.next() // null on matches nothing
              else if (lo != null && onOrd.compare(ro, lo) <= 0) {
                cand = r.copy()
                // re-evaluate the key from the COPY: rb points into the
                // reused scan/spill buffer and can be overwritten by the
                // time the match test runs (e.g. UTF8String keys after a
                // sorter spill)
                candBy = rBy.eval(cand)
                rBuf.next()
              } else advancing = false
            }
          }
        }
        val matched = lb != null && lo != null &&
          cand != null && byOrd.compare(candBy, lb) == 0
        outProj(joined(l, if (matched) cand else nullRight))
      }
    }
  }
}

/** Plans the un-lowered [[AsOfJoin]] node onto [[AsOfJoinExec]].
  * Injected via GraftExtensions (injectPlannerStrategy) and by
  * [[AsOf.join]] through `experimental.extraStrategies` when
  * `spark.graft.asof.impl=exec`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lOn, rOn, lBy, rBy) =>
      AsOfJoinExec(lOn, rOn, lBy, rBy, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}
