package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, graftshim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Interval/range join as a first-class operator — the second physical
  * operator of the ladder (after [[AsOfJoinExec]]): for every left row,
  * all right rows of the same `by` group with
  * `rightOn ∈ (leftOn − window, leftOn]`, LEFT OUTER (no match → one
  * row with nulls). `on` expressions must be LongType (epoch seconds or
  * any integer clock); `window` is in the same units.
  *
  * Why a dedicated operator: Spark plans `a.join(b, on-range)` as a
  * broadcast-nested-loop (fact × fact death); the compositional escape
  * is the q52 bucketing trick (2× blow-up + post-filter). The physical
  * operator does neither: EnsureRequirements co-partitions both sides
  * on `by` and sorts them (by, on), then ONE merge pass per partition
  * slides a window buffer over the right side — every right row is
  * copied into the buffer once and evicted once (amortized O(n + m) +
  * output), and per-partition state is exactly the right rows inside
  * one window span of one group: the same lower bound a watermarked
  * stream-stream interval join holds, and strictly less than the
  * bucket trick's 2× shuffle volume.
  */
final case class RangeJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftOn: Expression, rightOn: Expression,
    leftBy: Expression, rightBy: Expression,
    window: Long) extends BinaryNode {

  require(window > 0, s"window must be positive, got $window")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoin =
    copy(left = newLeft, right = newRight)
}

/** The merge-pass physical operator for [[RangeJoin]]. */
final case class RangeJoinExec(
    leftOn: Expression, rightOn: Expression,
    leftBy: Expression, rightBy: Expression,
    window: Long,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // left rows stream through in place → left's partitioning survives
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftBy)), ClusteredDistribution(Seq(rightBy)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftBy, Ascending), SortOrder(leftOn, Ascending)),
    Seq(SortOrder(rightBy, Ascending), SortOrder(rightOn, Ascending)))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangeJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val byType = leftBy.dataType
    val leftOutput = left.output
    val rightOutput = right.output
    val allOutput = output
    val w = window
    val lOnE = leftOn; val rOnE = rightOn; val lByE = leftBy; val rByE = rightBy
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lOn = BindReferences.bindReference(lOnE, leftOutput)
      val lBy = BindReferences.bindReference(lByE, leftOutput)
      val rOn = BindReferences.bindReference(rOnE, rightOutput)
      val rBy = BindReferences.bindReference(rByE, rightOutput)
      val byOrd = TypeUtils.getInterpretedOrdering(byType)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOutput.length)
      val outProj = UnsafeProjection.create(allOutput,
        leftOutput ++ rightOutput.map(_.withNullability(true)))
      val rBuf = rIter.buffered
      // the window buffer: right-row COPIES of ONE group, on ascending
      // (insertion order — the child is sorted), each inserted once and
      // evicted once. Rows must be copies: the scan/sorter reuses its
      // row buffer (the AsOfJoinExec spill lesson).
      val buf = new java.util.ArrayDeque[(Long, InternalRow)]()
      // the buffer's group key, cached at first insertion (evaluated
      // from the COPIED row — the AsOfJoinExec candBy rule) so the
      // group-change test is one comparison per left row, not an
      // interpreted eval against the deque head
      var bufBy: Any = null
      lIter.flatMap { l =>
        val lb = lBy.eval(l)
        val lo = lOn.eval(l)
        if (lb == null || lo == null) {
          // SQL nulls match nothing; null keys sort first, so the right
          // cursor has not passed anything this row could have needed
          Iterator.single(outProj(joined(l, nullRight)))
        } else {
          val loL = lo.asInstanceOf[Long]
          // a buffer left over from a previous group is dead state
          if (!buf.isEmpty && byOrd.compare(bufBy, lb) != 0) buf.clear()
          // advance the right cursor: discard passed groups and expired
          // rows, buffer rows inside (lo − w, lo], stop at the future
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val r = rBuf.head
            val rb = rBy.eval(r)
            if (rb == null) rBuf.next()
            else {
              val cmp = byOrd.compare(rb, lb)
              if (cmp < 0) rBuf.next()
              else if (cmp > 0) advancing = false
              else {
                val ro = rOn.eval(r)
                if (ro == null) rBuf.next()
                else {
                  val roL = ro.asInstanceOf[Long]
                  if (roL <= loL - w) rBuf.next() // expired for this and all later lefts
                  else if (roL <= loL) {
                    val copied = r.copy()
                    if (buf.isEmpty) bufBy = rBy.eval(copied)
                    buf.addLast((roL, copied))
                    rBuf.next()
                  } else advancing = false
                }
              }
            }
          }
          // evict buffered rows the window has moved past
          while (!buf.isEmpty && buf.peekFirst()._1 <= loL - w) buf.removeFirst()
          if (buf.isEmpty) Iterator.single(outProj(joined(l, nullRight)))
          else {
            // lazy: outProj reuses its buffer; flatMap consumes this
            // iterator fully while `l` is still the live outer row
            val it = buf.iterator()
            new Iterator[InternalRow] {
              override def hasNext: Boolean = it.hasNext
              override def next(): InternalRow = outProj(joined(l, it.next()._2))
            }
          }
        }
      }
    }
  }
}

/** Plans the raw [[RangeJoin]] node. Injected via GraftExtensions and by
  * [[RangeJoinOp.join]] through `experimental.extraStrategies` when
  * `spark.graft.range.impl=exec`. */
object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoin(l, r, lOn, rOn, lBy, rBy, w) =>
      RangeJoinExec(lOn, rOn, lBy, rBy, w, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Dataset-level API. Two implementations, spec-pinned row-identical:
  *  - default: the q52 bucket composition — right rows explode into two
  *    window buckets, the join becomes an equi-join on (by, bucket)
  *    with the exact range post-filter (AQE-friendly, skew-splittable);
  *  - `spark.graft.range.impl=exec`: the [[RangeJoinExec]] merge pass
  *    (registers a session-lifetime planner strategy, like AsOf).
  * `leftOn`/`rightOn` must be LongType; `rightOn`/`rightBy` must be
  * plain columns of `right` (same contract as [[AsOf.join]]). */
object RangeJoinOp {
  def join(left: DataFrame, right: DataFrame,
           leftOn: Column, rightOn: Column,
           leftBy: Column, rightBy: Column,
           window: Long): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    // named imports: functions._ would shadow the left/right parameters
    import org.apache.spark.sql.functions.{array, col, explode, lit, pmod}
    val spark = left.sparkSession
    require(graftshim.expression(leftOn).dataType == LongType &&
      graftshim.expression(rightOn).dataType == LongType,
      "range join `on` expressions must be LongType (epoch seconds / integer clock)")
    val (r, rCol) = PlanUtils.dedupRight(right)
    val rOn = rCol(rightOn)
    val rBy = rCol(rightBy)
    // the exec path's interpreted by-ordering is built from the LEFT
    // type — a mismatch would class-cast mid-job on exec while the
    // bucket equi-join coerces, so reject it up front
    require(graftshim.expression(leftBy).dataType ==
      graftshim.expression(rBy).dataType,
      s"range join `by` types differ: ${graftshim.expression(leftBy).dataType}" +
        s" vs ${graftshim.expression(rBy).dataType}")
    if (spark.conf.get("spark.graft.range.impl", "bucket") == "exec") {
      PlanUtils.ensureStrategy(spark, RangeJoinStrategy)
      graftshim.ofRows(spark, RangeJoin(
        graftshim.analyzed(left), graftshim.analyzed(r),
        graftshim.expression(leftOn), graftshim.expression(rOn),
        graftshim.expression(leftBy), graftshim.expression(rBy), window))
    } else {
      // bucket composition: floorDiv buckets; a right row can only match
      // lefts in its own or the next bucket, so 2 copies cover the window.
      // Exact long arithmetic throughout: `floor(on / w)` would divide in
      // DOUBLE and mis-bucket integer clocks above 2^53 (nanosecond
      // timestamps), silently dropping matches. Instead subtract the
      // non-negative pmod to hit the exact floor multiple, then divide
      // that multiple in DECIMAL (exact, integral quotient).
      def bkt(on: Column): Column =
        ((on - pmod(on, lit(window))).cast("decimal(38,0)") / lit(window))
          .cast("long")
      val lTagged = left.withColumn("_graft_lbkt", bkt(leftOn))
      val rTagged = r
        .filter(rOn.isNotNull && rBy.isNotNull)
        .withColumn("_graft_rbkt", explode(array(bkt(rOn), bkt(rOn) + 1)))
      lTagged.join(rTagged,
          leftBy === rBy && col("_graft_lbkt") === col("_graft_rbkt") &&
            rOn > leftOn - window && rOn <= leftOn,
          "left")
        .drop("_graft_lbkt", "_graft_rbkt")
    }
  }
}
