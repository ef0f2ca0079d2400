package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession, graftshim}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Max
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** As-of join as a first-class Catalyst operator — the (c) tier of the
  * custom-operator ladder: a logical node + a lowering Rule + extension
  * registration, for whole-operator semantics the built-in algebra lacks.
  *
  * Semantics: for every left row, attach the right row with the greatest
  * `rightOn <= leftOn` within the same `by` group (left outer: no match →
  * nulls), ties on `rightOn` broken by the remaining right columns —
  * deterministic, engine-independent output.
  *
  * The lowering is the scale-safe distributed merge (same shape as q51):
  * tag + union both sides, ONE shuffle+sort on (by, on), running
  * max(struct(rightOn, right.*)) over the ordered frame, keep left rows,
  * unpack the struct. No inequality join — a naive
  * `left.join(right, on >= ...)` plans as a broadcast-nested-loop and
  * dies at scale. Requirement: right columns must be orderable (no maps),
  * because the tie-break rides the struct ordering.
  *
  * Output attribute ids are pinned to the node's, so the rewrite is
  * transparent to any enclosing plan ([[RewriteAsOfJoin]] aliases the
  * final projection back to the original ExprIds).
  */
final case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftOn: Expression, rightOn: Expression,
    leftBy: Expression, rightBy: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Lowers [[AsOfJoin]] into union + window + filter + project. Injected
  * as an analyzer rule by [[graft.GraftExtensions]] for sessions built
  * with the extension; [[AsOf.join]] applies it eagerly so the operator
  * also works on driver-provided sessions without it. */
object RewriteAsOfJoin extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    // impl=exec leaves the node for AsOfJoinStrategy to plan physically
    if (conf.getConfString("spark.graft.asof.impl", "rewrite") == "exec") plan
    else force(plan)

  /** The unconditional lowering. [[AsOf.join]]'s eager rewrite path calls
    * this directly: `apply` reads the AMBIENT SQLConf (the thread's
    * active session), which may disagree with the session the caller
    * already checked — routing through `apply` could then return the raw
    * node to a session with no strategy for it. */
  def force(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case aj: AsOfJoin if aj.childrenResolved &&
        Seq(aj.leftOn, aj.rightOn, aj.leftBy, aj.rightBy).forall(_.resolved) =>
      lower(aj)
  }

  private def lower(aj: AsOfJoin): LogicalPlan = {
    val lOut = aj.left.output
    val rOut = aj.right.output

    // struct(rightOn, right.*): max() over the ordered frame picks the
    // latest right row; remaining fields are the deterministic tie-break
    val rStruct = CreateNamedStruct(
      Seq(Literal("_on"), aj.rightOn) ++
        rOut.flatMap(a => Seq(Literal(a.name): Expression, a)))

    def tagged(side: LogicalPlan, lCols: Seq[NamedExpression],
               r: Expression, on: Expression, by: Expression,
               kind: Int): LogicalPlan =
      Project(lCols ++ Seq(
        Alias(r, "_r")(), Alias(on, "_on")(), Alias(by, "_by")(),
        Alias(Literal(kind), "_kind")()), side)

    val pLeft = tagged(aj.left, lOut,
      Literal.create(null, rStruct.dataType), aj.leftOn, aj.leftBy, kind = 1)
    // SQL join semantics: NULL never matches — right rows with a null
    // `on` or `by` can satisfy no `rightOn <= leftOn within rightBy`
    // predicate, so they are dropped before the union. (Left rows with
    // null keys still emit, with a null right side: a null `by`
    // partition then contains no right rows, and a null `on` sorts
    // first, before any right row.)
    val rightNonNull = Filter(
      And(IsNotNull(aj.rightOn), IsNotNull(aj.rightBy)), aj.right)
    val pRight = tagged(rightNonNull,
      lOut.map(a => Alias(Literal.create(null, a.dataType), a.name)()),
      rStruct, aj.rightOn, aj.rightBy, kind = 0)
    val union = Union(pLeft, pRight)

    // resolve the tag columns against the union's output
    val Seq(rRef, onRef, byRef, kindRef) = union.output.takeRight(4)
    val unionLeft = union.output.dropRight(4)

    // right rows sort before left at equal `on` (kind 0 < 1): inclusive bound
    val order = Seq(SortOrder(onRef, Ascending), SortOrder(kindRef, Ascending))
    val frame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
    val lastR = Alias(WindowExpression(
      Max(rRef).toAggregateExpression(),
      WindowSpecDefinition(Seq(byRef), order, frame)), "_last_r")()
    val win = Window(Seq(lastR), Seq(byRef), order, union)
    val keepLeft = Filter(EqualTo(kindRef, Literal(1)), win)

    // unpack, pinning output ExprIds to the node's contract
    val rFields = rOut.zipWithIndex.map { case (a, i) =>
      Alias(GetStructField(lastR.toAttribute, i + 1, Some(a.name)), a.name)(
        exprId = aj.output(lOut.length + i).exprId)
    }
    Project(unionLeft ++ rFields, keepLeft)
  }
}

/** Dataset-level API for the custom operator. */
object AsOf {
  /** `leftOn`/`rightOn`/`leftBy`/`rightBy` must be columns of the
    * respective frames (already resolved). */
  def join(left: DataFrame, right: DataFrame,
           leftOn: Column, rightOn: Column,
           leftBy: Column, rightBy: Column): DataFrame = {
    val (r, rCol) = PlanUtils.dedupRight(right)
    val node = AsOfJoin(
      graftshim.analyzed(left), graftshim.analyzed(r),
      graftshim.expression(leftOn), graftshim.expression(rCol(rightOn)),
      graftshim.expression(leftBy), graftshim.expression(rCol(rightBy)))
    // the exec path's interpreted orderings are built from the LEFT
    // types — a by/on type mismatch would class-cast mid-job on exec
    // while the rewrite's union coerces, so reject it up front
    require(node.leftBy.dataType == node.rightBy.dataType,
      s"as-of `by` types differ: ${node.leftBy.dataType} vs ${node.rightBy.dataType}")
    require(node.leftOn.dataType == node.rightOn.dataType,
      s"as-of `on` types differ: ${node.leftOn.dataType} vs ${node.rightOn.dataType}")
    val spark = left.sparkSession
    if (spark.conf.get("spark.graft.asof.impl", "rewrite") == "exec") {
      // physical path: keep the raw node; ensure the planner strategy is
      // present (experimental.extraStrategies is the public per-session
      // hook; GraftExtensions-built sessions already inject it).
      // NOTE: this registers a SESSION-LIFETIME planner strategy as a
      // side effect — it persists on `spark` after this call (harmless:
      // the strategy only matches graft's own AsOfJoin node).
      PlanUtils.ensureStrategy(spark, AsOfJoinStrategy)
      graftshim.ofRows(spark, node)
    } else
      // eager lowering: works on any session; sessions built with
      // GraftExtensions also lower the raw node through the analyzer.
      // force, not apply: apply consults the ambient SQLConf, which may
      // be a different session than the one checked above
      graftshim.ofRows(spark, RewriteAsOfJoin.force(node))
  }
}
