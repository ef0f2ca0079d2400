package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions, graftshim}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expr.{CharPairs, NormalizeKey, RollingHash, SimHash28, SortedJaccard, TopKPacked}

/** SQL-surface registration of the engine's custom Catalyst expressions,
  * so `spark.sql("SELECT normalize_key(c) ...")` works like any built-in.
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.GraftExtensions` (or
  *    `builder.withExtensions(new GraftExtensions)`) for new sessions —
  *    the standard extension-library hook;
  *  - `GraftExtensions.register(spark)` for an already-running session
  *    (e.g. a driver-provided one).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, clazz, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(clazz, name), builder))
    }
    // custom logical operators: lowered during analysis (see graft.plans)
    ext.injectResolutionRule(_ => graft.plans.RewriteAsOfJoin)
    // physical path for the same node when spark.graft.asof.impl=exec
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // physical interval join when spark.graft.range.impl=exec
    ext.injectPlannerStrategy(_ => graft.plans.RangeJoinStrategy)
  }
}

object GraftExtensions {
  private def one(f: Expression => Expression): Seq[Expression] => Expression = {
    case Seq(c) => f(c)
    case other => throw new IllegalArgumentException(
      s"expected 1 argument, got ${other.length}")
  }

  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("normalize_key", classOf[NormalizeKey].getName, one(NormalizeKey(_))),
    ("simhash28", classOf[SimHash28].getName, one(SimHash28(_))),
    ("rolling_hash", classOf[RollingHash].getName, one(RollingHash(_))),
    ("sorted_jaccard", classOf[SortedJaccard].getName, {
      case Seq(a, b) => SortedJaccard(a, b)
      case other => throw new IllegalArgumentException(
        s"sorted_jaccard takes 2 arguments, got ${other.length}")
    }),
    // aggregate: the analyzer wraps a bare AggregateFunction from the
    // registry in AggregateExpression, same as built-in max/sum
    ("topk_packed", classOf[TopKPacked].getName, {
      case Seq(c, org.apache.spark.sql.catalyst.expressions.Literal(k: Int, _)) =>
        TopKPacked(c, k)
      case other => throw new IllegalArgumentException(
        "topk_packed takes (col, int-literal k), got " + other)
    }),
    // generator: usable in SELECT / LATERAL VIEW like built-in explode
    ("char_pairs", classOf[CharPairs].getName, one(CharPairs(_))))

  /** Register into an existing session's function registry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      graftshim.registerFunction(spark, name, builder)
    }
}
