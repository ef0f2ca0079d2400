package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession, graftshim}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.execution.SparkStrategy

/** Shared plumbing for the Dataset-level custom-operator APIs (AsOf,
  * RangeJoinOp) — one copy of two subtle moves that previously lived
  * duplicated in both operators (r7 review finding). */
object PlanUtils {

  /** Self-join lineage dedup: re-alias every right column so its
    * attribute ids never collide with the left's (what Dataset.join's
    * analyzer dedup does for built-in joins). Returns the deduped frame
    * and a rebinder that maps the caller's right-side plain columns
    * onto it. */
  def dedupRight(right: DataFrame): (DataFrame, Column => Column) = {
    import org.apache.spark.sql.functions.col
    val r = right.select(right.columns.map(c => col(c).as(c)): _*)
    val rebind = (c: Column) => {
      val name = graftshim.expression(c) match {
        case a: AttributeReference => a.name
        case other => throw new IllegalArgumentException(
          s"right-side on/by must be plain columns of `right`, got $other")
      }
      r(name)
    }
    (r, rebind)
  }

  /** Idempotent, race-free registration of a session-lifetime planner
    * strategy: the check-then-prepend is serialized on the
    * experimental-methods holder so concurrent callers can't insert
    * duplicates (r6 advice). */
  def ensureStrategy(spark: SparkSession, strategy: SparkStrategy): Unit =
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(strategy))
        spark.experimental.extraStrategies =
          strategy +: spark.experimental.extraStrategies
    }
}
