package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hot-bucket hardening for LSH candidate generation (round-2 verdict
  * item 6). Banded MinHash / SimHash-chunk / sign-projection buckets all
  * self-join within a bucket, so one pathological bucket — the
  * boilerplate-text skew killer: a million near-identical spam pages
  * sharing a band signature — costs O(k²) candidates and stalls the whole
  * stage at corpus scale. `capBuckets` drops every row of any bucket
  * larger than `maxBucket`, bounding the per-bucket join at
  * maxBucket²/2.
  *
  * The drop is NOT silent: the pre-filter frame carries an `observe`
  * node, so `dropped_rows` / `max_bucket` arrive with the action's
  * observed metrics (QueryExecutionListener in production, an
  * [[Observation]] handle in tests) — zero extra jobs, unlike an eager
  * count. Exactness tradeoff: capping is recall-lossy for pairs inside
  * over-cap buckets (content that pervasive is exact-dedup's job anyway —
  * CCNet does the same); callers needing the pigeonhole recall guarantee
  * pass `Int.MaxValue`.
  *
  * Plan shape: the bucket count is a window over the bucket key — the
  * same hash partitioning the candidate self-join needs next, so the
  * exchange is shared, not added.
  */
object Buckets {

  /** Drop all rows of buckets with more than `maxBucket` rows; emit
    * `<metricName>.dropped_rows` / `max_bucket` as observed metrics. */
  def capBuckets(df: DataFrame, keys: Seq[Column], maxBucket: Int,
                 metricName: String): DataFrame =
    capImpl(df, keys, maxBucket,
      d => d.observe(metricName, dropMetrics.head, dropMetrics.tail: _*))

  /** Same, reporting through an [[Observation]] handle (blocking `get`
    * after the action — the test/notebook form). */
  def capBuckets(df: DataFrame, keys: Seq[Column], maxBucket: Int,
                 obs: Observation): DataFrame =
    capImpl(df, keys, maxBucket, d => d.observe(obs, dropMetrics.head, dropMetrics.tail: _*))

  private def dropMetrics: Seq[Column] = Seq(
    sum(when(col("_bucket_n") > col("_cap"), 1L).otherwise(0L)).as("dropped_rows"),
    max(col("_bucket_n")).as("max_bucket"))

  private def capImpl(df: DataFrame, keys: Seq[Column], maxBucket: Int,
                      attach: DataFrame => DataFrame): DataFrame = {
    // fail fast instead of silently overwriting caller columns: the
    // helper columns are withColumn'd and dropped internally
    Seq("_bucket_n", "_cap").foreach(h => require(!df.columns.contains(h),
      s"capBuckets: input already carries internal helper column '$h'"))
    val w = Window.partitionBy(keys: _*)
    val sized = df
      .withColumn("_bucket_n", count(lit(1)).over(w))
      .withColumn("_cap", lit(maxBucket))
    attach(sized)
      .filter(col("_bucket_n") <= col("_cap"))
      .drop("_bucket_n", "_cap")
  }
}
