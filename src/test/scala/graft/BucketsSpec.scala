package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import graft.operators.Buckets

/** Hot-bucket hardening (round-2 verdict item 6): a synthetic hot
  * shingle bucket must be dropped, bounding the candidate self-join,
  * with the drop visible through observed metrics — and cold buckets
  * (recall) untouched. */
class BucketsSpec extends SparkSpec {
  import spark.implicits._

  // bucket "hot" has 100 members (a boilerplate signature), buckets
  // c1/c2 have 2 members each (true near-dup pairs)
  private def bucketed = (
    (1 to 100).map(i => (i.toLong, "hot")) ++
      Seq((200L, "c1"), (201L, "c1"), (300L, "c2"), (301L, "c2"))
  ).toDF("doc_id", "key")

  test("over-cap bucket dropped, candidates bounded, drops observed") {
    val obs = new Observation("cap_test")
    val capped = Buckets.capBuckets(bucketed, Seq(col("key")), 10, obs)
    val cand = capped.as("x").join(capped.as("y"),
        col("x.key") === col("y.key") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id"))
    val pairs = cand.collect()
    // without the cap: 100*99/2 + 2 = 4952 pairs; with it: the 2 true pairs
    assert(pairs.length === 2)
    val m = obs.get
    assert(m("dropped_rows") === 100L)
    assert(m("max_bucket") === 100L)
  }

  test("cap above every bucket: frame unchanged, zero drops observed") {
    val obs = new Observation("cap_noop")
    val capped = Buckets.capBuckets(bucketed, Seq(col("key")), 1000, obs)
    assert(capped.count() === 104)
    assert(obs.get("dropped_rows") === 0L)
  }

  test("named-metric form works inside a self-join (the q25 plan shape)") {
    val capped = Buckets.capBuckets(bucketed, Seq(col("key")), 10, "named_cap")
    val cand = capped.as("x").join(capped.as("y"),
        col("x.key") === col("y.key") && col("x.doc_id") < col("y.doc_id"))
    assert(cand.count() === 2)
  }
}
