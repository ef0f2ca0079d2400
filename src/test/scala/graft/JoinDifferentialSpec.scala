package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.{AsOf, RangeJoinOp}

/** Randomized differential testing for the two custom join operators:
  * on seeded pseudo-random data (dense key collisions, timestamp ties,
  * nulls on every key column), each implementation must agree with a
  * REFERENCE computed through Spark's own inequality join — three
  * independent code paths that can only agree if the semantics are
  * right. Deterministic seed: failures replay exactly. */
class JoinDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(20260813L)

  // ~8 by-keys over 300 rows with ts in a small range → heavy groups,
  // ties, and window overlaps; ~5% null keys and times
  private def side(n: Int): Seq[(Option[String], Option[Long], Long)] =
    (1 to n).map { i =>
      val by = if (rng.nextInt(20) == 0) None else Some(s"u${rng.nextInt(8)}")
      val on = if (rng.nextInt(20) == 0) None else Some(rng.nextInt(500).toLong)
      (by, on, i.toLong)
    }

  private lazy val leftRows = side(300)
  private lazy val rightRows = side(300)

  private def frames(s: org.apache.spark.sql.SparkSession): (DataFrame, DataFrame) = {
    import s.implicits._
    (leftRows.toDF("l_by", "l_on", "l_id"),
      rightRows.toDF("r_by", "r_on", "r_id"))
  }

  private def scoped(conf: (String, String)*): org.apache.spark.sql.SparkSession = {
    val s = spark.newSession()
    conf.foreach { case (k, v) => s.conf.set(k, v) }
    s
  }

  test("range join: exec, bucket, and the inequality-join reference agree on random data") {
    val W = 50L
    def result(impl: String): Set[(Long, Option[Long])] = {
      val s = scoped("spark.graft.range.impl" -> impl)
      val (l, r) = frames(s)
      RangeJoinOp.join(l, r, l("l_on"), r("r_on"), l("l_by"), r("r_by"), W)
        .select(col("l_id"), col("r_id")).collect()
        .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1))))
        .toSet
    }
    // reference: Spark's own (nested-loop) inequality join — fine at test
    // scale, the thing the operator exists to avoid at data scale
    val (l, r) = frames(spark)
    val matched = l.join(r,
        col("l_by") === col("r_by") &&
          col("r_on") > col("l_on") - W && col("r_on") <= col("l_on"))
      .select(col("l_id"), col("r_id")).as[(Long, Long)].collect()
    val matchedLeft = matched.map(_._1).toSet
    val outer = l.select("l_id").as[Long].collect()
      .filterNot(matchedLeft).map(_ -> Option.empty[Long])
    val reference = matched.map { case (a, b) => a -> Option(b) }.toSet ++ outer
    assert(result("bucket") === reference)
    assert(result("exec") === reference)
  }

  test("as-of join: exec and rewrite agree with the window reference on random data") {
    def result(impl: String): Set[(Long, Option[Long])] = {
      val s = scoped("spark.graft.asof.impl" -> impl)
      val (l, r) = frames(s)
      AsOf.join(l, r, l("l_on"), r("r_on"), l("l_by"), r("r_by"))
        .select(col("l_id"), col("r_id")).collect()
        .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1))))
        .toSet
    }
    // reference: max (r_on, r_id) per left row via the inequality join —
    // the as-of contract's tie-break is the remaining right columns, here r_id
    val (l, r) = frames(spark)
    val best = l.join(r,
        col("l_by") === col("r_by") && col("r_on") <= col("l_on"))
      .groupBy("l_id")
      .agg(max(struct(col("r_on"), col("r_id"))).as("m"))
      .select(col("l_id"), col("m.r_id"))
      .as[(Long, Long)].collect()
    val bestLeft = best.map(_._1).toSet
    val outer = l.select("l_id").as[Long].collect()
      .filterNot(bestLeft).map(_ -> Option.empty[Long])
    val reference = best.map { case (a, b) => a -> Option(b) }.toSet ++ outer
    assert(result("rewrite") === reference)
    assert(result("exec") === reference)
  }
}
