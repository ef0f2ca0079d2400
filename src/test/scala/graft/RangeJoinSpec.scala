package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.RangeJoinOp

/** The custom interval-join operator (graft.plans.RangeJoinPlan):
  * window-bound semantics, left-outer nulls, SQL null keys, group
  * transitions, and — the load-bearing contract — the physical merge
  * pass (impl=exec) row-identical to the bucket composition on every
  * edge case. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._
  import scala.jdk.CollectionConverters._

  // clicks at integer seconds; window = 10 s, bound (lo-10, lo]
  private lazy val purchases = Seq(
    (1L, "A", 100L), // clicks at 91..100 match; 90 is exactly lo-w: excluded
    (2L, "A", 105L), // window slides: 96..105
    (3L, "A", 200L), // far future: buffer fully evicted -> no match
    (4L, "B", 50L),  // other group
    (5L, "C", 50L)   // group with no right rows at all
  ).toDF("p_id", "user", "p_sec")

  private lazy val clicks = Seq(
    ("A", 90L),  // = lo-w for p1: strict lower bound excludes
    ("A", 91L),  // in p1 only
    ("A", 100L), // = lo for p1 (inclusive upper); also in p2
    ("A", 105L), // in p2 only
    ("B", 40L),  // = lo-w for p4: excluded
    ("B", 50L)   // in p4
  ).toDF("c_user", "c_sec")

  private def run(impl: String, l: DataFrame = purchases,
                  r: DataFrame = clicks): Seq[(Long, Option[Long])] = {
    val s = spark.newSession()
    s.conf.set("spark.graft.range.impl", impl)
    val lF = s.createDataFrame(l.collect().toSeq.asJava, l.schema)
    val rF = s.createDataFrame(r.collect().toSeq.asJava, r.schema)
    RangeJoinOp.join(lF, rF, lF("p_sec"), rF("c_sec"), lF("user"), rF("c_user"),
        window = 10L)
      .select(col("p_id"), col("c_sec"))
      .collect().toSeq
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1))))
      .sortBy(t => (t._1, t._2.getOrElse(Long.MinValue)))
  }

  private val expected = Seq(
    1L -> Some(91L), 1L -> Some(100L), // 90 excluded (strict), 100 inclusive
    2L -> Some(100L), 2L -> Some(105L),
    3L -> None, // window moved past everything
    4L -> Some(50L), // 40 excluded at the strict lower boundary
    5L -> None) // no group

  test("bucket composition: window bounds, slide, eviction, outer nulls") {
    assert(run("bucket") === expected)
  }

  test("physical exec: identical rows on every edge case") {
    assert(run("exec") === expected)
  }

  test("SQL null semantics agree across both implementations") {
    val l = Seq((1L, Option("A"), Option(100L)),
      (2L, Option("A"), Option.empty[Long]),   // null leftOn
      (3L, Option.empty[String], Option(100L)) // null leftBy
    ).toDF("p_id", "user", "p_sec")
    val r = Seq((Option("A"), Option(95L)),
      (Option("A"), Option.empty[Long]),       // null rightOn: never matches
      (Option.empty[String], Option(95L))      // null rightBy: never matches
    ).toDF("c_user", "c_sec")
    val want = Seq(1L -> Some(95L), 2L -> None, 3L -> None)
    assert(run("bucket", l, r) === want)
    assert(run("exec", l, r) === want)
  }

  test("exec plan shape: co-partitioned exchanges + (by, on) sorts feed RangeJoinExec") {
    val s = spark.newSession()
    s.conf.set("spark.graft.range.impl", "exec")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val lF = s.createDataFrame(purchases.collect().toSeq.asJava, purchases.schema)
    val rF = s.createDataFrame(clicks.collect().toSeq.asJava, clicks.schema)
    val df = RangeJoinOp.join(lF, rF, lF("p_sec"), rF("c_sec"),
      lF("user"), rF("c_user"), window = 10L)
    val p = df.queryExecution.executedPlan.toString
    // SparkPlan nodeName strips the Exec suffix
    assert(p.contains("RangeJoin "), s"strategy did not plan the node:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2,
      s"both sides must co-partition on the by key:\n$p")
    assert(p.linesIterator.count(l => l.contains("Sort [") &&
      (l.contains("user") || l.contains("c_user"))) == 2,
      s"both sides must sort (by, on):\n$p")
  }

  test("amortized merge: a dense shared window emits the full cross of in-window rows") {
    // 3 purchases x 4 clicks all inside every 10s window: 12 matched rows
    val l = (0 to 2).map(i => (i.toLong + 1, "A", 100L + i)).toDF("p_id", "user", "p_sec")
    val r = (1 to 4).map(i => ("A", 94L + i)).toDF("c_user", "c_sec")
    val bucket = run("bucket", l, r)
    val exec = run("exec", l, r)
    assert(bucket === exec)
    assert(exec.count(_._2.isDefined) === 12)
  }
}
