package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.plans.{AsOf, AsOfJoin, RewriteAsOfJoin}

/** The custom as-of-join operator (graft.plans): trades/quotes semantics,
  * left-outer nulls, inclusive bound, deterministic tie-break, and the
  * ExprId-pinning contract that makes the lowered plan composable. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val trades = Seq(
    (1L, "A", ts("2024-01-01 10:00:05")),
    (2L, "A", ts("2024-01-01 10:00:00")), // equal-ts quote: inclusive
    (3L, "A", ts("2024-01-01 09:00:00")), // before any quote: nulls
    (4L, "B", ts("2024-01-01 12:00:00")),
    (5L, "C", ts("2024-01-01 12:00:00"))  // no quotes for C at all
  ).toDF("t_id", "sym", "t_ts")

  private lazy val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 101.0),
    ("A", ts("2024-01-01 10:00:03"), 102.0),
    ("A", ts("2024-01-01 10:00:07"), 103.0), // after trade 1: excluded
    ("B", ts("2024-01-01 11:59:00"), 55.0),
    ("B", ts("2024-01-01 11:59:00"), 56.0)   // same ts: tie-break -> max px
  ).toDF("q_sym", "q_ts", "px")

  private lazy val joined = AsOf.join(trades, quotes,
    leftOn = trades("t_ts"), rightOn = quotes("q_ts"),
    leftBy = trades("sym"), rightBy = quotes("q_sym"))

  test("as-of semantics: latest at-or-before per group, outer nulls, ties") {
    val got = joined.orderBy("t_id")
      .select("t_id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(got.toSeq === Seq(
      1L -> Some(102.0), // 10:00:03 is the latest <= 10:00:05
      2L -> Some(101.0), // equal timestamp is included
      3L -> None,        // no quote yet
      4L -> Some(56.0),  // equal-ts quotes: struct tie-break takes max px
      5L -> None))       // no group at all
  }

  test("SQL null semantics: null on/by never matches, null-keyed left rows emit with nulls") {
    val l = Seq((1L, Option("A"), Option(ts("2024-01-01 10:00:00"))),
      (2L, Option("A"), Option.empty[Timestamp]),      // null leftOn
      (3L, Option.empty[String], Option(ts("2024-01-01 10:00:00"))) // null leftBy
    ).toDF("t_id", "sym", "t_ts")
    val r = Seq((Option("A"), Option(ts("2024-01-01 09:00:00")), 1.0),
      (Option("A"), Option.empty[Timestamp], 99.0),    // null rightOn: never matches
      (Option.empty[String], Option(ts("2024-01-01 09:00:00")), 98.0) // null rightBy
    ).toDF("q_sym", "q_ts", "px")
    val got = AsOf.join(l, r, l("t_ts"), r("q_ts"), l("sym"), r("q_sym"))
      .orderBy("t_id").select("t_id", "px").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getDouble(1))))
    assert(got.toSeq === Seq(
      1L -> Some(1.0), // only the non-null right row matches
      2L -> None,      // null leftOn satisfies no >= predicate
      3L -> None))     // null leftBy matches no group (not even null rightBy)
  }

  test("lowered plan composes: filters and joins over the result work") {
    // proves ExprId pinning — downstream references resolve post-rewrite
    assert(joined.filter(col("px") > 100.0).count() === 2)
    val again = joined.join(trades.select(col("t_id").as("t2")),
      col("t_id") === col("t2"))
    assert(again.count() === 5)
  }

  test("self-lineage inputs are deduped by the API") {
    val base = Seq((1L, "x", ts("2024-01-01 00:00:00")),
      (2L, "x", ts("2024-01-01 00:01:00"))).toDF("id", "k", "ts0")
    val l = base.filter(col("id") === 2L)
    val r = base.filter(col("id") === 1L)
      .select(col("k").as("rk"), col("ts0").as("rts"), col("id").as("rid"))
    val out = AsOf.join(l, r, l("ts0"), r("rts"), l("k"), r("rk")).collect()
    assert(out.length === 1 && out(0).getLong(out(0).fieldIndex("rid")) === 1L)
  }

  test("physical exec path: AsOfJoinExec equals the rewrite on every edge case") {
    val s = spark.newSession()
    s.conf.set("spark.graft.asof.impl", "exec")
    import s.implicits._
    // same fixtures as the semantic tests, but spread over partitions so
    // the merge crosses co-partitioned shuffle + sort boundaries
    val l = Seq(
      (1L, Option("A"), Option(ts("2024-01-01 10:00:05"))),
      (2L, Option("A"), Option(ts("2024-01-01 10:00:00"))), // inclusive
      (3L, Option("A"), Option(ts("2024-01-01 09:00:00"))), // pre-quote
      (4L, Option("B"), Option(ts("2024-01-01 12:00:00"))), // tie-break
      (5L, Option("C"), Option(ts("2024-01-01 12:00:00"))), // no group
      (6L, Option("A"), Option.empty[Timestamp]),           // null leftOn
      (7L, Option.empty[String], Option(ts("2024-01-01 10:00:00"))) // null leftBy
    ).toDF("t_id", "sym", "t_ts").repartition(3)
    val r = Seq(
      (Option("A"), Option(ts("2024-01-01 10:00:00")), 101.0),
      (Option("A"), Option(ts("2024-01-01 10:00:03")), 102.0),
      (Option("A"), Option(ts("2024-01-01 10:00:07")), 103.0),
      (Option("B"), Option(ts("2024-01-01 11:59:00")), 55.0),
      (Option("B"), Option(ts("2024-01-01 11:59:00")), 56.0), // tie
      (Option("A"), Option.empty[Timestamp], 99.0),           // null rightOn
      (Option.empty[String], Option(ts("2024-01-01 09:00:00")), 98.0) // null rightBy
    ).toDF("q_sym", "q_ts", "px").repartition(3)
    val exec = AsOf.join(l, r, l("t_ts"), r("q_ts"), l("sym"), r("q_sym"))
    // the physical operator must actually be in the plan (SparkPlan
    // nodeName strips the Exec suffix → "AsOfJoin" + expression list)
    assert(exec.queryExecution.executedPlan.toString.contains("AsOfJoin "))
    val got = exec.orderBy("t_id").select("t_id", "px").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getDouble(1))))
    assert(got.toSeq === Seq(
      1L -> Some(102.0), 2L -> Some(101.0), 3L -> None,
      4L -> Some(56.0), 5L -> None, 6L -> None, 7L -> None))
    // cross-check: bit-identical to the rewrite path on the same inputs
    s.conf.set("spark.graft.asof.impl", "rewrite")
    val rew = AsOf.join(l, r, l("t_ts"), r("q_ts"), l("sym"), r("q_sym"))
    assert(exec.exceptAll(rew).count() === 0 && rew.exceptAll(exec).count() === 0)
  }

  test("exec plan shape: co-partitioned exchanges + sorts on (by, on)") {
    val s = spark.newSession()
    s.conf.set("spark.graft.asof.impl", "exec")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    import s.implicits._
    val l = Seq((1L, "A", ts("2024-01-01 10:00:05"))).toDF("t_id", "sym", "t_ts")
    val r = Seq(("A", ts("2024-01-01 10:00:00"), 1.0)).toDF("q_sym", "q_ts", "px")
    val p = AsOf.join(l, r, l("t_ts"), r("q_ts"), l("sym"), r("q_sym"))
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin "), p)
    assert(p.linesIterator.count(l0 => l0.contains("Exchange hashpartitioning")) == 2,
      s"both sides must co-partition on the by key:\n$p")
    assert(p.linesIterator.count(_.contains("Sort [")) == 2,
      s"both sides must sort (by, on):\n$p")
  }

  test("raw node lowers through the injected analyzer rule pattern") {
    // RewriteAsOfJoin on the raw node yields a resolved, executable plan
    val node = AsOfJoin(
      org.apache.spark.sql.graftshim.analyzed(trades),
      org.apache.spark.sql.graftshim.analyzed(quotes),
      org.apache.spark.sql.graftshim.expression(trades("t_ts")),
      org.apache.spark.sql.graftshim.expression(quotes("q_ts")),
      org.apache.spark.sql.graftshim.expression(trades("sym")),
      org.apache.spark.sql.graftshim.expression(quotes("q_sym")))
    assert(!node.resolved || node.childrenResolved) // sugar node
    val lowered = RewriteAsOfJoin(node)
    assert(lowered.resolved)
  }
}
