package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Temporal join operators Spark lacks as built-ins — the custom-operator
  * tier of the brief (as-of join, range join) — each expressed in its
  * scale-safe distributed shape rather than an inequality
  * broadcast-nested-loop (which is what a naive `a.join(b, a.ts >= b.ts)`
  * degenerates to).
  *
  * Determinism: all comparisons run on second-truncated event times
  * (DuckDB sees nanosecond timestamps, Spark microseconds — same rule as
  * q37), and the as-of result carries the matched TIMESTAMP, not a row
  * id, so equal-timestamp ties cannot produce engine-dependent output.
  */
object JoinOps {

  val all: Seq[Q] = Seq(

    // --------------------------------------------------------- as-of join
    Q("q51_asof_join",
      "As-of join (last-click attribution): for every purchase, the most " +
        "recent click by the same user at-or-before it. Spark shape: tag " +
        "and UNION both sides, one shuffle+sort per user, running " +
        "max(click time) over the ordered frame — the distributed merge " +
        "the dedicated ASOF operators (DuckDB/Pandas/kdb) implement, with " +
        "no inequality join anywhere. Clicks sort before purchases at " +
        "equal times, making the bound inclusive in both engines.",
      Some("""
        WITH e AS (SELECT event_id, user_id,
                          date_trunc('second', ts::TIMESTAMP) AS tss, event_type
                   FROM events),
        p AS (SELECT event_id, user_id, tss FROM e WHERE event_type = 'purchase'),
        c AS (SELECT user_id, tss FROM e WHERE event_type = 'click')
        SELECT p.event_id, p.user_id, p.tss AS p_tss,
               c.tss AS last_click_tss,
               date_diff('second', c.tss, p.tss)::BIGINT AS gap_s
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.tss >= c.tss
        ORDER BY p.event_id""")) { (s, dir) =>
      val e = Tables.events(s, dir)
        .withColumn("tss", date_trunc("second", col("ts")))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("tss"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("tss").as("last_click_tss"))
      graft.plans.AsOf.join(purchases, clicks,
          leftOn = purchases("tss"), rightOn = clicks("last_click_tss"),
          leftBy = purchases("user_id"), rightBy = clicks("c_user"))
        .select(col("event_id"), col("user_id"), col("tss").as("p_tss"),
          col("last_click_tss"),
          (unix_timestamp(col("tss")) - unix_timestamp(col("last_click_tss")))
            .cast("long").as("gap_s"))
        .orderBy("event_id")
    },

    // --------------------------------------------------------- range join
    Q("q52_range_join",
      "Interval/range join: clicks per user inside the hour before each " +
        "purchase. Spark shape: bucket both sides by hour — every click " +
        "lands in its own bucket and the next (bounded 2x blow-up), the " +
        "join becomes an equi-join on (user, bucket) with an exact range " +
        "post-filter — never an inequality nested loop. Cost: one " +
        "shuffle, candidates bounded by bucket co-residency.",
      Some("""
        WITH e AS (SELECT event_id, user_id,
                          date_trunc('second', ts::TIMESTAMP) AS tss, event_type
                   FROM events),
        p AS (SELECT event_id, user_id, tss FROM e WHERE event_type = 'purchase'),
        c AS (SELECT user_id, tss FROM e WHERE event_type = 'click')
        SELECT p.event_id, p.user_id, p.tss AS p_tss,
               COUNT(c.user_id) AS n_clicks_1h
        FROM p LEFT JOIN c
          ON c.user_id = p.user_id
         AND c.tss > p.tss - INTERVAL 1 HOUR AND c.tss <= p.tss
        GROUP BY 1, 2, 3 ORDER BY 1""")) { (s, dir) =>
      val e = Tables.events(s, dir)
        .withColumn("tss", date_trunc("second", col("ts")))
        .withColumn("sec", unix_timestamp(col("tss")))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("tss"), col("sec"),
          floor(col("sec") / 3600).as("bucket"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("sec").as("c_sec"),
          explode(array(floor(col("sec") / 3600),
            floor(col("sec") / 3600) + 1)).as("bucket"))
      purchases.join(clicks,
          purchases("user_id") === clicks("c_user") &&
            purchases("bucket") === clicks("bucket") &&
            col("c_sec") > col("sec") - 3600 && col("c_sec") <= col("sec"),
          "left")
        .groupBy(col("event_id"), col("user_id"), col("tss").as("p_tss"))
        .agg(count(col("c_user")).as("n_clicks_1h"))
        .orderBy("event_id")
    },

    // -------------------------------------------------------- salted join
    Q("q65_salted_join",
      "Skew-resistant fact-to-dim enrichment via operators/SaltedJoin: " +
        "every event picks up its user's aggregate profile through an " +
        "equi-join where the fact side is salted into 16 sub-keys and the " +
        "dim side replicated per sub-key — no reducer owns a hot user's " +
        "full row set. The oracle is the PLAIN join (salting must be " +
        "semantically invisible); SaltedJoinSpec proves the spread. AQE " +
        "skew-split is the zero-code default; explicit salting covers the " +
        "layouts AQE can't re-plan (stateful consumers, bucketed writes).",
      Some(s"""
        WITH d AS (SELECT user_id, COUNT(*) AS user_events,
                          ${H.oMoneySum("value")} AS user_value
                   FROM events GROUP BY 1)
        SELECT e.event_id, e.user_id, e.event_type, d.user_events, d.user_value
        FROM events e JOIN d USING (user_id) ORDER BY event_id""")) { (s, dir) =>
      val events = Tables.events(s, dir)
      val dim = events.groupBy("user_id")
        .agg(count(lit(1)).as("user_events"), H.moneySum(col("value")).as("user_value"))
      graft.operators.SaltedJoin.join(
          events.select("event_id", "user_id", "event_type"), dim,
          Seq("user_id"), salts = 16)
        .select("event_id", "user_id", "event_type", "user_events", "user_value")
        .orderBy("event_id")
    }
  )
}
