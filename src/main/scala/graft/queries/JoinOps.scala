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

    // ------------------------------------- as-of join, physical operator
    Q("q51b_asof_exec",
      "q51 through the PHYSICAL as-of operator (plans/AsOfJoinExec via " +
        "spark.graft.asof.impl=exec on a scoped session clone): the " +
        "co-partitioned sorted-merge pass with one buffered right row " +
        "of state, planned by the injected SparkStrategy. Same oracle " +
        "as q51 — the hash match certifies the custom SparkPlan's " +
        "semantics against DuckDB's native ASOF JOIN, independently of " +
        "the spec that pins exec ≡ rewrite.",
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
        ORDER BY p.event_id""")) { (s0, dir) =>
      // scoped clone: conf change invisible to the shared session
      val s = s0.newSession()
      s.conf.set("spark.graft.asof.impl", "exec")
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

    // ------------------------------------- range join, physical operator
    Q("q52b_range_exec",
      "q52 through the PHYSICAL interval-join operator (plans/" +
        "RangeJoinExec via spark.graft.range.impl=exec on a scoped " +
        "session clone): both sides co-partition on the user key and " +
        "sort by (by, on); one merge pass slides a window buffer over " +
        "the right side — every right row is copied in once and evicted " +
        "once (amortized O(n+m) + output), per-partition state bounded " +
        "by one group's window span, and no 2× bucket blow-up shuffles. " +
        "Same oracle as q52: the hash match certifies the custom " +
        "SparkPlan against DuckDB's native inequality join, " +
        "independently of the spec pinning exec ≡ bucket composition.",
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
        GROUP BY 1, 2, 3 ORDER BY 1""")) { (s0, dir) =>
      val s = s0.newSession() // scoped clone, the q51b rule
      s.conf.set("spark.graft.range.impl", "exec")
      val e = Tables.events(s, dir)
        .withColumn("tss", date_trunc("second", col("ts")))
        .withColumn("sec", unix_timestamp(col("tss")))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("tss"), col("sec"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("sec").as("c_sec"))
      graft.plans.RangeJoinOp.join(purchases, clicks,
          leftOn = purchases("sec"), rightOn = clicks("c_sec"),
          leftBy = purchases("user_id"), rightBy = clicks("c_user"),
          window = 3600L)
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
    },

    // ------------------------------------------------------- join-key skew audit
    Q("q117_skew_audit",
      "The diagnosis that decides WHETHER q65's salting (or a bigger AQE " +
        "skew threshold) is needed, run before the expensive join: " +
        "per-key cardinality profile of the join key. Emits the top-5 " +
        "heavy keys with their exact share of the table, plus the " +
        "global picture every row carries: total rows, distinct keys, " +
        "and the recommended salt factor = ceil(max_key_rows / ideal " +
        "rows-per-partition at 32 partitions) — the integer formula " +
        "that sizes q65's salt count (1 means no salting needed). " +
        "Dataflow: one hash-agg onto the key domain, a TakeOrdered " +
        "top-5, and the 1-row global aggregate broadcast back (the q23 " +
        "scalar pattern). All shares derive from exact BIGINTs; at " +
        "100 TB this replaces the failed-stage post-mortem with a " +
        "10-second pre-flight.",
      Some("""
        WITH c AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1),
        g AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_rows,
                     COUNT(*) AS n_keys,
                     CAST(MAX(cnt) AS BIGINT) AS max_cnt
              FROM c),
        r AS (SELECT user_id, cnt,
                     ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS rnk
              FROM c)
        SELECT r.rnk::BIGINT AS rnk, r.user_id, r.cnt,
               ROUND(r.cnt::DOUBLE * 100 / g.total_rows, 4) AS pct_of_rows,
               g.total_rows, g.n_keys,
               CAST((g.max_cnt * 32 + g.total_rows - 1) // g.total_rows
                    AS BIGINT) AS salt_factor
        FROM r CROSS JOIN g
        WHERE r.rnk <= 5 ORDER BY rnk""")) { (s, dir) =>
      val c = Tables.events(s, dir)
        .groupBy("user_id").agg(count(lit(1)).as("cnt"))
      val g = c.agg(sum(col("cnt")).as("total_rows"),
        count(lit(1)).as("n_keys"), max(col("cnt")).as("max_cnt"))
      val top = c.orderBy(col("cnt").desc, col("user_id")).limit(5)
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("cnt").desc, col("user_id"))).cast("long"))
      top.crossJoin(broadcast(g))
        .select(col("rnk"), col("user_id"), col("cnt"),
          round(col("cnt").cast("double") * 100 / col("total_rows"), 4)
            .as("pct_of_rows"),
          col("total_rows"), col("n_keys"),
          // ceil-div in exact integers: salt = ceil(max_cnt / (total/32))
          expr("(max_cnt * 32 + total_rows - 1) DIV total_rows")
            .as("salt_factor"))
        .orderBy("rnk")
    },

    // ------------------------------------------------------ six-table star join
    Q("q119_star_join",
      "The TPC-H Q5 shape — local-supplier revenue by nation: lineitem " +
        "⋈ orders ⋈ supplier ⋈ customer ⋈ nation ⋈ region with the " +
        "correlated c_nationkey = s_nationkey condition and a one-year " +
        "date slice. This is the multi-way join-planning gate: the " +
        "provably bounded dims (region 5 rows, nation 25, supplier " +
        "SF-bounded) broadcast explicitly, customer/orders are left to " +
        "AQE (broadcast at bench SF, shuffle at 100 TB), and the fact " +
        "table is scanned ONCE with the date filter pushed into the " +
        "orders scan before any join (plan-audited: no cartesian, dims " +
        "never shuffle the fact side). Revenue = extendedprice·(1−" +
        "discount) computed entirely in integers — cents × (100 − " +
        "discount pct) — summed exactly, one double division at the " +
        "end, so both engines agree bit-for-bit.",
      Some("""
        SELECT n_name AS nation, COUNT(*) AS n_items,
               ROUND(CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) *
                     (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS DOUBLE)
                     / 10000, 2) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val asiaNations = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"),
          (lit(100L) - round(col("l_discount") * 100).cast("long")).as("keep_pct"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("cents") * col("keep_pct")).cast("double") / 10000, 2)
            .as("revenue"))
        .orderBy("nation")
    },

    // ------------------------------------------------ fuzzy (edit-distance) join
    Q("q81_fuzzy_join",
      "Fuzzy entity matching (edit-distance self-join, the record-linkage " +
        "primitive): find distinct part-name pairs within Levenshtein 2. " +
        "Scale shape, in order: (1) DOMAIN COLLAPSE — one hash-agg " +
        "dedupes the corpus to its distinct-name domain (300:1 here; " +
        "entity strings always dedupe hard), so everything after is " +
        "bounded by the domain, not the table; (2) token-block inverted " +
        "index — candidates must share a whole token, never all-pairs; " +
        "(3) the length filter |len(a)-len(b)| ≤ 2 prunes inside the " +
        "block join condition (lev ≥ length gap); (4) exact levenshtein " +
        "only on survivors. The oracle replicates the blocking exactly — " +
        "shared-token recall (an edit inside every token of a pair can " +
        "evade it) is the documented PPJoin-style tradeoff; hot-token " +
        "blocks at web scale get the q25/q34b capBuckets treatment.",
      Some("""
        WITH n AS (SELECT p_name AS name, COUNT(*)::BIGINT AS n_parts
                   FROM part GROUP BY 1),
        tok AS (SELECT name, n_parts, unnest(string_split(name, ' ')) AS tk
                FROM n)
        SELECT DISTINCT a.name AS name_a, b.name AS name_b,
               levenshtein(a.name, b.name)::BIGINT AS dist,
               a.n_parts AS n_a, b.n_parts AS n_b
        FROM tok a JOIN tok b
          ON a.tk = b.tk AND a.name < b.name
         AND abs(length(a.name) - length(b.name)) <= 2
        WHERE levenshtein(a.name, b.name) <= 2
        ORDER BY name_a, name_b""")) { (s, dir) =>
      val names = Tables.part(s, dir)
        .groupBy(col("p_name").as("name"))
        .agg(count(lit(1)).as("n_parts"))
      val tok = names.select(col("name"), col("n_parts"),
        explode(split(col("name"), " ")).as("tk"))
      tok.as("a").join(tok.as("b"),
          col("a.tk") === col("b.tk") && col("a.name") < col("b.name") &&
            abs(length(col("a.name")) - length(col("b.name"))) <= 2)
        .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
          levenshtein(col("a.name"), col("b.name")).cast("long").as("dist"),
          col("a.n_parts").as("n_a"), col("b.n_parts").as("n_b"))
        .filter(col("dist") <= 2) // verify before dedupe: cheaper survivors
        .distinct()
        .orderBy("name_a", "name_b")
    }
  )
}
