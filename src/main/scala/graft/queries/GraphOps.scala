package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Distributed graph-ranking operators, complementing the label
  * propagation in [[graft.operators.ConnectedComponents]]: iterative
  * message-passing expressed as join + hash-agg supersteps — the Pregel
  * dataflow on plain DataFrames.
  *
  * Determinism: ranks are parts-per-million BIGINTs and every damping
  * step is integer arithmetic ((850000·Σc) div 10^6), so the iteration
  * is bit-reproducible and the DuckDB oracle replays it exactly —
  * the same integer-iteration contract as q70's k-means.
  */
object GraphOps {

  val all: Seq[Q] = Seq(

    Q("q85_graph_rank",
      "Supplier centrality via bipartite PageRank (damping 0.85, three " +
        "half-steps part→supp→part→supp) over the part↔supplier " +
        "co-occurrence graph mined from lineitem. Scale shape: the edge " +
        "list with both endpoint degrees attached is built ONCE (one " +
        "distinct + two degree aggs) and every superstep is one " +
        "edge-list join + one hash-agg on the destination key — the " +
        "Pregel cost model; no collect, no driver loop state, " +
        "iterations chain lazily exactly like q70 (checkpoint each " +
        "superstep at real scale). Integer headroom: contributions are " +
        "≤10^6·deg, so 850000·Σc stays in long to ~10^7 average degree.",
      Some("""
        WITH e AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS sp FROM lineitem),
        dp AS (SELECT p, COUNT(*)::BIGINT AS dp FROM e GROUP BY 1),
        ds AS (SELECT sp, COUNT(*)::BIGINT AS ds FROM e GROUP BY 1),
        r0 AS (SELECT p, 1000000::BIGINT AS r FROM dp),
        s1 AS (SELECT e.sp, 150000 + (850000 * SUM(r0.r // dp.dp)) // 1000000 AS r
               FROM e JOIN r0 USING (p) JOIN dp USING (p) GROUP BY 1),
        p1 AS (SELECT e.p, 150000 + (850000 * SUM(s1.r // ds.ds)) // 1000000 AS r
               FROM e JOIN s1 USING (sp) JOIN ds USING (sp) GROUP BY 1),
        s2 AS (SELECT e.sp, 150000 + (850000 * SUM(p1.r // dp.dp)) // 1000000 AS r
               FROM e JOIN p1 USING (p) JOIN dp USING (p) GROUP BY 1)
        SELECT sp AS supp_key, ds AS n_parts, r::BIGINT AS rank_ppm
        FROM s2 JOIN ds USING (sp) ORDER BY sp""")) { (s, dir) =>
      val e = Tables.lineitem(s, dir)
        .select(col("l_partkey").as("p"), col("l_suppkey").as("sp"))
        .distinct()
      val degP = e.groupBy("p").agg(count(lit(1)).as("dp"))
      val degS = e.groupBy("sp").agg(count(lit(1)).as("ds"))
      // edge list with both endpoint degrees riding along — built once,
      // reused by every superstep (exchange reuse on the distinct)
      val ew = e.join(degP, "p").join(degS, "sp")
      val r0 = degP.select(col("p"), lit(1000000L).as("r"))
      def toSupp(rp: org.apache.spark.sql.DataFrame) = ew
        .join(rp, "p")
        .groupBy("sp").agg(sum(expr("r div dp")).as("c"))
        .select(col("sp"), expr("150000 + (850000 * c) div 1000000").as("r"))
      def toPart(rs: org.apache.spark.sql.DataFrame) = ew
        .join(rs, "sp")
        .groupBy("p").agg(sum(expr("r div ds")).as("c"))
        .select(col("p"), expr("150000 + (850000 * c) div 1000000").as("r"))
      toSupp(toPart(toSupp(r0)))
        .join(degS, "sp")
        .select(col("sp").as("supp_key"), col("ds").as("n_parts"),
          col("r").as("rank_ppm"))
        .orderBy("supp_key")
    }
  )
}
