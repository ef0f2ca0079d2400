package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.etl.Pipeline

/** Oracle gates for the ETL helper transforms that previously had only
  * unit-spec coverage (round-2 verdict item 4): F3 null-sentinel, P11
  * incomplete-row drop, F25 status decode maps, P6 export projection.
  *
  * The driver testdata has no nulls, so q44/q45 synthesize them with a
  * deterministic predicate first (`nullif`-style), then run the REAL
  * Pipeline transform under the gate — the point is wiring the production
  * code path, not the null source. All four are narrow projections /
  * single hash-aggs: trivially scale-safe.
  */
object EtlOps {

  val all: Seq[Q] = Seq(

    // ----------------------------------------------------------------- F3
    Q("q44_null_sentinel",
      "F3 null-sentinel substitution (src/Criptografia.py:75-78) via " +
        "Pipeline.nullSentinel: null phone -> literal sentinel.",
      Some("""
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN 'SEGMENTO_NULO'
                    ELSE c_mktsegment END AS c_mktsegment
        FROM customer ORDER BY c_custkey""")) { (s, dir) =>
      val withNulls = Tables.customer(s, dir)
        .withColumn("c_mktsegment",
          when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_mktsegment")))
      Pipeline.nullSentinel(withNulls, "c_mktsegment", "SEGMENTO_NULO")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    },

    // ---------------------------------------------------------------- P11
    Q("q45_drop_incomplete",
      "P11 na.drop on required columns (src/etl_pipeline.py:442) via " +
        "Pipeline.dropIncomplete, tolerating an absent required column " +
        "like the reference's presence guards.",
      Some("""
        SELECT o_orderstatus, COUNT(*) AS n
        FROM orders
        WHERE NOT (o_totalprice > 150000)  -- synthesized null #1
          AND NOT (o_orderpriority = '1-URGENT')  -- synthesized null #2
        GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val withNulls = Tables.orders(s, dir)
        .withColumn("o_orderdate",
          when(col("o_totalprice") > 150000, lit(null)).otherwise(col("o_orderdate")))
        .withColumn("o_clerkish",
          when(col("o_orderpriority") === "1-URGENT", lit(null))
            .otherwise(col("o_orderpriority")))
      Pipeline.dropIncomplete(withNulls,
          Seq("o_orderdate", "o_clerkish", "coluna_inexistente"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    },

    // ---------------------------------------------------------------- F25
    Q("q46_decode_status",
      "F25 status decode maps (src/etl_pipeline.py:14-25) via " +
        "Pipeline.decodeStatus: matched codes recode, unmatched pass through.",
      Some("""
        SELECT CASE WHEN o_orderstatus = 'O' THEN 'Aberta'
                    WHEN o_orderstatus = 'F' THEN 'Executada'
                    ELSE o_orderstatus END AS o_orderstatus,
               COUNT(*) AS n
        FROM orders GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      Pipeline.decodeStatus(Tables.orders(s, dir), "o_orderstatus",
          Map("O" -> "Aberta", "F" -> "Executada"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    },

    // ----------------------------------------------------------------- P6
    Q("q47_export_projection",
      "P6 fixed export projection (src/Criptografia.py:134-171) via " +
        "Pipeline.exportProjection: ordered column subset, absent columns " +
        "skipped.",
      Some("""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer ORDER BY c_custkey""")) { (s, dir) =>
      Pipeline.exportProjection(Tables.customer(s, dir),
          Seq("c_custkey", "c_name", "c_acctbal", "coluna_inexistente"))
        .orderBy("c_custkey")
    }
  )
}
