package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions._
import H._

/** Reference-parity operator battery, re-expressed over the driver testdata
  * per FIXTURES.md §B (orders plays the appointment fact table, customer /
  * supplier / part play the dimensions, events plays the time-of-day data).
  *
  * Each query is the Spark-native form of a SURVEY.md §2 operator row and
  * carries its DuckDB oracle SQL inline so the parity contract is visible in
  * one place. Reference cites are in each doc string.
  */
object RefParity {

  /** Fixed analysis anchor — the reference uses volatile `datetime.now()`
    * (src/etl_pipeline.py:169); our engine parameterizes it. */
  private val asOf = "TIMESTAMP_NTZ '1997-06-01 00:00:00'"
  private val oAsOf = "TIMESTAMP '1997-06-01 00:00:00'"

  val all: Seq[Q] = Seq(

    // ----------------------------------------------------------------- A1
    Q("q01_daily_attendance",
      "A1 daily attendance mix (src/etl_pipeline.py:476-487): per-day totals, " +
        "conditional status counts, derived rates.",
      Some(s"""
        SELECT CAST(o_orderdate AS DATE) AS order_date,
               COUNT(*) AS total,
               ${oCnt("o_orderstatus='F'")} AS n_fulfilled,
               ${oCnt("o_orderstatus='O'")} AS n_open,
               ${oCnt("o_orderstatus='P'")} AS n_pending,
               ${oPct(oCnt("o_orderstatus='F'"), "COUNT(*)")} AS pct_fulfilled,
               ${oPct(oCnt("o_orderstatus='O'"), "COUNT(*)")} AS pct_open
        FROM orders GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(to_date(col("o_orderdate")).as("order_date"))
        .agg(
          count(lit(1)).as("total"),
          cnt(col("o_orderstatus") === "F").as("n_fulfilled"),
          cnt(col("o_orderstatus") === "O").as("n_open"),
          cnt(col("o_orderstatus") === "P").as("n_pending"))
        .withColumn("pct_fulfilled", pct(col("n_fulfilled"), col("total")))
        .withColumn("pct_open", pct(col("n_open"), col("total")))
        .orderBy("order_date")
    },

    // ------------------------------------------------------------ A2 + F13
    Q("q02_status_by_shift",
      "A2 status-by-shift (src/etl_pipeline.py:489-499) with the F13 shift " +
        "classifier (src/etl_pipeline.py:78-83) over events.ts.",
      Some(s"""
        SELECT CASE WHEN ts IS NULL THEN 'Indefinido'
                    WHEN hour(ts) BETWEEN 6 AND 11 THEN 'MANHA'
                    WHEN hour(ts) BETWEEN 12 AND 17 THEN 'TARDE'
                    ELSE 'NOITE' END AS turno,
               COUNT(*) AS total,
               ${oCnt("event_type='error'")} AS n_error,
               ${oCnt("event_type='purchase'")} AS n_purchase,
               ${oCnt("event_type='click'")} AS n_click,
               ${oPct(oCnt("event_type='error'"), "COUNT(*)")} AS pct_error
        FROM events GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val e = Tables.events(s, dir)
      e.groupBy(shift_of_day(col("ts")).as("turno"))
        .agg(
          count(lit(1)).as("total"),
          cnt(col("event_type") === "error").as("n_error"),
          cnt(col("event_type") === "purchase").as("n_purchase"),
          cnt(col("event_type") === "click").as("n_click"))
        .withColumn("pct_error", pct(col("n_error"), col("total")))
        .orderBy("turno")
    },

    // ------------------------------------------------------------ A3 + U1
    Q("q03_noshow_profile_long",
      "A3 long-format per-dimension profile with union-all melt " +
        "(src/etl_pipeline.py:501-528): one grouped block per dimension, " +
        "tagged and vertically concatenated.",
      Some(s"""
        SELECT * FROM (
          SELECT 'SEGMENTO' AS dimensao, c_mktsegment AS valor,
                 COUNT(*) AS total,
                 ${oCnt("o_orderstatus='F'")} AS n_f,
                 ${oCnt("o_orderstatus='O'")} AS n_o,
                 ${oCnt("o_orderstatus='P'")} AS n_p,
                 ${oPct(oCnt("o_orderstatus='F'"), "COUNT(*)")} AS pct_f
          FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 2
          UNION ALL
          SELECT 'PRIORIDADE', o_orderpriority,
                 COUNT(*),
                 ${oCnt("o_orderstatus='F'")},
                 ${oCnt("o_orderstatus='O'")},
                 ${oCnt("o_orderstatus='P'")},
                 ${oPct(oCnt("o_orderstatus='F'"), "COUNT(*)")}
          FROM orders GROUP BY 2
        ) ORDER BY dimensao, valor""")) { (s, dir) =>
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      // No broadcast hint: customer grows with SF — let AQE pick the strategy.
      val oc = o.join(c, col("o_custkey") === col("c_custkey"))
      def profile(df: org.apache.spark.sql.DataFrame,
                  dim: org.apache.spark.sql.Column, name: String) =
        df.groupBy(dim.as("valor"))
          .agg(
            count(lit(1)).as("total"),
            cnt(col("o_orderstatus") === "F").as("n_f"),
            cnt(col("o_orderstatus") === "O").as("n_o"),
            cnt(col("o_orderstatus") === "P").as("n_p"))
          .select(lit(name).as("dimensao"), col("valor"), col("total"),
            col("n_f"), col("n_o"), col("n_p"),
            pct(col("n_f"), col("total")).as("pct_f"))
      profile(oc, col("c_mktsegment"), "SEGMENTO")
        .unionByName(profile(o, col("o_orderpriority"), "PRIORIDADE"))
        .orderBy("dimensao", "valor")
    },

    // ----------------------------------------------------------------- A4
    Q("q04_financials",
      "A4 financial rollup (src/etl_pipeline.py:530-544): conditional revenue " +
        "sums + ticket médio per (segment, priority), exact via integer cents.",
      Some(s"""
        SELECT c_mktsegment AS segmento, o_orderpriority AS prioridade,
               COUNT(*) AS n_total,
               ${oCnt("o_orderstatus='F'")} AS n_realizado,
               ${oMoneySum("CASE WHEN o_orderstatus='F' THEN o_totalprice ELSE 0 END")} AS receita_realizada,
               ${oMoneySum("CASE WHEN o_orderstatus='O' THEN o_totalprice ELSE 0 END")} AS receita_aberta,
               ${oMoneySum("o_totalprice")} AS receita_potencial,
               CASE WHEN ${oCnt("o_orderstatus='F'")} > 0
                    THEN ROUND(CAST(${oCentsSum("CASE WHEN o_orderstatus='F' THEN o_totalprice ELSE 0 END")} AS DOUBLE)/100/${oCnt("o_orderstatus='F'")}, 2)
               END AS ticket_medio
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2 ORDER BY 1, 2""")) { (s, dir) =>
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val realizado = when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(0.0)
      o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segmento"),
          col("o_orderpriority").as("prioridade"))
        .agg(
          count(lit(1)).as("n_total"),
          cnt(col("o_orderstatus") === "F").as("n_realizado"),
          moneySum(realizado).as("receita_realizada"),
          moneySum(when(col("o_orderstatus") === "O", col("o_totalprice")).otherwise(0.0)).as("receita_aberta"),
          moneySum(col("o_totalprice")).as("receita_potencial"),
          centsSum(realizado).as("_cents_realizado"))
        .withColumn("ticket_medio",
          when(col("n_realizado") > 0,
            round(col("_cents_realizado").cast("double") / 100 / col("n_realizado"), 2)))
        .drop("_cents_realizado")
        .orderBy("segmento", "prioridade")
    },

    // ----------------------------------------------------------------- A5
    Q("q05_journey_times",
      "A5 journey timing profile (src/etl_pipeline.py:546-568): mean " +
        "lead/elapsed durations + on-time rate; ship delay in days plays the " +
        "journey duration.",
      Some(s"""
        SELECT l_returnflag AS flag,
               COUNT(*) AS n,
               ROUND(CAST(SUM(datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS DOUBLE)/COUNT(*), 4) AS avg_delay_days,
               ${oCnt("datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 30")} AS n_on_time,
               ${oPct(oCnt("datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 30"), "COUNT(*)")} AS pct_on_time
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir).select("o_orderkey", "o_orderdate")
      val delay = datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag").as("flag"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(delay).cast("double") / count(lit(1)), 4).as("avg_delay_days"),
          cnt(delay <= 30).as("n_on_time"))
        .withColumn("pct_on_time", pct(col("n_on_time"), col("n")))
        .orderBy("flag")
    },

    // ----------------------------------------------------------------- A6
    Q("q06_flow_split",
      "A6 value_counts + share-of-total (src/etl_pipeline.py:570-577): global " +
        "percent via an empty-frame window over the aggregated counts.",
      Some("""
        SELECT tipo, n,
               ROUND(CAST(n AS DOUBLE)*100/SUM(n) OVER (), 2) AS pct
        FROM (SELECT event_type AS tipo, COUNT(*) AS n FROM events GROUP BY 1)
        ORDER BY n DESC, tipo""")) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type").as("tipo"))
        .agg(count(lit(1)).as("n"))
        .withColumn("pct",
          round(col("n").cast("double") * 100 / sum("n").over(Window.partitionBy()), 2))
        .orderBy(desc("n"), asc("tipo"))
    },

    // ----------------------------------------------------------------- A7
    Q("q07_global_kpis",
      "A7 whole-table KPI row unpivoted to long form " +
        "(src/etl_pipeline.py:579-596): one agg, exploded to (indicador, " +
        "quantidade, percentual).",
      Some(s"""
        WITH a AS (
          SELECT COUNT(*) AS total,
                 ${oCnt("o_orderstatus='F'")} AS n_f,
                 ${oCnt("o_orderstatus='O'")} AS n_o,
                 ${oCnt("o_orderstatus='P'")} AS n_p,
                 ${oCnt("o_orderpriority IN ('1-URGENT','2-HIGH')")} AS n_hi
          FROM orders)
        SELECT * FROM (
          SELECT 'TOTAL' AS indicador, total AS quantidade, CAST(100.0 AS DOUBLE) AS percentual FROM a
          UNION ALL SELECT 'REALIZADOS', n_f, ${oPct("n_f", "total")} FROM a
          UNION ALL SELECT 'ABERTOS', n_o, ${oPct("n_o", "total")} FROM a
          UNION ALL SELECT 'PENDENTES', n_p, ${oPct("n_p", "total")} FROM a
          UNION ALL SELECT 'ALTA_PRIORIDADE', n_hi, ${oPct("n_hi", "total")} FROM a
        ) ORDER BY indicador""")) { (s, dir) =>
      val a = Tables.orders(s, dir).agg(
        count(lit(1)).as("total"),
        cnt(col("o_orderstatus") === "F").as("n_f"),
        cnt(col("o_orderstatus") === "O").as("n_o"),
        cnt(col("o_orderstatus") === "P").as("n_p"),
        cnt(col("o_orderpriority").isin("1-URGENT", "2-HIGH")).as("n_hi"))
      a.select(explode(array(
          struct(lit("TOTAL").as("indicador"), col("total").as("quantidade"),
            lit(100.0).as("percentual")),
          struct(lit("REALIZADOS").as("indicador"), col("n_f").as("quantidade"),
            pct(col("n_f"), col("total")).as("percentual")),
          struct(lit("ABERTOS").as("indicador"), col("n_o").as("quantidade"),
            pct(col("n_o"), col("total")).as("percentual")),
          struct(lit("PENDENTES").as("indicador"), col("n_p").as("quantidade"),
            pct(col("n_p"), col("total")).as("percentual")),
          struct(lit("ALTA_PRIORIDADE").as("indicador"), col("n_hi").as("quantidade"),
            pct(col("n_hi"), col("total")).as("percentual"))
        )).as("kv"))
        .select(col("kv.indicador"), col("kv.quantidade"), col("kv.percentual"))
        .orderBy("indicador")
    },

    // ----------------------------------------------------------------- A8
    Q("q08_data_quality",
      "A8 per-column fill-rate profile (src/etl_pipeline.py:598-625): one agg " +
        "over all columns, unpivoted to one row per column.",
      Some(s"""
        WITH a AS (
          SELECT COUNT(*) AS total,
                 ${oCnt("o_orderstatus IS NULL")} AS m_status,
                 ${oCnt("o_orderpriority IS NULL OR o_orderpriority = 'Indefinido'")} AS m_prio,
                 ${oCnt("o_totalprice IS NULL")} AS m_price,
                 ${oCnt("o_orderdate IS NULL")} AS m_date
          FROM orders)
        SELECT * FROM (
          SELECT 'o_orderstatus' AS coluna, m_status AS nulos, total - m_status AS preenchidos, ${oPct("total - m_status", "total")} AS pct_preenchido FROM a
          UNION ALL SELECT 'o_orderpriority', m_prio, total - m_prio, ${oPct("total - m_prio", "total")} FROM a
          UNION ALL SELECT 'o_totalprice', m_price, total - m_price, ${oPct("total - m_price", "total")} FROM a
          UNION ALL SELECT 'o_orderdate', m_date, total - m_date, ${oPct("total - m_date", "total")} FROM a
        ) ORDER BY coluna""")) { (s, dir) =>
      val a = Tables.orders(s, dir).agg(
        count(lit(1)).as("total"),
        cnt(col("o_orderstatus").isNull).as("m_status"),
        cnt(col("o_orderpriority").isNull || col("o_orderpriority") === "Indefinido").as("m_prio"),
        cnt(col("o_totalprice").isNull).as("m_price"),
        cnt(col("o_orderdate").isNull).as("m_date"))
      def row(name: String, m: org.apache.spark.sql.Column) =
        struct(lit(name).as("coluna"), m.as("nulos"),
          (col("total") - m).as("preenchidos"),
          pct(col("total") - m, col("total")).as("pct_preenchido"))
      a.select(explode(array(
          row("o_orderstatus", col("m_status")),
          row("o_orderpriority", col("m_prio")),
          row("o_totalprice", col("m_price")),
          row("o_orderdate", col("m_date")))).as("kv"))
        .select("kv.*")
        .orderBy("coluna")
    },

    // ------------------------------------------------------------ A9 + J2
    Q("q09_agenda_profile",
      "A9 schedule profile + occupancy join (src/etl_pipeline.py:627-686): " +
        "per-supplier rollup left-joined to a broadcast side table with a " +
        "guarded division (0/negative capacity → null, the reference's inf " +
        "quirk resolved).",
      Some(s"""
        SELECT l_suppkey AS suppkey,
               COUNT(*) AS n_items,
               ${oCnt("l_returnflag='R'")} AS n_returned,
               ${oMoneySum("l_extendedprice")} AS receita,
               ROUND(s_acctbal, 2) AS acctbal,
               ${oPct(oCnt("l_returnflag='R'"), "COUNT(*)")} AS taxa_retorno,
               CASE WHEN ROUND(s_acctbal, 2) > 0
                    THEN ROUND(CAST(${oMoneySum("l_extendedprice")} AS DOUBLE)/ROUND(s_acctbal, 2), 4)
               END AS receita_por_saldo
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY l_suppkey, s_acctbal ORDER BY suppkey""")) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val sup = Tables.supplier(s, dir)
        .select(col("s_suppkey"), round(col("s_acctbal"), 2).as("acctbal"))
      li.groupBy(col("l_suppkey").as("suppkey"))
        .agg(
          count(lit(1)).as("n_items"),
          cnt(col("l_returnflag") === "R").as("n_returned"),
          moneySum(col("l_extendedprice")).as("receita"))
        .join(sup, col("suppkey") === col("s_suppkey"), "left")
        .drop("s_suppkey")
        .withColumn("taxa_retorno", pct(col("n_returned"), col("n_items")))
        .withColumn("receita_por_saldo",
          when(col("acctbal") > 0, round(col("receita").cast("double") / col("acctbal"), 4)))
        .orderBy("suppkey")
    },

    // ---------------------------------------------------------------- A10
    Q("q10_crosstab_pivot",
      "A10 crosstab with margins (src/etl_pipeline.py:381-409): pivot on " +
        "status values, zero-fill, row totals + rate, sorted by total desc.",
      Some(s"""
        SELECT o_orderpriority AS prioridade,
               ${oCnt("o_orderstatus='F'")} AS n_f,
               ${oCnt("o_orderstatus='O'")} AS n_o,
               ${oCnt("o_orderstatus='P'")} AS n_p,
               COUNT(*) AS total,
               ${oPct(oCnt("o_orderstatus='F'"), "COUNT(*)")} AS taxa_f
        FROM orders GROUP BY 1 ORDER BY total DESC, prioridade""")) { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("prioridade"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0, Seq("F", "O", "P"))
        .withColumnsRenamed(Map("F" -> "n_f", "O" -> "n_o", "P" -> "n_p"))
        .withColumn("total", col("n_f") + col("n_o") + col("n_p"))
        .withColumn("taxa_f", pct(col("n_f"), col("total")))
        .orderBy(desc("total"), asc("prioridade"))
    },

    // ------------------------------------------------------- J1 + F1 + A12
    Q("q11_price_enrichment",
      "J1 normalized-key broadcast enrichment join (src/etl_pipeline.py:202-233) " +
        "with A12 pre-aggregation of the dimension side (src/etl_pipeline.py:658): " +
        "facts pick up a per-normalized-type mean price; misses coalesce to 0.",
      Some(s"""
        WITH dim AS (
          SELECT ${oNormKey("p_type")} AS key_type,
                 ${oMoneyAvg("p_retailprice")} AS preco_medio_tipo
          FROM part GROUP BY 1)
        SELECT key_type,
               COUNT(*) AS n_items,
               ${oMoneySum("l_extendedprice")} AS receita,
               COALESCE(MIN(preco_medio_tipo), CAST(0 AS DOUBLE)) AS preco_medio_tipo
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        LEFT JOIN dim ON ${oNormKey("p_type")} = key_type
        GROUP BY key_type ORDER BY key_type""")) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val part = Tables.part(s, dir)
      val dim = part
        .groupBy(normalize_key(col("p_type")).as("key_type"))
        .agg(moneyAvg(col("p_retailprice")).as("preco_medio_tipo"))
      // part is SF-linear → no hint (AQE decides); dim is a distinct-type
      // rollup (bounded cardinality) → broadcast is provably safe.
      li.join(part.select("p_partkey", "p_type"),
          col("l_partkey") === col("p_partkey"))
        .withColumn("key_type", normalize_key(col("p_type")))
        .join(broadcast(dim), Seq("key_type"), "left")
        .groupBy("key_type")
        .agg(
          count(lit(1)).as("n_items"),
          moneySum(col("l_extendedprice")).as("receita"),
          coalesce(min(col("preco_medio_tipo")), lit(0.0)).as("preco_medio_tipo"))
        .orderBy("key_type")
    },

    // ----------------------------------------------------------------- F5
    Q("q12_pseudonymize",
      "F5 SHA-256 pseudonymization (src/Criptografia.py:12-42): stable " +
        "surrogate IDs from concatenated natural keys.",
      Some("""
        SELECT c_custkey,
               sha256(c_name || '|' || CAST(c_custkey AS VARCHAR)) AS id_anon
        FROM customer ORDER BY c_custkey""")) { (s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_custkey"),
          pseudonymize(col("c_name"), col("c_custkey")).as("id_anon"))
        .orderBy("c_custkey")
    },

    // ----------------------------------------------------------------- F6
    Q("q13_string_to_number",
      "F6 locale/number cleanup (src/etl_pipeline.py:217-223): strip " +
        "non-digits, cast, aggregate — pandas errors='coerce' ≡ Spark " +
        "non-ANSI cast-to-null.",
      Some(s"""
        SELECT TRY_CAST(REGEXP_REPLACE(p_brand, '[^0-9]', '', 'g') AS BIGINT) AS brand_num,
               COUNT(*) AS n,
               ${oMoneyAvg("p_retailprice")} AS preco_medio
        FROM part GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      Tables.part(s, dir)
        .groupBy(regexp_replace(col("p_brand"), "[^0-9]", "")
          .cast("long").as("brand_num"))
        .agg(count(lit(1)).as("n"), moneyAvg(col("p_retailprice")).as("preco_medio"))
        .orderBy("brand_num")
    },

    // ----------------------------------------------------------------- F7
    Q("q14_dayfirst_dates",
      "F7 day-first timestamp parse (src/etl_pipeline.py:183-194): format to " +
        "dd/MM/yyyy then parse back, proving the parse path end-to-end.",
      Some("""
        SELECT CAST(year(strptime(strftime(o_orderdate, '%d/%m/%Y'), '%d/%m/%Y')) AS INTEGER) AS ano,
               CAST(month(strptime(strftime(o_orderdate, '%d/%m/%Y'), '%d/%m/%Y')) AS INTEGER) AS mes,
               COUNT(*) AS n
        FROM orders GROUP BY 1, 2 ORDER BY 1, 2""")) { (s, dir) =>
      val parsed = to_timestamp(
        date_format(col("o_orderdate"), "dd/MM/yyyy"), "dd/MM/yyyy")
      Tables.orders(s, dir)
        .groupBy(year(parsed).as("ano"), month(parsed).as("mes"))
        .agg(count(lit(1)).as("n"))
        .orderBy("ano", "mes")
    },

    // ---------------------------------------------------------------- F12
    Q("q15_age_bands",
      "F12 bucketize with right-open bins (src/etl_pipeline.py:284-288) as a " +
        "CASE chain over p_size, out-of-range → 'Indefinido'.",
      Some("""
        SELECT CASE WHEN p_size >= 0 AND p_size < 13 THEN '0-12'
                    WHEN p_size >= 13 AND p_size < 18 THEN '13-17'
                    WHEN p_size >= 18 AND p_size < 40 THEN '18-39'
                    WHEN p_size >= 40 AND p_size < 60 THEN '40-59'
                    WHEN p_size >= 60 AND p_size < 120 THEN '60+'
                    ELSE 'Indefinido' END AS faixa,
               COUNT(*) AS n
        FROM part GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val sz = col("p_size")
      val band = when(sz >= 0 && sz < 13, "0-12")
        .when(sz >= 13 && sz < 18, "13-17")
        .when(sz >= 18 && sz < 40, "18-39")
        .when(sz >= 40 && sz < 60, "40-59")
        .when(sz >= 60 && sz < 120, "60+")
        .otherwise("Indefinido")
      Tables.part(s, dir)
        .groupBy(band.as("faixa"))
        .agg(count(lit(1)).as("n"))
        .orderBy("faixa")
    },

    // ------------------------------------------------------- F14-F17
    Q("q16_status_consolidation",
      "F17 status-consolidation precedence CASE (src/etl_pipeline.py:265-277 — " +
        "the row-wise apply eliminated into pure when/otherwise): " +
        "ATENDIDO > NO_SHOW > CANC_TARDIO > CANCELADO > AGENDADO.",
      Some(s"""
        SELECT CASE WHEN o_orderstatus = 'F' THEN 'ATENDIDO'
                    WHEN o_orderdate < $oAsOf AND o_orderpriority = '1-URGENT' THEN 'NO_SHOW'
                    WHEN o_orderpriority = '5-LOW' AND o_totalprice < 50000 THEN 'CANCELAMENTO_TARDIO'
                    WHEN o_orderpriority = '5-LOW' THEN 'CANCELADO'
                    ELSE 'AGENDADO' END AS status_consolidado,
               COUNT(*) AS n,
               ${oPct("COUNT(*)", "SUM(COUNT(*)) OVER ()")} AS pct
        FROM orders GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val status = when(col("o_orderstatus") === "F", "ATENDIDO")
        .when(col("o_orderdate") < expr(asOf) && col("o_orderpriority") === "1-URGENT", "NO_SHOW")
        .when(col("o_orderpriority") === "5-LOW" && col("o_totalprice") < 50000, "CANCELAMENTO_TARDIO")
        .when(col("o_orderpriority") === "5-LOW", "CANCELADO")
        .otherwise("AGENDADO")
      Tables.orders(s, dir)
        .groupBy(status.as("status_consolidado"))
        .agg(count(lit(1)).as("n"))
        .withColumn("pct", pct(col("n"), sum("n").over(Window.partitionBy())))
        .orderBy("status_consolidado")
    },

    // ---------------------------------------------------------------- F18
    Q("q17_new_vs_returning",
      "F18 new-vs-returning flag (src/etl_pipeline.py:290-293) + F22 recode: " +
        "first-ever order per customer via a partition-min window.",
      Some("""
        SELECT tipo, COUNT(*) AS n FROM (
          SELECT CASE WHEN o_orderdate = MIN(o_orderdate) OVER (PARTITION BY o_custkey)
                      THEN 'Novo' ELSE 'Recorrente' END AS tipo
          FROM orders
        ) GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
      Tables.orders(s, dir)
        .withColumn("tipo",
          when(col("o_orderdate") === min(col("o_orderdate")).over(w), "Novo")
            .otherwise("Recorrente"))
        .groupBy("tipo")
        .agg(count(lit(1)).as("n"))
        .orderBy("tipo")
    },

    // ------------------------------------------------------------ P3 + J3
    Q("q18_blacklist_anti",
      "P3/J3 blacklist anti-semantics (src/etl_pipeline.py:171-181) at scale: " +
        "left-anti join instead of isin for a large exclusion set.",
      Some(s"""
        SELECT l_returnflag AS flag, COUNT(*) AS n,
               ${oMoneySum("l_extendedprice")} AS receita
        FROM lineitem
        WHERE l_partkey NOT IN (SELECT p_partkey FROM part WHERE p_size >= 48)
        GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val banned = Tables.part(s, dir)
        .filter(col("p_size") >= 48).select(col("p_partkey"))
      Tables.lineitem(s, dir)
        .join(banned, col("l_partkey") === col("p_partkey"), "left_anti")
        .groupBy(col("l_returnflag").as("flag"))
        .agg(count(lit(1)).as("n"), moneySum(col("l_extendedprice")).as("receita"))
        .orderBy("flag")
    },

    // ------------------------------------------------------------ O1 + O5
    Q("q19_top_days",
      "O1/O5 sort + top-k (src/etl_pipeline.py:406-407,573): busiest days, " +
        "deterministic tie-break on the date.",
      Some("""
        SELECT CAST(o_orderdate AS DATE) AS dia, COUNT(*) AS n
        FROM orders GROUP BY 1 ORDER BY n DESC, dia LIMIT 5""")) { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(to_date(col("o_orderdate")).as("dia"))
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("dia"))
        .limit(5)
    },

    // ---------------------------------------------------------------- A13
    Q("q20_distinct_pairs",
      "A13 dropDuplicates (src/etl_pipeline.py:230): distinct key pairs.",
      Some("""
        SELECT DISTINCT l_returnflag AS flag, l_linestatus AS status
        FROM lineitem ORDER BY 1, 2""")) { (s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_returnflag").as("flag"), col("l_linestatus").as("status"))
        .dropDuplicates()
        .orderBy("flag", "status")
    },

    // ------------------------------------------------- headline aggregation
    Q("q21_pricing_summary",
      "Headline single-shuffle hash aggregation (TPC-H Q1 shape) — the " +
        "engine's A1-A9 conditional-aggregate pattern at full width, exact " +
        "cross-engine via integer cents/basis points.",
      Some(s"""
        SELECT l_returnflag, l_linestatus,
               ROUND(CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE), 2) AS sum_qty,
               ${oMoneySum("l_extendedprice")} AS sum_base_price,
               ${oMoneySum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
               ${oMoneySum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
               ROUND(CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)/COUNT(*), 4) AS avg_qty,
               ROUND(CAST(${oCentsSum("l_extendedprice")} AS DOUBLE)/100/COUNT(*), 2) AS avg_price,
               ROUND(CAST(SUM(CAST(ROUND(l_discount*10000) AS BIGINT)) AS DOUBLE)/10000/COUNT(*), 6) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY 1, 2 ORDER BY 1, 2""")) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      li.filter(col("l_shipdate") <= expr("TIMESTAMP_NTZ '1998-09-02 00:00:00'"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity").cast("long")).cast("double"), 2).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          round(sum(col("l_quantity").cast("long")).cast("double") / count(lit(1)), 4).as("avg_qty"),
          round(centsSum(col("l_extendedprice")).cast("double") / 100 / count(lit(1)), 2).as("avg_price"),
          round(sum(round(col("l_discount") * 10000).cast("long")).cast("double") / 10000 / count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ------------------------------------------------- headline shuffle join
    Q("q22_top_revenue_orders",
      "Headline large-to-large shuffle join + top-k: per-order revenue " +
        "(exact cents ordering) joined back to orders and customer.",
      Some("""
        WITH rev AS (
          SELECT l_orderkey,
                 SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS cents
          FROM lineitem GROUP BY 1)
        SELECT o_orderkey, ROUND(CAST(cents AS DOUBLE)/100, 2) AS receita,
               CAST(o_orderdate AS DATE) AS data_pedido, c_mktsegment AS segmento
        FROM rev
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY cents DESC, o_orderkey LIMIT 10""")) { (s, dir) =>
      val rev = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(centsSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("cents"))
      rev.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .orderBy(desc("cents"), asc("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"),
          round(col("cents").cast("double") / 100, 2).as("receita"),
          to_date(col("o_orderdate")).as("data_pedido"),
          col("c_mktsegment").as("segmento"))
    },

    // --------------------------------------------------- order statistics
    Q("q23b_percentiles",
      "Exact interpolated order statistics per group: median/p90/p99 of " +
        "the price distribution — Spark's percentile() and DuckDB's " +
        "quantile_cont() share the linear-interpolation definition, so " +
        "values agree to rounding. (The 100 TB variant swaps in " +
        "approx_percentile sketches; the exact form is the oracle-able " +
        "baseline.)",
      Some("""
        SELECT l_returnflag AS flag,
               ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
               ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
               ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
               ROUND(MIN(l_extendedprice), 4) AS p_min,
               ROUND(MAX(l_extendedprice), 4) AS p_max
        FROM lineitem GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      Tables.lineitem(s, dir)
        // single-file lake → 3 scan tasks; percentile() buffers every
        // group value in its partial buffer, so scan parallelism caps the
        // whole query. Round-robin repartition of the pruned 2-column
        // projection spreads the buffering across cores (measured ~2x);
        // at real scale file count provides this and the repartition is
        // AQE-coalesced noise.
        .repartition(s.sparkContext.defaultParallelism)
        .groupBy(col("l_returnflag").as("flag"))
        // ONE percentile aggregate with an array of fractions: the value
        // buffer (the whole cost of exact percentiles) is built and
        // sorted once for all three order statistics — three scalar
        // percentile() calls would buffer the group three times over
        .agg(
          expr("percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D))").as("ps"),
          round(min(col("l_extendedprice")), 4).as("p_min"),
          round(max(col("l_extendedprice")), 4).as("p_max"))
        .select(col("flag"),
          round(col("ps").getItem(0), 4).as("p50"),
          round(col("ps").getItem(1), 4).as("p90"),
          round(col("ps").getItem(2), 4).as("p99"),
          col("p_min"), col("p_max"))
        .orderBy("flag")
    },

    // ------------------------------------------- order statistics, sketch
    Q("q23c_percentiles_approx",
      "The 100 TB percentile path q23b names: approx_percentile sketches " +
        "(mergeable, bounded-memory — no per-group value buffering). " +
        "Cross-engine sketches differ bit-wise (Spark GK vs DuckDB " +
        "t-digest), so the gate emits the EXACT percentiles plus " +
        "within-tolerance flags for the sketch: at accuracy 10000 the GK " +
        "rank error is <=0.01% of the group, far inside the 1% value " +
        "tolerance asserted here, so the flags are deterministically true " +
        "and hash-stable while the sketch genuinely runs.",
      Some("""
        SELECT l_returnflag AS flag,
               ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
               ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_exact,
               TRUE AS p50_sketch_ok,
               TRUE AS p90_sketch_ok
        FROM lineitem GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      Tables.lineitem(s, dir)
        .repartition(s.sparkContext.defaultParallelism) // see q23b note
        .groupBy(col("l_returnflag").as("flag"))
        .agg(
          expr("percentile(l_extendedprice, array(0.5D, 0.9D))").as("_ps"),
          expr("approx_percentile(l_extendedprice, array(0.5D, 0.9D), 10000)")
            .as("_as"))
        .withColumn("p50_exact", round(col("_ps").getItem(0), 4))
        .withColumn("p90_exact", round(col("_ps").getItem(1), 4))
        .withColumn("p50_sketch_ok",
          abs(col("_as").getItem(0) - col("p50_exact")) <= col("p50_exact") * 0.01)
        .withColumn("p90_sketch_ok",
          abs(col("_as").getItem(1) - col("p90_exact")) <= col("p90_exact") * 0.01)
        .drop("_ps", "_as")
        .orderBy("flag")
    },

    // -------------------------------------------------- cardinality sketch
    Q("q53_hll_distinct",
      "Distinct counting at 100 TB: the HyperLogLog++ sketch " +
        "(approx_count_distinct — mergeable, fixed memory per group) " +
        "beside the exact count. Same gate pattern as q23c: sketches " +
        "differ across engines bit-wise, so the contract is the exact " +
        "count plus a deterministic within-tolerance flag for the sketch " +
        "(rsd 0.02 against a 15% assertion — structurally true).",
      Some("""
        SELECT l_returnflag AS flag,
               COUNT(DISTINCT l_partkey) AS n_exact,
               TRUE AS sketch_ok
        FROM lineitem GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag").as("flag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_exact"),
          approx_count_distinct(col("l_partkey"), 0.02).as("_a"))
        .withColumn("sketch_ok",
          abs(col("_a") - col("n_exact")) <= col("n_exact") * 0.15)
        .drop("_a")
        .orderBy("flag")
    },

    // ---------------------------------------------------------------- A11
    Q("q23_kpi_summary",
      "A11 scalar KPI block (src/etl_pipeline.py:369-460): whole-table " +
        "aggregates incl. exact distinct counts.",
      Some(s"""
        SELECT COUNT(*) AS n_itens,
               ROUND(CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE), 2) AS qtd_total,
               ${oMoneySum("l_extendedprice")} AS receita_bruta,
               COUNT(DISTINCT l_partkey) AS n_pecas,
               COUNT(DISTINCT l_orderkey) AS n_pedidos
        FROM lineitem""")) { (s, dir) =>
      Tables.lineitem(s, dir).agg(
        count(lit(1)).as("n_itens"),
        round(sum(col("l_quantity").cast("long")).cast("double"), 2).as("qtd_total"),
        moneySum(col("l_extendedprice")).as("receita_bruta"),
        countDistinct(col("l_partkey")).as("n_pecas"),
        countDistinct(col("l_orderkey")).as("n_pedidos"))
    }
  )
}
