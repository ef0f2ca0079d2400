package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.queries.Registry

/** Semantic unit tests for the relational-maintenance operators
  * (q75-q78) on handcrafted lakes: the oracle gate proves cross-engine
  * parity on the synthetic corpus; these prove the intended MERGE /
  * SCD2 / rollup / running-total behavior on branch cases the corpus
  * may not isolate (all four merge actions, change compression with a
  * same-second tie, subtotal consistency, cumulative exactness). */
class RelOpsSpec extends SparkSpec {

  private def lake(): String = Files.createTempDirectory("relops").toString

  private val custSchema = StructType(Seq(
    StructField("c_custkey", LongType), StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))
  private val ordSchema = StructType(Seq(
    StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType), StructField("o_orderpriority", StringType)))

  private def write(dir: String, name: String, schema: StructType, rows: Seq[Row]): Unit =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/$name.parquet")

  private def day(d: String): Timestamp = Timestamp.valueOf(s"$d 00:00:00")

  test("q75: all four MERGE branches — kept, updated, deleted, inserted") {
    val dir = lake()
    write(dir, "customer", custSchema, Seq(
      Row(1L, "c1", 0, 100.00, "SEG"),   // has orders -> updated
      Row(5L, "c5", 0, 50.00, "SEG"),    // no orders -> kept
      Row(97L, "c97", 0, 70.00, "SEG"),  // 97 % 97 == 0 -> deleted
      Row(202L, "c202", 0, 10.00, "SEG"), // 202 % 101 == 0 -> updated + spawns insert
      Row(3L, "c3", 0, null, "SEG")))    // NULL balance but MATCHED -> still an update
    write(dir, "orders", ordSchema, Seq(
      Row(11L, 1L, "O", 25.50, day("1995-01-01"), "1-URGENT"),
      Row(12L, 1L, "O", 10.00, day("1995-01-02"), "1-URGENT"),
      Row(13L, 97L, "O", 99.99, day("1995-01-03"), "1-URGENT"),
      Row(14L, 202L, "O", 5.25, day("1995-01-04"), "1-URGENT"),
      Row(15L, 3L, "O", 1.00, day("1995-01-05"), "1-URGENT")))
    val out = Registry.byName("q75_merge_upsert").fn(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Double]), r.getString(3)))).toMap
    assert(out(1L) == (("updated", Some(135.50), "SEG")))   // 100 + 25.50 + 10
    assert(out(5L) == (("kept", Some(50.00), "SEG")))
    assert(!out.contains(97L), "matched delete must remove the row")
    assert(out(202L) == (("updated", Some(15.25), "SEG")))
    assert(out(1000202L) == (("inserted", Some(5.25), "NEW")))
    // matched row with NULL balance: the branch must key off the JOIN KEY,
    // not a null-balance proxy — action is updated (NULL + delta = NULL),
    // segment comes from the snapshot, not 'NEW'
    assert(out(3L) == (("updated", None, "SEG")))
    assert(out.size == 5)
  }

  test("q76: consecutive duplicate states compress; same-second tie breaks on event_id") {
    val dir = lake()
    import EventLake.ns
    EventLake.write(dir, Seq(
      Row(1L, ns("2024-01-01 10:00:00"), 7L, "A", 0.0, "{}"),
      Row(2L, ns("2024-01-01 10:01:00"), 7L, "A", 0.0, "{}"), // dup state -> compressed
      Row(3L, ns("2024-01-01 10:02:00"), 7L, "B", 0.0, "{}"),
      // same second, A then B by event_id: both are state changes
      Row(4L, ns("2024-01-01 10:03:00"), 7L, "A", 0.0, "{}"),
      Row(5L, ns("2024-01-01 10:03:00"), 7L, "B", 0.0, "{}")))
    def ldt(s: String) = Timestamp.valueOf(s)
    val rows = Registry.byName("q76_scd2_history").fn(spark, dir).collect()
      .map(r => (r.getLong(1), r.getString(4),
        Option(r.getTimestamp(3)), r.getBoolean(5)))
    assert(rows.map(_._1).toSeq == Seq(1L, 3L, 4L, 5L), "compressed + ordered by event_id")
    assert(rows.map(_._2).toSeq == Seq("A", "B", "A", "B"))
    // interval chain: each valid_to equals the next valid_from; only last open
    assert(rows.init.forall(!_._4) && rows.last._4)
    assert(rows.last._3.isEmpty, "current row has open valid_to")
    assert(rows(0)._3.contains(ldt("2024-01-01 10:02:00")))
    // zero-length interval from the same-second A->B transition
    assert(rows(2)._3.contains(ldt("2024-01-01 10:03:00")))
  }

  private val liSchema = StructType(Seq(
    StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  test("q77: rollup emits detail, per-flag subtotal, and grand total consistently") {
    val dir = lake()
    def li(flag: String, status: String, qty: Double, price: Double) =
      Row(1L, 1L, 1L, 1, qty, price, 0.0, 0.0, flag, status, day("1995-06-01"))
    write(dir, "lineitem", liSchema, Seq(
      li("A", "F", 2, 10.00), li("A", "O", 3, 20.00), li("R", "F", 5, 40.00)))
    val out = Registry.byName("q77_rollup_report").fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out(("A", "F", 0L)) == ((1L, 2L, 10.00)))
    assert(out(("A", "ALL", 1L)) == ((2L, 5L, 30.00)))   // flag subtotal
    assert(out(("R", "ALL", 1L)) == ((1L, 5L, 40.00)))
    assert(out(("ALL", "ALL", 3L)) == ((3L, 10L, 70.00))) // grand total
    assert(out.size == 3 + 2 + 1, "3 detail + 2 subtotal + 1 grand")
  }

  test("q88: cube emits all four grouping-set levels consistently") {
    val dir = lake()
    def li(flag: String, status: String, price: Double) =
      Row(1L, 1L, 1L, 1, 1.0, price, 0.0, 0.0, flag, status, day("1995-06-01"))
    write(dir, "lineitem", liSchema, Seq(
      li("A", "F", 10.00), li("A", "O", 20.00), li("R", "F", 40.00)))
    val out = Registry.byName("q88_cube_report").fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        ((r.getLong(3), r.getDouble(4)))).toMap
    assert(out(("A", "F", 0L)) == ((1L, 10.00)))
    assert(out(("A", "ALL", 1L)) == ((2L, 30.00)))   // status rolled
    assert(out(("ALL", "F", 2L)) == ((2L, 50.00)))   // flag rolled — CUBE-only level
    assert(out(("ALL", "ALL", 3L)) == ((3L, 70.00)))
    assert(out.size == 3 + 2 + 2 + 1, "detail + flag subtotals + status subtotals + grand")
  }

  test("q90: zero-duration users yield NULL twa; interval weighting is exact") {
    val dir = lake()
    import EventLake.ns
    EventLake.write(dir, Seq(
      // u1: 2.00 for 10s, then 4.00 for 30s -> twa = (200*10+400*30)/40/100 = 3.50
      Row(1L, ns("2024-01-01 10:00:00"), 1L, "view", 2.00, "{}"),
      Row(2L, ns("2024-01-01 10:00:10"), 1L, "view", 4.00, "{}"),
      Row(3L, ns("2024-01-01 10:00:40"), 1L, "view", 9.99, "{}"), // open interval: excluded
      // u2: both events in the SAME truncated second -> SUM(dur)=0 -> NULL twa
      Row(4L, ns("2024-01-01 11:00:00"), 2L, "view", 1.00, "{}"),
      Row(5L, ns("2024-01-01 11:00:00"), 2L, "view", 5.00, "{}"),
      // u3: single event -> no intervals -> NULL total and twa
      Row(6L, ns("2024-01-01 12:00:00"), 3L, "view", 7.00, "{}")))
    val out = Registry.byName("q90_time_weighted_avg").fn(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(out(1L) == ((2L, Some(40L), Some(3.50))))
    assert(out(2L) == ((1L, Some(0L), None)), "zero total duration must not divide")
    assert(out(3L) == ((0L, None, None)))
  }

  test("q89: cohort offsets stay integral across a year boundary") {
    val dir = lake()
    import EventLake.ns
    EventLake.write(dir, Seq(
      // first seen Mon 2023-12-25 week; active again week of Mon 2024-01-08 -> offset 2
      Row(1L, ns("2023-12-27 10:00:00"), 1L, "view", 0.0, "{}"),
      Row(2L, ns("2024-01-10 10:00:00"), 1L, "view", 0.0, "{}")))
    val out = Registry.byName("q89_retention_cohorts").fn(spark, dir).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out == Map(0L -> 1L, 2L -> 1L))
  }

  test("q92: a tie run at a quartile boundary splits deterministically by orderkey") {
    val dir = lake()
    // 5 equal-value orders -> ntile(4) buckets of sizes 2,1,1,1 in orderkey order
    write(dir, "orders", ordSchema, (1L to 5L).map(k =>
      Row(k, 1L, "O", 10.00, day("1995-01-01"), "P")))
    val out = Registry.byName("q92_ntile_quartiles").fn(spark, dir).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("q107: listagg order comes from the sort, not arrival order") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // names arrive reversed and interleaved across partitions; the
    // aggregate must still emit them alphabetically, capped at 5
    val df = Seq("zeta", "alpha", "mu", "beta", "nu", "eta", "xi")
      .map(n => ("S", n)).toDF("segment", "c_name").repartition(4)
    val got = df.groupBy("segment")
      .agg(slice(array_sort(collect_list(col("c_name"))), 1, 5).as("names"))
      .select(concat_ws(",", col("names"))).as[String].head()
    assert(got === "alpha,beta,eta,mu,nu")
  }

  test("q108: first month is NULL change; lag subtraction stays in integer cents") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("p").orderBy("ym")
    val rows = Seq(("A", 199501L, 10000L), ("A", 199502L, 15000L),
      ("A", 199503L, 12000L)).toDF("p", "ym", "cents")
    val out = rows.withColumn("prev", lag(col("cents"), 1).over(w))
      .select(col("ym"), when(col("prev") > 0,
        round((col("cents") - col("prev")).cast("double") * 100 / col("prev"), 2))
        .as("pct"))
      .orderBy("ym").collect()
    assert(out(0).isNullAt(1))                 // no synthetic zero
    assert(out(1).getDouble(1) === 50.0)       // (15000-10000)/10000
    assert(out(2).getDouble(1) === -20.0)      // (12000-15000)/15000
  }

  test("q100: incremental MV refresh — merge of stored partials and a signed delta") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // stored MV partial state: group A (2 rows summed), group B (1 row)
    val mv = Seq(("A", 500L, 2L), ("B", 300L, 1L)).toDF("g", "sum_cents", "n")
    // changelog delta: delete BOTH A rows, insert one C row
    val delta = Seq(("A", -500L, -2L), ("C", 700L, 1L)).toDF("g", "sum_cents", "n")
    val out = mv.unionByName(delta)
      .groupBy("g").agg(sum("sum_cents").as("s"), sum("n").as("n"))
      .filter(col("n") > 0)
      .orderBy("g")
      .as[(String, Long, Long)].collect().toSeq
    // A reached n=0 and dropped out; B untouched; C appeared
    assert(out === Seq(("B", 300L, 1L), ("C", 700L, 1L)))
  }

  test("q100: the refresh plan reads the MV parquet, not a rescan of the base agg") {
    val df = graft.queries.Registry.byName("q100_incremental_agg")
      .fn(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // one scan of the stored state dir + the changelog derivation; the
    // materialized base aggregation must come from parquet, not recompute
    assert(plan.contains("graft_scratch/incr_mv"),
      s"refresh must read the materialized state:\n$plan")
  }

  test("q78: per-customer cumulative revenue is exact and ordered by (date, orderkey)") {
    val dir = lake()
    write(dir, "orders", ordSchema, Seq(
      // same day: orderkey 22 before 23 despite insert order
      Row(23L, 10L, "O", 0.02, day("1995-01-02"), "x"),
      Row(22L, 10L, "O", 0.01, day("1995-01-02"), "x"),
      Row(21L, 10L, "O", 0.10, day("1995-01-01"), "x"),
      Row(31L, 20L, "O", 9.99, day("1995-01-01"), "x"),
      Row(41L, 11L, "O", 5.00, day("1995-01-01"), "x"))) // 11 % 10 != 0 -> sliced out
    val rows = Registry.byName("q78_running_totals").fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      (10L, 21L, 1L, 0.10), (10L, 22L, 2L, 0.11), (10L, 23L, 3L, 0.13),
      (20L, 31L, 1L, 9.99)))
  }
}
