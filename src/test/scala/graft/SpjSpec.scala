package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-partitioned joins + the catalog's V2 function registry.
  *
  * The SPJ tests audit EXECUTED plans: two docstore tables
  * co-partitioned on the same spec must join with ZERO shuffle
  * exchanges under `spark.sql.sources.v2.bucketing.enabled` — for both
  * an identity(lang) spec (keys resolve to plain column references)
  * and a bucket(n, doc_id) spec (keys resolve through the catalog's
  * `bucket` V2 function; compatibility compares the bound function's
  * canonical name across both sides). With the conf off the same join
  * must still be correct (and shuffles are expected) — reporting is
  * inert by default.
  */
class SpjSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** One catalog root shared by the suite, built once: docs variants
    * partitioned two ways + co-partitioned join peers. */
  private lazy val root: String = {
    val r = Files.createTempDirectory("spj-cat").toString
    val s = cat(r)
    graft.core.Tables.documents(s, dir)
      .select("doc_id", "n_chars", "lang", "source", "text")
      .createOrReplaceTempView("spj_src")
    s.sql("CREATE NAMESPACE IF NOT EXISTS spj.default")
    s.sql("CREATE TABLE spj.default.docs_by_lang (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING) " +
      "PARTITIONED BY (lang)")
    s.sql("INSERT INTO spj.default.docs_by_lang SELECT * FROM spj_src")
    s.sql("CREATE TABLE spj.default.stats_by_lang (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING) " +
      "PARTITIONED BY (lang)")
    s.sql("INSERT INTO spj.default.stats_by_lang " +
      "SELECT doc_id + 1000, n_chars * 2, lang, source, text FROM spj_src")
    s.sql("CREATE TABLE spj.default.docs_by_bucket (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING) " +
      "PARTITIONED BY (bucket(4, doc_id))")
    s.sql("INSERT INTO spj.default.docs_by_bucket SELECT * FROM spj_src")
    s.sql("CREATE TABLE spj.default.scores_by_bucket (doc_id BIGINT NOT NULL, " +
      "n_chars BIGINT, lang STRING, source STRING, text STRING) " +
      "PARTITIONED BY (bucket(4, doc_id))")
    s.sql("INSERT INTO spj.default.scores_by_bucket " +
      "SELECT doc_id, n_chars % 97, lang, source, text FROM spj_src")
    r
  }

  private def cat(r: String, extra: (String, String)*): SparkSession =
    graft.core.Sessions.scoped(spark,
      (Seq("spark.sql.catalog.spj" ->
        classOf[graft.sources.DocStoreCatalog].getName,
        "spark.sql.catalog.spj.root" -> r) ++ extra): _*)

  /** Session with SPJ active and broadcast/AQE-coalesce interference
    * off, so a missing SPJ shows up as a hash-partition Exchange. */
  private def spjSession: SparkSession = cat(root,
    "spark.sql.sources.v2.bucketing.enabled" -> "true",
    "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

  private def executed(df: DataFrame): String = {
    df.collect() // materialize so AQE settles on the final plan
    df.queryExecution.executedPlan.toString
  }

  test("identity-partitioned tables join with zero shuffles (SPJ)") {
    val s = spjSession
    val j = s.sql("""
      SELECT a.lang, COUNT(*) AS n
      FROM spj.default.docs_by_lang a
      JOIN spj.default.stats_by_lang b ON a.lang = b.lang
      GROUP BY a.lang""")
    // the join itself must be exchange-free; the groupBy on the SAME
    // key reuses the clustering too, so the whole plan has no shuffle
    val plan = executed(j)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"identity SPJ must not shuffle:\n$plan")
    // correctness vs a plain parquet self-join
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("lang").agg(count(lit(1)).as("c"))
      .select(col("lang"), (col("c") * col("c")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = j.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == d)
  }

  test("bucket-partitioned tables join with zero shuffles via the V2 bucket function") {
    val s = spjSession
    val j = s.sql("""
      SELECT a.doc_id, a.n_chars, b.n_chars AS score
      FROM spj.default.docs_by_bucket a
      JOIN spj.default.scores_by_bucket b ON a.doc_id = b.doc_id""")
    val plan = executed(j)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucket SPJ must not shuffle:\n$plan")
    assert(j.count() == 500)
    val bad = j.where(col("score") =!= col("n_chars") % 97).count()
    assert(bad == 0)
  }

  test("with v2 bucketing off, reporting is inert and results unchanged") {
    // the conf defaults to TRUE in Spark 4 — turning it OFF must fall
    // back to plain hash-exchange planning, proving reporting is gated
    val s = cat(root, "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sources.v2.bucketing.enabled" -> "false")
    val j = s.sql("""
      SELECT a.doc_id FROM spj.default.docs_by_bucket a
      JOIN spj.default.scores_by_bucket b ON a.doc_id = b.doc_id""")
    val plan = executed(j)
    assert(plan.contains("Exchange hashpartitioning"),
      s"without the conf the join shuffles normally:\n$plan")
    assert(j.count() == 500)
  }

  test("partition pruning composes with SPJ grouping") {
    val s = spjSession
    val j = s.sql("""
      SELECT a.lang, COUNT(*) AS n
      FROM spj.default.docs_by_lang a
      JOIN spj.default.stats_by_lang b ON a.lang = b.lang
      WHERE a.lang IN ('pt', 'en') AND b.lang IN ('pt', 'en')
      GROUP BY a.lang""")
    val plan = executed(j)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    val expected = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("lang").isin("pt", "en"))
      .groupBy("lang").agg(count(lit(1)).as("c"))
      .select(col("lang"), (col("c") * col("c")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = j.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("catalog V2 functions: bucket and normalize_key from SQL") {
    val s = cat(root)
    // bucket == the write path's partition hash, byte-for-byte
    val b = s.sql("SELECT spj.system.bucket(4, 123456789012345)").head.getInt(0)
    assert(b == graft.sources.DocStorePartitioning.bucketOf(123456789012345L, 4))
    // accent golden: the engine canonicalizer, reachable from SQL
    val k = s.sql("SELECT spj.system.normalize_key('São João  2ª')")
      .head.getString(0)
    assert(k == "SAO JOAO 2")
    // null flows through
    assert(s.sql("SELECT spj.system.normalize_key(CAST(NULL AS STRING))")
      .head.isNullAt(0))
    // resolvable at the catalog root namespace too (the SPJ path uses it)
    val cat0 = new graft.sources.DocStoreCatalog
    val fn = cat0.loadFunction(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty[String], "bucket"))
    assert(fn.description().nonEmpty)
    intercept[org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException] {
      cat0.loadFunction(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty[String], "no_such_fn"))
    }
  }

  test("runtime filtering never erases a key group under SPJ (keeps one segment)") {
    import graft.sources.{DocStorePartitioning => P}
    import graft.sources.DocStore.Segment
    val spec = Seq(P.PIdentity("lang"))
    val segs = Seq(
      Segment("lang=pt/part-0.gds", 10, 0, 99, 100),
      Segment("lang=pt/part-1.gds", 10, 100, 199, 90),
      Segment("lang=en/part-2.gds", 10, 200, 299, 80))
    val scan = new graft.sources.DocStoreScan("/nope",
      graft.sources.DocStore.SCHEMA, graft.sources.DocStore.SCHEMA,
      Long.MinValue, Long.MaxValue, Int.MaxValue, segs, 3,
      partSpec = spec)
    val prev = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      // runtime IN-filter hits only pt's id range: en would be wiped —
      // the group-preserving refill must keep en's smallest segment
      scan.filter(Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.In("doc_id",
          Array[Any](java.lang.Long.valueOf(150L)))))
      val planned = scan.planInputPartitions()
      assert(planned.length == 2, planned.mkString(", "))
      val names = planned.map(
        _.asInstanceOf[graft.sources.DocStoreKeyedPartition].segName).toSet
      assert(names == Set("lang=pt/part-1.gds", "lang=en/part-2.gds"))
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
        case None =>
          spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
    }
  }
}
