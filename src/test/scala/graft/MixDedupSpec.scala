package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.queries.Registry

/** Semantic unit tests for the round-6 curation/matching operators:
  * temperature resampling rates (q79), source-priority dedup policy
  * (q80), and fuzzy-join blocking behavior incl. its documented recall
  * boundary (q81). */
class MixDedupSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def docLake(docs: Seq[(Long, String, String, String)]): String = {
    val dir = Files.createTempDirectory("mixdedup").toString
    val rows = docs.map { case (id, t, lang, src) => Row(id, t, lang, src, t.length.toLong) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q79: α=0.5 boosts the low-resource language to full retention, " +
    "downsamples the dominant one, all-integer rates") {
    // 900 en + 100 zh docs. w_en = floor(sqrt(9e8)) = 30000,
    // w_zh = floor(sqrt(1e8)) = 10000, S = 40000, T = 1000 div 2 = 500.
    // Staged division (overflow-safe order):
    // ppm_en = (30000*1e6 div 40000) * 500 div 900 = 750000*500 div 900 = 416666
    // ppm_zh = (10000*1e6 div 40000) * 500 div 100 = 1250000 -> capped 1e6
    val dir = docLake(
      (1L to 900L).map(i => (i, s"en doc $i", "en", "src0")) ++
        (1001L to 1100L).map(i => (i, s"zh doc $i", "zh", "src0")))
    val out = Registry.byName("q79_temperature_mix").fn(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val (nEn, wEn, ppmEn, sampledEn) = out("en")
    val (nZh, wZh, ppmZh, sampledZh) = out("zh")
    assert((nEn, wEn, ppmEn) == ((900L, 30000L, 416666L)))
    assert((nZh, wZh, ppmZh) == ((100L, 10000L, 1000000L)))
    assert(sampledZh == 100L, "capped rate keeps every low-resource doc")
    assert(sampledEn < 900L && sampledEn > 0L, "dominant language is thinned")
  }

  test("q80: higher-priority source wins even when its doc_id is larger") {
    val dir = docLake(Seq(
      (50L, "same text", "en", "src10"), // lower doc_id, worse source
      (99L, "same text", "en", "src2"),  // higher doc_id, better source -> kept
      (7L, "uniq", "en", "src5")))
    val out = Registry.byName("q80_priority_dedup").fn(spark, dir).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(99L) == ((2L, 2L, 2L)), "src2 beats src10 despite larger doc_id")
    assert(out(7L) == ((5L, 1L, 1L)))
  }

  test("q81: shared-token pairs within distance 2 found; both-token edits " +
    "evade blocking (documented recall boundary); length filter prunes") {
    val dir = Files.createTempDirectory("fuzzy").toString
    val partSchema = StructType(Seq(
      StructField("p_partkey", LongType), StructField("p_name", StringType),
      StructField("p_brand", StringType), StructField("p_type", StringType),
      StructField("p_size", IntegerType), StructField("p_retailprice", DoubleType)))
    val names = Seq(
      "red bolt", "red bold",       // shared "red", dist 1 -> found
      "red extraordinary",          // shared "red" but length gap > 2 -> pruned
      "rad bolz",                   // dist 2 from "red bolt" but NO shared token
      "blue gear", "blue gears")    // shared "blue", dist 1 -> found
    val rows = names.zipWithIndex.map { case (n, i) =>
      Row(i.toLong, n, "B", "T", 1, 1.0) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), partSchema)
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val pairs = Registry.byName("q81_fuzzy_join").fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(pairs == Set(
      ("blue gear", "blue gears", 1L),
      ("red bold", "red bolt", 1L)))
    // "rad bolz" is within distance 2 of "red bolt" but shares no whole
    // token — the blocking tradeoff the query doc states; asserting its
    // ABSENCE pins the contract (and would flag an accidental all-pairs).
  }

  test("q105: exactly N per stratum with dense ranks, hash-deterministic") {
    import org.apache.spark.sql.functions._
    val out = Registry.byName("q105_stratified_sample")
      .fn(spark, "/root/testdata/sf0.001").cache()
    try {
      val perLang = out.groupBy("lang").agg(
        count(lit(1)).as("n"), max("rnk").as("maxr"), min("rnk").as("minr"))
        .collect()
      perLang.foreach { r =>
        assert(r.getLong(1) <= 10, s"stratum over quota: $r")
        assert(r.getLong(3) === 1L && r.getLong(2) === r.getLong(1),
          s"ranks must be dense 1..n: $r")
      }
      // determinism: a second evaluation (fresh plan) yields the same set
      val again = Registry.byName("q105_stratified_sample")
        .fn(spark, "/root/testdata/sf0.001")
      assert(out.exceptAll(again).count() === 0 &&
        again.exceptAll(out).count() === 0)
    } finally out.unpersist()
  }

  test("q101: no dedup cluster straddles a split; buckets map 8/1/1") {
    import org.apache.spark.sql.functions._
    val out = Registry.byName("q101_leakage_split")
      .fn(spark, "/root/testdata/sf0.001").cache()
    try {
      // the leakage invariant: every cluster is wholly in ONE split
      val straddlers = out.groupBy("canonical_id")
        .agg(countDistinct("split").as("k")).filter(col("k") > 1).count()
      assert(straddlers === 0, "a near-dup cluster crosses a split boundary")
      // all three labels exist and the assignment is cluster-keyed: a
      // canonical doc and its members carry the canonical's bucket
      val splits = out.select("split").distinct()
        .collect().map(_.getString(0)).toSet
      assert(splits === Set("train", "valid", "test"))
    } finally out.unpersist()
  }
}
