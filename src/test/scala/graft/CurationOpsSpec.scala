package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.queries.Registry

/** Semantic unit tests for the curation operators (q67-q70) on handcrafted
  * corpora — the oracle gate proves cross-engine parity; these prove the
  * *intended* behavior on cases the synthetic corpus may not contain
  * (within-doc duplicate paragraphs, fully-deduplicated docs, rule
  * boundary values, degenerate k-means clusters). */
class CurationOpsSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Writes a documents.parquet lake from (doc_id, text) pairs. */
  private def docLake(docs: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("curation").toString
    val rows = docs.map { case (id, t) => Row(id, t, "en", "src0", t.length.toLong) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // 20 tokens = exactly one paragraph block in q67's geometry
  private def block(word: String): String = Seq.fill(20)(word).mkString(" ")

  test("q67: cross-doc AND within-doc repeated paragraphs are removed, first occurrence wins") {
    val dir = docLake(Seq(
      0L -> s"${block("alpha")} ${block("beta")}", // both blocks first seen here
      1L -> s"${block("alpha")} ${block("gamma")}", // alpha repeated -> dropped
      2L -> s"${block("alpha")} ${block("beta")}", // nothing left -> empty doc
      3L -> s"${block("delta")} ${block("delta")}")) // within-doc dup
    val out = Registry.byName("q67_paragraph_dedup").fn(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) == ((2L, 2L, 0L)))
    assert(out(1L) == ((2L, 1L, 1L)))
    assert(out(2L) == ((2L, 0L, 2L))) // fully deduplicated away
    assert(out(3L) == ((2L, 1L, 1L))) // second in-doc copy dropped
    // a fully-removed doc reassembles to the empty string, byte-exactly
    val emptyHash = Registry.byName("q67_paragraph_dedup").fn(spark, dir)
      .filter("doc_id = 2").collect()(0).getString(4)
    assert(emptyHash ==
      "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
  }

  test("q103: integer-exact medians; zero-MAD groups flag any deviation") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("mad").toString
    // en: four identical lengths + one giant → MAD = 0, so the single
    // deviating doc flags (the degenerate rule: 2*adev2 > 0).
    // fr: [10, 20] → median 15 (the x.5 case: m2 = 30 exact), MAD = 5,
    // deviations are 5 each → 2*10 > 3*20 false → no outliers.
    val rows = Seq(
      (1L, "en", 10L), (2L, "en", 10L), (3L, "en", 10L), (4L, "en", 10L),
      (5L, "en", 100L),
      (6L, "fr", 10L), (7L, "fr", 20L))
      .map { case (id, l, n) => Row(id, "w w w", l, "s", n) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.Registry.byName("q103_mad_outliers")
      .fn(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(out("en") === ((5L, 1L, 10.0, 0.0)))
    assert(out("fr") === ((2L, 0L, 15.0, 5.0)))
  }

  test("q102: pair counts carry within-word multiplicity weighted by word frequency") {
    import org.apache.spark.sql.functions._
    // "aaa" twice across the corpus: the pair 'aa' occurs twice PER word
    // occurrence (positions 1 and 2), so cnt must be 4 — not 2 (distinct
    // pairs per word) and not 1 (distinct words)
    val dir = docLake(Seq((1L, "aaa xy"), (2L, "aaa")))
    val out = graft.queries.Registry.byName("q102_bpe_pair_stats")
      .fn(spark, dir)
      .select("pair", "cnt").collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out("aa") === 4L)
    assert(out("xy") === 1L)
    // single-char words contribute nothing (filtered before the explode)
    assert(!out.contains("a"))
  }

  test("q68: strip chain reconstructs the original text byte-exactly for every doc") {
    val dir = docLake(Seq(0L -> "plain words here", 1L -> "more body text"))
    val rows = Registry.byName("q68_markup_strip").fn(spark, dir).collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[Boolean]("roundtrip_ok")),
      "markup stripping must recover title + body text exactly")
    rows.foreach(r =>
      assert(r.getAs[Long]("clean_len") < r.getAs[Long]("html_len")))
  }

  test("q69: rule boundaries are inclusive and integer-exact") {
    val pass = (Seq.fill(48)("the") ++ Seq("and", "big")).mkString(" ") // 50 words, stopwords
    val short = "the and tiny" // fails ok_count only
    val dir = docLake(Seq(0L -> pass, 1L -> short))
    val out = Registry.byName("q69_gopher_rules").fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Boolean]("keep"), "50 words is inside the inclusive bound")
    assert(!out(1L).getAs[Boolean]("keep") && out(1L).getAs[Boolean]("ok_stop") &&
      !out(1L).getAs[Boolean]("ok_count"))
  }

  test("q70: identical points collapse onto the lowest-id centroid with zero distance") {
    val dir = Files.createTempDirectory("kmeans").toString
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val a = Array.fill(64)(1.0f); val b = Array.fill(64)(-1.0f)
    // init centroids are vec_id 0..7: four at A, four at B; the rest tie
    // onto the lowest cluster id of their point (0 for A, 4 for B)
    val rows = (0L until 16L).map { i =>
      Row(i, (if (i % 8 < 4) a else b).toSeq, 0)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), embSchema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Registry.byName("q70_kmeans_embed").fn(spark, dir).collect()
    assert(out.map(_.getLong(1)).sum == 16, "every vector is assigned")
    val byCluster = out.map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byCluster.keySet == Set(0, 4), s"expected clusters 0 and 4, got $byCluster")
    assert(byCluster.values.forall { case (n, d) => n == 8 && d == 0L })
  }

  test("q111: hand-computed int8 codes — scale extremes exact, interior within scale/127") {
    val dir = Files.createTempDirectory("quant").toString
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    // xq = [1000, -1000, 0]: scale 1000; ±scale reconstruct exactly
    // (codes 127/0), the interior 0 → code 63 → recon 992 → err 8 milli.
    // Label 2 is the zero vector: scale 0, err 0 by the guard.
    val rows = Seq(
      Row(1L, Seq(1.0f, -1.0f, 0.0f), 1),
      Row(2L, Seq(0.0f, 0.0f, 0.0f), 2))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), embSchema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Registry.byName("q111_embed_quantize").fn(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(1) === ((1.0, 0.008))) // avg_scale, worst_err
    assert(out(2) === ((0.0, 0.0)))
  }
}
