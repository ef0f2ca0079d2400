package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import H._

/** Corpus-hygiene operators for LLM training data over the `documents`
  * table: benchmark decontamination, duplicated-substring detection,
  * data-mixture quota sampling, and TF-IDF salient-term extraction.
  *
  * Same 100 TB design rules as [[LlmOps]]: bucketed candidate generation,
  * integer/md5-prefix hashing the DuckDB oracle reproduces bit-for-bit,
  * per-doc work as codegen'd array expressions (no UDFs, no collects).
  */
object CorpusOps {

  /** 28-bit integer hash from the md5 hex prefix — the cross-engine
    * primitive (same contract as LlmOps.hash28): Spark
    * `conv(substr(md5(x),1,7),16,10)` == DuckDB `('0x'||substr(md5(x),1,7))::BIGINT`. */
  private def hash28(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  /** Whitespace tokens of the text column. */
  private def toks(c: Column): Column = split(c, "\\s+")

  /** Decontamination n-gram order: 8 contiguous tokens, the scale used by
    * published train-set decontamination (GPT-3 used 13-grams, The Pile 8+;
    * anything ≥ 8 makes incidental collisions negligible). */
  private val NGRAM = 8

  /** Benchmark stand-in: every 20th doc (doc_id % 20 == 7) plays the role
    * of the held-out eval suite. In production the benchmark side is a
    * FIXED small suite (MMLU/GSM8K/…, thousands of rows) — that is what
    * makes the broadcast in q60 safe at any corpus scale. */
  private val BENCH_MOD = 20
  private val BENCH_REM = 7

  /** Token 8-gram hashes of a bound token-array column `w` (non-distinct;
    * the consumer decides whether multiplicity matters). */
  private def ngramHashes(w: Column): Column =
    transform(sequence(lit(0), size(w) - NGRAM), i =>
      hash28(concat_ws(" ", (0 until NGRAM).map(j => element_at(w, i + j + 1)): _*)))

  /** DuckDB twin over list column `w` (1-based indexing). */
  private val oNgramHashes: String = {
    val parts = (0 until NGRAM).map(j => s"w[i+${j + 1}]").mkString(" || ' ' || ")
    s"list_transform(range(len(w) - ${NGRAM - 1}), i -> ('0x' || substr(md5($parts), 1, 7))::BIGINT)"
  }

  /** (doc_id, h) n-gram hash pairs for every doc with ≥ NGRAM tokens.
    * Token array bound as a real column before the lambda (see the
    * LlmOps.shingleSets note: unbound HOF subtrees re-evaluate split()
    * per iteration). */
  private def docNgrams(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), toks(col("text")).as("w"))
      .filter(size(col("w")) >= NGRAM)
      .select(col("doc_id"), explode(ngramHashes(col("w"))).as("h"))

  /** Duplicated-substring windows (q61): fixed 60-char windows at stride
    * 30 — the Lee et al. "Deduplicating Training Data Makes Language
    * Models Better" shape, with strided hashing standing in for the
    * suffix-array pass (a suffix array is a single-machine structure; the
    * distributed equivalent is exactly this: hash fixed windows, shuffle
    * on the hash). */
  private val SPAN_W = 60
  private val SPAN_STRIDE = 30

  val all: Seq[Q] = Seq(

    // -------------------------------------------- benchmark decontamination
    Q("q60_decontaminate",
      "Benchmark decontamination: hash every training doc's token 8-grams " +
        "and flag docs sharing any 8-gram with the eval suite. The eval " +
        "side is small and fixed in production, so its distinct n-gram " +
        "hashes BROADCAST to every executor and the check is a map-side " +
        "semi-join — zero shuffle over the 100 TB side beyond the scan. " +
        "Here every 20th doc stands in for the benchmark.",
      Some(s"""
        WITH t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM documents),
        g AS (SELECT doc_id, unnest($oNgramHashes) AS h
              FROM t WHERE len(w) >= $NGRAM),
        b AS (SELECT DISTINCT h FROM g WHERE doc_id % $BENCH_MOD = $BENCH_REM),
        c AS (SELECT DISTINCT doc_id, h FROM g WHERE doc_id % $BENCH_MOD <> $BENCH_REM)
        SELECT c.doc_id, COUNT(*) AS n_hit_ngrams
        FROM c JOIN b USING (h)
        GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val g = docNgrams(s, dir)
      val isBench = col("doc_id") % BENCH_MOD === BENCH_REM
      // production: the benchmark n-gram set is bounded (a fixed eval
      // suite), so broadcast is safe regardless of corpus size
      val bench = broadcast(g.filter(isBench).select("h").distinct())
      g.filter(!isBench)
        .dropDuplicates("doc_id", "h")
        .join(bench, "h")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_hit_ngrams"))
        .orderBy("doc_id")
    },

    // --------------------------------------------- duplicated substrings
    Q("q61_substring_dup",
      "Duplicated-span detection (distributed stand-in for suffix-array " +
        "substring dedup): md5 fixed 60-char windows at stride 30, one " +
        "shuffle on the window hash to count distinct docs per span, then " +
        "per-doc duplicated-span stats. At 100 TB the span-hash shuffle IS " +
        "the operator; stride trades recall granularity for 2x less data.",
      Some(s"""
        WITH t AS (SELECT doc_id, text, length(text) AS l FROM documents),
        s AS (SELECT doc_id, unnest(range((l - $SPAN_W) // $SPAN_STRIDE + 1)) AS k, text
              FROM t WHERE l >= $SPAN_W),
        sh AS (SELECT doc_id, md5(substr(text, (k*$SPAN_STRIDE + 1)::INT, $SPAN_W)) AS h FROM s),
        c AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM sh GROUP BY 1)
        SELECT doc_id, COUNT(*) AS n_spans,
               ${oCnt("nd >= 2")} AS n_dup_spans
        FROM sh JOIN c USING (h)
        GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val spans = Tables.documents(s, dir)
        .repartition(s.sparkContext.defaultParallelism)
        .filter(length(col("text")) >= SPAN_W)
        .select(col("doc_id"),
          explode(transform(
            sequence(lit(0), floor((length(col("text")) - SPAN_W) / SPAN_STRIDE).cast("int")),
            k => md5(col("text").substr(k * SPAN_STRIDE + 1, lit(SPAN_W))))).as("h"))
        .repartition(col("h")) // shared exchange: span-count agg + join reuse it
      val counts = spans.groupBy("h")
        .agg(countDistinct(col("doc_id")).as("nd"))
      spans.join(counts, "h")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"), cnt(col("nd") >= 2).as("n_dup_spans"))
        .orderBy("doc_id")
    }
  )
}
