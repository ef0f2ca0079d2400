package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession, graftshim}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.expr.MinHashSig
import H._

/** LLM-training-data pipeline operators over the `documents` table:
  * exact dedup, MinHash+LSH near-dup, exact n-gram-Jaccard similarity join,
  * SimHash near-dup, text stats, language-ID, quality scoring, and
  * content fingerprinting.
  *
  * Every operator is designed for the 100 TB shape first:
  *  - candidate generation is always *bucketed* (LSH band join, SimHash
  *    pigeonhole chunks, inverted shingle index) — never an all-pairs
  *    cross join; the quadratic step only runs inside small buckets;
  *  - all hashing is integer arithmetic derived from md5 prefixes so the
  *    DuckDB oracle can reproduce it bit-for-bit (cross-engine exact);
  *  - per-doc work is array expressions inside whole-stage codegen — no
  *    UDFs, no driver-side loops.
  *
  * Oracle notes: q_dedup_minhash's oracle is the *ground truth* (exact
  * all-pairs Jaccard, feasible for DuckDB at verify scale) — the LSH path
  * must achieve 100% recall on the verify data, which holds with b=16
  * bands × r=4 rows at the 0.8 threshold (miss probability ≤ 2e-4 per
  * pair at s=0.8; the data's true pairs sit at s≥0.87 with the next pair
  * down at s≈0.12).
  */
object LlmOps {

  /** Mersenne prime 2^31-1: modulus for all MinHash permutations. */
  private val P = 2147483647L
  private val NUM_HASHES = 64
  private val BANDS = 16
  private val ROWS_PER_BAND = 4 // BANDS * ROWS_PER_BAND == NUM_HASHES

  /** Hot-bucket caps (graft.operators.Buckets): a band bucket only grows
    * past ~500 when hundreds of docs share a 4-minhash signature —
    * boilerplate that exact dedup (q24) already collapses; capping bounds
    * the self-join at cap²/2 per bucket. The SimHash chunk cap is higher
    * because the 7-bit pigeonhole otherwise GUARANTEES recall at
    * hamming ≤ 3 — capping trades that guarantee for skew-resistance, so
    * it only engages on pathological buckets. Both are far above any
    * bucket in the verify data (recall there is unchanged — the parity
    * gate proves it). */
  private val MAX_BAND_BUCKET = 500
  private val MAX_CHUNK_BUCKET = 1000

  /** Deterministic permutation constants, < 2^31 so a*h never overflows
    * a long (h < 2^28). Mirrored verbatim into the oracle SQL. */
  private def permA(i: Int): Long = ((i + 1) * 2654435761L) % P
  private def permB(i: Int): Long = ((i + 1) * 2246822519L) % P

  /** Distinct word 3-gram shingles; < 3 tokens → empty set. */
  private def shingles3(w: Column): Column =
    when(size(w) >= 3,
      array_distinct(transform(sequence(lit(0), size(w) - 3), i =>
        concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2),
          element_at(w, i + 3)))))
      .otherwise(array().cast("array<string>"))

  /** DuckDB twin of shingles3 (1-based list indexing; range(n<0) = []). */
  private val oShingles3 =
    "list_distinct(list_transform(range(len(w)-2), i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]))"

  /** (doc_id, sh: array<string>) — non-empty shingle sets.
    *
    * The token array is bound as a real column BEFORE the shingle
    * lambda runs: interpreted higher-order functions re-evaluate any
    * expression subtree their lambda body references on EVERY iteration,
    * so shingling directly over `split(text)` costs |sh|·3 regex splits
    * per row (~13 s for 5 000 docs); over a bound attribute it is an
    * array lookup (~1 s). */
  private def shingleSets(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      // first exchange: the lake ships one parquet file per table → one
      // scan task; spread the CPU-heavy shingling across cores (at real
      // scale the file count provides this and AQE coalesces the tail)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), toks(col("text")).as("w"))
      // ≥3 tokens ⟺ non-empty shingle set, but filtering on the tokens is
      // what keeps the scan cheap: predicate pushdown re-expands a filter
      // on `sh` into the full (unbound) shingle tree inside the scan task,
      // re-evaluating split() per lambda iteration — a 7 s single-task
      // stage at bench scale. Pushed as size(split(text))>=3 it is one
      // split per row.
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), array_sort(shingles3(col("w"))).as("sh"))
      // second exchange: every consumer (signature path, inverted index,
      // both verify sides) branches off THIS identical subtree, so
      // ReuseExchange materializes the shingles exactly once instead of
      // re-deriving them per branch — Spark-native common-subplan reuse
      // without persist()'s lifecycle problems.
      .repartition(col("doc_id"))

  private val JACCARD_T = 0.8
  /** JACCARD_T as an exact rational (4/5). All PPJoin threshold arithmetic
    * (prefix length, length filter, positional filter) runs on integers:
    * `ceil(0.8 * 35)` in doubles is `ceil(28.000000000000004)` = 29 — an
    * off-by-one that silently shortens the prefix and loses recall. */
  private val T_NUM = 4
  private val T_DEN = 5

  /** Exact ceil(n / d) for an integer-valued column: IEEE division of an
    * integer by a small int is correctly rounded, so the result is either
    * exactly integral (n divisible by d) or ≥ 1/d away from one — floor
    * after the +d-1 shift cannot misround. */
  private def ceilDiv(n: Column, d: Int): Column =
    floor((n + (d - 1)) / d).cast("int")

  /** Ground-truth near-dup oracle: exact all-pairs shingle Jaccard.
    * Fine at verify scale (DuckDB, 500 docs); the engine never does this. */
  private val oNearDupTruth = s"""
    WITH t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM documents),
    s AS (SELECT doc_id, $oShingles3 AS sh FROM t WHERE len(w) >= 3),
    p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 len(list_intersect(a.sh, b.sh))::DOUBLE
                   / len(list_distinct(list_concat(a.sh, b.sh))) AS jac
          FROM s a JOIN s b ON a.doc_id < b.doc_id)
    SELECT id_a, id_b, ROUND(jac, 4) AS jaccard
    FROM p WHERE jac >= $JACCARD_T ORDER BY 1, 2"""

  /** Exact Jaccard between two shingle-set columns (double division of
    * int counts — bit-identical to the oracle's len()::DOUBLE / len()).
    * Native merge-pass expression; shingleSets pre-sorts its arrays. */
  /** (doc_id, canonical_id): verified LSH near-dup edges → min-label
    * connected components. The clustering core shared by q26b (dedup
    * cluster assignment) and q101 (leakage-safe split): LSH banding over
    * minhash signatures proposes candidates, exact Jaccard verifies,
    * min-label propagation finds each doc's component representative. */
  private def canonicalClusterIds(s: SparkSession, dir: String): DataFrame = {
    val sh = shingleSets(s, dir)
    val sig = sh.select(col("doc_id"),
      graftshim.column(MinHashSig(
        graftshim.expression(transform(col("sh"), x => hash28(x))),
        (0 until NUM_HASHES).map(permA),
        (0 until NUM_HASHES).map(permB), P)).as("sig"))
      .repartition(col("doc_id"))
    val bands0 = sig.select(col("doc_id"),
      explode(array((0 until BANDS).map { b =>
        struct(lit(b).as("band"),
          concat_ws("_", (0 until ROWS_PER_BAND).map(r =>
            col("sig")(b * ROWS_PER_BAND + r).cast("string")): _*).as("key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
    val bands = graft.operators.Buckets.capBuckets(bands0,
      Seq(col("band"), col("key")), MAX_BAND_BUCKET, "cluster_band_cap")
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    val edges = cand
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .filter(jaccard(col("sh_a"), col("sh_b")) >= JACCARD_T)
      .select(col("id_a"), col("id_b"))
    val bi = edges.union(edges.select(col("id_b"), col("id_a")))
      .toDF("a", "b")
    // min-label propagation to fixpoint (reliable checkpoints + logged
    // non-convergence handled inside the operator)
    val cc = graft.operators.ConnectedComponents.minLabelPropagation(
      Tables.documents(s, dir).select(col("doc_id")), bi, maxIter = 20)
    cc.labels.select(col("doc_id"), col("label").as("canonical_id"))
  }

  /** The stored dedup-cluster map (doc_id, canonical_id): the expensive
    * label-propagation result materialized ONCE per source dir (q100's
    * MV pattern) and served to every consumer. q26b still computes the
    * clustering live — it IS the clustering gate — but q101 (and any
    * future consumer: quota sampling by cluster, per-cluster stats)
    * reads the stored map instead of re-deriving it; a real curation
    * pipeline runs the propagation once per corpus snapshot and keys
    * every downstream decision off the published artifact. Round-6
    * verdict item 3: the two queries were spending ~15 s re-deriving
    * one result. ScratchSpec proves stored == live. */
  def clusterMapPath(s: SparkSession, dir: String): String =
    graft.core.Scratch.materialize("cluster_map", s"v1|$dir|${graft.core.Scratch.sourceSignature(dir)}") { p =>
      canonicalClusterIds(s, dir).write.mode("overwrite")
        .parquet(java.nio.file.Paths.get(p, "map").toString)
    } + "/map"

  private def jaccard(a: Column, b: Column): Column =
    graftshim.column(graft.expr.SortedJaccard(
      graftshim.expression(a), graftshim.expression(b)))

  /** (doc_id, bg): exploded adjacent-token bigrams over a balanced scan
    * — ONE definition shared by q55 (exact scoring) and q116 (top-K
    * scoring) so the two paths can never diverge on tokenization (r7
    * review: the block was duplicated and carries load-bearing
    * subtleties — the round-robin placement, and downstream the
    * count(doc_id) column-set rule for exchange reuse). */
  private def docBigrams(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), toks(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("w")) - 2), i =>
          concat_ws(" ", element_at(col("w"), i + 1),
            element_at(col("w"), i + 2)))).as("bg"))

  val all: Seq[Q] = Seq(

    // ------------------------------------------------------ exact dedup
    Q("q24_dedup_exact",
      "Exact content dedup: hash-partition by sha2(text) and keep the " +
        "lowest doc_id per group. One shuffle on the content hash — the " +
        "canonical 100 TB dedup shape (no sort, no window).",
      Some("""
        SELECT sha256(text) AS content_hash,
               MIN(doc_id) AS keep_id,
               COUNT(*) AS n_copies
        FROM documents GROUP BY 1 ORDER BY keep_id""")) { (s, dir) =>
      Tables.documents(s, dir)
        .groupBy(sha2(col("text"), 256).as("content_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("keep_id")
    },

    // ------------------------------------------------- MinHash LSH near-dup
    Q("q25_dedup_minhash",
      "Near-dup detection via MinHash + banded LSH: shingle → 64 minhashes " +
        "→ 16 bands of 4 → bucket self-join for candidates → exact-Jaccard " +
        "verify at 0.8. The all-pairs step never happens; candidates come " +
        "only from shared band buckets.",
      Some(oNearDupTruth)) { (s, dir) =>
      val sh = shingleSets(s, dir)
      // Signature path carries ONLY (doc_id, sig): carrying the shingle
      // array alongside makes CollapseProject inline the (expensive)
      // shingle expression into every downstream reference. The
      // repartition is an exchange barrier for the same reason — the
      // 64 band-key references below must hit a bound attribute, not a
      // re-collapsed MinHashSig tree. (5000 rows × 64 longs: the extra
      // shuffle is noise; the re-evaluation it prevents was ~10 s.)
      val sig = sh.select(col("doc_id"),
        graftshim.column(MinHashSig(
          graftshim.expression(transform(col("sh"), x => hash28(x))),
          (0 until NUM_HASHES).map(permA),
          (0 until NUM_HASHES).map(permB), P)).as("sig"))
        .repartition(col("doc_id"))
      val bands0 = sig.select(col("doc_id"),
        explode(array((0 until BANDS).map { b =>
          struct(lit(b).as("band"),
            concat_ws("_", (0 until ROWS_PER_BAND).map(r =>
              col("sig")(b * ROWS_PER_BAND + r).cast("string")): _*).as("key"))
        }: _*)).as("bk"))
        .select(col("doc_id"), col("bk.band"), col("bk.key"))
      val bands = graft.operators.Buckets.capBuckets(bands0,
        Seq(col("band"), col("key")), MAX_BAND_BUCKET, "q25_band_cap")
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        .distinct()
      cand
        .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .withColumn("jac", jaccard(col("sh_a"), col("sh_b")))
        .filter(col("jac") >= JACCARD_T)
        .select(col("id_a"), col("id_b"), round(col("jac"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")
    },

    // ------------------------------------- exact n-gram Jaccard similarity join
    Q("q26_dedup_ngram_exact",
      "Exact n-gram-Jaccard similarity join with full PPJoin filtering: " +
        "index only each doc's rarest |s|-⌈t|s|⌉+1 shingles (global " +
        "rarity order) — any pair with Jaccard ≥ t provably shares a " +
        "prefix element — then prune candidates with the exact length " +
        "filter (t·|a| ≤ |b| ≤ |a|/t) and positional filter (the suffix " +
        "after the matched position caps the possible overlap below the " +
        "required ⌈t/(1+t)·(|a|+|b|)⌉). All three filters are " +
        "recall-preserving; hot shingles never enter the candidate index. " +
        "Candidates verify against full shingle sets.",
      Some(oNearDupTruth)) { (s, dir) =>
      val sh = shingleSets(s, dir)
      val inv = sh.select(col("doc_id"), size(col("sh")).as("sz"),
        explode(col("sh")).as("shingle"))
      val dfreq = inv.groupBy("shingle").agg(count(lit(1)).as("df"))
      // rarest-first order; prefix length |s| - ceil(t*|s|) + 1; rn is the
      // doc-global position in the canonical (df, shingle) order, which
      // the positional filter below relies on being identical across docs
      val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))
      val pfx = inv.join(dfreq, "shingle")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= col("sz") - ceilDiv(col("sz") * T_NUM, T_DEN) + 1)
        .select(col("doc_id"), col("sz"), col("rn"), col("shingle"))
      // required overlap for J ≥ t: α = ⌈t/(1+t)·(|a|+|b|)⌉ = ⌈4(|a|+|b|)/9⌉
      val alpha = ceilDiv((col("x.sz") + col("y.sz")) * T_NUM, T_NUM + T_DEN)
      val cand = pfx.as("x").join(pfx.as("y"),
          col("x.shingle") === col("y.shingle") &&
            col("x.doc_id") < col("y.doc_id") &&
            // length filter: J ≥ t ⇒ t·|a| ≤ |b| ∧ t·|b| ≤ |a| (exact, 4/5)
            col("x.sz") * T_NUM <= col("y.sz") * T_DEN &&
            col("y.sz") * T_NUM <= col("x.sz") * T_DEN &&
            // positional filter: overlap ≤ 1 + min(|a|-i, |b|-j) must reach α.
            // Recall-safe under keep-if-any: for a true pair the FIRST shared
            // prefix element (which exists and passes the bound) survives.
            lit(1) + least(col("x.sz") - col("x.rn"),
              col("y.sz") - col("y.rn")) >= alpha)
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        .distinct()
      cand
        .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .withColumn("jac", jaccard(col("sh_a"), col("sh_b")))
        .filter(col("jac") >= JACCARD_T)
        .select(col("id_a"), col("id_b"), round(col("jac"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")
    },

    // ------------------------------------------------------ SimHash near-dup
    Q("q27_dedup_simhash",
      "SimHash near-dup: 28-bit simhash over token hashes, candidates via " +
        "the pigeonhole trick (4 chunks of 7 bits — hamming ≤ 3 pairs MUST " +
        "share a chunk, so the chunk-equality join has guaranteed 100% " +
        "recall, unlike probabilistic LSH), exact hamming verify.",
      Some(s"""
        WITH t AS (SELECT doc_id,
               list_transform(string_split_regex(text, '\\s+'),
                              tok -> ${oHash28("tok")}) AS hs
             FROM documents),
        sim AS (SELECT doc_id, list_sum(list_transform(range(28), j ->
                 CASE WHEN list_sum(list_transform(hs, x ->
                        CASE WHEN (x // (1::BIGINT << j)) % 2 = 1 THEN 1 ELSE -1 END)) > 0
                      THEN (1::BIGINT << j) ELSE 0 END)) AS sh
                FROM t)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.sh, b.sh))::INT AS hamming
        FROM sim a JOIN sim b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sh, b.sh)) <= 3
        ORDER BY 1, 2""")) { (s, dir) =>
      val hs = Tables.documents(s, dir)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), transform(toks(col("text")), t => hash28(t)).as("hs"))
      // simhash bit j = 1 iff Σ_tokens (bit_j(h) ? +1 : -1) > 0 — native
      // expression (one pass over tokens) instead of 28 interpreted
      // aggregate() calls; exchange barrier so the 5 downstream
      // references hit a bound attribute (see q25 note)
      val sim = hs.select(col("doc_id"),
          graftshim.column(graft.expr.SimHash28(
            graftshim.expression(col("hs")))).as("sh"))
        .repartition(col("doc_id"))
      // pigeonhole: hamming ≤ 3 ⇒ at least one of 4 disjoint 7-bit chunks equal
      val chunks0 = sim.select(col("doc_id"), col("sh"),
        explode(array((0 until 4).map { c =>
          struct(lit(c).as("chunk"),
            ((col("sh") / (1L << (7 * c))).cast("long") % (1L << 7)).as("v"))
        }: _*)).as("ck"))
        .select(col("doc_id"), col("sh"), col("ck.chunk"), col("ck.v"))
      val chunks = graft.operators.Buckets.capBuckets(chunks0,
        Seq(col("chunk"), col("v")), MAX_CHUNK_BUCKET, "q27_chunk_cap")
      chunks.as("x").join(chunks.as("y"),
          col("x.chunk") === col("y.chunk") && col("x.v") === col("y.v") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
          bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy("id_a", "id_b")
    },

    // ----------------------------------------------- dedup cluster assignment
    Q("q26b_dedup_clusters",
      "The step that actually deduplicates a corpus: connected components " +
        "over the verified near-dup pairs via min-label propagation " +
        "(the Pregel superstep pattern — per-iteration convergence check " +
        "on an aggregated scalar, lineage truncated per step; at corpus " +
        "scale you cap supersteps). Output: every doc's canonical " +
        "representative (= min doc_id of its component).",
      Some(s"""
        WITH t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM documents),
        s AS (SELECT doc_id, $oShingles3 AS sh FROM t WHERE len(w) >= 3),
        p AS (SELECT a.doc_id AS x, b.doc_id AS y
              FROM s a JOIN s b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
                      / len(list_distinct(list_concat(a.sh, b.sh))) >= $JACCARD_T),
        e AS (SELECT x AS a, y AS b FROM p UNION ALL SELECT y, x FROM p),
        reach AS (
          WITH RECURSIVE r(src, dst) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT r.src, e.b FROM r JOIN e ON e.a = r.dst)
          SELECT * FROM r)
        SELECT src AS doc_id, MIN(dst) AS canonical_id,
               (MIN(dst) = src) AS is_kept
        FROM reach GROUP BY src ORDER BY doc_id""")) { (s, dir) =>
      canonicalClusterIds(s, dir)
        .select(col("doc_id"), col("canonical_id"),
          (col("canonical_id") === col("doc_id")).as("is_kept"))
        .orderBy("doc_id")
    },

    // ------------------------------------ leakage-safe train/test split
    Q("q101_leakage_split",
      "Contamination-safe dataset split: docs are assigned to " +
        "train/valid/test by hashing their DEDUP-CLUSTER representative " +
        "(q26b's connected-component canonical id), not the doc itself " +
        "— so near-duplicates can never straddle a split boundary and " +
        "leak eval content into training. 8/1/1 via the md5-prefix " +
        "hash28 mod 10 (the engine's cross-engine hashing primitive). " +
        "The cluster map is read from its STORED artifact (built once " +
        "per corpus snapshot — the q100 MV pattern; ScratchSpec " +
        "proves stored == live), the way a production pipeline keys " +
        "every downstream decision off one published clustering instead " +
        "of re-deriving it per consumer. 100 TB shape: the split adds " +
        "ONE map-side projection on top of the stored map — no extra " +
        "shuffle; determinism means re-runs and late-arriving shards " +
        "assign identically without coordination. The per-doc output " +
        "makes the no-straddle invariant hash-checkable: any cluster " +
        "with two splits would diverge from the oracle's cluster-keyed " +
        "assignment.",
      Some(s"""
        WITH t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM documents),
        s AS (SELECT doc_id, $oShingles3 AS sh FROM t WHERE len(w) >= 3),
        p AS (SELECT a.doc_id AS x, b.doc_id AS y
              FROM s a JOIN s b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
                      / len(list_distinct(list_concat(a.sh, b.sh))) >= $JACCARD_T),
        e AS (SELECT x AS a, y AS b FROM p UNION ALL SELECT y, x FROM p),
        reach AS (
          WITH RECURSIVE r(src, dst) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT r.src, e.b FROM r JOIN e ON e.a = r.dst)
          SELECT * FROM r),
        c AS (SELECT src AS doc_id, MIN(dst) AS canonical_id
              FROM reach GROUP BY src)
        SELECT doc_id, canonical_id,
               CASE WHEN h < 8 THEN 'train' WHEN h = 8 THEN 'valid'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id, canonical_id,
                     ${oHash28("canonical_id::VARCHAR")} % 10 AS h FROM c)
        ORDER BY doc_id""")) { (s, dir) =>
      s.read.parquet(clusterMapPath(s, dir))
        .withColumn("h", hash28(col("canonical_id").cast("string")) % 10)
        .select(col("doc_id"), col("canonical_id"),
          when(col("h") < 8, "train").when(col("h") === 8, "valid")
            .otherwise("test").as("split"))
        .orderBy("doc_id")
    },

    // ------------------------------------------------- top-k vocabulary
    Q("q26c_top_tokens",
      "Per-language top-5 vocabulary: explode tokens, one hash-agg on " +
        "(lang, token), windowed top-k with a deterministic tie-break — " +
        "the corpus-inspection primitive of any training-data audit.",
      Some("""
        WITH tok AS (SELECT lang, unnest(string_split_regex(text, '\s+')) AS token
                     FROM documents),
        c AS (SELECT lang, token, COUNT(*) AS n FROM tok GROUP BY 1, 2),
        r AS (SELECT lang, token, n,
                     ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rnk
              FROM c)
        SELECT lang, rnk::INT AS rnk, token, n
        FROM r WHERE rnk <= 5 ORDER BY lang, rnk""")) { (s, dir) =>
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n").desc, col("token").asc)
      Tables.documents(s, dir)
        .select(col("lang"), explode(toks(col("text"))).as("token"))
        .groupBy(col("lang"), col("token"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("lang"), col("rnk"), col("token"), col("n"))
        .orderBy("lang", "rnk")
    },

    // ---------------------------------------------------------- text stats
    Q("q28_text_stats",
      "Per-language corpus statistics: doc counts, token totals (exact " +
        "integer sums), char totals, averages derived once at the end. " +
        "Single hash-agg shuffle on a low-cardinality key.",
      Some("""
        SELECT lang,
               COUNT(*) AS n_docs,
               SUM(len(string_split_regex(text, '\s+')))::BIGINT AS total_tokens,
               SUM(length(text))::BIGINT AS total_chars,
               ROUND(CAST(SUM(len(string_split_regex(text, '\s+'))) AS DOUBLE) / COUNT(*), 4) AS avg_tokens,
               ROUND(CAST(SUM(length(text)) AS DOUBLE) / COUNT(*), 4) AS avg_chars
        FROM documents GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(size(toks(col("text"))).cast("long")).as("total_tokens"),
          sum(length(col("text")).cast("long")).as("total_chars"))
        .withColumn("avg_tokens",
          round(col("total_tokens").cast("double") / col("n_docs"), 4))
        .withColumn("avg_chars",
          round(col("total_chars").cast("double") / col("n_docs"), 4))
        .orderBy("lang")
    },

    // ------------------------------------------------------------- lang-ID
    Q("q29_lang_id",
      "Heuristic language-ID: score each doc by marker-stopword hits per " +
        "language over the distinct token set, argmax with a fixed " +
        "precedence, crosstab predicted vs labeled lang. Pure per-row " +
        "array intrinsics + one small agg.",
      Some("""
        WITH t AS (SELECT lang, list_distinct(string_split_regex(text, '\s+')) AS w FROM documents),
        sc AS (SELECT lang,
                      len(list_intersect(w, ['the','a','of','to','in'])) AS s_en,
                      len(list_intersect(w, ['el','la','los','de','y'])) AS s_es,
                      len(list_intersect(w, ['le','les','des','et','une'])) AS s_fr,
                      len(list_intersect(w, ['der','die','das','und','ein'])) AS s_de
               FROM t),
        pred AS (SELECT lang,
                        CASE WHEN s_en = 0 AND s_es = 0 AND s_fr = 0 AND s_de = 0 THEN 'unknown'
                             WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
                             WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
                             WHEN s_fr >= s_de THEN 'fr'
                             ELSE 'de' END AS predicted
                 FROM sc)
        SELECT lang, predicted, COUNT(*) AS n
        FROM pred GROUP BY 1, 2 ORDER BY 1, 2""")) { (s, dir) =>
      def markers(ws: String*): Column = array(ws.map(lit): _*)
      val w = array_distinct(toks(col("text")))
      val scored = Tables.documents(s, dir).select(col("lang"),
        size(array_intersect(w, markers("the", "a", "of", "to", "in"))).as("s_en"),
        size(array_intersect(w, markers("el", "la", "los", "de", "y"))).as("s_es"),
        size(array_intersect(w, markers("le", "les", "des", "et", "une"))).as("s_fr"),
        size(array_intersect(w, markers("der", "die", "das", "und", "ein"))).as("s_de"))
      scored.withColumn("predicted",
          when(col("s_en") === 0 && col("s_es") === 0 && col("s_fr") === 0 &&
            col("s_de") === 0, "unknown")
            .when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr") &&
              col("s_en") >= col("s_de"), "en")
            .when(col("s_es") >= col("s_fr") && col("s_es") >= col("s_de"), "es")
            .when(col("s_fr") >= col("s_de"), "fr")
            .otherwise("de"))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted")
    },

    // ------------------------------------------------------ quality scoring
    Q("q30_quality_score",
      "Per-doc quality signals: token count, stopword ratio, mean token " +
        "length, and a rule-based quality tier — the length/stopword " +
        "heuristics of C4-style corpus filtering, all integer-exact.",
      Some("""
        WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS w, length(text) AS nc FROM documents),
        m AS (SELECT doc_id, len(w)::INT AS n_tokens,
                     len(list_filter(w, x -> list_contains(['the','a','of','to','in'], x)))::INT AS n_stop,
                     nc
              FROM t)
        SELECT doc_id, n_tokens, n_stop,
               ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 4) AS stop_ratio,
               ROUND(CAST(nc - n_tokens + 1 AS DOUBLE) / n_tokens, 4) AS avg_token_len,
               CASE WHEN n_tokens >= 30 AND n_stop > 0 THEN 'good'
                    WHEN n_tokens >= 10 THEN 'fair'
                    ELSE 'poor' END AS tier
        FROM m ORDER BY doc_id""")) { (s, dir) =>
      val stop = array(Seq("the", "a", "of", "to", "in").map(lit): _*)
      val w = toks(col("text"))
      Tables.documents(s, dir)
        .select(col("doc_id"), w.as("w"), length(col("text")).as("nc"))
        .select(col("doc_id"),
          size(col("w")).as("n_tokens"),
          size(filter(col("w"), x => array_contains(stop, x))).as("n_stop"),
          col("nc"))
        .select(col("doc_id"), col("n_tokens"), col("n_stop"),
          round(col("n_stop").cast("double") / col("n_tokens"), 4).as("stop_ratio"),
          // tokens are single-space separated: chars = Σlen + (n-1)
          round((col("nc") - col("n_tokens") + 1).cast("double") / col("n_tokens"), 4)
            .as("avg_token_len"),
          when(col("n_tokens") >= 30 && col("n_stop") > 0, "good")
            .when(col("n_tokens") >= 10, "fair")
            .otherwise("poor").as("tier"))
        .orderBy("doc_id")
    },

    // ------------------------------------------------- BPE-ish token counts
    Q("q32b_bpe_token_count",
      "Sub-word-style token counting: a BPE-ish regex (letter runs / digit " +
        "runs / single punctuation) alongside whitespace tokens — the " +
        "chars-per-token fertility stat an LLM-corpus budget uses. The " +
        "pattern is dialect-neutral so Spark (Java regex) and DuckDB (RE2) " +
        "tokenize identically.",
      Some("""
        WITH t AS (SELECT lang,
                          len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_bpe,
                          len(string_split_regex(text, '\s+')) AS n_ws,
                          length(text) AS nc
                   FROM documents)
        SELECT lang,
               SUM(n_bpe)::BIGINT AS total_bpe_tokens,
               SUM(n_ws)::BIGINT AS total_ws_tokens,
               ROUND(CAST(SUM(nc) AS DOUBLE) / SUM(n_bpe), 4) AS chars_per_bpe_token,
               ROUND(CAST(SUM(n_bpe) AS DOUBLE) / SUM(n_ws), 4) AS fertility
        FROM t GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("lang"),
          size(regexp_extract_all(col("text"),
            lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0))).as("n_bpe"),
          size(toks(col("text"))).as("n_ws"),
          length(col("text")).as("nc"))
        .groupBy("lang")
        .agg(
          sum(col("n_bpe").cast("long")).as("total_bpe_tokens"),
          sum(col("n_ws").cast("long")).as("total_ws_tokens"),
          round(sum(col("nc").cast("long")).cast("double") /
            sum(col("n_bpe").cast("long")), 4).as("chars_per_bpe_token"),
          round(sum(col("n_bpe").cast("long")).cast("double") /
            sum(col("n_ws").cast("long")), 4).as("fertility"))
        .orderBy("lang")
    },

    // -------------------------------------------------- content fingerprint
    Q("q31_fingerprint",
      "Document fingerprinting: polynomial rolling hash (base 31, mod " +
        "1e9+7) over the character stream — a pure left fold in codegen'd " +
        "array intrinsics, mirrored exactly by the oracle's list_reduce.",
      Some("""
        SELECT doc_id,
               list_reduce(
                 list_prepend(0::BIGINT,
                   list_transform(range(1, length(text) + 1),
                                  i -> ascii(text[i])::BIGINT)),
                 (h, c) -> (h * 31 + c) % 1000000007) AS fp
        FROM documents ORDER BY doc_id""")) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graftshim.column(graft.expr.RollingHash(
            graftshim.expression(col("text")))).as("fp"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------- repetition quality signal
    Q("q49_repetition_signal",
      "Within-document repetition (the Gopher/C4 duplicate-n-gram " +
        "signal): per-doc 2-gram count, distinct count, and duplicate " +
        "fraction — boilerplate and degenerate generations score high and " +
        "get filtered before training. Pure per-row array expressions " +
        "over a bound token column (one split per row).",
      Some("""
        WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
        g AS (SELECT doc_id,
                     list_transform(range(len(w) - 1),
                                    i -> w[i+1] || ' ' || w[i+2]) AS g2
              FROM t WHERE len(w) >= 2)
        SELECT doc_id,
               len(g2)::BIGINT AS n_2grams,
               len(list_distinct(g2))::BIGINT AS n_distinct,
               ROUND((len(g2) - len(list_distinct(g2)))::DOUBLE / len(g2), 4) AS dup_frac
        FROM g ORDER BY doc_id""")) { (s, dir) =>
      val t = Tables.documents(s, dir)
        .select(col("doc_id"), toks(col("text")).as("w"))
        .filter(size(col("w")) >= 2)
      t.select(col("doc_id"),
          transform(sequence(lit(0), size(col("w")) - 2), i =>
            concat_ws(" ", element_at(col("w"), i + 1),
              element_at(col("w"), i + 2))).as("g2"))
        .select(col("doc_id"),
          size(col("g2")).cast("long").as("n_2grams"),
          size(array_distinct(col("g2"))).cast("long").as("n_distinct"))
        .withColumn("dup_frac",
          round((col("n_2grams") - col("n_distinct")).cast("double") /
            col("n_2grams"), 4))
        .orderBy("doc_id")
    },

    // ----------------------------------- fixed-size per-stratum sampling
    Q("q105_stratified_sample",
      "Exactly-N-per-stratum deterministic sampling (fixed-size eval " +
        "slices, per-language audit samples): bottom-10-by-hash per " +
        "language via the bounded top-k aggregate on the packed key " +
        "(2^28 − hash28(doc_id))·10^9 + doc_id. This is reservoir " +
        "sampling's job done coordination-free: the hash order is a " +
        "fixed uniform permutation, so the sample is exactly N per " +
        "stratum, identical on re-runs, at any parallelism, and under " +
        "late-arriving shards — properties true reservoir sampling " +
        "(RNG + sequential state) cannot give a distributed engine. " +
        "100 TB shape: same O(k)-state single aggregate as q99 — no " +
        "per-stratum sort, no window over the corpus. Pack headroom " +
        "(the q99 rule): requires 0 <= doc_id < 10^9 — h < 2^28 rides " +
        "the high lane, doc_id the low 10^9 lane; a larger corpus " +
        "widens to two packed lanes.",
      Some(s"""
        WITH d AS (SELECT lang, doc_id,
                          ${oHash28("doc_id::VARCHAR")} AS h FROM documents),
        r AS (SELECT lang, doc_id, h,
                     ROW_NUMBER() OVER (PARTITION BY lang
                                        ORDER BY h, doc_id DESC) AS rnk
              FROM d)
        SELECT lang, CAST(rnk AS BIGINT) AS rnk, doc_id, h
        FROM r WHERE rnk <= 10 ORDER BY lang, rnk""")) { (s, dir) =>
      val M = 1L << 28
      Tables.documents(s, dir)
        .select(col("lang"), col("doc_id"),
          hash28(col("doc_id").cast("string")).as("h"))
        // bottom-k by h == top-k by (M - h); doc_id tiebreak rides the
        // low lane (same-h collisions keep the larger id first)
        .withColumn("packed",
          (lit(M) - col("h")) * lit(1000000000L) + col("doc_id"))
        .groupBy("lang")
        .agg(graft.functions.topk_packed(col("packed"), 10).as("top"))
        .select(col("lang"), posexplode(col("top")).as(Seq("pos", "p")))
        .select(col("lang"),
          (col("pos") + 1).cast("long").as("rnk"),
          (col("p") % 1000000000L).cast("long").as("doc_id"),
          (lit(M) - expr("p DIV 1000000000")).cast("long").as("h"))
        .orderBy("lang", "rnk")
    },

    // ------------------------------------------- deterministic hash sampling
    Q("q50_hash_sample",
      "Deterministic stratified sampling / split assignment: every doc " +
        "hashes to a bucket (md5 arithmetic — reproducible across runs, " +
        "engines, and cluster sizes, unlike rand()), per-language rates " +
        "pick the sample, and sampled docs split 80/20 train/val. The " +
        "shape every corpus ablation and held-out split uses: a pure " +
        "projection, no shuffle, no state.",
      Some("""
        SELECT doc_id, lang,
               ('0x' || substr(md5('sample_' || doc_id), 1, 7))::BIGINT % 100 AS bucket,
               CASE WHEN ('0x' || substr(md5('sample_' || doc_id), 1, 7))::BIGINT % 100
                         < (CASE WHEN lang = 'en' THEN 50 ELSE 20 END)
                    THEN (CASE WHEN ('0x' || substr(md5('sample_' || doc_id), 1, 7))::BIGINT % 100
                               < (CASE WHEN lang = 'en' THEN 40 ELSE 16 END)
                          THEN 'train' ELSE 'val' END)
                    ELSE 'dropped' END AS split
        FROM documents ORDER BY doc_id""")) { (s, dir) =>
      val bucket = hash28(concat(lit("sample_"), col("doc_id"))) % 100
      val rate = when(col("lang") === "en", 50).otherwise(20)
      val trainRate = when(col("lang") === "en", 40).otherwise(16)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), bucket.as("bucket"),
          when(bucket < trainRate, "train")
            .when(bucket < rate, "val")
            .otherwise("dropped").as("split"))
        .orderBy("doc_id")
    },

    // ------------------------------------------- corpus-frequency scoring
    Q("q55_bigram_typicality",
      "Corpus-frequency LM scoring (the perplexity-filter shape without " +
        "cross-engine log drift): global bigram counts in one hash-agg, " +
        "then each doc's mean and minimum corpus frequency over its own " +
        "bigrams — low typicality flags gibberish, high flags " +
        "boilerplate. Integer counts + one guarded division keep it " +
        "bit-exact. Dataflow: the balanced doc scan is ONE round-robin " +
        "exchange consumed by both the frequency agg and the join probe " +
        "(ReusedExchange under AQE — machine-audited; an earlier " +
        "repartition(bg) claimed sharing that column pruning silently " +
        "broke: the agg branch pruned to bg-only, the probe carried " +
        "(doc_id, bg), so the exchanges never canonicalized equal and " +
        "the explode ran twice). The bigram frequency table is the only " +
        "corpus-domain shuffle and joins back as a broadcast while it " +
        "fits (AQE falls back to a bg shuffle join when it outgrows " +
        "that); at 100 TB the real path is a broadcast top-K table " +
        "with a default count, the CCNet trick.",
      Some("""
        WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
        g AS (SELECT doc_id,
                     unnest(list_transform(range(len(w) - 1),
                                           i -> w[i+1] || ' ' || w[i+2])) AS bg
              FROM t WHERE len(w) >= 2),
        f AS (SELECT bg, COUNT(*) AS c FROM g GROUP BY 1)
        SELECT g.doc_id,
               COUNT(*) AS n_bigrams,
               MIN(f.c) AS min_freq,
               ROUND(SUM(f.c)::DOUBLE / COUNT(*), 4) AS avg_freq
        FROM g JOIN f USING (bg)
        GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val g = docBigrams(s, dir)
      // count(doc_id), NOT count(1): doc_id is the non-null key, so the
      // counts are identical — but referencing it keeps the frequency
      // branch's column set equal to the probe's (doc_id, bg). With
      // count(1), column pruning projected this branch to bg-only, the
      // two exchange subtrees no longer canonicalized equal, and the
      // scan + explode silently ran twice (caught by AqePlanAuditSpec).
      val freq = g.groupBy("bg").agg(count(col("doc_id")).as("c"))
      g.join(freq, "bg")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          min(col("c")).as("min_freq"),
          round(sum(col("c")).cast("double") / count(lit(1)), 4).as("avg_freq"))
        .orderBy("doc_id")
    },

    // ----------------------------------- corpus-frequency scoring at scale
    Q("q116_bigram_topk_score",
      "q55's documented 100 TB path made real — the CCNet trick: instead " +
        "of joining every doc bigram against the FULL frequency table " +
        "(corpus-domain shuffle), keep only the top-K most frequent " +
        "bigrams (TakeOrderedAndProject — partial top-K per partition, " +
        "never a global sort) and score everything else with a default " +
        "count of 1. The top-K table is fixed-size for ANY corpus, so it " +
        "BROADCASTS and the scoring pass is map-only: scan, explode, " +
        "broadcast-probe, per-doc agg — zero shuffle beyond the per-doc " +
        "hash-agg (plan-audited: no sort-merge join). Rank truncation " +
        "is deterministic ((cnt, bigram) tie-break) so the oracle " +
        "replays the exact same K-set; scores differ from q55 only " +
        "where a tail bigram hit the default — which is the accepted " +
        "approximation the CCNet paper ships.",
      Some("""
        WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
        g AS (SELECT doc_id,
                     unnest(list_transform(range(len(w) - 1),
                                           i -> w[i+1] || ' ' || w[i+2])) AS bg
              FROM t WHERE len(w) >= 2),
        f AS (SELECT bg, COUNT(*) AS c FROM g GROUP BY 1),
        k AS (SELECT bg, c FROM f ORDER BY c DESC, bg LIMIT 100)
        SELECT g.doc_id,
               COUNT(*) AS n_bigrams,
               MIN(COALESCE(k.c, 1)) AS min_freq,
               ROUND(SUM(COALESCE(k.c, 1))::DOUBLE / COUNT(*), 4) AS avg_freq
        FROM g LEFT JOIN k USING (bg)
        GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val g = docBigrams(s, dir)
      // fixed-size top-K: partial top-K per partition via TakeOrdered;
      // count(doc_id) keeps the branch reusable with the probe (q55 rule)
      val topK = g.groupBy("bg").agg(count(col("doc_id")).as("c"))
        .orderBy(col("c").desc, col("bg")).limit(100)
      g.join(broadcast(topK), Seq("bg"), "left")
        .withColumn("c", coalesce(col("c"), lit(1L)))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          min(col("c")).as("min_freq"),
          round(sum(col("c")).cast("double") / count(lit(1)), 4).as("avg_freq"))
        .orderBy("doc_id")
    },

    // --------------------------------------------------- sequence packing
    Q("q56_sequence_packing",
      "Training-sequence packing: contiguous greedy packing of docs into " +
        "4096-token bins within each language partition (bin = cumulative " +
        "tokens before the doc, integer-divided by the budget) — the " +
        "distributed packing shape: deterministic, one shuffle+sort per " +
        "partition key, no global coordination. Emits per-bin fill " +
        "stats; the tail bin underfills, every other bin's waste is " +
        "bounded by one document.",
      Some("""
        WITH t AS (SELECT doc_id, lang,
                          len(string_split_regex(text, '\s+'))::BIGINT AS n_tokens
                   FROM documents),
        c AS (SELECT doc_id, lang, n_tokens,
                     SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                         ROWS UNBOUNDED PRECEDING) - n_tokens AS offs
              FROM t)
        SELECT lang, (offs // 4096)::BIGINT AS bin_id,
               COUNT(*) AS n_docs,
               SUM(n_tokens)::BIGINT AS tokens_packed
        FROM c GROUP BY 1, 2 ORDER BY 1, 2""")) { (s, dir) =>
      val t = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          size(toks(col("text"))).cast("long").as("n_tokens"))
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.withColumn("offs", sum(col("n_tokens")).over(w) - col("n_tokens"))
        .groupBy(col("lang"), floor(col("offs") / 4096).as("bin_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens_packed"))
        .orderBy("lang", "bin_id")
    },

    // ------------------------------------------------------- PII redaction
    Q("q54_pii_redact",
      "PII scrubbing: regex-redact emails and phone-like tokens to " +
        "placeholder tags, with per-doc redaction counts and a hash of " +
        "the redacted text proving byte-identical output. The corpus " +
        "carries no PII, so deterministic synthetic contact strings are " +
        "appended first — the operator under test is the redaction " +
        "projection (graft.functions.redact_pii), which at scale is a " +
        "pure codegen'd map, no shuffle.",
      Some("""
        WITH t AS (SELECT doc_id,
                          text || ' contact user' || doc_id ||
                          '@example.com or 555-' || doc_id AS raw
                   FROM documents),
        r AS (SELECT doc_id, raw,
                     regexp_replace(
                       regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                       '555-[0-9]+', '[PHONE]', 'g') AS red
              FROM t)
        SELECT doc_id,
               (length(raw) - length(regexp_replace(raw, '@', '', 'g')))::BIGINT AS n_emails,
               ((length(raw) - length(regexp_replace(raw, '555-', '', 'g'))) // 4)::BIGINT AS n_phones,
               sha256(red) AS redacted_hash
        FROM r ORDER BY doc_id""")) { (s, dir) =>
      val raw = concat(col("text"), lit(" contact user"), col("doc_id"),
        lit("@example.com or 555-"), col("doc_id"))
      Tables.documents(s, dir)
        .select(col("doc_id"), raw.as("raw"))
        .select(col("doc_id"),
          (length(col("raw")) -
            length(regexp_replace(col("raw"), "@", ""))).cast("long").as("n_emails"),
          floor((length(col("raw")) -
            length(regexp_replace(col("raw"), "555-", ""))) / 4)
            .cast("long").as("n_phones"),
          sha2(graft.functions.redact_pii(col("raw")), 256).as("redacted_hash"))
        .orderBy("doc_id")
    },

    // --------------------------------------- contrastive pair mining
    Q("q146_contrastive_pairs",
      "Training-pair mining for contrastive embedding training (the " +
        "SimCSE/CLIP-data shape): every doc anchors a positive — its " +
        "(lang, source) successor, the weak-supervision same-origin " +
        "heuristic — and a hard-ish negative: its successor in a " +
        "deterministic hash shuffle WITHIN the language, accepted only " +
        "when the source differs (same-lang negatives are harder than " +
        "random corpus draws). Both neighbors come from lead() windows " +
        "over BOUNDED partitions — (lang, source) and (lang, " +
        "hash-bucket) — never a global sort: the bucket count is the " +
        "parallelism knob at 100 TB, the hash order is a fixed uniform " +
        "permutation (hash28, the engine-wide primitive), so pairing " +
        "is reproducible across runs, partitions, and engines — " +
        "RNG-free by the q105 rule. The oracle replays both windows " +
        "verbatim in DuckDB.",
      Some(s"""
        WITH d AS (SELECT doc_id, lang, source,
                          ${oHash28("doc_id::VARCHAR")} AS h FROM documents),
        b AS (SELECT *, h % 16 AS bkt FROM d),
        w AS (SELECT doc_id, lang, source,
                     LEAD(doc_id) OVER (PARTITION BY lang, source
                                        ORDER BY doc_id) AS pos_id,
                     LEAD(doc_id) OVER (PARTITION BY lang, bkt
                                        ORDER BY h, doc_id) AS cand_id,
                     LEAD(source) OVER (PARTITION BY lang, bkt
                                        ORDER BY h, doc_id) AS cand_src
              FROM b)
        SELECT doc_id AS anchor_id, lang, pos_id,
               CASE WHEN cand_src <> source THEN cand_id END AS neg_id
        FROM w WHERE pos_id IS NOT NULL ORDER BY anchor_id""")) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("source"),
          hash28(col("doc_id").cast("string")).as("h"))
        .withColumn("bkt", col("h") % 16)
      val wPos = Window.partitionBy("lang", "source").orderBy("doc_id")
      val wNeg = Window.partitionBy("lang", "bkt").orderBy("h", "doc_id")
      d.withColumn("pos_id", lead("doc_id", 1).over(wPos))
        .withColumn("cand_id", lead("doc_id", 1).over(wNeg))
        .withColumn("cand_src", lead("source", 1).over(wNeg))
        .filter(col("pos_id").isNotNull)
        .select(col("doc_id").as("anchor_id"), col("lang"), col("pos_id"),
          when(col("cand_src") =!= col("source"), col("cand_id")).as("neg_id"))
        .orderBy("anchor_id")
    },

    // --------------------------------------- filter-cascade attrition audit
    Q("q191_filter_attrition",
      "Quality-filter CASCADE with per-rule attrition — the FineWeb/" +
        "RefinedWeb observability report every curation run ships with: " +
        "rules apply IN ORDER and each one is charged only the docs " +
        "that survived every earlier rule (so the numbers sum to " +
        "input = removed_1..n + survivors, and re-ordering rules " +
        "visibly re-prices them). Four deterministic integer rules: " +
        "min/max length, minimum whitespace word count, maximum " +
        "single-word length (the URL/base64-blob catcher). Dataflow: " +
        "ONE map-only pass evaluates all predicates per row (no rule-" +
        "per-pass rescans — at 100 TB, 4 rules must not cost 4 scans) " +
        "into a first-failing-rule label, then a label-domain hash-agg " +
        "(<= 5 groups). Bit-exact: every rule is integer arithmetic on " +
        "counts and lengths.",
      Some("""
        WITH lab AS (
          SELECT CASE
            WHEN NOT (LENGTH(text) >= 100) THEN '1_minlen'
            WHEN NOT (LENGTH(text) <= 450) THEN '2_maxlen'
            WHEN NOT (len(string_split_regex(trim(text), '\s+')) >= 25)
              THEN '3_minwords'
            WHEN NOT (list_max(list_transform(
                string_split_regex(trim(text), '\s+'),
                w -> LENGTH(w))) <= 7) THEN '4_maxword'
            ELSE '5_kept' END AS rule,
            n_chars
          FROM documents)
        SELECT rule, COUNT(*)::BIGINT AS n_docs,
               SUM(n_chars)::BIGINT AS n_chars
        FROM lab GROUP BY rule ORDER BY rule""")) { (s, dir) =>
      val words = split(trim(col("text")), "\\s+")
      val rule = when(!(length(col("text")) >= 100), "1_minlen")
        .when(!(length(col("text")) <= 450), "2_maxlen")
        .when(!(size(words) >= 25), "3_minwords")
        .when(!(array_max(transform(words, w => length(w))) <= 7),
          "4_maxword")
        .otherwise("5_kept")
      Tables.documents(s, dir)
        .select(rule.as("rule"), col("n_chars"))
        .groupBy("rule")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
        .orderBy("rule")
    },

    // ------------------------------------------ deterministic epoch shuffle
    Q("q192_epoch_shuffle",
      "Deterministic multi-epoch GLOBAL shuffle — the training-order " +
        "primitive: epoch e's order is rank by hash('ep<e>_' || " +
        "doc_id), so every epoch is a different but perfectly " +
        "REPRODUCIBLE permutation (rerun, resume, or re-shard and the " +
        "order is identical — rand() can promise none of that), and " +
        "the shuffle needs no coordination: any worker computes any " +
        "doc's position. The gate emits each epoch's first 5 docs via " +
        "the engine's distributed top-k shape (per-bucket windows keep " +
        "each sort partition vocab/nBuckets-sized, then an exact " +
        "global rank over <= buckets x k survivors — q114's plan; a " +
        "naive per-epoch global ORDER BY would be one task sorting " +
        "the corpus, PER EPOCH, at 100 TB). Epoch count x corpus is " +
        "embarrassingly parallel map work.",
      Some(s"""
        WITH keyed AS (
          SELECT e.epoch, doc_id,
                 ${oHash28("'ep' || e.epoch || '_' || doc_id")} AS skey
          FROM documents,
               (SELECT UNNEST(ARRAY[0, 1, 2]) AS epoch) e),
        r AS (
          SELECT epoch, doc_id, skey,
                 ROW_NUMBER() OVER (PARTITION BY epoch
                                    ORDER BY skey, doc_id) AS rnk
          FROM keyed)
        SELECT epoch::BIGINT AS epoch, rnk::BIGINT AS rnk, doc_id, skey
        FROM r WHERE rnk <= 5 ORDER BY epoch, rnk""")) { (s, dir) =>
      import s.implicits._
      val k = 5
      val nBuckets = 32
      val keyed = Tables.documents(s, dir).select(col("doc_id"))
        .crossJoin(broadcast(Seq(0, 1, 2).toDF("epoch")))
        .select(col("epoch"), col("doc_id"),
          hash28(concat(lit("ep"), col("epoch"), lit("_"), col("doc_id")))
            .as("skey"))
      val wLocal = Window
        .partitionBy(col("epoch"), pmod(hash(col("doc_id")), lit(nBuckets)))
        .orderBy(col("skey"), col("doc_id"))
      val top = keyed.withColumn("lr", row_number().over(wLocal))
        .filter(col("lr") <= k).drop("lr")
      val wExact = Window.partitionBy(col("epoch"))
        .orderBy(col("skey"), col("doc_id"))
      top.withColumn("rnk", row_number().over(wExact))
        .filter(col("rnk") <= k)
        .select(col("epoch").cast("long").as("epoch"),
          col("rnk").cast("long").as("rnk"), col("doc_id"), col("skey"))
        .orderBy("epoch", "rnk")
    },

    // -------------------------------------------- fill-in-the-middle split
    Q("q193_fim_split",
      "Fill-in-the-middle (FIM) transformation — the infilling " +
        "data prep behind code models (Bavarian et al.): each eligible " +
        "doc (>= 30 chars) splits into prefix | middle | suffix at " +
        "DETERMINISTIC char offsets (start = 1 + (doc_id * 31) mod " +
        "(len/3), middle length = len/3 — reproducible across runs " +
        "and engines, no rand()), and the emitted lengths must " +
        "reassemble to the original length exactly — the row-level " +
        "invariant the gate's length columns prove. Pure projection: " +
        "zero shuffles beyond the output sort, trivially 100 TB-" +
        "parallel. PSM re-ordering and sentinel insertion are " +
        "downstream string concat on these spans.",
      Some("""
        WITH f AS (
          SELECT doc_id, lang, LENGTH(text) AS len,
                 1 + (doc_id * 31) % (LENGTH(text) // 3) AS mstart,
                 LENGTH(text) // 3 AS mlen, text
          FROM documents WHERE LENGTH(text) >= 30)
        SELECT doc_id, lang,
               LENGTH(substr(text, 1, mstart::INT - 1))::BIGINT
                 AS prefix_len,
               LENGTH(substr(text, mstart::INT, mlen::INT))::BIGINT
                 AS middle_len,
               LENGTH(substr(text, (mstart + mlen)::INT,
                 len::INT))::BIGINT AS suffix_len,
               len::BIGINT AS total_len
        FROM f ORDER BY doc_id""")) { (s, dir) =>
      val len = length(col("text"))
      // Spark's `/` on integers is DOUBLE division — the offsets must
      // be integer arithmetic (floor-div), or the modulo drifts
      val mlen = floor(len / 3).cast("int")
      val mstart = (lit(1) + (col("doc_id") * 31) % mlen).cast("int")
      Tables.documents(s, dir)
        .filter(length(col("text")) >= 30)
        .select(col("doc_id"), col("lang"),
          length(substring(col("text"), lit(1), mstart - 1))
            .cast("long").as("prefix_len"),
          length(col("text").substr(mstart, mlen))
            .cast("long").as("middle_len"),
          length(col("text").substr(mstart + mlen, len))
            .cast("long").as("suffix_len"),
          len.cast("long").as("total_len"))
        .orderBy("doc_id")
    },

    // ------------------------------------------- conversation assembly
    Q("q195_conversation_assembly",
      "Conversation/session assembly — the SFT-data-prep shape: an " +
        "event stream groups per user into an ORDERED turn sequence " +
        "(deterministic (ts, event_id) tie-break, no rand() and no " +
        "engine-dependent collect order — the list is sorted inside " +
        "the aggregate), with the assembly sanity metrics every chat-" +
        "data pipeline reports: turn count, role-switch count " +
        "(consecutive turns of the same type collapse in most chat " +
        "templates — switches is what matters), and wall-clock span. " +
        "Dataflow: ONE user-keyed shuffle serves both the lag window " +
        "and the assembly agg; per-user state is session-bounded, so " +
        "at 100 TB this partitions by the natural key with no global " +
        "sort — the canonical groupBy-key + in-group order shape.",
      Some("""
        WITH o AS (
          SELECT user_id, ts, event_id, event_type,
                 LAG(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev
          FROM events)
        SELECT user_id, COUNT(*)::BIGINT AS n_turns,
               COUNT(CASE WHEN prev IS NOT NULL AND prev <> event_type
                          THEN 1 END)::BIGINT AS n_switches,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS convo,
               date_diff('second', MIN(ts), MAX(ts))::BIGINT
                 AS span_seconds
        FROM o GROUP BY user_id ORDER BY user_id""")) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, dir)
        .withColumn("prev", lag("event_type", 1).over(w))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_turns"),
          count(when(col("prev").isNotNull &&
            col("prev") =!= col("event_type"), 1)).as("n_switches"),
          array_join(transform(array_sort(collect_list(
            struct(col("ts"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")), ">").as("convo"),
          (unix_timestamp(max("ts")) - unix_timestamp(min("ts")))
            .as("span_seconds"))
        .orderBy("user_id")
    },

    // --------------------------------------- token-budget data selection
    Q("q196_budget_selection",
      "Quality-ranked corpus selection under a TOKEN BUDGET — the " +
        "data-selection shape (take the best documents until the " +
        "training budget is spent): docs order by (score desc, doc_id) " +
        "and are admitted while the running token total stays within " +
        "60% of the corpus. The running sum over a GLOBAL order is the " +
        "scale hazard, so it runs two-phase (the q167 prefix-sum " +
        "shape) over a FIXED COUNT of doc_id range buckets (r14, r13 " +
        "verdict item 2 — the earlier fixed WIDTH of 500 made the " +
        "(score x bucket) totals grow linearly with the corpus, " +
        "re-creating the very unpartitioned-window hazard the shape " +
        "exists to remove): bucket = ((doc_id - min) * NB) div (range), " +
        "NB constant, so the offsets window input is |score domain| x " +
        "NB rows — INDEPENDENT of corpus size — and each per-(score, " +
        "bucket) window handles ~corpus/NB rows in its own task (pick " +
        "NB ~ cluster parallelism at 100 TB). Range buckets are " +
        "monotone in doc_id, so (score desc, b, doc_id) reproduces the " +
        "global order exactly. The stand-in score n_chars % 97 and " +
        "whitespace token counts keep every number integer-exact " +
        "cross-engine.",
      Some("""
        WITH d AS (
          SELECT doc_id, lang, COALESCE(n_chars % 97, -1) AS score,
                 len(string_split_regex(text, '\s+')) AS toks
          FROM documents),
        t AS (SELECT (SUM(toks) * 6) // 10 AS budget FROM d),
        c AS (SELECT *, SUM(toks) OVER (ORDER BY score DESC, doc_id
                ROWS UNBOUNDED PRECEDING) AS cum FROM d)
        SELECT lang, COUNT(*)::BIGINT AS n_docs,
               SUM(toks)::BIGINT AS toks_total,
               COUNT(CASE WHEN cum <= budget THEN 1 END)::BIGINT
                 AS n_selected,
               COALESCE(SUM(CASE WHEN cum <= budget THEN toks END),
                 0)::BIGINT AS toks_selected,
               MIN(CASE WHEN cum <= budget THEN score END) AS min_score
        FROM c, t GROUP BY lang ORDER BY lang""")) { (s, dir) =>
      val nBuckets = 1024
      // score is null-safe (COALESCE to -1, both engines): an inner
      // join on a NULL key would silently drop NULL-n_chars rows the
      // oracle keeps (r13 review finding)
      val d0 = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
        coalesce(col("n_chars") % 97, lit(-1L)).as("score"),
        size(toks(col("text"))).as("toks"))
      // doc_id bounds: a column-pruned scan of one BIGINT column (at
      // 100 TB this is parquet-footer work); integer `div` keeps the
      // bucket id exact at any id magnitude (no double rounding)
      val bounds = Tables.documents(s, dir)
        .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      val d = d0.crossJoin(broadcast(bounds))
        .withColumn("b",
          expr(s"((doc_id - lo) * $nBuckets) div (hi - lo + 1)"))
        .drop("lo", "hi")
      // phase 1: (score, bucket) totals; phase 2: exclusive offsets via
      // one window over the totals (bounded: |score domain| x buckets).
      // The budget derives from the SAME totals — no third corpus
      // tokenization pass (r13 review finding); the remaining two
      // passes (totals, probe) are the two-phase shape's intrinsic cost
      val st = d.groupBy("score", "b").agg(sum("toks").as("stoks"))
      val budget = st.agg(
        expr("(sum(stoks) * 6) div 10").as("budget"))
      val wSB = Window.orderBy(col("score").desc, col("b"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val off = st.select(col("score"), col("b"),
        coalesce(sum("stoks").over(wSB), lit(0L)).as("before"))
      val wD = Window.partitionBy("score", "b").orderBy("doc_id")
      d.join(broadcast(off), Seq("score", "b"))
        .withColumn("cum", col("before") + sum("toks").over(wD))
        .crossJoin(broadcast(budget))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("toks").as("toks_total"),
          count(when(col("cum") <= col("budget"), 1)).as("n_selected"),
          coalesce(sum(when(col("cum") <= col("budget"), col("toks"))),
            lit(0L)).as("toks_selected"),
          min(when(col("cum") <= col("budget"), col("score")))
            .as("min_score"))
        .orderBy("lang")
    },

    // ------------------------------------------------ text normalization
    Q("q198_text_normalize",
      "Whitespace/control-character normalization — the C4-style " +
        "cleanup pass that runs before tokenization (tabs, carriage " +
        "returns and newline litter become spaces; runs of spaces " +
        "collapse; edges trim). The corpus text is already clean, so " +
        "the gate INJECTS deterministic dirt first (doc_id-keyed: a " +
        "tab+space prefix and CR suffix, or every space tripled) and " +
        "proves the normalizer RECOVERS the original byte-for-byte — " +
        "n_recovered == n_docs is the self-proving invariant, checked " +
        "identically by both engines. All codegen'd built-ins " +
        "(regexp_replace chains), map-only, trivially 100 TB-parallel.",
      Some("""
        WITH dirty AS (
          SELECT doc_id, lang, text,
                 CASE WHEN doc_id % 3 = 0
                        THEN chr(9) || '  ' || text || chr(13)
                      WHEN doc_id % 3 = 1
                        THEN REPLACE(text, ' ', '   ')
                      ELSE text END AS d
          FROM documents),
        c AS (
          SELECT doc_id, lang, text, d,
                 TRIM(REGEXP_REPLACE(REGEXP_REPLACE(d,
                   '[\t\r\n]', ' ', 'g'), ' +', ' ', 'g')) AS clean
          FROM dirty)
        SELECT lang, COUNT(*)::BIGINT AS n_docs,
               SUM(LENGTH(d))::BIGINT AS dirty_chars,
               SUM(LENGTH(clean))::BIGINT AS clean_chars,
               COUNT(CASE WHEN clean = text THEN 1 END)::BIGINT
                 AS n_recovered
        FROM c GROUP BY lang ORDER BY lang""")) { (s, dir) =>
      val d = when(col("doc_id") % 3 === 0,
          concat(lit("\t  "), col("text"), lit("\r")))
        .when(col("doc_id") % 3 === 1,
          regexp_replace(col("text"), " ", "   "))
        .otherwise(col("text"))
      val clean = trim(regexp_replace(
        regexp_replace(col("d"), "[\t\r\n]", " "), " +", " "))
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("text"), d.as("d"))
        .withColumn("clean", clean)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("d"))).as("dirty_chars"),
          sum(length(col("clean"))).as("clean_chars"),
          count(when(col("clean") === col("text"), 1)).as("n_recovered"))
        .orderBy("lang")
    },

    // --------------------- DSIR-style importance-weighted data selection
    Q("q201_dsir_selection",
      "Data Selection via Importance Resampling (the DSIR recipe: " +
        "score raw documents by how target-domain-like their hashed " +
        "n-gram profile is, then select the best under a quota). " +
        "Features are hashed word unigrams + bigrams in 256 buckets " +
        "(hash28 % 256 — the cross-engine integer hash); the corpus " +
        "scan folds BOTH distributions at once (raw = every doc, " +
        "target = the src0 'curated' domain), add-one smoothed. " +
        "Per-bucket affinity is the likelihood ratio scaled to " +
        "integers — ((t_b+1)*R*10^4) div ((r_b+1)*T) — and a doc's " +
        "importance is the SUM of its grams' affinities: an " +
        "integer-exact surrogate for DSIR's log-ratio sum (monotone " +
        "per gram; the ranking changes only where log-vs-linear " +
        "weighting disagrees, and the decision stays bit-reproducible " +
        "across engines, which a float log-sum is not — the same " +
        "trade q79's integer alpha-sampling makes). Selection = " +
        "top-(N div 10) by (importance, doc_id) — deterministic, " +
        "rerun-stable. 100 TB shape: ONE gram-explode pass folds to " +
        "(doc, bucket) counts; the 256-row bucket table and the " +
        "importance scoring are both re-aggregations of that frame " +
        "(the broadcast ratio joins back on ≤ docs×256 rows, never a " +
        "second corpus scan), then distributed top-k (TakeOrdered, " +
        "never a global window). Long headroom: the widest " +
        "intermediate is " +
        "(t_b+1)*R*10^4, so the integer path is exact while " +
        "(max per-bucket target grams + 1) x (total raw grams R) " +
        "stays under ~9x10^14 — e.g. R ~ 10^9 grams with <= ~10^5 " +
        "target grams per bucket, or R ~ 10^11 with a ~10^3-gram " +
        "target profile; beyond that, the SAME two-scan plan runs the " +
        "256 ratio divisions in DECIMAL(38) (a 256-row change, not a " +
        "replan). " +
        "The output audits the selection per language: how many docs, " +
        "their importance mass, the cut line, and how many came from " +
        "the target domain itself (DSIR should up-select src0-like " +
        "text, not only src0).",
      Some(s"""
        WITH w AS (SELECT doc_id, lang, source,
                     list_filter(string_split_regex(text, '\\s+'),
                                 x -> x <> '') AS wd
                   FROM documents),
        g AS (SELECT doc_id, lang, source, gram
              FROM w, UNNEST(list_concat(wd,
                list_transform(range(CASE WHEN len(wd) >= 2
                                          THEN len(wd) - 1 ELSE 0 END),
                  i -> wd[i+1] || '_' || wd[i+2]))) AS t(gram)),
        b AS (SELECT doc_id, lang, source,
                     ${oHash28("gram")} % 256 AS b FROM g),
        agg AS (SELECT b, COUNT(*)::BIGINT AS r,
                       COUNT(CASE WHEN source = 'src0' THEN 1 END)::BIGINT
                         AS tb
                FROM b GROUP BY 1),
        tot AS (SELECT SUM(r)::BIGINT AS rt, SUM(tb)::BIGINT AS tt
                FROM agg),
        ratio AS (SELECT b, ((tb + 1) * rt * 10000) // ((r + 1) * tt)
                         AS sc
                  FROM agg, tot),
        imp AS (SELECT doc_id, ANY_VALUE(lang) AS lang,
                       ANY_VALUE(source) AS source,
                       SUM(sc)::BIGINT AS imp
                FROM b JOIN ratio USING (b) GROUP BY doc_id),
        quota AS (SELECT (COUNT(*) // 10)::BIGINT AS k FROM documents),
        sel AS (SELECT * FROM imp, quota
                QUALIFY ROW_NUMBER() OVER (ORDER BY imp DESC, doc_id) <= k)
        SELECT lang, COUNT(*)::BIGINT AS n_selected,
               SUM(imp)::BIGINT AS imp_sum,
               MIN(imp)::BIGINT AS imp_cut,
               COUNT(CASE WHEN source = 'src0' THEN 1 END)::BIGINT
                 AS n_from_target
        FROM sel GROUP BY lang ORDER BY lang""")) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val grams = docs
        .withColumn("wd", expr("filter(split(text, '\\\\s+'), x -> x <> '')"))
        .select(col("doc_id"), col("lang"), col("source"),
          explode(expr("concat(wd, IF(size(wd) < 2, " +
            "CAST(array() AS ARRAY<STRING>), " +
            "transform(sequence(1, size(wd) - 1), " +
            "i -> concat(element_at(wd, i), '_', element_at(wd, i + 1)))))"))
            .as("gram"))
        .withColumn("b", hash28(col("gram")) % 256)
      // (doc, bucket) gram counts FIRST: every downstream statistic is
      // a re-aggregation of this ≤ docs×256-row frame, so the corpus
      // tokenizes ONCE and the second "pass" never re-reads it (the
      // r20 shape exploded the grams twice — plan audit showed 3
      // documents scans, r21 optimization round; at 100 TB the scoring
      // pass was a second full corpus scan). lang/source join the keys
      // (functionally dependent on doc_id), replacing the first()
      // aggregates. Exact: sum over grams of sc(b) == sum over
      // (doc, b) of n·sc(b) — integers throughout, order-free.
      val docB = grams.groupBy(col("doc_id"), col("lang"), col("source"),
          col("b"))
        .agg(count(lit(1)).as("n"))
      // ONE aggregation folds raw and target bucket counts together
      val agg = docB.groupBy(col("b"))
        .agg(sum(col("n")).as("r"),
          sum(when(col("source") === "src0", col("n"))
            .otherwise(lit(0L))).as("tb"))
      val tot = agg.agg(sum("r").as("rt"), sum("tb").as("tt"))
      val ratio = agg.crossJoin(broadcast(tot)) // 256 rows x 1 row
        .withColumn("sc", expr("((tb + 1) * rt * 10000) div ((r + 1) * tt)"))
        .select("b", "sc")
      val imp = docB.join(broadcast(ratio), Seq("b"))
        .groupBy(col("doc_id"), col("lang"), col("source"))
        .agg(sum(col("n") * col("sc")).as("imp"))
      // bounded scalar collect: the quota is one number
      val k = (docs.count() / 10L).toInt
      imp.orderBy(col("imp").desc, col("doc_id").asc).limit(k)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_selected"),
          sum(col("imp")).as("imp_sum"),
          min(col("imp")).as("imp_cut"),
          cnt(col("source") === "src0").as("n_from_target"))
        .orderBy("lang")
    },

    // ------------------------- DPO/RLHF preference-pair assembly
    Q("q203_preference_pairs",
      "Preference-pair assembly for DPO/RLHF training: candidate " +
        "completions group under a prompt (prompt_id = doc_id div 8 — " +
        "the generation layout where n candidates are written " +
        "contiguously per prompt) and each group yields ONE " +
        "(chosen, rejected) pair: chosen = highest-reward candidate, " +
        "rejected = lowest, pairs with margin < 1000 dropped (ambiguous " +
        "preferences teach nothing and amplify reward noise). The " +
        "reward is a deterministic reward-model stand-in " +
        "(hash28(text||'|rm') % 10000, null text -> -1), same policy as " +
        "q196's stand-in score — the operator under test is the pair " +
        "assembly, not the scorer. Tie-breaks are exact on both " +
        "engines via a single packed BIGINT rank (reward*2^33 +/- " +
        "doc_id — ids stay far below 2^33; the q92 packed-rank trick), " +
        "so chosen/rejected are bit-deterministic even with duplicate " +
        "rewards. 100 TB shape: ONE keyed aggregation with map-side " +
        "partial max_by/min_by — no window, no self-join; prompt " +
        "groups are generation-batch-sized (n candidates), so no key " +
        "can skew.",
      Some(s"""
        WITH c AS (SELECT doc_id, doc_id // 8 AS prompt_id,
                     COALESCE(${oHash28("text || '|rm'")} % 10000, -1)
                       AS reward
                   FROM documents),
        p AS (SELECT prompt_id, COUNT(*)::BIGINT AS n_cands,
                     MAX(reward) AS chosen_reward,
                     MIN(reward) AS rejected_reward,
                     arg_max(doc_id,
                       reward * 8589934592 + (8589934591 - doc_id))
                       AS chosen_id,
                     arg_min(doc_id, reward * 8589934592 + doc_id)
                       AS rejected_id
              FROM c GROUP BY 1)
        SELECT prompt_id, n_cands, chosen_id, rejected_id,
               chosen_reward, rejected_reward,
               chosen_reward - rejected_reward AS margin
        FROM p WHERE chosen_reward - rejected_reward >= 1000
        ORDER BY prompt_id""")) { (s, dir) =>
      val c = Tables.documents(s, dir).select(col("doc_id"),
        expr("doc_id div 8").as("prompt_id"),
        coalesce(hash28(concat(col("text"), lit("|rm"))) % 10000,
          lit(-1L)).as("reward"))
      c.groupBy("prompt_id")
        .agg(count(lit(1)).as("n_cands"),
          max("reward").as("chosen_reward"),
          min("reward").as("rejected_reward"),
          expr("max_by(doc_id, reward * 8589934592 + (8589934591 - doc_id))")
            .as("chosen_id"),
          expr("min_by(doc_id, reward * 8589934592 + doc_id)")
            .as("rejected_id"))
        .filter(col("chosen_reward") - col("rejected_reward") >= 1000)
        .select(col("prompt_id"), col("n_cands"), col("chosen_id"),
          col("rejected_id"), col("chosen_reward"), col("rejected_reward"),
          (col("chosen_reward") - col("rejected_reward")).as("margin"))
        .orderBy("prompt_id")
    },

    // ------------------------------ RAG sliding-window chunking
    Q("q204_rag_chunking",
      "Retrieval-corpus chunking: every document splits into " +
        "overlapping 64-token windows with stride 48 (16-token " +
        "overlap — the RAG indexing default shape: overlap so no " +
        "answer span straddles a chunk boundary unseen). Emits one " +
        "row per chunk with its 1-based token offset, token count, " +
        "char length, and a 28-bit chunk fingerprint (the dedup/" +
        "index key downstream chunk-level dedup and ANN upsert both " +
        "consume). Empty documents chunk to nothing; the final " +
        "partial window is kept (>= W-S+1 = 17 tokens by " +
        "construction). All arithmetic is integer (chunk count = " +
        "1 + ceil((n-W)/S) in integer div), the fingerprint is the " +
        "cross-engine hash28, so every row is bit-exact vs the " +
        "oracle. 100 TB shape: pure map-only explode — tokenize, " +
        "per-doc bounded sequence, slice — no shuffle at all before " +
        "the sink sort; chunk fan-out is corpus-linear with a " +
        "per-doc bound, the same posture as q177's corpus encode.",
      Some(s"""
        WITH d AS (SELECT doc_id,
                     list_filter(string_split_regex(COALESCE(text, ''),
                                                    '\\s+'),
                                 x -> x <> '') AS wd
                   FROM documents),
        n AS (SELECT doc_id, wd, len(wd) AS n FROM d),
        c AS (SELECT doc_id, wd, n,
                     CASE WHEN n = 0 THEN 0 WHEN n <= 64 THEN 1
                          ELSE 1 + (n - 64 + 47) // 48 END AS nc
              FROM n),
        x AS (SELECT doc_id, wd, n, i
              FROM c, UNNEST(range(nc)) AS t(i)),
        ch AS (SELECT doc_id, i AS chunk_idx, 1 + i * 48 AS start_tok, n,
                      array_to_string(
                        list_slice(wd, 1 + i * 48, i * 48 + 64), ' ')
                        AS cht
               FROM x)
        SELECT doc_id, chunk_idx::BIGINT AS chunk_idx,
               start_tok::BIGINT AS start_tok,
               LEAST(64, n - start_tok + 1)::BIGINT AS n_tok,
               ${oHash28("cht")} AS fp,
               length(cht)::BIGINT AS n_chars_chunk
        FROM ch ORDER BY doc_id, chunk_idx""")) { (s, dir) =>
      val W = 64; val S = 48
      Tables.documents(s, dir)
        .withColumn("wd",
          expr("filter(split(coalesce(text, ''), '\\\\s+'), x -> x <> '')"))
        .withColumn("n", size(col("wd")))
        .withColumn("nc",
          expr(s"CASE WHEN n = 0 THEN 0 WHEN n <= $W THEN 1 " +
            s"ELSE 1 + (n - $W + ${S - 1}) div $S END"))
        // sequence(0, -1) would DESCEND in Spark — guard the empty case
        .withColumn("i", explode(when(col("nc") > 0,
          sequence(lit(0), col("nc") - 1))
          .otherwise(array().cast("array<int>"))))
        .withColumn("start_tok", lit(1) + col("i") * S)
        .withColumn("cht",
          concat_ws(" ", slice(col("wd"), col("start_tok"), lit(W))))
        .select(col("doc_id"),
          col("i").cast("long").as("chunk_idx"),
          col("start_tok").cast("long").as("start_tok"),
          least(lit(W), col("n") - col("start_tok") + 1).cast("long")
            .as("n_tok"),
          hash28(col("cht")).as("fp"),
          length(col("cht")).cast("long").as("n_chars_chunk"))
        .orderBy("doc_id", "chunk_idx")
    },

    // ------------------------------- curriculum phase schedule
    Q("q205_curriculum_phases",
      "Curriculum schedule audit: rank the corpus by a difficulty " +
        "proxy (chars-per-token x100 — longer average words correlate " +
        "with rarer vocabulary; integer-exact, deterministic) and cut " +
        "it into 8 equal-width RANGE phases from easy to hard, " +
        "reporting per phase: doc count, token mass, running " +
        "token total (the number a curriculum scheduler feeds its " +
        "phase boundaries from), and the difficulty envelope. The " +
        "range bucketing is the q196 shape: bounds come from ONE " +
        "metadata-sized min/max aggregate broadcast back (never a " +
        "collect of data), phase = ((d - lo) * 8) div (hi - lo + 1) " +
        "— right-open bins, degenerate lo == hi domain collapses to " +
        "phase 0 on both engines. 100 TB shape: two scans (bounds + " +
        "phase agg) and one 8-row window for the running total — the " +
        "only window input is the PHASE table, constant-sized by " +
        "construction, never the corpus.",
      Some("""
        WITH d AS (SELECT doc_id,
                     COALESCE(n_chars, 0) AS nch,
                     GREATEST(len(list_filter(
                       string_split_regex(COALESCE(text, ''), '\s+'),
                       x -> x <> '')), 1) AS ntok
                   FROM documents),
        s AS (SELECT doc_id, ntok, (nch * 100) // ntok AS diff FROM d),
        b AS (SELECT MIN(diff) AS lo, MAX(diff) AS hi FROM s),
        p AS (SELECT ((diff - lo) * 8) // (hi - lo + 1) AS phase,
                     ntok, diff
              FROM s, b),
        g AS (SELECT phase, COUNT(*)::BIGINT AS n_docs,
                     SUM(ntok)::BIGINT AS tok_sum,
                     MIN(diff) AS diff_lo, MAX(diff) AS diff_hi
              FROM p GROUP BY 1)
        SELECT phase, n_docs, tok_sum,
               SUM(tok_sum) OVER (ORDER BY phase
                 ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tok,
               diff_lo, diff_hi
        FROM g ORDER BY phase""")) { (s, dir) =>
      val sc = Tables.documents(s, dir).select(col("doc_id"),
        expr("(coalesce(n_chars, 0) * 100) div greatest(size(filter(" +
          "split(coalesce(text, ''), '\\\\s+'), x -> x <> '')), 1)")
          .as("diff"),
        greatest(size(expr(
          "filter(split(coalesce(text, ''), '\\\\s+'), x -> x <> '')")),
          lit(1)).as("ntok"))
      val bounds = sc.agg(min("diff").as("lo"), max("diff").as("hi"))
      val g = sc.crossJoin(broadcast(bounds))
        .withColumn("phase", expr("((diff - lo) * 8) div (hi - lo + 1)"))
        .groupBy("phase")
        .agg(count(lit(1)).as("n_docs"),
          sum("ntok").as("tok_sum"),
          min("diff").as("diff_lo"),
          max("diff").as("diff_hi"))
      // 8-row window: input is the phase table, constant-sized
      val w = Window.orderBy("phase")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.withColumn("cum_tok", sum("tok_sum").over(w))
        .select(col("phase"), col("n_docs"), col("tok_sum"),
          col("cum_tok"), col("diff_lo"), col("diff_hi"))
        .orderBy("phase")
    },

    // ---------------------- interleaved image-text sequence assembly
    Q("q209_interleaved_assembly",
      "VLM training-sequence assembly (the MMC4/OBELICS interleaved " +
        "shape): each document becomes one SEQUENCE of text chunks " +
        "and image placeholders under a token budget. Deterministic " +
        "recipe both engines replay bit-for-bit: text splits into " +
        "32-token chunks (cost = actual tokens); the document owns " +
        "doc_id % 3 images at 64 tokens each; one image interleaves " +
        "after every 2nd chunk while images remain, leftovers append " +
        "at the tail; the sequence truncates at the first segment " +
        "whose RUNNING cost would exceed 256. Output per doc: the " +
        "layout string ('TTITTI...' — the interleaving proof), kept " +
        "text/image counts, and the packed cost. The running cut is " +
        "a per-doc array fold — NO window, NO shuffle: at 100 TB " +
        "sequence assembly is a pure map over documents (the q204 " +
        "posture), and the per-doc segment list is budget-bounded, " +
        "so the fold is O(chunks^2) on a <=20-element array, not a " +
        "corpus-sized anything.",
      Some("""
        WITH d AS (SELECT doc_id,
                     len(list_filter(string_split_regex(
                       COALESCE(text, ''), '\s+'), x -> x <> '')) AS n,
                     doc_id % 3 AS k
                   FROM documents),
        c AS (SELECT doc_id, n, k,
                     CASE WHEN n = 0 THEN 0 ELSE (n + 31) // 32 END AS nc
              FROM d),
        s1 AS (SELECT doc_id, n, k, nc,
                      flatten(list_transform(range(nc), i ->
                        CASE WHEN ((i+1) % 2 = 0 AND (i+1) // 2 <= k)
                          THEN [least(32, n - 32*i), -64]
                          ELSE [least(32, n - 32*i)] END)) AS body
               FROM c),
        s2 AS (SELECT doc_id,
                      list_concat(body, list_transform(
                        range(greatest(k - least(k, nc // 2), 0)),
                        x -> -64)) AS segs
               FROM s1),
        kp AS (SELECT doc_id, segs,
                      list_filter(range(len(segs)), j ->
                        list_sum(list_transform(
                          list_slice(segs, 1, j + 1),
                          s -> abs(s))) <= 256) AS kept
               FROM s2)
        SELECT doc_id,
               array_to_string(list_transform(kept, j ->
                 CASE WHEN segs[j+1] > 0 THEN 'T' ELSE 'I' END), '')
                 AS layout,
               len(list_filter(kept, j -> segs[j+1] > 0))::BIGINT
                 AS n_text,
               len(list_filter(kept, j -> segs[j+1] < 0))::BIGINT
                 AS n_img,
               COALESCE(list_sum(list_transform(kept,
                 j -> abs(segs[j+1]))), 0)::BIGINT AS cost
        FROM kp ORDER BY doc_id""")) { (s, dir) =>
      Tables.documents(s, dir)
        .withColumn("n", expr("size(filter(split(coalesce(text, ''), " +
          "'\\\\s+'), x -> x <> ''))"))
        .withColumn("k", col("doc_id") % 3)
        .withColumn("nc",
          expr("CASE WHEN n = 0 THEN 0 ELSE (n + 31) div 32 END"))
        .withColumn("body", expr(
          "flatten(transform(" +
            "CASE WHEN nc > 0 THEN sequence(0, nc - 1) " +
            "ELSE CAST(array() AS array<int>) END, i -> " +
            "CASE WHEN ((i+1) % 2 = 0 AND (i+1) div 2 <= k) " +
            "THEN array(least(32L, n - 32L*i), -64L) " +
            "ELSE array(least(32L, n - 32L*i)) END))"))
        .withColumn("segs", expr(
          "concat(body, CASE WHEN k - least(k, nc div 2) > 0 " +
            "THEN transform(sequence(1, " +
            "cast(k - least(k, nc div 2) AS INT)), x -> -64L) " +
            "ELSE CAST(array() AS array<bigint>) END)"))
        .withColumn("kept", expr(
          // sequence(0, -1) descends in Spark — guard the empty case
          "filter(CASE WHEN size(segs) > 0 " +
            "THEN sequence(0, size(segs) - 1) " +
            "ELSE CAST(array() AS array<int>) END, j -> " +
            "aggregate(slice(segs, 1, j + 1), 0L, " +
            "(a, s) -> a + abs(s)) <= 256L)"))
        .select(col("doc_id"),
          expr("concat_ws('', transform(kept, j -> " +
            "CASE WHEN element_at(segs, j+1) > 0 " +
            "THEN 'T' ELSE 'I' END))").as("layout"),
          expr("cast(size(filter(kept, j -> " +
            "element_at(segs, j+1) > 0)) AS BIGINT)").as("n_text"),
          expr("cast(size(filter(kept, j -> " +
            "element_at(segs, j+1) < 0)) AS BIGINT)").as("n_img"),
          expr("cast(coalesce(aggregate(kept, 0L, (a, j) -> " +
            "a + abs(element_at(segs, j+1))), 0L) AS BIGINT)")
            .as("cost"))
        .orderBy("doc_id")
    }
  )
}
