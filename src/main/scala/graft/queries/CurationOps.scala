package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import H._

/** Corpus-curation operators round 2: repeated-paragraph removal, markup
  * stripping, and the Gopher quality-rule bundle — the remaining staples of
  * a web-scale LLM training-data pipeline (CCNet / RefinedWeb / Gopher).
  *
  * Same 100 TB design rules as [[LlmOps]] / [[CorpusOps]]: one shuffle on a
  * content hash where cross-doc state is needed, pure codegen'd projections
  * everywhere else, integer-exact arithmetic the DuckDB oracle reproduces
  * bit-for-bit, no UDFs, no collects.
  */
object CurationOps {

  /** Paragraph stand-in geometry (the corpus has no newlines): contiguous
    * non-overlapping 20-token blocks, final partial block kept. At 100 TB
    * the block boundary is the real '\n\n' split; the pipeline shape —
    * explode units, one shuffle on the unit hash, reassemble in order —
    * is identical. */
  private val PAR_W = 20

  val all: Seq[Q] = Seq(

    // ------------------------------------- robust outlier gate (median/MAD)
    Q("q103_mad_outliers",
      "Robust per-language length-outlier detection via median absolute " +
        "deviation — the quality gate that, unlike mean/stddev z-scores, " +
        "a few giant documents cannot drag. All order statistics run in " +
        "SCALED INTEGERS so the outlier decision is engine-exact: " +
        "2×median of BIGINTs is always integral (sum of the two middle " +
        "values), so m2 = round(2·p50(n_chars)) and mad4 = " +
        "round(2·p50(|2·n_chars − m2|)) are exact BIGINTs, and the " +
        "classic |x−med| > 3·MAD test becomes the integer comparison " +
        "2·adev2 > 3·mad4 — no float boundary can flip a verdict " +
        "between engines. Two corpus passes + two 5-row broadcasts " +
        "join the thresholds back. 100 TB: exact medians buffer group " +
        "values (the q23b caveat); production swaps approx_percentile " +
        "sketches and keeps the identical integer decision rule.",
      Some("""
        WITH d AS (SELECT lang, n_chars FROM documents),
        m AS (SELECT lang,
                     CAST(ROUND(2*quantile_cont(n_chars, 0.5)) AS BIGINT) AS m2
              FROM d GROUP BY 1),
        dev AS (SELECT d.lang, ABS(2*d.n_chars - m.m2) AS adev2, m.m2
                FROM d JOIN m USING (lang)),
        md AS (SELECT lang,
                      CAST(ROUND(2*quantile_cont(adev2, 0.5)) AS BIGINT) AS mad4
               FROM dev GROUP BY 1)
        SELECT dev.lang, COUNT(*) AS n,
               COUNT(CASE WHEN 2*adev2 > 3*mad4 THEN 1 END) AS n_outliers,
               ROUND(CAST(MIN(m2) AS DOUBLE)/2, 1) AS median_chars,
               ROUND(CAST(MIN(mad4) AS DOUBLE)/4, 2) AS mad_chars
        FROM dev JOIN md USING (lang)
        GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val d = Tables.documents(s, dir).select(col("lang"), col("n_chars"))
      val m = d.groupBy("lang")
        .agg(round(expr("2*percentile(n_chars, 0.5D)")).cast("long").as("m2"))
      val dev = d.join(broadcast(m), "lang")
        .withColumn("adev2", abs(col("n_chars") * 2 - col("m2")))
      val md = dev.groupBy("lang")
        .agg(round(expr("2*percentile(adev2, 0.5D)")).cast("long").as("mad4"))
      dev.join(broadcast(md), "lang")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          cnt(col("adev2") * 2 > col("mad4") * 3).as("n_outliers"),
          round(min(col("m2")).cast("double") / 2, 1).as("median_chars"),
          round(min(col("mad4")).cast("double") / 4, 2).as("mad_chars"))
        .orderBy("lang")
    },

    // ------------------------------------------- repeated-paragraph removal
    Q("q67_paragraph_dedup",
      "Corpus-level repeated-paragraph removal (the CCNet/RefinedWeb " +
        "pre-dedup pass): explode docs into paragraph blocks, one shuffle " +
        "on md5(block) to find each block's first-occurrence doc, drop " +
        "every later occurrence (cross-doc AND within-doc), reassemble " +
        "surviving blocks in document order. Output proves byte-exact " +
        "reassembly via sha256 of the cleaned text. Docs whose every " +
        "block is seen earlier come out empty — that is the dedup " +
        "actually removing documents.",
      Some(s"""
        WITH t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM documents),
        b AS (SELECT doc_id, unnest(range((len(w)-1) // $PAR_W + 1)) AS k, w FROM t),
        blk AS (SELECT doc_id, k,
                       array_to_string(list_slice(w, (k*$PAR_W + 1)::INT, (k*$PAR_W + $PAR_W)::INT), ' ') AS btext
                FROM b),
        h AS (SELECT doc_id, k, btext, md5(btext) AS bh FROM blk),
        firsts AS (SELECT bh, MIN(doc_id) AS first_doc FROM h GROUP BY 1),
        firstk AS (SELECT bh, doc_id, MIN(k) AS first_k FROM h GROUP BY 1, 2),
        kept AS (SELECT h.doc_id, h.k, h.btext
                 FROM h JOIN firsts USING (bh) JOIN firstk ON firstk.bh = h.bh AND firstk.doc_id = h.doc_id
                 WHERE h.doc_id = firsts.first_doc AND h.k = firstk.first_k),
        tot AS (SELECT doc_id, COUNT(*) AS n_blocks FROM h GROUP BY 1),
        ka AS (SELECT doc_id, COUNT(*) AS n_kept,
                      string_agg(btext, ' ' ORDER BY k) AS clean
               FROM kept GROUP BY 1)
        SELECT tot.doc_id, tot.n_blocks,
               COALESCE(ka.n_kept, 0) AS n_kept,
               (tot.n_blocks - COALESCE(ka.n_kept, 0)) AS n_removed,
               sha256(COALESCE(ka.clean, '')) AS clean_hash
        FROM tot LEFT JOIN ka USING (doc_id) ORDER BY doc_id""")) { (s, dir) =>
      val blocks = Tables.documents(s, dir)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), toks(col("text")).as("w"))
        .select(col("doc_id"), explode(transform(
          sequence(lit(0), floor((size(col("w")) - 1) / PAR_W).cast("int")),
          k => struct(k.cast("long").as("k"),
            array_join(slice(col("w"), k * PAR_W + 1, lit(PAR_W)), " ").as("btext")))).as("b"))
        .select(col("doc_id"), col("b.k"), col("b.btext"), md5(col("b.btext")).as("bh"))
        // shared exchange: the first-occurrence agg and the join reuse it —
        // at 100 TB this one hash shuffle on the block hash IS the operator
        .repartition(col("bh"))
      // a block instance survives iff its doc is the hash's first doc AND
      // its position is that doc's first occurrence of the hash
      val firsts = blocks.groupBy("bh").agg(min(col("doc_id")).as("first_doc"))
      val firstK = blocks.groupBy("bh", "doc_id").agg(min(col("k")).as("first_k"))
      val kept = blocks
        .join(firsts, "bh").join(firstK, Seq("bh", "doc_id"))
        .filter(col("doc_id") === col("first_doc") && col("k") === col("first_k"))
      val tot = blocks.groupBy("doc_id").agg(count(lit(1)).as("n_blocks"))
      val ka = kept.groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          array_join(transform(
            array_sort(collect_list(struct(col("k"), col("btext")))),
            e => e.getField("btext")), " ").as("clean"))
      tot.join(ka, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_blocks"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          (col("n_blocks") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
          sha2(coalesce(col("clean"), lit("")), 256).as("clean_hash"))
        .orderBy("doc_id")
    },

    // ----------------------------------------------------- markup stripping
    Q("q68_markup_strip",
      "HTML/boilerplate stripping: drop <script>/<style> blocks wholesale, " +
        "strip remaining tags and comments, decode the common entities, " +
        "collapse whitespace — the extraction step between a WARC crawl " +
        "and every text operator upstream. A pure codegen'd " +
        "regexp-replace chain (patterns in the RE2∩Java dialect so both " +
        "engines execute the same automaton), no shuffle: at 100 TB this " +
        "is a map-only stage pinned to the scan. The corpus is plain " +
        "text, so a deterministic per-doc HTML wrapper is synthesized " +
        "first; the operator under test is the strip chain, proven " +
        "byte-exact via sha256 against the original text.",
      Some("""
        WITH raw AS (SELECT doc_id, text,
               '<html><head><title>Doc ' || doc_id ||
               '</title><style>p{margin:0}</style></head><body><h1>&quot;T&amp;C&quot;</h1><p>' ||
               text || '</p><script>var id=' || doc_id ||
               ';</script><!-- crawled --></body></html>' AS html
             FROM documents),
        s1 AS (SELECT doc_id, text, length(html) AS html_len,
                      regexp_replace(regexp_replace(html,
                        '<script[^>]*>[^<]*</script>', ' ', 'g'),
                        '<style[^>]*>[^<]*</style>', ' ', 'g') AS x
               FROM raw),
        s2 AS (SELECT doc_id, text, html_len,
                      regexp_replace(regexp_replace(x, '<!--[^>]*-->', ' ', 'g'),
                                     '<[^>]+>', ' ', 'g') AS x
               FROM s1),
        s3 AS (SELECT doc_id, text, html_len,
                      replace(replace(replace(replace(x,
                        '&quot;', '"'), '&lt;', '<'), '&gt;', '>'), '&amp;', '&') AS x
               FROM s2),
        c AS (SELECT doc_id, text, html_len,
                     trim(regexp_replace(x, '\s+', ' ', 'g')) AS clean
              FROM s3)
        SELECT doc_id, html_len::BIGINT AS html_len, length(clean)::BIGINT AS clean_len,
               sha256(clean) AS clean_hash,
               (clean = 'Doc ' || doc_id || ' "T&C" ' || text) AS roundtrip_ok
        FROM c ORDER BY doc_id""")) { (s, dir) =>
      val html = concat(
        lit("<html><head><title>Doc "), col("doc_id"),
        lit("</title><style>p{margin:0}</style></head><body><h1>&quot;T&amp;C&quot;</h1><p>"),
        col("text"), lit("</p><script>var id="), col("doc_id"),
        lit(";</script><!-- crawled --></body></html>"))
      // tag contents carry no '<', so [^<]* matches them without the
      // (dialect-divergent) non-greedy dot; each stage binds through a
      // projection to keep the chain readable in the plan
      val s1 = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), html.as("html"))
        .select(col("doc_id"), col("text"), length(col("html")).as("html_len"),
          regexp_replace(regexp_replace(col("html"),
            "<script[^>]*>[^<]*</script>", " "),
            "<style[^>]*>[^<]*</style>", " ").as("x"))
      val s2 = s1.select(col("doc_id"), col("text"), col("html_len"),
        regexp_replace(regexp_replace(col("x"), "<!--[^>]*-->", " "),
          "<[^>]+>", " ").as("x"))
      // &amp; decodes LAST: doing it earlier turns escaped literals like
      // '&amp;lt;' into '&lt;' and then wrongly into '<'
      val s3 = s2.select(col("doc_id"), col("text"), col("html_len"),
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(col("x"),
          "&quot;", "\""), "&lt;", "<"), "&gt;", ">"), "&amp;", "&").as("x"))
      s3.select(col("doc_id"), col("text"), col("html_len"),
          trim(regexp_replace(col("x"), "\\s+", " ")).as("clean"))
        .select(col("doc_id"), col("html_len").cast("long").as("html_len"),
          length(col("clean")).cast("long").as("clean_len"),
          sha2(col("clean"), 256).as("clean_hash"),
          // the <title> text survives tag-stripping (it is content, not
          // markup); script/style BODIES are removed with their blocks
          (col("clean") === concat(lit("Doc "), col("doc_id"),
            lit(" \"T&C\" "), col("text"))).as("roundtrip_ok"))
        .orderBy("doc_id")
    },

    // ------------------------------------------------- Gopher quality rules
    Q("q69_gopher_rules",
      "The Gopher quality-filter bundle: word-count bounds, mean-word-" +
        "length bounds, alphabetic-word fraction, and stopword presence, " +
        "each an independent boolean plus the conjunctive keep decision. " +
        "Every threshold compares SCALED INTEGERS (5*n_alpha >= 4*n, not " +
        "n_alpha/n >= 0.8) so no float boundary case can disagree across " +
        "engines; the reported ratios are display-only. Pure per-row " +
        "projection over one bound token array — map-only at any scale.",
      Some("""
        WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS w,
                          length(text) AS nc
                   FROM documents),
        m AS (SELECT doc_id,
                     len(w)::BIGINT AS n_words,
                     (nc - len(w) + 1)::BIGINT AS n_wchars,
                     len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))::BIGINT AS n_alpha,
                     len(list_intersect(w, ['the','be','to','of','and','that','have','with']))::BIGINT AS n_stop
              FROM t)
        SELECT doc_id, n_words,
               ROUND(n_wchars::DOUBLE / n_words, 4) AS mean_word_len,
               ROUND(n_alpha::DOUBLE / n_words, 4) AS alpha_frac,
               n_stop,
               (n_words BETWEEN 50 AND 100000) AS ok_count,
               (3 * n_words <= n_wchars AND n_wchars <= 10 * n_words) AS ok_word_len,
               (5 * n_alpha >= 4 * n_words) AS ok_alpha,
               (n_stop >= 2) AS ok_stop,
               ((n_words BETWEEN 50 AND 100000)
                 AND 3 * n_words <= n_wchars AND n_wchars <= 10 * n_words
                 AND 5 * n_alpha >= 4 * n_words
                 AND n_stop >= 2) AS keep
        FROM m ORDER BY doc_id""")) { (s, dir) =>
      val stop = array(Seq("the", "be", "to", "of", "and", "that", "have", "with")
        .map(lit): _*)
      val m = Tables.documents(s, dir)
        .select(col("doc_id"), toks(col("text")).as("w"),
          length(col("text")).as("nc"))
        .select(col("doc_id"),
          size(col("w")).cast("long").as("n_words"),
          // single-space text: word chars = len(text) - (n-1) separators
          (col("nc") - size(col("w")) + 1).cast("long").as("n_wchars"),
          size(filter(col("w"), x => x.rlike("[A-Za-z]"))).cast("long").as("n_alpha"),
          size(array_intersect(col("w"), stop)).cast("long").as("n_stop"))
      val okCount = col("n_words").between(50, 100000)
      val okWordLen = (lit(3) * col("n_words") <= col("n_wchars")) &&
        (col("n_wchars") <= lit(10) * col("n_words"))
      val okAlpha = lit(5) * col("n_alpha") >= lit(4) * col("n_words")
      val okStop = col("n_stop") >= 2
      m.select(col("doc_id"), col("n_words"),
          round(col("n_wchars").cast("double") / col("n_words"), 4).as("mean_word_len"),
          round(col("n_alpha").cast("double") / col("n_words"), 4).as("alpha_frac"),
          col("n_stop"),
          okCount.as("ok_count"), okWordLen.as("ok_word_len"),
          okAlpha.as("ok_alpha"), okStop.as("ok_stop"),
          (okCount && okWordLen && okAlpha && okStop).as("keep"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------- equi-depth histogram
    Q("q74_equidepth_histogram",
      "Equi-depth histogram construction over document length — the " +
        "ANALYZE-stats / range-partition-planning primitive (Spark's own " +
        "RangePartitioner approximates exactly this by sampling; here " +
        "the cuts are exact and deterministic). One hash-agg collapses " +
        "the corpus to its distinct lengths with counts — bounded by the " +
        "value domain, NOT the corpus size, so the cumulative-rank " +
        "window runs over a provably tiny table. A value's bucket is " +
        "floor(first_rank * 8 / N): every row of one value lands in one " +
        "bucket, heavy values spill their bucket rather than split.",
      Some("""
        WITH c AS (SELECT n_chars AS v, COUNT(*) AS cnt FROM documents GROUP BY 1),
        n AS (SELECT SUM(cnt)::BIGINT AS total FROM c),
        cum AS (SELECT v, cnt,
                       SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - cnt AS first_rank
                FROM c)
        SELECT ((first_rank * 8) // total)::BIGINT AS bucket,
               SUM(cnt)::BIGINT AS n_rows,
               COUNT(*) AS n_distinct,
               MIN(v) AS lo, MAX(v) AS hi
        FROM cum, n GROUP BY 1 ORDER BY 1""")) { (s, dir) =>
      val c = Tables.documents(s, dir)
        .groupBy(col("n_chars").as("v")).agg(count(lit(1)).as("cnt"))
      val n = c.agg(sum(col("cnt")).as("total"))
      // single-partition window is SAFE here: its input is the distinct
      // value table (bounded by the length domain), not the corpus
      val w = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)
      c.withColumn("first_rank", sum(col("cnt")).over(w) - col("cnt"))
        .crossJoin(broadcast(n))
        .groupBy(floor(col("first_rank") * 8 / col("total")).as("bucket"))
        .agg(sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_distinct"),
          min(col("v")).as("lo"), max(col("v")).as("hi"))
        .orderBy("bucket")
    },

    // ------------------------------------- temperature-weighted resampling
    Q("q79_temperature_mix",
      "Temperature-based language rebalancing (the mC4/XLM-R α-sampling " +
        "step, α=0.5): per-language weights w_l = floor(sqrt(c_l·10^6)) " +
        "give low-resource languages a boosted share p_l = w_l/Σw; each " +
        "doc is kept iff hash28(doc_id) mod 10^6 < min(10^6, " +
        "(w_l·T·10^6) div (Σw·c_l)) for a half-corpus target T. The " +
        "whole decision is INTEGER arithmetic (integer sqrt, integer " +
        "div) — no float sum ever crosses the engine boundary, so " +
        "sampling is bit-reproducible; the picked set is stable under " +
        "re-runs and cluster size (hash-derived, not random()). Shape: " +
        "one tiny per-lang agg broadcast back over the corpus — a " +
        "map-only keep decision at any scale. The division is staged " +
        "((w·10^6 div Σw, ≤10^6) before ·T div c) so the largest " +
        "intermediate is 10^6·T: long headroom to ~1.8·10^13 docs; " +
        "beyond that the same plan runs in DECIMAL(38).",
      Some(s"""
        WITH c AS (SELECT lang, COUNT(*)::BIGINT AS n_docs FROM documents GROUP BY 1),
        w AS (SELECT lang, n_docs,
                     floor(sqrt((n_docs * 1000000)::DOUBLE))::BIGINT AS wgt
              FROM c),
        tot AS (SELECT SUM(n_docs)::BIGINT AS n, SUM(wgt)::BIGINT AS sw FROM w),
        r AS (SELECT lang, n_docs, wgt,
                     LEAST(1000000, ((wgt * 1000000) // sw) * (n // 2) // n_docs)
                       AS accept_ppm
              FROM w, tot)
        SELECT d.lang, ANY_VALUE(r.n_docs) AS n_docs,
               ANY_VALUE(r.wgt) AS weight,
               ANY_VALUE(r.accept_ppm) AS accept_ppm,
               ${oCnt(s"${oHash28("d.doc_id::VARCHAR")} % 1000000 < r.accept_ppm")}
                 AS n_sampled
        FROM documents d JOIN r USING (lang)
        GROUP BY d.lang ORDER BY d.lang""")) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val c = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
        .withColumn("wgt",
          floor(sqrt((col("n_docs") * 1000000L).cast("double"))).cast("long"))
      val tot = c.agg(sum(col("n_docs")).as("n"), sum(col("wgt")).as("sw"))
      val rates = c.crossJoin(broadcast(tot))
        .withColumn("accept_ppm",
          least(lit(1000000L),
            expr("((wgt * 1000000) div sw) * (n div 2) div n_docs")))
        .select(col("lang"), col("n_docs"), col("wgt"), col("accept_ppm"))
      docs.join(broadcast(rates), Seq("lang")) // bounded: one row per language
        .groupBy(col("lang"))
        .agg(first(col("n_docs")).as("n_docs"),
          first(col("wgt")).as("weight"),
          first(col("accept_ppm")).as("accept_ppm"),
          cnt(hash28(col("doc_id").cast("string")) % 1000000L < col("accept_ppm"))
            .as("n_sampled"))
        .orderBy("lang")
    },

    // ------------------------------------------ composed curation pipeline
    Q("q94_curation_pipeline",
      "The curation pipeline COMPOSED end-to-end as one lazy plan — " +
        "exact dedup (min-id per sha256) → integer quality gate (length " +
        "band + min word count) → α=0.5 temperature rebalance computed " +
        "on the POST-FILTER language mix (the order production " +
        "pipelines use: dedup before quality before sampling, rates " +
        "from the surviving distribution). Per-language funnel counts " +
        "audit every stage. One content-hash shuffle + one id join + " +
        "map-only filters + one tiny rate broadcast — composing the " +
        "stages adds NO new shuffle class, which is the point: the " +
        "operators chain lazily into a single Catalyst plan, not a " +
        "materialize-per-stage workflow.",
      Some(s"""
        WITH keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY sha256(text)),
        d AS (SELECT doc.* FROM documents doc JOIN keep USING (doc_id)),
        q AS (SELECT * FROM d
              WHERE n_chars BETWEEN 10 AND 5000
                AND len(string_split_regex(text, '\\s+')) >= 5),
        c AS (SELECT lang, COUNT(*)::BIGINT AS n_docs FROM q GROUP BY 1),
        w AS (SELECT lang, n_docs,
                     floor(sqrt((n_docs * 1000000)::DOUBLE))::BIGINT AS wgt
              FROM c),
        tot AS (SELECT SUM(n_docs)::BIGINT AS n, SUM(wgt)::BIGINT AS sw FROM w),
        r AS (SELECT lang, n_docs, wgt,
                     LEAST(1000000, ((wgt * 1000000) // sw) * (n // 2) // n_docs)
                       AS accept_ppm
              FROM w, tot),
        raw AS (SELECT lang, COUNT(*) AS n_raw FROM documents GROUP BY 1),
        ded AS (SELECT lang, COUNT(*) AS n_dedup FROM d GROUP BY 1)
        SELECT q.lang, ANY_VALUE(raw.n_raw) AS n_raw,
               ANY_VALUE(ded.n_dedup) AS n_dedup,
               ANY_VALUE(r.n_docs) AS n_quality,
               ANY_VALUE(r.accept_ppm) AS accept_ppm,
               ${oCnt(s"${oHash28("q.doc_id::VARCHAR")} % 1000000 < r.accept_ppm")}
                 AS n_sampled
        FROM q JOIN r USING (lang) JOIN raw USING (lang) JOIN ded USING (lang)
        GROUP BY q.lang ORDER BY q.lang""")) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val keep = docs.groupBy(sha2(col("text"), 256)).agg(min("doc_id").as("doc_id"))
        .select("doc_id")
      val d = docs.join(keep, "doc_id")
      val q = d.filter(col("n_chars").between(10, 5000) &&
        size(toks(col("text"))) >= 5)
      val c = q.groupBy("lang").agg(count(lit(1)).as("n_docs"))
        .withColumn("wgt",
          floor(sqrt((col("n_docs") * 1000000L).cast("double"))).cast("long"))
      val tot = c.agg(sum("n_docs").as("n"), sum("wgt").as("sw"))
      val rates = c.crossJoin(broadcast(tot))
        .withColumn("accept_ppm",
          least(lit(1000000L),
            expr("((wgt * 1000000) div sw) * (n div 2) div n_docs")))
        .select(col("lang"), col("n_docs").as("n_quality"), col("accept_ppm"))
      val raw = docs.groupBy("lang").agg(count(lit(1)).as("n_raw"))
      val ded = d.groupBy("lang").agg(count(lit(1)).as("n_dedup"))
      q.join(broadcast(rates), "lang") // bounded: one row per language
        .join(broadcast(raw), "lang")
        .join(broadcast(ded), "lang")
        .groupBy("lang")
        .agg(first("n_raw").as("n_raw"), first("n_dedup").as("n_dedup"),
          first("n_quality").as("n_quality"),
          first("accept_ppm").as("accept_ppm"),
          cnt(hash28(col("doc_id").cast("string")) % 1000000L < col("accept_ppm"))
            .as("n_sampled"))
        .orderBy("lang")
    },

    // --------------------------------------------- source-priority dedup
    Q("q80_priority_dedup",
      "Cross-source dedup with a keep policy: when the same content " +
        "appears in several sources, keep the copy from the " +
        "highest-priority source (curated beats crawled), tie-broken by " +
        "lowest doc_id. One shuffle on sha256(text) — same canonical " +
        "shape as exact dedup (q24) — with the argmin packed into a " +
        "single BIGINT rank = priority·10^9 + doc_id, so the policy " +
        "rides the existing MIN aggregate instead of a window or a " +
        "join-back. (Packing bound: doc_id < 10^9 here; a 100 TB corpus " +
        "packs into DECIMAL(38) or a binary-comparable key the same " +
        "way.)",
      Some("""
        SELECT sha256(text) AS content_hash,
               MIN(substr(source, 4)::BIGINT * 1000000000 + doc_id) % 1000000000
                 AS keep_id,
               MIN(substr(source, 4)::BIGINT * 1000000000 + doc_id) // 1000000000
                 AS keep_priority,
               COUNT(*) AS n_copies,
               COUNT(DISTINCT source) AS n_sources
        FROM documents GROUP BY 1 ORDER BY keep_id""")) { (s, dir) =>
      val ranked = Tables.documents(s, dir)
        .withColumn("rank",
          substring(col("source"), 4, 10).cast("long") * 1000000000L +
            col("doc_id"))
      ranked
        .groupBy(sha2(col("text"), 256).as("content_hash"))
        .agg((min(col("rank")) % 1000000000L).as("keep_id"),
          expr("min(rank) div 1000000000").as("keep_priority"),
          count(lit(1)).as("n_copies"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy("keep_id")
    }
  )
}
