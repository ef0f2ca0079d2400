package graft

import org.apache.spark.sql.functions._
import graft.queries.CorpusOps

/** Hand-computed BPE merge-loop semantics (q112): greedy left-to-right
  * non-overlapping application, deterministic (cnt, left, right) argmax
  * tie-break, multi-char merged symbols, and early stop when the
  * vocabulary runs out of pairs. */
class BpeLoopSpec extends SparkSpec {
  import spark.implicits._

  /** Encode plain words as q112's wrapped symbol strings. */
  private def enc(wordFreq: (String, Long)*) =
    wordFreq.toSeq.toDF("word", "freq")
      .select(concat(lit(" "),
        concat_ws("  ", transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1)))),
        lit(" ")).as("wr"), col("freq"))

  test("greedy non-overlap: 'aaa' yields [aa, a], 'aaaa' yields [aa, aa]") {
    // step 1 counts (a,a): 2 from aaa + 3 from aaaa = 5 and merges it;
    // greedy application must produce aa|a and aa|aa — the sequential
    // algorithm — not consume shared delimiters (the naive single-space
    // encoding got aa|a|a for aaaa)
    val steps = CorpusOps.bpeMergeSteps(enc("aaa" -> 1L, "aaaa" -> 1L), 2)
    assert(steps.head == ((1, "a", "a", 5L)), s"step1 was ${steps.head}")
    // step 2 pairs: aaa -> (aa,a) x1; aaaa -> (aa,aa) x1. Tie on cnt=1:
    // (aa,a) < (aa,aa) on the right symbol — deterministic tie-break
    assert(steps(1) == ((2, "aa", "a", 1L)), s"step2 was ${steps(1)}")
  }

  test("frequency weighting and early exhaustion") {
    // vocabulary: aa (freq 2), ab (freq 1) — one char-pair each
    val steps = CorpusOps.bpeMergeSteps(enc("aa" -> 2L, "ab" -> 1L), 5)
    // step1: (a,a)=2 beats (a,b)=1; step2: only (a,b)=1 left;
    // step3: no pairs anywhere -> loop stops at 2 of the 5 asked steps
    assert(steps == Seq((1, "a", "a", 2L), (2, "a", "b", 1L)))
  }

  test("multi-char merges keep merging: 'abab' converges to one symbol") {
    val steps = CorpusOps.bpeMergeSteps(enc("abab" -> 3L), 3)
    // (a,b)=6 -> merge ab; (ab,ab)=3 -> merge abab; then exhausted
    assert(steps == Seq((1, "a", "b", 6L), (2, "ab", "ab", 3L)))
  }
}
