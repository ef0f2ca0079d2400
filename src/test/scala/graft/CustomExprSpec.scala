package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim
import graft.expr.{MinHashSig, SortedJaccard}

/** The two performance-critical custom Catalyst expressions, checked
  * against straightforward Scala reimplementations through real plans
  * (codegen path). */
class CustomExprSpec extends SparkSpec {
  import spark.implicits._

  private val P = 2147483647L
  private val a = Seq(7L, 31L, 1299721L)
  private val b = Seq(3L, 17L, 104729L)

  test("MinHashSig matches a brute-force reference") {
    val hashes = Seq(12L, 999999L, 42L, 268435455L)
    val want = a.zip(b).map { case (ai, bi) =>
      hashes.map(h => (ai * h + bi) % P).min
    }
    val got = Seq(Tuple1(hashes)).toDF("hs")
      .select(graftshim.column(MinHashSig(
        graftshim.expression(col("hs")), a, b, P)).as("sig"))
      .as[Seq[Long]].head()
    assert(got === want)
  }

  test("MinHashSig: empty input yields the prime sentinel per hash") {
    val got = Seq(Tuple1(Seq.empty[Long])).toDF("hs")
      .select(graftshim.column(MinHashSig(
        graftshim.expression(col("hs")), a, b, P)).as("sig"))
      .as[Seq[Long]].head()
    assert(got === Seq(P, P, P))
  }

  test("DotProduct matches elementwise math, min-length on ragged arrays") {
    import graft.expr.DotProduct
    val got = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)), (Seq(2L, 3L), Seq(10L)))
      .toDF("a", "b")
      .select(graftshim.column(DotProduct(
        graftshim.expression(col("a")), graftshim.expression(col("b")))).as("d"))
      .as[Long].collect().toSeq
    assert(got === Seq(32L, 20L))
  }

  test("PlaneSignBits packs dot-product signs into bits") {
    import graft.expr.PlaneSignBits
    // v=(1,-1): plane0=(1,0)→dot 1>0 → bit0; plane1=(0,1)→dot -1 → no bit
    val got = Seq(Tuple1(Seq(1L, -1L))).toDF("v")
      .select(graftshim.column(PlaneSignBits(
        graftshim.expression(col("v")), Seq(Seq(1L, 0L), Seq(0L, 1L)))).as("s"))
      .as[Long].head()
    assert(got === 1L)
  }

  test("SortedJaccard matches set-based Jaccard on sorted distinct arrays") {
    val cases = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")), // 2/4
      (Seq("a"), Seq("a")), // 1
      (Seq("a"), Seq("b")), // 0
      (Seq.empty[String], Seq.empty[String]), // 0 (guarded 0/0)
      (Seq("a", "b"), Seq.empty[String]))
    val want = cases.map { case (x, y) =>
      val inter = x.toSet.intersect(y.toSet).size
      val union = x.toSet.union(y.toSet).size
      if (union == 0) 0.0 else inter.toDouble / union
    }
    val got = cases.toDF("x", "y")
      .select(graftshim.column(SortedJaccard(
        graftshim.expression(col("x")), graftshim.expression(col("y")))).as("j"))
      .as[Double].collect().toSeq
    assert(got === want)
  }

  test("CharPairs generator: adjacent pairs, UTF-8 chars, empty on short/null") {
    import graft.expr.CharPairs
    def pairs(s: Option[String]): Seq[String] =
      Seq(Tuple1(s.orNull)).toDF("w")
        .select(graftshim.column(CharPairs(graftshim.expression(col("w")))).as("p"))
        .as[String].collect().toSeq
    assert(pairs(Some("abc")) === Seq("ab", "bc"))
    // multibyte: numChars/substringSQL must walk chars, not bytes
    assert(pairs(Some("héllo")) === Seq("hé", "él", "ll", "lo"))
    assert(pairs(Some("x")) === Seq.empty)
    assert(pairs(Some("")) === Seq.empty)
    assert(pairs(None) === Seq.empty)
  }

  test("CharPairs SQL surface matches the HOF formulation it replaced") {
    val s = spark.newSession()
    GraftExtensions.register(s)
    import s.implicits._
    Seq("pairing", "aaa").toDF("w").createOrReplaceTempView("words")
    val gen = s.sql("SELECT w, char_pairs(w) AS pair FROM words")
      .as[(String, String)].collect().sorted.toSeq
    val hof = s.sql(
      """SELECT w, explode(transform(sequence(1, length(w)-1),
         i -> substring(w, i, 2))) AS pair FROM words""")
      .as[(String, String)].collect().sorted.toSeq
    assert(gen === hof)
    // …but ONLY above length 2: sequence(1, 0) is DESCENDING [1, 0] in
    // Spark, so the unguarded HOF emits bogus rows on 1-char input where
    // the generator (correctly) emits none — the divergence the
    // CharPairs doc documents, pinned here
    Seq("x").toDF("w").createOrReplaceTempView("one")
    assert(s.sql("SELECT char_pairs(w) FROM one").count() === 0)
    assert(s.sql(
      """SELECT explode(transform(sequence(1, length(w)-1),
         i -> substring(w, i, 2))) FROM one""").count() === 2)
  }
}
