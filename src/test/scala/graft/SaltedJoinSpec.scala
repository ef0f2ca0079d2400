package graft

import org.apache.spark.sql.functions._
import graft.operators.SaltedJoin

/** Salted skew join: result must be inner-join-identical (incl. duplicate
  * keys on both sides), and a hot key's rows must actually spread across
  * multiple sub-keys — the whole point of the operator. */
class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  // hot key 1 owns 1000 of 1006 fact rows; dim has a duplicate key (7)
  // to prove multiplicity is preserved
  private def fact = (
    (1 to 1000).map(i => (1L, s"e$i")) ++
      Seq((2L, "x"), (3L, "y"), (7L, "a"), (7L, "b"), (99L, "orphan"), (2L, "z"))
  ).toDF("k", "payload")
  private def dim = Seq(
    (1L, "hot-dim"), (2L, "two"), (3L, "three"), (7L, "seven-a"), (7L, "seven-b")
  ).toDF("k", "label")

  test("salted join equals the plain inner join, duplicates included") {
    val plain = fact.join(dim, Seq("k"))
      .select("k", "payload", "label").as[(Long, String, String)].collect().sorted
    val salted = SaltedJoin.join(fact, dim, Seq("k"), salts = 8)
      .select("k", "payload", "label").as[(Long, String, String)].collect().sorted
    assert(salted.length === plain.length) // 1000 + 2 + 1 + 2*2 = 1007
    assert(salted.toSeq === plain.toSeq)
  }

  test("the hot key spreads across multiple sub-keys") {
    val spread = fact.withColumn("s", SaltedJoin.saltOf(8))
      .filter(col("k") === 1L)
      .select(countDistinct(col("s"))).as[Long].head()
    assert(spread >= 4, s"hot key landed on only $spread of 8 salts")
  }

  test("IDENTICAL hot rows spread too — content-hash salting would collapse them") {
    // 1000 byte-identical rows: the telemetry-replay shape of real skew
    val dupFact = (1 to 1000).map(_ => (1L, "same-payload")).toDF("k", "payload")
    val spread = dupFact.withColumn("s", SaltedJoin.saltOf(8))
      .select(countDistinct(col("s"))).as[Long].head()
    assert(spread >= 4, s"identical rows landed on only $spread of 8 salts")
  }

  test("reserved column and bad salt count are rejected") {
    intercept[IllegalArgumentException] {
      SaltedJoin.join(fact.withColumnRenamed("payload", SaltedJoin.SaltCol), dim, Seq("k"), 8)
    }
    intercept[IllegalArgumentException] {
      SaltedJoin.join(fact, dim, Seq("k"), 0)
    }
  }
}
