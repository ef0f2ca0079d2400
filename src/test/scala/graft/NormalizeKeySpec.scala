package graft

import org.apache.spark.sql.functions.col
import graft.expr.NormalizeKey
import graft.functions.normalize_key
import org.scalacheck.{Prop, Test => SCTest}

/** F1 normalize-key golden pairs (reference semantics:
  * /root/reference/src/etl_pipeline.py:32-46), both through the pure JVM
  * implementation and through the Catalyst expression in a real plan
  * (exercising the codegen path — r1's gap: the accent-strip half had
  * never been executed against an expectation). */
class NormalizeKeySpec extends SparkSpec {

  private val golden = Seq(
    "São João  2ª" -> "SAO JOAO 2",
    "  consulta básica " -> "CONSULTA BASICA",
    "AÇÃO-Múltipla (teste)" -> "ACAOMULTIPLA TESTE",
    "ágüé îõç" -> "AGUE IOC",
    "a\tb\nc" -> "ABC", // non-space whitespace dropped, no separator
    "UNIMED" -> "UNIMED",
    "r$ 1.234,56" -> "R 123456",
    "" -> "",
    "   " -> "",
    "ªºß" -> "SS", // ordinals drop (no NFD base in [A-Z0-9]); ß upper-cases to SS
    "123  456" -> "123 456")

  test("golden pairs — pure JVM implementation") {
    golden.foreach { case (in, want) =>
      assert(NormalizeKey.normalize(in) === want, s"input=<$in>")
    }
  }

  test("golden pairs — through the Catalyst expression (codegen path)") {
    import spark.implicits._
    val got = golden.map(_._1).toDF("s")
      .select(normalize_key(col("s")).as("k"))
      .as[String].collect().toSeq
    assert(got === golden.map(_._2))
  }

  test("null input stays null") {
    import spark.implicits._
    val got = Seq[Option[String]](None, Some("x")).toDF("s")
      .select(normalize_key(col("s"))).collect()
    assert(got(0).isNullAt(0) && got(1).getString(0) === "X")
  }

  test("idempotence: normalize(normalize(x)) == normalize(x) (ScalaCheck)") {
    val prop = Prop.forAll { (s: String) =>
      val once = NormalizeKey.normalize(s)
      NormalizeKey.normalize(once) == once
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("output alphabet is always [A-Z0-9 ] with no double spaces (ScalaCheck)") {
    val prop = Prop.forAll { (s: String) =>
      val out = NormalizeKey.normalize(s)
      out.forall(c => c.isDigit || (c >= 'A' && c <= 'Z') || c == ' ') &&
        !out.contains("  ") && !out.startsWith(" ") && !out.endsWith(" ")
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }
}
