package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.{EmailPattern, PhonePattern}

/** redact_pii semantics. Spark's regexp_replace is java.util.regex, so the
  * driver-side mirror below exercises the same engine the column does; one
  * Spark-side test pins the column wiring. */
class PiiSpec extends SparkSpec {

  private def redact(s: String): String =
    s.replaceAll(EmailPattern, "[EMAIL]").replaceAll(PhonePattern, "[PHONE]")

  private val genText: Gen[String] = for {
    words <- Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.const("user.1@mail.example.com"),
      Gen.const("john-doe+tag@my-site.co.uk"), // hyphen/plus addressing
      Gen.const("555-0199"),
      Gen.const("a@@b"), // near-miss shapes
      Gen.const("@nohandle"),
      Gen.const("555-")))
  } yield words.mkString(" ")

  test("no email or phone pattern survives redaction (ScalaCheck)") {
    val prop = Prop.forAll(genText) { s =>
      val out = redact(s)
      !EmailPattern.r.findFirstIn(out).isDefined &&
        !PhonePattern.r.findFirstIn(out).isDefined
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("idempotence: redact(redact(x)) == redact(x) (ScalaCheck)") {
    val prop = Prop.forAll(genText) { s =>
      val once = redact(s)
      redact(once) == once
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("column wiring matches the driver-side mirror") {
    import spark.implicits._
    val rows = Seq("mail me at a.b@c.de or 555-123",
      "no pii here", "x@y and x@y twice: x@y")
    val got = rows.toDF("s")
      .select(graft.functions.redact_pii(col("s"))).as[String].collect()
    assert(got.toSeq === rows.map(redact))
  }
}
