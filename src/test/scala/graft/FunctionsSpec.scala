package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions._

/** Edge tables for the scalar-function facade (SURVEY.md §2.3), per the §5
  * test plan: money_br locale parse, age-band right-open bin edges, shift
  * hour edges, timestamp diffs, pseudonymize null propagation. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("money_br: Brazilian locale money strings (etl_pipeline.py:217-223)") {
    val cases = Seq(
      "R$ 1.234,56" -> Some(1234.56),
      "1.234,56" -> Some(1234.56),
      "150,00" -> Some(150.0),
      "2.000" -> Some(2000.0), // thousands dot, no decimal comma
      "0,99" -> Some(0.99),
      "abc" -> None, // malformed → null (pandas errors='coerce')
      "" -> None)
    val got = cases.map(_._1).toDF("s")
      .select(money_br(col("s"))).collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq === cases.map(_._2))
  }

  test("age_band: right-open bin edges [0,13,18,40,60,120) at exact boundaries") {
    val asOf = "2000-01-01"
    // birth dates chosen so age in fractional years lands exactly on each edge side
    val cases = Seq(
      ("1999-06-01", "0-12"), // age ~0.6
      ("1987-01-05", "0-12"), // just under 13
      ("1986-12-28", "13-17"), // just over 13
      ("1982-01-03", "13-17"), // just under 18
      ("1981-12-30", "18-39"), // just over 18
      ("1960-01-04", "18-39"), // just under 40
      ("1959-12-31", "40-59"), // just over 40
      ("1940-01-03", "40-59"), // just under 60
      ("1939-12-31", "60+"), // just over 60
      ("1880-01-05", "60+"), // just under 120
      ("1879-12-30", "Indefinido"), // ≥ 120
      ("2001-01-01", "Indefinido")) // negative age
    val got = cases.map(_._1).toDF("b")
      .select(age_band(to_date(col("b")), to_date(lit(asOf)))).as[String].collect()
    assert(got.toSeq === cases.map(_._2))
  }

  test("age_band: null birth date → Indefinido") {
    val got = Seq[Option[String]](None).toDF("b")
      .select(age_band(to_date(col("b")), to_date(lit("2000-01-01"))))
      .as[String].collect()
    assert(got.toSeq === Seq("Indefinido"))
  }

  test("shift_of_day: hour edges 5/6, 11/12, 17/18, and null (etl_pipeline.py:78-83)") {
    val cases = Seq(
      Some("2024-01-01 05:59:59") -> "NOITE",
      Some("2024-01-01 06:00:00") -> "MANHA",
      Some("2024-01-01 11:59:59") -> "MANHA",
      Some("2024-01-01 12:00:00") -> "TARDE",
      Some("2024-01-01 17:59:59") -> "TARDE",
      Some("2024-01-01 18:00:00") -> "NOITE",
      Some("2024-01-01 00:00:00") -> "NOITE",
      None -> "Indefinido")
    val got = cases.map(_._1).toDF("t")
      .select(shift_of_day(to_timestamp(col("t")))).as[String].collect()
    assert(got.toSeq === cases.map(_._2))
  }

  test("ts_diff hours/days/minutes: fractional, null-propagating") {
    val df = Seq(
      (Some("2024-01-02 12:00:00"), Some("2024-01-01 00:00:00")),
      (None, Some("2024-01-01 00:00:00"))).toDF("e", "s")
      .select(
        ts_diff_hours(to_timestamp(col("e")), to_timestamp(col("s"))).as("h"),
        ts_diff_days(to_timestamp(col("e")), to_timestamp(col("s"))).as("d"),
        ts_diff_minutes(to_timestamp(col("e")), to_timestamp(col("s"))).as("m"))
    val rows = df.collect()
    assert(rows(0) === Row(36.0, 1.5, 2160.0))
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }

  test("pseudonymize: stable SHA-256, null part → null id (Criptografia.py:29-42)") {
    val got = Seq((Some("ANA"), Some(1L)), (None, Some(2L)))
      .toDF("n", "k")
      .select(pseudonymize(col("n"), col("k"))).collect()
    // sha256("ANA|1") — stable across runs/engines
    assert(got(0).getString(0) ===
      java.security.MessageDigest.getInstance("SHA-256")
        .digest("ANA|1".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(got(1).isNullAt(0))
  }
}
