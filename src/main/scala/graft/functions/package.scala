package graft

import org.apache.spark.sql.{Column, graftshim}
import org.apache.spark.sql.functions._
import graft.expr.NormalizeKey

/** Column-function facade for the engine's scalar operators.
  *
  * Everything here compiles to built-in Catalyst expressions (codegen'd)
  * except `normalize_key`, which is our own native Catalyst expression
  * (see [[graft.expr.NormalizeKey]]). No Scala UDFs anywhere — UDFs are
  * opaque to Catalyst and break whole-stage codegen / pushdown.
  *
  * Reference semantics (file:line cites are to /root/reference):
  *  - normalize_key   src/etl_pipeline.py:32-46
  *  - money_br        src/etl_pipeline.py:217-223
  *  - ts_diff_*       src/etl_pipeline.py:243-247,443,454-455
  *  - age_years/band  src/etl_pipeline.py:279-288
  *  - shift_of_day    src/etl_pipeline.py:78-83
  */
package object functions {

  /** Upper → NFD accent-strip → keep [A-Z0-9 ] → collapse spaces → trim. */
  def normalize_key(c: Column): Column =
    graftshim.column(NormalizeKey(graftshim.expression(c)))

  /** Parse a Brazilian-locale money string: strip "R$", drop "." thousands
    * separators, "," → "." decimal, cast to double; malformed → null,
    * matching pandas `errors='coerce'`. Spark 4 runs ANSI mode by default,
    * where a bad string→double cast THROWS — so the cast is guarded by a
    * numeric-shape predicate instead of relying on legacy null-on-error. */
  def money_br(c: Column): Column = {
    val cleaned = trim(
      regexp_replace(
        regexp_replace(
          regexp_replace(trim(c.cast("string")), "R\\$", ""),
          "\\.", ""),
        ",", "."))
    when(cleaned.rlike("^-?[0-9]+(\\.[0-9]+)?$"), cleaned.cast("double"))
  }

  /** Timestamp difference in fractional hours (null-propagating). */
  def ts_diff_hours(end: Column, start: Column): Column =
    (unix_timestamp(end) - unix_timestamp(start)) / 3600.0

  /** Timestamp difference in fractional days. */
  def ts_diff_days(end: Column, start: Column): Column =
    (unix_timestamp(end) - unix_timestamp(start)) / 86400.0

  /** Timestamp difference in fractional minutes. */
  def ts_diff_minutes(end: Column, start: Column): Column =
    (unix_timestamp(end) - unix_timestamp(start)) / 60.0

  /** Age in fractional years at `asOf` (parameterized — the reference's
    * volatile `datetime.now()` anchor made explicit). */
  def age_years(birth: Column, asOf: Column): Column =
    datediff(asOf, birth) / 365.25

  /** Age banding with the reference's right-open bins [0,13,18,40,60,120);
    * null or out-of-range → 'Indefinido'. */
  def age_band(birth: Column, asOf: Column): Column = {
    val a = age_years(birth, asOf)
    when(a.isNull, "Indefinido")
      .when(a >= 0 && a < 13, "0-12")
      .when(a >= 13 && a < 18, "13-17")
      .when(a >= 18 && a < 40, "18-39")
      .when(a >= 40 && a < 60, "40-59")
      .when(a >= 60 && a < 120, "60+")
      .otherwise("Indefinido")
  }

  /** Shift-of-day classifier: hour ∈ [6,12) → MANHA, [12,18) → TARDE,
    * else NOITE; null timestamp → 'Indefinido'. */
  def shift_of_day(ts: Column): Column = {
    val h = hour(ts)
    when(h.isNull, "Indefinido")
      .when(h.between(6, 11), "MANHA")
      .when(h.between(12, 17), "TARDE")
      .otherwise("NOITE")
  }

  /** SHA-256 pseudonymization of one or more parts joined by "|".
    * Null in any part propagates to a null ID (reference `concat` quirk,
    * src/Criptografia.py:29-42). */
  def pseudonymize(parts: Column*): Column =
    sha2(parts.map(_.cast("string")).reduce(concat(_, lit("|"), _)), 256)

  /** PII scrubbing: replace email addresses and phone-like tokens with
    * placeholder tags. The field-level complement of [[pseudonymize]] for
    * free text — a pure projection (codegen'd regexp_replace), no
    * shuffle; patterns kept POSIX-portable so oracle engines replicate
    * them verbatim. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "555-[0-9]+"
  def redact_pii(c: Column): Column =
    regexp_replace(
      regexp_replace(c, EmailPattern, "[EMAIL]"),
      PhonePattern, "[PHONE]")

  /** Bounded per-group top-k over a packed BIGINT sort key — see
    * [[graft.expr.TopKPacked]]. Returns the k largest values descending;
    * the aggregate holds exactly k longs per group per task (map-side
    * partials merge like `max`), vs the full per-group sort a
    * ROW_NUMBER window pays. */
  def topk_packed(c: Column, k: Int): Column =
    graftshim.column(
      graft.expr.TopKPacked(graftshim.expression(c), k).toAggregateExpression())
}
