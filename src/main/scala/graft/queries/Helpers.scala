package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One engine query + its DuckDB oracle (None → driver does rows-only check). */
final case class Q(
    name: String,
    doc: String,
    oracle: Option[String])(
    val fn: (SparkSession, String) => DataFrame)

/** Cross-engine-deterministic aggregation helpers.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * oracle SQL, so every derived number must be bit-identical across engines:
  *  - money sums go through integer cents (`round(x*100)` → long → sum):
  *    exact, order-independent, then a single double division + round;
  *  - counts stay integral (BIGINT in both engines);
  *  - every division is double/num with a guarded denominator;
  *  - no bare decimal literals on the oracle side (DuckDB would type them
  *    DECIMAL and produce DECIMAL arithmetic; we cast to DOUBLE explicitly).
  */
object H {
  /** Conditional count — COUNT(CASE WHEN c THEN 1 END) in the oracle. */
  def cnt(c: Column): Column = count(when(c, lit(1)))

  /** Exact, order-independent sum of a money column via integer cents. */
  def centsSum(c: Column): Column = sum(round(c * 100).cast("long"))

  /** Rounded money sum: ROUND(CAST(SUM(cents) AS DOUBLE)/100, 2). */
  def moneySum(c: Column): Column =
    round(centsSum(c).cast("double") / 100, 2)

  /** Rounded money mean over all rows of the group (count(*) denominator). */
  def moneyAvg(c: Column): Column =
    round(centsSum(c).cast("double") / 100 / count(lit(1)), 2)

  /** Percentage with guarded denominator, rounded to 2 decimals. */
  def pct(num: Column, den: Column): Column =
    when(den > 0, round(num.cast("double") * 100 / den, 2))

  /** Ratio with guarded denominator, rounded to `scale`. */
  def ratio(num: Column, den: Column, scale: Int = 4): Column =
    when(den > 0, round(num.cast("double") / den, scale))

  /** 28-bit integer hash from the md5 hex prefix — THE cross-engine
    * hashing primitive every bucketed/sampled/sketched operator builds
    * on: Spark `conv(substr(md5(x),1,7),16,10)` ==
    * DuckDB `('0x'||substr(md5(x),1,7))::BIGINT`, exact in both. One
    * definition here; a change (prefix width, algorithm) must change
    * [[oHash28]] in lockstep or every parity gate breaks at once. */
  def hash28(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  /** Whitespace tokenization of a text column (oracle twin:
    * `string_split_regex(x, '\s+')`). */
  def toks(c: Column): Column = split(c, "\\s+")

  // ---- oracle-side (DuckDB SQL) twins -------------------------------------
  /** DuckDB twin of [[hash28]]. */
  def oHash28(x: String): String =
    s"('0x' || substr(md5($x), 1, 7))::BIGINT"

  def oCnt(cond: String): String = s"COUNT(CASE WHEN $cond THEN 1 END)"
  def oCentsSum(x: String): String = s"SUM(CAST(ROUND(($x)*100) AS BIGINT))"
  def oMoneySum(x: String): String =
    s"ROUND(CAST(${oCentsSum(x)} AS DOUBLE)/100, 2)"
  def oMoneyAvg(x: String): String =
    s"ROUND(CAST(${oCentsSum(x)} AS DOUBLE)/100/COUNT(*), 2)"
  def oPct(num: String, den: String): String =
    s"CASE WHEN $den > 0 THEN ROUND(CAST($num AS DOUBLE)*100/$den, 2) END"

  /** The oracle-side mirror of normalize_key for accent-free ASCII data
    * (DuckDB regexp_replace needs the 'g' flag to replace all matches). */
  def oNormKey(x: String): String =
    s"TRIM(REGEXP_REPLACE(REGEXP_REPLACE(UPPER($x), '[^A-Z0-9 ]', '', 'g'), ' +', ' ', 'g'))"
}
