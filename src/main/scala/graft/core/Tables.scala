package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata lake (`/root/testdata/sf{N}/<table>.parquet`).
  *
  * All plain tables go through the vectorized parquet reader with no schema
  * munging so Catalyst's column pruning / filter pushdown reach the scan.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** `events.parquet` carries INT64 TIMESTAMP(NANOS) which Spark's parquet
    * reader rejects outright ([PARQUET_TYPE_ILLEGAL]). We read the raw nanos
    * as long (`spark.sql.legacy.parquet.nanosAsLong` — a session-wide conf;
    * there is no per-read option, so the loader sets it and callers should
    * know events() flips it for the session) and floor-convert to a
    * microsecond TIMESTAMP_NTZ — the same wall-clock instant DuckDB sees,
    * truncated from ns to µs. The NTZ value is built by pure epoch
    * arithmetic from the NTZ epoch literal, so it is independent of
    * spark.sql.session.timeZone (timestamp_micros().cast(ntz) would route
    * through LTZ and shift with the session zone).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
      .withColumn("ts",
        expr("timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"))
  }
}
