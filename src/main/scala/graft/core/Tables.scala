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
    * as long (`spark.sql.legacy.parquet.nanosAsLong`) and floor-convert to
    * a microsecond TIMESTAMP_NTZ — the same wall-clock instant DuckDB sees,
    * truncated from ns to µs. The NTZ value is built by pure epoch
    * arithmetic from the NTZ epoch literal, so it is independent of
    * spark.sql.session.timeZone (timestamp_micros().cast(ntz) would route
    * through LTZ and shift with the session zone).
    *
    * Conf scoping: the legacy flag is session-wide with no per-read option,
    * and it is consulted when the scan EXECUTES (the relation's session
    * state feeds the scan's hadoopConf), so set-restore around the read
    * would break the returned lazy frame. Instead the read happens in a
    * [[Sessions.scoped]] clone — the caller's runtime conf carried over,
    * the flag set only on the clone, the caller's session never mutated
    * (TablesConfScopeSpec proves all three).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val scoped = Sessions.scoped(spark,
      "spark.sql.legacy.parquet.nanosAsLong" -> "true")
    t(scoped, dir, "events")
      .withColumn("ts",
        expr("timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"))
  }
}
