package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test run (per-suite sessions would
  * dominate runtime; the reference's diagnosis harness made that mistake —
  * /root/reference/src/tests/diagnosis.py spins one up per test). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  protected lazy val spark: SparkSession = TestSpark.spark
}

/** Shared fixture for handcrafted `events.parquet` lakes: the raw-nanos
  * LongType ts contract (what Tables.events expects from the driver's
  * TIMESTAMP(NANOS) parquet) lives in ONE place so specs can't drift
  * from it independently. */
object EventLake {
  import org.apache.spark.sql.types._
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType), // raw nanos
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Wall-clock string → nanos-since-epoch (the raw ts encoding). */
  def ns(s: String): Long = java.sql.Timestamp.valueOf(s).getTime * 1000000L
}
