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

/** Shared fixture for handcrafted `events.parquet` lakes in the LEGACY
  * encoding: INT64 ts annotated TIMESTAMP(NANOS) — the actual footer
  * the driver's early testdata generations shipped, and the only INT64
  * form `Tables.events` accepts for the raw-nanos path (an unannotated
  * INT64 refuses loudly). Spark cannot write NANOS itself, so the
  * writer goes through parquet-mr's example API. ONE place so specs
  * can't drift from the contract independently. */
object EventLake {
  import org.apache.spark.sql.types._
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType), // raw nanos
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Wall-clock string → nanos-since-epoch (the raw ts encoding). */
  def ns(s: String): Long = java.sql.Timestamp.valueOf(s).getTime * 1000000L

  /** Writes `$dir/events.parquet` holding `rows` (event_id, ts-nanos,
    * user_id, event_type, value, props — all non-null) with a genuine
    * INT64 TIMESTAMP(NANOS) annotation on ts; `annotated = false`
    * produces the plain-INT64 footer the loader must REFUSE. */
  def write(dir: String, rows: Seq[org.apache.spark.sql.Row],
      annotated: Boolean = true): Unit = {
    import org.apache.parquet.schema.MessageTypeParser
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    val tsField =
      if (annotated) "required int64 ts (TIMESTAMP(NANOS,false));"
      else "required int64 ts;"
    val msg = MessageTypeParser.parseMessageType(s"""
      message events {
        required int64 event_id;
        $tsField
        required int64 user_id;
        required binary event_type (STRING);
        required double value;
        required binary props (STRING);
      }""")
    val conf = new org.apache.hadoop.conf.Configuration()
    GroupWriteSupport.setSchema(msg, conf)
    val out = java.nio.file.Paths.get(dir, "events.parquet")
    graft.core.Fs.deleteRecursively(out)
    val w = ExampleParquetWriter.builder(
      org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
        new org.apache.hadoop.fs.Path(s"$out/part-0.parquet"), conf))
      .withConf(conf).build()
    val f = new SimpleGroupFactory(msg)
    try rows.foreach { r =>
      w.write(f.newGroup()
        .append("event_id", r.getLong(0)).append("ts", r.getLong(1))
        .append("user_id", r.getLong(2)).append("event_type", r.getString(3))
        .append("value", r.getDouble(4)).append("props", r.getString(5)))
    } finally w.close()
  }
}
