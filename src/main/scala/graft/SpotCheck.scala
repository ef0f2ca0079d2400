package graft

import org.apache.spark.sql.SparkSession
import graft.queries.Registry

/** Subset spot-check main (the sf0.1 per-round parity tool; see .claude/skills/verify): run a subset of registry queries at a given
  * SF dir and dump parquet + oracle_sql.json for tools/parity.py. */
object SpotCheck {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val out = args(1); val names = args.drop(2).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sqls = names.map { n =>
      val q = Registry.byName(n)
      q.fn(spark, dir).write.mode("overwrite").parquet(s"$out/$n")
      s""""$n": ${q.oracle.map(o => "\"" + o.trim.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n") + "\"").getOrElse("null")}"""
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$out/oracle_sql.json"),
      sqls.mkString("{", ",", "}"))
    spark.stop()
  }
}
