package graft.core
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftshim

case class ProbeUpper(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(input.asInstanceOf[UTF8String].toString.toUpperCase)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"org.apache.spark.unsafe.types.UTF8String.fromString($c.toString().toUpperCase())")
  override protected def withNewChildInternal(newChild: Expression): ProbeUpper = copy(newChild)
}

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // 1. runtime conf for nanos
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    println("events schema with nanosAsLong: " + ev.schema.simpleString)
    ev.select(col("event_id"), timestamp_micros((col("ts") / 1000L).cast("long")).as("ts")).show(3, false)
    // 2. custom expression → Column
    val c: Column = graftshim.column(ProbeUpper(graftshim.expression(col("lang"))))
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(c.as("u")).show(3)
    spark.stop()
  }
}
