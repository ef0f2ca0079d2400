package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** 28-bit SimHash over an array of token hashes: bit j of the result is 1
  * iff Σ_tokens (bit_j(h) ? +1 : -1) > 0.
  *
  * Native replacement for 28 interpreted `aggregate(...)` calls per row
  * (higher-order functions don't codegen); one pass over the tokens
  * updating 28 counters. Arithmetic mirrors the DuckDB oracle's
  * list_sum/CASE replica bit for bit.
  */
case class SimHash28(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash28"

  override def nullSafeEval(input: Any): Any =
    SimHash28.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.SimHash28.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash28 =
    copy(child = newChild)
}

object SimHash28 {
  def compute(hashes: ArrayData): Long = {
    val counts = new Array[Int](28)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < 28) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 28) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}
