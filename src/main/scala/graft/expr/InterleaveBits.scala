package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton/Z-order key: interleave the low 16 bits of two longs
  * (a→even positions, b→odd) into one 32-bit clustering key — the
  * multi-dimensional data-layout primitive behind OPTIMIZE ZORDER:
  * range-partitioning and sorting by the z-value gives every file a
  * bounded min/max span in BOTH source dimensions, so parquet
  * row-group pruning works for predicates on either column.
  *
  * Bit-for-bit the oracle's
  * `list_sum(list_transform(range(16), i ->
  *    ((a >> i) & 1) << (2*i) | ((b >> i) & 1) << (2*i + 1)))`.
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  // LongType children ONLY: codegen would silently widen a Java int while
  // the interpreted nullSafeEval (constant folding, codegen fallback)
  // would ClassCastException — reject the mismatch at analysis instead
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"interleave_bits needs two BIGINT children, got " +
          s"(${left.dataType}, ${right.dataType})")

  override def nullSafeEval(a: Any, b: Any): Any =
    InterleaveBits.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.InterleaveBits.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {
  def compute(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}
