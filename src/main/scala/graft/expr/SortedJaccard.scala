package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact Jaccard similarity of two SORTED, DISTINCT string arrays via a
  * single merge pass: |A∩B| / (|A|+|B|-|A∩B|).
  *
  * Replaces `size(array_intersect(a,b)) / size(array_union(a,b))` in the
  * near-dup verify stage: the built-in set functions are interpreted
  * (no codegen) and build hash sets per row; over ~10^5 candidate pairs
  * × ~10^2-element shingle sets the merge loop is an order of magnitude
  * cheaper. Semantics are identical to the oracle's
  * `len(list_intersect)::DOUBLE / len(list_distinct(list_concat))` —
  * integer counts, one double division.
  *
  * Callers MUST pre-sort with `array_sort` (and dedupe with
  * `array_distinct`); the expression assumes ascending binary order.
  */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedJaccard.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expr.SortedJaccard.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedJaccard =
    copy(left = newLeft, right = newRight)
}

object SortedJaccard {
  /** Merge-count intersection of two ascending UTF8String arrays. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { inter += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}
