package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Generator (UDTF-tier custom expression): emits every adjacent
  * character pair of a string as one output row — the q102 BPE
  * pair-explode as a native table function instead of
  * `explode(transform(sequence(...), i -> substring(...)))`.
  *
  * Why a Generator: the HOF form materializes a per-row array of n-1
  * freshly-allocated strings before the explode copies them again; the
  * generator walks the string once and emits rows directly — no
  * intermediate array, one allocation per pair. Same rows, same order.
  * With [[TopKPacked]] (aggregate) and the scalar expressions this
  * completes the engine's custom-function surface across all three
  * extension tiers (scalar / aggregate / generator).
  *
  * Generators evaluate through the Generate operator (CodegenFallback is
  * the norm — Spark's own Explode is interpreted the same way); the hot
  * loop below is compiled Scala on UTF8String bytes.
  *
  * Null or length<2 inputs produce zero rows. NOTE this is SAFER than
  * the raw HOF form, not identical to it: `sequence(1, length-1)` on a
  * 1-char string is sequence(1, 0) = [1, 0] (Spark defaults to a
  * DESCENDING step when start > stop), so the unguarded HOF emits two
  * bogus rows where this generator emits none — q102 guarded it with
  * LENGTH >= 2; the generator needs no guard.
  */
case class CharPairs(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def prettyName: String = "char_pairs"
  override def elementSchema: StructType =
    StructType(StructField("pair", StringType, nullable = false) :: Nil)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"char_pairs requires a STRING input, got ${child.dataType.sql}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      // numChars/substringSQL walk UTF-8 correctly (a 2-char pair may be
      // more than 2 bytes); substringSQL is 1-indexed like SQL substring
      val s = v.asInstanceOf[UTF8String]
      val n = s.numChars()
      if (n < 2) Nil
      else new Iterator[InternalRow] {
        private var i = 1
        override def hasNext: Boolean = i <= n - 1
        override def next(): InternalRow = {
          val row = InternalRow(s.substringSQL(i, 2))
          i += 1
          row
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CharPairs =
    copy(child = newChild)
}
