package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** k-permutation MinHash signature over an array of element hashes:
  * `sig[i] = min over h in child of (a_i * h + b_i) mod p`.
  *
  * Exists because Spark's higher-order array functions (`transform` /
  * `aggregate`) are interpreted — they do not participate in whole-stage
  * codegen, and a k=64 signature built from 64 nested `transform`s costs
  * ~k·|set| boxed lambda invocations per row (the dominant cost of the
  * MinHash query at bench scale). This expression computes the whole
  * signature in one tight primitive-long loop and generates a single
  * static call in codegen.
  *
  * Cross-engine contract: identical arithmetic to the DuckDB oracle
  * (BIGINT math; caller guarantees h < 2^28 and a_i,b_i < p < 2^31 so
  * a_i*h never overflows a signed 64-bit long).
  */
case class MinHashSig(child: Expression, seedA: Seq[Long], seedB: Seq[Long],
                      prime: Long)
    extends UnaryExpression {
  require(seedA.length == seedB.length && seedA.nonEmpty)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  @transient private lazy val aArr = seedA.toArray
  @transient private lazy val bArr = seedB.toArray

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], aArr, bArr, prime)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashSeedA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashSeedB", bArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.MinHashSig.compute($c, $aRef, $bRef, ${prime}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Shared by interpreted eval and generated code. Empty input → a
    * signature of all `prime` sentinels (matches min-over-empty-set being
    * unbounded; callers filter empty sets upstream). */
  def compute(hashes: ArrayData, a: Array[Long], b: Array[Long], p: Long): ArrayData = {
    val k = a.length
    val n = hashes.numElements()
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      var m = p
      var j = 0
      val ai = a(i); val bi = b(i)
      while (j < n) {
        val v = (ai * hashes.getLong(j) + bi) % p
        if (v < m) m = v
        j += 1
      }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }
}
