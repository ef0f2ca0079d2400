package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Sign-random-projection signature: bit j of the result is 1 iff
  * `dot(v, planes[j]) > 0`, for an integer vector and integer planes.
  *
  * One tight loop over all planes instead of |planes| interpreted
  * zip_with/aggregate pairs (the dominant cost of the embedding-LSH
  * query at bench scale — higher-order functions don't codegen).
  * Integer dots ⇒ exact, mirrored by the oracle's list arithmetic.
  */
case class PlaneSignBits(child: Expression, planes: Seq[Seq[Long]])
    extends UnaryExpression {
  require(planes.nonEmpty && planes.size <= 63)

  override def dataType: DataType = LongType
  override def prettyName: String = "plane_sign_bits"

  @transient private lazy val planeArr: Array[Array[Long]] =
    planes.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    PlaneSignBits.compute(input.asInstanceOf[ArrayData], planeArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("lshPlanes", planeArr, "long[][]")
    defineCodeGen(ctx, ev, c => s"graft.expr.PlaneSignBits.compute($c, $pRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): PlaneSignBits =
    copy(child = newChild)
}

object PlaneSignBits {
  def compute(vec: ArrayData, planes: Array[Array[Long]]): Long = {
    val n = vec.numElements()
    var sig = 0L
    var j = 0
    while (j < planes.length) {
      val w = planes(j)
      var dot = 0L
      var i = 0
      val m = math.min(n, w.length)
      while (i < m) { dot += vec.getLong(i) * w(i); i += 1 }
      if (dot > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
