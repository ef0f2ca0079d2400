package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Join-key canonicalizer: upper-case, Unicode NFD accent-strip, keep only
  * `[A-Z0-9 ]`, collapse internal runs of spaces, trim.
  *
  * Semantics follow the reference's `normalizar_texto_para_join`
  * (/root/reference/src/etl_pipeline.py:32-46): `"São João  2ª"` → `"SAO JOAO 2"`.
  * Characters outside the keep-set are dropped (not replaced by a space), and
  * non-space whitespace is dropped too, exactly like the reference's
  * `[^A-Z0-9 ]` removal running before its whitespace collapse.
  *
  * Implemented as a native Catalyst `UnaryExpression` with `doGenCode` so it
  * participates in whole-stage codegen (a Scala UDF would break the pipeline
  * into an interpreted stage and defeat filter pushdown around it).
  */
case class NormalizeKey(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_key"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      NormalizeKey.normalize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.expr.NormalizeKey.normalize($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): NormalizeKey =
    copy(child = newChild)
}

object NormalizeKey {
  /** Pure JVM implementation, shared by interpreted eval and generated code. */
  def normalize(s: String): String = {
    val nfd = java.text.Normalizer.normalize(
      s.toUpperCase(java.util.Locale.ROOT), java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var pendingSpace = false // collapse runs; drop leading
    var i = 0
    while (i < nfd.length) {
      val ch = nfd.charAt(i)
      if ((ch >= 'A' && ch <= 'Z') || (ch >= '0' && ch <= '9')) {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(ch)
      } else if (ch == ' ') {
        pendingSpace = true
      }
      // everything else (combining marks, punctuation, non-space whitespace)
      // is dropped without leaving a separator, matching the reference.
      i += 1
    }
    sb.toString
  }
}
