package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression.
  *
  * Spark has no canonical-normalization built-in, yet web-scrape text
  * mixes precomposed codepoints with combining sequences ("é" vs
  * "e"+U+0301) — without NFC, exact dedup, fingerprints, and n-gram
  * hashes all treat canonically-equal strings as distinct. One static
  * helper call per row (java.text.Normalizer); the common all-ASCII row
  * short-circuits via `Normalizer.isNormalized`, which is O(n) with no
  * allocation, so the kernel costs a scan unless normalization is
  * actually needed. DuckDB's `nfc_normalize` is the oracle twin.
  */
object NormalizeKernels {

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    NormalizeKernels.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeKernels.nfc($c)")
}

object NfcNormalizeExpr {
  import org.apache.spark.sql.GraftColumnBridge
  def apply(text: Column): Column =
    GraftColumnBridge.column(NfcNormalizeExpr(
      GraftColumnBridge.expression(text)))
}
