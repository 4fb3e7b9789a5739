package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine-portable 60-bit token hash — first 15 hex chars of
  * md5(token) as a long — computed straight from the digest bytes.
  *
  * Value-identical to the column chain
  * `conv(substring(md5(tok), 1, 15), 16, 10)` (which is what the DuckDB
  * oracle replays, so signatures stay bit-exact), but skips the three
  * per-token string materializations that chain pays: the 32-char hex
  * rendering, the 15-char substring copy, and conv's base-16 string
  * parse. SimHash hashes EVERY token of EVERY document — this sits on
  * the hottest text path in the engine (see [[graft.ops.Dedup]]).
  */
object HashKernels {
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes), big-endian — bytes 0..6 then the high
    * nibble of byte 7, exactly the value of the first 15 hex chars. */
  def md5Prefix60(s: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    (v << 4) | ((dig(7) >> 4) & 0xfL)
  }
}

case class Md5Prefix60Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60Expr =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    HashKernels.md5Prefix60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.md5Prefix60($c)")
}

object Md5Prefix60Expr {
  import org.apache.spark.sql.GraftColumnBridge
  def apply(text: Column): Column =
    GraftColumnBridge.column(Md5Prefix60Expr(
      GraftColumnBridge.expression(text)))
}
