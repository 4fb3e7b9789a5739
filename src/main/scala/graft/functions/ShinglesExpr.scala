package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingle kernel: tokenize + n-gram join in ONE helper
  * call per row. The Column formulation
  * (`filter(split(...)) -> transform(sequence(...), array_join(slice))`)
  * is a chain of higher-order functions — CodegenFallback, one
  * interpreted lambda dispatch per token and per shingle — and shingle
  * construction dominates every shingle-based dedup operator (minhash,
  * n-gram Jaccard, decontamination). Semantics are IDENTICAL to
  * [[TextFunctions.wordShingles]]'s column form: whitespace split,
  * empty tokens dropped, shingles of `n` consecutive tokens joined with
  * one space, and a single whole-text shingle when fewer than `n`
  * tokens exist (including the empty string for an empty text).
  */
object TextKernels {

  def wordShingles(text: UTF8String, n: Int): ArrayData =
    wordShingles(text, n, minOne = true)

  /** `minOne = true` (shingle semantics): fewer than n tokens yield ONE
    * whole-text shingle. `minOne = false` (token semantics, n = 1):
    * an empty/whitespace text yields an EMPTY array — exactly
    * `filter(split(trim(text), "\s+"), len > 0)`. */
  def wordShingles(text: UTF8String, n: Int, minOne: Boolean): ArrayData = {
    // String.split drops trailing empty pieces; the leading empty piece
    // (text starting with whitespace) is filtered like the column form
    val raw = text.toString.split("\\s+")
    var nTok = 0
    var i = 0
    while (i < raw.length) { if (raw(i).nonEmpty) nTok += 1; i += 1 }
    val toks = new Array[String](nTok)
    i = 0; var j = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) { toks(j) = raw(i); j += 1 }
      i += 1
    }
    if (nTok == 0 && !minOne) {
      new GenericArrayData(Array.empty[Any])
    } else if (nTok < n) {
      new GenericArrayData(Array[Any](
        UTF8String.fromString(toks.mkString(" "))))
    } else {
      val out = new Array[Any](nTok - n + 1)
      var s = 0
      while (s <= nTok - n) {
        val sb = new java.lang.StringBuilder(toks(s))
        var k = 1
        while (k < n) { sb.append(' ').append(toks(s + k)); k += 1 }
        out(s) = UTF8String.fromString(sb.toString)
        s += 1
      }
      new GenericArrayData(out)
    }
  }
}

case class WordShinglesExpr(child: Expression, n: Int,
                            minOne: Boolean = true)
    extends UnaryExpression {
  require(n >= 1, s"shingle size $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = if (minOne) "word_shingles" else "tokens"

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    TextKernels.wordShingles(input.asInstanceOf[UTF8String], n, minOne)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.wordShingles($c, $n, $minOne)")
}

object WordShinglesExpr {
  import org.apache.spark.sql.GraftColumnBridge
  def apply(text: Column, n: Int): Column =
    GraftColumnBridge.column(WordShinglesExpr(
      GraftColumnBridge.expression(text), n))

  /** Token semantics: n = 1 and an empty array for token-less text. */
  def tokens(text: Column): Column =
    GraftColumnBridge.column(WordShinglesExpr(
      GraftColumnBridge.expression(text), 1, minOne = false))
}
