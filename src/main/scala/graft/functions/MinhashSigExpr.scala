package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native one-pass MinHash signature.
  *
  * The column form
  * `array((0 until k).map(i => array_min(transform(hashes, h =>
  * xxhash64(h, lit(i))))))` evaluates k separate interpreted
  * higher-order passes over every row's shingle-hash array, and each
  * element of each pass re-derives the shared inner state: Spark's
  * `xxhash64(h, lit(i))` folds as `hashInt(i, hashLong(h, 42))`, so the
  * `hashLong(h, 42)` half is recomputed k times per element. MinHash
  * runs over EVERY shingle of EVERY document — with k=32 this is the
  * hottest remaining text-path loop after the simhash kernel (r5).
  *
  * This kernel computes all k minima in ONE pass, sharing
  * `hashLong(h, 42)` across hash functions — bit-identical values via
  * the same [[XXH64]] primitives the built-in expression uses
  * (GraftFunctionsSpec pins native == column-form equality).
  * Edge semantics mirror the column form: NULL array -> NULL; empty
  * array -> k NULL entries (`array_min` of an empty transform). Null
  * ELEMENTS cannot occur in-engine (inputs are xxhash64 outputs); the
  * kernel returns NULL for the whole signature if one appears.
  */
object MinhashKernels {

  def minhashSig(hashes: ArrayData, k: Int): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](k))
    val out = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (hashes.isNullAt(j)) return null
      val hh = XXH64.hashLong(hashes.getLong(j), 42L)
      var i = 0
      while (i < k) {
        val v = XXH64.hashInt(i, hh)
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

case class MinhashSigExpr(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig needs array<bigint>, got $t")
    }

  override protected def withNewChildInternal(c: Expression): MinhashSigExpr =
    copy(child = c)

  override def nullSafeEval(a: Any): Any =
    MinhashKernels.minhashSig(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sig = ctx.freshName("mhsig")
      s"""
        org.apache.spark.sql.catalyst.util.ArrayData $sig =
          graft.functions.MinhashKernels.minhashSig($a, $k);
        if ($sig == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $sig; }
      """
    })
}

object MinhashSigExpr {
  import org.apache.spark.sql.GraftColumnBridge
  def apply(hashes: Column, k: Int): Column =
    GraftColumnBridge.column(MinhashSigExpr(
      GraftColumnBridge.expression(hashes), k))
}
