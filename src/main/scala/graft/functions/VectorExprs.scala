package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector kernels for the similarity operators: the
  * `zip_with`/`aggregate` higher-order formulation is CodegenFallback
  * (every element pays an interpreted lambda dispatch), while ANN
  * brute-force/LSH bucketing evaluate |corpus| x |queries| (or
  * x nPlanes) dot products — the one place in the engine where scalar
  * fold cost multiplies. This expression generates a tight primitive
  * loop instead.
  *
  * Semantics are BIT-IDENTICAL to
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  * 0.0, _ + _)`: left-to-right double accumulation, NULL when either
  * array is NULL, when lengths differ (zip_with pads the shorter side
  * with NULL), or when any element is NULL — so swapping the
  * implementation cannot move a single float in the oracle-checked
  * outputs.
  */
object VectorKernels {

  /** Boxed so a NULL result can flow back through codegen. */
  def dot(a: ArrayData, b: ArrayData,
          aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}

/** double dot product of two numeric-array columns (float32 or float64
  * element types, independently per side). */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"dot product needs array<float|double>, got $t")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val af = isFloat(left); val bf = isFloat(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dot")
      s"""
        java.lang.Double $boxed =
          graft.functions.VectorKernels.dot($a, $b, $af, $bf);
        if ($boxed == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $boxed.doubleValue(); }
      """
    })
  }
}

object DotProductExpr {
  import org.apache.spark.sql.GraftColumnBridge
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProductExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
