package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve distance of a 2-D point as a native codegen
  * expression — the locality-preserving complement of
  * [[graft.ops.Layout.zorderKey]]: unlike Morton order, consecutive
  * Hilbert keys are ALWAYS adjacent cells (no quadrant-boundary jumps),
  * which gives measurably tighter per-file min/max hulls when a table
  * is range-partitioned on the key (the layout trick lake formats
  * expose as `OPTIMIZE ... ZORDER/HILBERT BY`).
  *
  * The xy→d walk is the classic bitwise quadrant rotate-and-flip
  * (Hilbert 1891; the iterative formulation of Warren, Hacker's
  * Delight §16-1): per output bit it inspects one bit of each
  * coordinate and rotates the frame, state carried in two longs. That
  * per-bit state chain is why this is a NATIVE expression and not a
  * Column composition: unrolling `bits` dependent (x, y) updates as
  * expressions multiplies the tree ~4× per level (the round-8
  * iterative-plan-blowup lesson), while here it is a `bits`-iteration
  * Java loop that whole-stage codegen calls as one static method —
  * no UDF boxing, null-safe via the BinaryExpression contract.
  */
case class HilbertKeyExpr(bits: Int, left: Expression, right: Expression)
  extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"hilbert bits $bits out of range")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_key"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertKeyExpr =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertKeyExpr.xy2d(bits, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HilbertKeyExpr.xy2d($bits, $a, $b)")
}

object HilbertKeyExpr {

  /** Hilbert distance of (`x`, `y`) on the 2^bits × 2^bits grid.
    * Coordinates are masked to `bits` bits (callers normalize first,
    * same contract as the Morton key). Static so generated code calls
    * it directly. */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    val mask = n - 1L
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) != 0L) 1L else 0L
      val ry = if ((y & s) != 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate/flip the quadrant frame
      if (ry == 0L) {
        if (rx == 1L) {
          x = mask - x
          y = mask - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  import org.apache.spark.sql.GraftColumnBridge
  def apply(bits: Int, a: Column, b: Column): Column =
    GraftColumnBridge.column(HilbertKeyExpr(bits,
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
