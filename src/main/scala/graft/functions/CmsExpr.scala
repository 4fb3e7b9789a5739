package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Count-Min-Sketch frequency estimate as a native codegen expression:
  * the probe side of the sketch-gated heavy-hitters pattern
  * ([[graft.ops.TermStats.heavyHitters]]). The serialized sketch rides
  * the plan as part of the expression and deserializes once per
  * executor (transient lazy); each row costs the sketch's depth-many
  * array reads — no UDF boxing, stays inside whole-stage codegen.
  *
  * The estimate is one-sided (never below the true count), which is the
  * property the gate relies on: `cms_estimate(h) >= T` cannot reject a
  * true heavy hitter.
  */
case class CmsEstimateExpr(sketchBytes: Array[Byte], child: Expression)
  extends UnaryExpression {

  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(sketchBytes))

  /** Called from generated code; `h` must be the same 64-bit hash the
    * sketch was built over. */
  def estimate(h: Long): Long = sketch.estimateCount(java.lang.Long.valueOf(h))

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override protected def withNewChildInternal(newChild: Expression): CmsEstimateExpr =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    estimate(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", this, classOf[CmsEstimateExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.estimate($c)")
  }
}

object CmsEstimateExpr {
  import org.apache.spark.sql.GraftColumnBridge
  def apply(sketchBytes: Array[Byte], hash: Column): Column =
    GraftColumnBridge.column(CmsEstimateExpr(sketchBytes,
      GraftColumnBridge.expression(hash)))
}
