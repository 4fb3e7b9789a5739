package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Native Catalyst expression for ray-casting point-in-polygon
  * (reference: F8 — rastercube/imutils.py:5-17).
  *
  * The Column-fold form in [[graft.grid.PointInPolygon.containsCol]]
  * unrolls one `when` per edge: fine for small rings, but generated code
  * grows linearly with vertex count and large polygons (coastlines,
  * admin boundaries) blow past JVM method limits. This expression keeps
  * the polygon as a referenced object and emits a LOOP in `doGenCode`,
  * so codegen cost is O(1) in vertex count while staying inside
  * whole-stage codegen.
  */
case class PointInPolygonExpr(
    xs: Array[Double], ys: Array[Double],
    left: Expression, right: Expression) extends BinaryExpression {

  require(xs.length == ys.length && xs.length >= 3)

  override def dataType: DataType = BooleanType
  override def prettyName: String = "point_in_polygon"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PointInPolygonExpr =
    copy(left = newLeft, right = newRight)

  @inline private def rayCast(px: Double, py: Double): Boolean = {
    var inside = false
    var i = 0
    var j = xs.length - 1
    while (i < xs.length) {
      val yi = ys(i); val yj = ys(j)
      if ((yi > py) != (yj > py) &&
          px < (xs(j) - xs(i)) * (py - yi) / (yj - yi) + xs(i)) {
        inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  override def nullSafeEval(pxAny: Any, pyAny: Any): Any =
    rayCast(pxAny.asInstanceOf[Double], pyAny.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xsRef = ctx.addReferenceObj("pipXs", xs, "double[]")
    val ysRef = ctx.addReferenceObj("pipYs", ys, "double[]")
    nullSafeCodeGen(ctx, ev, (px, py) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val yi = ctx.freshName("yi")
      val yj = ctx.freshName("yj")
      val acc = ctx.freshName("acc")
      s"""
         |boolean $acc = false;
         |int $j = $xsRef.length - 1;
         |for (int $i = 0; $i < $xsRef.length; $i++) {
         |  double $yi = $ysRef[$i]; double $yj = $ysRef[$j];
         |  if (($yi > $py) != ($yj > $py) &&
         |      $px < ($xsRef[$j] - $xsRef[$i]) * ($py - $yi) / ($yj - $yi) + $xsRef[$i]) {
         |    $acc = !$acc;
         |  }
         |  $j = $i;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }
}

object PointInPolygonExpr {
  import org.apache.spark.sql.GraftColumnBridge

  /** Column factory: polygon vertices as (x, y) pairs. */
  def apply(poly: Array[(Double, Double)], px: Column, py: Column): Column =
    GraftColumnBridge.column(PointInPolygonExpr(
      poly.map(_._1), poly.map(_._2),
      GraftColumnBridge.expression(px), GraftColumnBridge.expression(py)))
}
