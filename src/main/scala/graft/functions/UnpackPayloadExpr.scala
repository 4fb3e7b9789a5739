package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType}

import graft.grid.{FractionStore, PayloadCodec}

/** Native Catalyst expression decoding a packed binary fraction payload
  * into an array of the grid's element type (see
  * [[graft.grid.PayloadCodec]]).
  *
  * Codegen is a single static call returning an `UnsafeArrayData`, so
  * the decode is one tight primitive loop per CHUNK row (~10^5..10^6
  * elements) and stays inside whole-stage codegen — downstream
  * `posexplode`/`element_at` operate on the materialized array at O(1)
  * per pixel. This replaces parquet `array<T>` payloads, whose
  * per-element row assembly dominated every tile-scale benchmark.
  */
case class UnpackPayloadExpr(child: Expression, dtypeCode: Int,
                             elemType: DataType) extends UnaryExpression {

  override def dataType: DataType = ArrayType(elemType, containsNull = false)
  override def prettyName: String = "unpack_payload"

  override protected def withNewChildInternal(newChild: Expression): UnpackPayloadExpr =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    PayloadCodec.decodeToArrayData(input.asInstanceOf[Array[Byte]], dtypeCode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.grid.PayloadCodec.decodeToArrayData($c, $dtypeCode)")
}

object UnpackPayloadExpr {
  import org.apache.spark.sql.GraftColumnBridge

  /** Column factory: payload column + grid dtype name. */
  def apply(data: Column, dtype: String): Column =
    GraftColumnBridge.column(UnpackPayloadExpr(
      GraftColumnBridge.expression(data),
      PayloadCodec.code(dtype), FractionStore.elementType(dtype)))
}
