package graft.grid

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class PayloadCodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val samples: Map[String, Array[Double]] = Map(
    "uint8"   -> Array(0, 1, 127, 128, 255).map(_.toDouble),
    "int16"   -> Array(-32768, -1, 0, 1, 32767).map(_.toDouble),
    "uint16"  -> Array(0, 1, 32767, 32768, 65535).map(_.toDouble),
    "int32"   -> Array(Int.MinValue, -1, 0, 1, Int.MaxValue).map(_.toDouble),
    "float32" -> Array(-999.0, 0.5, 1.5e10, -3000.0, 96.0),
    "float64" -> Array(-999.0, math.Pi, 1.5e300, -3000.0, 96.0))

  test("encodeDouble/decodeDouble round-trips every dtype exactly") {
    for ((dtype, vals) <- samples) {
      val c = PayloadCodec.code(dtype)
      val bytes = PayloadCodec.encodeDouble(vals, dtype)
      assert(bytes.length == vals.length * PayloadCodec.bytesPerElem(c))
      val back = PayloadCodec.decodeDouble(bytes, c)
      val expected = dtype match {
        case "float32" => vals.map(v => v.toFloat.toDouble)
        case _         => vals
      }
      assert(back.toSeq == expected.toSeq, s"dtype $dtype")
    }
  }

  test("UnpackPayloadExpr decodes inside codegen to the element type") {
    import spark.implicits._
    for ((dtype, vals) <- samples) {
      val c = PayloadCodec.code(dtype)
      val df = Seq(Tuple1(PayloadCodec.encodeDouble(vals, dtype))).toDF("data")
        .select(explode(graft.functions.UnpackPayloadExpr(col("data"), dtype))
          .as("v"))
      val got = df.select(col("v").cast("double")).as[Double].collect().toSeq
      val expected = dtype match {
        case "float32" => vals.map(v => v.toFloat.toDouble).toSeq
        case _         => vals.toSeq
      }
      assert(got == expected, s"dtype $dtype")
      // element type matches the store's pixel-view contract
      val et = Seq(Tuple1(PayloadCodec.encodeDouble(vals, dtype))).toDF("data")
        .select(graft.functions.UnpackPayloadExpr(col("data"), dtype).as("a"))
        .schema("a").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      assert(et.elementType == FractionStore.elementType(dtype))
    }
  }

  test("nodata survives the packed round-trip for int dtypes (P9)") {
    // -3000 in int16, 65535 in uint16 — the MODIS nodata pair
    val ndvi = PayloadCodec.decodeDouble(
      PayloadCodec.encodeDouble(Array(-3000.0), "int16"), PayloadCodec.I16)
    val qa = PayloadCodec.decodeDouble(
      PayloadCodec.encodeDouble(Array(65535.0), "uint16"), PayloadCodec.U16)
    assert(ndvi.head == -3000.0 && qa.head == 65535.0)
  }
}
