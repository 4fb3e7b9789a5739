package graft.grid

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData

/** Packed little-endian payload codec for fraction chunks.
  *
  * The store keeps chunk payloads as a single BINARY column in the
  * grid's native width (the reference's `.jdata` blobs,
  * rastercube/jgrid/jgrid3.py:65-77, are exactly this: raw C-order
  * numpy bytes). Against parquet `array<T>` payloads this is the
  * difference between memcpy-speed column IO and per-element row
  * assembly (measured ~3M elements/s/core on the array path — the
  * bottleneck of every tile-scale benchmark), and int16 grids take 2
  * bytes/value instead of parquet's 4-byte ints plus offsets.
  *
  * Values surface exactly: unsigned dtypes are widened on decode
  * (u8 -> int, u16 -> int), never sign-extended.
  */
object PayloadCodec {

  final val U8 = 0
  final val I16 = 1
  final val U16 = 2
  final val I32 = 3
  final val F32 = 4
  final val F64 = 5

  def code(dtype: String): Int = dtype match {
    case "uint8"   => U8
    case "int16"   => I16
    case "uint16"  => U16
    case "int32"   => I32
    case "float32" => F32
    case "float64" => F64
    case other     => throw new IllegalArgumentException(s"dtype $other")
  }

  def bytesPerElem(code: Int): Int = code match {
    case U8          => 1
    case I16 | U16   => 2
    case I32 | F32   => 4
    case F64         => 8
  }

  /** Encode doubles into the packed dtype (values must fit; integer
    * dtypes truncate like a numpy astype). */
  def encodeDouble(values: Array[Double], dtype: String): Array[Byte] = {
    val c = code(dtype)
    val bb = ByteBuffer.allocate(values.length * bytesPerElem(c))
      .order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    c match {
      case U8 =>
        while (i < values.length) { bb.put(values(i).toByte); i += 1 }
      case I16 | U16 =>
        while (i < values.length) { bb.putShort(values(i).toInt.toShort); i += 1 }
      case I32 =>
        while (i < values.length) { bb.putInt(values(i).toInt); i += 1 }
      case F32 =>
        while (i < values.length) { bb.putFloat(values(i).toFloat); i += 1 }
      case F64 =>
        while (i < values.length) { bb.putDouble(values(i)); i += 1 }
    }
    bb.array()
  }

  /** Decode to the Catalyst array of the grid's element type
    * (int for integer dtypes, float/double for float dtypes) — called
    * from generated code by [[graft.functions.UnpackPayloadExpr]]. */
  def decodeToArrayData(bytes: Array[Byte], code: Int): ArrayData = code match {
    case U8 =>
      val out = new Array[Int](bytes.length)
      var i = 0
      while (i < out.length) { out(i) = bytes(i) & 0xff; i += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    case I16 =>
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asShortBuffer()
      val out = new Array[Int](bytes.length / 2)
      var i = 0
      while (i < out.length) { out(i) = b.get(i); i += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    case U16 =>
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asShortBuffer()
      val out = new Array[Int](bytes.length / 2)
      var i = 0
      while (i < out.length) { out(i) = b.get(i) & 0xffff; i += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    case I32 =>
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asIntBuffer()
      val out = new Array[Int](bytes.length / 4)
      var i = 0
      while (i < out.length) { out(i) = b.get(i); i += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    case F32 =>
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asFloatBuffer()
      val out = new Array[Float](bytes.length / 4)
      var i = 0
      while (i < out.length) { out(i) = b.get(i); i += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    case F64 =>
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asDoubleBuffer()
      val out = new Array[Double](bytes.length / 8)
      var i = 0
      while (i < out.length) { out(i) = b.get(i); i += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Decode to doubles (exact for every supported dtype) — the
    * [[GridPipeline]] kernel payload shape. */
  def decodeDouble(bytes: Array[Byte], code: Int): Array[Double] = code match {
    case U8 =>
      val out = new Array[Double](bytes.length)
      var i = 0
      while (i < out.length) { out(i) = (bytes(i) & 0xff).toDouble; i += 1 }
      out
    case I16 =>
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asShortBuffer()
      val out = new Array[Double](bytes.length / 2)
      var i = 0
      while (i < out.length) { out(i) = b.get(i).toDouble; i += 1 }
      out
    case U16 =>
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asShortBuffer()
      val out = new Array[Double](bytes.length / 2)
      var i = 0
      while (i < out.length) { out(i) = (b.get(i) & 0xffff).toDouble; i += 1 }
      out
    case I32 =>
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asIntBuffer()
      val out = new Array[Double](bytes.length / 4)
      var i = 0
      while (i < out.length) { out(i) = b.get(i).toDouble; i += 1 }
      out
    case F32 =>
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asFloatBuffer()
      val out = new Array[Double](bytes.length / 4)
      var i = 0
      while (i < out.length) { out(i) = b.get(i).toDouble; i += 1 }
      out
    case F64 =>
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asDoubleBuffer()
      val out = new Array[Double](bytes.length / 8)
      var i = 0
      while (i < out.length) { out(i) = b.get(i); i += 1 }
      out
  }
}
