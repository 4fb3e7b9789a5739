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
    * dtypes truncate like a numpy astype).
    *
    * One METHOD per dtype, not one match with six hot loops: a shared
    * body whose hot branch flips between callers (ingest hammers
    * int16, the pyramid writer float64) can deopt-cycle until HotSpot
    * marks it not-compilable and leaves it interpreted — observed as a
    * per-JVM-sticky ~200x slowdown of exactly one bulk path.
    */
  def encodeDouble(values: Array[Double], dtype: String): Array[Byte] = {
    val c = code(dtype)
    val bb = ByteBuffer.allocate(values.length * bytesPerElem(c))
      .order(ByteOrder.LITTLE_ENDIAN)
    c match {
      case U8        => encU8(values, bb)
      case I16 | U16 => encI16(values, bb)
      case I32       => encI32(values, bb)
      case F32       => encF32(values, bb)
      case F64       => encF64(values, bb)
    }
    bb.array()
  }

  private def encU8(v: Array[Double], bb: ByteBuffer): Unit = {
    var i = 0; while (i < v.length) { bb.put(v(i).toByte); i += 1 }
  }
  private def encI16(v: Array[Double], bb: ByteBuffer): Unit = {
    var i = 0; while (i < v.length) { bb.putShort(v(i).toInt.toShort); i += 1 }
  }
  private def encI32(v: Array[Double], bb: ByteBuffer): Unit = {
    var i = 0; while (i < v.length) { bb.putInt(v(i).toInt); i += 1 }
  }
  private def encF32(v: Array[Double], bb: ByteBuffer): Unit = {
    var i = 0; while (i < v.length) { bb.putFloat(v(i).toFloat); i += 1 }
  }
  private def encF64(v: Array[Double], bb: ByteBuffer): Unit = {
    var i = 0; while (i < v.length) { bb.putDouble(v(i)); i += 1 }
  }

  /** Decode to the Catalyst array of the grid's element type
    * (int for integer dtypes, float/double for float dtypes) — called
    * from generated code by [[graft.functions.UnpackPayloadExpr]]. */
  def decodeToArrayData(bytes: Array[Byte], code: Int): ArrayData = code match {
    case U8  => adU8(bytes)
    case I16 => adI16(bytes)
    case U16 => adU16(bytes)
    case I32 => adI32(bytes)
    case F32 => adF32(bytes)
    case F64 => adF64(bytes)
  }

  private def adU8(bytes: Array[Byte]): ArrayData = {
    val out = new Array[Int](bytes.length)
    var i = 0
    while (i < out.length) { out(i) = bytes(i) & 0xff; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
  private def adI16(bytes: Array[Byte]): ArrayData = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asShortBuffer()
    val out = new Array[Int](bytes.length / 2)
    var i = 0
    while (i < out.length) { out(i) = b.get(i); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
  private def adU16(bytes: Array[Byte]): ArrayData = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asShortBuffer()
    val out = new Array[Int](bytes.length / 2)
    var i = 0
    while (i < out.length) { out(i) = b.get(i) & 0xffff; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
  private def adI32(bytes: Array[Byte]): ArrayData = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asIntBuffer()
    val out = new Array[Int](bytes.length / 4)
    var i = 0
    while (i < out.length) { out(i) = b.get(i); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
  private def adF32(bytes: Array[Byte]): ArrayData = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asFloatBuffer()
    val out = new Array[Float](bytes.length / 4)
    var i = 0
    while (i < out.length) { out(i) = b.get(i); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
  private def adF64(bytes: Array[Byte]): ArrayData = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asDoubleBuffer()
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = b.get(i); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Decode to doubles (exact for every supported dtype) — the
    * [[GridPipeline]] kernel payload shape. */
  def decodeDouble(bytes: Array[Byte], code: Int): Array[Double] = code match {
    case U8  => decU8(bytes)
    case I16 => decI16(bytes)
    case U16 => decU16(bytes)
    case I32 => decI32(bytes)
    case F32 => decF32(bytes)
    case F64 => decF64(bytes)
  }

  private def decU8(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bytes.length)
    var i = 0
    while (i < out.length) { out(i) = (bytes(i) & 0xff).toDouble; i += 1 }
    out
  }
  private def decI16(bytes: Array[Byte]): Array[Double] = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asShortBuffer()
    val out = new Array[Double](bytes.length / 2)
    var i = 0
    while (i < out.length) { out(i) = b.get(i).toDouble; i += 1 }
    out
  }
  private def decU16(bytes: Array[Byte]): Array[Double] = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asShortBuffer()
    val out = new Array[Double](bytes.length / 2)
    var i = 0
    while (i < out.length) { out(i) = (b.get(i) & 0xffff).toDouble; i += 1 }
    out
  }
  private def decI32(bytes: Array[Byte]): Array[Double] = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asIntBuffer()
    val out = new Array[Double](bytes.length / 4)
    var i = 0
    while (i < out.length) { out(i) = b.get(i).toDouble; i += 1 }
    out
  }
  private def decF32(bytes: Array[Byte]): Array[Double] = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asFloatBuffer()
    val out = new Array[Double](bytes.length / 4)
    var i = 0
    while (i < out.length) { out(i) = b.get(i).toDouble; i += 1 }
    out
  }
  private def decF64(bytes: Array[Byte]): Array[Double] = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asDoubleBuffer()
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = b.get(i); i += 1 }
    out
  }
}
