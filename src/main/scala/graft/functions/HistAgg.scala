package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mergeable equi-width histogram sketch over a fixed [lo, hi) range:
  * the quantile analogue of the HLL distinct-count cube
  * ([[graft.ops.Sketches]]). One typed buffer of `bins` longs per
  * group; out-of-range values clamp into the edge bins (totals are
  * preserved, so rank arithmetic downstream stays exact); NULLs are
  * skipped. Unlike `percentile_approx`'s adaptive sketch, the
  * equi-width layout is DETERMINISTIC — two builds over the same rows
  * produce identical arrays regardless of row order or partitioning —
  * which makes the sketch itself re-aggregatable (element-wise sum,
  * [[HistMergeAgg]]) and the whole chain DuckDB-oracle-able.
  *
  * Counts per bucket rather than per value mirrors the reference's
  * per-class pixel counting shape (jgrid masked frequency counts,
  * rastercube/analysis/stats.py); here the buckets are value ranges so
  * the persisted cube answers any later percentile question.
  */
case class EqHistAgg(
    child: Expression, lo: Double, hi: Double, bins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(bins >= 1 && bins <= (1 << 20), s"bins $bins")
  require(hi > lo, s"need hi > lo, got [$lo, $hi)")

  private val width = (hi - lo) / bins

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "eq_hist"

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): EqHistAgg = copy(child = c(0))

  override def withNewMutableAggBufferOffset(o: Int): EqHistAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): EqHistAgg =
    copy(inputAggBufferOffset = o)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bins)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (!d.isNaN) {
        val raw = math.floor((d - lo) / width)
        val bin =
          if (raw < 0) 0
          else if (raw >= bins) bins - 1
          else raw.toInt
        buf(bin) += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bins) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * bins)
    var i = 0
    while (i < bins) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bins)
    var i = 0
    while (i < bins) { buf(i) = bb.getLong(); i += 1 }
    buf
  }
}

object EqHistAgg {
  import org.apache.spark.sql.GraftColumnBridge

  def apply(value: Column, lo: Double, hi: Double, bins: Int): Column =
    GraftColumnBridge.column(
      EqHistAgg(GraftColumnBridge.expression(value.cast("double")),
        lo, hi, bins).toAggregateExpression())
}

/** Element-wise sum of `array<long>` rows — the lossless union that
  * rolls a fine-grain histogram cube up to any coarser grain without
  * touching raw data. All-NULL / empty groups evaluate to an empty
  * array (callers treat it as n = 0). Mixed lengths are a caller bug
  * (two cubes built with different `bins`) and fail loudly.
  */
case class HistMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hist_merge"

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): HistMergeAgg = copy(child = c(0))

  override def withNewMutableAggBufferOffset(o: Int): HistMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HistMergeAgg =
    copy(inputAggBufferOffset = o)

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def add(buf: Array[Long], in: Array[Long]): Array[Long] =
    if (in.isEmpty) buf
    else if (buf.isEmpty) in
    else {
      require(buf.length == in.length,
        s"histogram width mismatch: ${buf.length} vs ${in.length}")
      var i = 0
      while (i < buf.length) { buf(i) += in(i); i += 1 }
      buf
    }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else add(buf, v.asInstanceOf[ArrayData].toLongArray())
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    add(b1, b2)

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    buf
  }
}

object HistMergeAgg {
  import org.apache.spark.sql.GraftColumnBridge

  def apply(hist: Column): Column =
    GraftColumnBridge.column(
      HistMergeAgg(GraftColumnBridge.expression(hist))
        .toAggregateExpression())
}
