package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** One-pass SimHash vote aggregate: folds a group's token hashes into
  * all `bits` per-bit majority counters in a single typed buffer.
  *
  * The column formulation needs `bits` separate `sum(when(...))`
  * aggregate expressions — 60 aggregation buffers evaluated per input
  * row, ~60 codegen'd branch+add chains each carrying null handling.
  * This custom Catalyst aggregate keeps ONE long[bits + 1] buffer
  * (set-bit counts + row count) and emits the finished signature, with
  * semantics IDENTICAL to the column form (retained as
  * [[graft.ops.Dedup.simhashSignaturesColumnForm]] and pinned equal by
  * DedupSpec): a NULL hash — the explode_outer row of an empty
  * document — votes -1 on every bit, and bit i of the signature is set
  * iff strictly more hashes set it than clear it.
  */
case class SimhashVotesAgg(
    child: Expression, bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(bits >= 1 && bits <= 63, s"simhash bits $bits")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_votes"

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): SimhashVotesAgg = copy(child = c(0))

  override def withNewMutableAggBufferOffset(o: Int): SimhashVotesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimhashVotesAgg =
    copy(inputAggBufferOffset = o)

  // slots 0..bits-1: count of inputs with bit i set; slot bits: row count
  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits + 1)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    buf(bits) += 1
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < bits) {
        buf(i) += (h >>> i) & 1L
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i <= bits) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    // bit set iff votes = ones - (n - ones) > 0, i.e. 2*ones > n
    val n = buf(bits)
    var sim = 0L
    var i = 0
    while (i < bits) {
      if (2 * buf(i) > n) sim |= 1L << i
      i += 1
    }
    sim
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * (bits + 1))
    var i = 0
    while (i <= bits) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bits + 1)
    var i = 0
    while (i <= bits) { buf(i) = bb.getLong(); i += 1 }
    buf
  }
}

object SimhashVotesAgg {
  import org.apache.spark.sql.GraftColumnBridge

  def apply(hashes: Column, bits: Int): Column =
    GraftColumnBridge.column(
      SimhashVotesAgg(GraftColumnBridge.expression(hashes), bits)
        .toAggregateExpression())
}
