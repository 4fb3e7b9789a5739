package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap per-group top-k aggregate: keeps the k best
  * (score, id) pairs per group in a k-element binary min-heap, ordered
  * by (score DESC, id ASC) — `row_number() <= k` semantics under that
  * total order.
  *
  * The window-rank formulation (the `rank_topn` query) shuffles EVERY
  * row of the group to one partition and sorts it, so a group's cost is
  * O(n log n) rows through the exchange. This aggregate is the at-scale
  * shape: partial heaps of at most k entries fold map-side, the shuffle
  * carries one k-sized buffer per (partition, group), and merge is
  * O(k log k). At 100 TB a per-key top-5 over billions of rows moves
  * ~k x groups rows instead of the whole table. The A/B is recorded as
  * the `topk_heap_agg` / `topk_window` bench pair; result equality with
  * the windowed form is pinned by TopKAggSpec and the shared
  * `topk_group` DuckDB oracle.
  *
  * NULL scores and NULL ids are skipped (ORDER BY ... DESC places
  * NULLs last in both engines; they can never enter a full top-k —
  * excluding them entirely keeps the semantics engine-portable for
  * groups smaller than k).
  */
case class TopKAgg(
    score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKAgg.Heap] {

  require(k >= 1 && k <= (1 << 20), s"top-k size $k out of range")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(TopKAgg.entrySchema,
    containsNull = false)
  override def prettyName: String = "topk_agg"

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKAgg = copy(score = c(0), id = c(1))

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)

  override def createAggregationBuffer(): TopKAgg.Heap = new TopKAgg.Heap(k)

  override def update(buf: TopKAgg.Heap, input: InternalRow): TopKAgg.Heap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(b1: TopKAgg.Heap, b2: TopKAgg.Heap): TopKAgg.Heap = {
    var i = 0
    while (i < b2.size) { b1.offer(b2.scores(i), b2.ids(i)); i += 1 }
    b1
  }

  override def eval(buf: TopKAgg.Heap): Any = {
    // drain to (score DESC, id ASC) order
    val n = buf.size
    val idx = Array.range(0, n).sortWith { (a, b) =>
      TopKAgg.better(buf.scores(a), buf.ids(a), buf.scores(b), buf.ids(b))
    }
    val rows = new Array[Any](n)
    var i = 0
    while (i < n) {
      rows(i) = new GenericInternalRow(
        Array[Any](buf.ids(idx(i)), buf.scores(idx(i))))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKAgg.Heap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val h = new TopKAgg.Heap(k)
    var i = 0
    while (i < n) { h.offer(bb.getDouble(), bb.getLong()); i += 1 }
    h
  }
}

object TopKAgg {
  import org.apache.spark.sql.GraftColumnBridge

  val entrySchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  /** True when (s1, i1) ranks strictly better than (s2, i2) under
    * (score DESC, id ASC). Uses the TOTAL double order
    * (java.lang.Double.compare: NaN greater than everything,
    * -0.0 < 0.0) — the order Spark's sort/window uses — so NaN scores
    * rank FIRST under desc instead of poisoning the heap invariant
    * (with IEEE comparisons a NaN neither wins nor loses any
    * comparison, so it could enter a heap but never be evicted, and
    * the eval() drain's sortWith would see an inconsistent ordering). */
  @inline def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  /** k-bounded binary min-heap over (score, id); the root is the WORST
    * kept entry, so a full heap admits a new entry only by evicting it. */
  final class Heap(k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var size: Int = 0

    def offer(s: Double, id: Long): Unit = {
      if (size < k) {
        // sift up
        var c = size
        scores(c) = s; ids(c) = id; size += 1
        while (c > 0 && better(scores((c - 1) / 2), ids((c - 1) / 2),
            scores(c), ids(c))) {
          val p = (c - 1) / 2
          swap(c, p); c = p
        }
      } else if (better(s, id, scores(0), ids(0))) {
        // replace root, sift down
        scores(0) = s; ids(0) = id
        var c = 0
        var done = false
        while (!done) {
          val l = 2 * c + 1; val r = 2 * c + 2
          var worst = c
          if (l < size && better(scores(worst), ids(worst), scores(l), ids(l)))
            worst = l
          if (r < size && better(scores(worst), ids(worst), scores(r), ids(r)))
            worst = r
          if (worst == c) done = true
          else { swap(c, worst); c = worst }
        }
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }
  }

  /** array<struct<id, score>> of the group's k best rows by
    * (score DESC, id ASC). */
  def apply(score: Column, id: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKAgg(GraftColumnBridge.expression(score),
        GraftColumnBridge.expression(id), k).toAggregateExpression())
}
