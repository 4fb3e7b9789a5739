package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering of a
  * table on two columns so that parquet min/max statistics prune scans
  * filtered on EITHER dimension.
  *
  * Range-partitioning + sorting on one column gives perfect skipping on
  * that column and none on any other; interleaving the bits of two
  * normalized keys gives every file a tight min/max hull in BOTH
  * dimensions (the classic space-filling-curve layout trick that lake
  * formats expose as `OPTIMIZE ... ZORDER BY`). At 100 TB this is the
  * difference between a full scan and reading a few percent of files
  * for a box predicate on (dimension_a, dimension_b).
  *
  * Everything here is built from codegen'd built-ins (shifts, masks,
  * adds) — no UDF — and the layout itself is one RangePartitioning
  * exchange plus a partition-local sort (no global sort node).
  */
object Layout {

  /** Morton key of two non-negative int columns: the low `bits` bits of
    * `a` and `b` interleaved (a at even positions, b at odd), as a
    * non-negative long. Values are masked to `bits` bits first, so
    * callers normalize (bucket/clamp) beforehand; 2·bits <= 62. */
  def zorderKey(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"zorder bits $bits out of range")
    val mask = (1L << bits) - 1
    val am = a.cast("long").bitwiseAND(lit(mask))
    val bm = b.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftleft(shiftright(am, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(bm, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Cluster `df` on the Z-order of (`a`, `b`): adds `zkey`, range-
    * partitions on it into `numParts` output files and sorts within
    * each partition — each output file then holds one contiguous curve
    * segment, i.e. a tight min/max box in both dimensions. */
  def zorderLayout(df: DataFrame, a: Column, b: Column,
                   bits: Int = 16, numParts: Int = 32): DataFrame =
    df.withColumn("zkey", zorderKey(a, b, bits))
      .repartitionByRange(numParts, col("zkey"))
      .sortWithinPartitions(col("zkey"))

  /** Hilbert-curve key of two non-negative int columns (masked to
    * `bits` bits, same normalization contract as [[zorderKey]]) — the
    * strictly-locality-preserving alternative: consecutive keys are
    * always grid-adjacent, so range-partition hulls are tighter than
    * Morton's quadrant-jump seams. Native codegen expression
    * ([[graft.functions.HilbertKeyExpr]] — the per-bit rotate state
    * chain would blow up as unrolled Columns). */
  def hilbertKey(a: Column, b: Column, bits: Int = 16): Column =
    graft.functions.HilbertKeyExpr(bits, a.cast("long"), b.cast("long"))

  /** Cluster `df` on the Hilbert key of (`a`, `b`) — adds `hkey`;
    * same one-exchange range layout as [[zorderLayout]]. */
  def hilbertLayout(df: DataFrame, a: Column, b: Column,
                    bits: Int = 16, numParts: Int = 32): DataFrame =
    df.withColumn("hkey", hilbertKey(a, b, bits))
      .repartitionByRange(numParts, col("hkey"))
      .sortWithinPartitions(col("hkey"))
}
