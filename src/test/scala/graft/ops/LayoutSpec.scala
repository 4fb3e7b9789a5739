package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Z-order layout: the key must be the exact Morton interleave, the
  * layout plan must be one range exchange + a partition-local sort, and
  * the point of it all — per-file min/max hulls that are tight in BOTH
  * dimensions — must hold on real data. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def morton(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zorderKey equals the reference interleave, incl. masking") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (70000L, 3L), (12345L, 54321L), (255L, 256L))
    val got = rows.toDF("a", "b")
      .select(Layout.zorderKey(col("a"), col("b"), 16).as("z"))
      .as[Long].collect()
    rows.zip(got).foreach { case ((a, b), z) =>
      assert(z == morton(a & 65535, b & 65535, 16), s"($a, $b)")
    }
  }

  test("layout plans one range exchange + non-global sort") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, i * 37 % 1000)).toDF("a", "b")
    val plans = TestSpark.executedPlan(
      Layout.zorderLayout(df, col("a"), col("b"), bits = 10, numParts = 8))
    val ex = plans.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(ex.size == 1 && ex.head.outputPartitioning.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.physical.RangePartitioning],
      s"expected one range exchange:\n${plans.head}")
    val sorts = plans.collect {
      case s: org.apache.spark.sql.execution.SortExec => s }
    assert(sorts.nonEmpty && sorts.forall(!_.global),
      "sort must be partition-local, never a global sort")
  }

  test("z-order files have tight min/max hulls in BOTH dimensions") {
    import spark.implicits._
    // 64x64 grid of points; compare per-partition bounding boxes under
    // z-order layout vs single-column layout. The one-column layout has
    // perfect `a` hulls but full-range `b` hulls; z-order must bound
    // BOTH: every partition's hull area stays a small fraction of the
    // domain, which is what makes min/max skipping work on either key.
    val pts = (for (a <- 0 until 64; b <- 0 until 64) yield (a, b))
      .toDF("a", "b")
    val z = Layout.zorderLayout(pts, col("a"), col("b"), bits = 6,
        numParts = 16)
      .groupBy(spark_partition_id().as("p"))
      .agg(((max(col("a")) - min(col("a")) + 1) *
        (max(col("b")) - min(col("b")) + 1)).as("hull"))
      .agg(max(col("hull"))).as[Long].collect()(0)
    // 16 partitions of 256 points each; a z-curve segment's hull stays
    // within a small constant of its point count — far below the 64x64
    // domain a one-column sort would give the unsorted dimension
    assert(z <= 4 * 256, s"worst z-order hull area $z")
  }

  private def hilbertRef(bits: Int, x0: Long, y0: Long): Long = {
    val mask = (1L << bits) - 1
    var x = x0 & mask; var y = y0 & mask
    var d = 0L; var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0L) 1L else 0L
      val ry = if ((y & s) != 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = mask - x; y = mask - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("hilbertKey equals the reference walk (eval + codegen), " +
    "incl. masking") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L),
      (65535L, 65535L), (70000L, 3L), (12345L, 54321L), (255L, 256L))
    val got = rows.toDF("a", "b")
      .select(Layout.hilbertKey(col("a"), col("b"), 16).as("h"))
      .as[Long].collect()
    rows.zip(got).foreach { case ((a, b), h) =>
      assert(h == hilbertRef(16, a, b), s"($a, $b)")
    }
    // interpreted eval path (no codegen) must agree
    rows.foreach { case (a, b) =>
      assert(graft.functions.HilbertKeyExpr.xy2d(16, a, b) ==
        hilbertRef(16, a, b))
    }
  }

  test("hilbert curve: a bijection whose consecutive keys are " +
    "grid-adjacent (the locality property z-order lacks)") {
    val bits = 3; val n = 1 << bits
    val pts = (for (x <- 0 until n; y <- 0 until n)
      yield (graft.functions.HilbertKeyExpr.xy2d(bits, x, y), x, y))
      .sortBy(_._1)
    assert(pts.map(_._1) == (0 until n * n).map(_.toLong),
      "keys must be a bijection onto [0, n²)")
    pts.sliding(2).foreach { case Seq((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"($x1,$y1) -> ($x2,$y2) not adjacent")
    }
    // z-order violates adjacency at quadrant seams (what hilbert fixes)
    val zpts = (for (x <- 0 until n; y <- 0 until n)
      yield (morton(x, y, bits), x, y)).sortBy(_._1)
    val zJumps = zpts.sliding(2).count {
      case Seq((_, x1, y1), (_, x2, y2)) =>
        math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(zJumps > 0, "morton should jump at seams")
  }

  test("hilbert files have tight min/max hulls in BOTH dimensions") {
    import spark.implicits._
    val pts = (for (a <- 0 until 64; b <- 0 until 64) yield (a, b))
      .toDF("a", "b")
    val h = Layout.hilbertLayout(pts, col("a"), col("b"), bits = 6,
        numParts = 16)
      .groupBy(spark_partition_id().as("p"))
      .agg(((max(col("a")) - min(col("a")) + 1) *
        (max(col("b")) - min(col("b")) + 1)).as("hull"))
      .agg(max(col("hull"))).as[Long].collect()(0)
    // a hilbert segment of 256 points is one connected region; its hull
    // stays within a small constant of the point count
    assert(h <= 4 * 256, s"worst hilbert hull area $h")
  }
}
