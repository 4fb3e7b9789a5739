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
}
