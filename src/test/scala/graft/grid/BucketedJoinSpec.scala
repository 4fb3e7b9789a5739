package graft.grid

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.TestSpark

/** J2 — co-located chunk joins via bucketed tables: same bucket count on
  * (frac_num, time_chunk) on both sides means the aligned join plans
  * WITHOUT any shuffle exchange, and results equal the shuffling path.
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // finalize any adaptive plan
    val plan = df.queryExecution.executedPlan
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case other =>
          other +: (other.children.flatMap(walk) ++
            other.subqueries.flatMap(walk))
      }
    walk(plan).count(_.isInstanceOf[ShuffleExchangeExec])
  }

  test("bucketed two-grid align joins with zero shuffles, same results") {
    val ndviRoot = java.nio.file.Files.createTempDirectory("graft_bk_n").toString
    val qaRoot = java.nio.file.Files.createTempDirectory("graft_bk_q").toString
    val (nh, qh) = SyntheticGrid.writeMiniModis(spark, ndviRoot, qaRoot)

    FractionStore.writeBucketed(spark, nh,
      FractionStore.fractions(spark, ndviRoot), "bk_ndvi", nBuckets = 8)
    FractionStore.writeBucketed(spark, qh,
      FractionStore.fractions(spark, qaRoot), "bk_qa", nBuckets = 8)
    try {
      val joined = FractionStore.bucketedAlignedJoin(spark,
        nh, "bk_ndvi", qh, "bk_qa", masks = Seq(true, false))
      assert(shuffleCount(joined) == 0,
        "bucketed chunk join must not exchange either side")

      // same values as the shuffling aligned load over the full extent
      val expected = FractionStore.loadAlignedSliceXY(spark,
        Seq((nh, ndviRoot), (qh, qaRoot)),
        0, nh.width, 0, nh.height, 0, nh.nDates, masks = Seq(true, false))
      val got = joined.agg(
        count(lit(1)), count(col("value_0")), sum(col("value_0")),
        sum(col("value_1"))).collect()(0)
      val exp = expected.agg(
        count(lit(1)), count(col("value_0")), sum(col("value_0")),
        sum(col("value_1"))).collect()(0)
      assert(got == exp)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_ndvi")
      spark.sql("DROP TABLE IF EXISTS bk_qa")
      GridExportsHelper.rm(spark, ndviRoot); GridExportsHelper.rm(spark, qaRoot)
    }
  }
}

private object GridExportsHelper {
  def rm(spark: org.apache.spark.sql.SparkSession, root: String): Unit =
    try graft.sources.GridExports.deleteStore(spark, root)
    catch { case _: Throwable => }
}
