package graft.grid

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Bucketed focal stats: result-identical to the cogroup path, and the
  * chunk-payload scan must feed the join WITHOUT an Exchange (only the
  * perimeter strips move).
  */
class FocalBucketedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      q +: walk(q.plan)
    case other => other +: other.children.flatMap(walk)
  }

  private lazy val (h, table) = {
    val root = java.nio.file.Files.createTempDirectory("focal_bk").toString
    SyntheticGrid.writeTiny(spark, root)
    FractionStore.writeBucketed(spark, SyntheticGrid.tinyHeader,
      FractionStore.fractions(spark, root), "focal_bk_tiny", nBuckets = 8)
    (SyntheticGrid.tinyHeader, "focal_bk_tiny")
  }

  private def sorted(df: DataFrame) = {
    val cols = df.columns.sorted.map(col(_))
    df.select(cols: _*).orderBy(col("x"), col("y"), col("t")).collect()
  }

  test("bucketed focal == cogroup focal, row for row") {
    val a = sorted(GridFocal.focalStatsBucketed(spark, h, table, 1, 0, 3))
    val root2 = java.nio.file.Files.createTempDirectory("focal_bk2").toString
    SyntheticGrid.writeTiny(spark, root2)
    val b = sorted(GridFocal.focalStats(spark, h, root2, 1, 0, 3))
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (ra, rb) => assert(ra == rb) }
  }

  test("chunk payloads never exchange: only the strip side shuffles") {
    val df = GridFocal.focalStatsBucketed(spark, h, table, 1, 0, 2)
    df.collect()
    val plans = walk(df.queryExecution.executedPlan)
    // the join's CHUNK side: scans the bucketed table directly (no
    // MapPartitions — that's the strip builder) and must contain no
    // ShuffleExchange; the strip side is free to shuffle/broadcast
    val joins = plans.filter(_.nodeName.contains("Join"))
    assert(joins.nonEmpty, "expected a join in the bucketed focal plan")
    val chunkSides = joins.flatMap(_.children).filter { side =>
      val sub = walk(side)
      sub.exists(p => p.nodeName.contains("Scan") &&
        p.toString.contains("focal_bk_tiny")) &&
        !sub.exists(_.nodeName.contains("MapPartitions"))
    }
    assert(chunkSides.nonEmpty, "no raw chunk-scan side found under the join")
    chunkSides.foreach { side =>
      assert(!walk(side).exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"chunk side must not exchange:\n$side")
    }
  }
}
