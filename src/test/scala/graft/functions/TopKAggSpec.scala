package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The bounded-heap top-k aggregate must equal the window
  * row_number()<=k form — ties, small groups, NULLs and all — and keep
  * its partial (map-side) aggregation below the shuffle. */
class TopKAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def windowed(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("g"))
      .orderBy(col("s").desc, col("id"))
    df.filter(col("s").isNotNull)
      .select(col("g"), col("id"), col("s"), row_number().over(w).as("rn"))
      .filter(col("rn") <= k).drop("rn")
  }

  private def heaped(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(TopKAgg(col("s"), col("id"), k).as("top"))
      .select(col("g"), explode(col("top")).as("e"))
      .select(col("g"), col("e.id").as("id"), col("e.score").as("s"))

  test("heap top-k equals window row_number on ties, nulls, small groups") {
    import spark.implicits._
    // deterministic mix: heavy ties (s = id % 7), one tiny group (g=9
    // has fewer than k rows), every 11th score NULL
    val df = (0L until 2000L).map { id =>
      val g = if (id % 13 == 0) 9 else (id % 5).toInt
      val s: java.lang.Double =
        if (id % 11 == 0) null else (id % 7).toDouble
      (g, id, s)
    }.toDF("g", "id", "s").repartition(7)
    for (k <- Seq(1, 3, 16)) {
      val got = heaped(df, k).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sorted
      val want = windowed(df, k).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sorted
      assert(got.toSeq == want.toSeq, s"k=$k")
    }
  }

  test("merge path: partial heaps from many partitions fold correctly") {
    import spark.implicits._
    // every partition contributes candidates to every group, so the
    // final heap is built almost entirely by merge(), not update()
    val df = (0L until 5000L).map(id => ((id % 3).toInt, id, (id % 97).toDouble))
      .toDF("g", "id", "s").repartition(32)
    val got = heaped(df, 10).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sorted
    val want = windowed(df, 10).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sorted
    assert(got.toSeq == want.toSeq)
  }

  test("partial aggregation runs below the exchange (map-side heaps)") {
    import spark.implicits._
    val df = (0L until 100L).map(id => ((id % 3).toInt, id, id.toDouble))
      .toDF("g", "id", "s").repartition(4)
    val q = heaped(df, 5)
    q.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        s +: walk(s.plan)
      case other => other +: (other.children ++ other.subqueries).flatMap(walk)
    }
    val plans = walk(q.queryExecution.executedPlan)
    val aggs = plans.filter(_.nodeName.contains("ObjectHashAggregate"))
    assert(aggs.size >= 2,
      s"expected partial+final ObjectHashAggregate, got:\n${plans.head}")
    val ex = plans.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.filter(_.outputPartitioning.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.physical.HashPartitioning])
    // the g-keyed exchange must sit between the two aggregates: below
    // it a partial agg, so the shuffle carries k-sized buffers
    assert(ex.size == 1 && walk(ex.head).tail.exists(
      _.nodeName.contains("ObjectHashAggregate")),
      s"partial heap agg must run below the shuffle:\n${plans.head}")
  }
}
