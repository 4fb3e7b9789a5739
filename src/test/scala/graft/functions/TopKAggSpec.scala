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

  test("NaN scores rank first, matching the window sort's total order") {
    import spark.implicits._
    // Spark's desc sort uses the total double order (NaN greatest), so
    // the heap must too — with IEEE comparisons NaN would neither win
    // nor lose and corrupt the heap/drain
    val df = ((0L until 50L).map(id => (0, id, (id % 7).toDouble)) ++
      Seq((0, 100L, Double.NaN), (0, 101L, Double.NaN)))
      .toDF("g", "id", "s").repartition(5)
    val got = heaped(df, 4).collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    val want = windowed(df, 4).collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    def key(t: (Long, Double)) = (t._1, t._2.isNaN, if (t._2.isNaN) 0.0 else t._2)
    assert(got.map(key).sorted.toSeq == want.map(key).sorted.toSeq)
    assert(got.count(_._2.isNaN) == 2, "both NaN rows must win slots")
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
    val plans = TestSpark.executedPlan(heaped(df, 5))
    val aggs = plans.filter(_.nodeName.contains("ObjectHashAggregate"))
    assert(aggs.size >= 2,
      s"expected partial+final ObjectHashAggregate, got:\n${plans.head}")
    val ex = plans.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.filter(_.outputPartitioning.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.physical.HashPartitioning])
    // the g-keyed exchange must sit between the two aggregates: below
    // it a partial agg, so the shuffle carries k-sized buffers
    assert(ex.size == 1 && TestSpark.walkPlan(ex.head).tail.exists(
      _.nodeName.contains("ObjectHashAggregate")),
      s"partial heap agg must run below the shuffle:\n${plans.head}")
  }
}
