package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The sketch-table pattern must answer coarser rollups from persisted
  * sketches alone, with estimates close to exact and IDENTICAL to the
  * estimate a direct sketch over the raw rows would give (HLL union is
  * lossless, so rollup-of-parts == sketch-of-whole exactly). */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val events = {
    import spark.implicits._
    // 3 types x 40 days; user u active for type k on day d iff hash-ish
    // condition — overlapping user sets across days so union != sum
    (for (d <- 0 until 40; t <- 0 until 3; u <- 0 until 500
          if (u * 7 + d * 3 + t) % 5 != 0)
      yield (d, s"type_$t", (u + t * 100).toLong))
      .toDF("day", "event_type", "user_id")
  }

  test("rollup from persisted sketches equals sketch-of-whole, near exact") {
    val dir = TestSpark.tmpDir("hll_cube")
    Sketches.writeHllCube(events, Seq("day", "event_type"), "user_id", dir)
    val rolled = Sketches.rollupFrom(spark, dir, Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // direct sketch over the raw rows (no day grain)
    val direct = Sketches.rollupDistinct(
        Sketches.buildHllCube(events, Seq("event_type"), "user_id"),
        Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rolled.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      // lossless union: the rollup estimate IS the whole-data estimate
      assert(rolled(k) == direct(k), s"$k rollup != direct")
      assert(math.abs(rolled(k).toDouble - n) <= 0.05 * n,
        s"$k estimate ${rolled(k)} vs exact $n")
    }
  }

  test("sketch build aggregates map-side (partial below the exchange)") {
    val plans = TestSpark.executedPlan(Sketches.buildHllCube(
      events.repartition(8), Seq("event_type"), "user_id"))
    val ex = plans.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.filter(_.outputPartitioning.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.physical.HashPartitioning])
    assert(ex.size == 1 && TestSpark.walkPlan(ex.head).tail.exists(
      _.nodeName.contains("ObjectHashAggregate")),
      s"partial sketch agg must run below the shuffle:\n${plans.head}")
  }
}
