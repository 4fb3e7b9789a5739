package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Histogram quantile-sketch cube semantics: deterministic binning
  * (clamping, NULL/NaN skip), lossless merge (fine grain rolled up ==
  * built directly at the coarse grain, exact array equality), and the
  * rank rule of histQuantile against hand-computed answers.
  */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("eq_hist bins, clamps out-of-range, skips NULL and NaN") {
    import spark.implicits._
    // [0, 10) in 5 bins of width 2
    val df = Seq[java.lang.Double](0.0, 1.9, 2.0, 9.9, 10.0, 50.0, -3.0,
      null, Double.NaN).toDF("v")
    val got = df.agg(graft.functions.EqHistAgg(col("v"), 0.0, 10.0, 5)
      .as("hist")).head().getSeq[Long](0)
    // bin0: 0.0, 1.9, -3.0(clamped) = 3; bin1: 2.0 = 1;
    // bin4: 9.9, 10.0(clamped), 50.0(clamped) = 3
    assert(got == Seq(3L, 1L, 0L, 0L, 3L))
  }

  test("rollup merge is lossless: day-grain union == direct coarse build") {
    import spark.implicits._
    val rows = for (g <- Seq("a", "b"); day <- 1 to 3; i <- 0 until 40)
      yield (g, day, (i * 7 % 100).toDouble + day)
    val df = rows.toDF("g", "day", "v")
    val fine = Sketches.buildHistCube(df, Seq("g", "day"), "v", 0.0, 100.0,
      bins = 64)
    val merged = fine.groupBy("g")
      .agg(graft.functions.HistMergeAgg(col("hist")).as("hist"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val direct = Sketches.buildHistCube(df, Seq("g"), "v", 0.0, 100.0,
      bins = 64)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(merged == direct)
    assert(merged("a").sum == 120L)
  }

  test("histQuantile rank rule matches hand computation; empty is NULL") {
    import spark.implicits._
    // 10 values 5..95 step 10 over [0,100) in 10 bins: one per bin
    val df = (0 until 10).map(i => 5.0 + 10 * i).toDF("v")
    val sk = df.agg(graft.functions.EqHistAgg(col("v"), 0.0, 100.0, 10)
      .as("hist"))
    val got = sk.select(
      Sketches.histQuantile(col("hist"), 0.5, 0.0, 100.0).as("p50"),
      Sketches.histQuantile(col("hist"), 0.95, 0.0, 100.0).as("p95"),
      Sketches.histQuantile(col("hist"), 0.05, 0.0, 100.0).as("p05"))
      .head()
    // p50: r = ceil(0.5*10) = 5 -> bin 4 (cum 4 before), pos = 1/1
    //   -> 10 * (4 + 1) = 50
    assert(math.abs(got.getDouble(0) - 50.0) < 1e-12)
    // p95: r = ceil(9.5) = 10 -> bin 9, pos 1 -> 100
    assert(math.abs(got.getDouble(1) - 100.0) < 1e-12)
    // p05: r = max(ceil(0.5), 1) = 1 -> bin 0, pos 1 -> 10
    assert(math.abs(got.getDouble(2) - 10.0) < 1e-12)

    // empty sketch (all inputs NULL) -> NULL quantile
    val empty = Seq[java.lang.Double](null).toDF("v")
      .agg(graft.functions.EqHistAgg(col("v"), 0.0, 100.0, 10).as("hist"))
      .select(Sketches.histQuantile(col("hist"), 0.5, 0.0, 100.0).as("q"))
      .head()
    assert(empty.isNullAt(0))
  }

  test("rollupQuantiles answers from sketches and matches exact rank") {
    import spark.implicits._
    val rows = for (g <- Seq("x", "y"); day <- 1 to 4; i <- 1 to 25)
      yield (g, day, if (g == "x") i.toDouble else i * 2.0)
    val fine = Sketches.buildHistCube(rows.toDF("g", "day", "v"),
      Seq("g", "day"), "v", 0.0, 50.0, bins = 50)
    val got = Sketches.rollupQuantiles(fine, Seq("g"), 0.0, 50.0,
      Seq("p50" -> 0.5, "p99" -> 0.99))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    // g=x: 100 values, 4 copies each of 1..25; bins width 1. p50: r=50
    // -> bin 12 (values 12.x? value i lands in bin i since width 1 and
    // i < 50 ... value 12.0 -> bin 12), cum before bin 13 is 48, bin 13
    // has 4 -> r=50 falls in bin 13? cum(bins 1..12) = 48, bin 13 cum 52
    // >= 50 -> idx 13, pos (50-48)/4 = 0.5 -> 13.5
    assert(math.abs(got("x")._1 - 13.5) < 1e-12)
    // p99: r = 99 -> cum through bin 24 is 96, bin 25 has 4, cum 100
    // -> idx 25, pos (99-96)/4 = 0.75 -> 25.75
    assert(math.abs(got("x")._2 - 25.75) < 1e-12)
    // g=y doubles everything: bins 2,4,..,50(clamped to 49? 50.0 clamps
    // into bin 49); p50 r=50 -> value 26 region
    assert(got("y")._1 > 25.0 && got("y")._1 < 28.0)
  }
}
