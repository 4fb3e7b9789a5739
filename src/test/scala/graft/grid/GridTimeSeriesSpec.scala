package graft.grid

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class GridTimeSeriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def series(vals: Seq[Option[Double]]) =
    vals.zipWithIndex.map { case (v, t) => (0, 0, t, v) }
      .toDF("x", "y", "t", "value")

  private def filled(vals: Seq[Option[Double]]): Seq[Double] =
    GridTimeSeries.interpolateGaps(series(vals))
      .orderBy("t").select("value_filled").as[Double].collect().toSeq

  test("interior gaps interpolate linearly") {
    assert(filled(Seq(Some(10.0), None, None, Some(40.0), Some(50.0)))
      == Seq(10.0, 20.0, 30.0, 40.0, 50.0))
  }

  test("leading/trailing gaps take the nearest neighbor") {
    assert(filled(Seq(None, Some(5.0), None, Some(9.0), None, None))
      == Seq(5.0, 5.0, 7.0, 9.0, 9.0, 9.0))
  }

  test("all-null series stays null") {
    val out = GridTimeSeries.interpolateGaps(
      series(Seq(None, None))).select("value_filled").collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("independent pixels do not leak into each other") {
    val df = Seq((0, 0, 0, Some(1.0)), (0, 0, 1, None),
      (1, 0, 0, Some(100.0)), (1, 0, 1, None))
      .toDF("x", "y", "t", "value")
    val out = GridTimeSeries.interpolateGaps(df)
      .orderBy("x", "t").select("value_filled").as[Double].collect().toSeq
    assert(out == Seq(1.0, 1.0, 100.0, 100.0))
  }

  test("savgol reproduces cubic series exactly, away from edges") {
    // the SG property that distinguishes it from a rolling mean: the
    // quadratic 5-point filter passes polynomials up to degree 3
    // through unchanged
    def cubic(t: Int): Double = 2.0 * t * t * t - 5.0 * t * t + 3 * t - 7
    val out = GridTimeSeries.savgolSmooth(
      series((0 until 9).map(t => Some(cubic(t)))), halfWidth = 2)
      .orderBy("t").select("value_sg").collect()
    (0 until 9).foreach { t =>
      if (t < 2 || t > 6) assert(out(t).isNullAt(0), s"edge t=$t")
      else assert(math.abs(out(t).getDouble(0) - cubic(t)) < 1e-9, s"t=$t")
    }
  }

  test("savgol is NULL across nodata gaps and supports wider windows") {
    // 11-date series with a gap at t=8: windows touching the gap
    // (t in 6..10) and edges (t < 2) are NULL; t in 2..5 stay smoothed
    val vals = (0 until 11).map(t => if (t == 8) None else Some(t.toDouble))
    val out5 = GridTimeSeries.savgolSmooth(series(vals), halfWidth = 2)
      .orderBy("t").select("value_sg").collect()
    (0 until 11).foreach { t =>
      val expectNull = t < 2 || t >= 6
      assert(out5(t).isNullAt(0) == expectNull, s"t=$t")
      // the linear ramp passes through unchanged where defined
      if (!expectNull) assert(math.abs(out5(t).getDouble(0) - t) < 1e-9)
    }
    // 7- and 9-point tables pass a linear ramp through unchanged
    for (h <- Seq(3, 4)) {
      val ramp = GridTimeSeries.savgolSmooth(
        series((0 until 11).map(t => Some(3.0 * t + 1))), halfWidth = h)
        .orderBy("t").select("value_sg").collect()
      (h until 11 - h).foreach { t =>
        assert(math.abs(ramp(t).getDouble(0) - (3.0 * t + 1)) < 1e-9,
          s"h=$h t=$t")
      }
    }
  }

  test("rolling mean is a centered null-skipping window") {
    val out = GridTimeSeries.rollingMean(
      series(Seq(Some(1.0), Some(2.0), None, Some(4.0))), halfWidth = 1)
      .orderBy("t").select("value_smooth").as[Double].collect().toSeq
    assert(out == Seq(1.5, 1.5, 3.0, 4.0))
  }

  test("trend slope recovers a planted linear series exactly") {
    // v = 3t + 7, with a null gap the fit must skip
    val out = GridTimeSeries.trendSlope(
      series(Seq(Some(7.0), Some(10.0), None, Some(16.0), Some(19.0))))
      .select("n", "slope").as[(Long, Double)].collect().head
    assert(out == ((4L, 3.0)))
  }

  test("trend slope is 0 for constant and degenerate series") {
    val df = Seq(
      (0, 0, 0, Some(5.0)), (0, 0, 1, Some(5.0)), (0, 0, 2, Some(5.0)),
      (1, 0, 3, Some(42.0)), // single observation: zero t-variance
      (2, 0, 0, None), (2, 0, 1, Some(8.0)))
      .toDF("x", "y", "t", "value")
    val out = GridTimeSeries.trendSlope(df)
      .orderBy("x").select("x", "n", "slope")
      .as[(Int, Long, Double)].collect().toSeq
    assert(out == Seq((0, 3L, 0.0), (1, 1L, 0.0), (2, 1L, 0.0)))
  }

  test("trend slope fits each pixel independently") {
    val df = Seq(
      (0, 0, 0, Some(0.0)), (0, 0, 1, Some(2.0)),
      (5, 9, 0, Some(10.0)), (5, 9, 1, Some(5.0)))
      .toDF("x", "y", "t", "value")
    val out = GridTimeSeries.trendSlope(df)
      .orderBy("x").select("slope").as[Double].collect().toSeq
    assert(out == Seq(2.0, -5.0))
  }

  private def onset(vals: Seq[Option[Double]], thr: Double, k: Int) = {
    val r = GridTimeSeries.seasonOnset(series(vals), thr, k).collect()(0)
    (if (r.isNullAt(2)) None else Some(r.getInt(2)), r.getLong(3))
  }

  test("season onset: first sustained threshold crossing wins") {
    // spike at t=1 must NOT trigger with k=2; the run at t=3 does
    assert(onset(Seq(Some(1.0), Some(9.0), Some(2.0), Some(8.0),
      Some(9.0), Some(3.0)), thr = 5.0, k = 2) == ((Some(3), 6L)))
  }

  test("season onset: k=1 accepts the spike") {
    assert(onset(Seq(Some(1.0), Some(9.0), Some(2.0)), 5.0, 1)
      == ((Some(1), 3L)))
  }

  test("season onset: nulls break a run") {
    assert(onset(Seq(Some(9.0), None, Some(9.0), Some(9.0)), 5.0, 2)
      == ((Some(2), 3L)))
  }

  test("season onset: never sustained -> NULL onset") {
    assert(onset(Seq(Some(9.0), Some(1.0), Some(9.0)), 5.0, 2)
      == ((None, 3L)))
    // a tail shorter than k cannot qualify
    assert(onset(Seq(Some(1.0), Some(9.0)), 5.0, 2) == ((None, 2L)))
  }

  test("harmonic fit recovers a pure cosine's amplitude and phase split") {
    // v(t) = 3*cos(2*pi*t/4): two full periods -> c1 = 3, s1 = 0, amp 3
    val vals = Seq(3.0, 0.0, -3.0, 0.0, 3.0, 0.0, -3.0, 0.0).map(Some(_))
    val r = GridTimeSeries.harmonicFit(series(vals), period = 4).collect()(0)
    assert((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      == ((8L, 3.0, 0.0, 3.0)))
    // a pure sine lands on s1 (sign: sin(2*pi*t/4) = 0,1,0,-1)
    val sv = Seq(0.0, 2.0, 0.0, -2.0).map(Some(_))
    val r2 = GridTimeSeries.harmonicFit(series(sv), period = 4).collect()(0)
    assert((r2.getDouble(3), r2.getDouble(4), r2.getDouble(5))
      == ((0.0, 2.0, 2.0)))
    // a constant series has zero seasonal amplitude over full periods
    val cv = Seq.fill(8)(Some(5.0))
    val r3 = GridTimeSeries.harmonicFit(series(cv), period = 4).collect()(0)
    assert(r3.getDouble(5) == 0.0)
  }

  /** The textbook per-pixel recursion the closed form must reproduce. */
  private def cusumRef(vals: Seq[Option[Double]], trainT: Int,
                       slack: Double): Seq[(Int, Double)] = {
    val train = vals.take(trainT).flatten
    val mu = train.sum / train.size
    var s = 0.0
    vals.zipWithIndex.drop(trainT).collect { case (Some(v), t) =>
      s = math.max(0.0, s + (mu - v - slack))
      (t, s)
    }
  }

  test("cusum closed form matches the textbook recursion") {
    // baseline 10,12,14 -> mu 12; then a sustained dip the alarm catches
    val vals = Seq(Some(10.0), Some(12.0), Some(14.0),
      Some(11.0), None, Some(4.0), Some(3.0), Some(13.0), Some(2.0))
    val out = GridTimeSeries.cusumDetect(series(vals), trainT = 3,
        slack = 1.0, threshold = 10.0)
      .orderBy("t").select("t", "cusum", "alarm")
      .as[(Int, Double, Int)].collect().toSeq
    val ref = cusumRef(vals, 3, 1.0)
    assert(out.map(r => (r._1, r._2)) ==
      ref.map { case (t, s) => (t, math.rint(s * 1e4) / 1e4) })
    assert(out.map(r => (r._1, r._3)) ==
      ref.map { case (t, s) => (t, if (s > 10.0) 1 else 0) })
    // the dip must actually fire at least one alarm in this fixture
    assert(out.exists(_._3 == 1))
    // and recovery (t=7, value 13) must DRAIN the accumulation, not reset it
    val s7 = out.find(_._1 == 7).get._2
    val s6 = out.find(_._1 == 6).get._2
    assert(s7 < s6 && s7 > 0.0)
  }

  test("cusum drops pixels with no valid training dates") {
    val df = Seq(
      (0, 0, 0, Option.empty[Double]), (0, 0, 1, Some(3.0)),
      (1, 0, 0, Some(8.0)), (1, 0, 1, Some(1.0)))
      .toDF("x", "y", "t", "value")
    val out = GridTimeSeries.cusumDetect(df, trainT = 1, slack = 0.0,
      threshold = 100.0)
    assert(out.select("x").as[Int].collect().toSeq == Seq(1))
  }

  test("pixel correlation: perfect, inverse, and degenerate series") {
    val df = Seq(
      // pixel (0,0): b = 2a + 1 -> r = 1
      (0, 0, 0, Some(1.0), Some(3.0)), (0, 0, 1, Some(2.0), Some(5.0)),
      (0, 0, 2, Some(3.0), Some(7.0)),
      // pixel (1,0): b = -a -> r = -1
      (1, 0, 0, Some(1.0), Some(-1.0)), (1, 0, 1, Some(4.0), Some(-4.0)),
      (1, 0, 2, Some(2.0), Some(-2.0)),
      // pixel (2,0): constant b -> degenerate, NULL
      (2, 0, 0, Some(1.0), Some(5.0)), (2, 0, 1, Some(2.0), Some(5.0)),
      // pixel (3,0): a null on one band excludes the date
      (3, 0, 0, Some(1.0), Some(1.0)), (3, 0, 1, None, Some(9.0)),
      (3, 0, 2, Some(2.0), Some(2.0)), (3, 0, 3, Some(3.0), Some(3.0)))
      .toDF("x", "y", "t", "value_0", "value_1")
    val out = GridTimeSeries.pixelCorrelation(df).orderBy("x")
      .select("x", "n", "corr_ab").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    assert(out(0).getDouble(2) == 1.0)
    assert(out(1).getDouble(2) == -1.0)
    assert(out(2).isNullAt(2))
    assert(out(3).getLong(1) == 3L && out(3).getDouble(2) == 1.0)
  }

  test("season onset: per-pixel independence") {
    val df = Seq(
      (0, 0, 0, Some(9.0)), (0, 0, 1, Some(9.0)),
      (1, 0, 0, Some(1.0)), (1, 0, 1, Some(9.0)), (1, 0, 2, Some(9.0)))
      .toDF("x", "y", "t", "value")
    val out = GridTimeSeries.seasonOnset(df, 5.0, 2)
      .orderBy("x").select("x", "onset_t").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(out == Seq((0, 0), (1, 1)))
  }
}
