package graft.grid

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-pixel time-series repair and smoothing over the pixel view
  * (reference domain: QA masking leaves NULL gaps in NDVI series —
  * the downstream phenology flow expects them filled; the reference
  * defers this to numpy post-processing, here it is a relational
  * operator over (x, y, t, value)).
  *
  * All window frames partition by pixel and order by t, so at scale the
  * single shuffle is by pixel key and every frame is bounded — no
  * whole-series materialization anywhere.
  */
object GridTimeSeries {

  /** Linear interpolation of NULL gaps along t per (x, y): each gap
    * value is the linear blend of the nearest non-null neighbors before
    * and after; leading/trailing gaps take the nearest single neighbor
    * (constant extrapolation). Output adds `value_filled`. */
  def interpolateGaps(px: DataFrame): DataFrame = {
    val before = Window.partitionBy(col("x"), col("y")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val after = Window.partitionBy(col("x"), col("y")).orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pv = last(col("value"), ignoreNulls = true).over(before)
    val pt = last(when(col("value").isNotNull, col("t")), ignoreNulls = true)
      .over(before)
    val nv = first(col("value"), ignoreNulls = true).over(after)
    val nt = first(when(col("value").isNotNull, col("t")), ignoreNulls = true)
      .over(after)
    val interp = pv.cast("double") +
      (nv.cast("double") - pv.cast("double")) *
        (col("t") - pt).cast("double") / (nt - pt).cast("double")
    px.withColumn("value_filled",
      when(col("value").isNotNull, col("value").cast("double"))
        .when(pv.isNotNull && nv.isNotNull, interp)
        .otherwise(coalesce(pv, nv).cast("double")))
  }

  /** Per-pixel OLS trend slope of value over t (the greening/browning
    * trend map of NDVI analysis) via the closed-form normal equations:
    * slope = (n·Σtv − Σt·Σv) / (n·Σt² − (Σt)²). One groupBy(x, y) with
    * partial aggregation — a trend map over any tile is ONE shuffle of
    * the sliced box, never a per-pixel fit loop. All sums are of
    * integer-valued doubles, so they are exact in any accumulation
    * order and the final divide is engine-portable; degenerate series
    * (n < 2 or zero t-variance) report slope 0. */
  def trendSlope(px: DataFrame, roundTo: Int = 6): DataFrame = {
    val v = col("value").cast("double")
    val t = col("t").cast("double")
    val det = col("n") * col("stt") - col("st") * col("st")
    px.filter(col("value").isNotNull)
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("n"),
        sum(t).as("st"), sum(v).as("sv"),
        sum(t * v).as("stv"), sum(t * t).as("stt"))
      .select(col("x"), col("y"), col("n"),
        when(det > 0,
          round((col("n") * col("stv") - col("st") * col("sv")) / det,
            roundTo))
          .otherwise(lit(0.0)).as("slope"))
  }

  /** Savitzky-Golay smoothing along t per pixel — the standard NDVI
    * time-series filter (quadratic/cubic least-squares fit over a
    * (2·halfWidth+1)-point window, reduced to its closed-form integer
    * convolution weights). Preserves peaks and inflections that a plain
    * rolling mean flattens, which is why phenology pipelines smooth
    * with SG before extracting season metrics. Adds `value_sg`, NULL
    * wherever the full window is not available (series edges) or any
    * window value is NULL (nodata gap) — gap-fill first
    * ([[interpolateGaps]]) to smooth through masked dates.
    *
    * All weights are integer-over-integer (the published SG tables), so
    * the weighted sum of integer-valued samples is exact and the single
    * final divide is engine-portable. One pixel-keyed window: the lag
    * and lead frames all reuse a single (x, y) exchange + sort. */
  def savgolSmooth(px: DataFrame, halfWidth: Int = 2,
                   valueCol: String = "value"): DataFrame = {
    // quadratic (= cubic for these centers) SG coefficient rows
    val table: Map[Int, (Seq[Int], Int)] = Map(
      2 -> (Seq(-3, 12, 17, 12, -3), 35),
      3 -> (Seq(-2, 3, 6, 7, 6, 3, -2), 21),
      4 -> (Seq(-21, 14, 39, 54, 59, 54, 39, 14, -21), 231))
    require(table.contains(halfWidth),
      s"savgol halfWidth $halfWidth not in ${table.keys.toSeq.sorted}")
    val (ic, den) = table(halfWidth)
    val w = Window.partitionBy(col("x"), col("y")).orderBy(col("t"))
    val v = col(valueCol).cast("double")
    val weighted = (-halfWidth to halfWidth).map { j =>
      val vv =
        if (j < 0) lag(v, -j).over(w)
        else if (j > 0) lead(v, j).over(w)
        else v
      lit(ic(j + halfWidth).toDouble) * vv
    }.reduce(_ + _)
    px.withColumn("value_sg", weighted / den)
  }

  /** Centered rolling mean over ±`halfWidth` time steps per pixel
    * (ignores NULLs like the reference's masked means). Adds
    * `value_smooth`. */
  def rollingMean(px: DataFrame, halfWidth: Int = 1,
                  valueCol: String = "value"): DataFrame = {
    val w = Window.partitionBy(col("x"), col("y")).orderBy(col("t"))
      .rowsBetween(-halfWidth, halfWidth)
    px.withColumn("value_smooth", avg(col(valueCol).cast("double")).over(w))
  }

  /** Per-pixel seasonal harmonic fit at a fixed period (the phenology
    * seasonality product: how strongly and in what phase a pixel
    * cycles): first-harmonic coefficients by discrete Fourier
    * projection — c1 = (2/n)·Σ v·cos(2πt/T), s1 likewise with sin —
    * and the seasonal amplitude √(c1²+s1²).
    *
    * Engine-exactness: the per-date trig factors are snapped to the
    * integer MICRO grid (round(cos·1e6) as BIGINT — the same trick as
    * DSIR's micro-nat log-ratios), so the per-pixel sums are exact
    * integer-valued doubles in any accumulation order; everything after
    * is a fixed chain of single IEEE ops the DuckDB oracle mirrors.
    * One partial-agg shuffle on (x, y) — same envelope as trendSlope.
    */
  def harmonicFit(px: DataFrame, period: Int, roundTo: Int = 6): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    val omega = 2.0 * math.Pi / period
    val v = col("value").cast("double")
    val wc = round(cos(col("t").cast("double") * lit(omega)) * lit(1e6))
      .cast("long")
    val ws = round(sin(col("t").cast("double") * lit(omega)) * lit(1e6))
      .cast("long")
    val n = col("n_valid").cast("double")
    val c1 = col("sc").cast("double") / lit(1e6) * lit(2.0) / n
    val s1 = col("ss").cast("double") / lit(1e6) * lit(2.0) / n
    px.filter(col("value").isNotNull)
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("n_valid"),
        sum(v * wc.cast("double")).as("sc"),
        sum(v * ws.cast("double")).as("ss"))
      .select(col("x"), col("y"), col("n_valid"),
        round(c1, roundTo).as("c1"),
        round(s1, roundTo).as("s1"),
        round(sqrt(c1 * c1 + s1 * s1), roundTo).as("amplitude"))
  }

  /** One-sided CUSUM change detection per pixel — the vegetation-loss
    * alarm the reference's downstream consumer (Terra-i-style NDVI
    * monitoring) runs over exactly the per-pixel series rastercube
    * serves (doc/notebooks/load_ndvi_qa.ipynb): accumulate downward
    * deviations from a per-pixel baseline and alarm when the
    * accumulation crosses a decision threshold.
    *
    * Baseline: mean of the valid dates t < `trainT`. Monitoring
    * (t >= trainT) runs the classic one-sided CUSUM
    *
    *   S_t = max(0, S_{t-1} + (mu - x_t - slack))
    *
    * computed NOT by per-pixel recursion but by its prefix closed form
    *
    *   S_t = R_t - min(0, min_{j<=t} R_j),   R_t = running sum of d_j
    *
    * i.e. one running sum plus one running min — so the whole operator
    * is window frames over ONE pixel-keyed Exchange (baseline stats are
    * whole-partition conditional windows, no self-join), and every
    * frame is bounded by the series length.
    *
    * Engine-exactness: deviations are scaled by n_train and the slack /
    * threshold snapped to the integer MICRO grid (the DSIR trick), so
    * on integer-valued grids every running sum is an exact integer in
    * any accumulation order; `cusum` is then a single divide + round
    * and `alarm` an exact integer comparison — the DuckDB oracle
    * replays both bit-for-bit.
    *
    * Emits (x, y, t, cusum, alarm) for valid monitoring dates of pixels
    * with at least one valid training date.
    */
  def cusumDetect(px: DataFrame, trainT: Int, slack: Double,
                  threshold: Double, roundTo: Int = 4): DataFrame = {
    require(trainT >= 1, s"trainT must be >= 1, got $trainT")
    val slackMicro = math.rint(slack * 1e6)
    val hMicro = math.rint(threshold * 1e6)
    val v = col("value").cast("double")
    val pw = Window.partitionBy(col("x"), col("y"))
    val cum = Window.partitionBy(col("x"), col("y")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    px.filter(col("value").isNotNull)
      .withColumn("n_train",
        count(when(col("t") < trainT, lit(1))).over(pw))
      .withColumn("sm", sum(when(col("t") < trainT, v)).over(pw))
      .filter(col("t") >= trainT && col("n_train") > 0)
      .withColumn("d",
        (col("sm") - col("n_train") * v) * lit(1e6) -
          col("n_train") * lit(slackMicro))
      .withColumn("r", sum(col("d")).over(cum))
      .withColumn("mn", least(lit(0.0), min(col("r")).over(cum)))
      .select(col("x"), col("y"), col("t"),
        round((col("r") - col("mn")) / (col("n_train") * lit(1e6)), roundTo)
          .as("cusum"),
        ((col("r") - col("mn")) > col("n_train") * lit(hMicro))
          .cast("int").as("alarm"))
  }

  /** Per-pixel Pearson correlation between two aligned bands over t —
    * the NDVI-vs-rainfall (or band-vs-band) association map. Input is
    * the aligned-join pixel view (x, y, t, aCol, bCol); only dates
    * where BOTH bands are valid participate.
    *
    *   r = (n·Σab − Σa·Σb) / (√(n·Σa² − (Σa)²) · √(n·Σb² − (Σb)²))
    *
    * One partial-agg shuffle on (x, y) — the trendSlope envelope. The
    * two variance determinants are kept under SEPARATE square roots:
    * each is an exact integer (integer-valued grids) below 2^53, while
    * their product is not — √da·√db is the engine-portable form the
    * oracle mirrors. Degenerate pixels (n < 2 or either variance 0)
    * report NULL.
    */
  def pixelCorrelation(px: DataFrame, aCol: String = "value_0",
                       bCol: String = "value_1",
                       roundTo: Int = 4): DataFrame = {
    val a = col(aCol).cast("double")
    val b = col(bCol).cast("double")
    val da = col("n") * col("saa") - col("sa") * col("sa")
    val db = col("n") * col("sbb") - col("sb") * col("sb")
    px.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("n"),
        sum(a).as("sa"), sum(b).as("sb"),
        sum(a * a).as("saa"), sum(b * b).as("sbb"),
        sum(a * b).as("sab"))
      .select(col("x"), col("y"), col("n"),
        when(col("n") >= 2 && da > 0 && db > 0,
          round((col("n") * col("sab") - col("sa") * col("sb")) /
            (sqrt(da) * sqrt(db)), roundTo)).as("corr_ab"))
  }

  /** Season-onset detection (greenup date): per pixel, the FIRST date t
    * whose value and the `k − 1` following dates all reach `threshold`
    * — the standard threshold-crossing phenology rule (k consecutive
    * exceedances guard against single-date spikes; NULL/nodata dates
    * break a run).
    *
    * One pixel-keyed shuffle; the exceedance run-check is a bounded
    * forward window frame (k rows), the per-pixel reduce a partial
    * min — same cost envelope as any windowed op on the sliced box.
    * Emits (x, y, onset_t nullable, n_valid): pixels that never
    * sustain the threshold report NULL.
    */
  def seasonOnset(px: DataFrame, threshold: Double, k: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val runW = Window.partitionBy(col("x"), col("y")).orderBy(col("t"))
      .rowsBetween(Window.currentRow, k - 1)
    val hit = when(col("value").isNotNull &&
      col("value").cast("double") >= threshold, 1).otherwise(0)
    // count of rows AND count of hits over the frame: a run needs k
    // hits in k ROWS (a series tail shorter than k can't qualify)
    px.withColumn("run_hits", sum(hit).over(runW))
      .withColumn("run_len", count(lit(1)).over(runW))
      .groupBy(col("x"), col("y"))
      .agg(min(when(col("run_hits") === k && col("run_len") === k,
          col("t"))).as("onset_t"),
        count(col("value")).as("n_valid"))
  }
}
