package graft.grid

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{BoxStatsExpr, CusumExpr, MaskedBoxStatsExpr, QaConfStatsExpr, TrendSlopeExpr}

/** Fused whole-store scan kernels (see [[graft.functions.PayloadKernels]]):
  * the chunk-at-a-time execution shape for dense scans whose answer is an
  * aggregate, where the relational pixel explode would dominate. Each
  * returns a small DataFrame; everything up to the final few-hundred-row
  * aggregation runs inside one generated loop per chunk.
  */
object GridKernels {

  /** Store-wide MODIS QA confidence statistics (sum of confidences +
    * pixel count) without pixel explosion — the reference's Cython QA
    * kernel as a fused chunk fold. */
  def qaConfStats(spark: SparkSession, root: String): DataFrame =
    FractionStore.fractions(spark, root)
      .select(QaConfStatsExpr(col("data")).as("s"))
      .agg(sum(col("s.sum_conf")).as("sum_conf"), sum(col("s.n")).as("n_px"))

  /** Per-date statistics of one grid over a pixel/time box — the fused
    * form of `loadSliceXY(...).groupBy(t).agg(...)` (the P3 window-load
    * hot path without the pixel explode). Output: (t, mean_v, n_valid,
    * n_total, min_v, max_v); nodata pixels are excluded from
    * mean/min/max and n_valid, counted in n_total. Equality vs the
    * exploded path is pinned by GridKernelsSpec. */
  def boxStatsByT(spark: SparkSession, header: GridHeader, root: String,
                  xFrom: Int, xTo: Int, yFrom: Int, yTo: Int,
                  tFrom: Int, tTo: Int): DataFrame =
    FractionStore.fractionsForWindow(spark, header, root,
      xFrom, xTo, yFrom, yTo, tFrom, tTo)
      .select(explode(BoxStatsExpr(col("data"), header.dtype,
        xFrom, xTo, yFrom, yTo, tFrom, tTo, header.nodata)).as("s"))
      .groupBy(col("s.t").as("t"))
      .agg(sum(col("s.sum_v")).as("sv"), sum(col("s.n_valid")).as("nv"),
        sum(col("s.n_total")).as("n"),
        min(col("s.min_v")).as("min_v"), max(col("s.max_v")).as("max_v"))
      .select(col("t"),
        when(col("nv") > 0, col("sv") / col("nv")).as("mean_v"),
        col("nv").as("n_valid"), col("n").as("n_total"),
        col("min_v"), col("max_v"))

  /** Whole-box aggregate of one grid over a pixel/time box (one row:
    * n_valid, mean_v, min_v, max_v) — the fused twin of
    * `loadSliceXY(...).agg(count(value), avg(value), ...)`. */
  def boxAgg(spark: SparkSession, header: GridHeader, root: String,
             xFrom: Int, xTo: Int, yFrom: Int, yTo: Int,
             tFrom: Int, tTo: Int): DataFrame =
    FractionStore.fractionsForWindow(spark, header, root,
      xFrom, xTo, yFrom, yTo, tFrom, tTo)
      .select(explode(BoxStatsExpr(col("data"), header.dtype,
        xFrom, xTo, yFrom, yTo, tFrom, tTo, header.nodata)).as("s"))
      .agg(sum(col("s.sum_v")).as("sv"), sum(col("s.n_valid")).as("nv"),
        min(col("s.min_v")).as("min_v"), max(col("s.max_v")).as("max_v"))
      .select(col("nv").as("n_valid"),
        when(col("nv") > 0, col("sv") / col("nv")).as("mean_v"),
        col("min_v"), col("max_v"))

  /** Per-pixel OLS trend map over a pixel/time box — the fused twin of
    * `GridTimeSeries.trendSlope(loadSliceXY(...))` for ranges inside ONE
    * time slab (every pixel's series sits in one payload row, so the
    * whole trend map is a map-side generate: zero shuffle, no 10M-row
    * pixel explode feeding a 2.5M-group hash aggregate). Output matches
    * the relational form row-for-row: (x, y, n, slope). Equality is
    * pinned by GridKernelsSpec; the A/B cost is a recorded bench pair
    * (`grid_trend_slope_{exploded,fused}`). */
  def trendSlopeByPixel(spark: SparkSession, header: GridHeader, root: String,
                        xFrom: Int, xTo: Int, yFrom: Int, yTo: Int,
                        tFrom: Int, tTo: Int, roundTo: Int = 6): DataFrame = {
    require((tTo - 1) / header.fracNDates == tFrom / header.fracNDates,
      s"fused trend needs [$tFrom,$tTo) inside one time slab of " +
        s"${header.fracNDates} dates; use GridTimeSeries.trendSlope over " +
        "loadSliceXY for ranges that straddle slabs")
    FractionStore.fractionsForWindow(spark, header, root,
      xFrom, xTo, yFrom, yTo, tFrom, tTo)
      .select(explode(TrendSlopeExpr(col("data"), header.dtype,
        xFrom, xTo, yFrom, yTo, tFrom, tTo, header.nodata, roundTo)).as("s"))
      .select(col("s.x").as("x"), col("s.y").as("y"),
        col("s.n").as("n"), col("s.slope").as("slope"))
  }

  /** Per-pixel one-sided CUSUM change alarm over a pixel/time box — the
    * fused twin of `GridTimeSeries.cusumDetect(loadSliceXY(...))` when
    * training + monitoring dates sit in ONE time slab: the whole alarm
    * map is a map-side generate (zero shuffle, no pixel explode feeding
    * window frames). Output matches the relational form row-for-row:
    * (x, y, t, cusum, alarm); equality pinned by PayloadKernelsSpec,
    * cost recorded as the `grid_cusum_{windowed,fused}` bench pair. */
  def cusumByPixel(spark: SparkSession, header: GridHeader, root: String,
                   xFrom: Int, xTo: Int, yFrom: Int, yTo: Int,
                   tFrom: Int, tTo: Int, trainT: Int, slack: Double,
                   threshold: Double, roundTo: Int = 4): DataFrame = {
    require(trainT >= 1, s"trainT must be >= 1, got $trainT")
    require((tTo - 1) / header.fracNDates == tFrom / header.fracNDates,
      s"fused cusum needs [$tFrom,$tTo) inside one time slab of " +
        s"${header.fracNDates} dates; use GridTimeSeries.cusumDetect over " +
        "loadSliceXY for ranges that straddle slabs")
    FractionStore.fractionsForWindow(spark, header, root,
      xFrom, xTo, yFrom, yTo, tFrom, tTo)
      .select(explode(CusumExpr(col("data"), header.dtype,
        xFrom, xTo, yFrom, yTo, tFrom, tTo, header.nodata,
        trainT, math.rint(slack * 1e6), math.rint(threshold * 1e6),
        roundTo)).as("s"))
      .select(col("s.x").as("x"), col("s.y").as("y"), col("s.t").as("t"),
        col("s.cusum").as("cusum"), col("s.alarm").as("alarm"))
  }

  /** QA-masked per-date mean of a value grid over a pixel box — the
    * fused form of the aligned two-band load + conf gate + groupBy(t).
    * Output: (t, mean_masked, n) where mean_masked averages value
    * pixels with conf > 0.5 and value != nodata; n counts all in-box
    * pixels per date. */
  def maskedMeanByT(spark: SparkSession,
                    value: (GridHeader, String), qa: (GridHeader, String),
                    xFrom: Int, xTo: Int, yFrom: Int, yTo: Int,
                    tFrom: Int, tTo: Int): DataFrame = {
    val (vh, vRoot) = value
    val (qh, qRoot) = qa
    require(vh.sameGeogrid(qh) && vh.fracNDates == qh.fracNDates,
      "fused masked mean needs one shared geogrid + time chunking")
    val v = FractionStore.fractionsForWindow(spark, vh, vRoot,
      xFrom, xTo, yFrom, yTo, tFrom, tTo)
    val q = FractionStore.fractionsForWindow(spark, qh, qRoot,
        xFrom, xTo, yFrom, yTo, tFrom, tTo)
      .select(col("frac_num"), col("time_chunk"), col("data").as("data_q"))
    v.join(q, Seq("frac_num", "time_chunk"))
      .select(explode(MaskedBoxStatsExpr(col("data"), col("data_q"),
        vh.dtype, xFrom, xTo, yFrom, yTo, tFrom, tTo, vh.nodata)).as("s"))
      .groupBy(col("s.t").as("t"))
      .agg(sum(col("s.sum_v")).as("sv"), sum(col("s.n_clear")).as("nc"),
        sum(col("s.n_total")).as("n"))
      .select(col("t"),
        when(col("nc") > 0, col("sv") / col("nc")).as("mean_masked"),
        col("n"))
  }
}
