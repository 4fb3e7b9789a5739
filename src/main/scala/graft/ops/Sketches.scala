package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Re-aggregatable distinct-count sketches ("sketch as data"): build a
  * fine-grained HLL sketch table ONCE, persist it, and answer every
  * coarser-grained distinct-count rollup from the sketches alone —
  * union is lossless for HLL, so a day-level sketch table serves week/
  * month/all-time queries without ever re-scanning raw events.
  *
  * At 100 TB this is the only workable shape for repeated distinct
  * questions: the raw scan happens once per grain refresh; each rollup
  * reads kilobyte sketch rows and the shuffle carries one sketch per
  * (partition, group). Spark's DataSketches built-ins (hll_sketch_agg /
  * hll_union_agg / hll_sketch_estimate) do the heavy lifting — both the
  * build and the union are map-side combinable aggregates.
  */
object Sketches {

  /** Per-`grain` HLL sketches of distinct `of` values (binary column
    * `hll`). lgK = 12 gives ~1.6% relative standard error. */
  def buildHllCube(df: DataFrame, grain: Seq[String], of: String,
                   lgK: Int = 12): DataFrame =
    df.groupBy(grain.map(col): _*)
      .agg(hll_sketch_agg(col(of), lit(lgK)).as("hll"))

  /** Materialize the sketch table (the amortized side of the trade).
    * `partitionCols` (a prefix-free subset of `grain`, typically the
    * time column) lays the cube out hive-partitioned, so a rollup over
    * a sub-range — last week of a year-long day cube — prunes to the
    * probed partitions instead of scanning every sketch row. */
  def writeHllCube(df: DataFrame, grain: Seq[String], of: String,
                   dir: String, lgK: Int = 12,
                   partitionCols: Seq[String] = Nil): Unit =
    writeCube(buildHllCube(df, grain, of, lgK), dir, partitionCols)

  private def writeCube(cube: DataFrame, dir: String,
                        partitionCols: Seq[String]): Unit = {
    val w = cube.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(dir)
  }

  /** Roll a sketch table up to a coarser `grain` — distinct counts via
    * lossless sketch union; raw data is never touched. */
  def rollupDistinct(sketches: DataFrame, grain: Seq[String],
                     estimateCol: String = "approx_distinct"): DataFrame =
    sketches.groupBy(grain.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("hll")))
        .as(estimateCol))

  /** Read a persisted cube and roll it up in one call. */
  def rollupFrom(spark: SparkSession, dir: String, grain: Seq[String],
                 estimateCol: String = "approx_distinct"): DataFrame =
    rollupDistinct(spark.read.parquet(dir), grain, estimateCol)

  // ---- Quantile sketches: the percentile analogue of the HLL cube.
  // Build a fine-grained equi-width histogram ONCE (one raw scan, one
  // map-side-combinable custom aggregate), persist it, and answer any
  // coarser-grained percentile question from kilobyte sketch rows —
  // element-wise array sum is the lossless union. Deterministic by
  // construction (fixed bin edges), so unlike percentile_approx the
  // whole chain is exactly reproducible and oracle-checkable.

  /** Per-`grain` histogram sketch of `of` over [lo, hi): column `hist`
    * is `array<long>` of length `bins`; out-of-range values clamp into
    * the edge bins so totals (and therefore ranks) stay exact. */
  def buildHistCube(df: DataFrame, grain: Seq[String], of: String,
                    lo: Double, hi: Double, bins: Int = 256): DataFrame =
    df.groupBy(grain.map(col): _*)
      .agg(graft.functions.EqHistAgg(col(of), lo, hi, bins).as("hist"))

  /** Quantile estimate from a histogram sketch column, fully inside
    * whole-stage codegen (higher-order functions, no explode): rank
    * r = max(ceil(q*n), 1); walk the array to the first bin whose
    * cumulative count reaches r; interpolate within the bin by rank.
    * NULL when the sketch is empty (n = 0). */
  def histQuantile(hist: Column, q: Double,
                   lo: Double, hi: Double): Column = {
    val n = aggregate(hist, lit(0L), (a, x) => a + x)
    val r = greatest(ceil(lit(q) * n).cast("long"), lit(1L))
    val w = (lit(hi) - lit(lo)) / size(hist).cast("double")
    val found = aggregate(
      transform(hist, (c, i) => struct(c.as("c"), i.as("i"))),
      struct(lit(0L).as("cum"), lit(-1).as("idx"), lit(0.0).as("pos")),
      (acc, e) =>
        when(acc.getField("idx") >= 0, acc)
          .when(acc.getField("cum") + e.getField("c") >= r,
            struct(acc.getField("cum").as("cum"),
              e.getField("i").as("idx"),
              ((r - acc.getField("cum")).cast("double") /
                e.getField("c").cast("double")).as("pos")))
          .otherwise(
            struct((acc.getField("cum") + e.getField("c")).as("cum"),
              lit(-1).as("idx"), lit(0.0).as("pos"))))
    when(n > 0,
      lit(lo) + w * (found.getField("idx").cast("double") +
        found.getField("pos")))
  }

  /** Roll a histogram cube up to a coarser `grain` and emit one column
    * per requested (name, q) percentile; raw data is never touched. */
  def rollupQuantiles(sketches: DataFrame, grain: Seq[String],
                      lo: Double, hi: Double,
                      qs: Seq[(String, Double)]): DataFrame = {
    val merged = sketches.groupBy(grain.map(col): _*)
      .agg(graft.functions.HistMergeAgg(col("hist")).as("hist"))
    merged.select(grain.map(col) ++ qs.map { case (name, q) =>
      histQuantile(col("hist"), q, lo, hi).as(name)
    }: _*)
  }

  /** Materialize the histogram cube; `partitionCols` as in
    * [[writeHllCube]] — a sub-range percentile probe then prunes to
    * the touched partitions. */
  def writeHistCube(df: DataFrame, grain: Seq[String], of: String,
                    lo: Double, hi: Double, dir: String, bins: Int = 256,
                    partitionCols: Seq[String] = Nil): Unit =
    writeCube(buildHistCube(df, grain, of, lo, hi, bins), dir,
      partitionCols)

  /** Read a persisted histogram cube and answer percentiles in one
    * call; filter before calling to get partition pruning. */
  def rollupQuantilesFrom(spark: SparkSession, dir: String,
                          grain: Seq[String], lo: Double, hi: Double,
                          qs: Seq[(String, Double)]): DataFrame =
    rollupQuantiles(spark.read.parquet(dir), grain, lo, hi, qs)

  /** Global [lo, hi) bounds for an auto-ranged histogram cube: exact
    * min/max (one cheap column-pruned scan) widened by half a bin so
    * the true max lands strictly inside the last bin rather than on
    * the clamp edge. Degenerate all-equal columns get a unit range. */
  def histBounds(df: DataFrame, of: String,
                 bins: Int = 256): (Double, Double) = {
    // NaN excluded explicitly: Spark's max treats NaN as greatest, so
    // one NaN value would otherwise make hi = NaN and fail the build's
    // range check — while EqHistAgg itself skips NaN inputs
    val v = when(!isnan(col(of).cast("double")), col(of).cast("double"))
    val r = df.agg(min(v), max(v)).head()
    if (r.isNullAt(0)) (0.0, 1.0)
    else {
      val (mn, mx) = (r.getDouble(0), r.getDouble(1))
      val span = if (mx > mn) mx - mn else 1.0
      (mn, mx + span / (2.0 * bins))
    }
  }

  /** Two-pass auto-ranged build: derive [lo, hi) from the data, then
    * build. Costs one extra (column-pruned, partial-agg) scan — at
    * archive scale prefer a KNOWN domain range so the cube builds in
    * one pass and stays mergeable with future builds (two auto-ranged
    * cubes over different data get different bin edges and cannot be
    * hist_merge'd; the returned bounds must be recorded alongside the
    * cube for probe-time quantile extraction). */
  def buildHistCubeAuto(df: DataFrame, grain: Seq[String], of: String,
                        bins: Int = 256): (DataFrame, Double, Double) = {
    val (lo, hi) = histBounds(df, of, bins)
    (buildHistCube(df, grain, of, lo, hi, bins), lo, hi)
  }
}
