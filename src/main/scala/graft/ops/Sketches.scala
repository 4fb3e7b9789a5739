package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Materialize the sketch table (the amortized side of the trade). */
  def writeHllCube(df: DataFrame, grain: Seq[String], of: String,
                   dir: String, lgK: Int = 12): Unit =
    buildHllCube(df, grain, of, lgK)
      .write.mode("overwrite").parquet(dir)

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
}
