package graft.grid

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{MaskedBoxStatsExpr, QaConfStatsExpr}

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
