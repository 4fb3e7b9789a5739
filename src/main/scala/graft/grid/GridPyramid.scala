package graft.grid

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Overview pyramids (the GDAL/COG overview levels the reference builds
  * tile PNGs from): each level halves the previous level's resolution —
  * 2×2 pixel blocks reduce to one pixel — so zoomed-out reads touch
  * 4^L× less data. Two reducers:
  *
  *  - `mean` for continuous rasters (NDVI): nodata-aware block mean
  *    (valid pixels only; an all-nodata block stays nodata), stored as
  *    float64 so level values are the exact sum/count doubles;
  *  - `mode` for categorical rasters (land-cover classes): most
  *    frequent valid value, ties to the LOWEST value (deterministic
  *    across engines and partitionings).
  *
  * Scale shape: one level = one partial-agg shuffle on the target
  * block key (x/2, y/2, t-chunked through fromPixels' chunk shuffle);
  * the cascade reuses level L−1 as input, so total work is geometric
  * (4/3 of the base pass), never L passes over the base. Each level is
  * a full fraction store — time-partitioned parquet, same pruning as
  * the base — so every grid operator (slices, masks, zonal stats,
  * focal) runs on overviews unchanged.
  */
object GridPyramid {

  /** Header of the next level down: dims halve (ceil), pixel size
    * doubles, chunking/time axis carry over. */
  def levelHeader(h: GridHeader, dtype: String): GridHeader =
    h.copy(name = h.name + "_ov",
      width = (h.width + 1) / 2, height = (h.height + 1) / 2,
      dtype = dtype,
      geot = Seq(h.geot(0), h.geot(1) * 2, 0.0, h.geot(3), 0.0, h.geot(5) * 2))

  /** One halving step: read `root`, write the downsampled store to
    * `outRoot`, return its header. `reducer` is "mean" or "mode". */
  def downsampleOnce(spark: SparkSession, header: GridHeader, root: String,
                     outRoot: String, reducer: String): GridHeader = {
    val out = levelHeader(header,
      if (reducer == "mean") "float64" else header.dtype)
    val px = FractionStore.pixels(header,
        FractionStore.fractions(spark, root), maskNodata = true)
      .filter(col("value").isNotNull)
      .select((col("x") / 2).cast("int").as("x"),
        (col("y") / 2).cast("int").as("y"), col("t"),
        col("value").cast("double").as("value"))
    val reduced = reducer match {
      case "mean" =>
        px.groupBy(col("x"), col("y"), col("t"))
          .agg((sum(col("value")) / count(lit(1))).as("value"))
      case "mode" =>
        // two-phase: per-(block, value) counts, then the (count desc,
        // value asc) winner — window partitions are block-sized
        val counts = px.groupBy(col("x"), col("y"), col("t"), col("value"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy(col("x"), col("y"), col("t"))
          .orderBy(col("cnt").desc, col("value").asc)
        counts.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("x"), col("y"), col("t"), col("value"))
      case other => throw new IllegalArgumentException(
        s"reducer must be mean or mode, got $other")
    }
    FractionStore.write(spark, out,
      FractionStore.fromPixels(spark, out, reduced), outRoot)
    out
  }

  /** Build `levels` cascaded overviews under `outBase/L1 .. L<levels>`.
    * Returns (level, header, root) per level, coarsest last. */
  def buildPyramid(spark: SparkSession, header: GridHeader, root: String,
                   outBase: String, levels: Int,
                   reducer: String = "mean"): Seq[(Int, GridHeader, String)] = {
    require(levels >= 1, "levels must be >= 1")
    var cur = (header, root)
    (1 to levels).map { l =>
      val lr = s"$outBase/L$l"
      val h = downsampleOnce(spark, cur._1, cur._2, lr, reducer)
      cur = (h, lr)
      (l, h, lr)
    }
  }
}
