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
    * `outRoot`, return its header. `reducer` is "mean" or "mode".
    *
    * When both chunk dimensions are EVEN, a 2×2 block can never
    * straddle a chunk boundary (blocks start at even x, chunks start
    * at fx·fracWidth — also even), so the reduction is chunk-LOCAL:
    * one map over chunk payloads, no pixel explode, NO SHUFFLE at all
    * (the level keeps the base's chunk grid at half dimensions, so
    * each input chunk maps 1:1 to an output chunk and the input's
    * partitioning carries through to the write). Measured 21× less cpu
    * than the generic pixel-explode path on the 4800² tile. Odd chunk
    * dims fall back to the generic groupBy path.
    */
  def downsampleOnce(spark: SparkSession, header: GridHeader, root: String,
                     outRoot: String, reducer: String): GridHeader =
    if (header.fracWidth % 2 == 0 && header.fracHeight % 2 == 0)
      downsampleOnceChunkLocal(spark, header, root, outRoot, reducer)
    else
      downsampleOnceGeneric(spark, header, root, outRoot, reducer)

  def downsampleOnceChunkLocal(spark: SparkSession,
      header: GridHeader, root: String, outRoot: String,
      reducer: String): GridHeader = {
    import spark.implicits._
    require(reducer == "mean" || reducer == "mode",
      s"reducer must be mean or mode, got $reducer")
    val outDtype = if (reducer == "mean") "float64" else header.dtype
    val out = levelHeader(header, outDtype)
      .copy(fracWidth = header.fracWidth / 2,
        fracHeight = header.fracHeight / 2)
    val inCode = PayloadCodec.code(header.dtype)
    val nodata = header.nodata
    val isMean = reducer == "mean"
    // Coalesce the chunk scan to core count before the map+write: a
    // store written by many micro-tasks otherwise hands this job one
    // tiny task per input file, and every task pays a fixed setup tax
    // (the v1 write path java-deserializes the full gzip'd Hadoop conf
    // per task — ~1k Inflater create/close cycles through the JVM-global
    // Cleaner lock, observed as a bimodal up-to-200x cpu collapse of
    // this job at 32 concurrent tiny tasks). Fewer, chunk-packed tasks
    // amortize the tax and write block-sized files — the layout a
    // 100 TB store wants anyway. coalesce (not repartition): merges
    // scan splits without a shuffle.
    val rows = FractionStore.fractions(spark, root)
      .coalesce(spark.sparkContext.defaultParallelism)
      .select("frac_num", "time_chunk", "frac_x", "frac_y",
        "x0", "y0", "t0", "w", "h", "nd", "data").as[FracRowBytes]
      .map { c =>
        val w2 = (c.w + 1) / 2
        val h2 = (c.h + 1) / 2
        FracRowBytes(c.frac_num, c.time_chunk, c.frac_x, c.frac_y,
          c.x0 / 2, c.y0 / 2, c.t0, w2, h2, c.nd,
          PayloadCodec.encodeDouble(
            downsampleChunk(PayloadCodec.decodeDouble(c.data, inCode),
              c.w, c.h, c.nd, nodata, isMean),
            outDtype))
      }
    FractionStore.writePrepartitioned(spark, out, rows.toDF(), outRoot)
    out
  }

  /** 2x2 nodata-aware block reduce of one decoded chunk plane.
    *
    * A NAMED method with statement-form loops, deliberately not inlined
    * in the Dataset.map lambda: the original expression-form body
    * (`outArr(i) = if (...) ... else { while ... }` — a hot loop on a
    * non-empty expression stack) was UNCOMPILABLE at its loop entry
    * ("COMPILE SKIPPED: stack not empty at OSR entry point", both
    * tiers), so whole runs of the lambda executed interpreted whenever
    * the full-method compile lost the race — the recorded bimodal
    * 0.7 s vs 26 s / ~200x-cpu swings of the chunk-local pyramid
    * bench. Statement-position while loops OSR-compile normally. */
  private def downsampleChunk(v: Array[Double], w: Int, h: Int, nd: Int,
                              nodata: Double, isMean: Boolean): Array[Double] = {
    val w2 = (w + 1) / 2
    val h2 = (h + 1) / 2
    val outArr = new Array[Double](w2 * h2 * nd)
    val block = new Array[Double](4)
    var by = 0
    while (by < h2) {
      var bx = 0
      while (bx < w2) {
        var ti = 0
        while (ti < nd) {
          var n = 0
          var dy = 0
          while (dy < 2) {
            val yy = by * 2 + dy
            if (yy < h) {
              var dx = 0
              while (dx < 2) {
                val xx = bx * 2 + dx
                if (xx < w) {
                  val pv = v((yy * w + xx) * nd + ti)
                  if (!(pv == nodata)) { block(n) = pv; n += 1 }
                }
                dx += 1
              }
            }
            dy += 1
          }
          var red = nodata
          if (n > 0) {
            if (isMean) {
              var s = 0.0
              var i = 0
              while (i < n) { s += block(i); i += 1 }
              red = s / n
            } else {
              // mode of <= 4 values, ties to the lowest value
              var best = Double.NaN
              var bestCnt = 0
              var i = 0
              while (i < n) {
                var cnt = 0
                var j = 0
                while (j < n) {
                  if (block(j) == block(i)) cnt += 1
                  j += 1
                }
                if (cnt > bestCnt || (cnt == bestCnt && block(i) < best)) {
                  best = block(i); bestCnt = cnt
                }
                i += 1
              }
              red = best
            }
          }
          outArr((by * w2 + bx) * nd + ti) = red
          ti += 1
        }
        bx += 1
      }
      by += 1
    }
    outArr
  }

  def downsampleOnceGeneric(spark: SparkSession,
      header: GridHeader, root: String, outRoot: String,
      reducer: String): GridHeader = {
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
