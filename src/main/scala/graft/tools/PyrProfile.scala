package graft.tools

import org.apache.spark.sql.SparkSession
import graft.grid._

/** Dev tool: isolate where the chunk-local pyramid pass spends time —
  * decode+reduce only (no write), vs the full write path, vs generic. */
object PyrProfile {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    if (java.nio.file.Files.isWritable(java.nio.file.Paths.get("/dev/shm"))) {
      val d = new java.io.File("/dev/shm/graft_spark_local_prof")
      d.mkdirs()
      b.config("spark.local.dir", d.getAbsolutePath)
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("pyrprof").toString
    val nh = SyntheticGrid.modisTileHeader("tile_ndvi", "int16", -3000.0)
    SyntheticGrid.writeDirect(spark, nh, s"$base/ndvi", SyntheticGrid.ndviScalar)
    def t[A](name: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val inCode = PayloadCodec.code(nh.dtype)
    val nodata = nh.nodata
    // 1. scan + decode only
    t("scan+decode") {
      FractionStore.fractions(spark, s"$base/ndvi")
        .select("frac_num", "time_chunk", "frac_x", "frac_y",
          "x0", "y0", "t0", "w", "h", "nd", "data").as[FracRowBytes]
        .map { c => PayloadCodec.decodeDouble(c.data, inCode).length }
        .reduce(_ + _)
    }
    // 2. scan + decode + block reduce (no encode, no write)
    t("scan+decode+reduce") {
      FractionStore.fractions(spark, s"$base/ndvi")
        .select("frac_num", "time_chunk", "frac_x", "frac_y",
          "x0", "y0", "t0", "w", "h", "nd", "data").as[FracRowBytes]
        .map { c =>
          val v = PayloadCodec.decodeDouble(c.data, inCode)
          val w2 = (c.w + 1) / 2; val h2 = (c.h + 1) / 2
          val outArr = new Array[Double](w2 * h2 * c.nd)
          val block = new Array[Double](4)
          var by = 0
          while (by < h2) {
            var bx = 0
            while (bx < w2) {
              var ti = 0
              while (ti < c.nd) {
                var n = 0
                var dy = 0
                while (dy < 2) {
                  val yy = by * 2 + dy
                  if (yy < c.h) {
                    var dx = 0
                    while (dx < 2) {
                      val xx = bx * 2 + dx
                      if (xx < c.w) {
                        val pv = v((yy * c.w + xx) * c.nd + ti)
                        if (!(pv == nodata)) { block(n) = pv; n += 1 }
                      }
                      dx += 1
                    }
                  }
                  dy += 1
                }
                outArr((by * w2 + bx) * c.nd + ti) =
                  if (n == 0) nodata else { var s = 0.0; var i = 0
                    while (i < n) { s += block(i); i += 1 }; s / n }
                ti += 1
              }
              bx += 1
            }
            by += 1
          }
          outArr.length
        }.reduce(_ + _)
    }
    // isolate encode vs write
    val chunksDs = FractionStore.fractions(spark, s"$base/ndvi")
      .select("frac_num", "time_chunk", "frac_x", "frac_y",
        "x0", "y0", "t0", "w", "h", "nd", "data").as[FracRowBytes]
    println("scan partitions: " + chunksDs.rdd.getNumPartitions)
    t("decode+reduce+ENCODE only") {
      chunksDs.map { c =>
        val v = PayloadCodec.decodeDouble(c.data, inCode)
        val w2 = (c.w + 1) / 2; val h2 = (c.h + 1) / 2
        val outArr = new Array[Double](w2 * h2 * c.nd)
        PayloadCodec.encodeDouble(outArr, "float64").length
      }.reduce(_ + _)
    }
    // isolate the write paths on identical mapped data
    val outH = GridPyramid.levelHeader(nh, "float64")
      .copy(fracWidth = nh.fracWidth / 2, fracHeight = nh.fracHeight / 2)
    def mapped = chunksDs.map { c =>
      val v = PayloadCodec.decodeDouble(c.data, inCode)
      val w2 = (c.w + 1) / 2; val h2 = (c.h + 1) / 2
      val outArr = new Array[Double](w2 * h2 * c.nd)
      var i = 0
      while (i < outArr.length) { outArr(i) = v(i * 2); i += 1 }
      FracRowBytes(c.frac_num, c.time_chunk, c.frac_x, c.frac_y,
        c.x0 / 2, c.y0 / 2, c.t0, w2, h2, c.nd,
        PayloadCodec.encodeDouble(outArr, "float64"))
    }
    for (round <- 1 to 2) {
      t(s"writePrepartitioned r$round") {
        FractionStore.writePrepartitioned(spark, outH, mapped.toDF(),
          s"$base/wp")
      }
      t(s"write(range) r$round") {
        FractionStore.write(spark, outH, mapped.toDF(), s"$base/wr")
      }
      t(s"raw parquet write r$round") {
        mapped.toDF().write.mode("overwrite").parquet(s"$base/wraw")
      }
      t(s"chunklocal real r$round") {
        GridPyramid.downsampleOnceChunkLocal(spark, nh, s"$base/ndvi",
          s"$base/l1real", "mean")
      }
    }
    spark.stop()
  }
}
