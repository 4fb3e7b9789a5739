package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.grid._
import graft.functions.QaDecode

/** Ad-hoc performance probe for the tile-scale grid benches (not part
  * of the driver contract): times variants and dumps plan shapes so
  * bench tuning is measured, not guessed.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isWritable(shm)) {
      val d = new java.io.File("/dev/shm/graft_spark_local")
      d.mkdirs()
      builder.config("spark.local.dir", d.getAbsolutePath)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "graft_probe").toString
    val (ndviRoot, qaRoot) = (s"$base/ndvi", s"$base/qa")
    val nh = SyntheticGrid.modisTileHeader("tile_ndvi", "int16", -3000.0)
    val qh = SyntheticGrid.modisTileHeader("tile_qa", "uint16", 65535.0)
    SyntheticGrid.writeDirect(spark, nh, ndviRoot, SyntheticGrid.ndviScalar)
    SyntheticGrid.writeDirect(spark, qh, qaRoot, SyntheticGrid.qaScalar)

    def timed(name: String, n: Int = 3)(f: => Unit): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name%-40s min=${ts.min}%7.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val dataDir = new java.io.File(s"$ndviRoot/jdata/time_chunk=0")
    val files = Option(dataDir.listFiles()).getOrElse(Array.empty)
    println("PROBE files: " + files.map(f =>
      f.getName.take(18) + ":" + f.length / 1024 + "k").take(6).mkString(" "))
    println("PROBE nFiles=" + files.length)

    // scan partitions
    val scan = FractionStore.fractions(spark, ndviRoot)
    println("PROBE scan partitions = " + scan.rdd.getNumPartitions)

    timed("window_load (bench shape)") {
      FractionStore.loadSliceXY(spark, nh, ndviRoot, 1200, 2800, 900, 2500, 0, 4)
        .agg(count(col("value")), avg(col("value"))).collect()
    }
    timed("window_load maskNodata=false") {
      FractionStore.loadSliceXY(spark, nh, ndviRoot, 1200, 2800, 900, 2500, 0, 4,
        maskNodata = false)
        .agg(count(col("value")), avg(col("value"))).collect()
    }
    timed("window_load repartitioned") {
      val fracs = FractionStore.fractionsForWindow(spark, nh, ndviRoot,
        1200, 2800, 900, 2500, 0, 4).repartition(32)
      FractionStore.pixels(nh, fracs)
        .filter(col("x") >= 1200 && col("x") < 2800 &&
          col("y") >= 900 && col("y") < 2500 &&
          col("t") >= 0 && col("t") < 4)
        .agg(count(col("value")), avg(col("value"))).collect()
    }
    timed("window_scan only (count frac rows)") {
      FractionStore.fractionsForWindow(spark, nh, ndviRoot,
        1200, 2800, 900, 2500, 0, 4).count()
    }
    timed("qa_fused (bench shape)") {
      GridKernels.qaConfStats(spark, qaRoot).collect()
    }
    timed("qa_fused repartitioned") {
      FractionStore.fractions(spark, qaRoot).repartition(32)
        .select(graft.functions.QaConfStatsExpr(col("data")).as("s"))
        .agg(sum(col("s.sum_conf")).as("sum_conf"), sum(col("s.n")).as("n_px"))
        .collect()
    }
    timed("qa_exploded (old shape)") {
      FractionStore.pixels(qh, FractionStore.fractions(spark, qaRoot),
        maskNodata = false)
        .agg(sum(QaDecode.modisQaConf(col("value"))), count(lit(1))).collect()
    }
    // does CollapseProject inline the struct expr into BOTH struct-field
    // reads (kernel runs twice)? reference one field only:
    timed("qa_fused single-field") {
      FractionStore.fractions(spark, qaRoot)
        .select(graft.functions.QaConfStatsExpr(col("data")).as("s"),
          (length(col("data")).cast("long") / 2).cast("long").as("n"))
        .agg(sum(col("s.sum_conf")), sum(col("n"))).collect()
    }
    // raw single-thread kernel ceiling on one chunk, repeated
    locally {
      val one = FractionStore.fractions(spark, qaRoot)
        .select(col("data")).head().getAs[Array[Byte]](0)
      val t0 = System.nanoTime()
      var k = 0; var acc = 0.0
      while (k < 144) {
        val r = graft.functions.PayloadKernels.qaConfStats(one)
        acc += r.getDouble(0); k += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROBE raw kernel 144 chunks single-thread: $dt%.3f s (acc=$acc%.0f)")
    }
    timed("multigrid fused (bench shape)") {
      GridKernels.maskedMeanByT(spark, (nh, ndviRoot), (qh, qaRoot),
        1000, 2000, 1000, 2000, 0, 4).collect()
    }
    timed("multigrid relational (old shape)") {
      FractionStore.loadAlignedSliceXY(spark, Seq((nh, ndviRoot), (qh, qaRoot)),
        1000, 2000, 1000, 2000, 0, 4, masks = Seq(true, false))
        .withColumn("conf", QaDecode.modisQaConf(col("value_1")))
        .groupBy(col("t"))
        .agg(avg(when(col("conf") > 0.5, col("value_0"))).as("mean_masked"),
          count(lit(1)).as("n")).collect()
    }

    FractionStore.loadSliceXY(spark, nh, ndviRoot, 1200, 2800, 900, 2500, 0, 4)
      .agg(count(col("value")), avg(col("value"))).explain("formatted")

    graft.sources.GridExports.deleteStore(spark, base)
    spark.stop()
  }
}
