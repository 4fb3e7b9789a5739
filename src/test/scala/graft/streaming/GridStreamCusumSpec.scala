package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.TestSpark
import graft.grid.GridTimeSeries

/** The incremental CUSUM monitor must equal the batch closed form
  * bit-for-bit — cusum doubles included — both in batch mode (one
  * group pass) and as an actual multi-micro-batch file stream.
  */
class GridStreamCusumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // the tinygrid closed form as scalar rows (valid observations only)
  private def obsRows: Seq[PixelObs] =
    for {
      x <- 0 until 25; y <- 0 until 10; t <- 0 until 11
      if (x + y + t) % 13 != 0
    } yield PixelObs(x, y, t, ((x * 31 + y * 17 + t * 7) % 97).toDouble)

  private def batchRef: Set[(Int, Int, Int, Double, Int)] =
    GridTimeSeries.cusumDetect(
      obsRows.toDF("x", "y", "t", "value"),
      trainT = 5, slack = 5.0, threshold = 40.0)
      .as[(Int, Int, Int, Double, Int)].collect().toSet

  test("monitor in batch mode equals the batch closed form") {
    val got = GridStreamCusum.monitor(spark, obsRows.toDS(),
        trainT = 5, slack = 5.0, threshold = 40.0)
      .collect().map(e => (e.x, e.y, e.t, e.cusum, e.alarm)).toSet
    assert(got == batchRef)
  }

  test("multi-micro-batch stream equals the batch closed form") {
    val dir = TestSpark.tmpDir("cusum_stream")
    val ranges = Seq(0 until 4, 4 until 8, 8 until 11)
    // one file per date range, strictly increasing mtimes so
    // maxFilesPerTrigger=1 replays them in date order
    ranges.foreach { rg =>
      obsRows.filter(o => rg.contains(o.t)).toDF()
        .coalesce(1).write.mode("append").parquet(dir)
      Thread.sleep(1500)
    }
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("x", IntegerType), StructField("y", IntegerType),
        StructField("t", IntegerType), StructField("value", DoubleType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .as[PixelObs]
    val q = GridStreamCusum.monitor(spark, stream,
        trainT = 5, slack = 5.0, threshold = 40.0)
      .writeStream.outputMode("append")
      .format("memory").queryName("cusum_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("cusum_out")
      .as[(Int, Int, Int, Double, Int)].collect().toSet
    assert(got == batchRef)
    // the fixture must actually exercise alarms and multi-batch state
    assert(got.exists(_._5 == 1) && got.exists(_._5 == 0))
  }

  test("streamed alert patches equal batch labeling of the same alarms") {
    val h = graft.grid.GridHeader(name = "cusum_pub", width = 25,
      height = 10, fracWidth = 5, fracHeight = 5, fracNDates = 1,
      dtype = "float32", srs = "wgs84",
      geot = Seq(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
      timestampsMs = Seq(0L), nodata = -1.0)
    val srcDir = TestSpark.tmpDir("cusum_pub_src")
    obsRows.toDF().coalesce(1).write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("x", IntegerType), StructField("y", IntegerType),
        StructField("t", IntegerType), StructField("value", DoubleType))))
      .parquet(srcDir)
      .as[PixelObs]
    val alarms = GridStreamCusum.monitor(spark, stream,
      trainT = 5, slack = 5.0, threshold = 40.0)
    val outDir = TestSpark.tmpDir("cusum_pub_out") + "/alerts"
    val q = GridStreamCusum.publishAlertPatches(spark, h, alarms, outDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.read.parquet(outDir)
      .select("patch_id", "n_px", "x_min", "x_max", "y_min", "y_max")
      .as[(Long, Long, Int, Int, Int, Int)].collect().toSet
    // batch twin over the identical alarm pixel set
    val batchPts = batchRef.filter(_._5 == 1).map(a => (a._1, a._2))
      .toSeq.toDF("x", "y").distinct()
    val want = graft.grid.GridLabeling.patchStats(
        graft.grid.GridLabeling.labelPatches(spark, h, batchPts))
      .select("patch_id", "n_px", "x_min", "x_max", "y_min", "y_max")
      .as[(Long, Long, Int, Int, Int, Int)].collect().toSet
    assert(got.nonEmpty && got == want)
    graft.ops.CacheRegistry.releaseAll()
  }

  test("monitoring rows with no baseline are dropped, late baseline heals") {
    // pixel (0,0): first batch delivers only t>=trainT rows -> nothing
    // emitted; training rows later start the monitor for NEW dates
    val first = Seq(PixelObs(0, 0, 2, 50.0)).toDS()
    val out1 = GridStreamCusum.monitor(spark, first, trainT = 2,
      slack = 0.0, threshold = 10.0).collect()
    assert(out1.isEmpty)
  }
}
