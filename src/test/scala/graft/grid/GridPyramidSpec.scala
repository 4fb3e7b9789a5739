package graft.grid

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class GridPyramidSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkStore(name: String, w: Int, h: Int,
                      vals: Map[(Int, Int), Double],
                      nodata: Double = -1.0): (GridHeader, String) = {
    val hd = GridHeader(name = name, width = w, height = h,
      fracWidth = math.max(2, w), fracHeight = math.max(2, h), fracNDates = 1,
      dtype = "float32", srs = "wgs84",
      geot = Seq(10.0, 0.5, 0.0, 20.0, 0.0, -0.5),
      timestampsMs = Seq(0L), nodata = nodata)
    val px = vals.toSeq.map { case ((x, y), v) => (x, y, 0, v) }
      .toDF("x", "y", "t", "value")
    val root = java.nio.file.Files.createTempDirectory(s"pyr_$name").toString
    FractionStore.write(spark, hd, FractionStore.fromPixels(spark, hd, px), root)
    (hd, root)
  }

  private def readAll(h: GridHeader, root: String): Map[(Int, Int), Option[Double]] =
    FractionStore.pixels(h, FractionStore.fractions(spark, root))
      .filter(col("t") === 0)
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        if (r.isNullAt(3)) None
        else Some(r.get(3).asInstanceOf[Number].doubleValue()))).toMap

  test("mean level: 2x2 block means, nodata-aware, geot doubled") {
    // 4x4 grid; block (0,0) full, block (1,0) half nodata,
    // block (0,1) all nodata (absent), block (1,1) full
    val vals = Map(
      (0, 0) -> 1.0, (1, 0) -> 3.0, (0, 1) -> 5.0, (1, 1) -> 7.0,  // mean 4
      (2, 0) -> 10.0, (3, 0) -> -1.0, (2, 1) -> -1.0, (3, 1) -> 20.0, // mean 15
      (0, 2) -> -1.0, (1, 2) -> -1.0, (0, 3) -> -1.0, (1, 3) -> -1.0, // nodata
      (2, 2) -> 2.0, (3, 2) -> 4.0, (2, 3) -> 6.0, (3, 3) -> 8.0)   // mean 5
    val (h, root) = mkStore("m4", 4, 4, vals)
    val out = java.nio.file.Files.createTempDirectory("pyr_out").toString
    val oh = GridPyramid.downsampleOnce(spark, h, root, out, "mean")
    assert(oh.width == 2 && oh.height == 2)
    assert(oh.geot(1) == 1.0 && oh.geot(5) == -1.0 &&
      oh.geot(0) == 10.0 && oh.geot(3) == 20.0)
    val lv = readAll(oh, out)
    assert(lv((0, 0)) == Some(4.0))
    assert(lv((1, 0)) == Some(15.0))
    assert(lv((0, 1)) == None) // all-nodata block stays nodata
    assert(lv((1, 1)) == Some(5.0))
  }

  test("odd dimensions: edge blocks average their partial pixels") {
    val vals = Map((0, 0) -> 2.0, (1, 0) -> 4.0, (2, 0) -> 9.0,
      (0, 1) -> 6.0, (1, 1) -> 8.0, (2, 1) -> 11.0,
      (0, 2) -> 100.0, (1, 2) -> 200.0, (2, 2) -> 42.0)
    val (h, root) = mkStore("m3", 3, 3, vals)
    val out = java.nio.file.Files.createTempDirectory("pyr_out3").toString
    val oh = GridPyramid.downsampleOnce(spark, h, root, out, "mean")
    assert(oh.width == 2 && oh.height == 2)
    val lv = readAll(oh, out)
    assert(lv((0, 0)) == Some(5.0))      // 2,4,6,8
    assert(lv((1, 0)) == Some(10.0))     // 9,11
    assert(lv((0, 1)) == Some(150.0))    // 100,200
    assert(lv((1, 1)) == Some(42.0))     // single pixel
  }

  test("mode level: most frequent value, ties to the lowest") {
    val vals = Map(
      (0, 0) -> 7.0, (1, 0) -> 7.0, (0, 1) -> 3.0, (1, 1) -> 3.0, // tie -> 3
      (2, 0) -> 5.0, (3, 0) -> 5.0, (2, 1) -> 5.0, (3, 1) -> 9.0) // mode 5
    val (h, root) = mkStore("md", 4, 2, vals)
    val out = java.nio.file.Files.createTempDirectory("pyr_outm").toString
    val oh = GridPyramid.downsampleOnce(spark, h, root, out, "mode")
    assert(oh.dtype == "float32") // categorical keeps the input dtype
    val lv = readAll(oh, out)
    assert(lv((0, 0)) == Some(3.0) && lv((1, 0)) == Some(5.0))
  }

  test("chunk-local fast path == generic path (even chunks, ragged edge)") {
    // 10x6 grid, 4x2 chunks (even dims -> fast path eligible), ragged
    // right chunks (w=2), planted nodata; closed-form-ish values
    val hd = GridHeader(name = "fastpyr", width = 10, height = 6,
      fracWidth = 4, fracHeight = 2, fracNDates = 2, dtype = "float32",
      srs = "wgs84", geot = Seq(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
      timestampsMs = Seq(0L, 86400000L), nodata = -9.0)
    val px = SyntheticGrid.pixelDf(spark, hd, (x, y, t) =>
      when((x + y * 2 + t) % 7 === 0, lit(-9.0))
        .otherwise(((x * 3 + y * 5 + t) % 13).cast("double")))
    val root = java.nio.file.Files.createTempDirectory("pyr_fast").toString
    FractionStore.write(spark, hd, FractionStore.fromPixels(spark, hd, px), root)
    for (reducer <- Seq("mean", "mode")) {
      val fOut = java.nio.file.Files.createTempDirectory("pyr_f").toString
      val gOut = java.nio.file.Files.createTempDirectory("pyr_g").toString
      val fh = GridPyramid.downsampleOnceChunkLocal(spark, hd, root, fOut, reducer)
      val gh = GridPyramid.downsampleOnceGeneric(spark, hd, root, gOut, reducer)
      assert(fh.width == gh.width && fh.height == gh.height)
      def all(h: GridHeader, r: String) =
        FractionStore.pixels(h, FractionStore.fractions(spark, r))
          .collect().map(x => ((x.getInt(0), x.getInt(1), x.getInt(2)),
            if (x.isNullAt(3)) None
            else Some(x.get(3).asInstanceOf[Number].doubleValue()))).toMap
      assert(all(fh, fOut) == all(gh, gOut), s"reducer $reducer")
      // and the fast level's chunk grid halves with the pixels
      assert(fh.fracWidth == 2 && fh.fracHeight == 1)
    }
  }

  test("cascade: level 2 is the mean of level-1 means (not of raw 4x4)") {
    val vals = (for (x <- 0 until 4; y <- 0 until 4)
      yield (x, y) -> (x + 10.0 * y)).toMap ++ Map((0, 0) -> -1.0)
    val (h, root) = mkStore("c4", 4, 4, vals)
    val out = java.nio.file.Files.createTempDirectory("pyr_cas").toString
    val levels = GridPyramid.buildPyramid(spark, h, root, out, 2, "mean")
    assert(levels.map(_._2.width) == Seq(2, 1))
    val l1 = readAll(levels(0)._2, levels(0)._3)
    val l2 = readAll(levels(1)._2, levels(1)._3)
    // sum order over the 4 L1 doubles is partition-dependent (one
    // value is a non-dyadic third) -> compare within an ulp margin
    val expectL2 = l1.values.flatten.sum / 4
    assert(math.abs(l2((0, 0)).get - expectL2) < 1e-9)
    // and level 1's top-left block ignored the planted nodata
    assert(l1((0, 0)) == Some((1.0 + 10.0 + 11.0) / 3))
  }
}
