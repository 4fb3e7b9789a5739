package graft.grid

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Focal stats: the halo-exchange operator must be row-for-row equal to
  * the declarative offset-explode baseline (the semantics definition),
  * including grid edges, nodata, ragged chunks, sparse stores, and
  * radius 2.
  */
class GridFocalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val tinyRoot: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_focal_tiny").toString
    SyntheticGrid.writeTiny(spark, r)
    r
  }
  private lazy val tinyH = SyntheticGrid.tinyHeader

  private def sortKey = Seq("x", "y", "t")

  private def assertSame(a: org.apache.spark.sql.DataFrame,
                         b: org.apache.spark.sql.DataFrame): Unit = {
    val cols = a.columns.sorted.map(col(_))
    val la = a.select(cols: _*).orderBy(sortKey.map(col): _*).collect()
    val lb = b.select(cols: _*).orderBy(sortKey.map(col): _*).collect()
    assert(la.length == lb.length, s"${la.length} vs ${lb.length} rows")
    la.zip(lb).foreach { case (ra, rb) => assert(ra == rb) }
  }

  test("halo exchange == offset-explode baseline (tiny grid, r=1)") {
    assertSame(
      GridFocal.focalStats(spark, tinyH, tinyRoot, radius = 1,
        tFrom = 0, tTo = 3),
      GridFocal.focalStatsNaive(spark, tinyH, tinyRoot, radius = 1,
        tFrom = 0, tTo = 3))
  }

  test("radius 2 windows span chunk corners correctly") {
    assertSame(
      GridFocal.focalStats(spark, tinyH, tinyRoot, radius = 2,
        tFrom = 4, tTo = 6),
      GridFocal.focalStatsNaive(spark, tinyH, tinyRoot, radius = 2,
        tFrom = 4, tTo = 6))
  }

  test("unmasked run treats nodata as ordinary values") {
    assertSame(
      GridFocal.focalStats(spark, tinyH, tinyRoot, radius = 1,
        tFrom = 0, tTo = 1, maskNodata = false),
      GridFocal.focalStatsNaive(spark, tinyH, tinyRoot, radius = 1,
        tFrom = 0, tTo = 1, maskNodata = false))
  }

  test("sparse store: absent chunks are invalid neighbors, emit no rows") {
    // 40x20 grid, 10x10 chunks; drop chunk (1, 0) entirely
    val h = GridHeader(name = "focal_sparse", width = 40, height = 20,
      fracWidth = 10, fracHeight = 10, fracNDates = 2, dtype = "float32",
      srs = "wgs84", geot = Seq(0.0, 0.01, 0.0, 0.0, 0.0, -0.01),
      timestampsMs = Seq(0L, 86400000L), nodata = -1.0)
    val px = SyntheticGrid.pixelDf(spark, h,
        (x, y, t) => ((x * 3 + y * 5 + t) % 11).cast("double"))
      .filter(!(col("x").between(10, 19) && col("y").between(0, 9)))
    val root = java.nio.file.Files.createTempDirectory("graft_focal_sp").toString
    FractionStore.write(spark, h, FractionStore.fromPixels(spark, h, px), root)
    val halo = GridFocal.focalStats(spark, h, root, 1, 0, 2)
    // no rows for the absent chunk's pixels
    assert(halo.filter(col("x").between(10, 19) && col("y").between(0, 9))
      .count() == 0)
    assertSame(halo, GridFocal.focalStatsNaive(spark, h, root, 1, 0, 2))
  }

  test("hand-computed corner window (dense 3x3 grid of value x+y)") {
    val h = GridHeader(name = "focal_hand", width = 3, height = 3,
      fracWidth = 3, fracHeight = 3, fracNDates = 1, dtype = "float32",
      srs = "wgs84", geot = Seq(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
      timestampsMs = Seq(0L), nodata = -1.0)
    val px = SyntheticGrid.pixelDf(spark, h,
      (x, y, _) => (x + y).cast("double"))
    val root = java.nio.file.Files.createTempDirectory("graft_focal_h").toString
    FractionStore.write(spark, h, FractionStore.fromPixels(spark, h, px), root)
    val rows = GridFocal.focalStats(spark, h, root, 1, 0, 1)
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        (r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    // corner (0,0): window = {(0,0)=0,(1,0)=1,(0,1)=1,(1,1)=2}
    assert(rows((0, 0)) == ((4L, 1.0, 0.0, 2.0)))
    // center (1,1): all 9, values 0..4 summing to 18
    assert(rows((1, 1)) == ((9L, 2.0, 0.0, 4.0)))
    // edge (1,0): 6 cells {0,1,2,1,2,3}
    assert(rows((1, 0)) == ((6L, 1.5, 0.0, 3.0)))
  }
}
