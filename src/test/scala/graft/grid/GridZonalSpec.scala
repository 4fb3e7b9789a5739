package graft.grid

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class GridZonalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val (tinyH, tinyRoot) = {
    val r = java.nio.file.Files.createTempDirectory("graft_zonal").toString
    SyntheticGrid.writeTiny(spark, r)
    (SyntheticGrid.tinyHeader, r)
  }

  private val tri = Array((0.0, 0.0), (-0.5, 0.0), (-0.5, 0.5), (0.0, 0.0))
  private val box = Array((-0.1, 0.1), (-0.1, 0.9), (-0.9, 0.9),
    (-0.9, 0.1), (-0.1, 0.1))

  test("per-region stats equal the per-region loadPolyLatLng loop") {
    val got = GridZonal.zonalByRegion(spark, tinyH, tinyRoot,
        Seq("tri" -> tri, "box" -> box), 0, 2)
      .collect().map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val loop = Seq("tri" -> tri, "box" -> box).flatMap { case (n, p) =>
      FractionStore.loadPolyLatLng(spark, tinyH, tinyRoot, p, 0, 2)
        .filter(col("in_poly"))
        .groupBy(col("t"))
        .agg(count(col("value")).as("nv"),
          (sum(col("value").cast("double")) / count(col("value"))).as("m"),
          min(col("value")).cast("double").as("mn"),
          max(col("value")).cast("double").as("mx"))
        .collect().map(r => ((n, r.getInt(0)),
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
    }.toMap
    assert(got == loop)
  }

  test("class transitions == pixel-view pivot (nodata excluded)") {
    // 8x4 grid, 4x2 chunks, 2 dates; values hit nodata (-1) on a
    // planted pattern so both-ends-required exclusion is exercised
    val h = GridHeader(name = "trans", width = 8, height = 4,
      fracWidth = 4, fracHeight = 2, fracNDates = 1, dtype = "float32",
      srs = "wgs84", geot = Seq(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
      timestampsMs = Seq(0L, 86400000L), nodata = -1.0)
    val px = SyntheticGrid.pixelDf(spark, h, (x, y, t) =>
      when((x + y + t) % 5 === 0, lit(-1.0))
        .otherwise(((x * 2 + y * 3 + t * 7) % 4).cast("double")))
    val root = java.nio.file.Files.createTempDirectory("graft_trans").toString
    FractionStore.write(spark, h, FractionStore.fromPixels(spark, h, px), root)
    val got = GridZonal.classTransitions(spark, h, root, 0, 1,
        v => v.cast("int"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val pv = FractionStore.pixels(h, FractionStore.fractions(spark, root))
    val expect = pv.filter(col("t") === 0).select(col("x"), col("y"),
        col("value").cast("int").as("cls_from"))
      .join(pv.filter(col("t") === 1).select(col("x"), col("y"),
        col("value").cast("int").as("cls_to")), Seq("x", "y"))
      .filter(col("cls_from").isNotNull && col("cls_to").isNotNull)
      .groupBy("cls_from", "cls_to").count()
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(got == expect && got.nonEmpty)
  }

  test("overlapping regions both count the shared pixels") {
    // triangle lies inside the tiny grid's top-left; a copy of itself
    // must produce identical rows under both names
    val got = GridZonal.zonalByRegion(spark, tinyH, tinyRoot,
        Seq("a" -> tri, "b" -> tri), 0, 1)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    val byName = got.groupBy(_._1)
    assert(byName("a").map(t => (t._2, t._3)).toSet ==
      byName("b").map(t => (t._2, t._3)).toSet)
  }
}
