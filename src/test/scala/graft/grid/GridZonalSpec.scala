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
