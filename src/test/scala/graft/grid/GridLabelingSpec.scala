package graft.grid

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class GridLabelingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 20x10 grid in 5x5 chunks: borders at x=5,10,15 and y=5
  private val h = GridHeader(name = "label_t", width = 20, height = 10,
    fracWidth = 5, fracHeight = 5, fracNDates = 1, dtype = "float32",
    srs = "wgs84", geot = Seq(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
    timestampsMs = Seq(0L), nodata = -1.0)

  private def label(pts: Seq[(Int, Int)]): Map[(Int, Int), Long] =
    GridLabeling.labelPatches(spark, h, pts.toDF("x", "y"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap

  /** In-memory reference CCL (BFS, 4-connectivity, min-pid labels). */
  private def refLabels(pts: Seq[(Int, Int)]): Map[(Int, Int), Long] = {
    val set = pts.toSet
    val seen = scala.collection.mutable.Set.empty[(Int, Int)]
    val out = scala.collection.mutable.Map.empty[(Int, Int), Long]
    pts.foreach { p =>
      if (!seen(p)) {
        val comp = scala.collection.mutable.ArrayBuffer(p)
        seen += p
        var i = 0
        while (i < comp.length) {
          val (x, y) = comp(i)
          Seq((x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1)).foreach { q =>
            if (set(q) && !seen(q)) { seen += q; comp += q }
          }
          i += 1
        }
        val lbl = comp.map { case (x, y) => y.toLong * h.width + x }.min
        comp.foreach(c => out(c) = lbl)
      }
    }
    out.toMap
  }

  test("a snake crossing three chunk borders is one patch") {
    // horizontal run y=2, x=0..17, plus a hook down at x=17 crossing y=5
    val pts = (0 to 17).map((_, 2)) ++ (3 to 7).map((17, _))
    val got = label(pts)
    assert(got == refLabels(pts))
    assert(got.values.toSet.size == 1)
    assert(got.values.head == 2L * 20 + 0)
  }

  test("diagonal touches are NOT connected (4-connectivity)") {
    val pts = Seq((4, 4), (5, 5), (6, 4))
    val got = label(pts)
    assert(got == refLabels(pts))
    assert(got.values.toSet.size == 3)
  }

  test("random scatter matches the reference labeling exactly") {
    val rng = new scala.util.Random(7)
    val pts = (0 until 120).map(_ =>
      (rng.nextInt(20), rng.nextInt(10))).distinct
    assert(label(pts) == refLabels(pts))
  }

  test("U-shape merging two border components through a lower bridge") {
    // two vertical arms in different chunks joined only below y=5:
    // local labeling gives separate components in three chunks, and the
    // driver union must collapse a CHAIN of equivalences (arm A ~
    // bridge, bridge ~ arm B)
    val pts = (0 to 7).map((3, _)) ++ (0 to 7).map((12, _)) ++
      (4 to 11).map((_, 7))
    val got = label(pts)
    assert(got == refLabels(pts))
    assert(got.values.toSet.size == 1)
  }

  test("patch stats summarize area, bbox, centroid") {
    val pts = Seq((2, 2), (3, 2), (2, 3), (9, 9))
    val labeled = GridLabeling.labelPatches(spark, h, pts.toDF("x", "y"))
    val stats = GridLabeling.patchStats(labeled)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5),
          r.getDouble(6), r.getDouble(7))).toMap
    val big = 2L * 20 + 2
    val single = 9L * 20 + 9
    assert(stats(big) == ((3L, 2, 3, 2, 3, 7.0 / 3, 7.0 / 3)))
    assert(stats(single) == ((1L, 9, 9, 9, 9, 9.0, 9.0)))
    graft.ops.CacheRegistry.releaseAll()
  }

  test("alert patches export as shapefile bbox polygons with attributes") {
    // an L-patch (bbox 2..4 x 2..3) and a lone pixel at (9, 9)
    val pts = Seq((2, 2), (3, 2), (4, 2), (2, 3), (9, 9))
    val labeled = GridLabeling.labelPatches(spark, h, pts.toDF("x", "y"))
    val base = TestSpark.tmpDir("alert_shp") + "/patches"
    val n = graft.sources.GridExports.alertPatchesShapefile(h, labeled, base)
    assert(n == 2)
    val feats = graft.sources.Shapefile.loadPolygons(base + ".shp")
    assert(feats.length == 2)
    val byId = feats.map(f => f.attrs("patch_id").toLong -> f).toMap
    val big = byId(2L * 20 + 2)
    assert(big.attrs("n_px") == "4")
    // wgs84 identity-ish geot (lng = x, lat = -y): bbox ring spans
    // pixel corners [2,5)x[2,4) -> lng in {2,5}, lat in {-2,-4}
    val lngs = big.ring.map(_._2).distinct.sorted.toSeq
    val lats = big.ring.map(_._1).distinct.sorted.toSeq
    assert(lngs == Seq(2.0, 5.0), s"lngs $lngs")
    assert(lats == Seq(-4.0, -2.0), s"lats $lats")
    val lone = byId(9L * 20 + 9)
    assert(lone.attrs("n_px") == "1" && lone.attrs("cx") == "9.0")
    // guard: a patch flood beyond the bound must refuse, not collect
    intercept[IllegalArgumentException] {
      graft.sources.GridExports.alertPatchesShapefile(h, labeled,
        base + "_g", maxPatches = 1)
    }
    graft.ops.CacheRegistry.releaseAll()
  }
}
