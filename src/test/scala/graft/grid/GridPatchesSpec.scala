package graft.grid

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Patch extraction (the grid -> ML bridge) verified differentially:
  * every patch must equal the single-window loadSliceXY of the same
  * box, including chunk-straddling and grid-edge-clipped patches.
  */
class GridPatchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val root: String = {
    val r = TestSpark.tmpDir("patches_tiny")
    SyntheticGrid.writeTiny(spark, r)
    r
  }
  lazy val header: GridHeader = GridHeader.load(spark, root)

  // chunk geometry: fracWidth 19, fracHeight 5, fracNDates 3 — origins
  // chosen to straddle every boundary kind, plus one edge-clipped patch
  private val origins = Seq(
    (0L, 0, 0),     // aligned at the grid corner
    (1L, 17, 3),    // straddles one frac boundary in x AND y
    (2L, 36, 9),    // interior, straddles x
    (3L, 186, 126)) // clipped by the grid edge (190x130)

  private def extract(mask: Boolean) =
    GridPatches.extractPatches(spark, header, root,
      origins.toDF("patch_id", "px0", "py0"),
      pw = 6, ph = 6, tFrom = 2, tTo = 7, maskNodata = mask)

  test("every patch equals loadSliceXY of the same box (differential)") {
    val got = extract(mask = false)
      .select("patch_id", "x", "y", "t", "value")
      .as[(Long, Int, Int, Int, Float)].collect().toSet
    val expected = origins.flatMap { case (id, px0, py0) =>
      FractionStore.loadSliceXY(spark, header, root,
          px0, px0 + 6, py0, py0 + 6, 2, 7, maskNodata = false)
        .as[(Int, Int, Int, Float)].collect()
        .map { case (x, y, t, v) => (id, x, y, t, v) }
    }.toSet
    assert(got == expected)
    // completeness: in-bounds patches carry 6*6*5 pixels, the edge
    // patch clips to 4*4*5
    val counts = extract(mask = false).groupBy("patch_id").count()
      .as[(Long, Long)].collect().toMap
    assert(counts == Map(0L -> 180L, 1L -> 180L, 2L -> 180L, 3L -> 80L))
  }

  test("nodata masking nulls the closed-form nodata cells") {
    val got = extract(mask = true)
      .filter(col("x") === 17 || col("x") === 20).collect()
    // tinyValue is nodata where (x+y+t) % 13 == 0 — must surface as NULL
    got.foreach { r =>
      val (x, y, t) = (r.getInt(1), r.getInt(2), r.getInt(3))
      if ((x + y + t) % 13 == 0)
        assert(r.isNullAt(4), s"($x,$y,$t) must be masked")
      else assert(!r.isNullAt(4))
    }
    assert(got.exists(r =>
      (r.getInt(1) + r.getInt(2) + r.getInt(3)) % 13 == 0),
      "the probe window must contain at least one nodata cell")
  }

  test("patchTensors flattens t-major with the full pixel count") {
    val px = extract(mask = false).filter(col("patch_id") === 1L)
    val row = GridPatches.patchTensors(px).collect().head
    assert(row.getAs[Long]("n_px") == 180L)
    val values = row.getSeq[Float](row.fieldIndex("values"))
    // reference order: loadSliceXY rows sorted by (t, y, x)
    val expected = FractionStore.loadSliceXY(spark, header, root,
        17, 23, 3, 9, 2, 7, maskNodata = false)
      .as[(Int, Int, Int, Float)].collect()
      .sortBy { case (x, y, t, _) => (t, y, x) }.map(_._4).toSeq
    assert(values == expected)
  }
}
