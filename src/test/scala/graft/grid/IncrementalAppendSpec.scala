package graft.grid

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** ST1 spec, ported from the reference's chunking-invariance +
  * idempotence test (tests/scripts/test_complete_ndvi_worldgrid.py:42-122):
  * building a grid all-at-once must equal create(prefix)+append(rest),
  * for several fracNDates; re-appending must be a no-op.
  */
class IncrementalAppendSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val nDatesTotal = 7
  val allTs: Seq[Long] = (0 until nDatesTotal).map(i => 1000L + i)

  def mkHeader(fracNDates: Int, ts: Seq[Long]): GridHeader = GridHeader(
    name = "inc", width = 30, height = 20,
    fracWidth = 10, fracHeight = 10, fracNDates = fracNDates,
    dtype = "float32", srs = "wgs84",
    geot = Seq(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
    timestampsMs = ts, nodata = -9.0)

  /** New-date pixels with LOCAL t (0..tTo-tFrom), values computed at the
    * ABSOLUTE time index so they match the all-at-once build. */
  def pixelsFor(h: GridHeader, tFrom: Int, tTo: Int) =
    SyntheticGrid.pixelDf(spark,
      h.copy(timestampsMs = (0 until (tTo - tFrom)).map(i => 9999L + i)),
      (x, y, t) => SyntheticGrid.tinyValue(x, y, t + lit(tFrom)))

  def storePixels(root: String): Set[(Int, Int, Int, Double)] = {
    val h = GridHeader.load(spark, root)
    FractionStore.pixels(h, FractionStore.fractions(spark, root),
      maskNodata = false)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
        r.getFloat(3).toDouble)).toSet
  }

  for (fracNDates <- Seq(2, 3, 4)) {
    test(s"chunking invariance + idempotence, fracNDates=$fracNDates") {
      // full build with all 7 dates
      val hFull = mkHeader(fracNDates, allTs)
      val rootFull = TestSpark.tmpDir(s"inc_full_$fracNDates")
      FractionStore.write(spark, hFull,
        FractionStore.fromPixels(spark, hFull,
          SyntheticGrid.pixelDf(spark, hFull, SyntheticGrid.tinyValue)),
        rootFull)

      // prefix build with 5 dates, then append dates 5..6
      val hPre = mkHeader(fracNDates, allTs.take(5))
      val rootInc = TestSpark.tmpDir(s"inc_pre_$fracNDates")
      FractionStore.write(spark, hPre,
        FractionStore.fromPixels(spark, hPre,
          SyntheticGrid.pixelDf(spark, hPre, SyntheticGrid.tinyValue)),
        rootInc)
      val newTs = allTs.drop(5)
      val newPx = pixelsFor(hPre, 5, 7)
      val h1 = IncrementalAppend.appendDates(spark, rootInc, newTs, newPx)
      assert(h1.timestampsMs == allTs)

      // bit-identical pixel content (assert_grids_same analog)
      assert(storePixels(rootFull) == storePixels(rootInc))

      // idempotence: appending the same dates again is a no-op
      val h2 = IncrementalAppend.appendDates(spark, rootInc, newTs, newPx)
      assert(h2.timestampsMs == allTs)
      assert(storePixels(rootFull) == storePixels(rootInc))
    }
  }
}
