package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.grid._
import graft.sources.NpyCodec

/** ST1 as a real stream: blobs arriving in a landing dir extend the
  * time axis incrementally; the final store equals the all-at-once
  * batch build, and re-delivered blobs are no-ops (idempotence).
  */
class GridStreamIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val fullHeader = SyntheticGrid.tinyHeader
  private def ts(i: Int): Long = fullHeader.timestampsMs(i)

  private def planeBlob(t: Int): Array[Byte] = {
    val h = fullHeader
    val data = new Array[Double](h.width * h.height)
    for (y <- 0 until h.height; x <- 0 until h.width)
      data(y * h.width + x) =
        if ((x + y + t) % 13 == 0) -999.0
        else ((x * 31 + y * 17 + t * 7) % 97).toDouble
    NpyCodec.write("<f4", Seq(h.height, h.width, 1), data)
  }

  test("streamed date blobs reproduce the batch-built store (ST1 streaming)") {
    val root = TestSpark.tmpDir("stream_grid")
    val landing = TestSpark.tmpDir("stream_landing")
    val ckpt = TestSpark.tmpDir("stream_ckpt")
    // seed store: first 5 dates, batch-built
    val seed = fullHeader.copy(timestampsMs = fullHeader.timestampsMs.take(5))
    FractionStore.write(spark, seed,
      FractionStore.fromPixels(spark, seed,
        SyntheticGrid.pixelDf(spark, seed, SyntheticGrid.tinyValue)), root)

    // wave 1: dates 5..7 land (plus a REDELIVERY of date 4 — no-op)
    for (t <- Seq(4, 5, 6, 7))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$landing/${ts(t)}.npy"), planeBlob(t))
    val q1 = GridStreamIngest.start(spark, root, landing, ckpt)
    q1.awaitTermination(120000)

    // wave 2: the remaining dates arrive later
    for (t <- Seq(8, 9, 10))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$landing/${ts(t)}.npy"), planeBlob(t))
    val q2 = GridStreamIngest.start(spark, root, landing, ckpt)
    q2.awaitTermination(120000)

    val h = GridHeader.load(spark, root)
    assert(h.timestampsMs == fullHeader.timestampsMs,
      "time axis must equal the full axis, in order")
    // pixel-exact equality with a from-scratch full batch build
    val fullRoot = TestSpark.tmpDir("stream_grid_full")
    FractionStore.write(spark, fullHeader,
      FractionStore.fromPixels(spark, fullHeader,
        SyntheticGrid.pixelDf(spark, fullHeader, SyntheticGrid.tinyValue)),
      fullRoot)
    def all(r: String, hh: GridHeader) =
      FractionStore.loadSliceXY(spark, hh, r, 0, hh.width, 0, hh.height,
        0, hh.nDates, maskNodata = false).select("x", "y", "t", "value")
    assert(all(root, h).except(all(fullRoot, fullHeader)).isEmpty &&
      all(fullRoot, fullHeader).except(all(root, h)).isEmpty)

    // idempotence: draining the same landing dir again changes nothing
    val ckpt2 = TestSpark.tmpDir("stream_ckpt2")
    val q3 = GridStreamIngest.start(spark, root, landing, ckpt2)
    q3.awaitTermination(120000)
    val h2 = GridHeader.load(spark, root)
    assert(h2.timestampsMs == fullHeader.timestampsMs)
    assert(all(root, h2).count() == 190L * 130 * 11)
  }
}
