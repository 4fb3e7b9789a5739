package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.grid._

/** The fused chunk kernels must agree with the exploded relational
  * path — same QA gates, same nodata handling, same box/time windows —
  * on the miniModis fixture.
  */
class PayloadKernelsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val (ndviRoot, qaRoot) = {
    val nr = TestSpark.tmpDir("kern_ndvi")
    val qr = TestSpark.tmpDir("kern_qa")
    SyntheticGrid.writeMiniModis(spark, nr, qr)
    (nr, qr)
  }

  test("scalar QA decoder equals the Column form on all 65536 words") {
    import spark.implicits._
    val fromCol = spark.range(65536)
      .select(QaDecode.modisQaConf(col("id").cast("int")).as("c"))
      .as[Float].collect()
    (0 until 65536).foreach { q =>
      assert(QaDecode.modisQaConfScalar(q) == fromCol(q), s"word $q")
    }
  }

  test("fused qaConfStats equals explode + sum + count") {
    val qh = SyntheticGrid.miniModisQaHeader
    val fused = GridKernels.qaConfStats(spark, qaRoot).collect()(0)
    val ref = FractionStore.pixels(qh, FractionStore.fractions(spark, qaRoot),
        maskNodata = false)
      .agg(sum(QaDecode.modisQaConf(col("value"))).as("s"),
        count(lit(1)).as("n")).collect()(0)
    assert(fused.getLong(1) == ref.getLong(1))
    assert(math.abs(fused.getDouble(0) - ref.getDouble(0)) <
      1e-9 * math.abs(ref.getDouble(0)))
  }

  test("fused boxStatsByT equals the exploded window load, per date") {
    val nh = SyntheticGrid.miniModisNdviHeader
    // box deliberately NOT chunk-aligned (crosses 50-px fraction edges)
    val (x0, x1, y0, y1, t0, t1) = (37, 173, 8, 141, 1, 4)
    def key(r: org.apache.spark.sql.Row) = r.getInt(0)
    val fused = GridKernels.boxStatsByT(spark, nh, ndviRoot,
        x0, x1, y0, y1, t0, t1).collect().sortBy(key)
    val ref = FractionStore.loadSliceXY(spark, nh, ndviRoot,
        x0, x1, y0, y1, t0, t1)
      .groupBy(col("t"))
      .agg(avg(col("value")).as("mean_v"),
        count(col("value")).as("n_valid"), count(lit(1)).as("n_total"),
        min(col("value")).cast("double").as("min_v"),
        max(col("value")).cast("double").as("max_v"))
      .collect().sortBy(key)
    assert(fused.length == ref.length && fused.nonEmpty)
    fused.zip(ref).foreach { case (f, r) =>
      assert(f.getInt(0) == r.getInt(0))
      assert(f.getLong(2) == r.getLong(2), s"n_valid at t=${f.getInt(0)}")
      assert(f.getLong(3) == r.getLong(3), s"n_total at t=${f.getInt(0)}")
      // int16 values sum exactly in doubles -> means are bit-equal
      assert(f.isNullAt(1) == r.isNullAt(1))
      if (!f.isNullAt(1)) assert(f.getDouble(1) == r.getDouble(1))
      assert(f.getDouble(4) == r.getDouble(4) && f.getDouble(5) == r.getDouble(5))
    }
  }

  test("fused boxAgg equals the exploded window aggregate") {
    val nh = SyntheticGrid.miniModisNdviHeader
    val (x0, x1, y0, y1, t0, t1) = (12, 160, 30, 190, 0, 3)
    val fused = GridKernels.boxAgg(spark, nh, ndviRoot,
      x0, x1, y0, y1, t0, t1).collect()(0)
    val ref = FractionStore.loadSliceXY(spark, nh, ndviRoot,
        x0, x1, y0, y1, t0, t1)
      .agg(count(col("value")).as("n_valid"), avg(col("value")).as("mean_v"),
        min(col("value")).cast("double").as("min_v"),
        max(col("value")).cast("double").as("max_v"))
      .collect()(0)
    assert(fused.getLong(0) == ref.getLong(0))
    assert(fused.getDouble(1) == ref.getDouble(1))
    assert(fused.getDouble(2) == ref.getDouble(2))
    assert(fused.getDouble(3) == ref.getDouble(3))
  }

  test("fused trendSlopeByPixel equals the relational trend map") {
    val nh = SyntheticGrid.miniModisNdviHeader
    // box NOT chunk-aligned; [0, 2) is one time slab (fracNDates = 2)
    val (x0, x1, y0, y1, t0, t1) = (37, 173, 8, 141, 0, 2)
    def key(r: org.apache.spark.sql.Row) = (r.getInt(0), r.getInt(1))
    val fused = GridKernels.trendSlopeByPixel(spark, nh, ndviRoot,
      x0, x1, y0, y1, t0, t1).collect().sortBy(key)
    val ref = GridTimeSeries.trendSlope(
      FractionStore.loadSliceXY(spark, nh, ndviRoot, x0, x1, y0, y1, t0, t1))
      .collect().sortBy(key)
    assert(fused.length == ref.length && fused.nonEmpty)
    fused.zip(ref).foreach { case (f, r) =>
      assert(key(f) == key(r))
      assert(f.getLong(2) == r.getLong(2),
        s"n at (${f.getInt(0)},${f.getInt(1)})")
      // integer-valued sums + shared HALF_UP rounding -> bit-equal
      assert(f.getDouble(3) == r.getDouble(3),
        s"slope at (${f.getInt(0)},${f.getInt(1)})")
    }
    // straddling two time slabs must be rejected, not silently wrong
    intercept[IllegalArgumentException] {
      GridKernels.trendSlopeByPixel(spark, nh, ndviRoot,
        x0, x1, y0, y1, 1, 3)
    }
  }

  test("fused cusumByPixel equals the relational cusum, incl. alarms") {
    // small 4-dates-per-slab store so training(2) + monitoring(2) sit
    // in one payload; values hit nodata gaps via the ndvi closed form
    val h = SyntheticGrid.miniModisNdviHeader.copy(
      name = "cusum_fx", width = 80, height = 60,
      fracWidth = 20, fracHeight = 20, fracNDates = 4)
    val root = TestSpark.tmpDir("kern_cusum")
    // planted deforestation: every 5th diagonal drops ~900 NDVI in the
    // monitoring window (one-sided CUSUM only sees DROPS — the stock
    // ndvi closed form rises monotonically and trips nothing)
    SyntheticGrid.writeDirect(spark, h, root, new SyntheticGrid.PixelFn {
      def apply(x: Int, y: Int, t: Int): Double =
        if ((x * y + t) % 17 == 0) -3000.0
        else if ((x + y) % 5 == 0 && t >= 2) (x % 50) - 900.0
        else (x % 50 + y % 40 + t * 3).toDouble
    })
    // box NOT chunk-aligned
    val (x0, x1, y0, y1) = (7, 73, 3, 58)
    def key(r: org.apache.spark.sql.Row) =
      (r.getInt(0), r.getInt(1), r.getInt(2))
    val fused = GridKernels.cusumByPixel(spark, h, root,
      x0, x1, y0, y1, 0, 4, trainT = 2, slack = 0.5, threshold = 5.0)
      .collect().sortBy(key)
    val ref = GridTimeSeries.cusumDetect(
      FractionStore.loadSliceXY(spark, h, root, x0, x1, y0, y1, 0, 4),
      trainT = 2, slack = 0.5, threshold = 5.0)
      .collect().sortBy(key)
    assert(fused.length == ref.length && fused.nonEmpty)
    assert(ref.exists(_.getInt(4) == 1), "fixture must trip some alarms")
    fused.zip(ref).foreach { case (f, r) =>
      assert(key(f) == key(r))
      // integer micro-grid sums + shared HALF_UP rounding -> bit-equal
      assert(f.getDouble(3) == r.getDouble(3), s"cusum at ${key(f)}")
      assert(f.getInt(4) == r.getInt(4), s"alarm at ${key(f)}")
    }
    // straddling two time slabs must be rejected, not silently wrong
    intercept[IllegalArgumentException] {
      GridKernels.cusumByPixel(spark, SyntheticGrid.miniModisNdviHeader,
        root, x0, x1, y0, y1, 0, 4, trainT = 2, slack = 0.0,
        threshold = 1.0)
    }
  }

  test("fused maskedMeanByT equals the aligned-load relational query") {
    val nh = SyntheticGrid.miniModisNdviHeader
    val qh = SyntheticGrid.miniModisQaHeader
    // box deliberately NOT chunk-aligned (crosses 50-px fraction edges)
    val (x0, x1, y0, y1, t0, t1) = (23, 187, 11, 162, 1, 4)
    val fused = GridKernels.maskedMeanByT(spark,
        (nh, ndviRoot), (qh, qaRoot), x0, x1, y0, y1, t0, t1)
      .collect().map(r => (r.getInt(0),
        if (r.isNullAt(1)) Double.NaN else r.getDouble(1),
        r.getLong(2))).sortBy(_._1)
    val ref = FractionStore.loadAlignedSliceXY(spark,
        Seq((nh, ndviRoot), (qh, qaRoot)), x0, x1, y0, y1, t0, t1,
        masks = Seq(true, false))
      .withColumn("conf", QaDecode.modisQaConf(col("value_1")))
      .groupBy(col("t"))
      .agg(avg(when(col("conf") > 0.5, col("value_0"))).as("mean_masked"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0),
        if (r.isNullAt(1)) Double.NaN else r.getDouble(1),
        r.getLong(2))).sortBy(_._1)
    assert(fused.map(_._1).toSeq == ref.map(_._1).toSeq)
    assert(fused.map(_._3).toSeq == ref.map(_._3).toSeq)
    fused.zip(ref).foreach { case ((t, mf, _), (_, mr, _)) =>
      assert((mf.isNaN && mr.isNaN) || math.abs(mf - mr) < 1e-9,
        s"mean mismatch at t=$t: $mf vs $mr")
    }
  }
}
