package graft.grid

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.QaDecode

/** Pipeline semantics tests (U1 + J4/J5): masked derivation over two
  * aligned grids, incremental resume, idempotence — the spec is
  * tests/scripts/test_complete_ndvi_worldgrid.py:42-122's no-op re-run
  * plus hadoop/spark.py:166-177's todo computation.
  */
class GridPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val (ndviRoot, qaRoot) = {
    val nr = TestSpark.tmpDir("mm_ndvi")
    val qr = TestSpark.tmpDir("mm_qa")
    SyntheticGrid.writeMiniModis(spark, nr, qr)
    (nr, qr)
  }

  test("two-input masked derivation produces aligned output (U1/J9)") {
    val ndviH = GridHeader.load(spark, ndviRoot)
    val qaH = GridHeader.load(spark, qaRoot)
    val outRoot = TestSpark.tmpDir("mm_out")
    val outH = ndviH.copy(name = "ndvi_masked")
    val pipe = new GridPipeline(Seq((ndviH, ndviRoot), (qaH, qaRoot)), outH, outRoot)

    // kernel: NDVI where QA confidence > 0, else nodata — the
    // notebook's masking as a chunk kernel. Confidence rule inlined:
    // gate bits or usefulness >= 12 (conf <= 0).
    val n = pipe.run(spark) { (row, payloads) =>
      val Seq(ndvi, qa) = payloads
      val out = new Array[Double](ndvi.length)
      var i = 0
      while (i < ndvi.length) {
        val q = qa(i).toInt & 0xffff
        val gated = (q & 3) == 3 || ((q >> 6) & 3) == 3 || ((q >> 8) & 1) == 1 ||
          ((q >> 10) & 1) == 1 || ((q >> 11) & 7) != 1 ||
          ((q >> 14) & 1) == 1 || ((q >> 15) & 1) == 1 ||
          ((q >> 2) & 0xf) >= 12
        out(i) = if (gated) -3000.0 else ndvi(i)
        i += 1
      }
      out
    }
    // 4x4 fracs x 2 time chunks
    assert(n == 32)

    // verify against the relational formulation of the same mask
    val got = FractionStore.pixels(outH,
      FractionStore.fractions(spark, outRoot), maskNodata = false)
    val ndviPx = FractionStore.pixels(ndviH,
      FractionStore.fractions(spark, ndviRoot), maskNodata = false)
    val qaPx = FractionStore.pixels(qaH,
      FractionStore.fractions(spark, qaRoot), maskNodata = false)
      .withColumnRenamed("value", "qa")
    val expected = ndviPx.join(qaPx, Seq("x", "y", "t"))
      .select(col("x"), col("y"), col("t"),
        when(QaDecode.modisQaConf(col("qa")) > 0, col("value"))
          .otherwise(-3000.0).cast("int").as("value"))
    assert(got.count() == expected.count())
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("re-run is a no-op; missing chunks are backfilled (J5 incremental)") {
    val ndviH = GridHeader.load(spark, ndviRoot)
    val outRoot = TestSpark.tmpDir("mm_inc")
    val outH = ndviH.copy(name = "ndvi_copy")
    def mkPipe = new GridPipeline(Seq((ndviH, ndviRoot)), outH, outRoot)
    val identity: (FracRow, Seq[Array[Double]]) => Array[Double] =
      (_, ps) => ps.head

    val n1 = mkPipe.run(spark)(identity)
    assert(n1 == 32)
    // idempotence: everything done -> nothing recomputed
    assert(mkPipe.run(spark)(identity) == 0)

    // drop two chunks from the output -> only those get recomputed
    val pruned = FractionStore.fractions(spark, outRoot)
      .filter(!(col("frac_num") === 0))
    val tmp = TestSpark.tmpDir("mm_inc2")
    FractionStore.write(spark, outH, pruned, tmp)
    val pipe2 = new GridPipeline(Seq((ndviH, ndviRoot)), outH, tmp)
    assert(pipe2.run(spark)(identity) == 2) // frac 0 x 2 time chunks
    assert(pipe2.run(spark)(identity) == 0)
  }

  test("multi-output pipeline equals two single-output runs, one pass") {
    val ndviH = GridHeader.load(spark, ndviRoot)
    val qaH = GridHeader.load(spark, qaRoot)
    val ins = Seq((ndviH, ndviRoot), (qaH, qaRoot))
    def maskedKernel(ps: Seq[Array[Double]]): Array[Double] = {
      val Seq(ndvi, qa) = ps
      Array.tabulate(ndvi.length) { i =>
        if (QaDecode.modisQaConfScalar(qa(i).toInt) > 0) ndvi(i) else -3000.0
      }
    }
    def confKernel(ps: Seq[Array[Double]]): Array[Double] =
      ps(1).map(q => math.round(
        QaDecode.modisQaConfScalar(q.toInt) * 100.0).toDouble)

    // single-output references
    val refMasked = TestSpark.tmpDir("mm_ref_masked")
    val refConf = TestSpark.tmpDir("mm_ref_conf")
    val maskedH = ndviH.copy(name = "m_masked")
    val confH = ndviH.copy(name = "m_conf", dtype = "uint8", nodata = 255.0)
    new GridPipeline(ins, maskedH, refMasked)
      .run(spark)((_, ps) => maskedKernel(ps))
    new GridPipeline(ins, confH, refConf)
      .run(spark)((_, ps) => confKernel(ps))

    // one multi-output pass
    val outMasked = TestSpark.tmpDir("mm_multi_masked")
    val outConf = TestSpark.tmpDir("mm_multi_conf")
    val multi = new GridMultiPipeline(ins,
      Seq((maskedH, outMasked), (confH, outConf)))
    val n = multi.run(spark) { (_, ps) =>
      Seq(maskedKernel(ps), confKernel(ps))
    }
    assert(n == 32)
    // idempotence across BOTH stores
    assert(multi.run(spark)((_, ps) =>
      Seq(maskedKernel(ps), confKernel(ps))) == 0)

    Seq((maskedH, refMasked, outMasked), (confH, refConf, outConf)).foreach {
      case (h, ref, got) =>
        val a = FractionStore.pixels(h,
          FractionStore.fractions(spark, ref), maskNodata = false)
        val b = FractionStore.pixels(h,
          FractionStore.fractions(spark, got), maskNodata = false)
        assert(a.count() == b.count())
        assert(a.except(b).isEmpty && b.except(a).isEmpty, h.name)
    }

    // partial-done resume: drop chunks from ONE store only; the rerun
    // backfills just that store's missing chunks
    val pruned = FractionStore.fractions(spark, outConf)
      .filter(!(col("frac_num") === 1))
    val prunedRoot = TestSpark.tmpDir("mm_multi_conf2")
    FractionStore.write(spark, confH, pruned, prunedRoot)
    val multi2 = new GridMultiPipeline(ins,
      Seq((maskedH, outMasked), (confH, prunedRoot)))
    assert(multi2.run(spark)((_, ps) =>
      Seq(maskedKernel(ps), confKernel(ps))) == 2)
    val refConfPx = FractionStore.pixels(confH,
      FractionStore.fractions(spark, refConf), maskNodata = false)
    val gotConfPx = FractionStore.pixels(confH,
      FractionStore.fractions(spark, prunedRoot), maskNodata = false)
    assert(gotConfPx.count() == refConfPx.count())
    assert(gotConfPx.except(refConfPx).isEmpty)
    // ...and the store that was already complete gained no duplicates
    val maskedChunks = FractionStore.fractions(spark, outMasked)
      .groupBy(col("frac_num"), col("time_chunk")).count()
      .filter(col("count") > 1).count()
    assert(maskedChunks == 0)
  }

  test("forceAll recomputes everything") {
    val ndviH = GridHeader.load(spark, ndviRoot)
    val outRoot = TestSpark.tmpDir("mm_force")
    val outH = ndviH.copy(name = "ndvi_f")
    val p1 = new GridPipeline(Seq((ndviH, ndviRoot)), outH, outRoot)
    assert(p1.run(spark)((_, ps) => ps.head) == 32)
    val p2 = new GridPipeline(Seq((ndviH, ndviRoot)), outH, outRoot, forceAll = true)
    assert(p2.run(spark)((_, ps) => ps.head) == 32)
  }
}
