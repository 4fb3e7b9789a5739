package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.QaDecode
import graft.grid._
import graft.sources._

/** End-to-end reference-user journey in one spec: the full rastercube
  * workflow a user of the reference runs today — MODIS-style HDF4
  * archives land, two bands ingest into worldgrids, a QA-masked NDVI
  * derivation runs as a pipeline, windows are analyzed and exported as
  * GeoTIFF + shapefile footprints, and every artifact reloads through
  * this library's own readers. Each stage is covered by its own spec;
  * this one pins that the stages COMPOSE.
  */
class WorkflowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("HDF landing -> ingest -> masked pipeline -> analyze -> export -> reload") {
    // one 40x40 grid, 2 time chunks of 2 dates, 20x20 fractions
    val ndviH = GridHeader(
      name = "wf_ndvi", width = 40, height = 40,
      fracWidth = 20, fracHeight = 20, fracNDates = 2,
      dtype = "int16", srs = "wgs84",
      geot = Seq(0.0, 0.01, 0.0, 0.0, 0.0, -0.01),
      timestampsMs = Seq(10L, 20L, 30L, 40L), nodata = -3000.0)
    val qaH = ndviH.copy(name = "wf_qa", dtype = "uint16", nodata = 65535.0)

    def ndvi(x: Int, y: Int, t: Int): Double =
      if ((x * y + t) % 17 == 0) -3000.0
      else ((x * 7 + y * 11 + t * 13) % 8000 - 1000).toDouble
    def qa(x: Int, y: Int, t: Int): Double =
      ((x * 40503 + y * 9973 + t * 65521) % 65536).toDouble

    // 1. the landing directory: one HDF4 archive per (x half, time pair),
    //    each carrying BOTH datasets like a real MODIS granule
    val landing = TestSpark.tmpDir("wf_landing")
    for (x0 <- Seq(0, 20); t0 <- Seq(0, 2)) {
      val dims = Seq(40, 20, 2) // [h, w, nd] box at (x0, 0, t0)
      def plane(f: (Int, Int, Int) => Double) = (for {
        ly <- 0 until 40; lx <- 0 until 20; lt <- 0 until 2
      } yield f(x0 + lx, ly, t0 + lt)).toArray
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$landing/${x0}_0_$t0.hdf"),
        Hdf4.writeSds(Seq(
          Hdf4.Sds("250m 16 days NDVI", dims, "int16", plane(ndvi)),
          Hdf4.Sds("250m 16 days VI Quality", dims, "uint16", plane(qa)))))
    }

    // 2. ingest each band from the same archives (by dataset name)
    val ndviRoot = TestSpark.tmpDir("wf_ndvi_store")
    val qaRoot = TestSpark.tmpDir("wf_qa_store")
    assert(Ingest.ingestHdf4DirAligned(spark, ndviH, landing, ndviRoot,
      Some("NDVI")) == 8) // 2x2 fracs x 2 time chunks
    assert(Ingest.ingestHdf4DirAligned(spark, qaH, landing, qaRoot,
      Some("VI Quality")) == 8)

    // 3. QA-masked NDVI derivation (the reference's SparkPipelineStep)
    val derivedH = ndviH.copy(name = "wf_masked")
    val derivedRoot = TestSpark.tmpDir("wf_masked_store")
    val pipeline = new GridPipeline(
      Seq((ndviH, ndviRoot), (qaH, qaRoot)), derivedH, derivedRoot)
    pipeline.run(spark) { (row, payloads) =>
      val Seq(nd, q) = payloads
      val out = new Array[Double](nd.length)
      var i = 0
      while (i < nd.length) {
        out(i) = if (QaDecode.modisQaConfScalar(q(i).toInt) > 0.5f) nd(i)
                 else -3000.0
        i += 1
      }
      out
    }

    // 4. analyze: fused box stats == exploded aggregate on the DERIVED grid
    val fused = GridKernels.boxAgg(spark, derivedH, derivedRoot,
      5, 35, 3, 37, 0, 4).collect()(0)
    val ref = FractionStore.loadSliceXY(spark, derivedH, derivedRoot,
      5, 35, 3, 37, 0, 4)
      .agg(count(col("value")), avg(col("value"))).collect()(0)
    assert(fused.getLong(0) == ref.getLong(0) && fused.getLong(0) > 0)
    assert(fused.getDouble(1) == ref.getDouble(1))
    // the mask really bit: fewer valid pixels than the raw band
    val rawValid = FractionStore.loadSliceXY(spark, ndviH, ndviRoot,
      5, 35, 3, 37, 0, 4).agg(count(col("value"))).collect()(0).getLong(0)
    assert(fused.getLong(0) < rawValid)

    // 5. export: GeoTIFF window + shapefile footprints, reload both
    val outDir = TestSpark.tmpDir("wf_out")
    GridExports.exportWindowGeoTiff(spark, derivedH, derivedRoot,
      0, 40, 0, 40, 1, s"$outDir/masked_t1.tif")
    val raster = GeoTiff.read(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$outDir/masked_t1.tif")))
    assert(raster.width == 40 && raster.height == 40)
    assert(raster.nodata == -3000.0)
    // spot-check an exported pixel against the masked generator
    val (px, py) = (7, 9)
    val expected = if (QaDecode.modisQaConfScalar(qa(px, py, 1).toInt) > 0.5f)
      ndvi(px, py, 1) else -3000.0
    assert(raster.data(py * 40 + px) == expected)

    GridExports.footprintsShapefile(spark, derivedH, derivedRoot,
      s"$outDir/fracs")
    val feats = Shapefile.loadPolygons(s"$outDir/fracs.shp")
    assert(feats.length == 4 && feats.forall(_.ring.length == 5)) // 2x2 fracs

    // 6. the exported GeoTIFF re-ingests losslessly (round trip closes)
    val tileDir = TestSpark.tmpDir("wf_tiles")
    for (t <- 0 until 4)
      GridExports.exportWindowGeoTiff(spark, derivedH, derivedRoot,
        0, 40, 0, 40, t, s"$tileDir/0_0_$t.tif")
    val backRoot = TestSpark.tmpDir("wf_back")
    Ingest.ingestGeoTiffDirAligned(spark, derivedH, tileDir, backRoot)
    def all(r: String) = FractionStore.loadSliceXY(spark, derivedH, r,
      0, 40, 0, 40, 0, 4, maskNodata = false).select("x", "y", "t", "value")
    assert(all(backRoot).except(all(derivedRoot)).isEmpty &&
      all(derivedRoot).except(all(backRoot)).isEmpty)
  }

  test("corpus journey: near-dup pairs -> drop wrappers keep one per cluster") {
    import spark.implicits._
    import graft.ops.Dedup
    def mk(i: Int): String =
      (0 until 40).map(j => s"w${(i * 97 + j * 13) % 1000}x$j").mkString(" ")
    val docs = ((0 until 12).map(i => (i.toLong, mk(i))) ++ Seq(
      (100L, mk(0)), // exact copy of 0
      (101L, "zzz " + mk(1).split(" ").drop(1).mkString(" ")) // near dup of 1
    )).toDF("doc_id", "text")
    // the two calls a real corpus pipeline makes before training
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", minJaccard = 0.5)
      .select("id_a", "id_b")
    val kept = Dedup.dropNearDuplicates(
      Dedup.dropExactDuplicates(docs, "doc_id", "text"), "doc_id", pairs)
    assert(kept.select("doc_id").as[Long].collect().toSet ==
      (0L until 12L).toSet)
    graft.ops.CacheRegistry.releaseAll()
  }

  test("vectorizer journey: text -> hashing trick -> ANN finds the near-dup") {
    import spark.implicits._
    import graft.ops.{FeatureHash, Similarity}
    def mk(i: Int): String =
      (0 until 40).map(j => s"w${(i * 97 + j * 13) % 1000}x$j").mkString(" ")
    // doc 100 = doc 0 with one word changed; everything else unrelated
    val docs = ((0 until 10).map(i => (i.toLong, mk(i))) ++ Seq(
      (100L, "zzz " + mk(0).split(" ").drop(1).mkString(" "))))
      .toDF("doc_id", "text")
    val dense = FeatureHash.densify(
      FeatureHash.hashedTf(docs, "doc_id", "text", dim = 64), dim = 64)
    // engine-made vectors feed the stock ANN surface unchanged
    val queries = dense.filter($"vec_id" === 100L)
    val top = Similarity.bruteForceTopK(
        dense.filter($"vec_id" =!= 100L), queries, k = 1)
      .collect().head
    assert(top.getAs[Long]("corpus_id") === 0L,
      "nearest neighbor of the near-dup must be its source doc")
    graft.ops.CacheRegistry.releaseAll()
  }
}
