package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.grid._

/** Verifies the hand-written GeoTIFF against an independent minimal
  * TIFF reader implemented here from the spec (not the writer's code):
  * header, IFD walk, inline-vs-offset value resolution, strip decode.
  */
class GeoTiffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** tag id -> raw value bytes (+ type/count), per TIFF 6.0. */
  private def readTags(b: Array[Byte]): (Map[Int, (Int, Int, Array[Byte])]) = {
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    assert(bb.get() == 'I' && bb.get() == 'I', "little-endian magic")
    assert(bb.getShort() == 42, "TIFF version")
    val ifd = bb.getInt()
    bb.position(ifd)
    val n = bb.getShort()
    val out = (0 until n).map { _ =>
      val id = bb.getShort() & 0xffff
      val tpe = bb.getShort() & 0xffff
      val count = bb.getInt()
      val size = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 12 -> 8)(tpe) * count
      val valueBytes = new Array[Byte](size)
      if (size <= 4) {
        bb.get(valueBytes); (0 until 4 - size).foreach(_ => bb.get())
      } else {
        val off = bb.getInt()
        val save = bb.position()
        bb.position(off); bb.get(valueBytes); bb.position(save)
      }
      id -> (tpe, count, valueBytes)
    }.toMap
    assert(bb.getInt() == 0, "single IFD")
    out
  }

  private def u16s(v: Array[Byte]): Seq[Int] = {
    val bb = ByteBuffer.wrap(v).order(ByteOrder.LITTLE_ENDIAN)
    (0 until v.length / 2).map(_ => bb.getShort() & 0xffff)
  }
  private def u32(v: Array[Byte]): Int =
    ByteBuffer.wrap(v).order(ByteOrder.LITTLE_ENDIAN).getInt()
  private def f64s(v: Array[Byte]): Seq[Double] = {
    val bb = ByteBuffer.wrap(v).order(ByteOrder.LITTLE_ENDIAN)
    (0 until v.length / 8).map(_ => bb.getDouble())
  }

  /** independent zlib inflate (spec-side, not the writer's code) */
  private def inflate(packed: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(packed)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!inf.finished()) out.write(buf, 0, inf.inflate(buf))
    inf.end()
    out.toByteArray
  }

  test("wgs84 int-dtype window round-trips through GeoTIFF (SNK4)") {
    val root = java.nio.file.Files.createTempDirectory("graft_tiff").toString
    val h = SyntheticGrid.writeTiny(spark, root) // float32 wgs84
    val path = s"$root/export.tif"
    GridExports.exportWindowGeoTiff(spark, h, root, 20, 50, 5, 25, 2, path)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val tags = readTags(bytes)

    assert(u32(tags(256)._3) == 30 && u32(tags(257)._3) == 20)
    assert(u16s(tags(258)._3) == Seq(32))         // float32 bits
    assert(u16s(tags(259)._3) == Seq(8))          // DEFLATE (ref default)
    assert(u16s(tags(339)._3) == Seq(3))          // IEEE float
    assert(u32(tags(278)._3) == 20)               // one strip
    assert(new String(tags(42113)._3, "US-ASCII").trim == "-999")

    // geo referencing: pixel scale + tiepoint at the WINDOW origin
    val scale = f64s(tags(33550)._3)
    assert(scale(0) == 0.01 && scale(1) == 0.01)
    val tie = f64s(tags(33922)._3)
    assert(tie(3) == 0.01 * 20 && tie(4) == -0.01 * 5)
    // GeoKeys: geographic model, WGS84
    val keys = u16s(tags(34735)._3)
    val kv = keys.drop(4).grouped(4).map(g => g(0) -> g(3)).toMap
    assert(kv(1024) == 2 && kv(2048) == 4326)

    // strip decode: values equal the generator (nodata kept raw)
    val stripOff = u32(tags(273)._3)
    val stripLen = u32(tags(279)._3)
    val strip = inflate(bytes.slice(stripOff, stripOff + stripLen))
    val vals = PayloadCodec.decodeDouble(strip, PayloadCodec.F32)
    assert(vals.length == 30 * 20)
    for (ly <- 0 until 20; lx <- 0 until 30) {
      val (x, y, t) = (20 + lx, 5 + ly, 2)
      val expected = if ((x + y + t) % 13 == 0) -999.0
                     else ((x * 31 + y * 17 + t * 7) % 97).toDouble
      assert(vals(ly * 30 + lx) == expected, s"pixel ($x,$y)")
    }
    GridExports.deleteStore(spark, root)
  }

  test("sinusoidal int16 export carries the projected GeoKeys") {
    val root = java.nio.file.Files.createTempDirectory("graft_tiff2").toString
    val qr = java.nio.file.Files.createTempDirectory("graft_tiff2_qa").toString
    val (nh, _) = SyntheticGrid.writeMiniModis(spark, root, qr)
    val path = s"$root/ndvi.tif"
    GridExports.exportWindowGeoTiff(spark, nh, root, 0, 40, 0, 30, 1, path)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val tags = readTags(bytes)
    assert(u16s(tags(258)._3) == Seq(16) && u16s(tags(339)._3) == Seq(2))
    val keys = u16s(tags(34735)._3)
    val kv = keys.drop(4).grouped(4).map(g => g(0) -> g(3)).toMap
    assert(kv(1024) == 1)        // projected
    assert(kv(3075) == 24)       // CT_Sinusoidal
    assert(kv(3072) == 32767)    // user-defined PCS
    val citation = new String(tags(34737)._3, "US-ASCII")
    assert(citation.contains("Sinusoidal"))
    // strip values match the NDVI generator at t=1
    val strip = inflate(bytes.slice(u32(tags(273)._3),
      u32(tags(273)._3) + u32(tags(279)._3)))
    val vals = PayloadCodec.decodeDouble(strip, PayloadCodec.I16)
    for (ly <- 0 until 30; lx <- 0 until 40) {
      val expected = if ((lx * ly + 1) % 17 == 0) -3000.0
                     else ((lx * 7 + ly * 11 + 13) % 8000 - 1000).toDouble
      assert(vals(ly * 40 + lx) == expected, s"pixel ($lx,$ly)")
    }
    GridExports.deleteStore(spark, root)
    GridExports.deleteStore(spark, qr)
  }

  test("GeoTiff.read round-trips write for every dtype and compression") {
    for (dtype <- Seq("uint8", "int16", "uint16", "int32", "float32", "float64");
         compress <- Seq("deflate", "none")) {
      val vals = Array.tabulate(12 * 7)(i => (i % 250).toDouble)
      val geot = Seq(3.5, 0.25, 0.0, -1.5, 0.0, -0.25)
      val bytes = GeoTiff.write(12, 7, dtype, vals, geot, "wgs84", -42.0,
        compress)
      val r = GeoTiff.read(bytes)
      assert(r.width == 12 && r.height == 7 && r.dtype == dtype)
      assert(r.data.toSeq == vals.toSeq, s"$dtype/$compress")
      assert(r.geot == geot, s"$dtype/$compress")
      assert(r.nodata == -42.0)
    }
  }

  test("DEFLATE shrinks a redundant raster and survives gzip re-wrap") {
    val vals = Array.tabulate(64 * 64)(i => (i % 7).toDouble) // compressible
    val geot = Seq(0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    val deflated = GeoTiff.write(64, 64, "int16", vals, geot, "wgs84", -1.0)
    val plain = GeoTiff.write(64, 64, "int16", vals, geot, "wgs84", -1.0,
      "none")
    assert(deflated.length < plain.length / 2,
      s"expected real compression: ${deflated.length} vs ${plain.length}")
  }

  test("store -> GeoTIFF tiles -> re-ingest is lossless (SRC + SNK4)") {
    val root = java.nio.file.Files.createTempDirectory("graft_tiff3").toString
    val h = SyntheticGrid.writeTiny(spark, root)
    val tileDir = java.nio.file.Files.createTempDirectory("graft_tiles").toString
    // export the full grid, one GeoTIFF per time plane
    for (t <- 0 until h.nDates)
      GridExports.exportWindowGeoTiff(spark, h, root,
        0, h.width, 0, h.height, t, s"$tileDir/0_0_$t.tif")
    val back = java.nio.file.Files.createTempDirectory("graft_tiff3b").toString
    graft.sources.Ingest.ingestGeoTiffDirAligned(spark, h, tileDir, back)
    def all(r: String) = FractionStore.loadSliceXY(spark, h, r,
      0, h.width, 0, h.height, 0, h.nDates, maskNodata = false)
      .select("x", "y", "t", "value")
    assert(all(back).except(all(root)).isEmpty &&
      all(root).except(all(back)).isEmpty)

    // SRC6 twin: gzip every tile (the GLCF arrival format, .tif.gz) and
    // ingest through the gunzip decoder — byte-identical store
    val gzDir = java.nio.file.Files.createTempDirectory("graft_tiles_gz").toString
    new java.io.File(tileDir).listFiles().filter(_.getName.endsWith(".tif"))
      .foreach { f =>
        val out = new java.util.zip.GZIPOutputStream(
          new java.io.FileOutputStream(s"$gzDir/${f.getName}.gz"))
        out.write(java.nio.file.Files.readAllBytes(f.toPath))
        out.close()
      }
    val backGz = java.nio.file.Files.createTempDirectory("graft_tiff3c").toString
    graft.sources.Ingest.ingestGeoTiffGzDirAligned(spark, h, gzDir, backGz)
    assert(all(backGz).except(all(root)).isEmpty &&
      all(root).except(all(backGz)).isEmpty)

    GridExports.deleteStore(spark, root)
    GridExports.deleteStore(spark, back)
    GridExports.deleteStore(spark, backGz)
  }

  test("derived product (trend map) exports as a georeferenced GeoTIFF") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft_trend").toString
    val h = SyntheticGrid.writeTiny(spark, root)
    val px = FractionStore.loadSliceXY(spark, h, root,
      0, 20, 0, 10, 0, h.nDates)
    val trend = graft.grid.GridTimeSeries.trendSlope(px)
    val path = java.nio.file.Files.createTempDirectory("graft_trend_out")
      .resolve("trend.tif").toString
    GridExports.exportPlaneGeoTiff(h, trend, 0, 20, 0, 10, path,
      valueCol = "slope", dtype = "float64")
    val r = GeoTiff.read(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)))
    assert(r.width == 20 && r.height == 10)
    // raster values equal the recomputed per-pixel slopes
    val expect = trend.select(col("x"), col("y"), col("slope"))
      .collect().map(row => (row.getInt(0), row.getInt(1)) -> row.getDouble(2))
      .toMap
    for (y <- 0 until 10; x <- 0 until 20)
      assert(math.abs(r.data(y * 20 + x) - expect((x, y))) < 1e-12,
        s"pixel ($x,$y)")
    // georeferencing: window origin at (0,0) keeps the grid's affine
    assert(r.geot.take(2) == Seq(h.geot(0), h.geot(1)))
    GridExports.deleteStore(spark, root)
  }

  test("pyramid export: chained overview IFDs, GDAL-style reduced pages") {
    val root = java.nio.file.Files.createTempDirectory("graft_cog").toString
    val h = SyntheticGrid.writeTiny(spark, root)
    val path = s"$root/pyr.tif"
    GridExports.exportPyramidGeoTiff(spark, h, root, 0, 40, 0, 20, t = 0,
      levels = 2, path)
    val pages = GeoTiff.readPages(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    assert(pages.map(p => (p.width, p.height))
      == Seq((40, 20), (20, 10), (10, 5)))
    // base page carries the raw window values (nodata kept as -999)
    val base = pages.head
    assert(base.nodata == -999.0 && base.dtype == "float64")
    val expectBase = FractionStore.loadSliceXY(spark, h, root,
        0, 40, 0, 20, 0, 1, maskNodata = false)
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        r.getFloat(3).toDouble)).toMap
    (0 until 20).foreach { y => (0 until 40).foreach { x =>
      assert(base.data(y * 40 + x) == expectBase((x, y)), s"($x,$y)")
    }}
    // level 1 equals the nodata-aware 2x2 mean of the base page
    val l1 = pages(1)
    (0 until 10).foreach { by => (0 until 20).foreach { bx =>
      val vals = for {
        dy <- 0 until 2; dx <- 0 until 2
        v = base.data((by * 2 + dy) * 40 + bx * 2 + dx)
        if v != -999.0
      } yield v
      val expect = if (vals.isEmpty) -999.0 else vals.sum / vals.size
      assert(l1.data(by * 20 + bx) == expect, s"block ($bx,$by)")
    }}
    // geot: pixel size doubles per level, origin fixed
    assert(l1.geot(1) == h.geot(1) * 2 && l1.geot(5) == h.geot(5) * 2)
    assert(pages(2).geot(1) == h.geot(1) * 4)
    assert(l1.geot(0) == base.geot(0) && l1.geot(3) == base.geot(3))
    // single-page write still reads as one page (chain terminator)
    val single = GeoTiff.write(2, 2, "int16", Array(1.0, 2.0, 3.0, 4.0),
      Seq(0.0, 1.0, 0.0, 0.0, 0.0, -1.0), "wgs84", -9)
    assert(GeoTiff.readPages(single).length == 1)
  }
}
