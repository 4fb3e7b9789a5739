package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import graft.grid.PayloadCodec

/** Minimal single-band GeoTIFF writer (reference: SNK4 —
  * rastercube/utils/tiff.py:92-122 writes NDVI tiles through GDAL; here
  * the format is written by hand from the public TIFF 6.0 + GeoTIFF 1.0
  * specs, no native library).
  *
  * Produces a classic little-endian TIFF: one strip — DEFLATE-compressed
  * by default, matching the reference's COMPRESS=DEFLATE
  * (tiff.py:103-108), via stdlib `java.util.zip` — BlackIsZero, with
  * ModelPixelScale/ModelTiepoint + a GeoKey directory (EPSG 4326 for
  * wgs84 grids; user-defined sinusoidal projection with CT_Sinusoidal
  * for MODIS-style grids) and the GDAL_NODATA ascii tag. Readable by
  * GDAL/QGIS/rasterio.
  */
object GeoTiff {

  /** zlib-wrapped DEFLATE (TIFF compression 8, "Adobe deflate"). */
  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(packed: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(packed)
    val out = new java.io.ByteArrayOutputStream(packed.length * 3 + 64)
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput()) sys.error("truncated DEFLATE strip")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** One IFD entry: `payload` is the raw little-endian value bytes;
    * per TIFF 6.0 they live inline in the 4-byte slot when they fit,
    * else after the IFD with the slot holding their offset. */
  private final case class Tag(id: Int, tiffType: Int, count: Int,
                               payload: Array[Byte])

  private val TAscii = 2; private val TShort = 3
  private val TLong = 4; private val TDouble = 12

  private def shorts(vs: Seq[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(vs.length * 2).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(v => bb.putShort(v.toShort))
    bb.array()
  }

  private def longs(vs: Seq[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(vs.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(bb.putInt)
    bb.array()
  }

  private def doubles(vs: Seq[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(vs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(bb.putDouble)
    bb.array()
  }

  private def short1(v: Int) = Tag(_: Int, TShort, 1, shorts(Seq(v)))
  private def long1(v: Int) = Tag(_: Int, TLong, 1, longs(Seq(v)))

  /** (bits per sample, TIFF SampleFormat) per grid dtype. */
  def sampleLayout(dtype: String): (Int, Int) = dtype match {
    case "uint8"   => (8, 1)
    case "int16"   => (16, 2)
    case "uint16"  => (16, 1)
    case "int32"   => (32, 2)
    case "float32" => (32, 3)
    case "float64" => (64, 3)
  }

  private def dtypeFor(bits: Int, sampleFormat: Int): String =
    (bits, sampleFormat) match {
      case (8, 1)  => "uint8"
      case (16, 2) => "int16"
      case (16, 1) => "uint16"
      case (32, 2) => "int32"
      case (32, 3) => "float32"
      case (64, 3) => "float64"
      case other   => throw new IllegalArgumentException(
        s"unsupported TIFF sample layout $other")
    }

  /** A decoded single-band raster. `data` is row-major [y][x] doubles;
    * `geot` is the GDAL-order geotransform; `nodata` is NaN when the
    * file carries no GDAL_NODATA tag. */
  final case class Raster(width: Int, height: Int, dtype: String,
                          data: Array[Double], geot: Seq[Double],
                          nodata: Double)

  /** Parse a classic little-endian single-band striped TIFF/GeoTIFF,
    * uncompressed or DEFLATE (compression 8/32946) — the subset
    * [[write]] produces, which is also what GDAL writes for single-band
    * rasters with COMPRESS=NONE or COMPRESS=DEFLATE. */
  def read(bytes: Array[Byte]): Raster = readPages(bytes).head

  /** Parse EVERY page of the IFD chain — the full-resolution band plus
    * any reduced-resolution overview pages ([[writePyramid]] emits the
    * COG-style layout; GDAL reads such overviews as raster bands'
    * overview levels). */
  def readPages(bytes: Array[Byte]): Seq[Raster] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.get() == 'I' && bb.get() == 'I' && bb.getShort() == 42,
      "not a little-endian classic TIFF")
    var ifd = bb.getInt()
    val pages = scala.collection.mutable.ArrayBuffer[Raster]()
    while (ifd != 0) {
      val (page, next) = readPageAt(bytes, ifd)
      pages += page
      ifd = next
    }
    pages.toSeq
  }

  private def readPageAt(bytes: Array[Byte], ifdPos: Int): (Raster, Int) = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.position(ifdPos)
    val n = bb.getShort()
    val tags = (0 until n).map { _ =>
      val id = bb.getShort() & 0xffff
      val tpe = bb.getShort() & 0xffff
      val count = bb.getInt()
      val size = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 12 -> 8)
        .getOrElse(tpe, 1) * count
      val v = new Array[Byte](size)
      if (size <= 4) { bb.get(v); (size until 4).foreach(_ => bb.get()) }
      else {
        val off = bb.getInt(); val save = bb.position()
        bb.position(off); bb.get(v); bb.position(save)
      }
      id -> (tpe, count, v)
    }.toMap
    val nextIfd = bb.getInt()

    def ints(id: Int): Seq[Int] = tags.get(id).map { case (tpe, count, v) =>
      val b = ByteBuffer.wrap(v).order(ByteOrder.LITTLE_ENDIAN)
      (0 until count).map(_ =>
        if (tpe == TShort) b.getShort() & 0xffff else b.getInt())
    }.getOrElse(Seq.empty)
    def dbls(id: Int): Seq[Double] = tags.get(id).map { case (_, count, v) =>
      val b = ByteBuffer.wrap(v).order(ByteOrder.LITTLE_ENDIAN)
      (0 until count).map(_ => b.getDouble())
    }.getOrElse(Seq.empty)

    val compression = ints(259).headOption.getOrElse(1)
    require(compression == 1 || compression == 8 || compression == 32946,
      s"unsupported TIFF compression $compression (none/DEFLATE only)")
    require(ints(277).headOption.forall(_ == 1), "multi-band TIFF unsupported")
    val width = ints(256).head
    val height = ints(257).head
    val dtype = dtypeFor(ints(258).headOption.getOrElse(8),
      ints(339).headOption.getOrElse(1))
    val strip = {
      val offs = ints(273); val lens = ints(279)
      // strips are independently compressed: inflate each, then concat
      val parts = offs.zip(lens).map { case (o, l) =>
        val raw = java.util.Arrays.copyOfRange(bytes, o, o + l)
        if (compression == 1) raw else inflate(raw)
      }
      val out = new Array[Byte](parts.map(_.length).sum)
      var pos = 0
      parts.foreach { p =>
        System.arraycopy(p, 0, out, pos, p.length); pos += p.length
      }
      out
    }
    val data = PayloadCodec.decodeDouble(strip, PayloadCodec.code(dtype))
    require(data.length == width * height, "strip size mismatch")
    val geot = (dbls(33550), dbls(33922)) match {
      case (scale, tie) if scale.length >= 2 && tie.length >= 6 =>
        // tiepoint (i,j,k)->(x,y,z); general form honors nonzero i,j
        Seq(tie(3) - tie(0) * scale(0), scale(0), 0.0,
          tie(4) + tie(1) * scale(1), 0.0, -scale(1))
      case _ => Seq(0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    }
    val nodata = tags.get(42113).map { case (_, _, v) =>
      new String(v, "US-ASCII").trim.toDouble
    }.getOrElse(Double.NaN)
    (Raster(width, height, dtype, data, geot, nodata), nextIfd)
  }

  /** Serialize one band. `data` is row-major [y][x] doubles (length
    * w*h); packed to the grid dtype with [[PayloadCodec]] (identical
    * value semantics to the fraction store). `geot` is the 6-element
    * GDAL-order geotransform of the EXPORTED window's origin.
    * `compress` is "deflate" (default — the reference's setting) or
    * "none".
    */
  def write(width: Int, height: Int, dtype: String, data: Array[Double],
            geot: Seq[Double], srs: String, nodata: Double,
            compress: String = "deflate"): Array[Byte] =
    writePyramid(Seq((width, height, data, geot)), dtype, srs, nodata,
      compress)

  /** Serialize a full-resolution band plus reduced-resolution overview
    * pages as a CHAINED-IFD TIFF (the classic overview layout GDAL and
    * COG readers consume): page 0 is the base raster, pages 1+ carry
    * NewSubfileType = reduced-image. Each page brings its own
    * (width, height, data, geot) — geot pixel size doubles per level.
    */
  def writePyramid(pages: Seq[(Int, Int, Array[Double], Seq[Double])],
                   dtype: String, srs: String, nodata: Double,
                   compress: String = "deflate"): Array[Byte] = {
    require(pages.nonEmpty, "need at least one page")
    val built = pages.zipWithIndex.map {
      case ((width, height, data, geot), i) =>
        require(data.length == width * height,
          s"page $i: data length ${data.length} != $width x $height")
        require(geot.length == 6 && geot(2) == 0.0 && geot(4) == 0.0,
          "north-up geotransform required")
        val strip = compress match {
          case "deflate" => deflate(PayloadCodec.encodeDouble(data, dtype))
          case "none"    => PayloadCodec.encodeDouble(data, dtype)
          case c         => sys.error(s"unsupported compression $c")
        }
        (width, height, geot, strip, i > 0)
    }
    val compTag = if (compress == "deflate") 8 else 1

    // two-pass layout: place every page's strip | IFD | ext payloads,
    // then materialize with each IFD chaining to the next
    final case class Placed(strip: Array[Byte], stripOff: Int, ifdOff: Int,
                            placed: Seq[(Tag, Long)], end: Int)
    var pos = 8
    val placedPages = built.map { case (w, h, geot, strip, reduced) =>
      val stripOff = pos
      pos += strip.length + (strip.length & 1)
      val tags = pageTags(w, h, dtype, geot, srs, nodata, compTag,
        strip.length, stripOff, reduced)
      val ifdOff = pos
      pos += 2 + tags.length * 12 + 4
      val placed = tags.map { t =>
        if (t.payload.length <= 4) (t, -1L)
        else {
          val off = pos
          pos += t.payload.length + (t.payload.length & 1)
          (t, off.toLong)
        }
      }
      Placed(strip, stripOff, ifdOff, placed, pos)
    }

    val out = ByteBuffer.allocate(pos).order(ByteOrder.LITTLE_ENDIAN)
    out.put('I'.toByte).put('I'.toByte).putShort(42)
      .putInt(placedPages.head.ifdOff)
    placedPages.zipWithIndex.foreach { case (p, i) =>
      out.position(p.stripOff)
      out.put(p.strip)
      out.position(p.ifdOff)
      out.putShort(p.placed.length.toShort)
      p.placed.foreach { case (t, extOff) =>
        out.putShort(t.id.toShort).putShort(t.tiffType.toShort)
          .putInt(t.count)
        if (extOff < 0) {
          out.put(t.payload)
          (t.payload.length until 4).foreach(_ => out.put(0.toByte))
        } else out.putInt(extOff.toInt)
      }
      out.putInt(if (i + 1 < placedPages.length)
        placedPages(i + 1).ifdOff else 0)
      p.placed.foreach { case (t, extOff) =>
        if (extOff >= 0) {
          out.position(extOff.toInt)
          out.put(t.payload)
        }
      }
    }
    out.array()
  }

  /** The full per-page tag list (ascending ids), strip at the given
    * absolute offset; `reduced` pages carry NewSubfileType = 1. */
  private def pageTags(width: Int, height: Int, dtype: String,
                       geot: Seq[Double], srs: String, nodata: Double,
                       compTag: Int, stripLen: Int, stripOffset: Int,
                       reduced: Boolean): Seq[Tag] = {
    val (bits, sampleFormat) = sampleLayout(dtype)

    // GeoKey directory: version 1.1.0 + keys sorted by id.
    // Each key: (id, location, count, value) — location 0 = inline,
    // else the tag id holding the payload (34736 doubles / 34737 ascii).
    val asciiParams = new StringBuilder
    val doubleParams = scala.collection.mutable.ArrayBuffer[Double]()
    def asciiKey(s: String): (Int, Int) = {
      val start = asciiParams.length
      asciiParams.append(s).append('|') // GeoTIFF ascii values end with |
      (s.length + 1, start)
    }
    val keys: Seq[(Int, Int, Int, Int)] = srs match {
      case "wgs84" =>
        Seq(
          (1024, 0, 1, 2),     // GTModelType = geographic
          (1025, 0, 1, 1),     // GTRasterType = PixelIsArea
          (2048, 0, 1, 4326))  // GeographicType = WGS84
      case "sinusoidal" =>
        val (n, off) = asciiKey("Sinusoidal (sphere R=6371007.181m)")
        doubleParams += 0.0 // ProjNatOriginLong
        Seq(
          (1024, 0, 1, 1),          // GTModelType = projected
          (1025, 0, 1, 1),          // GTRasterType = PixelIsArea
          (1026, 34737, n, off),    // GTCitation
          (3072, 0, 1, 32767),      // ProjectedCSType = user-defined
          (3075, 0, 1, 24),         // ProjCoordTrans = CT_Sinusoidal
          (3076, 0, 1, 9001),       // ProjLinearUnits = metre
          (3080, 34736, 1, 0))      // ProjNatOriginLong -> double #0
    }
    val geoDir = shorts(
      Seq(1, 1, 0, keys.length) ++
        keys.flatMap { case (id, loc, cnt, v) => Seq(id, loc, cnt, v) })

    val nodataAscii = {
      val s = (if (nodata == nodata.floor && nodata.abs < 1e15)
        nodata.toLong.toString else nodata.toString) + " "
      s.getBytes("US-ASCII")
    }

    var tags = Seq(
      long1(width)(256),               // ImageWidth
      long1(height)(257),              // ImageLength
      short1(bits)(258),               // BitsPerSample
      short1(compTag)(259),            // compression: 1 none / 8 DEFLATE
      short1(1)(262),                  // BlackIsZero
      long1(stripOffset)(273),         // StripOffsets (absolute)
      short1(1)(277),                  // SamplesPerPixel
      long1(height)(278),              // RowsPerStrip: single strip
      long1(stripLen)(279),            // StripByteCounts
      short1(1)(284),                  // chunky
      short1(sampleFormat)(339),
      Tag(33550, TDouble, 3,
        doubles(Seq(geot(1), -geot(5), 0.0))),            // ModelPixelScale
      Tag(33922, TDouble, 6,
        doubles(Seq(0.0, 0.0, 0.0, geot(0), geot(3), 0.0))), // ModelTiepoint
      Tag(34735, TShort, geoDir.length / 2, geoDir))
    if (reduced)
      tags :+= long1(1)(254)           // NewSubfileType = reduced image
    if (doubleParams.nonEmpty)
      tags :+= Tag(34736, TDouble, doubleParams.length,
        doubles(doubleParams.toSeq))
    if (asciiParams.nonEmpty)
      tags :+= Tag(34737, TAscii, asciiParams.length,
        asciiParams.toString.getBytes("US-ASCII"))
    tags :+= Tag(42113, TAscii, nodataAscii.length, nodataAscii)
    tags.sortBy(_.id) // TIFF requires ascending tag ids
  }
}
