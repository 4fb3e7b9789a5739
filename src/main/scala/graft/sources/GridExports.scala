package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.{ByteBuffer, ByteOrder}
import graft.grid._

/** Raster/vector exports + store maintenance (reference: SNK4/SNK5/SNK6).
  *
  * SNK4 (GeoTIFF export, tiff.py:92-122): [[exportWindowGeoTiff]] writes
  * a real GeoTIFF by hand ([[GeoTiff]], public TIFF 6.0 + GeoTIFF 1.0
  * specs — no GDAL needed); [[exportWindowEnvi]] remains as the
  * raw-binary alternative.
  * SNK5 (shapefile footprints, shputils.py:65-111) becomes GeoJSON.
  * SNK6 is the guarded recursive delete (io.py:81-103).
  */
object GridExports {

  /** Export one time-plane window as a single-band GeoTIFF (SNK4).
    * Executor-parallel up to the final ordered collect of the window (an
    * export to one local raster is driver-bound by definition — same as
    * the reference's GDAL writer, tiff.py:92-122).
    */
  def exportWindowGeoTiff(spark: SparkSession, header: GridHeader, root: String,
                          xFrom: Int, xTo: Int, yFrom: Int, yTo: Int, t: Int,
                          path: String): Unit = {
    val px = FractionStore.loadSliceXY(spark, header, root,
      xFrom, xTo, yFrom, yTo, t, t + 1, maskNodata = false)
    exportPlaneGeoTiff(header, px, xFrom, xTo, yFrom, yTo, path,
      valueCol = "value", dtype = header.dtype)
  }

  /** Export ANY single-band pixel plane — a derived product (trend map,
    * climatology season, anomaly plane), not just raw store values — as
    * a GeoTIFF. `df` needs (x, y, `valueCol`) rows inside the window;
    * missing pixels write nodata. Georeferencing comes from `header`'s
    * affine shifted to the window origin, so a derived raster drops
    * straight into GIS next to its source grid. Executor-parallel up to
    * the final window collect (a single local raster is driver-bound by
    * definition — the reference's GDAL writer has the same shape,
    * tiff.py:92-122); the window is raster-sized, the
    * contract-bounded collect class.
    */
  def exportPlaneGeoTiff(header: GridHeader, df: org.apache.spark.sql.DataFrame,
                         xFrom: Int, xTo: Int, yFrom: Int, yTo: Int,
                         path: String, valueCol: String = "value",
                         dtype: String = "float64"): Unit = {
    val w = xTo - xFrom
    val h = yTo - yFrom
    val px = df
      .filter(col("x") >= xFrom && col("x") < xTo &&
        col("y") >= yFrom && col("y") < yTo)
      .select(col("x"), col("y"), col(valueCol).cast("double"))
      .filter(col(valueCol).isNotNull)
      .collect()
    val arr = Array.fill(w * h)(header.nodata)
    px.foreach(r => arr((r.getInt(1) - yFrom) * w + (r.getInt(0) - xFrom)) =
      r.getDouble(2))
    // geotransform of the window origin (same affine, shifted origin)
    val (ulx, uly) = GeoTransform.pixelToGeo(header.geotArray,
      xFrom.toDouble, yFrom.toDouble)
    val geot = Seq(ulx, header.geot(1), 0.0, uly, 0.0, header.geot(5))
    val bytes = GeoTiff.write(w, h, dtype, arr, geot, header.srs,
      header.nodata)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)
  }

  /** Export one time-plane window as a GeoTIFF WITH embedded overview
    * pages (the COG overview layout: full-res IFD chained to
    * reduced-resolution IFDs, NewSubfileType = 1): zoomed-out display
    * reads the small page, not the full raster. Overviews use the same
    * nodata-aware 2×2 mean as [[graft.grid.GridPyramid]]; the window is
    * the contract-bounded driver collect every single-raster export is.
    */
  def exportPyramidGeoTiff(spark: SparkSession, header: GridHeader,
                           root: String, xFrom: Int, xTo: Int,
                           yFrom: Int, yTo: Int, t: Int,
                           levels: Int, path: String): Unit = {
    require(levels >= 1, "levels must be >= 1")
    val w = xTo - xFrom
    val h = yTo - yFrom
    val px = FractionStore.loadSliceXY(spark, header, root,
        xFrom, xTo, yFrom, yTo, t, t + 1, maskNodata = false)
      .select(col("x"), col("y"), col("value").cast("double"))
      .collect()
    val base = Array.fill(w * h)(header.nodata)
    px.foreach(r => base((r.getInt(1) - yFrom) * w + (r.getInt(0) - xFrom)) =
      r.getDouble(2))
    val (ulx, uly) = GeoTransform.pixelToGeo(header.geotArray,
      xFrom.toDouble, yFrom.toDouble)
    def geotAt(level: Int) = Seq(ulx, header.geot(1) * (1 << level), 0.0,
      uly, 0.0, header.geot(5) * (1 << level))
    // cascade of nodata-aware 2x2 block means (GridPyramid's rule)
    def reduce(d: Array[Double], dw: Int, dh: Int): (Array[Double], Int, Int) = {
      val w2 = (dw + 1) / 2; val h2 = (dh + 1) / 2
      val out = Array.fill(w2 * h2)(header.nodata)
      var by = 0
      while (by < h2) {
        var bx = 0
        while (bx < w2) {
          var s = 0.0; var n = 0
          var dy = 0
          while (dy < 2) {
            val yy = by * 2 + dy
            if (yy < dh) {
              var dx = 0
              while (dx < 2) {
                val xx = bx * 2 + dx
                if (xx < dw) {
                  val v = d(yy * dw + xx)
                  if (v != header.nodata) { s += v; n += 1 }
                }
                dx += 1
              }
            }
            dy += 1
          }
          if (n > 0) out(by * w2 + bx) = s / n
          bx += 1
        }
        by += 1
      }
      (out, w2, h2)
    }
    var cur = (base, w, h)
    val pages = Seq((w, h, base, geotAt(0))) ++ (1 to levels).map { l =>
      cur = reduce(cur._1, cur._2, cur._3)
      (cur._2, cur._3, cur._1, geotAt(l))
    }.map { case (pw, ph, d, g) => (pw, ph, d, g) }
    // overviews of integer grids hold fractional means -> float64 pages
    val bytes = GeoTiff.writePyramid(pages, "float64", header.srs,
      header.nodata)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)
  }

  /** Export one time-plane window as an ENVI raster (`<base>.bin` +
    * `<base>.hdr`). Executor-parallel up to the final ordered collect of
    * the window (an export to a single local raster is driver-bound by
    * definition — same as the reference's GeoTIFF writer).
    */
  def exportWindowEnvi(spark: SparkSession, header: GridHeader, root: String,
                       xFrom: Int, xTo: Int, yFrom: Int, yTo: Int, t: Int,
                       basePath: String): Unit = {
    val w = xTo - xFrom
    val h = yTo - yFrom
    val px = FractionStore.loadSliceXY(spark, header, root,
      xFrom, xTo, yFrom, yTo, t, t + 1, maskNodata = false)
      .select(col("x"), col("y"), col("value").cast("double"))
      .collect()
    val arr = Array.fill(w * h)(header.nodata)
    px.foreach(r => arr((r.getInt(1) - yFrom) * w + (r.getInt(0) - xFrom)) =
      r.getDouble(2))
    val (dtCode, put): (Int, (ByteBuffer, Double) => Unit) = header.dtype match {
      case "uint8"   => (1, (b, v) => b.put((v.toInt & 0xff).toByte))
      case "int16"   => (2, (b, v) => b.putShort(v.toShort))
      case "int32"   => (3, (b, v) => b.putInt(v.toInt))
      case "float32" => (4, (b, v) => b.putFloat(v.toFloat))
      case "float64" => (5, (b, v) => b.putDouble(v))
      case "uint16"  => (12, (b, v) => b.putShort((v.toInt & 0xffff).toShort))
    }
    val elemSize = Map(1 -> 1, 2 -> 2, 3 -> 4, 4 -> 4, 5 -> 8, 12 -> 2)(dtCode)
    val buf = ByteBuffer.allocate(w * h * elemSize).order(ByteOrder.LITTLE_ENDIAN)
    arr.foreach(v => put(buf, v))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$basePath.bin"),
      buf.array())
    // map info: projection, upper-left pixel (1-based), its geo coords,
    // pixel sizes — per the public ENVI header spec
    val (ulx, uly) = GeoTransform.pixelToGeo(header.geotArray,
      xFrom.toDouble, yFrom.toDouble)
    val proj = header.srs match {
      case "wgs84" => "Geographic Lat/Lon"
      case "sinusoidal" => "Sinusoidal"
    }
    val hdr =
      s"""ENVI
         |description = {graft export of ${header.name}}
         |samples = $w
         |lines = $h
         |bands = 1
         |header offset = 0
         |file type = ENVI Standard
         |data type = $dtCode
         |interleave = bsq
         |byte order = 0
         |data ignore value = ${header.nodata}
         |map info = {$proj, 1, 1, $ulx, $uly, ${header.geot(1)}, ${-header.geot(5)}}
         |""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$basePath.hdr"),
      hdr.getBytes("UTF-8"))
  }

  /** Fraction footprint polygons as a GeoJSON FeatureCollection
    * (SNK5 — QGIS overlay of which chunks exist). */
  def footprintsGeoJson(spark: SparkSession, header: GridHeader,
                        root: String): String = {
    val fracs = FractionStore.fractions(spark, root)
      .select("frac_num", "x0", "y0", "w", "h").distinct().collect()
    val features = fracs.map { r =>
      val (x0, y0, w, h) =
        (r.getInt(1).toDouble, r.getInt(2).toDouble, r.getInt(3), r.getInt(4))
      val corners = Seq((x0, y0), (x0 + w, y0), (x0 + w, y0 + h),
        (x0, y0 + h), (x0, y0))
      val ring = corners.map { case (x, y) =>
        val (lat, lng) = header.xyToLatLng(x, y)
        s"[$lng, $lat]"
      }.mkString("[", ", ", "]")
      s"""{"type": "Feature", "properties": {"frac_num": ${r.getInt(0)}}, """ +
        s""""geometry": {"type": "Polygon", "coordinates": [$ring]}}"""
    }
    features.mkString(
      """{"type": "FeatureCollection", "features": [""", ",\n", "]}")
  }

  /** Fraction footprint polygons as a real ESRI shapefile
    * (SNK5 parity — scripts/worldgrid_fracs_to_shapefile.py:25-61 writes
    * the same QGIS overlay through OGR; here via [[Shapefile]]). Writes
    * `<base>.shp` / `.shx` / `.dbf` with a frac_num attribute. */
  def footprintsShapefile(spark: SparkSession, header: GridHeader,
                          root: String, basePath: String): Unit = {
    val fracs = FractionStore.fractions(spark, root)
      .select("frac_num", "x0", "y0", "w", "h").distinct().collect()
      .sortBy(_.getInt(0))
    val rings = fracs.map { r =>
      val (x0, y0, w, h) =
        (r.getInt(1).toDouble, r.getInt(2).toDouble, r.getInt(3), r.getInt(4))
      Array((x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h),
        (x0, y0)).map { case (x, y) => header.xyToLatLng(x, y) }
    }
    val attrs = fracs.map(r => Map("frac_num" -> r.getInt(0).toString))
    Shapefile.writePolygons(basePath, rings.toSeq, attrs.toSeq)
  }

  /** Alert-patch bounding-box polygons as a shapefile — the Terra-i
    * style alert publication sink (detection pixels → CUSUM alarms →
    * `GridLabeling.labelPatches` → per-patch vector features). Each
    * patch becomes its bbox ring in lat/lng (pixel-corner aligned, so
    * adjacent patches tile exactly) with patch_id / n_px / centroid
    * attributes. The driver-side collect is PATCH-bounded (`maxPatches`
    * guard), never pixel-bounded — patch stats are already one partial
    * aggregation over the labeled plane. Returns the patch count. */
  def alertPatchesShapefile(header: graft.grid.GridHeader,
                            labeled: org.apache.spark.sql.DataFrame,
                            basePath: String,
                            maxPatches: Int = 100000): Int = {
    val rows = graft.grid.GridLabeling.patchStats(labeled)
      .limit(maxPatches + 1).collect()
    require(rows.length <= maxPatches,
      s"more than $maxPatches alert patches; aggregate upstream or " +
        "raise the guard")
    val sorted = rows.sortBy(_.getLong(0))
    val rings = sorted.map { r =>
      val x0 = r.getInt(2).toDouble; val x1 = r.getInt(3).toDouble + 1
      val y0 = r.getInt(4).toDouble; val y1 = r.getInt(5).toDouble + 1
      Array((x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0))
        .map { case (x, y) => header.xyToLatLng(x, y) }
    }
    val attrs = sorted.map { r =>
      Map("patch_id" -> r.getLong(0).toString,
        "n_px" -> r.getLong(1).toString,
        "cx" -> r.getDouble(6).toString, "cy" -> r.getDouble(7).toString)
    }
    Shapefile.writePolygons(basePath, rings.toSeq, attrs.toSeq)
    sorted.length
  }

  /** Guarded recursive delete (SNK6, io.py:81-103): refuses shallow
    * paths so a malformed root can never wipe a filesystem. */
  def deleteStore(spark: SparkSession, root: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(root)
    require(path.depth() >= 2,
      s"refusing to delete shallow path $root (guard, io.py:94-97)")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(path, true)
  }
}
