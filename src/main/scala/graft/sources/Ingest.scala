package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.grid._

/** Bulk ingestion (reference: SRC4/SRC6/U3 —
  * create_ndvi_worldgrid.py:61-157's shared-memory pool choreography
  * becomes one declarative job: binaryFile scan -> per-partition decode
  * -> chunk shuffle -> partitioned parquet write) and the file-index
  * scan (SRC5, datasources/modis.py:30-110).
  *
  * Blob formats: NPY (the reference's own fraction serialization,
  * jgrid3.py:65-77), GeoTIFF (plain or gzipped), and HDF4 SDS
  * ([[Hdf4]] — the reference's MODIS input format, uncompressed
  * subset; datasets selectable by name like modis.py:224-229). Each is
  * one [[BlobDecoder]]; adding a format changes only `decode`.
  */
object Ingest {

  /** MODIS-style filename parse (SRC5/F2, modis.py:17-27):
    * `MOD13Q1.A2000049.h10v09.005.2006270052117.hdf` ->
    * (satellite, julian date, tile, h, v). As reusable Columns.
    */
  val ModisNameRegex = "(MOD13Q1|MYD13Q1)\\.A([0-9]{7})\\.h([0-9]{2})v([0-9]{2})\\.([0-9]{3})\\..*"

  def parseModisName(name: org.apache.spark.sql.Column): DataFrame => DataFrame =
    df => df
      .withColumn("satellite", regexp_extract(name, ModisNameRegex, 1))
      .withColumn("ts", to_timestamp(regexp_extract(name, ModisNameRegex, 2),
        "yyyyDDD"))
      .withColumn("tile_h", regexp_extract(name, ModisNameRegex, 3).cast("int"))
      .withColumn("tile_v", regexp_extract(name, ModisNameRegex, 4).cast("int"))
      .withColumn("tile", concat(lit("h"),
        regexp_extract(name, ModisNameRegex, 3), lit("v"),
        regexp_extract(name, ModisNameRegex, 4)))

  /** File-index scan of a landing directory: one row per blob with parsed
    * name metadata (sorted-by-ts per tile downstream is an orderBy). */
  def fileIndex(spark: SparkSession, dir: String, glob: String = "*"): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("length"),
        element_at(split(col("path"), "/"), -1).as("name"))
    parseModisName(col("name"))(files)
  }

  /** Ingest a directory of NPY pixel blobs into a fraction store.
    * Blob naming: `<x0>_<y0>_<t0>.npy`, each a dense [h, w, nd] C-order
    * array positioned at (x0, y0, t0) — the tile-window shape of the
    * reference's per-cell import (create_ndvi_worldgrid.py:129-148).
    *
    * One job: binaryFile scan -> decode (mapPartitions via explode of
    * decoded pixels) -> fromPixels chunk shuffle -> partitioned write.
    */
  def ingestNpyDir(spark: SparkSession, header: GridHeader,
                   blobDir: String, outRoot: String): Long = {
    import spark.implicits._
    val blobs = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.npy").load(blobDir)
      .select(element_at(split(col("path"), "/"), -1).as("name"),
        col("content"))
      .as[(String, Array[Byte])]
    val pixels = blobs.flatMap { case (name, bytes) =>
      val Array(x0, y0, t0) = name.stripSuffix(".npy").split("_").map(_.toInt)
      val npy = NpyCodec.read(bytes)
      val Seq(h, w, nd) = npy.shape
      for {
        ly <- 0 until h; lx <- 0 until w; lt <- 0 until nd
      } yield (x0 + lx, y0 + ly, t0 + lt,
        npy.data((ly * w + lx) * nd + lt))
    }.toDF("x", "y", "t", "value")
    val rows = FractionStore.fromPixels(spark, header, pixels)
    FractionStore.write(spark, header, rows, outRoot)
    FractionStore.fractions(spark, outRoot).count()
  }

  /** Chunk-aligned ingest — the at-scale variant of [[ingestNpyDir]]:
    * instead of exploding blobs to pixel rows (a w*h*nd-row shuffle per
    * blob), each blob is split map-side into the PACKED sub-boxes it
    * contributes to each overlapped chunk, and the shuffle carries one
    * (chunk key, packed bytes) record per (blob, chunk) intersection —
    * for a typical tile import that is ~100x fewer shuffled bytes and
    * ~10^5x fewer shuffled rows. The reducer assembles each chunk from
    * its sub-boxes (nodata-filled where no blob covers it), exactly the
    * reference's shared-buffer import choreography
    * (create_ndvi_worldgrid.py:129-148) as a relational groupByKey.
    */
  def ingestNpyDirAligned(spark: SparkSession, header: GridHeader,
                          blobDir: String, outRoot: String): Long =
    ingestBlobsAligned(spark, header, blobDir, "*.npy", outRoot,
      NpyBlobDecoder)

  /** GeoTIFF landing-directory ingest (the writer's format family, so a
    * store exported tile-by-tile re-ingests losslessly). Blob naming
    * mirrors the NPY path: `<x0>_<y0>_<t0>.tif`, one time plane each. */
  def ingestGeoTiffDirAligned(spark: SparkSession, header: GridHeader,
                              blobDir: String, outRoot: String): Long =
    ingestBlobsAligned(spark, header, blobDir, "*.tif", outRoot,
      GeoTiffBlobDecoder)

  /** Gzipped GeoTIFF ingest (SRC6: GLCF tiles arrive `.tif.gz` and the
    * reference gunzips before GDAL, create_glcf_worldgrid.py:39-59;
    * here the gunzip happens streaming inside the decode task). */
  def ingestGeoTiffGzDirAligned(spark: SparkSession, header: GridHeader,
                                blobDir: String, outRoot: String): Long =
    ingestBlobsAligned(spark, header, blobDir, "*.tif.gz", outRoot,
      GzipBlobDecoder(GeoTiffBlobDecoder))

  /** Decoded blob: grid placement (x0, y0, t0), box shape
    * (w, h, nDates), dense C-order [y][x][t] doubles. */
  trait BlobDecoder extends Serializable {
    def apply(name: String, bytes: Array[Byte]): (Int, Int, Int, Int, Int, Int, Array[Double])
  }

  object NpyBlobDecoder extends BlobDecoder {
    def apply(name: String, bytes: Array[Byte]): (Int, Int, Int, Int, Int, Int, Array[Double]) = {
      val Array(x0, y0, t0) = name.stripSuffix(".npy").split("_").map(_.toInt)
      val npy = NpyCodec.read(bytes)
      val Seq(h, w, nd) = npy.shape
      (x0, y0, t0, w, h, nd, npy.data)
    }
  }

  object GeoTiffBlobDecoder extends BlobDecoder {
    def apply(name: String, bytes: Array[Byte]): (Int, Int, Int, Int, Int, Int, Array[Double]) = {
      val Array(x0, y0, t0) = name.stripSuffix(".tif").split("_").map(_.toInt)
      val r = GeoTiff.read(bytes)
      // single 2D plane: [y][x] is already [y][x][t] with nd = 1
      (x0, y0, t0, r.width, r.height, 1, r.data)
    }
  }

  /** HDF4 SDS landing-directory ingest (SRC4): `<x0>_<y0>_<t0>.hdf`,
    * one [h, w] plane or [h, w, nd] box per blob; `datasetName` picks
    * the labeled dataset the way the reference selects "250m 16 days
    * NDVI" vs "VI Quality" from one archive (modis.py:205-229). */
  def ingestHdf4DirAligned(spark: SparkSession, header: GridHeader,
                           blobDir: String, outRoot: String,
                           datasetName: Option[String] = None): Long =
    ingestBlobsAligned(spark, header, blobDir, "*.hdf", outRoot,
      Hdf4BlobDecoder(datasetName))

  /** See [[ingestHdf4DirAligned]]. */
  final case class Hdf4BlobDecoder(datasetName: Option[String])
      extends BlobDecoder {
    def apply(name: String, bytes: Array[Byte]): (Int, Int, Int, Int, Int, Int, Array[Double]) = {
      val Array(x0, y0, t0) = name.stripSuffix(".hdf").split("_").map(_.toInt)
      val sds = datasetName match {
        case Some(n) => Hdf4.selectByName(bytes, n)
          .getOrElse(sys.error(s"no dataset named '$n' in $name"))
        case None => Hdf4.readSds(bytes).headOption
          .getOrElse(sys.error(s"no SDS in $name"))
      }
      sds.dims match {
        case Seq(h, w)     => (x0, y0, t0, w, h, 1, sds.data)
        case Seq(h, w, nd) => (x0, y0, t0, w, h, nd, sds.data)
        case d => sys.error(s"unsupported SDS rank ${d.length} in $name")
      }
    }
  }

  /** Gunzip wrapper around any [[BlobDecoder]]: inflates the blob
    * (stdlib GZIPInputStream) and strips the `.gz` suffix before
    * delegating, so `<x0>_<y0>_<t0>.tif.gz` decodes like its plain
    * twin. */
  final case class GzipBlobDecoder(inner: BlobDecoder) extends BlobDecoder {
    def apply(name: String, bytes: Array[Byte]): (Int, Int, Int, Int, Int, Int, Array[Double]) = {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val raw = try in.readAllBytes() finally in.close()
      inner(name.stripSuffix(".gz"), raw)
    }
  }

  private def ingestBlobsAligned(spark: SparkSession, header: GridHeader,
                                 blobDir: String, glob: String,
                                 outRoot: String,
                                 decode: BlobDecoder): Long = {
    import spark.implicits._
    val g = header.chunkGrid
    val dtype = header.dtype
    val cd = PayloadCodec.code(dtype)
    val nodata = header.nodata
    val (fracW, fracH, fracND) =
      (header.fracWidth, header.fracHeight, header.fracNDates)
    val (gw, gh, gnd) = (header.width, header.height, header.nDates)
    val numFracsX = g.numFracsX

    val blobs = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(blobDir)
      .select(element_at(split(col("path"), "/"), -1).as("name"),
        col("content"))
      .as[(String, Array[Byte])]

    val subBoxes = blobs.flatMap { case (name, bytes) =>
      val (x0, y0, t0, bw0, bh0, bnd0, blobData) = decode(name, bytes)
      for {
        fy <- y0 / fracH to (y0 + bh0 - 1) / fracH
        fx <- x0 / fracW to (x0 + bw0 - 1) / fracW
        tc <- t0 / fracND to (t0 + bnd0 - 1) / fracND
      } yield {
        val ax0 = math.max(x0, fx * fracW)
        val ax1 = math.min(x0 + bw0, (fx + 1) * fracW)
        val ay0 = math.max(y0, fy * fracH)
        val ay1 = math.min(y0 + bh0, (fy + 1) * fracH)
        val at0 = math.max(t0, tc * fracND)
        val at1 = math.min(t0 + bnd0, (tc + 1) * fracND)
        val (bw, bh, bnd) = (ax1 - ax0, ay1 - ay0, at1 - at0)
        val sub = new Array[Double](bw * bh * bnd)
        var i = 0; var ly = 0
        while (ly < bh) {
          var lx = 0
          while (lx < bw) {
            var lt = 0
            while (lt < bnd) {
              sub(i) = blobData(((ay0 - y0 + ly) * bw0 + (ax0 - x0 + lx)) * bnd0
                + (at0 - t0 + lt))
              i += 1; lt += 1
            }
            lx += 1
          }
          ly += 1
        }
        (fy * numFracsX + fx, tc, ax0, ay0, at0, bw, bh, bnd,
          PayloadCodec.encodeDouble(sub, dtype))
      }
    }
    val rows = subBoxes
      .groupByKey(r => (r._1, r._2))
      .mapGroups { (key: (Int, Int),
                    it: Iterator[(Int, Int, Int, Int, Int, Int, Int, Int, Array[Byte])]) =>
        val (fracNum, tc) = key
        val fx = fracNum % numFracsX; val fy = fracNum / numFracsX
        val cx0 = fx * fracW; val cy0 = fy * fracH; val ct0 = tc * fracND
        val cw = math.min(fracW, gw - cx0)
        val ch = math.min(fracH, gh - cy0)
        val cnd = math.min(fracND, gnd - ct0)
        val data = Array.fill(cw * ch * cnd)(nodata)
        it.foreach { case (_, _, ax0, ay0, at0, bw, bh, bnd, payload) =>
          val sub = PayloadCodec.decodeDouble(payload, cd)
          var i = 0; var ly = 0
          while (ly < bh) {
            var lx = 0
            while (lx < bw) {
              var lt = 0
              while (lt < bnd) {
                data(((ay0 - cy0 + ly) * cw + (ax0 - cx0 + lx)) * cnd
                  + (at0 - ct0 + lt)) = sub(i)
                i += 1; lt += 1
              }
              lx += 1
            }
            ly += 1
          }
        }
        FracRowBytes(fracNum, tc, fx, fy, cx0, cy0, ct0, cw, ch, cnd,
          PayloadCodec.encodeDouble(data, dtype))
      }
    FractionStore.write(spark, header, rows.toDF(), outRoot)
    FractionStore.fractions(spark, outRoot).count()
  }

  /** Targeted repair (ST3, reload_fraction_worldgrid.py:51-124): rebuild
    * ONE (frac_num, time_chunk) chunk from replacement pixels, leaving
    * every other row of the partition untouched (dynamic partition
    * overwrite of just that time_chunk).
    */
  def reloadChunk(spark: SparkSession, root: String,
                  fracNum: Int, timeChunk: Int,
                  replacementPixels: DataFrame): Unit = {
    val header = GridHeader.load(spark, root)
    val keep = FractionStore.fractions(spark, root)
      .filter(col("time_chunk") === timeChunk && col("frac_num") =!= fracNum)
    val rebuilt = FractionStore.fromPixels(spark, header, replacementPixels)
      .filter(col("time_chunk") === timeChunk && col("frac_num") === fracNum)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // materialize before overwriting the partition being read
      keep.unionByName(rebuilt).localCheckpoint()
        .repartitionByRange(col("time_chunk"), col("frac_num"))
        .sortWithinPartitions(col("frac_num"))
        .write.mode("overwrite").partitionBy("time_chunk")
        .parquet(FractionStore.dataPath(root))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }
}
