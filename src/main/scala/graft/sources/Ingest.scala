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
  * HDF4 decoding needs a codec this container doesn't ship; the blob
  * format here is NPY (the reference's own fraction serialization,
  * jgrid3.py:65-77), which [[NpyCodec]] decodes for real — swapping in
  * an HDF reader changes only `decode`.
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
