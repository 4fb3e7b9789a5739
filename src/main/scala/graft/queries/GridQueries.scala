package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.grid._
import graft.functions.{QaDecode, GlcfClasses}

/** Grid-native operator surface exposed through the driver contract.
  *
  * Most grid ops aren't ANSI-SQL-expressible (they run on the fraction
  * store, not the relational fixtures) — those entries build a
  * deterministic in-memory synthetic grid and return result rows
  * (rows-only check). The scalar kernels (F5 QA decode, F4 sinusoidal,
  * F3 affine) ARE oracle-checked by applying them to testdata integer
  * columns and mirroring the math in DuckDB SQL.
  */
object GridQueries {

  type Q = (SparkSession, String) => DataFrame

  // cache fixture stores per JVM (Verify/Bench call many queries)
  private val fixtureCache = scala.collection.concurrent.TrieMap[String, String]()

  private def tinyRoot(spark: SparkSession): String =
    fixtureCache.getOrElseUpdate("tiny", {
      val r = java.nio.file.Files.createTempDirectory("graft_tiny").toString
      SyntheticGrid.writeTiny(spark, r)
      r
    })

  private def miniModisRoots(spark: SparkSession): (String, String) = {
    val nr = fixtureCache.getOrElseUpdate("mm_ndvi_pending", {
      val nr0 = java.nio.file.Files.createTempDirectory("graft_mm_ndvi").toString
      val qr0 = java.nio.file.Files.createTempDirectory("graft_mm_qa").toString
      SyntheticGrid.writeMiniModis(spark, nr0, qr0)
      fixtureCache.put("mm_qa", qr0)
      nr0
    })
    (nr, fixtureCache("mm_qa"))
  }

  val queries: Map[String, Q] = Map(
    // F5 — MODIS QA decode, oracle-checked bit-for-bit against DuckDB on
    // synthetic uint16 words derived from lineitem keys.
    "f5_qa_confidence" -> { (s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        ((col("l_partkey") * 2654435761L + col("l_suppkey") * 40503L) % 65536)
          .cast("int").as("qa"))
        .withColumn("conf", QaDecode.modisQaConf(col("qa")))
    },

    // F6 — Landsat8 QA decode, same oracle pattern.
    "f6_landsat_qa" -> { (s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        ((col("l_partkey") * 48271L + col("l_orderkey")) % 65536)
          .cast("int").as("qa"))
        .withColumn("conf", QaDecode.landsat8QaConf(col("qa")))
    },

    // F3/F4 — affine + sinusoidal coordinate math, oracle-checked with
    // rounding (cross-engine libm cos/radians agree far below 1e-2 m).
    "f4_sinusoidal_project" -> { (s, d) =>
      Tables.supplier(s, d).select(
        col("s_suppkey"),
        ((col("s_suppkey") % 160) - 80 + lit(0.5)).cast("double").as("lat"),
        ((col("s_suppkey") % 340) - 170 + lit(0.25)).cast("double").as("lng"))
        .withColumn("sx", round(GeoTransform.latLngToSinuX(col("lat"), col("lng")), 2))
        .withColumn("sy", round(GeoTransform.latLngToSinuY(col("lat")), 2))
    },

    // F7 — GLCF class name lookup (literal map).
    "f7_glcf_classes" -> { (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"), (col("p_partkey") % 17).cast("int").as("cls"))
        .withColumn("cls_name", GlcfClasses.className(col("cls")))
    },

    // ---- grid-native (rows-only): deterministic synthetic fixtures ----

    // P1-P3/P6/P7 — windowed slice through the fraction store.
    "grid_slice_window" -> { (s, _) =>
      val root = tinyRoot(s)
      val h = GridHeader.load(s, root)
      FractionStore.loadSliceXY(s, h, root, 17, 40, 3, 12, 2, 11,
        maskNodata = false)
    },

    // P4/P5/F8 — polygon load with containment mask.
    "grid_polygon_mask" -> { (s, _) =>
      val root = tinyRoot(s)
      val h = GridHeader.load(s, root)
      FractionStore.loadPolyLatLng(s, h, root,
        Array((-0.0, 0.0), (-0.9, 0.0), (-0.9, 0.9)), 0, 2)
        .groupBy(col("in_poly")).agg(count(lit(1)).as("n"),
          sum(col("value")).as("sum_value"))
    },

    // W1 — per-pixel time series extraction with QA-masked mean (the
    // notebook query: load_ndvi_qa.ipynb).
    "grid_pixel_timeseries" -> { (s, _) =>
      val (ndviRoot, qaRoot) = miniModisRoots(s)
      val nh = GridHeader.load(s, ndviRoot)
      val qh = GridHeader.load(s, qaRoot)
      val ndvi = FractionStore.loadSliceXY(s, nh, ndviRoot, 0, 60, 0, 60, 0, 4)
      val qa = FractionStore.loadSliceXY(s, qh, qaRoot, 0, 60, 0, 60, 0, 4,
        maskNodata = false).withColumnRenamed("value", "qa")
      ndvi.join(qa, Seq("x", "y", "t"))
        .withColumn("conf", QaDecode.modisQaConf(col("qa")))
        .groupBy(col("x"), col("y"))
        .agg(
          avg(when(col("conf") > 0.5, col("value"))).as("mean_ndvi_masked"),
          count(when(col("conf") > 0.5, col("value"))).as("n_clear"),
          count(lit(1)).as("n_total"))
    },

    // U1/J9/J4/J5 — the pipeline: QA-masked NDVI derivation, then stats.
    "grid_pipeline_masked" -> { (s, _) =>
      val (ndviRoot, qaRoot) = miniModisRoots(s)
      val nh = GridHeader.load(s, ndviRoot)
      val qh = GridHeader.load(s, qaRoot)
      val outRoot = fixtureCache.getOrElseUpdate("mm_masked", {
        java.nio.file.Files.createTempDirectory("graft_mm_masked").toString
      })
      val outH = nh.copy(name = "ndvi_masked")
      val pipe = new GridPipeline(Seq((nh, ndviRoot), (qh, qaRoot)), outH, outRoot)
      pipe.run(s) { (_, payloads) =>
        val Seq(ndvi, qa) = payloads
        val out = new Array[Double](ndvi.length)
        var i = 0
        while (i < ndvi.length) {
          val q = qa(i).toInt & 0xffff
          val gated = (q & 3) == 3 || ((q >> 6) & 3) == 3 ||
            ((q >> 8) & 1) == 1 || ((q >> 10) & 1) == 1 ||
            ((q >> 11) & 7) != 1 || ((q >> 14) & 1) == 1 ||
            ((q >> 15) & 1) == 1 || ((q >> 2) & 0xf) >= 12
          out(i) = if (gated) -3000.0 else ndvi(i)
          i += 1
        }
        out
      }
      FractionStore.pixels(outH, FractionStore.fractions(s, outRoot))
        .groupBy(col("t")).agg(
          count(col("value")).as("n_clear"),
          sum(col("value")).as("sum_ndvi"))
    },

    // SRC5 — MODIS file-index scan: filename synthesis + regex parse +
    // per-tile chronology (modis.py:30-110), oracle-checked.
    "src5_file_index" -> { (s, d) =>
      val names = Tables.orders(s, d).select(concat(
        lit("MOD13Q1.A"), date_format(col("o_orderdate"), "yyyyDDD"),
        lit(".h"), lpad((col("o_custkey") % 36).cast("string"), 2, "0"),
        lit("v"), lpad((col("o_orderkey") % 18).cast("string"), 2, "0"),
        lit(".005.2006270052117.hdf")).as("name"))
      graft.sources.Ingest.parseModisName(col("name"))(names)
        .groupBy(col("tile"))
        .agg(count(lit(1)).as("n_files"),
          unix_millis(min(col("ts"))).as("first_ts_ms"),
          unix_millis(max(col("ts"))).as("last_ts_ms"))
    },

    // SRC7/SRC8 + P5 — named GeoJSON region drives a masked window query.
    "grid_region_mask" -> { (s, _) =>
      val root = tinyRoot(s)
      val h = GridHeader.load(s, root)
      val poly = graft.sources.Regions.polygonForRegion(s,
        "/root/repo/assets/regions.geojson", "test.box")
      FractionStore.loadPolyLatLng(s, h, root, poly, 0, 2)
        .groupBy(col("in_poly"), col("t"))
        .agg(count(lit(1)).as("n"), avg(col("value")).as("mean_value"))
    },

    // J3 — nearest-neighbor reprojection: the sinusoidal minimodis NDVI
    // warped onto a WGS84 lattice covering its footprint, then stats.
    "grid_reproject_nearest" -> { (s, _) =>
      val (ndviRoot, _) = miniModisRoots(s)
      val nh = GridHeader.load(s, ndviRoot)
      // wgs84 target grid over the tile's lat/lng bbox
      val (latMin, lngMin) = nh.xyToLatLng(0, nh.height)
      val (latMax, lngMax) = nh.xyToLatLng(nh.width, 0)
      val dst = GridHeader(
        name = "wgs84_dst", width = 100, height = 100,
        fracWidth = 50, fracHeight = 50, fracNDates = nh.fracNDates,
        dtype = nh.dtype, srs = "wgs84",
        geot = Seq(lngMin, (lngMax - lngMin) / 100, 0.0,
          latMax, 0.0, -(latMax - latMin) / 100),
        timestampsMs = nh.timestampsMs, nodata = nh.nodata)
      Reproject.nearest(s, nh, ndviRoot, dst, 0, 100, 0, 100)
        .agg(count(col("value")).as("n_mapped"),
          sum(col("value")).as("sum_value"),
          count(lit(1)).as("n_total"))
    },

    // ST1 — incremental time append: prefix store + appendDates must
    // reproduce the full axis; returns per-date pixel counts.
    "grid_incremental_append" -> { (s, _) =>
      val root = fixtureCache.getOrElseUpdate("inc_demo", {
        val r = java.nio.file.Files.createTempDirectory("graft_inc").toString
        val hFull = SyntheticGrid.tinyHeader
        val hPre = hFull.copy(timestampsMs = hFull.timestampsMs.take(8))
        FractionStore.write(s, hPre,
          FractionStore.fromPixels(s, hPre,
            SyntheticGrid.pixelDf(s, hPre, SyntheticGrid.tinyValue)), r)
        val newTs = hFull.timestampsMs.drop(8)
        val newPx = SyntheticGrid.pixelDf(s,
          hFull.copy(timestampsMs = newTs),
          (x, y, t) => SyntheticGrid.tinyValue(x, y, t + lit(8)))
        IncrementalAppend.appendDates(s, r, newTs, newPx)
        r
      })
      val h = GridHeader.load(s, root)
      FractionStore.pixels(h, FractionStore.fractions(s, root),
        maskNodata = false)
        .groupBy(col("t")).agg(count(lit(1)).as("n_px"),
          sum(col("value").cast("double")).as("sum_value"))
    },

    // A5 — per-pixel index select over the cube (argmax-style companion).
    "grid_index_select" -> { (s, _) =>
      val root = tinyRoot(s)
      val h = GridHeader.load(s, root)
      val px = FractionStore.loadSliceXY(s, h, root, 0, 38, 0, 10, 0, h.nDates)
      // pick per pixel the value at t = (x+y) mod nDates
      px.filter(col("t") === (col("x") + col("y")) % h.nDates)
        .select(col("x"), col("y"), col("t"), col("value"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "src5_file_index" ->
      """WITH names AS (SELECT 'MOD13Q1.A' || strftime(o_orderdate, '%Y%j')
        |    || '.h' || lpad(CAST(o_custkey % 36 AS VARCHAR), 2, '0')
        |    || 'v' || lpad(CAST(o_orderkey % 18 AS VARCHAR), 2, '0')
        |    || '.005.2006270052117.hdf' AS name
        |  FROM orders),
        |parsed AS (SELECT
        |    substr(name, 18, 6) AS tile,
        |    CAST(CAST(substr(name, 10, 4) || '-01-01' AS DATE)
        |      + (CAST(substr(name, 14, 3) AS INT) - 1) * INTERVAL 1 DAY
        |      AS TIMESTAMP) AS ts
        |  FROM names)
        |SELECT tile, count(*) AS n_files,
        |  epoch_ms(min(ts)) AS first_ts_ms,
        |  epoch_ms(max(ts)) AS last_ts_ms
        |FROM parsed GROUP BY tile""".stripMargin,

    "f5_qa_confidence" -> (
      "SELECT l_orderkey, l_linenumber, qa, " + QaDecode.modisQaConfDuckSql +
        " AS conf FROM (SELECT l_orderkey, l_linenumber, CAST((l_partkey * " +
        "2654435761 + l_suppkey * 40503) % 65536 AS INT) AS qa FROM lineitem) t"),

    "f6_landsat_qa" ->
      """SELECT l_orderkey, l_linenumber, qa,
        |  CASE WHEN (qa & 1) = 1 OR ((qa >> 1) & 1) = 1 OR ((qa >> 2) & 1) = 1
        |    OR ((qa >> 4) & 3) = 3 OR ((qa >> 10) & 3) = 3
        |    OR ((qa >> 12) & 3) = 3 OR ((qa >> 14) & 3) = 3
        |  THEN CAST(0.0 AS FLOAT) ELSE CAST(1.0 AS FLOAT) END AS conf
        |FROM (SELECT l_orderkey, l_linenumber,
        |  CAST((l_partkey * 48271 + l_orderkey) % 65536 AS INT) AS qa
        |  FROM lineitem) t""".stripMargin,

    "f4_sinusoidal_project" ->
      """SELECT s_suppkey, lat, lng,
        |  round(6371007.181 * radians(lng) * cos(radians(lat)), 2) AS sx,
        |  round(6371007.181 * radians(lat), 2) AS sy
        |FROM (SELECT s_suppkey,
        |  CAST((s_suppkey % 160) - 80 + 0.5 AS DOUBLE) AS lat,
        |  CAST((s_suppkey % 340) - 170 + 0.25 AS DOUBLE) AS lng
        |  FROM supplier) t""".stripMargin,

    "f7_glcf_classes" ->
      """SELECT p_partkey, CAST(p_partkey % 17 AS INT) AS cls,
        |  CASE CAST(p_partkey % 17 AS INT)
        |    WHEN 0 THEN 'Water' WHEN 1 THEN 'Evergreen needleleaf forest'
        |    WHEN 2 THEN 'Evergreen broadleaf forest'
        |    WHEN 3 THEN 'Deciduous needleleaf forest'
        |    WHEN 4 THEN 'Deciduous broadleaf forest' WHEN 5 THEN 'Mixed forest'
        |    WHEN 6 THEN 'Closed shrublands' WHEN 7 THEN 'Open shrublands'
        |    WHEN 8 THEN 'Woody savannas' WHEN 9 THEN 'Savannas'
        |    WHEN 10 THEN 'Grasslands' WHEN 11 THEN 'Permanent wetlands'
        |    WHEN 12 THEN 'Croplands' WHEN 13 THEN 'Urban and built-up'
        |    WHEN 14 THEN 'Cropland/Natural vegetation mosaic'
        |    WHEN 15 THEN 'Snow and ice'
        |    WHEN 16 THEN 'Barren or sparsely vegetated' END AS cls_name
        |FROM part""".stripMargin
  )
}
