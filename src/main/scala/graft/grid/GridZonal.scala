package graft.grid

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Zonal statistics per NAMED REGION (the polygon-table complement of
  * the per-class zonal stats): NDVI means per administrative district,
  * per protected area, per field boundary — the reference's
  * notebook-side loop of `load_poly_latlng` calls collapsed into ONE
  * distributed pass.
  *
  * Membership is pixel-center ray-cast containment per region (the
  * same native codegen [[graft.functions.PointInPolygonExpr]] as P5); a
  * pixel inside k overlapping regions contributes to all k (explode on
  * the membership array — standard zonal semantics). One scan over the
  * union-bbox window, one partial-agg shuffle on (region, t).
  *
  * Scope: the region set is driver-literal (polygon rings compile into
  * the codegen predicate), the right shape for bounded region tables
  * (countries, districts, a protected-area list). A million-polygon
  * layer would instead bbox-bucket the polygons and broadcast-join
  * buckets — out of scope here.
  */
object GridZonal {

  /** Per-(region, date) stats over `regions` (name -> (lat, lng) ring).
    * Emits (region, t, n_valid, mean_value, min_value, max_value). */
  def zonalByRegion(spark: SparkSession, header: GridHeader, root: String,
                    regions: Seq[(String, Array[(Double, Double)])],
                    tFrom: Int, tTo: Int): DataFrame = {
    require(regions.nonEmpty, "need at least one region")
    val xyPolys = regions.map { case (name, ring) =>
      (name, ring.map { case (lat, lng) => header.latLngToXY(lat, lng) })
    }
    val xs = xyPolys.flatMap(_._2.map(_._1))
    val ys = xyPolys.flatMap(_._2.map(_._2))
    val df = FractionStore.loadSliceXY(spark, header, root,
      math.max(0, xs.min.floor.toInt),
      math.min(header.width, xs.max.ceil.toInt),
      math.max(0, ys.min.floor.toInt),
      math.min(header.height, ys.max.ceil.toInt),
      tFrom, tTo)
    val members = xyPolys.map { case (name, poly) =>
      when(graft.functions.PointInPolygonExpr(poly,
        col("x").cast("double") + lit(0.5),
        col("y").cast("double") + lit(0.5)), lit(name))
    }
    df.withColumn("region", explode(array_compact(array(members: _*))))
      .groupBy(col("region"), col("t"))
      .agg(count(col("value")).as("n_valid"),
        (sum(col("value").cast("double")) / count(col("value")))
          .as("mean_value"),
        min(col("value")).cast("double").as("min_value"),
        max(col("value")).cast("double").as("max_value"))
  }
}
