package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Named-region polygon source (reference: SRC7/SRC8 —
  * rastercube/regions.py:42-131 + shputils.py; OGR/shapefile handling
  * collapses to GeoJSON, which Spark reads natively).
  *
  * GeoJSON coordinates are [lng, lat]; the API surfaces (lat, lng) pairs
  * matching the reference's convention (regions.py:83-92).
  */
object Regions {

  /** All regions as a DataFrame (name, coordinates ring). */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)
      .select(explode(col("features")).as("f"))
      .select(col("f.properties.name").as("name"),
        col("f.geometry.type").as("geom_type"),
        col("f.geometry.coordinates").getItem(0).as("ring"))

  /** Polygon ring for one named region, as (lat, lng) vertices —
    * `polygon_for_region` (regions.py:119-131). */
  def polygonForRegion(spark: SparkSession, path: String,
                       name: String): Array[(Double, Double)] = {
    val rows = load(spark, path).filter(col("name") === name)
      .select(col("ring")).collect()
    require(rows.nonEmpty, s"no region named $name")
    rows.head.getSeq[scala.collection.Seq[Double]](0)
      .map(p => (p(1), p(0))).toArray // [lng, lat] -> (lat, lng)
  }
}
