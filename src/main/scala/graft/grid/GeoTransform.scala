package graft.grid

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Affine geotransform + map projections (reference: F3/F4 —
  * rastercube/jgrid/jgrid3.py:225-276; sinusoidal/WGS84 WKTs at
  * rastercube/worldgrid/grids.py:58-67, 147-159).
  *
  * Both as pure Scala (driver-side planning, tests) and as Column
  * expressions (executor-side, whole-stage-codegen'd — replaces the
  * reference's GDAL `osr.CoordinateTransformation` with closed-form math).
  *
  * Conventions: north-up affine only (geot(2) == geot(4) == 0, enforced
  * like jgrid3.py:169-183); pixel coordinates are the pixel's top-left
  * corner; `xy2latlng` of the reference uses pixel centers implicitly via
  * +0.5 at call sites, we expose corner coords and let callers offset.
  */
object GeoTransform {

  /** MODIS sinusoidal sphere radius (from the reference WKT,
    * worldgrid/grids.py:147-159). */
  val SinusoidalRadius: Double = 6371007.181

  // ---- pure scalar forms ----------------------------------------------

  /** pixel -> projected geo coords: Xgeo = g0 + x*g1, Ygeo = g3 + y*g5. */
  def pixelToGeo(geot: Array[Double], x: Double, y: Double): (Double, Double) =
    (geot(0) + x * geot(1), geot(3) + y * geot(5))

  /** projected geo -> pixel (north-up inverse). */
  def geoToPixel(geot: Array[Double], gx: Double, gy: Double): (Double, Double) =
    ((gx - geot(0)) / geot(1), (gy - geot(3)) / geot(5))

  /** WGS84 (lat, lng degrees) -> sinusoidal meters. */
  def latLngToSinu(lat: Double, lng: Double): (Double, Double) = {
    val phi = math.toRadians(lat)
    val lam = math.toRadians(lng)
    (SinusoidalRadius * lam * math.cos(phi), SinusoidalRadius * phi)
  }

  /** sinusoidal meters -> WGS84 (lat, lng degrees). */
  def sinuToLatLng(sx: Double, sy: Double): (Double, Double) = {
    val phi = sy / SinusoidalRadius
    val lam = sx / (SinusoidalRadius * math.cos(phi))
    (math.toDegrees(phi), math.toDegrees(lam))
  }

  // ---- Column forms (codegen'd, no UDF) --------------------------------

  def pixelToGeoX(geot: Array[Double], x: Column): Column =
    lit(geot(0)) + x * lit(geot(1))
  def pixelToGeoY(geot: Array[Double], y: Column): Column =
    lit(geot(3)) + y * lit(geot(5))
  def geoToPixelX(geot: Array[Double], gx: Column): Column =
    (gx - lit(geot(0))) / lit(geot(1))
  def geoToPixelY(geot: Array[Double], gy: Column): Column =
    (gy - lit(geot(3))) / lit(geot(5))

  def latLngToSinuX(lat: Column, lng: Column): Column =
    lit(SinusoidalRadius) * radians(lng) * cos(radians(lat))
  def latLngToSinuY(lat: Column): Column =
    lit(SinusoidalRadius) * radians(lat)
  def sinuToLat(sy: Column): Column = degrees(sy / lit(SinusoidalRadius))
  def sinuToLng(sx: Column, sy: Column): Column =
    degrees(sx / (lit(SinusoidalRadius) * cos(sy / lit(SinusoidalRadius))))
}

/** Ray-casting point-in-polygon (reference: F8/P5 —
  * rastercube/imutils.py:5-17 rasterizes with PIL; we evaluate the
  * predicate directly per pixel).
  *
  * Polygon is a closed or open ring of (x, y) vertices. Edge-inclusive
  * behavior follows the standard crossing rule (half-open edges), which
  * matches PIL's polygon fill to within border pixels; the reference's
  * tests only assert interior/exterior pixels.
  */
object PointInPolygon {
  def contains(poly: Array[(Double, Double)], px: Double, py: Double): Boolean = {
    var inside = false
    var i = 0
    val n = poly.length
    var j = n - 1
    while (i < n) {
      val (xi, yi) = poly(i)
      val (xj, yj) = poly(j)
      if ((yi > py) != (yj > py) &&
          px < (xj - xi) * (py - yi) / (yj - yi) + xi) {
        inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  /** Column form: a when-chain can't express the loop, so emit the
    * crossing test as a fold over the polygon's edges — pure Column
    * arithmetic, stays inside codegen (no UDF). Polygon is a literal
    * (driver-side), so the fold unrolls at plan time.
    */
  def containsCol(poly: Array[(Double, Double)], px: Column, py: Column): Column = {
    val n = poly.length
    var acc: Column = lit(false)
    var j = n - 1
    var i = 0
    while (i < n) {
      val (xi, yi) = poly(i)
      val (xj, yj) = poly(j)
      val crosses = (lit(yi) > py) =!= (lit(yj) > py)
      val xcross =
        if (yj == yi) lit(Double.PositiveInfinity)
        else lit(xj - xi) * (py - lit(yi)) / lit(yj - yi) + lit(xi)
      acc = when(crosses && px < xcross, !acc).otherwise(acc)
      j = i
      i += 1
    }
    acc
  }
}
