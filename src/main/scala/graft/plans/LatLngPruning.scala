package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder
import graft.grid.{FractionStore, GeoTransform, GridHeader}

/** The optional custom Catalyst rule from SURVEY §4: rewrite range
  * predicates on DERIVED geo columns (lat / lng / t of the pixel view)
  * into predicates on the STORED chunk columns (frac_y / frac_x /
  * time_chunk) that Parquet can prune — the Catalyst formalization of
  * the reference's `fracs_for_rect_xy` (jgrid3.py:470-489).
  *
  * Why a rule at all: `lat` is an expression over exploded pixel
  * coordinates, so a user filter `lat BETWEEN a AND b` cannot reach the
  * scan. The grid's geometry travels as column METADATA on the derived
  * columns (attached by [[LatLngPruning.withGeoColumns]]); the rule
  * reads it back, inverts the (monotonic per-axis) transforms, and ANDs
  * conservative chunk-range conjuncts onto the filter. Added predicates
  * are supersets (±1 pixel margins), so results never change — only the
  * scanned fraction set shrinks.
  *
  * Registered by [[graft.GraftExtensions]] (injectOptimizerRule).
  */
object LatLngPruning {

  private[plans] val MetaKey = "graft.geo"

  /** Pixel view + lat/lng center-coordinates columns carrying the grid
    * geometry as metadata; keeps frac_x/frac_y/time_chunk in scope so
    * rewritten predicates can push to the scan.
    */
  def withGeoColumns(header: GridHeader, fracRows: DataFrame,
                     maskNodata: Boolean = true): DataFrame = {
    val md = new MetadataBuilder()
      .putString("srs", header.srs)
      .putDoubleArray("geot", header.geotArray)
      .putLong("fracWidth", header.fracWidth)
      .putLong("fracHeight", header.fracHeight)
      .putLong("fracNDates", header.fracNDates)
      .build()
    val geoMd = new MetadataBuilder().putMetadata(MetaKey, md).build()
    // keepChunkCols: the STORED chunk columns stay in scope, so the
    // rewritten predicates push through the explode to the scan
    val withChunks = FractionStore.pixels(header, fracRows, maskNodata,
      keepChunkCols = true)
    val gx = lit(header.geot(0)) + (col("x") + lit(0.5)) * lit(header.geot(1))
    val gy = lit(header.geot(3)) + (col("y") + lit(0.5)) * lit(header.geot(5))
    val (latC, lngC) = header.srs match {
      case "sinusoidal" => (GeoTransform.sinuToLat(gy), GeoTransform.sinuToLng(gx, gy))
      case "wgs84"      => (gy, gx)
    }
    withChunks
      .withColumn("lat", latC.as("lat", geoMd))
      .withColumn("lng", lngC.as("lng", geoMd))
  }

  final case class Geo(srs: String, geot: Array[Double],
                       fracWidth: Int, fracHeight: Int, fracNDates: Int)

  private def geoOf(a: Attribute): Option[Geo] = {
    if (a.metadata.contains(MetaKey)) {
      val m = a.metadata.getMetadata(MetaKey)
      Some(Geo(m.getString("srs"), m.getDoubleArray("geot"),
        m.getLong("fracWidth").toInt, m.getLong("fracHeight").toInt,
        m.getLong("fracNDates").toInt))
    } else None
  }

  private def litD(e: Expression): Option[Double] = e match {
    case Literal(v: Double, _) => Some(v)
    case Literal(v: Float, _) => Some(v.toDouble)
    case Literal(v: Int, _) => Some(v.toDouble)
    case Literal(v: Long, _) => Some(v.toDouble)
    case Cast(inner, _, _, _) => litD(inner)
    case _ => None
  }

  /** Collect [min, max] bounds asserted on `attr` inside a conjunction. */
  private def boundsFor(cond: Expression, name: String)
      : (Option[Double], Option[Double], Option[Attribute]) = {
    var lo: Option[Double] = None
    var hi: Option[Double] = None
    var attr: Option[Attribute] = None
    def visit(e: Expression): Unit = e match {
      case And(l, r) => visit(l); visit(r)
      case GreaterThanOrEqual(a: Attribute, v) if a.name == name =>
        litD(v).foreach(d => { lo = Some(lo.fold(d)(math.max(_, d))); attr = Some(a) })
      case GreaterThan(a: Attribute, v) if a.name == name =>
        litD(v).foreach(d => { lo = Some(lo.fold(d)(math.max(_, d))); attr = Some(a) })
      case LessThanOrEqual(a: Attribute, v) if a.name == name =>
        litD(v).foreach(d => { hi = Some(hi.fold(d)(math.min(_, d))); attr = Some(a) })
      case LessThan(a: Attribute, v) if a.name == name =>
        litD(v).foreach(d => { hi = Some(hi.fold(d)(math.min(_, d))); attr = Some(a) })
      case GreaterThanOrEqual(v, a: Attribute) if a.name == name =>
        litD(v).foreach(d => { hi = Some(hi.fold(d)(math.min(_, d))); attr = Some(a) })
      case LessThanOrEqual(v, a: Attribute) if a.name == name =>
        litD(v).foreach(d => { lo = Some(lo.fold(d)(math.max(_, d))); attr = Some(a) })
      case GreaterThan(v, a: Attribute) if a.name == name => // lit > attr
        litD(v).foreach(d => { hi = Some(hi.fold(d)(math.min(_, d))); attr = Some(a) })
      case LessThan(v, a: Attribute) if a.name == name => // lit < attr
        litD(v).foreach(d => { lo = Some(lo.fold(d)(math.max(_, d))); attr = Some(a) })
      case _ => // other predicates don't constrain monotone bounds
    }
    visit(cond)
    (lo, hi, attr)
  }

  /** lat -> pixel y (center convention), monotone; margin-conservative. */
  private def yForLat(g: Geo, lat: Double): Double = {
    val gy = g.srs match {
      case "sinusoidal" => GeoTransform.SinusoidalRadius * math.toRadians(lat)
      case "wgs84"      => lat
    }
    (gy - g.geot(3)) / g.geot(5) - 0.5
  }

  private def xForLng(g: Geo, lng: Double): Double =
    (lng - g.geot(0)) / g.geot(1) - 0.5 // wgs84 only (separable)

  /** Candidate pixel-x extremes for a (lng, lat) box. wgs84 is
    * separable: x depends on lng alone. Sinusoidal x = R·rad(lng)·cos φ
    * couples the axes, but over a lat interval cos φ ranges inside
    * [cMin, cMax] (endpoint cosines, plus 1 when the interval crosses
    * the equator), so the product's extremes sit at the corner
    * combinations — the closed-form conservative hull of the
    * reference's `fracs_for_rect_xy` x-pruning (jgrid3.py:470-489).
    * None when the box under-constrains x (sinusoidal without lat
    * bounds). */
  private def xCandidates(g: Geo, lngLo: Double, lngHi: Double,
                          latB: (Option[Double], Option[Double]))
      : Option[Seq[Double]] = g.srs match {
    case "wgs84" => Some(Seq(xForLng(g, lngLo), xForLng(g, lngHi)))
    case "sinusoidal" => latB match {
      case (Some(la0), Some(la1)) =>
        val cosines = Seq(la0, la1).map(l => math.cos(math.toRadians(l))) ++
          (if (la0 <= 0 && la1 >= 0) Seq(1.0) else Nil)
        // clamp at 0: poleward-of-90° assertions aren't physical, and a
        // zero cosine only widens the hull toward gx = 0 (conservative)
        val cs = Seq(cosines.min.max(0.0), cosines.max)
        val gxs = for (lng <- Seq(lngLo, lngHi); c <- cs)
          yield GeoTransform.SinusoidalRadius * math.toRadians(lng) * c
        Some(gxs.map(gx => (gx - g.geot(0)) / g.geot(1) - 0.5))
      case _ => None
    }
  }

  object Rule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case f @ Filter(cond, child) =>
        val (latLo, latHi, latAttr) = boundsFor(cond, "lat")
        val (lngLo, lngHi, lngAttr0) = boundsFor(cond, "lng")
        val geo = latAttr.flatMap(geoOf).orElse(lngAttr0.flatMap(geoOf))
        geo match {
          case None => f
          case Some(g) =>
            var extra: Seq[Expression] = Nil
            def attrNamed(n: String): Option[Attribute] =
              child.output.find(_.name == n)
            // lat bounds -> frac_y range (geot(5) < 0: lat falls with y)
            (latLo, latHi, attrNamed("frac_y")) match {
              case (Some(lo), Some(hi), Some(fy)) =>
                val y0 = math.floor(math.min(yForLat(g, hi), yForLat(g, lo))) - 1
                val y1 = math.ceil(math.max(yForLat(g, hi), yForLat(g, lo))) + 1
                extra ++= Seq(
                  GreaterThanOrEqual(fy, Literal(math.max(0,
                    (y0 / g.fracHeight).toInt))),
                  LessThanOrEqual(fy, Literal((y1 / g.fracHeight).toInt)))
              case _ =>
            }
            // lng bounds -> frac_x range (wgs84: separable; sinusoidal:
            // lng+lat box -> conservative corner hull, see xCandidates)
            (lngLo, lngHi, attrNamed("frac_x")) match {
              case (Some(lo), Some(hi), Some(fx)) =>
                xCandidates(g, lo, hi, (latLo, latHi)).foreach { cand =>
                  val x0 = math.floor(cand.min) - 1
                  val x1 = math.ceil(cand.max) + 1
                  extra ++= Seq(
                    GreaterThanOrEqual(fx, Literal(math.max(0,
                      (x0 / g.fracWidth).toInt))),
                    LessThanOrEqual(fx, Literal((x1 / g.fracWidth).toInt)))
                }
              case _ =>
            }
            val fresh = extra.filterNot(p => cond.exists(_.semanticEquals(p)))
            if (fresh.isEmpty) f
            else Filter(fresh.foldLeft(cond)(And(_, _)), child)
        }
    }
  }
}
