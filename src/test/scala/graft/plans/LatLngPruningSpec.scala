package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge
import graft.TestSpark
import graft.grid._

/** The lat/lng pruning rule must (a) never change results and (b) land
  * frac-range predicates in the parquet scan's PushedFilters. The rule
  * runs at post-hoc resolution (GraftExtensions), where the lat/lng
  * attributes still exist; here we apply it to the analyzed plan the
  * same way the injection point does.
  */
class LatLngPruningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val root: String = {
    val r = TestSpark.tmpDir("prune_grid")
    SyntheticGrid.writeTiny(spark, r)
    r
  }
  lazy val header: GridHeader = GridHeader.load(spark, root)

  def geoView = LatLngPruning.withGeoColumns(header,
    FractionStore.fractions(spark, root))

  // tiny grid: lng = 0.01*(x+.5), lat = -0.01*(y+.5)
  def query = geoView
    .filter(col("lat").between(-0.4, -0.1) && col("lng").between(0.1, 0.5))
    .filter(col("t") === 0)

  def withRule = GraftColumnBridge.ofRows(spark,
    LatLngPruning.Rule(query.queryExecution.analyzed))

  test("rule preserves results exactly") {
    val without = query.select("x", "y", "t", "value").collect().toSet
    val got = withRule.select("x", "y", "t", "value").collect().toSet
    assert(got == without && without.nonEmpty)
  }

  private def scanFilters: String = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    withRule.queryExecution.executedPlan.collectLeaves().collect {
      case s: FileSourceScanExec => s.dataFilters.mkString(";")
    }.mkString(";")
  }

  test("rule lands frac-range predicates on the scan") {
    val s = scanFilters
    assert("frac_y#\\d+ >= \\d+".r.findFirstIn(s).nonEmpty,
      s"frac_y lower bound not pushed: $s")
    assert("frac_x#\\d+ <= \\d+".r.findFirstIn(s).nonEmpty,
      s"frac_x upper bound not pushed: $s")
  }

  test("pruned fraction range is correct and tight (±1 chunk)") {
    // lat in [-0.4, -0.1] -> y in ~[9.5, 39.5] -> frac_y in [1, 8]±1
    // lng in [0.1, 0.5]   -> x in ~[9.5, 49.5] -> frac_x in [0, 2]±1
    val s = scanFilters
    val fy = "frac_y#\\d+ >= (\\d+)".r.findFirstMatchIn(s).map(_.group(1).toInt)
    val fx = "frac_x#\\d+ <= (\\d+)".r.findFirstMatchIn(s).map(_.group(1).toInt)
    assert(fy.exists(v => v >= 1 && v <= 2), s"frac_y lower: $fy in $s")
    assert(fx.exists(v => v >= 2 && v <= 3), s"frac_x upper: $fx in $s")
  }

  test("sinusoidal grid: a lat+lng box prunes BOTH frac_x and frac_y") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // minimodis: sinusoidal 200x200, 4x4 fractions of 50 px, lat in
    // ~[0, 10], lng in ~[10, 20.3] (h19v08-style geot scaled down)
    val ndviRoot = TestSpark.tmpDir("prune_sinu_ndvi")
    val qaRoot = TestSpark.tmpDir("prune_sinu_qa")
    val (nh, _) = SyntheticGrid.writeMiniModis(spark, ndviRoot, qaRoot)
    def q = LatLngPruning.withGeoColumns(nh,
      FractionStore.fractions(spark, ndviRoot))
      .filter(col("lat").between(2.0, 4.0) && col("lng").between(12.0, 14.0))
      .filter(col("t") === 0)
    val pruned = GraftColumnBridge.ofRows(spark,
      LatLngPruning.Rule(q.queryExecution.analyzed))
    // (a) results never change
    val without = q.select("x", "y", "t", "value").collect().toSet
    val got = pruned.select("x", "y", "t", "value").collect().toSet
    assert(got == without && without.nonEmpty)
    // (b) both axes land bounded ranges on the scan:
    // lat [2,4] -> y ~[119.5, 159.5] -> frac_y [2,3]±margin
    // lng [12,14] x cos(lat) -> x ~[38.9, 79.3] -> frac_x [0,1]±margin
    val s = pruned.queryExecution.executedPlan.collectLeaves().collect {
      case sc: FileSourceScanExec => sc.dataFilters.mkString(";")
    }.mkString(";")
    val fxHi = "frac_x#\\d+ <= (\\d+)".r.findFirstMatchIn(s).map(_.group(1).toInt)
    val fyLo = "frac_y#\\d+ >= (\\d+)".r.findFirstMatchIn(s).map(_.group(1).toInt)
    val fyHi = "frac_y#\\d+ <= (\\d+)".r.findFirstMatchIn(s).map(_.group(1).toInt)
    assert(fxHi.exists(v => v >= 1 && v <= 2), s"frac_x upper: $fxHi in $s")
    assert(fyLo.exists(v => v >= 1 && v <= 2), s"frac_y lower: $fyLo in $s")
    assert(fyHi.exists(v => v == 3), s"frac_y upper: $fyHi in $s")
  }

  test("without geo metadata the rule is a no-op") {
    import spark.implicits._
    val plain = Seq((1.0, 2.0)).toDF("lat", "lng")
      .filter(col("lat") >= 0.5)
    val out = LatLngPruning.Rule(plain.queryExecution.analyzed)
    assert(out == plain.queryExecution.analyzed)
  }
}
