package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The sketch-table pattern must answer coarser rollups from persisted
  * sketches alone: HLL cubes (estimates identical to sketch-of-whole —
  * union is lossless — and close to exact) and histogram quantile
  * cubes (deterministic binning with clamping and NULL/NaN skip,
  * lossless element-wise merge, and histQuantile's rank rule against
  * hand-computed answers).
  */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val events = {
    import spark.implicits._
    // 3 types x 40 days; user u active for type k on day d iff hash-ish
    // condition — overlapping user sets across days so union != sum
    (for (d <- 0 until 40; t <- 0 until 3; u <- 0 until 500
          if (u * 7 + d * 3 + t) % 5 != 0)
      yield (d, s"type_$t", (u + t * 100).toLong))
      .toDF("day", "event_type", "user_id")
  }

  test("rollup from persisted sketches equals sketch-of-whole, near exact") {
    val dir = TestSpark.tmpDir("hll_cube")
    Sketches.writeHllCube(events, Seq("day", "event_type"), "user_id", dir)
    val rolled = Sketches.rollupFrom(spark, dir, Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // direct sketch over the raw rows (no day grain)
    val direct = Sketches.rollupDistinct(
        Sketches.buildHllCube(events, Seq("event_type"), "user_id"),
        Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rolled.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      // lossless union: the rollup estimate IS the whole-data estimate
      assert(rolled(k) == direct(k), s"$k rollup != direct")
      assert(math.abs(rolled(k).toDouble - n) <= 0.05 * n,
        s"$k estimate ${rolled(k)} vs exact $n")
    }
  }

  test("sketch build aggregates map-side (partial below the exchange)") {
    val plans = TestSpark.executedPlan(Sketches.buildHllCube(
      events.repartition(8), Seq("event_type"), "user_id"))
    val ex = plans.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.filter(_.outputPartitioning.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.physical.HashPartitioning])
    assert(ex.size == 1 && TestSpark.walkPlan(ex.head).tail.exists(
      _.nodeName.contains("ObjectHashAggregate")),
      s"partial sketch agg must run below the shuffle:\n${plans.head}")
  }

  test("eq_hist bins, clamps out-of-range, skips NULL and NaN") {
    import spark.implicits._
    // [0, 10) in 5 bins of width 2
    val df = Seq[java.lang.Double](0.0, 1.9, 2.0, 9.9, 10.0, 50.0, -3.0,
      null, Double.NaN).toDF("v")
    val got = df.agg(graft.functions.EqHistAgg(col("v"), 0.0, 10.0, 5)
      .as("hist")).head().getSeq[Long](0)
    // bin0: 0.0, 1.9, -3.0(clamped) = 3; bin1: 2.0 = 1;
    // bin4: 9.9, 10.0(clamped), 50.0(clamped) = 3
    assert(got == Seq(3L, 1L, 0L, 0L, 3L))
  }

  test("rollup merge is lossless: day-grain union == direct coarse build") {
    import spark.implicits._
    val rows = for (g <- Seq("a", "b"); day <- 1 to 3; i <- 0 until 40)
      yield (g, day, (i * 7 % 100).toDouble + day)
    val df = rows.toDF("g", "day", "v")
    val fine = Sketches.buildHistCube(df, Seq("g", "day"), "v", 0.0, 100.0,
      bins = 64)
    val merged = fine.groupBy("g")
      .agg(graft.functions.HistMergeAgg(col("hist")).as("hist"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val direct = Sketches.buildHistCube(df, Seq("g"), "v", 0.0, 100.0,
      bins = 64)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(merged == direct)
    assert(merged("a").sum == 120L)
  }

  test("histQuantile rank rule matches hand computation; empty is NULL") {
    import spark.implicits._
    // 10 values 5..95 step 10 over [0,100) in 10 bins: one per bin
    val df = (0 until 10).map(i => 5.0 + 10 * i).toDF("v")
    val sk = df.agg(graft.functions.EqHistAgg(col("v"), 0.0, 100.0, 10)
      .as("hist"))
    val got = sk.select(
      Sketches.histQuantile(col("hist"), 0.5, 0.0, 100.0).as("p50"),
      Sketches.histQuantile(col("hist"), 0.95, 0.0, 100.0).as("p95"),
      Sketches.histQuantile(col("hist"), 0.05, 0.0, 100.0).as("p05"))
      .head()
    // p50: r = ceil(0.5*10) = 5 -> bin 4 (cum 4 before), pos = 1/1
    //   -> 10 * (4 + 1) = 50
    assert(math.abs(got.getDouble(0) - 50.0) < 1e-12)
    // p95: r = ceil(9.5) = 10 -> bin 9, pos 1 -> 100
    assert(math.abs(got.getDouble(1) - 100.0) < 1e-12)
    // p05: r = max(ceil(0.5), 1) = 1 -> bin 0, pos 1 -> 10
    assert(math.abs(got.getDouble(2) - 10.0) < 1e-12)

    // empty sketch (all inputs NULL) -> NULL quantile
    val empty = Seq[java.lang.Double](null).toDF("v")
      .agg(graft.functions.EqHistAgg(col("v"), 0.0, 100.0, 10).as("hist"))
      .select(Sketches.histQuantile(col("hist"), 0.5, 0.0, 100.0).as("q"))
      .head()
    assert(empty.isNullAt(0))
  }

  test("partitioned cubes prune a sub-range probe to the touched days") {
    import spark.implicits._
    val rows = (for (d <- 1 to 3; i <- 1 to 50)
      yield (d, "t", i.toDouble)).toDF("day", "event_type", "v")
    val dir = graft.TestSpark.tmpDir("hist_cube_part")
    Sketches.writeHistCube(rows, Seq("day", "event_type"), "v",
      0.0, 50.0, dir, bins = 50, partitionCols = Seq("day"))
    val probe = Sketches.rollupQuantiles(
      spark.read.parquet(dir).filter(col("day") === 2),
      Seq("event_type"), 0.0, 50.0, Seq("p50" -> 0.5))
    val scans = graft.TestSpark.executedPlan(probe).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty &&
      scans.forall(_.selectedPartitions.partitionCount == 1),
      "day filter must prune to one hive partition")
    // and the pruned probe still answers correctly: 50 values 1..50,
    // p50 -> r=25 -> bin 25 (cum 24 before it), pos (25-24)/1 = 1
    // -> 1.0 * (25 + 1) = 26.0 (rank interpolates to the bin's right
    // edge; value 25 occupies bin [25, 26))
    val got = probe.head()
    assert(math.abs(got.getDouble(1) - 26.0) < 1e-12)
  }

  test("auto-ranged build derives bounds that keep max off the clamp edge") {
    import spark.implicits._
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
    val (cube, lo, hi) = Sketches.buildHistCubeAuto(df, Seq("g"), "v",
      bins = 100)
    assert(lo == 1.0 && hi > 100.0)
    val p100 = Sketches.rollupQuantiles(cube, Seq("g"), lo, hi,
      Seq("p100" -> 1.0)).head().getDouble(1)
    // max must come back from the last real bin, not a clamp artifact;
    // bin width ~1 so the p100 estimate sits within one bin of 100
    assert(p100 > 99.0 && p100 <= hi)
    // all-NULL column degenerates to the unit range, not a crash
    val (lo2, hi2) = Sketches.histBounds(
      Seq[java.lang.Double](null).toDF("v"), "v")
    assert(lo2 == 0.0 && hi2 == 1.0)
    // NaN values are excluded from the bounds (Spark's max ranks NaN
    // greatest; hi = NaN would fail the build's range check) — the
    // same skip rule EqHistAgg applies
    val (lo3, hi3) = Sketches.histBounds(
      Seq(1.0, 2.0, Double.NaN).toDF("v"), "v")
    assert(lo3 == 1.0 && hi3 > 2.0 && !hi3.isNaN)
  }

  test("property: histogram chain matches a Scala reference on random data") {
    // seeded random property sampling (the scalatest/scalacheck bridge
    // isn't in the offline cache — same style as ChunkMathSpec):
    // random range/bins/partitioning incl. out-of-range values; the
    // distributed sketch must equal a sequential reference bin-for-bin
    // and histQuantile must replay the reference rank rule exactly
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    for (round <- 0 until 5) {
      val n = 200 + rnd.nextInt(800)
      val lo = -5.0 + rnd.nextDouble() * 3
      val hi = lo + 1.0 + rnd.nextDouble() * 20
      val bins = 8 + rnd.nextInt(120)
      val w = (hi - lo) / bins
      val vals = Seq.fill(n)(lo - 2 + rnd.nextDouble() * (hi - lo + 4))
      val ref = new Array[Long](bins)
      vals.foreach { v =>
        val raw = math.floor((v - lo) / w)
        val b = if (raw < 0) 0
          else if (raw >= bins) bins - 1 else raw.toInt
        ref(b) += 1
      }
      val sk = vals.toDF("v").repartition(1 + rnd.nextInt(8))
        .agg(graft.functions.EqHistAgg(col("v"), lo, hi, bins).as("hist"))
      assert(sk.head().getSeq[Long](0) == ref.toSeq, s"round $round hist")

      val qs = Seq(0.01, 0.25, 0.5, 0.9, 0.999)
      val got = sk.select(qs.map(q =>
        Sketches.histQuantile(col("hist"), q, lo, hi).as(s"q$q")): _*)
        .head()
      qs.zipWithIndex.foreach { case (q, i) =>
        val r = math.max(math.ceil(q * n).toLong, 1L)
        var cum = 0L; var idx = -1; var pos = 0.0
        var b = 0
        while (idx < 0 && b < bins) {
          if (cum + ref(b) >= r) { idx = b; pos = (r - cum).toDouble / ref(b) }
          else cum += ref(b)
          b += 1
        }
        val expected = lo + w * (idx + pos)
        assert(math.abs(got.getDouble(i) - expected) < 1e-9,
          s"round $round q=$q")
      }
    }
  }

  test("rollupQuantiles answers from sketches and matches exact rank") {
    import spark.implicits._
    val rows = for (g <- Seq("x", "y"); day <- 1 to 4; i <- 1 to 25)
      yield (g, day, if (g == "x") i.toDouble else i * 2.0)
    val fine = Sketches.buildHistCube(rows.toDF("g", "day", "v"),
      Seq("g", "day"), "v", 0.0, 50.0, bins = 50)
    val got = Sketches.rollupQuantiles(fine, Seq("g"), 0.0, 50.0,
      Seq("p50" -> 0.5, "p99" -> 0.99))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    // g=x: 100 values, 4 copies each of 1..25; bins width 1. p50: r=50
    // -> bin 12 (values 12.x? value i lands in bin i since width 1 and
    // i < 50 ... value 12.0 -> bin 12), cum before bin 13 is 48, bin 13
    // has 4 -> r=50 falls in bin 13? cum(bins 1..12) = 48, bin 13 cum 52
    // >= 50 -> idx 13, pos (50-48)/4 = 0.5 -> 13.5
    assert(math.abs(got("x")._1 - 13.5) < 1e-12)
    // p99: r = 99 -> cum through bin 24 is 96, bin 25 has 4, cum 100
    // -> idx 25, pos (99-96)/4 = 0.75 -> 25.75
    assert(math.abs(got("x")._2 - 25.75) < 1e-12)
    // g=y doubles everything: bins 2,4,..,50(clamped to 49? 50.0 clamps
    // into bin 49); p50 r=50 -> value 26 region
    assert(got("y")._1 > 25.0 && got("y")._1 < 28.0)
  }
}
