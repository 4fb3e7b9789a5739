package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The native nearest-cells kernel vs the per-centroid literal-struct
  * formulation it replaced: bit-identical selection on the same
  * arithmetic, plus the scale property the literal form lacked —
  * centroid counts in the production range (>= 1024) run as ONE
  * compiled expression with no CodegenFallback and no plan growth.
  */
class NearestCellsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def vec(i: Int, dim: Int): Array[Float] = {
    val r = new scala.util.Random(i * 104729 + 7)
    Array.fill(dim)(r.nextGaussian().toFloat)
  }

  private def centers(n: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(n)(c => vec(900000 + c, dim).map(_.toDouble))

  private def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      q +: walk(q.plan)
    case other => other +: other.children.flatMap(walk)
  }

  test("L2 mode == the array_sort(struct(dist, cell)) formulation, " +
      "bit for bit, across nProbe") {
    val dim = 16
    val ctrs = centers(24, dim)
    val df = (0 until 200).map(i => (i.toLong, vec(i, dim)))
      .toDF("vec_id", "embedding")
    for (nProbe <- Seq(1, 4, 24)) {
      val cellDists = array(ctrs.zipWithIndex.toIndexedSeq.map {
        case (ctr, i) =>
          struct(
            aggregate(zip_with(col("embedding"), lit(ctr),
              (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
              lit(0.0), (a, v) => a + v).as("dist"),
            lit(i).as("cell"))
      }: _*)
      val rows = df.select(
        NearestCellsExpr(col("embedding"), ctrs, nProbe).as("native"),
        transform(slice(array_sort(cellDists), 1, nProbe),
          s => s.getField("cell")).as("hof")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Int](0) == r.getSeq[Int](1),
          s"nProbe=$nProbe: ${r.getSeq[Int](0)} vs ${r.getSeq[Int](1)}")
      }
    }
  }

  test("cosine mode == the array_max(struct(cos, -cell)) argmax, bit for bit") {
    val dim = 16
    val ctrs = centers(24, dim)
    val df = (0 until 200).map(i => (i.toLong, vec(i, dim)))
      .toDF("vec_id", "embedding")
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      DotProductExpr(a, b)
    def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
    val cellScores = array(ctrs.zipWithIndex.toIndexedSeq.map {
      case (ctr, i) =>
        struct(cosine(col("embedding"), lit(ctr)).as("cos"),
          lit(-i).as("negcell"))
    }: _*)
    val rows = df.select(
      element_at(NearestCellsExpr(col("embedding"), ctrs, 1,
        cosineMode = true), 1).as("native"),
      (-array_max(cellScores).getField("negcell")).as("hof")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("ties break to the lowest cell in both modes") {
    val ctr = Array(1.0, 0.0)
    // three IDENTICAL centroids: every distance/cosine ties
    val ctrs = Array(ctr, ctr, ctr)
    val df = Seq(Tuple1(Array(3.0f, 4.0f))).toDF("v")
    val l2 = df.select(NearestCellsExpr(col("v"), ctrs, 2)).collect()
    assert(l2.head.getSeq[Int](0) == Seq(0, 1))
    val cos = df.select(NearestCellsExpr(col("v"), ctrs, 2,
      cosineMode = true)).collect()
    assert(cos.head.getSeq[Int](0) == Seq(0, 1))
  }

  test("NULL and shape edges: null vector, length mismatch, nProbe clamp") {
    val ctrs = Array(Array(0.0, 0.0), Array(1.0, 1.0))
    val df = Seq(Tuple1(Array(0.2f, 0.3f))).toDF("v")
    // length mismatch -> NULL (the zip_with null-padding outcome)
    val mm = Seq(Tuple1(Array(1.0f, 2.0f, 3.0f))).toDF("v")
      .select(NearestCellsExpr(col("v"), ctrs, 1).as("c")).collect()
    assert(mm.head.isNullAt(0))
    val nv = df.select(NearestCellsExpr(
      when(lit(false), col("v")), ctrs, 1).as("c")).collect()
    assert(nv.head.isNullAt(0))
    // nProbe beyond nCentroids returns all cells, best-first
    val all = df.select(NearestCellsExpr(col("v"), ctrs, 99).as("c")).collect()
    assert(all.head.getSeq[Int](0) == Seq(0, 1))
  }

  test("production centroid count (1024): compiled, no CodegenFallback, " +
      "no per-centroid plan literals") {
    val dim = 64
    val nCentroids = 1024
    val ctrs = centers(nCentroids, dim)
    val df = (0 until 500).map(i => (i.toLong, vec(i, dim)))
      .toDF("vec_id", "embedding")
    val probed = df.select(col("vec_id"),
      explode(NearestCellsExpr(col("embedding"), ctrs, 4)).as("cell"))
    // surface any janino failure instead of silently interpreting
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val rows = try probed.collect()
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
    assert(rows.length == 500 * 4)
    // spot-check against a driver-side replay of the kernel's contract
    val v0 = vec(0, dim).map(_.toDouble)
    val want = ctrs.zipWithIndex.map { case (c, i) =>
      (c.zip(v0).map { case (y, x) => (x - y) * (x - y) }.sum, i)
    }.sortBy(identity).take(4).map(_._2).toSeq
    assert(rows.filter(_.getLong(0) == 0L).map(_.getInt(1)).toSeq == want)
    val plans = walk(probed.queryExecution.executedPlan)
    // the old formulation's scale-killers, asserted away: every
    // expression in the plan codegens (zip_with/aggregate lambdas were
    // CodegenFallback) ...
    val fallbacks = plans.flatMap(_.expressions).flatMap(_.collect {
      case e: CodegenFallback => e
    })
    assert(fallbacks.isEmpty,
      s"CodegenFallback expressions in the probe plan: " +
        s"${fallbacks.map(_.getClass.getSimpleName).distinct}")
    // ... the projection runs inside WholeStageCodegen ...
    assert(plans.exists {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
        w.toString.contains("nearest_cells")
      case _ => false
    }, "nearest_cells must run inside a WholeStageCodegen span")
    // ... and the centroids are a reference object, not 1024 x 64 plan
    // literals (the literal form's optimized-plan string is megabytes)
    val planChars = probed.queryExecution.optimizedPlan.toString.length
    assert(planChars < 20000, s"plan string blew up: $planChars chars")
  }
}
