package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B of the native [[graft.functions.NearestCellsExpr]] nearest-cell
  * assignment against the per-centroid literal-struct formulation it
  * replaced (`array_min(array(struct(aggregate(zip_with(...)), i),
  * ...))`), across centroid counts — the measurement behind the swap:
  * the literal form embeds O(nCentroids x dim) plan literals and pays
  * an interpreted lambda per centroid, so it degrades with BOTH plan
  * size (analysis/codegen) and per-row dispatch, while the native
  * kernel holds centroids as one reference object in a compiled loop.
  * Run: tools/run_main.sh graft.tools.NearestCellsBench [nRows];
  * one line per (form, nCentroids); figures recorded in SCALING.md.
  */
object NearestCellsBench {

  private def literalAssign(vec: Column,
                            centers: Array[Array[Double]]): Column =
    array_min(array(centers.zipWithIndex.toIndexedSeq.map {
      case (ctr, i) =>
        struct(
          aggregate(zip_with(vec, lit(ctr),
            (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
            lit(0.0), (a, v) => a + v).as("dist"),
          lit(i).as("cell"))
    }: _*)).getField("cell")

  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toInt).getOrElse(100000)
    val dim = 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic synthetic vectors, fully codegen-able generation so
    // the measured delta is the assignment, not the fixture
    val vecs = spark.range(nRows).select(col("id"),
      transform(sequence(lit(1), lit(dim)),
        i => sin(col("id") * i)).as("v"))
      .cache()
    vecs.count()

    def centers(n: Int): Array[Array[Double]] = {
      val r = new scala.util.Random(42)
      Array.fill(n)(Array.fill(dim)(r.nextGaussian()))
    }

    def time(label: String, df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val d = df
      val planned = d.queryExecution.executedPlan // force analysis+planning
      val t1 = System.nanoTime()
      d.agg(sum(col("cell"))).collect()
      val t2 = System.nanoTime()
      println(f"$label%-22s plan ${(t1 - t0) / 1e9}%8.3f s   " +
        f"exec ${(t2 - t1) / 1e9}%8.3f s   (rows=$nRows, dim=$dim)")
    }

    for (n <- Seq(64, 256, 1024)) {
      val ctrs = centers(n)
      time(s"native(n=$n)", vecs.select(element_at(
        graft.functions.NearestCellsExpr(col("v"), ctrs, 1), 1).as("cell")))
      time(s"literal(n=$n)",
        vecs.select(literalAssign(col("v"), ctrs).as("cell")))
    }
    spark.stop()
  }
}
