package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Bench

/** 100x probe of the trigram-grep build/probe split (SCALING.md round-9
  * addendum): replicate the sf0.1 documents fixture Nx, then run
  * Bench.trigramAB (index build once + indexed grep vs full contains()
  * scan) at 1x and Nx. The claim on record: the full scan grows with
  * CORPUS bytes while the indexed probe grows with HIT count, so the
  * shapes diverge and the one-time build amortizes across the many
  * ad-hoc literals of a PII/contamination audit — this probe captures
  * where the crossover actually sits at Nx on this hardware.
  *
  * Usage: runMain graft.tools.TrigramProbe [multiplier] (default 100).
  */
object TrigramProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener =
      org.apache.spark.GraftMetricsBridge.install(spark.sparkContext)
    Bench.attachListener(listener)

    val shm = java.nio.file.Paths.get("/dev/shm")
    val base = (if (java.nio.file.Files.isWritable(shm))
      java.nio.file.Files.createTempDirectory(shm, "graft_triprobe")
    else java.nio.file.Files.createTempDirectory("graft_triprobe")).toString

    val src = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def scaled(n: Int): String = {
      val dir = s"$base/sf_x$n"
      val reps = spark.range(n).select(col("id").cast("int").as("rep"))
      src.crossJoin(broadcast(reps))
        .select(
          (col("doc_id") + col("rep").cast("long") * 10000000L).as("doc_id"),
          when(col("rep") === 0, col("text"))
            .otherwise(concat(lit("rep"), col("rep"), lit(" "), col("text")))
            .as("text"),
          col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }

    def force(df: DataFrame): Unit =
      df.select(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*))
        .as("h")).agg(expr("bit_xor(h)")).collect()

    // two selectivities: the common default phrase (270/5000 fixture
    // docs -> hits grow with the corpus) and a rare 5-gram (1/5000 ->
    // the selective-audit case the index exists for)
    val literals = Seq("merge batch", "fast big table stream merge")
    Seq(1 -> scaled(1), mult -> scaled(mult)).foreach { case (n, dir) =>
      Bench.trigramAB(spark, dir, force, literals).foreach { t =>
        println(f"""{"query":"${t.name}","scale_x":$n,"wall_sec":${t.wall}%.3f,"cpu_sec":${t.cpu}%.3f}""")
      }
    }
    try { graft.sources.GridExports.deleteStore(spark, base) }
    catch { case _: Throwable => }
    spark.stop()
  }
}
