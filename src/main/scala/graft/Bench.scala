package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: headline queries on SPARK_GRAFT_SF_DIR at
  * local[32], one JSON line on stdout.
  *
  * Headline set spans the operator families (agg, scan+filter, joins,
  * windows, as-of, QA decode kernel, text analysis, dedup/LSH, ANN) —
  * the grid fixture-building queries are excluded (they time tmp-dir
  * parquet writes, not operator throughput; their correctness is covered
  * by Verify and the ScalaTest suite).
  */
object Bench {
  val headline: Seq[String] = Seq(
    "q1_pricing_summary", "p3_window_slice", "j1_multi_grid_align",
    "j4_semi_join", "j5_anti_join", "w1_series_lag", "w2_running_sum",
    "tumbling_daily", "session_windows", "asof_join", "o1_topk",
    "cube_rollup", "rank_topn", "f5_qa_confidence", "f9_chunk_math",
    "text_stats", "text_lang_id", "dedup_exact", "dedup_minhash_lsh",
    "dedup_simhash", "ann_brute_topk", "ann_lsh_topk")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: session init, codegen, parquet footer caches
    SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()

    val results = headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
