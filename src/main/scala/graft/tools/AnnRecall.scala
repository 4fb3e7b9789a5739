package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Similarity

/** Recorded recall@k of every approximate ANN path against the exact
  * brute-force ranking on the fixture embeddings — the quality side of
  * the speed/quality trade the rows-only ANN correctness entries
  * cannot express. Run: tools/run_main.sh graft.tools.AnnRecall
  * [sfDir [nQueries [k]]]; prints one line per index type. Figures are
  * recorded in COVERAGE.md §ANN recall.
  *
  * Recall here = |approx top-k ∩ exact top-k| / (nQueries · k), the
  * standard ANN-benchmark definition (ties broken by id on both
  * sides, so the intersection is well-defined).
  */
object AnnRecall {

  private def topkSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("query_id").cast("long"), col("corpus_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val nQueries = if (args.length > 1) args(1).toInt else 64
    val k = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vecs = Tables.embeddings(spark, sfDir).cache()
    val nCorpus = vecs.count()
    val queries = vecs.filter(col("vec_id") < nQueries)
    val truth = topkSet(Similarity.bruteForceTopK(vecs, queries, k))
    require(truth.size == nQueries * k, s"truth size ${truth.size}")

    def report(name: String, df: DataFrame): Unit = {
      val got = topkSet(df)
      val recall = (got & truth).size.toDouble / truth.size
      println(f"$name%-14s recall@$k = $recall%.4f   (sf=$sfDir, " +
        f"corpus=$nCorpus, queries=$nQueries)")
    }

    // parameter sweeps: the recall axis the correctness entries'
    // fixed settings sit on (recall rises with tables/probes as cost
    // rises — the number that makes the speed/quality trade explicit)
    for (nt <- Seq(4, 16, 64))
      report(s"lsh(8x$nt)", Similarity.lshTopK(vecs, queries, k,
        dim = 64, bitsPerTable = 8, nTables = nt))
    for (np <- Seq(4, 8, 12))
      report(s"ivf(16/$np)", Similarity.ivfTopK(vecs, queries, k,
        nCentroids = 16, nProbe = np))
    report("pq(8x16)", Similarity.pqTopK(vecs, queries, k,
      dim = 64, nSub = 8, ksub = 16))
    for (np <- Seq(4, 8))
      report(s"ivfpq(16/$np)", Similarity.ivfPqTopK(vecs, queries, k,
        dim = 64, nSub = 8, ksub = 16, nCentroids = 16, nProbe = np))
    val deq = vecs.select(col("vec_id"),
      Similarity.dequantizeInt8(
        Similarity.quantizeInt8(col("embedding")),
        Similarity.int8Scale(col("embedding"))).as("embedding"))
    report("int8-exact", Similarity.bruteForceTopK(deq,
      deq.filter(col("vec_id") < nQueries), k))

    // the ANN-routed contrastive miner vs its exact baseline: recall@k
    // of hardNegativesAnn against the brute hardNegatives ranking, the
    // same sweep axis (nProbe) as the plain IVF rows above — labels
    // ride the index, the deterministic lowest-id quantizer keeps the
    // route oracle-replayable
    val minerDir = java.nio.file.Files
      .createTempDirectory("annrecall_miner").toString
    Similarity.buildIvfIndex(vecs, minerDir, nCentroids = 16,
      labelCol = Some("label"),
      centers = Some(Similarity.lowestIdCenters(vecs, 16)))
    val hnTruth = topkSet(Similarity.hardNegatives(vecs, queries, k))
    for (np <- Seq(4, 8, 12)) {
      val got = topkSet(Similarity.hardNegativesAnn(spark, minerDir,
        queries, k, nProbe = np))
      val recall = (got & hnTruth).size.toDouble / hnTruth.size
      val label = s"miner(16/$np)"
      println(f"$label%-14s recall@$k = $recall%.4f   (vs brute " +
        f"hardNegatives; sf=$sfDir, corpus=$nCorpus, queries=$nQueries)")
    }

    // JL-projected shortlist: recall@k vs the exact ranking as the
    // shortlist widens — the dimension-reduction trade (16 of 64 dims
    // scanned; the exact re-rank fixes ordering, so recall measures
    // only shortlist membership)
    for (sl <- Seq(16, 32, 64))
      report(s"rp(16d/$sl)", graft.ops.RandomProjection.projectedTopK(
        vecs, queries, k, shortlist = sl, dimIn = 64, dimOut = 16))

    // appended-index recall DRIFT: appendToIvfIndex deliberately never
    // refits the quantizer (the FAISS operational trade), so cells
    // drift as the corpus grows past the build-time distribution. This
    // is the number that makes "refit + rebuild when recall degrades"
    // (ops/Similarity.scala append contract) operational: recall@k of
    // the half-built index after N append batches vs (a) the exact
    // brute ranking over the same grown corpus and (b) the same corpus
    // rebuilt fresh (refit quantizer) — (b) minus (a) is the rebuild's
    // recoverable headroom at that drift point.
    val half = nCorpus / 2
    val nBatches = 20
    val step = math.max(1L, (nCorpus - half) / nBatches)
    val initial = vecs.filter(col("vec_id") < half)
    for (n <- Seq(0, 5, 20)) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"annrecall_drift$n").toString
      Similarity.buildIvfIndex(initial, dir, nCentroids = 16)
      for (b <- 0 until n) {
        val lo = half + b * step
        val hi = if (b == nBatches - 1) nCorpus else half + (b + 1) * step
        Similarity.appendToIvfIndex(
          vecs.filter(col("vec_id") >= lo && col("vec_id") < hi), dir)
      }
      val grownHi = if (n == nBatches) nCorpus else half + n * step
      val grown = vecs.filter(col("vec_id") < grownHi)
      val truthN = topkSet(Similarity.bruteForceTopK(grown, queries, k))
      val appended = topkSet(
        Similarity.queryIvfIndex(spark, dir, queries, k, nProbe = 4))
      val freshDir = java.nio.file.Files
        .createTempDirectory(s"annrecall_fresh$n").toString
      Similarity.buildIvfIndex(grown, freshDir, nCentroids = 16)
      val fresh = topkSet(
        Similarity.queryIvfIndex(spark, freshDir, queries, k, nProbe = 4))
      val rA = (appended & truthN).size.toDouble / truthN.size
      val rF = (fresh & truthN).size.toDouble / truthN.size
      println(f"drift(N=$n%2d)     recall@$k = $rA%.4f   (fresh rebuild " +
        f"$rF%.4f, headroom ${rF - rA}%+.4f; corpus=${grown.count()}, " +
        f"queries=$nQueries, 16 cells / nProbe 4)")
    }

    spark.stop()
  }
}
