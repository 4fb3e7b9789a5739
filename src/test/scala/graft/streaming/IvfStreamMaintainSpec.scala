package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark
import graft.ops.Similarity

/** A streamed, append-maintained IVF index must be indistinguishable
  * from a one-shot batch build over the same vectors under the same
  * quantizer — including after redelivery (idempotence) and under the
  * auto-compaction policy (probe equality, bounded file fan-in).
  */
class IvfStreamMaintainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def vec(i: Int): Array[Float] = {
    val r = new scala.util.Random(i * 7919 + 13)
    Array.fill(16)(r.nextGaussian().toFloat)
  }

  private def vecsDf(ids: Seq[Int]) =
    ids.map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")

  private def q(dir: String) =
    Similarity.queryIvfIndex(spark, dir, vecsDf(0 until 3), k = 5,
        nProbe = 2)
      .select("query_id", "corpus_id", "rank", "cos")
      .as[(Long, Long, Int, Double)].collect().sortBy(r => (r._1, r._3))
      .toSeq

  test("streamed IVF appends == one-shot build (same quantizer); " +
    "redelivered batch is a no-op") {
    val initial = vecsDf(0 until 20)
    val centers = Similarity.lowestIdCenters(initial, 4)
    val idxDir = TestSpark.tmpDir("ivf_stream_idx")
    Similarity.buildIvfIndex(initial, idxDir, nCentroids = 4,
      centers = Some(centers))

    val landing = TestSpark.tmpDir("ivf_stream_src")
    // wave 1 (two files), then wave 2 with vec 20 RE-DELIVERED
    vecsDf(20 until 35).repartition(2)
      .write.mode("append").parquet(landing)
    vecsDf((35 until 50) :+ 20).repartition(2)
      .write.mode("append").parquet(landing)

    val s = IvfStreamMaintain.start(spark, landing, idxDir,
      TestSpark.tmpDir("ivf_stream_chk"), Trigger.AvailableNow())
    s.awaitTermination(120000)

    val fullDir = TestSpark.tmpDir("ivf_stream_full")
    Similarity.buildIvfIndex(vecsDf(0 until 50), fullDir, nCentroids = 4,
      centers = Some(centers))
    assert(q(idxDir) == q(fullDir),
      "streamed appends must equal the one-shot build")

    // an entire batch re-delivered through the SAME maintenance entry
    // point must change nothing (the vecs_seen anti-join)
    IvfStreamMaintain.maintainBatch(spark, idxDir, vecsDf(20 until 35))
    assert(q(idxDir) == q(fullDir), "redelivery must be a no-op")
    assert(spark.read.parquet(s"$idxDir/assignments").count() == 50)
    // BUILD-time ids redelivered are no-ops too: vecs_seen was seeded
    // from the standing index on first contact, so vectors that entered
    // via buildIvfIndex are history, not novelty
    IvfStreamMaintain.maintainBatch(spark, idxDir, vecsDf(0 until 5))
    assert(spark.read.parquet(s"$idxDir/assignments").count() == 50,
      "a redelivered build-time id appended a duplicate row")
    assert(q(idxDir) == q(fullDir))
  }

  test("auto-compaction keeps per-cell file fan-in bounded across " +
    "~20 micro-batches; probes stay correct throughout") {
    val threshold = 3
    val initial = vecsDf(0 until 20)
    val centers = Similarity.lowestIdCenters(initial, 4)
    val idxDir = TestSpark.tmpDir("ivf_autocompact")
    Similarity.buildIvfIndex(initial, idxDir, nCentroids = 4,
      centers = Some(centers))
    val nPerBatch = 5
    val nBatches = 20
    var maxFiles = 0
    var maxSeenFiles = 0
    (0 until nBatches).foreach { b =>
      val ids = (100 + b * nPerBatch) until (100 + (b + 1) * nPerBatch)
      IvfStreamMaintain.maintainBatch(spark, idxDir, vecsDf(ids),
        compactOver = Some(threshold), seenCompactOver = 2)
      // invariant AFTER EVERY batch hook: no cell exceeds the threshold
      val over = Similarity.cellsOverThreshold(idxDir, threshold)
      assert(over.isEmpty, s"batch $b left cells over threshold: $over")
      val counts = new java.io.File(s"$idxDir/assignments").listFiles()
        .filter(_.isDirectory)
        .map(_.listFiles().count(_.getName.endsWith(".parquet")))
      if (counts.nonEmpty) maxFiles = math.max(maxFiles, counts.max)
      maxSeenFiles = math.max(maxSeenFiles,
        new java.io.File(s"$idxDir/vecs_seen").listFiles()
          .count(_.getName.endsWith(".parquet")))
    }
    assert(maxFiles <= threshold,
      s"fan-in grew to $maxFiles despite threshold $threshold")
    // vecs_seen rides the same SeenTable bound as the cell partitions
    assert(maxSeenFiles <= 3,
      s"vecs_seen fan-in grew to $maxSeenFiles despite seenCompactOver=2")
    // and the index still answers exactly like a fresh one-shot build
    val all = vecsDf((0 until 20) ++ (100 until 100 + nBatches * nPerBatch))
    val fullDir = TestSpark.tmpDir("ivf_autocompact_full")
    Similarity.buildIvfIndex(all, fullDir, nCentroids = 4,
      centers = Some(centers))
    assert(q(idxDir) == q(fullDir),
      "compacted streamed index must equal the one-shot build")
  }

  test("drift-forcing stream: the armed canary triggers exactly one " +
    "version-flip rebuild, and the post-rebuild canary clears the floor") {
    import graft.ops.IndexVersions
    // region A: two tight clusters at ±e0 — the supplied quantizer's
    // two cells. Drift region B: a cluster far along e1 whose members
    // SPLIT across the A cells on the sign of their tiny e0 jitter —
    // the geometry where appended drift provably degrades nProbe=1
    // recall (a B query's true neighbors live in both cells but it
    // probes one).
    def aVec(i: Int, sign: Float): Array[Float] = {
      val r = new scala.util.Random(i * 104729 + 7)
      Array.tabulate(16)(d =>
        (if (d == 0) sign else 0f) + r.nextGaussian().toFloat * 0.01f)
    }
    def bVec(i: Int): Array[Float] = {
      val r = new scala.util.Random(i * 15485863 + 3)
      Array.tabulate(16)(d =>
        (if (d == 1) 10f else 0f) + r.nextGaussian().toFloat * 0.05f)
    }
    val a = ((0 until 10).map(i => (i.toLong, aVec(i, 1f))) ++
      (10 until 20).map(i => (i.toLong, aVec(i, -1f))))
      .toDF("vec_id", "embedding")
    val centers = Array(
      Array.tabulate(16)(d => if (d == 0) 1.0 else 0.0),
      Array.tabulate(16)(d => if (d == 0) -1.0 else 0.0))
    val idxDir = TestSpark.tmpDir("ivf_drift_idx")
    Similarity.buildIvfIndex(a, idxDir, nCentroids = 2,
      centers = Some(centers))

    val canary = (100 until 106).map(i => (i.toLong, bVec(i)))
      .toDF("vec_id", "embedding")
    val landing = TestSpark.tmpDir("ivf_drift_src")
    val chk = TestSpark.tmpDir("ivf_drift_chk")
    def wave(ids: Range): Unit = {
      ids.map(i => (i.toLong, bVec(i))).toDF("vec_id", "embedding")
        .coalesce(1).write.mode("append").parquet(landing)
      val s = IvfStreamMaintain.start(spark, landing, idxDir, chk,
        Trigger.AvailableNow(), canary = Some(canary), canaryEveryN = 2,
        minRecall = 0.9, canaryK = 5, canaryNProbe = 1)
      s.awaitTermination(120000)
    }
    wave(100 until 120) // batch 0: appends only (canary at every 2nd)
    assert(IndexVersions.currentVersion(idxDir).isEmpty,
      "no canary batch yet — nothing may rebuild")
    wave(120 until 140) // batch 1: canary fires, drift breaches floor
    assert(IndexVersions.currentVersion(idxDir).contains(1),
      "the drift canary must trigger exactly one rebuild")
    wave(140 until 160) // batch 2: no canary
    wave(160 until 180) // batch 3: canary healthy -> NO second rebuild
    assert(IndexVersions.currentVersion(idxDir).contains(1),
      "a healthy canary must not rebuild again")
    // post-rebuild canary clears the floor the drift breached (the
    // refit quantizer gives region B its own cell)
    val post = Similarity.ivfRecallCanary(spark, idxDir, canary,
      k = 5, nProbe = 1)
    graft.ops.CacheRegistry.releaseAll()
    assert(post >= 0.9, s"post-rebuild canary $post below floor")
    // and the streamed content survived the flip: every appended id
    // still probes (ids 100..179 + build-time 0..19)
    val root = IndexVersions.resolve(idxDir)
    assert(spark.read.parquet(s"$root/assignments").count() == 100)
  }
}
