package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark
import graft.ops.TextSearch

/** A streamed, segment-appended inverted index must be
  * indistinguishable from a one-shot batch build — including after
  * redelivery (idempotence) and after compaction (probe equality,
  * bounded file fan-in).
  */
class IndexStreamMaintainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def mkDoc(i: Int): String =
    (0 until 20).map(j => s"w${(i * 31 + j * 7) % 97} x$j").mkString(" ") +
      (if (i % 5 == 0) " rare" else " common")

  private val terms = Seq("rare", "common", "w3")

  private def q(dir: String) =
    TextSearch.queryInvertedIndex(spark, dir, terms, k = 12, nBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("streamed index == one-shot build; redelivered batch is a no-op; " +
    "compaction preserves probes and shrinks files") {
    val docs = (0 until 30).map(i => (i.toLong, mkDoc(i)))
    val landing = TestSpark.tmpDir("idx_stream_src")
    // wave 1 (two files), then wave 2 with doc 0 RE-DELIVERED
    docs.take(12).toDF("doc_id", "text").repartition(2)
      .write.mode("append").parquet(landing)
    (docs.drop(12) ++ docs.take(1)).toDF("doc_id", "text").repartition(2)
      .write.mode("append").parquet(landing)

    val idxDir = TestSpark.tmpDir("idx_stream_idx")
    val s = IndexStreamMaintain.start(spark, landing, idxDir,
      TestSpark.tmpDir("idx_stream_chk"), Trigger.AvailableNow(),
      nBuckets = 8)
    s.awaitTermination(120000)

    val fullDir = TestSpark.tmpDir("idx_stream_full")
    TextSearch.buildInvertedIndex(docs.toDF("doc_id", "text"), fullDir,
      nBuckets = 8)
    assert(q(idxDir) == q(fullDir),
      "streamed segments must equal the one-shot build")

    // an entire batch re-delivered through the SAME maintenance entry
    // point must change nothing (the docs_seen anti-join)
    IndexStreamMaintain.maintainBatch(spark,
      idxDir, docs.take(12).toDF("doc_id", "text"), nBuckets = 8)
    assert(q(idxDir) == q(fullDir), "redelivery must be a no-op")

    // compaction: probes unchanged, per-bucket file fan-in collapses
    val (before, after) = TextSearch.compactInvertedIndex(spark, idxDir)
    assert(q(idxDir) == q(fullDir), "compaction must not change probes")
    assert(after < before, s"expected fewer files, got $before -> $after")
  }

  test("auto-compaction keeps per-bucket file fan-in bounded across " +
    "~20 micro-batches; probes stay correct throughout") {
    val threshold = 3
    val idxDir = TestSpark.tmpDir("idx_autocompact")
    val nDocsPerBatch = 6
    val nBatches = 20
    var maxFiles = 0
    var maxSeenFiles = 0
    (0 until nBatches).foreach { b =>
      val docs = (b * nDocsPerBatch until (b + 1) * nDocsPerBatch)
        .map(i => (i.toLong, mkDoc(i)))
      IndexStreamMaintain.maintainBatch(spark, idxDir,
        docs.toDF("doc_id", "text"), nBuckets = 8,
        compactOver = Some(threshold), seenCompactOver = 2)
      // invariant AFTER EVERY batch: no bucket exceeds the threshold
      // (compaction fires inside the batch hook, so the bound holds
      // continuously, not just at the end)
      val over = IndexStreamMaintain.bucketsOverThreshold(idxDir, threshold)
      assert(over.isEmpty, s"batch $b left buckets over threshold: $over")
      val counts = new java.io.File(s"$idxDir/postings").listFiles()
        .filter(_.isDirectory)
        .map(_.listFiles().count(_.getName.endsWith(".parquet")))
      if (counts.nonEmpty) maxFiles = math.max(maxFiles, counts.max)
      maxSeenFiles = math.max(maxSeenFiles,
        new java.io.File(s"$idxDir/docs_seen").listFiles()
          .count(_.getName.endsWith(".parquet")))
    }
    // the bound really bit: 20 appends into 8 buckets WOULD have grown
    // ~20 files/bucket without the policy
    assert(maxFiles <= threshold,
      s"fan-in grew to $maxFiles despite threshold $threshold")
    // the docs_seen id history is bounded by the SAME discipline
    // (SeenTable) — without it the gate's anti-join would re-open one
    // file per historical batch every trigger
    assert(maxSeenFiles <= 3,
      s"docs_seen fan-in grew to $maxSeenFiles despite seenCompactOver=2")
    // and the index still answers exactly like a fresh one-shot build
    val all = (0 until nBatches * nDocsPerBatch).map(i => (i.toLong, mkDoc(i)))
    val fullDir = TestSpark.tmpDir("idx_autocompact_full")
    TextSearch.buildInvertedIndex(all.toDF("doc_id", "text"), fullDir,
      nBuckets = 8)
    assert(q(idxDir) == q(fullDir),
      "auto-compacted streamed index must equal the one-shot build")
  }

  test("bucket-bounded compaction rewrites only the named buckets") {
    val docs = (0 until 20).map(i => (i.toLong, mkDoc(i)))
    val dir = TestSpark.tmpDir("idx_compact_b")
    TextSearch.buildInvertedIndex(
      docs.take(10).toDF("doc_id", "text"), dir, nBuckets = 8)
    TextSearch.appendToInvertedIndex(
      docs.drop(10).toDF("doc_id", "text"), dir, nBuckets = 8)
    val full = q(dir)
    val (b, a) = TextSearch.compactInvertedIndex(spark, dir,
      buckets = Some(Seq(0, 1)))
    assert(a <= b)
    assert(q(dir) == full, "bounded compaction must not change probes")
  }
}
