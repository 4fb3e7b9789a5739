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
