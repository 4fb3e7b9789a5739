package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark
import graft.ops.{Bpe, TensorShards}

/** The streamed tensor shards must equal, wave for wave, the batch
  * composition under the same frozen tokenizer (bins are batch-scoped
  * by design — globalized ids, one underfull bin per batch at most),
  * and a redelivered batch must write nothing.
  */
class TensorStreamShardsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def doc(i: Int): (Long, String) = {
    val r = new scala.util.Random(i * 2654435761L + 11)
    val words = Seq.tabulate(6 + r.nextInt(6))(j =>
      s"w${(i * 7 + j * 3) % 13}" + (if (j == 2) "." else ""))
    (i.toLong, words.mkString(" "))
  }

  test("streamed shards == per-batch batch composition under the frozen " +
    "tokenizer; redelivered docs write nothing") {
    val seed = (0 until 20).map(doc).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(seed, nMerges = 6)
    val syms = Bpe.vocab(seed, merges)
    val tokDir = TestSpark.tmpDir("tstream_tok")
    Bpe.saveTokenizer(spark, tokDir, merges, syms)

    val landing = TestSpark.tmpDir("tstream_src")
    val out = TestSpark.tmpDir("tstream_out")
    val chk = TestSpark.tmpDir("tstream_chk")
    def wave(ids: Seq[Int]): Unit = {
      ids.map(doc).toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(landing)
      val s = TensorStreamShards.start(spark, landing, tokDir, out, chk,
        capacity = 16L)
      s.awaitTermination(120000)
    }
    wave(0 until 10)            // batch 0
    wave((10 until 20) ++ (0 until 3)) // batch 1, docs 0..2 REDELIVERED

    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Seq[Long],
        Seq[Long], Seq[Long], Seq[Long])] =
      df.select(col("bin_id"), col("token_ids"), col("loss_mask"),
          col("seg_starts"), col("seg_lens"))
        .collect().map(r => (
          r.get(0) match {
            case l: Long => l
            case s: scala.collection.Seq[_] =>
              s.head.asInstanceOf[Long] // decoded arrays carry 1 element
          },
          r.getSeq[Long](1), r.getSeq[Long](2), r.getSeq[Long](3),
          r.getSeq[Long](4))).toSet

    val decoded = rows(
      graft.sources.TfRecord.readExamples(spark, s"$out/shards",
          Seq("bin_id", "token_ids", "loss_mask", "seg_starts",
            "seg_lens"), Seq.empty)
        .select(element_at(col("bin_id"), 1).as("bin_id"),
          col("token_ids"), col("loss_mask"), col("seg_starts"),
          col("seg_lens")))

    // the batch twin: compose each wave's NOVEL docs directly, ids
    // globalized exactly like the stream
    def direct(ids: Seq[Int], batchId: Long) = {
      val docs = ids.map(doc).toDF("doc_id", "text")
      val t = Bpe.encodeIds(docs, merges, syms)
      val s = Bpe.promptMaskSpans(docs, merges)
      val r = rows(TensorShards.binTensors(t, s, capacity = 16L)
        .select((col("bin_id") +
          lit(batchId * TensorStreamShards.binStride)).as("bin_id"),
          col("token_ids"), col("loss_mask"), col("seg_starts"),
          col("seg_lens")))
      graft.ops.CacheRegistry.releaseAll()
      r
    }
    assert(decoded == (direct(0 until 10, 0L) ++ direct(10 until 20, 1L)))

    // invariants survive the stream: per bin, lengths agree
    decoded.foreach { case (_, toks, loss, starts, lens) =>
      assert(toks.size == loss.size && lens.sum == toks.size &&
        starts.size == lens.size)
    }

    // full redelivery through the batch entry point: nothing new
    TensorStreamShards.shardBatch(spark, tokDir,
      (0 until 10).map(doc).toDF("doc_id", "text"), out,
      capacity = 16L, batchId = 9L)
    val again = rows(
      graft.sources.TfRecord.readExamples(spark, s"$out/shards",
          Seq("bin_id", "token_ids", "loss_mask", "seg_starts",
            "seg_lens"), Seq.empty)
        .select(element_at(col("bin_id"), 1).as("bin_id"),
          col("token_ids"), col("loss_mask"), col("seg_starts"),
          col("seg_lens")))
    assert(again == decoded, "redelivered batch must be a no-op")
  }

  test("docs_seen compaction bounds file fan-in; the gate stays exact") {
    val seed = (0 until 24).map(doc).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(seed, nMerges = 6)
    val syms = Bpe.vocab(seed, merges)
    val tokDir = TestSpark.tmpDir("tstream_cs_tok")
    Bpe.saveTokenizer(spark, tokDir, merges, syms)
    val out = TestSpark.tmpDir("tstream_cs_out")
    // 8 waves of 3 docs at threshold 2: without compaction docs_seen
    // would hold 8 part files
    (0 until 8).foreach { b =>
      TensorStreamShards.shardBatch(spark, tokDir,
        (b * 3 until b * 3 + 3).map(doc).toDF("doc_id", "text"), out,
        capacity = 16L, batchId = b.toLong, seenCompactOver = 2)
    }
    val seenFiles = new java.io.File(s"$out/docs_seen").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(seenFiles.length <= 3,
      s"fan-in must stay bounded, got ${seenFiles.length}")
    // every id survived every compaction round
    assert(spark.read.parquet(s"$out/docs_seen").distinct().count() == 24)
    // and the gate still refuses redelivered docs
    val before = new java.io.File(s"$out/shards").listFiles().length
    TensorStreamShards.shardBatch(spark, tokDir,
      (0 until 24).map(doc).toDF("doc_id", "text"), out,
      capacity = 16L, batchId = 99L, seenCompactOver = 2)
    assert(new java.io.File(s"$out/shards").listFiles().length == before,
      "full redelivery after compaction must write nothing")
  }

  test("multiturn mode: streamed shards == per-batch multiturn batch " +
    "composition") {
    def conv(i: Int): (Long, String) = {
      val (_, t) = doc(i)
      (i.toLong, s"<user> $t <assistant> $t")
    }
    val seed = (0 until 12).map(conv).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(seed, nMerges = 6)
    val syms = Bpe.vocab(seed, merges)
    val tokDir = TestSpark.tmpDir("tstream_mt_tok")
    Bpe.saveTokenizer(spark, tokDir, merges, syms)
    val out = TestSpark.tmpDir("tstream_mt_out")
    TensorStreamShards.shardBatch(spark, tokDir,
      (0 until 6).map(conv).toDF("doc_id", "text"), out,
      capacity = 16L, batchId = 0L, multiturn = true)
    TensorStreamShards.shardBatch(spark, tokDir,
      (6 until 12).map(conv).toDF("doc_id", "text"), out,
      capacity = 16L, batchId = 1L, multiturn = true)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("bin_id"), col("token_ids"), col("loss_mask"),
          col("seg_starts"), col("seg_lens"))
        .collect().map(r => (
          r.get(0) match {
            case l: Long => l
            case s: scala.collection.Seq[_] => s.head.asInstanceOf[Long]
          },
          r.getSeq[Long](1), r.getSeq[Long](2), r.getSeq[Long](3),
          r.getSeq[Long](4))).toSet
    val decoded = rows(
      graft.sources.TfRecord.readExamples(spark, s"$out/shards",
          Seq("bin_id", "token_ids", "loss_mask", "seg_starts",
            "seg_lens"), Seq.empty)
        .select(element_at(col("bin_id"), 1).as("bin_id"),
          col("token_ids"), col("loss_mask"), col("seg_starts"),
          col("seg_lens")))
    def direct(ids: Seq[Int], batchId: Long) = {
      val docs = ids.map(conv).toDF("doc_id", "text")
      val r = rows(TensorShards.binTensorsMultiturn(
          Bpe.encodeIds(docs, merges, syms),
          Bpe.turnMaskSpans(docs, merges), capacity = 16L)
        .select((col("bin_id") +
          lit(batchId * TensorStreamShards.binStride)).as("bin_id"),
          col("token_ids"), col("loss_mask"), col("seg_starts"),
          col("seg_lens")))
      graft.ops.CacheRegistry.releaseAll()
      r
    }
    assert(decoded == (direct(0 until 6, 0L) ++ direct(6 until 12, 1L)))
    // multiturn masking really engaged: user-turn pieces carry 0s and
    // assistant content carries 1s in every bin
    assert(decoded.exists(_._3.contains(0L)))
    assert(decoded.exists(_._3.contains(1L)))
  }
}
