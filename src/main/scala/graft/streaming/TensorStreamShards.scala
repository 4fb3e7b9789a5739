package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.{Bpe, CacheRegistry, IndexVersions, SeenTable, TensorShards}

/** The tensor-shard last mile as a STREAM — documents land as parquet
  * files; each micro-batch encodes them under a FROZEN tokenizer
  * ([[graft.ops.Bpe.loadTokenizer]] — the artifact is trained once and
  * reloaded, never refit, so token ids stay stable across every batch
  * ever processed), composes the loader tensors
  * ([[graft.ops.TensorShards.binTensors]]: token_ids + loss_mask +
  * seg_starts + seg_lens per bin) and appends TFRecord shard files to
  * the output directory. A training loader can start reading shards
  * while the corpus is still arriving.
  *
  * Packing semantics under streaming: chunked packing is defined by a
  * GLOBAL prefix sum over doc order, which a stream cannot know — so
  * bins are packed PER BATCH (each batch's docs in doc-id order) and
  * bin ids are globalized as `batchId * binStride + local_bin`. The
  * trade is at most one underfull bin per batch (same class as
  * packGreedy's one-per-partition trade); every other tensor invariant
  * — sum(seg_lens) == len(token_ids) == len(loss_mask), loss bits on
  * the prompt prefix, EOS separators — is identical to the batch
  * composition, and TensorStreamShardsSpec pins streamed-decode ==
  * batch-decode per wave.
  *
  * Idempotence under redelivery (the [[IvfStreamMaintain]] discipline):
  * a `docs_seen/` id table gates every batch with an anti-join, so the
  * at-least-once file source never writes a document's tensor twice;
  * the id write lands AFTER the shard write — a crash in between
  * re-emits at most one batch of shard files on replay (duplicate
  * shard FILES, never corrupt ones; the documented at-least-once
  * window). All existence checks go through the Hadoop FileSystem.
  */
object TensorStreamShards {

  /** Globalized-bin-id stride: batch b's bins live in
    * [b * stride, b * stride + nBins). 2^20 bins/batch at capacity 512
    * is ~0.5 G tokens per micro-batch before ids could collide. */
  val binStride: Long = 1L << 20

  // the FROZEN artifact never changes under a running stream, so it
  // loads once per tokenizer dir, not once per micro-batch (two
  // bounded driver collects saved per batch)
  private val tokenizerCache =
    scala.collection.concurrent.TrieMap[
      String, (List[(String, String)], List[String])]()

  /** One micro-batch: drop already-sharded doc ids, encode under the
    * frozen tokenizer, compose bin tensors, append TFRecord shards,
    * record the ids. Exposed for tests and cron-style batch reruns.
    * `multiturn = true` masks with the chat-template turn spans
    * ([[graft.ops.Bpe.turnMaskSpans]] +
    * [[graft.ops.TensorShards.binTensorsMultiturn]] — loss on
    * assistant content only) instead of the prompt-prefix rule; every
    * other invariant (packing, globalized bins, idempotence) is
    * identical. */
  def shardBatch(spark: SparkSession, tokenizerDir: String,
                 batch: DataFrame, outDir: String, capacity: Long,
                 batchId: Long, eosId: Option[Long] = None,
                 multiturn: Boolean = false,
                 seenCompactOver: Int = 64): Unit = {
    val seenDir = s"$outDir/docs_seen"
    CacheRegistry.scoped {
      val once = CacheRegistry.persist(batch.dropDuplicates("doc_id"))
      // the gate never shuffles the id history — one column-pruned
      // scan against the broadcast batch ([[SeenTable.novelIds]])
      val novel = CacheRegistry.persist(
        SeenTable.novelIds(once, seenDir, "doc_id"))
      if (!novel.isEmpty) {
        val (merges, syms) = tokenizerCache.getOrElseUpdate(tokenizerDir,
          Bpe.loadTokenizer(spark, tokenizerDir))
        val ids = Bpe.encodeIds(novel, merges, syms)
        // bin-id overflow guard: nothing upstream enforces local
        // bin_id < binStride (a micro-batch past ~0.5 G tokens at
        // capacity 512 would wrap into the NEXT batch's id range and
        // silently corrupt shard addressing). The check rides the
        // globalizing projection itself — per-bin-row, zero extra
        // pass — and fails loudly like the TfRecord shard guard.
        val bins0 =
          if (multiturn)
            TensorShards.binTensorsMultiturn(ids,
              Bpe.turnMaskSpans(novel, merges), capacity, eosId = eosId)
          else
            TensorShards.binTensors(ids,
              Bpe.promptMaskSpans(novel, merges), capacity, eosId = eosId)
        val bins = bins0
          .select((when(col("bin_id") >= 0 && col("bin_id") < binStride,
              col("bin_id") + lit(batchId * binStride))
            .otherwise(raise_error(concat(
              lit("TensorStreamShards: local bin_id "),
              col("bin_id").cast("string"),
              lit(s" outside [0, $binStride) — micro-batch exceeds " +
                "the bin stride; shrink the trigger batch")))))
            .as("bin_id"),
            col("token_ids"), col("loss_mask"), col("seg_starts"),
            col("seg_lens"))
        graft.sources.TfRecord.writeExamples(bins, s"$outDir/shards",
          Seq("bin_id", "token_ids", "loss_mask", "seg_starts",
            "seg_lens"), Seq.empty)
        // one id file per batch (batch-sized coalesce — the fan-in
        // arithmetic the SeenTable threshold assumes; without it the
        // anti-join's shuffle-partition count writes ~32 shards of a
        // few KB each per trigger)
        novel.select(col("doc_id")).coalesce(1)
          .write.mode("append").parquet(seenDir)
        // bounded docs_seen fan-in — the shared stream-maintainer
        // discipline ([[graft.ops.SeenTable]]): without it an
        // unattended stream pays one file open per historical batch
        // in every trigger's anti-join
        SeenTable.compact(spark, seenDir, "doc_id", seenCompactOver)
      }
    }
  }

  /** Start the tensor-shard stream over parquet documents landing in
    * `landingDir` (schema: doc_id long, text string).
    * `Trigger.AvailableNow` drains and stops (the cron shape). The
    * tokenizer at `tokenizerDir` must exist before the first batch —
    * train and [[graft.ops.Bpe.saveTokenizer]] it from a seed corpus
    * first (the freeze discipline). */
  def start(spark: SparkSession, landingDir: String, tokenizerDir: String,
            outDir: String, checkpointDir: String, capacity: Long = 512L,
            trigger: Trigger = Trigger.AvailableNow(),
            eosId: Option[Long] = None,
            multiturn: Boolean = false): StreamingQuery =
    spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        shardBatch(spark, tokenizerDir, batch, outDir, capacity, batchId,
          eosId, multiturn)
      }
      .start()
}
