package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Streaming corpus curation (beyond the reference, §2.12 as a STREAM):
  * documents land as files in a directory and flow through the same
  * quality-gate + exact-dedup transforms the batch pipeline runs — the
  * training-data analog of [[GridStreamIngest]]'s landing-directory
  * flow. The transform is source-agnostic (DataFrame -> DataFrame), so
  * one definition serves `readStream` (file source + AvailableNow for
  * catch-up runs) and batch frames; CorpusStreamIngestSpec pins
  * stream == batch.
  *
  * Scale shape: every gate is a per-row codegen'd Column (no shuffle);
  * the only stateful step is the content-hash dedup, whose state is one
  * compact hash per distinct kept document. At corpus scale bound the
  * state with a watermark on an arrival timestamp
  * (`dropDuplicatesWithinWatermark`) — duplicates in a landing stream
  * overwhelmingly arrive close together (re-delivered batches, crawler
  * revisits), which is exactly the within-horizon guarantee.
  */
object CorpusStreamIngest {

  /** Quality gate + exact dedup. Keeps documents with at least
    * `minChars` characters, quality score >= `minQuality`, and
    * bigram repetition <= `maxRepetition`; one row per distinct text
    * (content_hash attached for downstream lineage). */
  def curate(docs: DataFrame, minChars: Int = 50,
             minQuality: Double = 0.3,
             maxRepetition: Double = 0.5): DataFrame =
    docs
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .withColumn("repetition", TextFunctions.repetitionRatio(col("text"), 2))
      .filter(length(col("text")) >= minChars &&
        col("quality") >= minQuality &&
        col("repetition") <= maxRepetition)
      .withColumn("content_hash", md5(col("text")))
      .dropDuplicates("content_hash")
}
