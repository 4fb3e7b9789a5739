package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.{CacheRegistry, TextSearch}

/** A standing BM25 inverted index maintained under a STREAMING corpus —
  * the search-index twin of [[CorpusStreamIngest]]: documents land as
  * parquet files in a directory; each micro-batch appends one index
  * segment ([[graft.ops.TextSearch.appendToInvertedIndex]] — pure
  * parquet appends, never a rewrite), so probes against the index stay
  * live and consistent while it grows. Segment fan-in is bounded two
  * ways: periodic [[graft.ops.TextSearch.compactInvertedIndex]] calls
  * (the cron shape), or the built-in `compactOver` threshold policy —
  * buckets exceeding n files compact inside the batch hook itself, so
  * an unattended stream can run indefinitely without fan-in growth
  * (IndexStreamMaintainSpec pins the bound across ~20 micro-batches).
  *
  * Idempotence under redelivery: a `docs_seen/` id table accumulates
  * alongside the index and each batch anti-joins against it first, so
  * a re-delivered batch (streaming's at-least-once file source after a
  * failure) contributes nothing. The seen table carries ONLY ids, and
  * the gate never shuffles it ([[graft.ops.SeenTable.novelIds]]: one
  * column-pruned history scan against the broadcast batch).
  * The id write lands AFTER the segment writes: a crash in between
  * re-indexes at most one batch on replay (visible as doubled tf/df
  * until the next compaction re-merge; batch-id-keyed segment names
  * would close even that window — same trade every at-least-once
  * sink documents).
  */
object IndexStreamMaintain {

  /** One micro-batch: drop already-indexed ids, append the rest as an
    * index segment, then record their ids. Exposed for tests and for
    * cron-style batch reruns.
    *
    * Auto-compaction policy: with `compactOver = Some(n)`, any bucket
    * whose postings partition has accumulated more than n parquet
    * files after this batch's append is compacted IN THIS batch hook
    * (TextSearch.compactInvertedIndex on exactly those buckets), so
    * probe fan-in stays bounded no matter how long the stream runs —
    * without it segments pile up one per batch forever. The trigger
    * check is a directory listing of nBuckets partition dirs (bounded
    * by the layout, never by data), and compaction cost is bounded by
    * the chosen buckets' postings, the compact contract.
    *
    * The `docs_seen` id table gets the same treatment via the shared
    * [[graft.ops.SeenTable]] compactor (`seenCompactOver` files): the
    * gate's anti-join re-reads the whole id history every trigger, so
    * without consolidation an unattended stream pays one file open per
    * historical batch per trigger — the index-segment fan-in decay,
    * relocated to the bookkeeping table. */
  def maintainBatch(spark: SparkSession, indexDir: String,
                    batch: DataFrame, nBuckets: Int = 64,
                    compactOver: Option[Int] = None,
                    seenCompactOver: Int = 64): Unit = {
    val seenDir = s"$indexDir/docs_seen"
    // dropDuplicates first: redelivered copies can land in the SAME
    // micro-batch as their original (AvailableNow drains several file
    // waves into one batch) — the history anti-join can't see those.
    // The gate itself never shuffles the id history: one column-pruned
    // scan against the broadcast batch ([[graft.ops.SeenTable
    // .novelIds]]).
    val once = CacheRegistry.persist(batch.dropDuplicates("doc_id"))
    val novel = CacheRegistry.persist(
      graft.ops.SeenTable.novelIds(once, seenDir, "doc_id"))
    try {
      if (novel.isEmpty) return
      TextSearch.appendToInvertedIndex(novel, indexDir, nBuckets = nBuckets)
      // one id file per batch (batch-sized coalesce — the fan-in
      // arithmetic the SeenTable threshold assumes; without it the
      // anti-join's shuffle-partition count writes ~32 shards of a
      // few KB each per trigger)
      novel.select(col("doc_id")).coalesce(1)
        .write.mode("append").parquet(seenDir)
      graft.ops.SeenTable.compact(spark, seenDir, "doc_id", seenCompactOver)
      compactOver.foreach { threshold =>
        val over = bucketsOverThreshold(indexDir, threshold)
        if (over.nonEmpty)
          TextSearch.compactInvertedIndex(spark, indexDir, Some(over))
      }
    } finally CacheRegistry.releaseAll()
  }

  /** Buckets whose postings partition holds more than `threshold`
    * parquet files — the compaction trigger set. */
  private[streaming] def bucketsOverThreshold(indexDir: String,
                                              threshold: Int): Seq[Int] = {
    // Hadoop FS listing (not java.io.File) of the CURRENT version's
    // postings partitions — bounded by the bucket layout, never data
    val postings = new org.apache.hadoop.fs.Path(
      s"${graft.ops.IndexVersions.resolve(indexDir)}/postings")
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val fs = postings.getFileSystem(conf)
    if (!fs.exists(postings)) Nil
    else fs.listStatus(postings).toSeq
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith("term_bucket="))
      .filter(d => fs.listStatus(d.getPath)
        .count(_.getPath.getName.endsWith(".parquet")) > threshold)
      .map(_.getPath.getName.stripPrefix("term_bucket=").toInt)
      .sorted
  }

  /** Start the index-maintenance stream over parquet documents landing
    * in `landingDir`. `Trigger.AvailableNow` drains and stops (the
    * cron shape). */
  def start(spark: SparkSession, landingDir: String, indexDir: String,
            checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow(),
            nBuckets: Int = 64,
            compactOver: Option[Int] = None,
            seenCompactOver: Int = 64): StreamingQuery =
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
      .foreachBatch { (batch: DataFrame, _: Long) =>
        maintainBatch(spark, indexDir, batch, nBuckets, compactOver,
          seenCompactOver)
      }
      .start()
}
