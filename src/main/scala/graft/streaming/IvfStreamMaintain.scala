package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.{CacheRegistry, IndexVersions, Similarity}

/** A standing IVF vector index maintained under a STREAMING embedding
  * corpus — the vector twin of [[IndexStreamMaintain]]: embedding rows
  * land as parquet files in a directory; each micro-batch assigns the
  * novel vectors against the standing quantizer and appends them into
  * the index's cell partitions ([[graft.ops.Similarity
  * .appendToIvfIndex]] — pure parquet appends, never a rewrite), so
  * probes stay live and consistent while the index grows. File fan-in
  * is bounded by the same threshold policy the text index uses:
  * `compactOver = Some(n)` compacts any cell exceeding n files inside
  * the batch hook ([[graft.ops.Similarity.compactIvfCells]]), so an
  * unattended stream runs indefinitely without probe-latency decay
  * (IvfStreamMaintainSpec pins the bound across ~20 micro-batches).
  *
  * Idempotence under redelivery: a `vecs_seen/` id table — seeded on
  * first contact with the ids the index ALREADY stores, then
  * accumulating per batch — gates every batch with an anti-join, so a
  * re-delivered batch (the at-least-once file source after a failure)
  * contributes nothing, whether its ids arrived by stream or by the
  * initial build. The seen table carries ONLY ids; the
  * id write lands AFTER the index append — a crash in between
  * re-appends at most one batch on replay (visible as duplicate
  * candidate rows until a dedup probe or rebuild; batch-id-keyed file
  * names would close even that window — the same at-least-once trade
  * [[IndexStreamMaintain]] documents). All existence checks and the
  * seed resolve through the index path's Hadoop FileSystem — an
  * hdfs:// or s3a:// index dir engages the same gates a local one does
  * (java.io.File would silently report nothing exists and break both
  * contracts).
  *
  * Quantizer drift under an unattended stream: cells drift as the
  * stream's distribution drifts (measured: COVERAGE.md §ANN recall
  * drift rows). With `canary` set, every `canaryEveryN`-th batch runs
  * [[graft.ops.Similarity.maintainIvfIndex]] — recall canary, and a
  * REBUILD with a freshly fit quantizer when recall falls below
  * `minRecall`. The rebuild is an atomic version flip
  * ([[graft.ops.IndexVersions]]), so probes running concurrently with
  * the stream never see a torn layout — which is what makes it safe to
  * run from the stream's own batch hook at all. `vecs_seen` is
  * version-independent (ids survive a rebuild), so the idempotence
  * gate is unaffected.
  */
object IvfStreamMaintain {

  private def fsOf(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val (fs, p) = fsOf(spark, dir)
    fs.exists(p)
  }

  /** One micro-batch: drop already-indexed ids, append the rest into
    * the standing cell partitions, record their ids, then compact any
    * cell over the file threshold. Exposed for tests and cron-style
    * batch reruns. The batch must carry (vec_id, embedding[, label —
    * required iff the index stores labels]), with column TYPES matching
    * the index layout (appends are uncast parquet writes).
    *
    * On first sight of the index, `vecs_seen/` is SEEDED with the ids
    * already stored in it (the initial build's vectors) — so the
    * idempotence contract covers build-time ids too, not just streamed
    * ones; without the seed, a landing file carrying a built id would
    * append a permanent duplicate row no compaction removes.
    *
    * `vecs_seen` fan-in is bounded by the shared [[graft.ops
    * .SeenTable]] compactor (`seenCompactOver` files) — the gate's
    * anti-join re-reads the whole id history every trigger, so without
    * consolidation an unattended stream pays one file open per
    * historical batch per trigger (the cell-partition fan-in decay,
    * relocated to the bookkeeping table). */
  def maintainBatch(spark: SparkSession, indexDir: String,
                    batch: DataFrame,
                    compactOver: Option[Int] = None,
                    seenCompactOver: Int = 64): Unit = {
    val seenDir = s"$indexDir/vecs_seen"
    val assignDir = s"${IndexVersions.resolve(indexDir)}/assignments"
    if (!exists(spark, seenDir) && exists(spark, assignDir)) {
      spark.read.parquet(assignDir)
        .select(col("corpus_id").as("vec_id"))
        .write.parquet(seenDir)
    }
    // dropDuplicates first: redelivered copies can land in the SAME
    // micro-batch as their original (AvailableNow drains several file
    // waves into one batch) — the history anti-join can't see those.
    // The gate itself never shuffles the id history: one column-pruned
    // scan against the broadcast batch ([[graft.ops.SeenTable
    // .novelIds]]).
    CacheRegistry.scoped {
      val once = CacheRegistry.persist(batch.dropDuplicates("vec_id"))
      val novel = CacheRegistry.persist(
        graft.ops.SeenTable.novelIds(once, seenDir, "vec_id"))
      if (!novel.isEmpty) {
        Similarity.appendToIvfIndex(novel, indexDir,
          compactOver = compactOver)
        // one id file per batch (batch-sized coalesce — the fan-in
        // arithmetic the SeenTable threshold assumes)
        novel.select(col("vec_id")).coalesce(1)
          .write.mode("append").parquet(seenDir)
        graft.ops.SeenTable.compact(spark, seenDir, "vec_id",
          seenCompactOver)
      }
    }
  }

  /** Start the index-maintenance stream over parquet embeddings
    * landing in `landingDir`. `Trigger.AvailableNow` drains and stops
    * (the cron shape). The declared landing schema must MATCH the
    * standing index's layout exactly (appends are uncast): the default
    * is (vec_id long, embedding array<float>[, label string] with
    * `withLabel`); an index built over other types (double vectors,
    * int labels — the fixture embeddings' label is int) passes its own
    * `schema`, which takes precedence over `withLabel`.
    *
    * `canary` + `minRecall` arm the drift guard: after the append of
    * every `canaryEveryN`-th batch (counted by the stream's batchId,
    * so redelivered batches don't double-probe), the canary recall is
    * measured and a version-flip rebuild triggered below the floor —
    * see the class doc. `pruneKeep` defaults to Some(2) here (unlike
    * the batch API): an unattended stream rebuilds unattended, so old
    * snapshots are GC'd down to current + previous after each flip. */
  def start(spark: SparkSession, landingDir: String, indexDir: String,
            checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow(),
            withLabel: Boolean = false,
            compactOver: Option[Int] = None,
            schema: Option[org.apache.spark.sql.types.StructType] = None,
            canary: Option[DataFrame] = None,
            canaryEveryN: Int = 10,
            minRecall: Double = 0.0,
            canaryK: Int = 10,
            canaryNProbe: Int = 4,
            pruneKeep: Option[Int] = Some(2),
            seenCompactOver: Int = 64
           ): StreamingQuery = {
    require(canaryEveryN > 0, s"canaryEveryN $canaryEveryN")
    val fields = Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))) ++
      (if (withLabel) Seq(org.apache.spark.sql.types.StructField("label",
        org.apache.spark.sql.types.StringType)) else Nil)
    spark.readStream
      .schema(schema.getOrElse(
        org.apache.spark.sql.types.StructType(fields)))
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        maintainBatch(spark, indexDir, batch, compactOver, seenCompactOver)
        canary.foreach { q =>
          if (batchId % canaryEveryN == (canaryEveryN - 1).toLong)
            Similarity.maintainIvfIndex(spark, indexDir, q, minRecall,
              k = canaryK, nProbe = canaryNProbe, pruneKeep = pruneKeep)
        }
      }
      .start()
  }
}
