package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.TextFunctions
import graft.ops.{CacheRegistry, Dedup}

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
             maxRepetition: Double = 0.5,
             blocklist: Seq[String] = Nil): DataFrame = {
    val gated = docs
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .withColumn("repetition", TextFunctions.repetitionRatio(col("text"), 2))
      .filter(length(col("text")) >= minChars &&
        col("quality") >= minQuality &&
        col("repetition") <= maxRepetition)
    val blocked =
      if (blocklist.isEmpty) gated
      else gated.filter(!TextFunctions.blocklistHit(col("text"), blocklist))
    blocked
      .withColumn("content_hash", md5(col("text")))
      .dropDuplicates("content_hash")
  }

  // ---- incremental NEAR-duplicate curation --------------------------

  /** MinHash estimate of Jaccard similarity from two signature arrays:
    * the fraction of equal components. */
  private def estJaccard(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / size(a)

  /** One micro-batch of incremental near-duplicate curation — the
    * `foreachBatch` target of [[startNear]], exposed for tests and for
    * cron-style batch reruns.
    *
    * Semantics: quality gates + exact dedup ([[curate]]) first; then a
    * document is KEPT iff it is not a near-duplicate (any-band LSH
    * collision AND signature-estimated Jaccard >= `minEstJaccard`) of
    * any previously KEPT document, with ties inside a micro-batch
    * resolved by the batch operator's cluster semantics (pairs ->
    * connected components -> lowest id survives, exactly
    * [[graft.ops.Dedup.dropNearDuplicates]]). The kept corpus therefore
    * carries a standing invariant: NO kept pair collides above the
    * threshold — each batch only ever adds documents independent of
    * everything already kept. Across batches the policy is
    * first-arrival-wins (the online greedy rule every production
    * ingest-time deduper uses); when all data lands in one batch it
    * degenerates to the batch operator exactly.
    *
    * State under `stateDir` (all parquet, append-only):
    * `kept/` (doc_id, text, content_hash) — the curated corpus;
    * `sigs/` (id, sig) and `bands/` (id, band_id, band_hash) — the
    * MinHash index of the kept corpus. Incoming batches probe the index
    * with a (band_id, band_hash)-keyed equi-join — the history is
    * scanned but its TEXT never is (the index tables carry hashes
    * only), and no shuffle ever carries document payloads: kept rows
    * re-attach by id at the end. At cluster scale the band index is a
    * bucketed table on (band_id, band_hash) and the probe is a
    * shuffle-free co-located join.
    *
    * Verification against history uses the SIGNATURE estimate (the
    * standard online-LSH rule): exact shingle Jaccard would require
    * retaining every kept document's shingle set. Identical re-delivered
    * texts estimate 1.0, so redelivery is idempotent.
    */
  def curateNearBatch(spark: SparkSession, stateDir: String,
                      batch: DataFrame,
                      k: Int = 32, bands: Int = 8, shingleSize: Int = 3,
                      minEstJaccard: Double = 0.5,
                      minChars: Int = 50, minQuality: Double = 0.3,
                      maxRepetition: Double = 0.5): Unit = {
    val keptDir = s"$stateDir/kept"
    val sigDir = s"$stateDir/sigs"
    val bandDir = s"$stateDir/bands"
    val curated = CacheRegistry.persist(
      curate(batch, minChars, minQuality, maxRepetition)
        .select(col("doc_id"), col("text"), col("content_hash")))
    try {
      if (curated.isEmpty) return
      val (sigs0, banded0) =
        Dedup.buildMinhashIndex(curated, "doc_id", "text", k, bands,
          shingleSize)
      val sigs = CacheRegistry.persist(sigs0)
      val banded = CacheRegistry.persist(banded0)
      val hasHistory = graft.ops.IndexVersions.pathExists(bandDir)
      // 1) drop incoming docs near-duplicating the KEPT history — the
      //    shared probe ([[graft.ops.Dedup.nearDupsAgainstIndex]]):
      //    band-collision candidates carry keys + ids only, then the
      //    signature-estimate confirm
      val vsHistory =
        if (!hasHistory) sigs
        else {
          val dups = Dedup.nearDupsAgainstIndex(sigs, banded,
            spark.read.parquet(sigDir), spark.read.parquet(bandDir),
            minEstJaccard)
          sigs.join(dups, Seq("id"), "left_anti")
        }
      // 2) within-batch near-dedup among the history survivors — the
      //    batch operator's shape: band self-join on keys only, est
      //    confirm, connected components, lowest id per cluster survives
      val sb = banded.join(vsHistory.select(col("id")), "id")
      val pairs = sb.select(col("band_id"), col("band_hash"),
          col("id").as("id_a"))
        .join(sb.select(col("band_id"), col("band_hash"),
          col("id").as("id_b")), Seq("band_id", "band_hash"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()
        .join(vsHistory.select(col("id").as("id_a"), col("sig").as("sig_a")),
          "id_a")
        .join(vsHistory.select(col("id").as("id_b"), col("sig").as("sig_b")),
          "id_b")
        .filter(estJaccard(col("sig_a"), col("sig_b")) >= minEstJaccard)
        .select(col("id_a"), col("id_b"))
      val losers = Dedup.clusterDuplicates(pairs)
        .filter(col("id") =!= col("cluster_id")).select(col("id"))
      val keptIds = CacheRegistry.persist(
        vsHistory.select(col("id")).join(losers, Seq("id"), "left_anti"))
      // 3) append the survivors and their index rows
      curated.join(keptIds, col("doc_id") === col("id")).drop("id")
        .write.mode("append").parquet(keptDir)
      sigs.join(keptIds, "id").write.mode("append").parquet(sigDir)
      banded.join(keptIds, "id").write.mode("append").parquet(bandDir)
    } finally CacheRegistry.releaseAll()
  }

  /** Start the incremental near-dedup stream: parquet documents landing
    * in `landingDir` flow through [[curateNearBatch]]; the curated
    * corpus and its MinHash index accumulate under `stateDir`.
    * `Trigger.AvailableNow` drains and stops (the cron shape). */
  /** The full crawl front end as a STREAM: WARC archives land in
    * `landingDir`, each micro-batch parses records
    * ([[graft.sources.Warc.readStream]]), extracts text from the HTML
    * payloads ([[graft.ops.HtmlExtract.htmlToText]] — one codegen
    * projection, stateless), and runs the same [[curate]] gates +
    * exact dedup as the batch pipeline; kept docs append to `outDir`
    * parquet. doc ids come from the crawl URI (`…/doc/<id>`).
    *
    * The only stateful operator is curate's content-hash
    * dropDuplicates — first-arrival-wins across micro-batches, so a
    * re-delivered archive (crawler retry) adds nothing. Stream == batch
    * is pinned by WarcStreamSpec. */
  def startWarcCurate(spark: SparkSession, landingDir: String,
                      outDir: String, checkpointDir: String,
                      trigger: Trigger = Trigger.AvailableNow(),
                      minChars: Int = 50, minQuality: Double = 0.3,
                      maxRepetition: Double = 0.5): StreamingQuery =
    curate(
      graft.sources.Warc.readStream(spark, landingDir)
        .select(regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1)
          .cast("long").as("doc_id"),
          graft.ops.HtmlExtract.htmlToText(col("content").cast("string"))
            .as("text")),
      minChars = minChars, minQuality = minQuality,
      maxRepetition = maxRepetition)
      .select(col("doc_id"), col("text"), col("content_hash"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .format("parquet").option("path", outDir)
      .start()

  /** LM-gated streaming curation: documents landing in `landingDir`
    * are scored per micro-batch against a STANDING persisted
    * Stupid-Backoff model ([[graft.ops.NgramLm.trainModel]] — trained
    * once on a reference corpus, never retrained in the loop) and rows
    * scoring at least `minScore` append to `outDir` as
    * (doc_id, text, lm_bo_score). The per-batch work is exactly the
    * batch gate's: one trigram projection + the distinct-context
    * backoff join against the model count tables — stateless across
    * batches (the model IS the state, and it is read-only), so
    * stream == batch row-for-row; NgramLmStreamSpec pins it.
    * `foreachBatch` because scoring aggregates per doc — the standard
    * shape for join+agg transforms on a stream (same as
    * [[curateNearBatch]]). */
  def startLmGate(spark: SparkSession, landingDir: String,
                  modelDir: String, outDir: String, checkpointDir: String,
                  minScore: Double,
                  trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
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
        // scoped, not releaseAll: drop only the caches registered
        // inside this scope, so a query whose caches PRE-DATE the
        // batch keeps them (a cache registered by a concurrent thread
        // MID-batch is not protected — scoped snapshot-diffs the
        // shared registry, it does not track per-thread ownership)
        CacheRegistry.scoped {
          graft.ops.NgramLm
            .scoreFilter(spark, modelDir, batch, minScore)
            .select(col("doc_id"), col("text"), col("lm_bo_score"))
            .write.mode("append").parquet(outDir)
        }
      }
      .start()

  def startNear(spark: SparkSession, landingDir: String, stateDir: String,
                checkpointDir: String,
                trigger: Trigger = Trigger.AvailableNow(),
                k: Int = 32, bands: Int = 8, shingleSize: Int = 3,
                minEstJaccard: Double = 0.5): StreamingQuery =
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
        curateNearBatch(spark, stateDir, batch, k = k, bands = bands,
          shingleSize = shingleSize, minEstJaccard = minEstJaccard)
      }
      .start()
}
