package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.{CacheRegistry, Frontier, LinkGraph}

/** Streaming crawl-frontier maintenance — the continuous-crawl twin of
  * [[graft.ops.Frontier]]: fetched pages land as parquet files; each
  * micro-batch extracts their links, merges the NOVEL (page, dst_url)
  * link rows into a standing link store (anti-join increment — the
  * LinkStreamIngest/J5 pattern, which also makes page REDELIVERY a
  * no-op: a re-crawled page's links all anti-join away and the rebuilt
  * frontier rewrites identical rows), refreshes PageRank over the host
  * graph, and rebuilds the prioritized frontier queue from everything
  * seen so far ∪ the standing seed list.
  *
  * State under `stateDir` (parquet):
  *  - `links/`    (doc_id, page_url, dst_url) — append-only, DISTINCT
  *    by the per-batch anti-join (so n_refs counts each page→URL link
  *    once, the stable-under-redelivery definition);
  *  - `frontier/` — the [[Frontier.build]] output, overwritten per
  *    batch (the dispatcher's queue table).
  *
  * Scale shape: per-batch cost is extraction over the BATCH, one
  * anti-join of batch link keys against the store, the host-sized
  * rank refresh, and the frontier rebuild (whose only corpus-sized
  * shuffle is the canonical-URL count over the link store — at
  * cluster scale the link store is bucketed by dst_url so the count
  * reuses its layout). FrontierStreamSpec pins stream == batch and
  * redelivery idempotence.
  */
object FrontierStream {

  /** One micro-batch. `seeds` (url), `rules` (domain, allow, prefix)
    * and `directives` (domain, crawl_delay_ms, ...) are the standing
    * crawl configuration. Exposed for tests and cron-style reruns. */
  def ingestBatch(spark: SparkSession, stateDir: String, pages: DataFrame,
                  seeds: DataFrame, rules: DataFrame, directives: DataFrame,
                  idCol: String = "doc_id", urlCol: String = "url",
                  htmlCol: String = "html", iters: Int = 3,
                  dampingPct: Int = 85): Unit = CacheRegistry.scoped {
    val linksDir = s"$stateDir/links"
    val frontierDir = s"$stateDir/frontier"
    val batchLinks = LinkGraph.extractLinks(pages, idCol, urlCol, htmlCol)
      .select(col(idCol).as("doc_id"), col(urlCol).as("page_url"),
        col("dst_url")).distinct()
    val hasHistory = graft.ops.IndexVersions.pathExists(linksDir)
    val novel = CacheRegistry.persist(
      if (!hasHistory) batchLinks
      else batchLinks.join(spark.read.parquet(linksDir),
        Seq("doc_id", "page_url", "dst_url"), "left_anti"))
    // materialize BEFORE the append: the plan reads the directory it
    // is about to write
    val nNovel = novel.count()
    if (nNovel > 0 || !hasHistory)
      novel.write.mode("append").parquet(linksDir)
    if (nNovel > 0 || !graft.ops.IndexVersions.pathExists(frontierDir)) {
      val stored = spark.read.parquet(linksDir)
      val ranks = LinkGraph.pageRank(
        LinkGraph.hostEdges(stored, "page_url", "dst_url"),
        iters = iters, dampingPct = dampingPct)
      val candidates = stored.select(col("dst_url").as("url"))
        .unionByName(seeds.select(col("url")))
      // already-fetched pages must not re-enqueue: the link store's
      // page_url column IS the crawled set
      Frontier.build(candidates, "url", rules, directives, ranks,
          visited = Some(stored.select(col("page_url"))))
        .write.mode("overwrite").parquet(frontierDir)
    }
  }

  /** Start the stream: parquet pages (doc_id, url, html) landing in
    * `landingDir` flow through [[ingestBatch]].
    * `Trigger.AvailableNow` drains and stops (the cron shape). */
  def start(spark: SparkSession, landingDir: String, stateDir: String,
            checkpointDir: String, seeds: DataFrame, rules: DataFrame,
            directives: DataFrame,
            trigger: Trigger = Trigger.AvailableNow(),
            iters: Int = 3, dampingPct: Int = 85): StreamingQuery =
    spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("url",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("html",
          org.apache.spark.sql.types.StringType))))
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(spark, stateDir, batch, seeds, rules, directives,
          iters = iters, dampingPct = dampingPct)
      }
      .start()
}
