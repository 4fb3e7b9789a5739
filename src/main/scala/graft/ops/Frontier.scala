package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-frontier composition — the stage that closes the crawl loop
  * the web surface builds toward: candidate URLs (sitemap seeds ∪
  * links extracted from fetched pages) are deduplicated by canonical
  * URL, gated by robots rules ([[Robots.gate]], RFC 9309 wildcards
  * included), annotated with per-domain politeness
  * ([[Robots.parseDirectivesTable]] crawl delay) and host authority
  * ([[LinkGraph.pageRank]] micro-units), and ordered into PER-HOST
  * priority queues.
  *
  * Scale shape: one corpus-sized shuffle — the canonical-URL
  * dedup/count (key + count, no payload). The robots gate is a
  * broadcast join (sites-sized rules collapsed per domain); rank and
  * delay annotations broadcast too (host- and domain-sized). Priority
  * is a PER-HOST window (row_number over the host partition, one
  * host-keyed shuffle) — deliberately NOT a global ordering, which
  * would funnel the frontier through one partition: a dispatcher
  * dequeues per-host queues paced by `crawl_delay_ms`, so
  * (rank_micro DESC, host_pos ASC) is the global schedule without a
  * global sort ever running.
  *
  * Reference anchor: rastercube has no web surface; this composes the
  * crawl-ingestion capability the brief asks for (sitemap seeds +
  * link graph + robots compliance → prioritized fetch queue).
  */
object Frontier {

  /** Build the frontier queue.
    *
    * @param candidates any-multiplicity URL rows (seeds ∪ extracted
    *                   links); multiplicity becomes `n_refs`, the
    *                   in-link-weight priority signal
    * @param rules      robots rule table (domain, allow, prefix) from
    *                   [[Robots.parseRulesTable]]
    * @param directives (domain, crawl_delay_ms, ...) from
    *                   [[Robots.parseDirectivesTable]] (integer
    *                   MILLISECONDS — fractional `Crawl-delay: 0.5`
    *                   spellings parse to 500); NULL delay →
    *                   `defaultDelayMs`
    * @param hostRanks  (host, rank_micro) authority table (PageRank /
    *                   TrustRank); unknown hosts rank 0
    * @param visited    URLs already fetched (any spelling — they are
    *                   canonicalized here); dropped from the queue by
    *                   an anti-join on the canonical key AFTER the
    *                   count (so n_refs still reflects every sighting,
    *                   keys only ride the shuffle)
    * @return one row per allowed canonical URL:
    *         (url, host, domain, n_refs, rank_micro, crawl_delay_ms,
    *         host_pos) with host_pos the 1-based position in the
    *         host's queue (n_refs DESC, url ASC — deterministic)
    */
  def build(candidates: DataFrame, urlCol: String, rules: DataFrame,
            directives: DataFrame, hostRanks: DataFrame,
            defaultDelayMs: Long = 1000L,
            visited: Option[DataFrame] = None): DataFrame = {
    val allCounted = candidates
      .select(UrlTools.canonicalize(col(urlCol)).as("url"))
      .groupBy(col("url")).agg(count(lit(1)).as("n_refs"))
    val counted = visited match {
      case None => allCounted
      case Some(v) => allCounted.join(
        v.select(UrlTools.canonicalize(col(v.columns.head)).as("url")),
        Seq("url"), "left_anti")
    }
    val gated = Robots.gate(counted, "url", rules)
      .filter(col("allowed")).drop("allowed", "path")
    val annotated = gated
      .withColumn("host", UrlTools.hostOf(col("url")))
      .join(broadcast(hostRanks), Seq("host"), "left")
      .withColumn("rank_micro", coalesce(col("rank_micro"), lit(0L)))
      .join(broadcast(
        directives.select(col("domain"), col("crawl_delay_ms"))),
        Seq("domain"), "left")
      .withColumn("crawl_delay_ms",
        coalesce(col("crawl_delay_ms"), lit(defaultDelayMs)))
    annotated.withColumn("host_pos",
      row_number().over(Window.partitionBy(col("host"))
        .orderBy(col("n_refs").desc, col("url"))))
      .select(col("url"), col("host"), col("domain"), col("n_refs"),
        col("rank_micro"), col("crawl_delay_ms"), col("host_pos"))
  }

  /** Politeness schedule over a [[build]] output: each URL's planned
    * fetch offset inside its host queue — (host_pos − 1) ·
    * crawl_delay_ms MILLISECONDS (integer math; fractional-second
    * robots delays schedule exactly), the earliest a crawler honoring
    * the delay can issue the fetch relative to the host queue's start.
    * Pure integer codegen projection (no shuffle); a dispatcher adds
    * its wall-clock epoch per host. */
  def schedule(frontier: DataFrame): DataFrame =
    frontier.withColumn("fetch_at_ms",
      (col("host_pos") - 1).cast("long") * col("crawl_delay_ms"))
}
