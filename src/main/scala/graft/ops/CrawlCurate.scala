package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The crawl-to-corpus pipeline, composed end to end from the engine's
  * own operators — the path a 100 TB pretraining ingest actually runs:
  *
  * WARC archives → record parse
  *   → robots.txt compliance gate (optional; broadcast, zero shuffle)
  *   → HTML → text extraction
  *   → URL-level dedup (cheapest first: re-crawls collapse on the
  *     canonical key before any content work)
  *   → quality gates (pure codegen columns)
  *   → exact content dedup → MinHash near-dedup
  *   → benchmark decontamination
  *   → deterministic train/val/test split.
  *
  * Each stage keeps its own scale shape (documented at the operator);
  * the composition adds nothing — in particular text payloads still
  * never ride a dedup shuffle, because every dedup stage resolves to
  * keeper-id semi/anti joins.
  */
object CrawlCurate {

  /** Curate parsed crawl pages `(idCol, urlCol, htmlCol)` against a
    * `benchmark(benchTextCol)` eval set. Returns
    * (id, url, text, quality, split) — one row per kept page. */
  def curatePages(pages: DataFrame, benchmark: DataFrame,
                  idCol: String = "doc_id", urlCol: String = "url",
                  htmlCol: String = "html", benchTextCol: String = "text",
                  minChars: Int = 50, minQuality: Double = 0.3,
                  minhashK: Int = 32, bands: Int = 8,
                  minJaccard: Double = 0.7,
                  robotsRules: Option[DataFrame] = None,
                  splits: Seq[(String, Double)] =
                    Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01)): DataFrame = {
    // 0. Compliance first (when a robots rule table is supplied):
    //    broadcast gate, zero shuffle, drops disallowed pages before
    //    any content work
    val compliant = robotsRules match {
      case Some(rules) =>
        Robots.gate(pages, urlCol, rules).filter(col("allowed"))
          .select(pages.columns.map(col).toIndexedSeq: _*)
      case None => pages
    }
    // Extract ONCE and persist: every later stage hangs off this frame
    // from both sides of a semi/anti join, and without the persist the
    // branch fan-out re-derives the whole regexp chain per reference
    // (measured 28x cpu at 10x corpus before; linear after). Tracked in
    // CacheRegistry — callers release after their terminal action.
    val texted = CacheRegistry.persist(
      compliant.select(col(idCol), col(urlCol),
        HtmlExtract.htmlToText(col(htmlCol)).as("text")))

    // 1. URL-level: one survivor (smallest id) per canonical URL —
    //    semi-join of winner ids, text never shuffles
    val urlWinners = UrlTools
      .dedupByCanonical(texted.select(col(idCol), col(urlCol)), idCol, urlCol)
      .select(col("id").as(idCol))
    val urlKept = texted.join(urlWinners, Seq(idCol), "left_semi")

    // 2. Quality gates: per-row codegen, no shuffle
    val gated = urlKept
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .filter(length(col("text")) >= minChars && col("quality") >= minQuality)

    // 3. Exact then near dedup (near pairs come from banded MinHash —
    //    the signature table is registry-tracked; release after the
    //    terminal action as usual)
    val exact = Dedup.dropExactDuplicates(gated, idCol, "text")
    // near feeds decontamination AND the final anti join — persist so
    // the dedup cascade materializes once
    val near = CacheRegistry.persist(Dedup.dropNearDuplicates(exact, idCol,
      Dedup.minhashNearDups(exact, idCol, "text",
        k = minhashK, bands = bands, minJaccard = minJaccard)))

    // 4. Decontaminate: drop pages sharing any 5-gram with the
    //    benchmark (broadcast shingle set)
    val contaminated = Dedup.decontaminate(near, idCol, "text",
      benchmark, benchTextCol)
      .select(col("id").as(idCol))
    val clean = near.join(contaminated, Seq(idCol), "left_anti")

    // 5. Deterministic split on the id (partition- and engine-stable)
    Sampling.assignSplit(clean, idCol, splits)
      .select(col(idCol), col(urlCol), col("text"), col("quality"),
        col("split"))
  }

  /** The same pipeline from a WARC landing dir: ids parsed from the
    * crawl URI (`…/doc/<id>`), page HTML from the record payload. */
  def curateWarc(spark: SparkSession, warcDir: String,
                 benchmark: DataFrame): DataFrame =
    curatePages(
      graft.sources.Warc.read(spark, warcDir)
        .select(regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1)
          .cast("long").as("doc_id"),
          col("target_uri").as("url"),
          col("content").cast("string").as("html")),
      benchmark)

  /** The full-fidelity record form: WARC record rows hold RAW HTTP
    * responses (Common Crawl's actual layout). Parse status/headers/
    * body ([[graft.sources.Warc.httpResponses]]), keep 2xx pages whose
    * mime is HTML-ish (declared text/html, or undeclared — sniffing is
    * the caller's policy), decode by the DECLARED charset
    * ([[graft.sources.Warc.decodeBody]] — UTF-8 fallback, replacement
    * on corruption), then run the standard [[curatePages]] chain. All
    * three added stages are per-record projections/mapPartitions — no
    * new shuffle enters the composition. */
  def curateHttpRecords(records: DataFrame, benchmark: DataFrame,
                        robotsRules: Option[DataFrame] = None): DataFrame = {
    val resp = graft.sources.Warc.httpResponses(records)
    val pages = graft.sources.Warc.decodeBody(
        resp.filter(col("status").between(200, 299) &&
          (col("mime").isNull || col("mime") === "text/html")),
        "body", "charset", "html")
      .select(regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1)
        .cast("long").as("doc_id"),
        col("target_uri").as("url"), col("html"))
    curatePages(pages, benchmark, robotsRules = robotsRules)
  }

  /** [[curateHttpRecords]] over a WARC landing dir. */
  def curateHttpWarc(spark: SparkSession, warcDir: String,
                     benchmark: DataFrame,
                     robotsRules: Option[DataFrame] = None): DataFrame =
    curateHttpRecords(graft.sources.Warc.read(spark, warcDir),
      benchmark, robotsRules)
}
