package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** sitemaps.org XML parsing — the frontier-seeding complement of
  * [[Robots.parseDirectivesTable]] (robots.txt names the sitemap
  * files; this extracts the page URLs they list). Handles both
  * document kinds: `<urlset>` (pages, optional `<lastmod>` /
  * `<changefreq>` / `<priority>` ignored beyond lastmod) and
  * `<sitemapindex>` (nested sitemap files — a crawler enqueues those
  * for another fetch round, flagged here via `is_index`).
  *
  * Scale shape: one codegen regexp projection + one generator per
  * sitemap document — the XML never rides a shuffle; the sitemap
  * table is sites-sized, not corpus-sized. Regexes stay in the
  * RE2 ∩ java.util.regex dialect so a DuckDB oracle replays the
  * extraction exactly (the engine-wide rule); entity decoding reuses
  * the HTML chain ([[HtmlExtract.decodeEntities]] — sitemap `<loc>`
  * values XML-escape `&` as `&amp;`).
  */
object Sitemaps {

  private val blockRe = "(?is)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>"
  private val locRe = "(?is)<loc>\\s*(.*?)\\s*</loc>"
  private val lastmodRe = "(?is)<lastmod>\\s*(.*?)\\s*</lastmod>"

  /** One row per `<url>`/`<sitemap>` entry of every sitemap document:
    * (idCol, url, lastmod, is_index) — `url` entity-decoded and
    * trimmed, `lastmod` NULL when the entry carries none, `is_index`
    * true when the DOCUMENT is a `<sitemapindex>` (its entries are
    * sitemap files to fetch, not pages). Entries without a `<loc>`
    * are dropped. */
  def urls(sitemaps: DataFrame, idCol: String,
           xmlCol: String): DataFrame = {
    val isIndex = lower(col(xmlCol)).contains("<sitemapindex")
    sitemaps
      .select(col(idCol), isIndex.as("is_index"),
        explode(regexp_extract_all(col(xmlCol), lit(blockRe), lit(1)))
          .as("entry"))
      .select(col(idCol),
        HtmlExtract.decodeEntities(
          regexp_extract(col("entry"), locRe, 1)).as("url"),
        when(length(regexp_extract(col("entry"), lastmodRe, 1)) > 0,
          regexp_extract(col("entry"), lastmodRe, 1)).as("lastmod"),
        col("is_index"))
      .filter(length(col("url")) > 0)
  }
}
