package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction for crawled corpora (the trafilatura /
  * jusText step of a web-scale training pipeline): strip markup, decode
  * entities, and drop boilerplate BLOCKS (nav bars, footers, link
  * farms) by anchor density — the front end between a WARC archive
  * ([[graft.sources.Warc]]) and the text curation surface
  * (LineFilter / Dedup / TermStats).
  *
  * Scale shape: every step is a codegen'd `regexp_replace` / `replace`
  * Column chain evaluated inside the scan projection — no UDFs, no
  * shuffles for the document-level path; the block-level path pays the
  * one (id, idx, line) reassembly shuffle LineFilter also pays, with
  * the raw HTML never riding it.
  *
  * Every regex is written in the RE2 ∩ java.util.regex dialect (inline
  * `(?is)` flags, lazy quantifiers, no lookaround / backrefs) so a
  * DuckDB oracle replays the exact chain — the correctness entries
  * (`html_extract`, `html_block_filter`) are hash-checked end to end.
  *
  * Reference anchor: rastercube ships no HTML pass (its sources are
  * rasters); this extends the corpus-ingestion surface the brief asks
  * for beyond the reference's own operators.
  */
object HtmlExtract {

  /** Closing tags that end a visual block — each becomes a newline so
    * block structure survives tag stripping. `<br>` is its own rule
    * (self-closing, any attribute spelling). */
  private val blockCloseRe =
    "(?i)</(p|div|li|h[1-6]|tr|ul|ol|table|blockquote|section|article|header|footer|nav|title)>"

  /** Comments, then whole script/style elements (content included). */
  def dropInvisible(html: Column): Column = {
    val noComments = regexp_replace(html, "(?s)<!--.*?-->", "")
    val noScript =
      regexp_replace(noComments, "(?is)<script[^>]*>.*?</script>", "")
    regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", "")
  }

  /** Mark block boundaries as newlines (markup otherwise retained —
    * [[contentBlocks]] needs anchor markup per line for its density
    * rule). */
  def markBlocks(html: Column): Column = {
    val brs = regexp_replace(html, "(?i)<br[^>]*>", "\n")
    regexp_replace(brs, blockCloseRe, "\n")
  }

  /** Remove every remaining tag. */
  def stripTags(s: Column): Column = regexp_replace(s, "<[^>]*>", "")

  /** The entities the corpus path decodes (the named core + the two
    * numeric spellings of apostrophe); `&amp;` is decoded LAST so
    * `&amp;lt;` correctly yields the literal text `&lt;`. */
  def decodeEntities(s: Column): Column = {
    val steps: Seq[(String, String)] = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&#x27;" -> "'",
      "&copy;" -> "©", "&amp;" -> "&")
    // literal replace, not regexp_replace: no regex scan per entity,
    // and the DuckDB oracle's replace() chain is the exact same op
    steps.foldLeft(s) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to))
    }
  }

  /** Collapse runs of spaces/tabs/CRs, trim each line, collapse blank
    * lines, trim the document. */
  def collapseWs(s: Column): Column = {
    val sp = regexp_replace(s, "[ \\t\\r]+", " ")
    val edges = regexp_replace(sp, " ?\\n ?", "\n")
    val squeezed = regexp_replace(edges, "\\n+", "\n")
    // trim() strips only 0x20 — edge newlines need their own pass
    trim(regexp_replace(squeezed, "^\\n+|\\n+$", ""))
  }

  /** The full document-level chain: invisible elements out, block
    * boundaries to newlines, tags stripped, entities decoded,
    * whitespace collapsed. One codegen projection per document. */
  def htmlToText(html: Column): Column =
    collapseWs(decodeEntities(stripTags(markBlocks(dropInvisible(html)))))

  /** `<title>` text (first match), entity-decoded; NULL when absent. */
  def titleOf(html: Column): Column = {
    val t = regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)
    when(length(t) > 0, trim(decodeEntities(t)))
  }

  /** Document-level extraction: (id, title, n_anchors, text_clean).
    * `n_anchors` (the `<a` open-tag count) feeds downstream link-spam
    * gates without a second parse. */
  /** Value of `<meta name="..." content="...">` for one name — both
    * attribute orders (name-first and content-first) occur in organic
    * markup, so two extractions coalesce (first non-empty wins).
    * Entity-decoded, trimmed, NULL when absent. RE2 ∩ java.util.regex
    * so the DuckDB oracle replays exactly. */
  def metaOf(html: Column, name: String): Column = {
    val nameFirst = regexp_extract(html,
      s"""(?is)<meta\\s[^>]*name\\s*=\\s*"$name"[^>]*content\\s*=\\s*"([^"]*)"""", 1)
    val contentFirst = regexp_extract(html,
      s"""(?is)<meta\\s[^>]*content\\s*=\\s*"([^"]*)"[^>]*name\\s*=\\s*"$name"""", 1)
    val v = trim(decodeEntities(
      when(length(nameFirst) > 0, nameFirst).otherwise(contentFirst)))
    when(length(v) > 0, v)
  }

  /** The page's `<link rel="canonical" href="...">` target — the
    * publisher-declared page identity that OVERRIDES URL-level dedup
    * keys in a real pipeline (syndicated copies declare the original).
    * Both attribute orders handled; NULL when absent. */
  def canonicalLinkOf(html: Column): Column = {
    val relFirst = regexp_extract(html,
      """(?is)<link\s[^>]*rel\s*=\s*"canonical"[^>]*href\s*=\s*"([^"]*)"""", 1)
    val hrefFirst = regexp_extract(html,
      """(?is)<link\s[^>]*href\s*=\s*"([^"]*)"[^>]*rel\s*=\s*"canonical"""", 1)
    val v = trim(when(length(relFirst) > 0, relFirst).otherwise(hrefFirst))
    when(length(v) > 0, v)
  }

  def extract(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val html = col(htmlCol)
    df.select(col(idCol).as("id"),
      titleOf(html).as("title"),
      regexp_count(html, lit("(?is)<a[\\s>]")).as("n_anchors"),
      htmlToText(html).as("text_clean"))
  }

  /** Block-level boilerplate filter (jusText-lite): split the document
    * at block boundaries, score each block's ANCHOR DENSITY — the
    * fraction of its characters inside `<a …>…</a>` elements, markup
    * included — on the raw markup line, and keep blocks that (a) have
    * any text after stripping and (b) are not anchor-dominated
    * (density*100 <= maxAnchorPct; integer arithmetic so engines
    * agree). Output: (id, n_blocks, n_kept, text_content) with blocks
    * reassembled in order, NULL when nothing survives. */
  def contentBlocks(df: DataFrame, idCol: String, htmlCol: String,
                    maxAnchorPct: Int = 50): DataFrame = {
    val prepped = df.select(col(idCol).as("id"),
      markBlocks(dropInvisible(col(htmlCol))).as("marked"))
    val lines = prepped.select(col("id"),
      posexplode_outer(split(col("marked"), "\\n")).as(Seq("block_idx", "block")))
    val anchorless = regexp_replace(col("block"), "(?is)<a[^>]*>.*?</a>", "")
    val text = collapseWs(decodeEntities(stripTags(col("block"))))
    val scored = lines
      .withColumn("anchor_chars", length(col("block")) - length(anchorless))
      .withColumn("text", text)
      .withColumn("keep",
        length(col("text")) > 0 &&
          col("anchor_chars") * 100 <= length(col("block")) * maxAnchorPct)
    scored.groupBy(col("id"))
      .agg(
        sum(when(length(col("text")) > 0, 1L).otherwise(0L)).as("n_blocks"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_sort(collect_list(when(col("keep"),
          struct(col("block_idx"), col("text"))))).as("kept"))
      .select(col("id"), col("n_blocks"), col("n_kept"),
        when(col("n_kept") > 0,
          array_join(transform(col("kept"), k => k.getField("text")), "\n"))
          .as("text_content"))
  }
}
