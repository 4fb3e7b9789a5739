package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{HtmlExtract, UrlTools}
import graft.sources.Warc

/** Web-crawl ingestion surface: WARC container round-trip, HTML →
  * text extraction, URL canonicalization / domain analytics. The
  * fixture corpus is plain text, so the HTML/URL entries derive
  * deterministic markup and URLs from (doc_id, source, text) — the
  * SAME derivation on the DuckDB side — and every entry is hash-checked
  * end to end (the WARC entry's oracle is literally the documents
  * table: write → read must be the identity).
  *
  * Every regex here and in the ops it exercises stays in the
  * RE2 ∩ java.util.regex dialect so the oracles replay exactly.
  */
object WebQueries {

  type Q = (SparkSession, String) => DataFrame

  // ---- deterministic fixture derivations (mirrored in oracleSql) ----

  /** Wrap a fixture doc in crawl-shaped HTML: comment, title, style,
    * script (with `<`/`&&` payload the strip chain must not trip on),
    * nav + footer link bars (anchor-dominated — the block filter must
    * drop them), headline, body paragraph, and on doc_id % 3 == 0 an
    * extra entity-laden paragraph with a `<br>`. */
  private def plantedHtml(docId: Column, text: Column): Column = {
    val id = docId.cast("string")
    concat(
      lit("<html><!-- crawl 2026 --><head><title>Doc "), id,
      lit(" &amp; Co</title>"),
      lit("<style>p { margin: 0 }</style>"),
      lit("<script type=\"text/javascript\">if (1 < 2 && x > 0) { nav(); }</script></head>"),
      lit("<body><div class=\"nav\"><a href=\"/\">Home</a> <a href=\"/about\">About</a> <a href=\"/contact\">Contact&nbsp;Us</a></div>"),
      lit("<h1>Doc "), id, lit("</h1>"),
      lit("<p>"), text, lit("</p>"),
      when(docId % 3 === 0,
        lit("<p>Extra &quot;quoted&quot; paragraph &#39;here&#39;.<br>Line two.</p>"))
        .otherwise(lit("")),
      lit("<div class=\"footer\"><a href=\"/tos\">Terms</a> &copy; 2026 <a href=\"/privacy\">Privacy</a></div></body></html>"))
  }

  /** The oracle-side spelling of [[plantedHtml]]. NOTE for every
    * snippet below: these strings are embedded into outer templates
    * that ALSO call stripMargin, so no line may BEGIN with `|` (a
    * leading `||` would lose a pipe to the outer strip) — every
    * concatenation operator sits at line end. */
  private val plantedHtmlSql: String =
    """'<html><!-- crawl 2026 --><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
      |  ' &amp; Co</title>' ||
      |  '<style>p { margin: 0 }</style>' ||
      |  '<script type="text/javascript">if (1 < 2 && x > 0) { nav(); }</script></head>' ||
      |  '<body><div class="nav"><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact&nbsp;Us</a></div>' ||
      |  '<h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1>' ||
      |  '<p>' || text || '</p>' ||
      |  CASE WHEN doc_id % 3 = 0 THEN '<p>Extra &quot;quoted&quot; paragraph &#39;here&#39;.<br>Line two.</p>' ELSE '' END ||
      |  '<div class="footer"><a href="/tos">Terms</a> &copy; 2026 <a href="/privacy">Privacy</a></div></body></html>'""".stripMargin

  /** Derive a crawl URL per doc: mixed-case `WWW.` host prefixes,
    * three TLDs (one a cc-SLD), occasional explicit port and trailing
    * slash, tracking params, a fragment — every normalization
    * [[UrlTools.canonicalize]] performs has planted witnesses. */
  private def plantedUrl(docId: Column, source: Column): Column = {
    val id = docId.cast("string")
    concat(lit("https://"),
      when(docId % 4 === 0, lit("WWW.")).otherwise(lit("")),
      source, (docId % 7).cast("string"),
      when(docId % 3 === 0, lit(".example.co.uk"))
        .when(docId % 3 === 1, lit(".example.com"))
        .otherwise(lit(".sample.org")),
      when(docId % 5 === 0, lit(":8080")).otherwise(lit("")),
      lit("/path/a"), id,
      when(docId % 2 === 0, lit("/")).otherwise(lit("")),
      lit("?id="), id, lit("&utm_source=feed"),
      when(docId % 2 === 0, lit("&ref=rss")).otherwise(lit("")),
      lit("#s"), (docId % 10).cast("string"))
  }

  private val plantedUrlSql: String =
    """'https://' || CASE WHEN doc_id % 4 = 0 THEN 'WWW.' ELSE '' END ||
      |  source || CAST(doc_id % 7 AS VARCHAR) ||
      |  CASE WHEN doc_id % 3 = 0 THEN '.example.co.uk'
      |       WHEN doc_id % 3 = 1 THEN '.example.com'
      |       ELSE '.sample.org' END ||
      |  CASE WHEN doc_id % 5 = 0 THEN ':8080' ELSE '' END ||
      |  '/path/a' || CAST(doc_id AS VARCHAR) ||
      |  CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END ||
      |  '?id=' || CAST(doc_id AS VARCHAR) || '&utm_source=feed' ||
      |  CASE WHEN doc_id % 2 = 0 THEN '&ref=rss' ELSE '' END ||
      |  '#s' || CAST(doc_id % 10 AS VARCHAR)""".stripMargin

  /** A re-crawl spelling of the same page for doc_id % 11 == 0: scheme
    * and host upper-cased, the other default-ish port, forced trailing
    * slash, different tracking params, fragment — MUST canonicalize
    * identically to [[plantedUrl]]'s form. */
  private def variantUrl(docId: Column, source: Column): Column = {
    val id = docId.cast("string")
    concat(lit("HTTPS://"),
      upper(concat(
        when(docId % 4 === 0, lit("www.")).otherwise(lit("")),
        source, (docId % 7).cast("string"),
        when(docId % 3 === 0, lit(".example.co.uk"))
          .when(docId % 3 === 1, lit(".example.com"))
          .otherwise(lit(".sample.org")))),
      lit(":443"), lit("/path/a"), id, lit("/"),
      lit("?gclid=zz&id="), id, lit("&utm_medium=mail#top"))
  }

  private val variantUrlSql: String =
    """'HTTPS://' || upper(
      |    CASE WHEN doc_id % 4 = 0 THEN 'www.' ELSE '' END ||
      |    source || CAST(doc_id % 7 AS VARCHAR) ||
      |    CASE WHEN doc_id % 3 = 0 THEN '.example.co.uk'
      |         WHEN doc_id % 3 = 1 THEN '.example.com'
      |         ELSE '.sample.org' END) ||
      |  ':443' || '/path/a' || CAST(doc_id AS VARCHAR) || '/' ||
      |  '?gclid=zz&id=' || CAST(doc_id AS VARCHAR) || '&utm_medium=mail#top'""".stripMargin

  /** The oracle-side spelling of [[UrlTools.canonicalize]] and
    * [[UrlTools.registeredDomainOf]] over a column named `url`. */
  private[queries] def hostSqlOf(c: String): String =
    s"""regexp_replace(lower(regexp_extract($c,
      |    '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)),
      |  '^www\\.|:[0-9]+$$', '', 'g')""".stripMargin
  private[queries] val hostSql = hostSqlOf("url")
  private[queries] def canonicalSqlOf(c: String): String =
    s"""lower(regexp_extract($c, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) ||
      |  '://' || ${hostSqlOf(c)} ||
      |  (CASE WHEN len(regexp_replace(regexp_extract($c,
      |        '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1),
      |        '/+$$', '', 'g')) > 0
      |      THEN regexp_replace(regexp_extract($c,
      |        '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1),
      |        '/+$$', '', 'g')
      |      ELSE '/' END) ||
      |  (CASE WHEN len(regexp_extract($c, '\\?([^#]*)', 1)) > 0
      |       AND len(regexp_replace(regexp_replace(
      |         '?' || regexp_extract($c, '\\?([^#]*)', 1),
      |         '[?&](utm_[a-zA-Z0-9_]+|fbclid|gclid|ref)=[^&#]*', '', 'g'),
      |         '^[?&]+', '', 'g')) > 0
      |      THEN '?' || regexp_replace(regexp_replace(
      |         '?' || regexp_extract($c, '\\?([^#]*)', 1),
      |         '[?&](utm_[a-zA-Z0-9_]+|fbclid|gclid|ref)=[^&#]*', '', 'g'),
      |         '^[?&]+', '', 'g')
      |      ELSE '' END)""".stripMargin
  private[queries] val canonicalSql = canonicalSqlOf("url")
  private val registeredDomainSql =
    """CASE WHEN regexp_matches(host,
      |    '\.(co|com|org|net|ac|gov|edu)\.(uk|au|jp|in|br|nz|za)$')
      |  THEN regexp_extract(host,
      |    '([^.]+\.(co|com|org|net|ac|gov|edu)\.(uk|au|jp|in|br|nz|za))$', 1)
      |  WHEN regexp_matches(host, '\.')
      |  THEN regexp_extract(host, '([^.]+\.[^.]+)$', 1)
      |  ELSE host END""".stripMargin

  // one WARC archive dir per sf dir per JVM (Verify/Bench call repeatedly)
  private val warcDirCache =
    scala.collection.concurrent.TrieMap[String, String]()
  private val tfrecDirCache =
    scala.collection.concurrent.TrieMap[String, String]()
  private val jsonlDirCache =
    scala.collection.concurrent.TrieMap[String, String]()
  // separate dir for the INDEXED layout (archives + _index parquet)
  private val warcIdxCache =
    scala.collection.concurrent.TrieMap[String, String]()

  private val httpE2eCache =
    scala.collection.concurrent.TrieMap[String, String]()

  /** The curate-pipeline page fixture shared by both e2e entries:
    * base pages, exact dups (same html, fresh URL, +100000), near dups
    * (first body word replaced, +200000), URL-variant re-crawls
    * (+7000000). With `withCanonicalTags`, base pages at doc_id % 31
    * additionally declare a SELF rel=canonical link (appended after
    * the markup — position is irrelevant to extraction and the tag
    * strips to nothing in the text chain, so the curate semantics are
    * untouched for every stage except declared dedup). */
  private def curateFixturePages(s: SparkSession, d: String,
                                 withCanonicalTags: Boolean): DataFrame = {
    val docs = Tables.documents(s, d)
    val id = col("doc_id")
    val baseHtml =
      if (withCanonicalTags)
        concat(plantedHtml(id, col("text")),
          when(id % 31 === 0, concat(lit("<link rel=\"canonical\" href=\""),
            plantedUrl(id, col("source")), lit("\">"))).otherwise(lit("")))
      else plantedHtml(id, col("text"))
    val base = docs.select(id,
      plantedUrl(id, col("source")).as("url"), baseHtml.as("html"))
    // exact dup: identical page (same embedded id) at a fresh URL
    val exactDups = docs.filter(id % 13 === 0)
      .select((id + 100000L).as("doc_id"),
        plantedUrl(id + 100000L, col("source")).as("url"),
        plantedHtml(id, col("text")).as("html"))
    // near dup: first word of the body replaced, fresh URL
    val nearDups = docs.filter(id % 17 === 0)
      .select((id + 200000L).as("doc_id"),
        plantedUrl(id + 200000L, col("source")).as("url"),
        plantedHtml(id,
          concat(lit("zzz "),
            expr("substring(text, instr(text, ' ') + 1)"))).as("html"))
    // re-crawl: same canonical URL, page re-rendered (id + text same)
    val recrawls = docs.filter(id % 11 === 0)
      .select((id + 7000000L).as("doc_id"),
        variantUrl(id, col("source")).as("url"),
        plantedHtml(id, col("text")).as("html"))
    base.unionByName(exactDups).unionByName(nearDups).unionByName(recrawls)
  }

  /** The eval set is FIXED-SIZE by construction (real benchmarks do
    * not grow with the training corpus): the 50 smallest-id docs of
    * the % 97 band, deterministic at any corpus scale — and the
    * decontamination match volume stays benchmark-bounded instead of
    * growing quadratically when a probe replicates the corpus. */
  private def curateBenchmark(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).filter(col("doc_id") % 97 === 0)
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id")).limit(50).select(col("text"))

  /** Build the curate_http_e2e shard dir: the page fixture wrapped as
    * raw HTTP captures in .warc.gz archives plus the planted
    * non-content records, run through the full HTTP curation chain,
    * ending in TFRecord shards. Returns the shard dir. */
  private def buildHttpE2eShards(s: SparkSession, d: String): String = {
    import graft.sources.{TfRecord, Warc}
    val docs = Tables.documents(s, d)
    val id = col("doc_id")
    def http200(html: Column): Column = concat(
      lit("HTTP/1.1 200 OK\r\nServer: graft-fixture\r\n" +
        "Content-Type: text/html; charset=utf-8\r\n\r\n"), html)
    // content captures: the shared fixture (with %31 self-canonicals)
    val content = curateFixturePages(s, d, withCanonicalTags = true)
      .select(col("doc_id"), col("url"), http200(col("html")).as("payload"))
    // syndicated mobile copies (%31, +600000): first 10 body tokens
    // only (shingle-Jaccard vs the base ~0.4 — BELOW the near-dup
    // threshold), fresh URL, declaring the base as canonical: the one
    // relationship ONLY declared-canonical dedup can collapse
    val synd = docs.filter(id % 31 === 0)
      .select((id + 600000L).as("doc_id"),
        plantedUrl(id + 600000L, col("source")).as("url"),
        http200(concat(
          plantedHtml(id, array_join(
            slice(split(trim(col("text")), "\\s+"), 1, 10), " ")),
          lit("<link rel=\"canonical\" href=\""),
          plantedUrl(id, col("source")), lit("\">"))).as("payload"))
    // planted non-content captures, all of which the status/mime gate
    // must drop: 404s (%19), non-HTTP payloads (%23), and 301s (%29)
    // whose Location points at the base page — the redirect aliases
    val notFound = docs.filter(id % 19 === 0)
      .select((id + 300000L).as("doc_id"),
        plantedUrl(id + 300000L, col("source")).as("url"),
        concat(lit("HTTP/1.1 404 Not Found\r\n" +
          "Content-Type: text/html\r\n\r\n"), col("text")).as("payload"))
    val nonHttp = docs.filter(id % 23 === 0)
      .select((id + 400000L).as("doc_id"),
        plantedUrl(id + 400000L, col("source")).as("url"),
        col("text").as("payload"))
    val redirects301 = docs.filter(id % 29 === 0)
      .select((id + 500000L).as("doc_id"),
        plantedUrl(id + 500000L, col("source")).as("url"),
        concat(lit("HTTP/1.1 301 Moved Permanently\r\nLocation: "),
          plantedUrl(id, col("source")), lit("\r\n\r\n")).as("payload"))
    val captures = content.unionByName(synd).unionByName(notFound)
      .unionByName(nonHttp).unionByName(redirects301)
    val warcDir = java.nio.file.Files
      .createTempDirectory("graft_httpe2e_warc").toString
    Warc.writeCorpus(captures, "doc_id", "url", "payload", warcDir)
    // --- the chain: parse -> gate -> decode -> redirects -> declared
    //     dedup -> curate -> shards
    val resp = Warc.httpResponses(Warc.read(s, warcDir))
    val aliases = Warc.resolveRedirects(resp)
      .filter(col("resolved") && col("hops") >= 1)
      .groupBy(col("final_uri").as("url"))
      .agg(count(lit(1)).as("n_aliases"))
    val pages = Warc.decodeBody(
        resp.filter(col("status").between(200, 299) &&
          col("mime") === "text/html"),
        "body", "charset", "html")
      .select(regexp_extract(col("record_id"), "urn:graft:([0-9]+)", 1)
        .cast("long").as("doc_id"),
        col("target_uri").as("url"), col("html"))
    val declWinners = UrlTools
      .dedupByDeclaredCanonical(pages, "doc_id", "url", "html")
      .select(col("id").as("doc_id"))
    val declared = pages.join(declWinners, Seq("doc_id"), "left_semi")
    val curated = graft.ops.CrawlCurate
      .curatePages(declared, curateBenchmark(s, d))
      .join(aliases, Seq("url"), "left")
      .select(col("doc_id"), col("url"), col("text"),
        round(col("quality") * 10000).cast("long").as("q4"), col("split"),
        coalesce(col("n_aliases"), lit(0L)).as("n_aliases"))
    val shardDir = java.nio.file.Files
      .createTempDirectory("graft_httpe2e_shards").toString
    TfRecord.writeExamples(curated, shardDir,
      Seq("doc_id", "q4", "n_aliases"), Seq("url", "text", "split"))
    shardDir
  }

  private def indexedWarcDir(s: SparkSession, d: String): String =
    warcIdxCache.getOrElseUpdate(d, {
      val r = java.nio.file.Files.createTempDirectory("graft_warc_idx").toString
      Warc.writeCorpusIndexed(
        Tables.documents(s, d).select(col("doc_id"),
          concat(lit("https://corpus.example/doc/"),
            col("doc_id").cast("string")).as("uri"), col("text")),
        "doc_id", "uri", "text", r)
      r
    })

  // ---- queries ------------------------------------------------------

  val queries: Map[String, Q] = Map(
    // Document-level HTML extraction: title, anchor count, cleaned
    // text. The script's `1 < 2 && x > 0` payload and the entity salad
    // are the regression traps — a naive tag regex would eat half the
    // script as a "tag".
    "html_extract" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), plantedHtml(col("doc_id"), col("text")).as("html"))
      HtmlExtract.extract(docs, "doc_id", "html")
        .withColumnRenamed("id", "doc_id")
    },

    // Block-level boilerplate filter: the nav and footer bars are
    // anchor-dominated and must drop; title/headline/prose survive.
    "html_block_filter" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), plantedHtml(col("doc_id"), col("text")).as("html"))
      HtmlExtract.contentBlocks(docs, "doc_id", "html")
        .withColumnRenamed("id", "doc_id")
    },

    // Registered-domain accounting over canonicalized crawl URLs.
    "url_domains" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(plantedUrl(col("doc_id"), col("source")).as("url"),
          col("n_chars"))
      UrlTools.domainStats(docs, "url", "n_chars")
    },

    // HTTP response parsing (Warc.httpResponses): WARC `response`
    // payloads split into status / mime / charset / body. Witnesses:
    // 404s (doc_id % 17), an upper-cased quoted-charset Content-Type
    // (doc_id % 5), and NON-HTTP payloads (doc_id % 23) that must pass
    // through with NULL status — the gate-don't-drop contract.
    "warc_http_responses" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val id = col("doc_id")
      val status = when(id % 17 === 0, lit("404 Not Found"))
        .otherwise(lit("200 OK"))
      val payload = when(id % 23 === 0, col("text"))
        .otherwise(concat(
          lit("HTTP/1.1 "), status, lit("\r\n"),
          lit("Server: graft-fixture\r\n"),
          lit("Content-Type: "),
          when(id % 5 === 0, lit("Text/HTML; charset=\"UTF-8\""))
            .otherwise(lit("text/plain; charset=utf-8")),
          lit("\r\n"),
          lit("X-Doc: "), id.cast("string"), lit("\r\n\r\n"),
          col("text")))
      val recs = docs.select(
        concat(lit("<urn:graft:"), id.cast("string"), lit(">")).as("record_id"),
        plantedUrl(id, col("source")).as("target_uri"),
        payload.cast("binary").as("content"))
      Warc.httpResponses(recs)
        .select(col("record_id"), col("target_uri"), col("status"),
          col("mime"), col("charset"),
          col("body").cast("string").as("body_text"))
    },

    // Registered domains through a PUBLIC-SUFFIX TABLE (UrlTools
    // .registeredDomainsOfHosts): the planted table marks example.com
    // itself a suffix (github.io-style private registry), so every
    // siteN.example.com host becomes its own registrable domain —
    // the case the lite rule cannot express; co.uk depth and the
    // sample.org fallback replay too.
    "url_domains_psl" -> { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), plantedUrl(col("doc_id"), col("source")).as("url"))
        .withColumn("host", UrlTools.hostOf(col("url")))
      val suffixes = Seq("com", "org", "co.uk", "example.com").toDF("suffix")
      val mapping = UrlTools.registeredDomainsOfHosts(
        docs.select(col("host")).distinct(), "host", suffixes)
      docs.join(broadcast(mapping), Seq("host"))
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("host")).as("n_hosts"))
    },

    // robots.txt gate (RFC 9309 longest-match): per-domain robots
    // bodies exercise group selection (a googlebot-only block that
    // must NOT apply), stacked agents, comments, empty Disallow, the
    // longest-match cascade a1 < a12 < a123, the equal-length
    // Allow-beats-Disallow tie, and the §2.2.3 specials — `/*4$`
    // (wildcard + end anchor, blocks every path ending in 4),
    // `/path/a*44$` (a longer Allow that re-admits ...44 paths),
    // `/path/a2*` (prefix wildcard), `/path/a77$` (anchor-only: exact
    // path, /path/a770 must NOT match). The oracle constructs the
    // expected RULE rows (pattern pre-compiled) directly, so the
    // parser + compiler are validated through the decisions they
    // produce.
    "url_robots_gate" -> { (s, d) =>
      import s.implicits._
      val robots = Seq(
        ("example.com",
          "# crawl policy\nUser-agent: googlebot\nDisallow: /\n\n" +
            "User-agent: *\nDisallow: /path/a1 # oldest rule\n" +
            "Allow: /path/a12\nDisallow: /path/a123\n" +
            "Allow: /path/a4\nDisallow: /path/a4\nDisallow:\n" +
            "Disallow: /*4$\nAllow: /path/a*44$\n"),
        ("example.co.uk",
          "User-agent: googlebot\nUser-agent: bingbot\nDisallow: /\n\n" +
            "User-agent: *\nUser-agent: extra-agent\nCrawl-delay: 10\n" +
            "Disallow: /path/a7\nAllow: /path/a77$\n"),
        ("sample.org",
          "User-agent: *\nAllow: /\nDisallow: /path/a5\nDisallow: /path/a2*\n"))
        .toDF("domain", "robots_txt")
      val urls = Tables.documents(s, d)
        .select(col("doc_id"), plantedUrl(col("doc_id"), col("source")).as("url"))
      graft.ops.Robots.gate(urls, "url",
        graft.ops.Robots.parseRulesTable(robots))
        .select(col("doc_id"), col("domain"), col("path"), col("allowed"))
    },

    // Frontier directives (Robots.parseDirectivesTable): `*`-group
    // Crawl-delay in integer MILLISECONDS (googlebot-group values must
    // NOT apply, non-numeric ignored, and the fractional de-facto
    // spelling 0.75 parses to 750 ms) + group-independent Sitemap
    // collection in file order. The oracle is the expected directive
    // rows as VALUES — the parser is validated through its output.
    "robots_directives" -> { (s, d) =>
      import s.implicits._
      val robots = Seq(
        ("example.com",
          "User-agent: *\nCrawl-delay: 2\nSitemap: https://example.com/sm1.xml\n\n" +
            "User-agent: googlebot\nCrawl-delay: 99\nSitemap: https://example.com/sm2.xml\n"),
        ("example.co.uk",
          "User-agent: googlebot\nCrawl-delay: 7\n\n" +
            "User-agent: *\nCrawl-delay: 0.75\nDisallow: /x\n"),
        ("sample.org",
          "Sitemap: https://sample.org/a.xml # seed\nUser-agent: *\nCrawl-delay: bogus\n"))
        .toDF("domain", "robots_txt")
      graft.ops.Robots.parseDirectivesTable(robots)
        .select(col("domain"), col("crawl_delay_ms"),
          array_join(col("sitemaps"), ",").as("sitemaps_csv"))
    },

    // Redirect-chain resolution (Warc.resolveRedirects, 4 unrolled
    // hops): chains p/N -> p/N-1 -> ... ending at %4==0 terminals
    // (<= 3 hops), self-loop witnesses (%5, resolved=false at hop
    // cap), and external landings (%7, NULL status, chain stops).
    "warc_redirects" -> { (s, d) =>
      val id = col("doc_id")
      def uriOf(i: Column) =
        concat(lit("https://r.example.com/p/"), i.cast("string"))
      val responses = Tables.documents(s, d).select(
        uriOf(id).as("target_uri"),
        when(id % 4 === 0, 200).otherwise(301).as("status"),
        when(id % 4 === 0, lit(null).cast("string"))
          .when(id % 5 === 0, uriOf(id))
          .when(id % 7 === 0,
            concat(lit("https://external.example.org/x"), id.cast("string")))
          .otherwise(uriOf(id - 1)).as("location"))
      Warc.resolveRedirects(responses)
    },

    // Page metadata (HtmlExtract.metaOf / canonicalLinkOf): meta
    // description in BOTH attribute orders, keywords content-first,
    // rel=canonical in both orders and absent — the oracle constructs
    // the expected values, validating extraction through its outputs.
    "html_meta" -> { (s, d) =>
      val id = col("doc_id")
      val n = id.cast("string")
      val html = concat(
        lit("<html><head><title>Doc "), n, lit("</title>"),
        when(id % 2 === 0, concat(
          lit("<meta name=\"description\" content=\"Summary &amp; notes "),
          n, lit("\">")))
          .otherwise(concat(
            lit("<meta content=\"Summary &amp; notes "), n,
            lit("\" name=\"description\">"))),
        lit("<meta content=\"alpha, beta\" name=\"keywords\">"),
        when(id % 3 === 0, concat(
          lit("<link rel=\"canonical\" href=\"https://canon.example.com/p/"),
          (id % 7).cast("string"), lit("\">")))
          .when(id % 3 === 1, concat(
            lit("<link href=\"https://canon.example.com/q/"),
            (id % 7).cast("string"), lit("\" rel=\"canonical\">")))
          .otherwise(lit("")),
        lit("</head><body><p>body</p></body></html>"))
      Tables.documents(s, d).select(id, html.as("html"))
        .select(id,
          HtmlExtract.metaOf(col("html"), "description").as("description"),
          HtmlExtract.metaOf(col("html"), "keywords").as("keywords"),
          HtmlExtract.canonicalLinkOf(col("html")).as("canonical"))
    },

    // Declared-canonical dedup (UrlTools.dedupByDeclaredCanonical):
    // doc_id % 3 == 0 pages declare rel=canonical targets shared
    // across hosts (7 syndication groups that plain URL normalization
    // cannot collapse); everyone else keys on their own URL.
    "url_dedup_declared" -> { (s, d) =>
      val id = col("doc_id")
      val html = concat(lit("<html><head>"),
        when(id % 3 === 0, concat(
          lit("<link rel=\"canonical\" href=\"https://canon.example.com/p/"),
          (id % 7).cast("string"), lit("\">"))).otherwise(lit("")),
        lit("</head><body>x</body></html>"))
      val docs = Tables.documents(s, d).select(id,
        plantedUrl(id, col("source")).as("url"), html.as("html"))
      UrlTools.dedupByDeclaredCanonical(docs, "doc_id", "url", "html")
        .withColumnRenamed("id", "doc_id")
    },

    // Charset-aware body decode (Warc.decodeBody): ISO-8859-1 bodies
    // (doc_id % 3 == 0), UTF-8 (== 1), and an unknown charset that
    // must FALL BACK to UTF-8 (== 2) — all carrying non-ASCII é/ü
    // witnesses — must decode to the identical string.
    "warc_decode_charset" -> { (s, d) =>
      val id = col("doc_id")
      val raw = concat(col("text"), lit(" café ü"))
      val recs = Tables.documents(s, d).select(id,
        when(id % 3 === 0, lit("iso-8859-1"))
          .when(id % 3 === 1, lit("utf-8"))
          .otherwise(lit("x-unknown-charset")).as("charset"),
        when(id % 3 === 0, encode(raw, "ISO-8859-1"))
          .otherwise(encode(raw, "UTF-8")).as("body"))
      Warc.decodeBody(recs, "body", "charset")
        .select(col("doc_id"), col("text"))
    },

    // RFC 9309 §2.3.1 fetch-status semantics (Robots.rulesFromHttp):
    // 2xx parses, 4xx = unavailable -> crawl as if no rules (body must
    // be IGNORED), 5xx = unreachable -> complete disallow, an
    // UNRESOLVED 3xx = unavailable per §2.3.1.2 (redirects are followed
    // upstream via Warc.resolveRedirects; an exhausted chain means no
    // rules), NULL status = a bare robots.txt body. Oracle restates
    // the expected rule rows.
    "robots_from_http" -> { (s, d) =>
      import s.implicits._
      val responses = Seq(
        ("ok.example", Some(200),
          "User-agent: *\nDisallow: /private\nAllow: /private/pub\n"),
        ("gone.example", Some(404), "User-agent: *\nDisallow: /ignored\n"),
        ("down.example", Some(503), "User-agent: *\nAllow: /ignored\n"),
        ("moved.example", Some(302), ""),
        ("raw.example", Option.empty[Int],
          "User-agent: *\nDisallow: /raw\n"))
        .toDF("domain", "status", "body_text")
      graft.ops.Robots.rulesFromHttp(responses)
    },

    // Sitemap parsing (ops/Sitemaps): one planted sitemap document per
    // fixture row — doc_id % 20 == 0 rows are <sitemapindex> files
    // (their entries are nested sitemap FILES, is_index = true), the
    // rest <urlset> pages with whitespace-padded locs, an &amp;
    // entity witness, and optional lastmod.
    "sitemap_urls" -> { (s, d) =>
      val id = col("doc_id")
      val h = (id % 50).cast("string")
      val dd = lpad((id % 28 + 1).cast("string"), 2, "0")
      val xml = when(id % 20 === 0, concat(
        lit("<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"),
        lit("<sitemap><loc>https://site"), h, lit(".example.com/sm/"),
        id.cast("string"), lit("/1.xml</loc><lastmod>2026-02-"), dd,
        lit("</lastmod></sitemap>"),
        lit("<sitemap><loc>https://site"), h, lit(".example.com/sm/"),
        id.cast("string"), lit("/2.xml</loc></sitemap>"),
        lit("</sitemapindex>")))
        .otherwise(concat(
          lit("<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"),
          lit("<url><loc> https://site"), h, lit(".example.com/doc/"),
          (id * 3).cast("string"), lit(" </loc><lastmod>2026-01-"), dd,
          lit("</lastmod></url>"),
          lit("<url><loc>https://site"), h, lit(".example.com/doc/"),
          (id * 3 + 1).cast("string"), lit("?a=1&amp;b=2</loc></url>"),
          lit("<url><loc>https://site"), h, lit(".example.com/doc/"),
          (id * 3 + 2).cast("string"),
          lit("</loc><priority>0.5</priority></url>"),
          lit("</urlset>")))
      val sm = Tables.documents(s, d).select(id, xml.as("xml"))
      graft.ops.Sitemaps.urls(sm, "doc_id", "xml")
    },

    // Domain reputation prior: per-doc quality snapped to integer 1e-4
    // units, per-registered-domain docs/mean joined back broadcast.
    "url_domain_prior" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          plantedUrl(col("doc_id"), col("source")).as("url"),
          round(graft.functions.TextFunctions.qualityScore(col("text")), 4)
            .as("quality"))
      graft.ops.UrlTools.domainQualityPrior(docs, "url", "quality")
        .select(col("doc_id"), col("domain"), col("q4"),
          col("domain_docs"), col("domain_mean_q4"))
    },

    // URL-level dedup: the doc_id % 11 re-crawl variants must collapse
    // onto their originals (n_dups = 2, winner = original id).
    "url_dedup_canonical" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val urls = docs
        .select(col("doc_id").as("id"),
          plantedUrl(col("doc_id"), col("source")).as("url"))
        .union(docs.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 7000000L).as("id"),
            variantUrl(col("doc_id"), col("source")).as("url")))
      UrlTools.dedupByCanonical(urls, "id", "url")
        .select(col("id"), col("canonical_url"), col("n_dups"))
    },

    // The pipeline composed end to end (ops/CrawlCurate): pages with
    // planted exact dups (same html, different crawl URL), near dups
    // (one word changed), URL-variant re-crawls, and benchmark
    // contamination, curated to (doc_id, url, text, q4, split).
    // HASH-checked: the oracle replays every stage — the extract
    // chain, canonical-URL winners, the quality gate, exact dedup,
    // brute-force shingle-Jaccard pairs + recursive-CTE closure (LSH
    // recall at j >= 0.7 is total on this corpus — planted near dups
    // sit at j ~ 0.9, cross-doc boilerplate at ~0.05 — and the op
    // verifies candidates with EXACT Jaccard, so the pair sets agree;
    // the same argument the dedup_minhash_lsh oracle rests on),
    // 5-gram decontamination, and the md5-threshold split. quality is
    // carried as micro-units (q4) so the hash compares integers.
    "curate_crawl_e2e" -> { (s, d) =>
      val pages = curateFixturePages(s, d, withCanonicalTags = false)
      graft.ops.CrawlCurate.curatePages(pages, curateBenchmark(s, d))
        .select(col("doc_id"), col("url"), col("text"),
          round(col("quality") * 10000).cast("long").as("q4"), col("split"))
    },

    // The SAME curation from RAW HTTP CAPTURES in WARC archives — the
    // crawl corpus' true starting point — through to TFRecord training
    // shards: WARC bytes → record parse → HTTP response parse (the
    // planted 404s, non-HTTP payloads and 301s must drop at the
    // status/mime gate) → charset decode → redirect-chain resolution
    // (each %29 doc gains one 301 alias; its resolved count rides the
    // output as n_aliases) → publisher-declared canonical dedup (the
    // %31 syndicated mobile copies share no URL and sit BELOW the
    // near-dup threshold — only the declared rel=canonical collapses
    // them) → the full curatePages chain → writeExamples shards →
    // CRC-verified decode. Hash-checked end to end against the
    // logical-replay oracle (the pack_to_shards_e2e pattern).
    "curate_http_e2e" -> { (s, d) =>
      val dir = httpE2eCache.getOrElseUpdate(d, buildHttpE2eShards(s, d))
      graft.sources.TfRecord.readExamples(s, dir,
          Seq("doc_id", "q4", "n_aliases"), Seq("url", "text", "split"))
        .select(element_at(col("doc_id"), 1).as("doc_id"),
          col("url").cast("string").as("url"),
          col("text").cast("string").as("text"),
          element_at(col("q4"), 1).as("q4"),
          col("split").cast("string").as("split"),
          element_at(col("n_aliases"), 1).as("n_aliases"))
    },

    // CDX-indexed random access: fetch the % 101 pages through the
    // offset index (one seek + one member inflate each — cost tracks
    // requested pages, never archive bytes). The oracle is the same
    // subset of the documents table, so offsets/lengths/member
    // boundaries are all hash-checked end to end.
    "src_warc_fetch" -> { (s, d) =>
      val dir = indexedWarcDir(s, d)
      val ids = Tables.documents(s, d)
        .filter(col("doc_id") % 101 === 0)
        .select(col("doc_id")).orderBy(col("doc_id"))
        .collect().map(_.getLong(0)) // bounded: 1/101 of the corpus
      Warc.fetchByUri(s, dir,
        ids.toSeq.map(i => s"https://corpus.example/doc/$i"))
        .select(regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1)
          .cast("long").as("doc_id"),
          col("content").cast("string").as("text"))
    },

    // WARC round-trip law: corpus → .warc.gz archives (one gzip member
    // per record, the Common Crawl layout) → read → the corpus again.
    // The oracle is literally the documents table.
    "src_warc_roundtrip" -> { (s, d) =>
      val dir = warcDirCache.getOrElseUpdate(d, {
        val r = java.nio.file.Files.createTempDirectory("graft_warc").toString
        val docs = Tables.documents(s, d)
          .select(col("doc_id"),
            concat(lit("https://corpus.example/doc/"),
              col("doc_id").cast("string")).as("uri"),
            col("text"))
        Warc.writeCorpus(docs, "doc_id", "uri", "text", r)
        r
      })
      Warc.read(s, dir)
        .select(regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1)
          .cast("long").as("doc_id"),
          col("content").cast("string").as("text"))
    },

    // TFRecord sink/source (sources/TfRecord — hand-written framing +
    // tf.Example protobuf, CRC32C-verified): the corpus written as
    // training shards and parsed back must be byte-identical to the
    // source rows; the oracle reads the originals.
    "src_tfrecord_roundtrip" -> { (s, d) =>
      val dir = tfrecDirCache.getOrElseUpdate(d, {
        val r = java.nio.file.Files.createTempDirectory("graft_tfrec")
          .toString
        graft.sources.TfRecord.writeExamples(
          Tables.documents(s, d)
            .select(col("doc_id"), col("n_chars"), col("text")),
          r, Seq("doc_id", "n_chars"), Seq("text"))
        r
      })
      graft.sources.TfRecord.readExamples(s, dir,
          Seq("doc_id", "n_chars"), Seq("text"))
        .select(element_at(col("doc_id"), 1).as("doc_id"),
          element_at(col("n_chars"), 1).as("n_chars"),
          col("text").cast("string").as("text"))
    },

    // JSONL roundtrip (the interchange format corpora actually ship
    // in): Spark's native json source/sink with an explicit schema —
    // schemaless inference at 100 TB is a full extra pass, so the
    // reader always receives the schema. gzip codec = the on-the-wire
    // layout (HuggingFace/CC derivatives ship .jsonl.gz).
    "src_jsonl_roundtrip" -> { (s, d) =>
      val dir = jsonlDirCache.getOrElseUpdate(d, {
        val r = java.nio.file.Files.createTempDirectory("graft_jsonl")
          .toString + "/docs"
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("source"), col("text"))
          .write.option("compression", "gzip").json(r)
        r
      })
      s.read
        .schema("doc_id BIGINT, lang STRING, source STRING, text STRING")
        .json(dir)
    })

  // ---- oracles ------------------------------------------------------

  /** The oracle-side [[HtmlExtract.htmlToText]] chain over a column
    * named `html` (stages match the op's method boundaries). */
  private val htmlToTextSql =
    """trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |  replace(replace(replace(replace(replace(replace(replace(replace(
      |    regexp_replace(
      |      regexp_replace(regexp_replace(
      |        regexp_replace(regexp_replace(regexp_replace(html,
      |          '(?s)<!--.*?-->', '', 'g'),
      |          '(?is)<script[^>]*>.*?</script>', '', 'g'),
      |          '(?is)<style[^>]*>.*?</style>', '', 'g'),
      |        '(?i)<br[^>]*>', chr(10), 'g'),
      |        '(?i)</(p|div|li|h[1-6]|tr|ul|ol|table|blockquote|section|article|header|footer|nav|title)>', chr(10), 'g'),
      |      '<[^>]*>', '', 'g'),
      |    '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
      |    '&#39;', ''''), '&#x27;', ''''), '&copy;', '©'), '&amp;', '&'),
      |  '[ \t\r]+', ' ', 'g'), ' ?\n ?', chr(10), 'g'),
      |  '\n+', chr(10), 'g'), '^\n+|\n+$', '', 'g'))""".stripMargin

  /** Entity decode over a column expression (for the title). */
  private[queries] def entitySql(e: String) =
    s"""replace(replace(replace(replace(replace(replace(replace(replace(
       |  $e,
       |  '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
       |  '&#39;', ''''), '&#x27;', ''''), '&copy;', '©'), '&amp;', '&')""".stripMargin

  // ---- the curate-pipeline replay (curate_crawl_e2e / curate_http_e2e)

  /** Planted page bands as one CTE chain ending in
    * `pg(doc_id, url, decl_url, html)`. Every shifted-id band computes
    * html at the ORIGINAL doc_id in an inner scope and the fresh URL at
    * the shifted id in an outer scope (never both in one SELECT — a
    * lateral-alias hazard). `decl_url` is the page's declared
    * rel=canonical target (the extraction itself is validated by the
    * html_meta / url_dedup_declared oracles; here the replay carries
    * its known value): NULL everywhere except the syndicated copies —
    * the %31 base pages declare THEMSELVES, which coalesce() makes
    * indistinguishable from NULL. */
  private def curatePagesCte(withSyndication: Boolean): String = {
    val synd = if (!withSyndication) "" else
      s""",
         |sy0 AS (SELECT doc_id, source, $plantedUrlSql AS decl_url,
         |    array_to_string(
         |      (string_split_regex(trim(text), '\\s+'))[1:10], ' ') AS text
         |  FROM documents WHERE doc_id % 31 = 0),
         |sy1 AS (SELECT doc_id + 600000 AS doc_id2, source, decl_url,
         |    $plantedHtmlSql AS html FROM sy0),
         |sy AS (SELECT doc_id, $plantedUrlSql AS url, decl_url, html
         |  FROM (SELECT doc_id2 AS doc_id, source, decl_url, html
         |    FROM sy1) t)""".stripMargin
    val syndUnion = if (!withSyndication) ""
      else "\n  UNION ALL SELECT doc_id, url, decl_url, html FROM sy"
    s"""ed0 AS (SELECT doc_id + 100000 AS doc_id2, source,
       |    $plantedHtmlSql AS html
       |  FROM documents WHERE doc_id % 13 = 0),
       |ed AS (SELECT doc_id, $plantedUrlSql AS url,
       |    CAST(NULL AS VARCHAR) AS decl_url, html
       |  FROM (SELECT doc_id2 AS doc_id, source, html FROM ed0) t),
       |nd0 AS (SELECT doc_id, source,
       |    'zzz ' || substr(text, strpos(text, ' ') + 1) AS text
       |  FROM documents WHERE doc_id % 17 = 0),
       |nd1 AS (SELECT doc_id + 200000 AS doc_id2, source,
       |    $plantedHtmlSql AS html FROM nd0),
       |nd AS (SELECT doc_id, $plantedUrlSql AS url,
       |    CAST(NULL AS VARCHAR) AS decl_url, html
       |  FROM (SELECT doc_id2 AS doc_id, source, html FROM nd1) t),
       |rc0 AS (SELECT doc_id, source, $plantedHtmlSql AS html,
       |    $variantUrlSql AS url
       |  FROM documents WHERE doc_id % 11 = 0),
       |rc AS (SELECT doc_id + 7000000 AS doc_id, url,
       |    CAST(NULL AS VARCHAR) AS decl_url, html FROM rc0)$synd,
       |pg AS (
       |  SELECT doc_id, $plantedUrlSql AS url,
       |    CAST(NULL AS VARCHAR) AS decl_url, $plantedHtmlSql AS html
       |  FROM documents
       |  UNION ALL SELECT doc_id, url, decl_url, html FROM ed
       |  UNION ALL SELECT doc_id, url, decl_url, html FROM nd
       |  UNION ALL SELECT doc_id, url, decl_url, html FROM rc$syndUnion)"""
      .stripMargin
  }

  /** Word n-gram list over a token-list column `ts` — the
    * TextFunctions.wordShingles replay (window when len >= n, the
    * whole-join singleton otherwise). */
  private def shinglesSql(n: Int): String = {
    val joined = (1 to n).map(j => s"ts[i+$j]").mkString(" || ' ' || ")
    s"""CASE WHEN len(ts) >= $n
       |    THEN list_transform(range(0, len(ts) - ${n - 1}), i -> $joined)
       |    ELSE [array_to_string(ts, ' ')] END""".stripMargin
  }

  private val tokensOfTextSql =
    """list_filter(string_split_regex(trim(text), '\s+'),
      |      t -> len(t) > 0)""".stripMargin

  /** The full curatePages replay from `pg` to `k4(doc_id, url, text,
    * quality)`: extract, canonical-key dedup (declared target first),
    * quality gate, exact dedup, brute shingle-Jaccard pairs +
    * recursive closure, 5-gram decontamination. */
  private def curateChainCtes: String = {
    // quality replay: the url_domain_prior oracle's spelling verbatim
    val qualitySub =
      """SELECT doc_id, url, text,
        |      CAST(length(text) AS DOUBLE) AS n,
        |      CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |          x -> len(x) > 0)) AS DOUBLE) AS ntok,
        |      CAST(length(text) - length(regexp_replace(text,
        |          '[.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE) AS npunct,
        |      CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
        |          AS DOUBLE) AS ndigit,
        |      CASE WHEN len(list_filter(string_split_regex(trim(text), '\s+'),
        |          x -> len(x) > 0)) > 0
        |        THEN CAST(list_sum(list_transform(
        |            list_filter(string_split_regex(trim(text), '\s+'),
        |              x -> len(x) > 0), x -> len(x))) AS DOUBLE)
        |          / len(list_filter(string_split_regex(trim(text), '\s+'),
        |              x -> len(x) > 0))
        |        ELSE 0.0 END AS atl
        |    FROM k1""".stripMargin
    s"""texted AS MATERIALIZED (SELECT doc_id, url, decl_url, $htmlToTextSql AS text
       |  FROM pg),
       |ckp AS (SELECT doc_id, coalesce(decl_url, url) AS kurl FROM texted),
       |ck AS (SELECT doc_id, ${canonicalSqlOf("kurl")} AS curl
       |  FROM ckp),
       |uw AS (SELECT min(doc_id) AS doc_id FROM ck GROUP BY curl),
       |k1 AS (SELECT t.doc_id, t.url, t.text FROM texted t
       |  JOIN uw USING (doc_id)),
       |qx AS (SELECT doc_id, url, text,
       |    (CASE WHEN ntok >= 10 AND ntok <= 10000 THEN 0.4 ELSE 0.0 END) +
       |    (CASE WHEN atl >= 2.5 AND atl <= 12.0 THEN 0.3 ELSE 0.0 END) +
       |    (CASE WHEN npunct / greatest(n, 1.0) <= 0.1
       |      THEN 0.15 ELSE 0.0 END) +
       |    (CASE WHEN ndigit / greatest(n, 1.0) <= 0.2
       |      THEN 0.15 ELSE 0.0 END) AS quality
       |  FROM ($qualitySub) q0),
       |qg AS MATERIALIZED (SELECT doc_id, url, text, quality FROM qx
       |  WHERE length(text) >= 50 AND quality >= 0.3),
       |ew AS (SELECT min(doc_id) AS doc_id FROM qg GROUP BY text),
       |k2 AS MATERIALIZED (SELECT g.doc_id, g.url, g.text, g.quality FROM qg g
       |  JOIN ew USING (doc_id)),
       |tk2 AS (SELECT doc_id, $tokensOfTextSql AS ts FROM k2),
       |sh2 AS MATERIALIZED (SELECT doc_id AS id, list_distinct(${shinglesSql(3)})
       |    AS shingles FROM tk2),
       |p2 AS MATERIALIZED (SELECT a.id AS id_a, b.id AS id_b FROM sh2 a, sh2 b
       |  WHERE a.id < b.id
       |    AND CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
       |      / len(list_distinct(a.shingles || b.shingles)) >= 0.7),
       |edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM p2
       |  UNION SELECT id_b, id_a FROM p2),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |reach(id, lab) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.id),
       |losers AS (SELECT id FROM reach GROUP BY id HAVING id <> min(lab)),
       |k3 AS MATERIALIZED (SELECT k2.doc_id, k2.url, k2.text, k2.quality FROM k2
       |  LEFT JOIN losers l ON k2.doc_id = l.id WHERE l.id IS NULL),
       |bts AS (SELECT $tokensOfTextSql AS ts FROM (
       |  SELECT text FROM documents WHERE doc_id % 97 = 0
       |  ORDER BY doc_id LIMIT 50) b0),
       |bsh AS (SELECT DISTINCT unnest(list_distinct(${shinglesSql(5)}))
       |    AS sh FROM bts),
       |csh AS (SELECT id AS doc_id, unnest(shingles) AS sh FROM (
       |  SELECT doc_id AS id, list_distinct(${shinglesSql(5)}) AS shingles
       |  FROM (SELECT doc_id, $tokensOfTextSql AS ts FROM k3) t3) t4),
       |contam AS (SELECT DISTINCT c.doc_id FROM csh c JOIN bsh USING (sh)),
       |k4 AS (SELECT k3.doc_id, k3.url, k3.text, k3.quality FROM k3
       |  LEFT JOIN contam c ON k3.doc_id = c.doc_id WHERE c.doc_id IS NULL)"""
      .stripMargin
  }

  /** The assignSplit replay: md5('graft' || id) first-8-hex draw
    * against the cumulative-fraction thresholds, computed with the
    * SAME IEEE fold as Sampling.assignSplit. */
  private def splitCaseSql: String = {
    val c1 = 0.0 + 0.98
    val c2 = c1 + 0.01
    val draw = "substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 8)"
    s"""CASE WHEN $draw < '${graft.ops.Sampling.thresholdHex(c1)}'
       |    THEN 'train'
       |  WHEN $draw < '${graft.ops.Sampling.thresholdHex(c2)}' THEN 'val'
       |  ELSE 'test' END""".stripMargin
  }

  private def curateCrawlOracle: String =
    s"""WITH RECURSIVE
       |${curatePagesCte(withSyndication = false)},
       |$curateChainCtes
       |SELECT doc_id, url, text,
       |  CAST(round(quality * 10000) AS BIGINT) AS q4,
       |  $splitCaseSql AS split
       |FROM k4""".stripMargin

  private def curateHttpOracle: String =
    s"""WITH RECURSIVE
       |${curatePagesCte(withSyndication = true)},
       |$curateChainCtes
       |SELECT doc_id, url, text,
       |  CAST(round(quality * 10000) AS BIGINT) AS q4,
       |  $splitCaseSql AS split,
       |  CAST(CASE WHEN doc_id % 29 = 0 AND doc_id < 100000
       |    THEN 1 ELSE 0 END AS BIGINT) AS n_aliases
       |FROM k4""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // the composed curation pipelines, replayed stage by stage (see the
    // query-side comments for the LSH-recall argument that makes the
    // brute-force pair CTE the exact twin of the MinHash stage)
    "curate_crawl_e2e" -> curateCrawlOracle,
    "curate_http_e2e" -> curateHttpOracle,

    "html_extract" ->
      s"""WITH h AS (SELECT doc_id, $plantedHtmlSql AS html FROM documents)
         |SELECT doc_id,
         |  CASE WHEN len(regexp_extract(html,
         |      '(?is)<title[^>]*>(.*?)</title>', 1)) > 0
         |    THEN trim(${entitySql("regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1)")})
         |    END AS title,
         |  CAST(len(regexp_extract_all(html, '(?is)<a[\\s>]')) AS INT)
         |    AS n_anchors,
         |  $htmlToTextSql AS text_clean
         |FROM h""".stripMargin,

    "html_block_filter" ->
      s"""WITH h AS (SELECT doc_id, $plantedHtmlSql AS html FROM documents),
         |marked AS (SELECT doc_id,
         |    regexp_replace(regexp_replace(
         |      regexp_replace(regexp_replace(regexp_replace(html,
         |        '(?s)<!--.*?-->', '', 'g'),
         |        '(?is)<script[^>]*>.*?</script>', '', 'g'),
         |        '(?is)<style[^>]*>.*?</style>', '', 'g'),
         |      '(?i)<br[^>]*>', chr(10), 'g'),
         |      '(?i)</(p|div|li|h[1-6]|tr|ul|ol|table|blockquote|section|article|header|footer|nav|title)>', chr(10), 'g')
         |    AS m FROM h),
         |flat AS (SELECT doc_id, u.idx AS block_idx, u.b AS b FROM (
         |  SELECT doc_id, unnest(list_transform(range(0, len(bs)),
         |      i -> struct_pack(idx := i, b := bs[i+1]))) AS u
         |  FROM (SELECT doc_id, string_split(m, chr(10)) AS bs FROM marked))),
         |scored AS (SELECT doc_id, block_idx,
         |    len(b) - len(regexp_replace(b, '(?is)<a[^>]*>.*?</a>', '', 'g'))
         |      AS anchor_chars,
         |    len(b) AS block_chars,
         |    trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         |      ${entitySql("regexp_replace(b, '<[^>]*>', '', 'g')")},
         |      '[ \t\r]+', ' ', 'g'), ' ?\n ?', chr(10), 'g'),
         |      '\n+', chr(10), 'g'), '^\n+|\n+$$', '', 'g')) AS text
         |  FROM flat),
         |k AS (SELECT doc_id, block_idx, text,
         |    (len(text) > 0 AND anchor_chars * 100 <= block_chars * 50) AS keep
         |  FROM scored)
         |SELECT doc_id,
         |  CAST(sum(CASE WHEN len(text) > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_blocks,
         |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  string_agg(CASE WHEN keep THEN text END, chr(10)
         |    ORDER BY block_idx) AS text_content
         |FROM k GROUP BY doc_id""".stripMargin,

    "url_domains" ->
      s"""WITH u AS (SELECT $plantedUrlSql AS url, n_chars FROM documents),
         |c AS (SELECT $hostSql AS host, $canonicalSql AS canonical_url,
         |    n_chars FROM u),
         |r AS (SELECT $registeredDomainSql AS domain, host, canonical_url,
         |    n_chars FROM c)
         |SELECT domain, count(*) AS n_docs,
         |  count(DISTINCT host) AS n_hosts,
         |  count(DISTINCT canonical_url) AS n_pages,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM r GROUP BY domain""".stripMargin,

    "warc_http_responses" ->
      s"""WITH u AS (SELECT doc_id, text, $plantedUrlSql AS url FROM documents)
         |SELECT '<urn:graft:' || CAST(doc_id AS VARCHAR) || '>' AS record_id,
         |  url AS target_uri,
         |  CASE WHEN doc_id % 23 = 0 THEN NULL
         |       WHEN doc_id % 17 = 0 THEN 404 ELSE 200 END AS status,
         |  CASE WHEN doc_id % 23 = 0 THEN NULL
         |       WHEN doc_id % 5 = 0 THEN 'text/html'
         |       ELSE 'text/plain' END AS mime,
         |  CASE WHEN doc_id % 23 = 0 THEN NULL ELSE 'utf-8' END AS charset,
         |  text AS body_text
         |FROM u""".stripMargin,

    "url_domains_psl" ->
      s"""WITH u AS (SELECT doc_id, $plantedUrlSql AS url FROM documents),
         |h AS (SELECT doc_id, $hostSql AS host FROM u),
         |hh AS (SELECT DISTINCT host FROM h),
         |lab AS (SELECT host, string_split(host, '.') AS ls FROM hh),
         |cs AS (SELECT host, unnest(range(1, len(ls)+1)) AS i, ls FROM lab),
         |ce AS (SELECT host, i,
         |    array_to_string(ls[i:len(ls)], '.') AS suffix FROM cs),
         |ps(suffix) AS (VALUES ('com'), ('org'), ('co.uk'), ('example.com')),
         |best AS (SELECT host, min(i) AS bi
         |  FROM ce JOIN ps USING (suffix) GROUP BY host),
         |dom AS (SELECT l.host,
         |    CASE WHEN b.bi IS NULL THEN
         |        CASE WHEN len(l.ls) >= 2
         |          THEN array_to_string(l.ls[len(l.ls)-1:len(l.ls)], '.')
         |          ELSE l.host END
         |      WHEN b.bi = 1 THEN l.host
         |      ELSE array_to_string(l.ls[b.bi-1:len(l.ls)], '.') END AS domain
         |  FROM lab l LEFT JOIN best b ON l.host = b.host)
         |SELECT d.domain, count(*) AS n_docs,
         |  count(DISTINCT h.host) AS n_hosts
         |FROM h JOIN dom d ON h.host = d.host
         |GROUP BY d.domain""".stripMargin,

    "url_robots_gate" ->
      s"""WITH u AS (SELECT doc_id, $plantedUrlSql AS url FROM documents),
         |h AS (SELECT doc_id, url, $hostSql AS host FROM u),
         |k AS (SELECT doc_id, $registeredDomainSql AS domain,
         |    CASE WHEN len(regexp_replace(regexp_extract(url,
         |          '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1),
         |          '/+$$', '', 'g')) > 0
         |        THEN regexp_replace(regexp_extract(url,
         |          '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1),
         |          '/+$$', '', 'g')
         |        ELSE '/' END AS path
         |  FROM h),
         |r(domain, allow, prefix, pattern) AS (VALUES
         |  ('example.com', FALSE, '/path/a1', CAST(NULL AS VARCHAR)),
         |  ('example.com', TRUE,  '/path/a12', NULL),
         |  ('example.com', FALSE, '/path/a123', NULL),
         |  ('example.com', TRUE,  '/path/a4', NULL),
         |  ('example.com', FALSE, '/path/a4', NULL),
         |  ('example.com', FALSE, '/*4$$', '^/.*4$$'),
         |  ('example.com', TRUE,  '/path/a*44$$', '^/path/a.*44$$'),
         |  ('example.co.uk', FALSE, '/path/a7', NULL),
         |  ('example.co.uk', TRUE, '/path/a77$$', '^/path/a77$$'),
         |  ('sample.org', TRUE,  '/', NULL),
         |  ('sample.org', FALSE, '/path/a5', NULL),
         |  ('sample.org', FALSE, '/path/a2*', '^/path/a2.*')),
         |m AS (SELECT k.doc_id, k.domain, k.path,
         |    max(CASE WHEN r.prefix IS NOT NULL
         |        THEN 2 * len(r.prefix) +
         |          CASE WHEN r.allow THEN 1 ELSE 0 END END) AS score
         |  FROM k LEFT JOIN r
         |    ON k.domain = r.domain AND (CASE WHEN r.pattern IS NOT NULL
         |        THEN regexp_matches(k.path, r.pattern)
         |        ELSE starts_with(k.path, r.prefix) END)
         |  GROUP BY k.doc_id, k.domain, k.path)
         |SELECT doc_id, domain, path,
         |  coalesce(score % 2 = 1, TRUE) AS allowed
         |FROM m""".stripMargin,

    "warc_redirects" -> {
      def hop(i: Int, j: Int) =
        s"""c$j AS (SELECT c.uri,
           |    CASE WHEN s.from_uri IS NOT NULL THEN s.to_uri
           |      ELSE c.cur_uri END AS cur_uri,
           |    CASE WHEN s.from_uri IS NOT NULL THEN s.to_st
           |      ELSE c.cur_st END AS cur_st,
           |    CASE WHEN s.from_uri IS NOT NULL THEN s.to_loc
           |      ELSE c.cur_loc END AS cur_loc,
           |    c.hops + CASE WHEN s.from_uri IS NOT NULL THEN 1 ELSE 0 END
           |      AS hops
           |  FROM c$i c LEFT JOIN s ON c.cur_uri = s.from_uri
           |    AND c.cur_st BETWEEN 300 AND 399 AND c.cur_loc IS NOT NULL)"""
          .stripMargin
      s"""WITH b AS (SELECT
         |    'https://r.example.com/p/' || CAST(doc_id AS VARCHAR) AS uri,
         |    CASE WHEN doc_id % 4 = 0 THEN 200 ELSE 301 END AS st,
         |    CASE WHEN doc_id % 4 = 0 THEN NULL
         |      WHEN doc_id % 5 = 0
         |        THEN 'https://r.example.com/p/' || CAST(doc_id AS VARCHAR)
         |      WHEN doc_id % 7 = 0
         |        THEN 'https://external.example.org/x' || CAST(doc_id AS VARCHAR)
         |      ELSE 'https://r.example.com/p/' || CAST(doc_id - 1 AS VARCHAR)
         |      END AS loc
         |  FROM documents),
         |s AS (SELECT b.uri AS from_uri, b.loc AS to_uri,
         |    t.st AS to_st, t.loc AS to_loc
         |  FROM b LEFT JOIN b t ON b.loc = t.uri
         |  WHERE b.st BETWEEN 300 AND 399 AND b.loc IS NOT NULL),
         |c0 AS (SELECT uri, uri AS cur_uri, st AS cur_st, loc AS cur_loc,
         |    0 AS hops FROM b),
         |${hop(0, 1)},
         |${hop(1, 2)},
         |${hop(2, 3)},
         |${hop(3, 4)}
         |SELECT uri, cur_uri AS final_uri, cur_st AS final_status, hops,
         |  NOT coalesce(cur_st BETWEEN 300 AND 399 AND cur_loc IS NOT NULL,
         |    FALSE) AS resolved
         |FROM c4""".stripMargin
    },

    "url_dedup_declared" ->
      s"""WITH u AS (SELECT doc_id, $plantedUrlSql AS url FROM documents),
         |k AS (SELECT doc_id, url,
         |    CASE WHEN doc_id % 3 = 0
         |      THEN 'https://canon.example.com/p/' || CAST(doc_id % 7 AS VARCHAR)
         |      ELSE $canonicalSql END AS canonical_url
         |  FROM u),
         |w AS (SELECT canonical_url, min(doc_id) AS doc_id,
         |    CAST(count(*) AS BIGINT) AS n_dups
         |  FROM k GROUP BY canonical_url)
         |SELECT u.doc_id, u.url, w.canonical_url, w.n_dups
         |FROM u JOIN w ON u.doc_id = w.doc_id""".stripMargin,

    "html_meta" ->
      """SELECT doc_id,
        |  'Summary & notes ' || CAST(doc_id AS VARCHAR) AS description,
        |  'alpha, beta' AS keywords,
        |  CASE WHEN doc_id % 3 = 0
        |      THEN 'https://canon.example.com/p/' || CAST(doc_id % 7 AS VARCHAR)
        |    WHEN doc_id % 3 = 1
        |      THEN 'https://canon.example.com/q/' || CAST(doc_id % 7 AS VARCHAR)
        |    ELSE NULL END AS canonical
        |FROM documents""".stripMargin,

    "warc_decode_charset" ->
      "SELECT doc_id, text || ' café ü' AS text FROM documents",

    "robots_from_http" ->
      """SELECT * FROM (VALUES
        |  ('ok.example', FALSE, '/private'),
        |  ('ok.example', TRUE,  '/private/pub'),
        |  ('down.example', FALSE, '/'),
        |  ('raw.example', FALSE, '/raw'))
        |  AS t(domain, allow, prefix)""".stripMargin,

    "sitemap_urls" ->
      s"""WITH x AS (SELECT doc_id,
         |    CASE WHEN doc_id % 20 = 0 THEN
         |      '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">' ||
         |      '<sitemap><loc>https://site' || CAST(doc_id % 50 AS VARCHAR) ||
         |      '.example.com/sm/' || CAST(doc_id AS VARCHAR) ||
         |      '/1.xml</loc><lastmod>2026-02-' ||
         |      lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') ||
         |      '</lastmod></sitemap>' ||
         |      '<sitemap><loc>https://site' || CAST(doc_id % 50 AS VARCHAR) ||
         |      '.example.com/sm/' || CAST(doc_id AS VARCHAR) ||
         |      '/2.xml</loc></sitemap>' ||
         |      '</sitemapindex>'
         |    ELSE
         |      '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">' ||
         |      '<url><loc> https://site' || CAST(doc_id % 50 AS VARCHAR) ||
         |      '.example.com/doc/' || CAST(doc_id * 3 AS VARCHAR) ||
         |      ' </loc><lastmod>2026-01-' ||
         |      lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') ||
         |      '</lastmod></url>' ||
         |      '<url><loc>https://site' || CAST(doc_id % 50 AS VARCHAR) ||
         |      '.example.com/doc/' || CAST(doc_id * 3 + 1 AS VARCHAR) ||
         |      '?a=1&amp;b=2</loc></url>' ||
         |      '<url><loc>https://site' || CAST(doc_id % 50 AS VARCHAR) ||
         |      '.example.com/doc/' || CAST(doc_id * 3 + 2 AS VARCHAR) ||
         |      '</loc><priority>0.5</priority></url>' ||
         |      '</urlset>'
         |    END AS xml FROM documents),
         |b AS (SELECT doc_id,
         |    contains(lower(xml), '<sitemapindex') AS is_index,
         |    unnest(regexp_extract_all(xml,
         |      '(?is)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>', 1)) AS entry
         |  FROM x),
         |e AS (SELECT doc_id, is_index,
         |    ${entitySql("regexp_extract(entry, '(?is)<loc>\\s*(.*?)\\s*</loc>', 1)")} AS url,
         |    CASE WHEN len(regexp_extract(entry,
         |        '(?is)<lastmod>\\s*(.*?)\\s*</lastmod>', 1)) > 0
         |      THEN regexp_extract(entry,
         |        '(?is)<lastmod>\\s*(.*?)\\s*</lastmod>', 1) END AS lastmod
         |  FROM b)
         |SELECT doc_id, url, lastmod, is_index FROM e
         |WHERE len(url) > 0""".stripMargin,

    "robots_directives" ->
      """SELECT * FROM (VALUES
        |  ('example.com', CAST(2000 AS BIGINT),
        |   'https://example.com/sm1.xml,https://example.com/sm2.xml'),
        |  ('example.co.uk', CAST(750 AS BIGINT), ''),
        |  ('sample.org', CAST(NULL AS BIGINT), 'https://sample.org/a.xml'))
        |  AS t(domain, crawl_delay_ms, sitemaps_csv)""".stripMargin,

    "url_domain_prior" ->
      s"""WITH t AS (SELECT doc_id, source,
         |    CAST(length(text) AS DOUBLE) AS n,
         |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
         |        x -> len(x) > 0)) AS DOUBLE) AS ntok,
         |    CAST(length(text) - length(regexp_replace(text,
         |        '[.,;:!?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE) AS npunct,
         |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
         |        AS DOUBLE) AS ndigit,
         |    CASE WHEN len(list_filter(string_split_regex(trim(text), '\\s+'),
         |        x -> len(x) > 0)) > 0
         |      THEN CAST(list_sum(list_transform(
         |          list_filter(string_split_regex(trim(text), '\\s+'),
         |            x -> len(x) > 0), x -> len(x))) AS DOUBLE)
         |        / len(list_filter(string_split_regex(trim(text), '\\s+'),
         |            x -> len(x) > 0))
         |      ELSE 0.0 END AS atl
         |  FROM documents),
         |q AS (SELECT doc_id, source, round(CAST(
         |    (CASE WHEN ntok >= 10 AND ntok <= 10000 THEN 0.4 ELSE 0.0 END) +
         |    (CASE WHEN atl >= 2.5 AND atl <= 12.0 THEN 0.3 ELSE 0.0 END) +
         |    (CASE WHEN npunct / greatest(n, 1.0) <= 0.1 THEN 0.15 ELSE 0.0 END) +
         |    (CASE WHEN ndigit / greatest(n, 1.0) <= 0.2 THEN 0.15 ELSE 0.0 END)
         |    AS DOUBLE), 4) AS quality
         |  FROM t),
         |u AS (SELECT doc_id, CAST(round(quality * 10000) AS BIGINT) AS q4,
         |    $plantedUrlSql AS url FROM q),
         |h AS (SELECT doc_id, q4, $hostSql AS host FROM u),
         |k AS (SELECT doc_id, q4, $registeredDomainSql AS domain FROM h),
         |p AS (SELECT domain, count(*) AS domain_docs,
         |    CAST(sum(q4) AS BIGINT) AS qsum FROM k GROUP BY domain)
         |SELECT k.doc_id, k.domain, k.q4, p.domain_docs,
         |  CAST(floor(qsum / domain_docs) AS BIGINT) AS domain_mean_q4
         |FROM k JOIN p USING (domain)""".stripMargin,

    "url_dedup_canonical" ->
      s"""WITH u AS (
         |  SELECT doc_id AS id, $plantedUrlSql AS url FROM documents
         |  UNION ALL
         |  SELECT doc_id + 7000000 AS id, $variantUrlSql AS url
         |  FROM documents WHERE doc_id % 11 = 0),
         |c AS (SELECT id, $canonicalSql AS canonical_url FROM u)
         |SELECT min(id) AS id, canonical_url, count(*) AS n_dups
         |FROM c GROUP BY canonical_url""".stripMargin,

    "src_warc_roundtrip" -> "SELECT doc_id, text FROM documents",
    "src_tfrecord_roundtrip" ->
      "SELECT doc_id, n_chars, text FROM documents",
    "src_jsonl_roundtrip" ->
      "SELECT doc_id, lang, source, text FROM documents",

    "src_warc_fetch" ->
      "SELECT doc_id, text FROM documents WHERE doc_id % 101 = 0")
}
