package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and domain analytics for crawled corpora — the
  * dedup key and per-source accounting a web-scale pipeline applies
  * BEFORE content-level dedup: two crawls of the same page differ by
  * tracking params / host case / fragment long before their HTML
  * differs, and per-registered-domain caps (the `cap_per_source`
  * pattern keyed on real domains) need the registrable domain, not the
  * raw host.
  *
  * Scale shape: every derivation is a codegen'd regexp Column — the
  * canonical key costs one scan projection; `domainStats` pays one
  * partial-agg shuffle keyed by registered domain; `dedupByCanonical`
  * pays one canonical-key shuffle carrying (key, id) only.
  *
  * All regexes live in the RE2 ∩ java.util.regex dialect (no
  * lookaround) so DuckDB oracles replay the chain exactly.
  */
object UrlTools {

  /** Lowercased host, `www.` prefix and port dropped. */
  def hostOf(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)),
      "^www\\.|:[0-9]+$", "")

  /** Lowercased scheme. */
  def schemeOf(url: Column): Column =
    lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))

  /** Path component (no query/fragment), trailing slashes trimmed,
    * empty → "/". */
  def pathOf(url: Column): Column = {
    val p = regexp_replace(
      regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/+$", "")
    when(length(p) > 0, p).otherwise(lit("/"))
  }

  /** Query string with tracking params removed (utm_*, fbclid, gclid,
    * ref), separators repaired; empty → NULL.
    *
    * Two mechanical passes (identical in RE2): drop `key=value`
    * tracking pairs with their LEADING separator (the re-prepended `?`
    * makes the first pair separator-carrying too), then strip whatever
    * separator run leads the survivors (`&a=1` when the first original
    * pair was dropped, `?a=1` when it was not). */
  def cleanQueryOf(url: Column): Column = {
    val raw = regexp_extract(url, "\\?([^#]*)", 1)
    val dropped = regexp_replace(concat(lit("?"), raw),
      "[?&](utm_[a-zA-Z0-9_]+|fbclid|gclid|ref)=[^&#]*", "")
    val q = regexp_replace(dropped, "^[?&]+", "")
    when(length(raw) > 0 && length(q) > 0, q)
  }

  /** Canonical form: lowercased scheme/host, `www.` and port dropped,
    * path slash-normalized, tracking params removed, fragment dropped.
    * The corpus-level page identity key. */
  def canonicalize(url: Column): Column = {
    val base = concat(schemeOf(url), lit("://"), hostOf(url), pathOf(url))
    val q = cleanQueryOf(url)
    when(q.isNotNull, concat(base, lit("?"), q)).otherwise(base)
  }

  /** Country-code second-level suffixes treated as part of the TLD
    * (public-suffix-lite): `a.b.co.uk` registers as `b.co.uk`. The
    * full-table path is [[registeredDomainsOfHosts]] — same rule
    * (longest-suffix match, then one more label), table-driven. */
  private val ccSlds = "(co|com|org|net|ac|gov|edu)\\.(uk|au|jp|in|br|nz|za)"

  /** Table-driven registrable domains — the production path the lite
    * rule approximates: `suffixes` is a public-suffix table (one
    * `suffix` column; the PSL's plain rules — wildcard `*.x` /
    * exception `!y.x` rules are out of scope), and the registrable
    * domain is the LONGEST matching label-suffix plus one preceding
    * label. Handles what the lite rule cannot: arbitrary-depth
    * suffixes (`k12.va.us`) and private registries (`github.io`-style
    * vanity suffixes, where the "domain" is one label under a name
    * that LOOKS registrable itself).
    *
    * Semantics per host: no suffix matches → lite fallback (last two
    * labels, single-label hosts pass through); the host IS a suffix →
    * the host itself (nothing registers above a public suffix).
    *
    * Scale shape: call on DISTINCT hosts (host-sized, 3-5 orders below
    * corpus rows) and broadcast the returned (host, domain) map back —
    * the per-host label explode (×~4 rows) and the min-index group-by
    * stay host-sized; the suffix table broadcasts. */
  def registeredDomainsOfHosts(hosts: DataFrame, hostCol: String,
                               suffixes: DataFrame): DataFrame = {
    val lab = hosts.select(col(hostCol).as("host"),
      split(col(hostCol), "\\.").as("ls"))
    val cands = lab
      .select(col("host"), col("ls"),
        explode(sequence(lit(1), size(col("ls")))).as("i"))
      .select(col("host"), col("i"),
        array_join(slice(col("ls"), col("i"),
          size(col("ls")) - col("i") + 1), ".").as("suffix"))
    val best = cands
      .join(broadcast(suffixes.select(col("suffix"))), Seq("suffix"))
      .groupBy(col("host")).agg(min(col("i")).as("bi"))
    val n = size(col("ls"))
    lab.join(best, Seq("host"), "left")
      .select(col("host"),
        when(col("bi").isNull,
          when(n >= 2, array_join(slice(col("ls"), n - 1, lit(2)), "."))
            .otherwise(col("host")))
          .when(col("bi") === 1, col("host"))
          .otherwise(array_join(
            slice(col("ls"), col("bi") - 1, n - col("bi") + 2), "."))
          .as("domain"))
  }

  /** Registrable domain of a host: last 3 labels when the last two are
    * a cc-SLD pair, else last 2; single-label hosts pass through. */
  def registeredDomainOfHost(host: Column): Column =
    when(host.rlike("\\." + ccSlds + "$"),
      regexp_extract(host, "([^.]+\\." + ccSlds + ")$", 1))
      .when(host.rlike("\\."),
        regexp_extract(host, "([^.]+\\.[^.]+)$", 1))
      .otherwise(host)

  def registeredDomainOf(url: Column): Column =
    registeredDomainOfHost(hostOf(url))

  /** Per-registered-domain accounting over (id, url, nChars): docs,
    * distinct hosts, distinct canonical pages, total chars — the table
    * per-domain caps and crawl dashboards read. One partial-agg
    * shuffle; payloads never move. */
  def domainStats(df: DataFrame, urlCol: String,
                  charsCol: String): DataFrame = {
    val url = col(urlCol)
    df.select(registeredDomainOf(url).as("domain"), hostOf(url).as("host"),
      canonicalize(url).as("canonical_url"), col(charsCol).as("n_chars"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"),
        countDistinct(col("canonical_url")).as("n_pages"),
        sum(col("n_chars")).as("total_chars"))
  }

  /** Domain reputation prior (the CCNet/RefinedWeb-style signal: a
    * page inherits its domain's track record): per-doc quality snapped
    * to 1e-4 integer units (`q4` — the score is a discrete rule sum,
    * so the snap is exact on any IEEE engine), aggregated per
    * registered domain with integer arithmetic (count + sum, mean =
    * floored integer division — order-independent, engine-exact), and
    * joined back onto every doc.
    *
    * Scale shape: one partial-agg shuffle keyed by domain; the prior
    * table is |registrable domains| rows — orders of magnitude smaller
    * than the corpus — so the join-back BROADCASTS and text never
    * shuffles. */
  def domainQualityPrior(df: DataFrame, urlCol: String,
                         qualityCol: String): DataFrame = {
    val keyed = df
      .withColumn("domain", registeredDomainOf(col(urlCol)))
      .withColumn("q4", round(col(qualityCol) * 10000, 0).cast("long"))
    val priors = keyed.groupBy(col("domain"))
      .agg(count(lit(1)).as("domain_docs"), sum(col("q4")).as("qsum"))
      .select(col("domain"), col("domain_docs"),
        floor(col("qsum") / col("domain_docs")).cast("long")
          .as("domain_mean_q4"))
    keyed.drop(qualityCol).join(broadcast(priors), Seq("domain"))
  }

  /** URL-level dedup: one row per canonical URL, keeping the smallest
    * id (deterministic across engines). The shuffle carries
    * (canonical, id); payload columns re-attach by id after the
    * winner is chosen — at corpus scale the text never rides the
    * dedup shuffle. */
  def dedupByCanonical(df: DataFrame, idCol: String,
                       urlCol: String): DataFrame = {
    val keyed = df.select(col(idCol).as("id"),
      canonicalize(col(urlCol)).as("canonical_url"))
    val winners = keyed.groupBy(col("canonical_url"))
      .agg(min(col("id")).as("id"), count(lit(1)).as("n_dups"))
    df.select(col(idCol).as("id"), col(urlCol).as(urlCol))
      .join(winners, Seq("id"))
  }

  /** [[dedupByCanonical]] honoring the PUBLISHER-declared canonical:
    * when the page carries `<link rel="canonical">`, its target (then
    * [[canonicalize]]d) is the dedup key — syndicated copies on
    * different hosts collapse onto the declared original, which plain
    * URL normalization can never do; pages declaring nothing key on
    * their own canonical URL. Same scale shape: the shuffle carries
    * (key, id), the HTML contributes one codegen'd extraction and
    * never moves. */
  def dedupByDeclaredCanonical(df: DataFrame, idCol: String,
                               urlCol: String, htmlCol: String): DataFrame = {
    val key = canonicalize(coalesce(
      HtmlExtract.canonicalLinkOf(col(htmlCol)), col(urlCol)))
    val keyed = df.select(col(idCol).as("id"), key.as("canonical_url"))
    val winners = keyed.groupBy(col("canonical_url"))
      .agg(min(col("id")).as("id"), count(lit(1)).as("n_dups"))
    df.select(col(idCol).as("id"), col(urlCol).as(urlCol))
      .join(winners, Seq("id"))
  }
}
