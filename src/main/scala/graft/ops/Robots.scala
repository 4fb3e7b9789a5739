package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** robots.txt compliance gate (REP, RFC 9309) — the first filter a
  * crawl corpus passes: pages fetched from paths the site disallows
  * for the crawler's agent are dropped before any content work.
  * Group selection per §2.2.1: groups naming the crawler's product
  * token govern when present (case-insensitive, multiple groups
  * combine), else the `*` groups — the default `agent = "*"` reads
  * the wildcard policy. Common Crawl ships the robots responses as
  * their own WARC set, so the natural flow is robots WARCs →
  * [[parseRulesTable]] → broadcast gate over the page corpus.
  *
  * Semantics (the RFC's longest-match rule): the most specific
  * matching rule (longest pattern, RFC 9309 §2.2.2 "most octets")
  * decides; on an exact length tie, Allow wins; no matching rule means
  * allowed. Rule patterns support the §2.2.3 special characters —
  * `*` matches any run of octets and a TRAILING `$` anchors the match
  * to the end of the path (elsewhere `$` is literal) — compiled
  * site-side to regexes by [[compilePattern]]; wildcard-free rules
  * keep the prefix fast path. Specificity is the raw pattern's length
  * (wildcard octets count, as in Google's reference matcher), encoded
  * as integer arithmetic — score = 2·len(pattern) + (allow ? 1 : 0),
  * decision = max score odd — so the DuckDB oracle replays the
  * decision exactly.
  *
  * Scale shape: parsing is one imperative flatMap over the robots
  * table (sites-sized, not corpus-sized); the gate joins the corpus
  * against the BROADCAST rule table on (domain, prefix-match) and
  * reduces with one max — the only shuffle is the per-page group-max,
  * keyed by page id with no payload columns.
  */
object Robots {

  val ruleSchema: StructType = StructType(Seq(
    StructField("domain", StringType),
    StructField("allow", BooleanType),
    StructField("prefix", StringType)))

  /** All rule groups of one robots.txt body: (agent tokens, rules).
    * Group handling per RFC 9309: consecutive `User-agent:` lines
    * stack onto one group; `#` comments stripped; an empty `Disallow:`
    * value means "no restriction" and yields no rule. Agent tokens are
    * lowercased (§2.2.1 matching is case-insensitive). */
  def parseGroups(robotsTxt: String)
      : Seq[(Set[String], Seq[(Boolean, String)])] = {
    val groups = Seq.newBuilder[(Set[String], Seq[(Boolean, String)])]
    var curAgents = Set.empty[String]
    val curRules = Seq.newBuilder[(Boolean, String)]
    var started = false
    var inAgentRun = false
    def flush(): Unit = if (started) {
      groups += ((curAgents, curRules.result())); curRules.clear()
    }
    Option(robotsTxt).getOrElse("").split("\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val key = line.substring(0, i).trim.toLowerCase
        val value = line.substring(i + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgentRun) { flush(); curAgents = Set.empty; started = true }
            inAgentRun = true
            if (value.nonEmpty) curAgents += value.toLowerCase
          case "allow" | "disallow" =>
            inAgentRun = false
            // rules before any User-agent line belong to no group (ignored)
            if (started && value.nonEmpty)
              curRules += ((key == "allow", value))
          case _ => inAgentRun = false
        }
      }
    }
    flush()
    groups.result()
  }

  /** The rules governing `agent` per RFC 9309 §2.2.1: groups naming
    * the crawler's product token (case-insensitive exact match) apply
    * when any exist — multiple matching groups COMBINE — otherwise the
    * `*` groups; no group at all means no restrictions. */
  def parseRules(robotsTxt: String,
                 agent: String = "*"): Seq[(Boolean, String)] = {
    val groups = parseGroups(robotsTxt)
    val tok = agent.toLowerCase
    val mine =
      if (tok != "*") groups.filter(_._1.contains(tok)) else Seq.empty
    val chosen = if (mine.nonEmpty) mine
                 else groups.filter(_._1.contains("*"))
    chosen.flatMap(_._2)
  }

  /** (domain, robots_txt) → one rule row per directive governing
    * `agent` (§2.2.1 group selection; default the `*` groups):
    * (domain, allow, prefix). Imperative per-site parse — the robots
    * table is sites-sized, never corpus-sized. */
  def parseRulesTable(robots: DataFrame, domainCol: String = "domain",
                      textCol: String = "robots_txt",
                      agent: String = "*"): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(ruleSchema)
    robots.select(col(domainCol).as("domain"), col(textCol).as("t"))
      .flatMap { r =>
        parseRules(r.getString(1), agent).map { case (allow, prefix) =>
          Row(r.getString(0), allow, prefix)
        }
      }(enc)
  }

  val directiveSchema: StructType = StructType(Seq(
    StructField("domain", StringType),
    StructField("crawl_delay_ms", LongType),
    StructField("sitemaps", ArrayType(StringType))))

  /** Parse the NON-rule directives a crawl frontier consumes:
    * `Crawl-delay` from the groups governing `agent` (the de-facto
    * politeness extension — §2.2.1 group selection, last chosen-group
    * value wins, non-numeric ignored). Sites commonly spell FRACTIONAL
    * seconds (`Crawl-delay: 0.5`), so the value parses as decimal
    * seconds and is carried as integer MILLISECONDS (floor at the
    * sub-ms digit; negatives ignored). Also collects `Sitemap:` lines
    * (RFC 9309 §2.3 — group-INdependent, in file order). Returns
    * (crawlDelayMillis, sitemaps). */
  def parseDirectives(robotsTxt: String,
                      agent: String = "*"): (Option[Long], Seq[String]) = {
    val maps = Seq.newBuilder[String]
    val delays = Seq.newBuilder[(Set[String], Long)]
    var curAgents = Set.empty[String]
    var started = false
    var inAgentRun = false
    Option(robotsTxt).getOrElse("").split("\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val key = line.substring(0, i).trim.toLowerCase
        val value = line.substring(i + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgentRun) { curAgents = Set.empty; started = true }
            inAgentRun = true
            if (value.nonEmpty) curAgents += value.toLowerCase
          case "sitemap" => // group-independent; ':' inside URL survives
            inAgentRun = false
            if (value.nonEmpty) maps += value
          case "crawl-delay" =>
            inAgentRun = false
            if (started) parseDelayMs(value)
              .foreach(d => delays += ((curAgents, d)))
          case _ => inAgentRun = false
        }
      }
    }
    val tok = agent.toLowerCase
    val all = delays.result()
    val mine = if (tok != "*") all.filter(_._1.contains(tok)) else Seq.empty
    val chosen = if (mine.nonEmpty) mine else all.filter(_._1.contains("*"))
    (chosen.lastOption.map(_._2), maps.result())
  }

  /** Decimal-seconds delay value → non-negative millis; anything that
    * isn't a plain decimal number (`12`, `0.5`, `2.`) is ignored, like
    * the old integer parse ignored non-numerics. Digits beyond the
    * millisecond truncate (integer arithmetic — no double rounding). */
  private[ops] def parseDelayMs(value: String): Option[Long] = {
    val dot = value.indexOf('.')
    val (whole, frac) =
      if (dot < 0) (value, "") else (value.take(dot), value.drop(dot + 1))
    val fracDigits = frac.take(3).padTo(3, '0')
    if (!whole.forall(_.isDigit) || whole.isEmpty && frac.isEmpty ||
        !frac.forall(_.isDigit)) None
    else for {
      w <- (if (whole.isEmpty) Some(0L) else whole.toLongOption)
      f <- fracDigits.toLongOption
    } yield w * 1000L + f
  }

  /** (domain, robots_txt) → (domain, crawl_delay_ms, sitemaps) — the
    * frontier pacing/seeding table for `agent` (§2.2.1 selection,
    * default `*`). `crawl_delay_ms` NULL when the governing groups set
    * none; `sitemaps` possibly empty. Sites-sized, imperative parse,
    * same contract as [[parseRulesTable]]. */
  def parseDirectivesTable(robots: DataFrame, domainCol: String = "domain",
                           textCol: String = "robots_txt",
                           agent: String = "*"): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(directiveSchema)
    robots.select(col(domainCol).as("domain"), col(textCol).as("t"))
      .map { r =>
        val (delay, maps) = parseDirectives(r.getString(1), agent)
        Row(r.getString(0), delay.map(Long.box).orNull, maps)
      }(enc)
  }

  /** Rules from FETCHED robots responses (RFC 9309 §2.3.1): the
    * robots.txt WARC set parsed through [[graft.sources.Warc
    * .httpResponses]] gives (domain, status, body); per the RFC's
    * availability semantics a 2xx body parses normally, a 4xx means
    * "unavailable" → crawl as if there were no rules (no rows), and
    * 5xx means "unreachable" → complete disallow (one `Disallow: /`
    * row). Redirects (§2.3.1.2): crawlers MUST follow them — resolve
    * the robots capture set through [[graft.sources.Warc
    * .resolveRedirects]] BEFORE this call so a 3xx row carries its
    * final status/body; a 3xx still present here is an exhausted or
    * unconsumable chain, which the RFC treats as UNAVAILABLE (no rows,
    * crawl unrestricted), not as disallow-all. A NULL status (a bare
    * robots.txt body, not an HTTP capture) parses as raw text.
    * Sites-sized imperative map, same contract as [[parseRulesTable]]. */
  def rulesFromHttp(responses: DataFrame, domainCol: String = "domain",
                    statusCol: String = "status",
                    bodyCol: String = "body_text",
                    agent: String = "*"): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(ruleSchema)
    responses
      .select(col(domainCol).as("domain"), col(statusCol).cast("int"),
        col(bodyCol))
      .flatMap { r =>
        val domain = r.getString(0)
        val status = if (r.isNullAt(1)) None else Some(r.getInt(1))
        val body = if (r.isNullAt(2)) "" else r.getString(2)
        val rules = status match {
          case None => parseRules(body, agent)                 // raw body
          case Some(s) if s >= 200 && s <= 299 => parseRules(body, agent)
          case Some(s) if s >= 300 && s <= 499 => Seq.empty    // unavailable
          case _ => Seq((false, "/"))                          // unreachable
        }
        rules.map { case (allow, prefix) => Row(domain, allow, prefix) }
      }(enc)
  }

  /** Compile one RFC 9309 rule pattern to an anchored regex, or None
    * when the pattern is wildcard-free (the `startsWith` fast path
    * suffices — the overwhelmingly common case, and the one that stays
    * fully codegen'd). §2.2.3 specials: `*` → `.*` (any run of
    * octets), a TRAILING `$` → end anchor; a non-trailing `$` and all
    * regex metacharacters are escaped to literals. Emitted regexes
    * stay in the RE2 ∩ java.util.regex dialect (plain escapes, `^`/`$`
    * anchors, `.*`) so the DuckDB oracle replays matches exactly. */
  def compilePattern(p: String): Option[String] =
    if (!p.contains('*') && !p.endsWith("$")) None
    else {
      val endAnchor = p.endsWith("$")
      val body = if (endAnchor) p.dropRight(1) else p
      val sb = new StringBuilder("^")
      body.foreach {
        case '*' => sb.append(".*")
        case c if "\\.[]{}()+?^$|".indexOf(c.toInt) >= 0 =>
          sb.append('\\').append(c)
        case c => sb.append(c)
      }
      if (endAnchor) sb.append('$')
      Some(sb.toString)
    }

  /** Gate a page table by a rule table: adds `domain`, `path`,
    * `allowed`. The rule table is compiled site-side ([[compilePattern]]
    * — per-rule regex compile is free at sites scale), collapses to
    * ONE array row per domain and broadcasts, so the corpus pays a
    * broadcast equi-join and an in-row fold over its domain's rules —
    * NO shuffle at all; page rows never move. Wildcard-free rules
    * match by `startsWith` (codegen'd); only rules carrying `*`/`$`
    * pay a regex evaluation, and only on their own domain's pages. */
  def gate(df: DataFrame, urlCol: String, rules: DataFrame): DataFrame = {
    val compiledSchema = StructType(Seq(
      StructField("domain", StringType), StructField("allow", BooleanType),
      StructField("prefix", StringType), StructField("pattern", StringType)))
    val cenc = org.apache.spark.sql.Encoders.row(compiledSchema)
    val compiled = rules
      .select(col("domain"), col("allow"), col("prefix"))
      .map { r =>
        Row(r.getString(0), r.getBoolean(1), r.getString(2),
          compilePattern(r.getString(2)).orNull)
      }(cenc)
    val ruleSets = compiled.groupBy(col("domain"))
      .agg(collect_list(
        struct(col("allow"), col("prefix"), col("pattern"))).as("rules"))
    val pages = df
      .withColumn("domain", UrlTools.registeredDomainOf(col(urlCol)))
      .withColumn("path", UrlTools.pathOf(col(urlCol)))
    // max over matching rules of 2*len(pattern) + allow; -1 = no match
    val best = aggregate(
      filter(col("rules"), r =>
        when(r.getField("pattern").isNotNull,
          regexp_like(col("path"), r.getField("pattern")))
          .otherwise(col("path").startsWith(r.getField("prefix")))),
      lit(-1),
      (acc, r) => greatest(acc,
        length(r.getField("prefix")) * 2 +
          when(r.getField("allow"), 1).otherwise(0)))
    pages.join(broadcast(ruleSets), Seq("domain"), "left")
      .withColumn("allowed",
        col("rules").isNull || best < 0 || best % 2 === 1)
      .drop("rules")
  }
}
