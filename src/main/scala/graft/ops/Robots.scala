package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** robots.txt compliance gate (REP, RFC 9309) — the first filter a
  * crawl corpus passes: pages fetched from paths the site disallows
  * for `*` are dropped before any content work. Common Crawl ships the
  * robots responses as their own WARC set, so the natural flow is
  * robots WARCs → [[parseRulesTable]] → broadcast gate over the page
  * corpus.
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

  /** Parse one robots.txt body into the `*`-agent rules. Group
    * handling per RFC 9309: consecutive `User-agent:` lines stack onto
    * one group; a group's rules apply here iff one of its agents is
    * `*`; `#` comments stripped; an empty `Disallow:` value means "no
    * restriction" and yields no rule. */
  def parseRules(robotsTxt: String): Seq[(Boolean, String)] = {
    val out = Seq.newBuilder[(Boolean, String)]
    var groupHasStar = false
    var inAgentRun = false
    Option(robotsTxt).getOrElse("").split("\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val key = line.substring(0, i).trim.toLowerCase
        val value = line.substring(i + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgentRun) { groupHasStar = false; inAgentRun = true }
            if (value == "*") groupHasStar = true
          case "allow" | "disallow" =>
            inAgentRun = false
            if (groupHasStar && value.nonEmpty)
              out += ((key == "allow", value))
          case _ => inAgentRun = false
        }
      }
    }
    out.result()
  }

  /** (domain, robots_txt) → one rule row per `*`-agent directive:
    * (domain, allow, prefix). Imperative per-site parse — the robots
    * table is sites-sized, never corpus-sized. */
  def parseRulesTable(robots: DataFrame, domainCol: String = "domain",
                      textCol: String = "robots_txt"): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(ruleSchema)
    robots.select(col(domainCol).as("domain"), col(textCol).as("t"))
      .flatMap { r =>
        parseRules(r.getString(1)).map { case (allow, prefix) =>
          Row(r.getString(0), allow, prefix)
        }
      }(enc)
  }

  val directiveSchema: StructType = StructType(Seq(
    StructField("domain", StringType),
    StructField("crawl_delay", LongType),
    StructField("sitemaps", ArrayType(StringType))))

  /** Parse the NON-rule directives a crawl frontier consumes:
    * `Crawl-delay` from the `*`-agent group (seconds; the de-facto
    * politeness extension — last `*`-group value wins, non-numeric
    * ignored) and `Sitemap:` lines (RFC 9309 §2.3 — group-INdependent,
    * collected in file order). Returns (crawlDelaySeconds, sitemaps). */
  def parseDirectives(robotsTxt: String): (Option[Long], Seq[String]) = {
    var delay: Option[Long] = None
    val maps = Seq.newBuilder[String]
    var groupHasStar = false
    var inAgentRun = false
    Option(robotsTxt).getOrElse("").split("\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val key = line.substring(0, i).trim.toLowerCase
        val value = line.substring(i + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgentRun) { groupHasStar = false; inAgentRun = true }
            if (value == "*") groupHasStar = true
          case "sitemap" => // group-independent; ':' inside URL survives
            inAgentRun = false
            if (value.nonEmpty) maps += value
          case "crawl-delay" =>
            inAgentRun = false
            if (groupHasStar) value.toLongOption.foreach(d => delay = Some(d))
          case _ => inAgentRun = false
        }
      }
    }
    (delay, maps.result())
  }

  /** (domain, robots_txt) → (domain, crawl_delay, sitemaps) — the
    * frontier pacing/seeding table. `crawl_delay` NULL when the
    * `*`-group sets none; `sitemaps` possibly empty. Sites-sized,
    * imperative parse, same contract as [[parseRulesTable]]. */
  def parseDirectivesTable(robots: DataFrame, domainCol: String = "domain",
                           textCol: String = "robots_txt"): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(directiveSchema)
    robots.select(col(domainCol).as("domain"), col(textCol).as("t"))
      .map { r =>
        val (delay, maps) = parseDirectives(r.getString(1))
        Row(r.getString(0), delay.map(Long.box).orNull, maps)
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
