package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hyperlink extraction and host-graph analytics for crawled corpora —
  * the link-structure half of a crawl front end: anchor (`<a href>`)
  * extraction with reference resolution (RFC 3986's common cases),
  * host-level edge derivation, and PageRank over the host graph (the
  * crawl-frontier prioritization / domain-authority signal every
  * production crawler maintains; the quality prior
  * [[UrlTools.domainQualityPrior]] scores CONTENT, this scores the
  * graph).
  *
  * Scale shape:
  *  - [[extractLinks]] is one codegen'd projection + one generator
  *    (`explode` of the per-page href/anchor zip) — cost tracks markup
  *    volume, zero shuffles; the page HTML never rides an exchange;
  *  - [[hostEdges]] collapses links to DISTINCT (src_host, dst_host)
  *    rows — one hash-agg shuffle of host-pair keys (at 100 TB the
  *    host graph is ~1e8 nodes / ~1e10 edges: table sizes a groupBy
  *    handles routinely, and 3-5 orders of magnitude below page rows);
  *  - [[pageRank]] runs fixed-iteration power iteration as join + agg
  *    rounds over the edge table: edges are pre-partitioned by src and
  *    persisted ONCE, so each round shuffles only the host-sized rank
  *    table to the edge partitioning plus the contribution partial agg;
  *    per round the driver sees ONE scalar (the dangling mass) and each
  *    round's ranks are materialized (persist + count) so lineage stays
  *    flat — K rounds, not an exponentially deep plan.
  *
  * All rank arithmetic is INTEGER micro-units (1.0 == 1,000,000, floor
  * division everywhere) so results are engine-exact: the DuckDB oracle
  * replays K unrolled iterations and hash-matches bit for bit — the
  * same determinism discipline as Dsir's micro-nat weights.
  *
  * Reference anchor: rastercube has no web surface (raster sources
  * only); this extends the crawl-ingestion capability the brief asks
  * for (WARC → HTML → URL → link graph).
  */
object LinkGraph {

  /** One `<a ...>` element: href attribute (double-quoted,
    * single-quoted, or bare `href=value` — all three spellings occur
    * constantly in organic markup) and the inner anchor markup. Group 1
    * captures the value WITH its quotes (alternation keeps one group
    * index across spellings); [[stripQuotes]] removes them after
    * extraction. RE2 ∩ java.util.regex dialect (inline flags, lazy
    * quantifiers, no backreferences) so DuckDB oracles replay the
    * extraction exactly. */
  private val anchorRe =
    "(?is)<a\\s[^>]*href\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)[^>]*>(.*?)</a>"

  /** Strip the surrounding quotes off a captured href value: only a
    * FULLY double- or single-quoted value is unwrapped (bare values
    * pass through untouched). Two anchored replaces, RE2-replayable. */
  private def stripQuotes(h: Column): Column =
    regexp_replace(
      regexp_replace(h, "^\"([^\"]*)\"$", "$1"), "^'([^']*)'$", "$1")

  /** Resolve an href against its page URL. Handles the cases a crawler
    * meets constantly: absolute http(s) (kept as-is), other schemes
    * (`mailto:`, `javascript:`, `tel:` — dropped as NULL), protocol-
    * relative (`//host/...` — page scheme prepended), root-relative
    * (`/path` — scheme://authority prepended), fragment-only / empty
    * (dropped), and relative paths (resolved against the page path's
    * directory; `.`/`..` segments are not normalized — planted fixtures
    * and the oracle stay away from them, as does [[UrlTools
    * .canonicalize]]). Pure codegen'd conditional chain. */
  def resolveHref(pageUrl: Column, href: Column): Column = {
    val scheme = UrlTools.schemeOf(pageUrl)
    // raw authority (host as spelled, port kept): resolution must not
    // canonicalize — that is canonicalize()'s job downstream
    val authority =
      regexp_extract(pageUrl, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    val rawPath =
      regexp_extract(pageUrl, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    // directory of the page path: everything through the last '/'
    val dir = when(length(rawPath) > 0,
      regexp_replace(rawPath, "[^/]*$", "")).otherwise(lit("/"))
    when(href.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*:"),
      when(href.rlike("^(?i)https?://"), href)) // non-http scheme -> NULL
      .when(href.startsWith("//"), concat(scheme, lit(":"), href))
      .when(href.startsWith("/"), concat(scheme, lit("://"), authority, href))
      .when(href === "" || href.startsWith("#"), lit(null))
      .otherwise(concat(scheme, lit("://"), authority, dir, href))
  }

  /** Extract every resolvable link from `htmlCol`: one output row per
    * `<a href="...">` whose reference resolves to an http(s) URL, with
    * the cleaned anchor text (tags stripped, entities decoded, trimmed)
    * and the CANONICAL destination ([[UrlTools.canonicalize]] — the
    * page-identity key downstream dedup/joins use).
    *
    * Output: (idCol, urlCol, href, anchor_text, dst_url). */
  def extractLinks(pages: DataFrame, idCol: String, urlCol: String,
                   htmlCol: String): DataFrame = {
    val hrefs = regexp_extract_all(col(htmlCol), lit(anchorRe), lit(1))
    val anchors = regexp_extract_all(col(htmlCol), lit(anchorRe), lit(2))
    // STAGED projections, deliberately: `resolved` must be a named
    // column before canonicalize() consumes it. canonicalize references
    // its input ~10x (scheme/host/path/query extractions), so inlining
    // the resolveHref CASE tree there — and then hostEdges' host
    // extraction on top — multiplies the expression to where the
    // generated stage method passes Janino's 64 KB limit and the whole
    // stage silently loses codegen (observed before this split).
    // CollapseProject keeps the stages apart because `resolved` is
    // non-cheap and multiply-referenced.
    pages
      .select(col(idCol), col(urlCol),
        explode(zip_with(hrefs, anchors,
          (h, a) => struct(h.as("href"), a.as("anchor")))).as("l"))
      .select(col(idCol), col(urlCol),
        stripQuotes(col("l.href")).as("href"),
        trim(HtmlExtract.decodeEntities(
          HtmlExtract.stripTags(col("l.anchor")))).as("anchor_text"))
      .select(col(idCol), col(urlCol), col("href"), col("anchor_text"),
        resolveHref(col(urlCol), col("href")).as("resolved"))
      .filter(col("resolved").isNotNull)
      .select(col(idCol), col(urlCol), col("href"), col("anchor_text"),
        UrlTools.canonicalize(col("resolved")).as("dst_url"))
  }

  /** Host-level edge table from a link table: DISTINCT
    * (src_host, dst_host), self-loops dropped (a same-host link says
    * nothing about cross-site authority). One hash-agg shuffle of
    * host-pair keys. */
  def hostEdges(links: DataFrame, srcUrlCol: String,
                dstUrlCol: String): DataFrame =
    links.select(UrlTools.hostOf(col(srcUrlCol)).as("src_host"),
        UrlTools.hostOf(col(dstUrlCol)).as("dst_host"))
      .filter(col("src_host") =!= col("dst_host"))
      .distinct()

  /** Fixed-iteration PageRank over (srcCol, dstCol) edges, in integer
    * micro-units. Every node (any host appearing as src or dst) starts
    * at 1,000,000; per iteration
    *
    *   rank'(v) = teleport
    *            + (dampingPct * (Σ_{u→v} rank(u) div out(u)
    *                             + dangling div N)) div 100
    *
    * with teleport = (1,000,000 * (100 - dampingPct)) div 100, out(u)
    * the out-degree, dangling the rank mass of zero-out-degree nodes,
    * and `div` floor division — total mass is conserved up to flooring,
    * and the arithmetic replays exactly in any engine.
    *
    * Returns (host, rank_micro). Caller releases tracked caches after
    * its terminal action (CacheRegistry contract). */
  def pageRank(edges: DataFrame, srcCol: String = "src_host",
               dstCol: String = "dst_host", iters: Int = 3,
               dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters $iters")
    require(dampingPct >= 1 && dampingPct <= 99, s"dampingPct $dampingPct")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    // edges partitioned by src ONCE: every iteration's rank join reuses
    // this layout, so only the (tiny) rank table moves per round
    val eP = CacheRegistry.persist(e.repartition(col("src")))
    val outDeg = CacheRegistry.persist(
      eP.groupBy(col("src")).agg(count(lit(1)).as("od")))
    val nodes = CacheRegistry.persist(
      eP.select(col("src").as("host"))
        .union(eP.select(col("dst").as("host"))).distinct())
    val n = nodes.count()
    if (n == 0)
      return nodes.select(col("host"), lit(1000000L).as("rank_micro"))
    val teleport = 1000000L * (100 - dampingPct) / 100
    var ranks = CacheRegistry.persist(
      nodes.select(col("host"), lit(1000000L).as("r")))
    var it = 0
    while (it < iters) {
      // dangling mass (rank held by zero-out-degree nodes) stays IN
      // PLAN as a 1-row aggregate crossJoined onto the update — a
      // broadcast-nested-loop of one row, not a driver head(): each
      // round then costs ONE action (the materializing count) instead
      // of two full driver barriers
      val danglingDf = ranks
        .join(outDeg, ranks("host") === outDeg("src"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0L)).as("dang"))
      val shares = eP
        .join(ranks.join(outDeg, ranks("host") === outDeg("src"))
          .select(col("src").as("s"), expr("r div od").as("share")),
          eP("src") === col("s"))
        .groupBy(col("dst")).agg(sum(col("share")).as("sh"))
      val next = nodes
        .join(shares, nodes("host") === shares("dst"), "left")
        .crossJoin(danglingDf)
        .select(col("host"),
          (lit(teleport) +
            expr(s"($dampingPct * (coalesce(sh, CAST(0 AS BIGINT)) + " +
              s"(dang div CAST($n AS BIGINT)))) div 100")).as("r"))
      // localCheckpoint, not persist+count: persist keeps the FULL
      // logical plan, and each round references the previous ranks
      // frame from BOTH the share join and the dangling aggregate —
      // tree size would double per round, and Spark stringifies the
      // whole tree on every action (observed: minutes of driver CPU
      // inside generateTreeString at 4+ rounds). Checkpointing cuts
      // the lineage to the materialized rows, keeping every round's
      // plan — and its per-action stringification — constant-size.
      ranks = next.localCheckpoint(true)
      it += 1
    }
    ranks.select(col("host"), col("r").as("rank_micro"))
  }

  /** Top-k anchor-text terms per DESTINATION host — the classic
    * search-engine relevance signal (what the web calls a page is
    * written in the links pointing AT it, not on it). One token
    * explode + one (host, term) partial-agg shuffle + a host-keyed
    * rank window (never global). Ordering is deterministic:
    * count DESC, term ASC — engine-exact. */
  def anchorTerms(links: DataFrame, dstUrlCol: String = "dst_url",
                  anchorCol: String = "anchor_text", k: Int = 3): DataFrame = {
    require(k >= 1, s"k $k")
    val counts = links
      .select(UrlTools.hostOf(col(dstUrlCol)).as("host"),
        explode(split(lower(col(anchorCol)), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("host"), col("term"))
      .agg(count(lit(1)).as("n_links"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host"))
      .orderBy(col("n_links").desc, col("term"))
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  /** Fixed-iteration personalized PageRank from a SEED set (TrustRank,
    * Gyöngyi et al. 2004) — the domain-trust signal curation pipelines
    * propagate from a vetted whitelist: teleport (and dangling mass)
    * return to the SEEDS only, so trust decays with link distance from
    * the whitelist instead of spreading uniformly.
    *
    * Same integer micro-unit discipline and plan shape as [[pageRank]]
    * (src-partitioned edge cache persisted once, host-sized rank join +
    * contribution agg per round, scalars in plan). With M = N·10⁶ total
    * mass and S seeds present in the graph:
    *
    *   rank0(v)  = M div S                      if seed(v) else 0
    *   rank'(v)  = seed(v)·(((100-d)·M div 100) div S)
    *             + (d · (Σ_{u→v} rank(u) div out(u)
    *                     + seed(v)·(dangling div S))) div 100
    *
    * Returns (host, trust_micro). `seeds` is a 1-column host table
    * (hosts absent from the graph are ignored); requires ≥ 1 present. */
  def trustRank(edges: DataFrame, seeds: DataFrame,
                srcCol: String = "src_host", dstCol: String = "dst_host",
                iters: Int = 3, dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters $iters")
    require(dampingPct >= 1 && dampingPct <= 99, s"dampingPct $dampingPct")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val eP = CacheRegistry.persist(e.repartition(col("src")))
    val outDeg = CacheRegistry.persist(
      eP.groupBy(col("src")).agg(count(lit(1)).as("od")))
    val seedSet = seeds.select(col(seeds.columns.head).as("host")).distinct()
    val nodes = CacheRegistry.persist(
      eP.select(col("src").as("host"))
        .union(eP.select(col("dst").as("host"))).distinct()
        .join(seedSet.select(col("host"), lit(1L).as("seed")),
          Seq("host"), "left")
        .select(col("host"), coalesce(col("seed"), lit(0L)).as("seed")))
    val n = nodes.count()
    val s = nodes.filter(col("seed") === 1L).count()
    require(s >= 1, "no seed host present in the edge graph")
    val mass = n * 1000000L
    val teleportPerSeed = (mass * (100 - dampingPct) / 100) / s
    var ranks = CacheRegistry.persist(
      nodes.select(col("host"), col("seed"),
        (col("seed") * lit(mass / s)).as("r")))
    var it = 0
    while (it < iters) {
      val danglingDf = ranks
        .join(outDeg, ranks("host") === outDeg("src"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0L)).as("dang"))
      val shares = eP
        .join(ranks.join(outDeg, ranks("host") === outDeg("src"))
          .select(col("src").as("sc"), expr("r div od").as("share")),
          eP("src") === col("sc"))
        .groupBy(col("dst")).agg(sum(col("share")).as("sh"))
      val next = nodes
        .join(shares, nodes("host") === shares("dst"), "left")
        .crossJoin(danglingDf)
        .select(col("host"), col("seed"),
          (col("seed") * lit(teleportPerSeed) +
            expr(s"($dampingPct * (coalesce(sh, CAST(0 AS BIGINT)) + " +
              s"seed * (dang div CAST($s AS BIGINT)))) div 100")).as("r"))
      // lineage cut per round — see pageRank's localCheckpoint note
      ranks = next.localCheckpoint(true)
      it += 1
    }
    ranks.select(col("host"), col("r").as("trust_micro"))
  }

  /** Fixed-iteration HITS (Kleinberg hubs & authorities) over the same
    * edge table — the second classic link-authority signal: hubs are
    * pages that point AT good content (directories, link farms score
    * high here and low on PageRank), authorities are pages pointed at
    * BY good hubs.
    *
    * Integer micro-unit arithmetic, overflow-safe by construction: hub
    * scores are renormalized to ≤ 1,000,000 BEFORE each propagation, so
    * raw sums stay ≤ N·10⁶ and the normalizer is a floor-DIVISION (raw
    * div (max div 10⁶)), never a multiply-then-divide whose product
    * could pass 2⁶³. Per iteration:
    *
    *   auth_raw(v) = Σ_{u→v} hub(u);  auth = auth_raw div max(1, max(auth_raw) div 10⁶)
    *   hub_raw(u)  = Σ_{u→v} auth(v); hub  = hub_raw  div max(1, max(hub_raw)  div 10⁶)
    *
    * Exactly replayable (the oracle unrolls the iterations); same
    * plan shape as [[pageRank]] — per half-step one host-sized join +
    * partial agg over the src-partitioned edge cache, one scalar (the
    * max) to the driver. Returns (host, auth_micro, hub_micro). */
  def hits(edges: DataFrame, srcCol: String = "src_host",
           dstCol: String = "dst_host", iters: Int = 2): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val eP = CacheRegistry.persist(e.repartition(col("src")))
    val nodes = CacheRegistry.persist(
      eP.select(col("src").as("host"))
        .union(eP.select(col("dst").as("host"))).distinct())
    // renormalize raw sums so the LARGEST score is ~1e6 micro-units;
    // the max stays in plan (1-row crossJoin), same rationale as
    // pageRank's dangling aggregate — one action per half-step. The
    // self-referential crossJoin is safe ONLY because the half-step
    // output is localCheckpointed below: raw's subtree appears twice
    // in the plan, so without the lineage cut the tree (and Spark's
    // per-action plan stringification) would double per half-step.
    def norm(raw: DataFrame, c: String): DataFrame =
      raw.crossJoin(raw.agg(coalesce(max(col(c)), lit(0L)).as("mx")))
        .select(col("host"),
          expr(s"$c div greatest(mx div CAST(1000000 AS BIGINT), " +
            "CAST(1 AS BIGINT))").as(c))
    var hub = CacheRegistry.persist(
      nodes.select(col("host"), lit(1000000L).as("h")))
    var auth: DataFrame = nodes.select(col("host"), lit(0L).as("a"))
    var it = 0
    while (it < iters) {
      val aRaw = nodes.join(
        eP.join(hub, eP("src") === hub("host"))
          .groupBy(col("dst")).agg(sum(col("h")).as("a")),
        nodes("host") === col("dst"), "left")
        .select(col("host"), coalesce(col("a"), lit(0L)).as("a"))
      auth = norm(aRaw, "a").localCheckpoint(true)
      val hRaw = nodes.join(
        eP.join(auth, eP("dst") === auth("host"))
          .groupBy(col("src")).agg(sum(col("a")).as("h")),
        nodes("host") === col("src"), "left")
        .select(col("host"), coalesce(col("h"), lit(0L)).as("h"))
      hub = norm(hRaw, "h").localCheckpoint(true)
      it += 1
    }
    auth.join(hub, "host")
      .select(col("host"), col("a").as("auth_micro"),
        col("h").as("hub_micro"))
  }

  /** Crawl depth: minimum hop count from any seed host over the link
    * graph, bounded at `maxHops` — the frontier-planning signal a
    * breadth-limited crawl runs on ("fetch only within k clicks of the
    * whitelist"; TrustRank's distance intuition made exact). Synchronous
    * BFS as `maxHops` rounds of
    *
    *   dist'(v) = min(dist(v), min_{u→v} dist(u) + 1)
    *
    * over the src-partitioned edge cache — per round one host-sized
    * join + a (host) min partial agg, the [[pageRank]] plan shape, with
    * the same per-round `localCheckpoint` lineage cut. All-integer, so
    * the DuckDB oracle unrolls the rounds and must match hash-exact.
    *
    * Converged-BFS early exit: rounds stop as soon as one changes no
    * distance. The check is two integer scalars off the (host-sized,
    * checkpointed) dist table — reached-host count and dist sum — and
    * is exact, not heuristic: hosts only ever get ADDED and dists only
    * ever DECREASE, so (count, sum) is unchanged iff the round was a
    * fixed point, and BFS fixed points are terminal. maxHops=50 on a
    * depth-3 graph pays 4 rounds, not 50 — and the result is
    * unchanged by construction.
    *
    * Returns (host, dist) for every graph node plus every seed; nodes
    * unreached within `maxHops` carry NULL. Seeds absent from the graph
    * still report dist 0 (a whitelist host with no observed links is
    * depth 0 by definition). */
  def hopDistance(edges: DataFrame, seeds: DataFrame, maxHops: Int,
                  srcCol: String = "src_host",
                  dstCol: String = "dst_host"): DataFrame =
    hopDistanceWithRounds(edges, seeds, maxHops, srcCol, dstCol)._1

  /** [[hopDistance]] plus the number of rounds actually executed —
    * the early-exit observable (HopDistanceSpec pins that a depth-3
    * graph under maxHops=50 stops after 4 rounds). */
  private[graft] def hopDistanceWithRounds(
      edges: DataFrame, seeds: DataFrame, maxHops: Int,
      srcCol: String = "src_host",
      dstCol: String = "dst_host"): (DataFrame, Int) = {
    require(maxHops >= 1 && maxHops <= 50, s"maxHops $maxHops")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val eP = CacheRegistry.persist(e.repartition(col("src")))
    val seedSet = seeds.select(col(seeds.columns.head).as("host")).distinct()
    val nodes = CacheRegistry.persist(
      eP.select(col("src").as("host"))
        .union(eP.select(col("dst").as("host")))
        .union(seedSet).distinct())
    var dist = seedSet.select(col("host"), lit(0).as("dist"))
      .localCheckpoint(true)
    def fingerprint(d: DataFrame): (Long, Long) = {
      val r = d.agg(count(lit(1)), coalesce(sum(col("dist")), lit(0L)))
        .collect().head
      (r.getLong(0), r.getLong(1))
    }
    var fp = fingerprint(dist)
    var it = 0
    var converged = false
    while (it < maxHops && !converged) {
      val prop = eP.join(dist, eP("src") === dist("host"))
        .select(col("dst").as("host"), (col("dist") + 1).as("dist"))
      dist = dist.unionByName(prop)
        .groupBy(col("host")).agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
      val next = fingerprint(dist)
      converged = next == fp
      fp = next
      it += 1
    }
    (nodes.join(dist, Seq("host"), "left"), it)
  }
}
