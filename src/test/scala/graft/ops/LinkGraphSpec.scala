package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LinkGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("resolveHref: every RFC 3986 common case") {
    val page = "https://WWW.Site.example.com:8080/a/b/page.html"
    val cases = Seq(
      "https://other.com/x"        -> Some("https://other.com/x"),
      "HTTPS://UP.example.com/y"   -> Some("HTTPS://UP.example.com/y"),
      "http://plain.org"           -> Some("http://plain.org"),
      "mailto:a@b.example"         -> None,
      "javascript:void(0)"         -> None,
      "tel:+41123"                 -> None,
      "//cdn.example.com/z.js"     -> Some("https://cdn.example.com/z.js"),
      "/root/x"                    -> Some("https://WWW.Site.example.com:8080/root/x"),
      "rel.html"                   -> Some("https://WWW.Site.example.com:8080/a/b/rel.html"),
      "sub/d.html"                 -> Some("https://WWW.Site.example.com:8080/a/b/sub/d.html"),
      "#frag"                      -> None,
      ""                           -> None)
    val got = cases.map(_._1).toDF("href")
      .select(col("href"),
        LinkGraph.resolveHref(lit(page), col("href")).as("r"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    cases.foreach { case (href, want) =>
      assert(got(href) == want, s"href '$href'")
    }
    // page at host root: directory is "/"
    val atRoot = Seq("r.html").toDF("href")
      .select(LinkGraph.resolveHref(lit("https://h.example.com"),
        col("href"))).head().getString(0)
    assert(atRoot == "https://h.example.com/r.html")
  }

  test("extractLinks: pairing, anchor cleaning, drop rules, no shuffle") {
    val html =
      """<html><body>
        |<a href="https://a.example.com/1">One &amp; only</a>
        |<a class="x" href="/p/2" rel="nofollow">two <b>bold</b></a>
        |<a href="mailto:x@y">mail</a>
        |<a href="#top">top</a>
        |<A HREF="https://b.example.com/3?utm_source=z&q=1">three</A>
        |</body></html>""".stripMargin
    val pages = Seq((1L, "https://src.example.com/dir/page", html))
      .toDF("id", "url", "html")
    val links = LinkGraph.extractLinks(pages, "id", "url", "html")
    val rows = links.orderBy("dst_url").collect()
      .map(r => (r.getString(2), r.getString(3), r.getString(4)))
    assert(rows.toSeq == Seq(
      ("https://a.example.com/1", "One & only", "https://a.example.com/1"),
      // tracking param stripped by canonicalize, real param kept
      ("https://b.example.com/3?utm_source=z&q=1", "three",
        "https://b.example.com/3?q=1"),
      ("/p/2", "two bold", "https://src.example.com/p/2")))
    // extraction is a projection + generator: zero exchanges
    val shuffles = links.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, "extractLinks must not shuffle")
  }

  test("extractLinks: single-quoted and bare href spellings") {
    val html =
      """<a href='https://sq.example.com/1'>single</a>
        |<a href=/bare/2 class=z>bare</a>
        |<a href='/sq/3' rel=nofollow>sq rel</a>
        |<a href=https://abs.example.com/4>bare abs</a>""".stripMargin
    val pages = Seq((1L, "https://src.example.com/dir/page", html))
      .toDF("id", "url", "html")
    val rows = LinkGraph.extractLinks(pages, "id", "url", "html")
      .orderBy("dst_url").collect()
      .map(r => (r.getString(2), r.getString(3), r.getString(4)))
    assert(rows.toSeq == Seq(
      ("https://abs.example.com/4", "bare abs", "https://abs.example.com/4"),
      ("https://sq.example.com/1", "single", "https://sq.example.com/1"),
      ("/bare/2", "bare", "https://src.example.com/bare/2"),
      ("/sq/3", "sq rel", "https://src.example.com/sq/3")))
  }

  test("hostEdges: host projection, self-loop and duplicate collapse") {
    val links = Seq(
      ("https://a.example.com/1", "https://b.example.com/x"),
      ("https://a.example.com/2", "https://b.example.com/y"), // same hosts
      ("https://a.example.com/3", "https://a.example.com/z"), // self-loop
      ("https://WWW.B.example.com:443/q", "https://c.example.com/"))
      .toDF("url", "dst_url")
    val edges = LinkGraph.hostEdges(links, "url", "dst_url")
      .orderBy("src_host", "dst_host").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(edges.toSeq == Seq(
      ("a.example.com", "b.example.com"),
      ("b.example.com", "c.example.com")))
  }

  /** Independent reimplementation of the integer PageRank recurrence —
    * plain Scala over an in-memory edge list. */
  private def refPageRank(edges: Seq[(String, String)], iters: Int,
                          dampingPct: Int): Map[String, Long] = {
    val e = edges.filter(x => x._1 != x._2).distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val od = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = nodes.size.toLong
    val teleport = 1000000L * (100 - dampingPct) / 100
    var r = nodes.map(_ -> 1000000L).toMap
    (1 to iters).foreach { _ =>
      val dang = nodes.filterNot(od.contains).map(r).sum / n
      val contrib = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) => r(s) / od(s) }.sum
      }
      r = nodes.map(v => v ->
        (teleport + dampingPct * (contrib.getOrElse(v, 0L) + dang) / 100))
        .toMap
    }
    r
  }

  test("pageRank matches the independent integer recurrence exactly") {
    // A hub, a cycle, a dangling sink, duplicate + self-loop noise
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("a", "d"),
      ("b", "c"), ("c", "a"),
      ("a", "b"), // duplicate — must collapse
      ("c", "c")) // self-loop — must drop
    val got = LinkGraph.pageRank(
      edges.toDF("src_host", "dst_host"), iters = 3, dampingPct = 85)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    CacheRegistry.releaseAll()
    val want = refPageRank(edges, iters = 3, dampingPct = 85)
    assert(got == want)
    // d is a pure sink: it must hold more than teleport-only mass,
    // and a (the cycle return target) must outrank the leaf b
    assert(got("d") > 150000L)
    assert(got("a") > got("b"))
  }

  test("anchorTerms: per-host counts, deterministic top-k tie-break") {
    val links = Seq(
      ("https://t.example.com/1", "Great Docs"),
      ("https://t.example.com/2", "great   docs here"),
      ("https://t.example.com/3", "docs"),
      ("https://u.example.com/1", "alpha beta"))
      .toDF("dst_url", "anchor_text")
    val got = LinkGraph.anchorTerms(links, k = 2)
      .orderBy("host", "term").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("t.example.com", "docs", 3L),  // 3 > 2
      ("t.example.com", "great", 2L),
      // k=2 cuts "here"; u's tie (alpha==beta==1) breaks by term ASC
      ("u.example.com", "alpha", 1L),
      ("u.example.com", "beta", 1L)))
  }

  /** Independent reimplementation of the integer TrustRank recurrence. */
  private def refTrustRank(edges: Seq[(String, String)], seeds: Set[String],
                           iters: Int, dampingPct: Int): Map[String, Long] = {
    val e = edges.filter(x => x._1 != x._2).distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val od = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val present = nodes.filter(seeds).toSet
    val n = nodes.size.toLong
    val s = present.size.toLong
    val mass = n * 1000000L
    val tps = mass * (100 - dampingPct) / 100 / s
    var r = nodes.map(v => v -> (if (present(v)) mass / s else 0L)).toMap
    (1 to iters).foreach { _ =>
      val dangShare = nodes.filterNot(od.contains).map(r).sum / s
      val contrib = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (u, _) => r(u) / od(u) }.sum
      }
      r = nodes.map { v =>
        val seed = if (present(v)) 1L else 0L
        v -> (seed * tps + dampingPct *
          (contrib.getOrElse(v, 0L) + seed * dangShare) / 100)
      }.toMap
    }
    r
  }

  test("trustRank matches the independent recurrence; trust needs a path") {
    // seed -> m1 -> m2; an off-path pair (x <-> y) and a sink the seed
    // never reaches except through teleport (it gets NONE — only seeds
    // receive teleport)
    val edges = Seq(
      ("seedh", "m1"), ("m1", "m2"),
      ("x", "y"), ("y", "x"), ("m2", "seedh"))
    val seeds = Set("seedh")
    val got = LinkGraph.trustRank(edges.toDF("src_host", "dst_host"),
      Seq("seedh", "absent.example").toDF("host"), iters = 3, dampingPct = 85)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    CacheRegistry.releaseAll()
    val want = refTrustRank(edges, seeds, iters = 3, dampingPct = 85)
    assert(got == want)
    // trust decays along the chain; the unreachable pair holds none
    assert(got("seedh") > got("m1") && got("m1") > got("m2"))
    assert(got("x") == 0L && got("y") == 0L)
  }

  /** Independent reimplementation of the integer HITS recurrence. */
  private def refHits(edges: Seq[(String, String)],
                      iters: Int): Map[String, (Long, Long)] = {
    val e = edges.filter(x => x._1 != x._2).distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var h = nodes.map(_ -> 1000000L).toMap
    var a = Map.empty[String, Long]
    (1 to iters).foreach { _ =>
      val aRaw = nodes.map(v =>
        v -> e.filter(_._2 == v).map(x => h(x._1)).sum).toMap
      val da = math.max(1L, aRaw.values.max / 1000000L)
      a = aRaw.view.mapValues(_ / da).toMap
      val hRaw = nodes.map(u =>
        u -> e.filter(_._1 == u).map(x => a(x._2)).sum).toMap
      val dh = math.max(1L, hRaw.values.max / 1000000L)
      h = hRaw.view.mapValues(_ / dh).toMap
    }
    nodes.map(v => v -> (a(v), h(v))).toMap
  }

  test("hits matches the independent integer recurrence exactly") {
    val edges = Seq(
      ("hub", "a1"), ("hub", "a2"), ("hub", "a3"), // a directory page
      ("a1", "a2"), ("a2", "a1"),                  // a mutual pair
      ("lone", "a1"))
    val got = LinkGraph.hits(edges.toDF("src_host", "dst_host"), iters = 2)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    CacheRegistry.releaseAll()
    val want = refHits(edges, iters = 2)
    assert(got == want)
    // the directory is the best hub but no authority; a1 (pointed at
    // by hub, a2 AND lone) is the top authority
    assert(got("hub")._2 == want.values.map(_._2).max)
    assert(got("hub")._1 == 0L)
    assert(got("a1")._1 == want.values.map(_._1).max)
  }

  test("pageRank conserves mass up to flooring; caches all released") {
    val edges = (0 until 40).map(i =>
      (s"h$i", s"h${(i * 7 + 3) % 45}")) // 45 hosts, 5 sink-only
    val df = LinkGraph.pageRank(edges.toDF("src_host", "dst_host"),
      iters = 3, dampingPct = 85)
    val ranks = df.collect().map(_.getLong(1))
    val released = CacheRegistry.releaseAll()
    // edges, out-degrees, nodes, round-0 ranks (iterated rounds are
    // localCheckpoints, GC-reclaimed, not registry entries)
    assert(released >= 4, s"expected tracked caches, got $released")
    val n = ranks.length
    val total = ranks.sum
    assert(total <= 1000000L * n)
    // each iteration loses at most ~(100 + n) micro-units per node to
    // flooring; 3 iterations of slack, generously doubled
    assert(total >= 1000000L * n - 6L * n * (100 + n))
  }

  test("hopDistance: exact BFS depths, maxHops cutoff NULL, " +
    "off-graph seed at depth 0, shorter path wins") {
    import spark.implicits._
    // a -> b -> c -> d -> e (chain), plus a -> c shortcut: dist(c)=1
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
      ("a", "c")).toDF("src_host", "dst_host")
    val seeds = Seq("a", "zz-offgraph").toDF("host")
    val out = LinkGraph.hopDistance(edges, seeds, maxHops = 2)
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    CacheRegistry.releaseAll()
    assert(out == Map(
      "a" -> Some(0), "b" -> Some(1), "c" -> Some(1), "d" -> Some(2),
      "e" -> None,               // 3 hops away, cut by maxHops = 2
      "zz-offgraph" -> Some(0))) // seed with no edges: depth 0
  }

  test("hopDistance converges early: depth-3 graph under maxHops=50 " +
    "stops after 4 rounds, result identical") {
    import spark.implicits._
    // a -> b -> c -> d: depth 3; round 4 changes nothing -> stop
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"))
      .toDF("src_host", "dst_host")
    val seeds = Seq("a").toDF("host")
    val (df, rounds) = LinkGraph.hopDistanceWithRounds(edges, seeds,
      maxHops = 50)
    val out = df.collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    CacheRegistry.releaseAll()
    assert(rounds == 4, s"expected 4 BFS rounds (3 productive + 1 " +
      s"fixed-point check), ran $rounds")
    assert(out == Map("a" -> 0, "b" -> 1, "c" -> 2, "d" -> 3))
  }
}
