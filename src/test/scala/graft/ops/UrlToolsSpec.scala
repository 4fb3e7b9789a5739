package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class UrlToolsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(UrlTools.canonicalize(col("u"))).head().getString(0)

  test("canonicalize: case, www, port, trailing slash, fragment") {
    assert(canon("HTTPS://WWW.Example.COM:443/Path/") ==
      "https://example.com/Path")
    assert(canon("http://example.com") == "http://example.com/")
    assert(canon("https://example.com:8080/a//") == "https://example.com/a")
  }

  test("canonicalize: tracking params drop wherever they sit") {
    assert(canon("https://e.com/p?utm_source=x&id=1") == "https://e.com/p?id=1")
    assert(canon("https://e.com/p?id=1&utm_source=x&ref=r") ==
      "https://e.com/p?id=1")
    assert(canon("https://e.com/p?gclid=z") == "https://e.com/p")
    assert(canon("https://e.com/p?a=1&fbclid=f&b=2#frag") ==
      "https://e.com/p?a=1&b=2")
  }

  test("re-crawl spellings collapse to one canonical form") {
    val variants = Seq(
      "https://www.shop.example.co.uk/item/9?id=9&utm_campaign=x",
      "HTTPS://SHOP.EXAMPLE.CO.UK:443/item/9/?gclid=g&id=9",
      "https://shop.example.co.uk/item/9?utm_source=a&id=9&utm_medium=b#top")
    assert(variants.map(canon).distinct ==
      Seq("https://shop.example.co.uk/item/9?id=9"))
  }

  test("registered domain: cc-SLD, plain, single-label") {
    val hosts = Seq("a.b.shop.example.co.uk", "deep.sub.example.com",
      "sample.org", "localhost")
    val got = hosts.toDF("h")
      .select(UrlTools.registeredDomainOfHost(col("h"))).as[String].collect()
    assert(got.toSeq ==
      Seq("example.co.uk", "example.com", "sample.org", "localhost"))
  }

  test("dedupByCanonical keeps the smallest id and counts the cluster") {
    val df = Seq(
      (10L, "https://e.com/x?utm_source=a"),
      (3L, "https://WWW.e.com/x/"),
      (7L, "https://e.com/x#f"),
      (5L, "https://e.com/y")).toDF("id", "url")
    val out = UrlTools.dedupByCanonical(df, "id", "url")
      .select("id", "canonical_url", "n_dups")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (3L, "https://e.com/x", 3L), (5L, "https://e.com/y", 1L)))
  }

  test("domainStats shuffles projection-width rows only (2-exchange multi-distinct)") {
    // two exact count(DISTINCT) columns plan as Expand -> partial agg ->
    // exchange on (domain, gid, value) -> merge -> exchange on domain:
    // 2 exchanges is the stock Spark multi-distinct shape, and both
    // carry (domain, host, canonical, n_chars) projections, never docs
    val df = (0 until 60).map(i => (s"https://h$i.example.com/$i", i.toLong))
      .toDF("url", "n_chars")
    val shuffles = TestSpark.executedPlan(UrlTools.domainStats(df, "url", "n_chars"))
      .count(_.isInstanceOf[
        org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
    assert(shuffles <= 2, s"expected <= 2 shuffles, got $shuffles")
  }

  test("domainQualityPrior: integer-exact per-domain mean, broadcast join-back") {
    val df = Seq(
      (1L, "https://a.example.com/1", 0.85),
      (2L, "https://b.example.com/2", 0.55),
      (3L, "https://c.sample.org/3", 1.0)).toDF("doc_id", "url", "quality")
    val out = UrlTools.domainQualityPrior(df, "url", "quality")
    val rows = out.select("doc_id", "domain", "q4", "domain_docs", "domain_mean_q4")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(rows == Seq(
      (1L, "example.com", 8500L, 2L, 7000L), // floor((8500+5500)/2)
      (2L, "example.com", 5500L, 2L, 7000L),
      (3L, "sample.org", 10000L, 1L, 10000L)))
    assert(TestSpark.executedPlan(out).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      "the prior table must broadcast back onto the corpus")
  }

  test("domainStats aggregates per registered domain") {
    val df = Seq(
      ("https://a.example.com/1", 10L), ("https://b.example.com/2", 20L),
      ("https://a.example.com/1?utm_source=x", 30L),
      ("https://news.example.co.uk/3", 5L)).toDF("url", "n_chars")
    val out = UrlTools.domainStats(df, "url", "n_chars")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      ("example.co.uk", 1L, 1L, 1L, 5L),
      ("example.com", 3L, 2L, 2L, 60L)))
  }

  test("registeredDomainsOfHosts: PSL table beats the lite rule") {
    val suffixes = Seq("com", "uk", "co.uk", "k12.va.us", "github.io", "io")
      .toDF("suffix")
    val hosts = Seq(
      "a.b.example.co.uk", // depth-3 suffix -> example.co.uk
      "pta.some.k12.va.us", // depth-3 US school suffix -> some.k12.va.us
      "user.github.io",    // private registry -> user.github.io
      "deep.user.github.io", // still user.github.io
      "github.io",         // host IS a suffix -> itself
      "plain.example.com", // ordinary com -> example.com
      "host.unknowntld",   // no match -> lite fallback (last 2)
      "localhost")         // single label, no match -> itself
      .toDF("host")
    val got = UrlTools.registeredDomainsOfHosts(hosts, "host", suffixes)
      .as[(String, String)].collect().toMap
    assert(got == Map(
      "a.b.example.co.uk" -> "example.co.uk",
      "pta.some.k12.va.us" -> "some.k12.va.us",
      "user.github.io" -> "user.github.io",
      "deep.user.github.io" -> "user.github.io",
      "github.io" -> "github.io",
      "plain.example.com" -> "example.com",
      "host.unknowntld" -> "host.unknowntld",
      "localhost" -> "localhost"))
  }
}
