package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RobotsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("parseRules: group selection, stacked agents, comments, empty Disallow") {
    val txt =
      """# policy
        |User-agent: googlebot
        |Disallow: /
        |
        |User-agent: *
        |User-agent: extra
        |Crawl-delay: 5
        |DISALLOW: /private # members only
        |Allow: /private/press
        |Disallow:
        |""".stripMargin
    assert(Robots.parseRules(txt) ==
      Seq((false, "/private"), (true, "/private/press")))
    assert(Robots.parseRules("User-agent: bot\nDisallow: /x\n").isEmpty)
    assert(Robots.parseRules(null).isEmpty)
  }

  test("parseDirectives: star-group crawl-delay, global sitemaps") {
    val (d1, m1) = Robots.parseDirectives(
      "Sitemap: https://s/pre.xml\n" +
        "User-agent: googlebot\nCrawl-delay: 99\nSitemap: https://s/g.xml\n\n" +
        "User-agent: *\nCrawl-delay: 3\nDisallow: /x\n")
    assert(d1.contains(3000L)) // googlebot's 99 must not apply; 3 s = 3000 ms
    assert(m1 == Seq("https://s/pre.xml", "https://s/g.xml")) // file order
    val (d2, m2) = Robots.parseDirectives(
      "User-agent: *\nCrawl-delay: bogus\n")
    assert(d2.isEmpty && m2.isEmpty) // non-numeric ignored
    assert(Robots.parseDirectives(null) == (None, Nil))
    // fractional seconds (the common de-facto spelling) parse to ms
    assert(Robots.parseDirectives(
      "User-agent: *\nCrawl-delay: 0.5\n")._1.contains(500L))
    assert(Robots.parseDirectives(
      "User-agent: *\nCrawl-delay: 2.25\n")._1.contains(2250L))
    // sub-ms digits truncate; bare trailing dot is whole seconds
    assert(Robots.parseDirectives(
      "User-agent: *\nCrawl-delay: 1.2345\n")._1.contains(1234L))
    assert(Robots.parseDirectives(
      "User-agent: *\nCrawl-delay: 2.\n")._1.contains(2000L))
    // malformed decimals stay ignored
    assert(Robots.parseDirectives(
      "User-agent: *\nCrawl-delay: 1.2.3\n")._1.isEmpty)
    assert(Robots.parseDirectives(
      "User-agent: *\nCrawl-delay: -1\n")._1.isEmpty)
  }

  test("gate: longest match, allow-beats-disallow tie, defaults") {
    val rules = Robots.parseRulesTable(Seq(
      ("site.com", "User-agent: *\nDisallow: /a\nAllow: /a/b\nDisallow: /a/b/c\n" +
        "Allow: /t\nDisallow: /t\n")).toDF("domain", "robots_txt"))
    val pages = Seq(
      (1L, "https://site.com/a/x"),     // /a -> blocked
      (2L, "https://site.com/a/b/x"),   // /a/b allow (longer) -> allowed
      (3L, "https://site.com/a/b/c/x"), // /a/b/c (longest) -> blocked
      (4L, "https://site.com/t/x"),     // equal-length tie -> allow wins
      (5L, "https://site.com/open"),    // no matching rule -> allowed
      (6L, "https://other.org/a/x"))    // no robots for domain -> allowed
      .toDF("id", "url")
    val got = Robots.gate(pages, "url", rules)
      .select("id", "allowed").as[(Long, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(1L -> false, 2L -> true, 3L -> false,
      4L -> true, 5L -> true, 6L -> true))
  }

  test("agent group selection per RFC 9309 2.2.1") {
    val txt =
      """Disallow: /preamble # no group yet: ignored
        |User-agent: GoodBot
        |Disallow: /g1
        |
        |User-agent: *
        |Disallow: /star
        |Crawl-delay: 3
        |
        |User-agent: goodbot
        |User-agent: otherbot
        |Disallow: /g2
        |Crawl-delay: 9
        |""".stripMargin
    // named agent: BOTH goodbot groups combine (case-insensitive);
    // the * group does not apply
    assert(Robots.parseRules(txt, "GOODBOT") ==
      Seq((false, "/g1"), (false, "/g2")))
    // unknown agent falls back to the * group
    assert(Robots.parseRules(txt, "strangebot") == Seq((false, "/star")))
    // default stays the * view
    assert(Robots.parseRules(txt) == Seq((false, "/star")))
    // crawl-delay follows the same selection; last chosen-group wins
    assert(Robots.parseDirectives(txt, "otherbot")._1.contains(9000L))
    assert(Robots.parseDirectives(txt, "strangebot")._1.contains(3000L))
    assert(Robots.parseDirectives(txt)._1.contains(3000L))
  }

  test("compilePattern: literals pass through, *, trailing $, escapes") {
    assert(Robots.compilePattern("/plain/prefix").isEmpty) // fast path
    assert(Robots.compilePattern("/fish*").contains("^/fish.*"))
    assert(Robots.compilePattern("/*.php$").contains("^/.*\\.php$"))
    assert(Robots.compilePattern("/exact$").contains("^/exact$"))
    // non-trailing $ is literal (and forces the regex path via the *)
    assert(Robots.compilePattern("/a$b*").contains("^/a\\$b.*"))
    // metacharacters in the path are escaped to literals
    assert(Robots.compilePattern("/a(1)+*").contains("^/a\\(1\\)\\+.*"))
  }

  test("gate: RFC 9309 §2.2.3 wildcard and end-anchor examples") {
    val rules = Robots.parseRulesTable(Seq(
      ("w.com", "User-agent: *\nDisallow: /fish*\nAllow: /fish*.php$\n" +
        "Disallow: /*.pdf$\n")).toDF("domain", "robots_txt"))
    val pages = Seq(
      (1L, "https://w.com/fish"),            // /fish* -> blocked
      (2L, "https://w.com/fishheads/x"),     // /fish* -> blocked
      (3L, "https://w.com/fishheads/catfish.php"), // allow (longer) -> ok
      (4L, "https://w.com/fish.php.bak"),    // $ must NOT match mid-path
      (5L, "https://w.com/docs/report.pdf"), // /*.pdf$ -> blocked
      (6L, "https://w.com/docs/report.pdfx"), // anchor: not end -> allowed
      (7L, "https://w.com/open/page"))       // no rule -> allowed
      .toDF("id", "url")
    val got = Robots.gate(pages, "url", rules)
      .select("id", "allowed").as[(Long, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(1L -> false, 2L -> false, 3L -> true,
      4L -> false, 5L -> false, 6L -> true, 7L -> true))
  }

  test("gate moves no page rows: broadcast join, zero shuffle") {
    val rules = Robots.parseRulesTable(
      Seq(("s.com", "User-agent: *\nDisallow: /x\n")).toDF("domain", "robots_txt"))
    val pages = (0 until 40).map(i => (i.toLong, s"https://s.com/p$i"))
      .toDF("id", "url")
    val plan = TestSpark.executedPlan(Robots.gate(pages, "url", rules))
    val shuffled = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // the only exchange allowed is the sites-sized rule-set aggregation
    assert(shuffled.forall(_.output.forall(a => a.name != "url")),
      "page rows must not ride an exchange")
  }
}
