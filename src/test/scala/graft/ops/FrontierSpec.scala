package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FrontierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("build: dedup+count, robots gate, rank/delay annotation, host queues") {
    val robots = Seq(
      // fractional delay: the common de-facto spelling, carried as ms
      ("a.com", "User-agent: *\nDisallow: /*.pdf$\nCrawl-delay: 4.5\n"),
      ("b.net", "User-agent: *\n")).toDF("domain", "robots_txt")
    val candidates = Seq(
      "https://a.com/page1",            // 2 refs (with the variant below)
      "https://a.com/page1/?utm_source=x", // same canonical URL
      "https://a.com/report.pdf",       // robots-blocked
      "https://a.com/page2",
      "https://b.net/only").toDF("url")
    val ranks = Seq(("a.com", 500000L)).toDF("host", "rank_micro")
    val got = Frontier.build(candidates, "url",
      Robots.parseRulesTable(robots), Robots.parseDirectivesTable(robots),
      ranks)
      .as[(String, String, String, Long, Long, Long, Int)]
      .collect().sortBy(r => (r._2, r._7))
    assert(got.toSeq == Seq(
      // host a.com queue: page1 first (2 refs), page2 second; pdf gone
      ("https://a.com/page1", "a.com", "a.com", 2L, 500000L, 4500L, 1),
      ("https://a.com/page2", "a.com", "a.com", 1L, 500000L, 4500L, 2),
      // unknown-rank host, no delay directive -> defaults (0, 1000 ms)
      ("https://b.net/only", "b.net", "b.net", 1L, 0L, 1000L, 1)))
    // the schedule is exact integer ms: page2 fetches 4500 ms in
    val sched = Frontier.schedule(Frontier.build(candidates, "url",
      Robots.parseRulesTable(robots), Robots.parseDirectivesTable(robots),
      ranks))
      .select("url", "fetch_at_ms").as[(String, Long)].collect().toMap
    assert(sched("https://a.com/page1") == 0L)
    assert(sched("https://a.com/page2") == 4500L)
  }

  test("visited URLs drop from the queue (any spelling), refs intact") {
    val robots = Seq(("a.com", "User-agent: *\n")).toDF("domain", "robots_txt")
    val candidates = Seq(
      "https://a.com/old", "https://a.com/old", "https://a.com/new")
      .toDF("url")
    val visited = Seq("https://WWW.a.com/old/?utm_source=x") // re-crawl spelling
      .toDF("url")
    val ranks = Seq.empty[(String, Long)].toDF("host", "rank_micro")
    val got = Frontier.build(candidates, "url",
      Robots.parseRulesTable(robots), Robots.parseDirectivesTable(robots),
      ranks, visited = Some(visited))
      .select("url", "n_refs", "host_pos")
      .as[(String, Long, Int)].collect().toSeq
    assert(got == Seq(("https://a.com/new", 1L, 1)))
  }

  test("plan: annotations broadcast; no global sort — host window only") {
    val robots = Seq(("a.com", "User-agent: *\nDisallow: /x\n"))
      .toDF("domain", "robots_txt")
    val candidates = (0 until 64).map(i => s"https://a.com/p$i").toDF("url")
    val ranks = Seq(("a.com", 1L)).toDF("host", "rank_micro")
    val plan = graft.TestSpark.executedPlan(Frontier.build(candidates, "url",
      Robots.parseRulesTable(robots), Robots.parseDirectivesTable(robots),
      ranks))
    val bhj = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    assert(bhj.size >= 3, // rule sets + ranks + directives all broadcast
      s"expected 3 broadcast joins, plan:\n$plan")
    val globalSorts = plan.collect {
      case s: org.apache.spark.sql.execution.SortExec if s.global => s
    }
    assert(globalSorts.isEmpty, "frontier must not globally sort")
  }
}
