package graft.streaming

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.{CacheRegistry, Robots}

class FrontierStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def page(host: String, targets: Seq[String]): (Long, String, String) = {
    val id = host.hashCode.toLong & 0xffffL
    val hrefs = targets.map(t =>
      s"""<a href="https://$t/doc">to $t</a>""").mkString
    (id, s"https://$host/idx", s"<html><body>$hrefs</body></html>")
  }

  private def seeds: DataFrame =
    Seq("https://z.example.com/seed").toDF("url")
  private def robots: DataFrame = Seq(
    ("example.com", "User-agent: *\nDisallow: /*.bin$\nCrawl-delay: 3\n"))
    .toDF("domain", "robots_txt")
  private def rules = Robots.parseRulesTable(robots)
  private def directives = Robots.parseDirectivesTable(robots)

  private def frontierOf(stateDir: String): Set[(String, String, Long, Long, Long, Int)] =
    spark.read.parquet(s"$stateDir/frontier")
      .select("url", "host", "n_refs", "rank_micro", "crawl_delay_ms", "host_pos")
      .as[(String, String, Long, Long, Long, Int)].collect().toSet

  private def batchFrontier(pages: Seq[(Long, String, String)])
      : Set[(String, String, Long, Long, Long, Int)] = {
    val state = TestSpark.tmpDir("frontier_batch_state")
    FrontierStream.ingestBatch(spark, state,
      pages.toDF("doc_id", "url", "html"), seeds, rules, directives)
    val out = frontierOf(state)
    CacheRegistry.releaseAll()
    out
  }

  test("stream == batch across waves; redelivery leaves the queue unchanged") {
    val landing = TestSpark.tmpDir("frontier_landing")
    val state = TestSpark.tmpDir("frontier_state")
    val ckpt = TestSpark.tmpDir("frontier_ckpt")
    def run(): Unit = {
      val q = FrontierStream.start(spark, landing, state, ckpt,
        seeds, rules, directives)
      q.awaitTermination(120000)
    }
    val wave1 = Seq(
      page("a.example.com", Seq("b.example.com", "c.example.com")),
      page("b.example.com", Seq("c.example.com")),
      page("c.example.com", Seq("a.example.com")))
    wave1.toDF("doc_id", "url", "html").coalesce(1)
      .write.mode("append").parquet(landing)
    run()
    val f1 = frontierOf(state)
    assert(f1 == batchFrontier(wave1), "wave 1: stream == batch")
    assert(f1.exists(_._1 == "https://z.example.com/seed"),
      "seed rides the queue")
    assert(f1.forall(_._5 == 3000L), "crawl delay (ms) annotates every row")

    // wave 2: one already-known link (no n_refs drift) + one new host
    val wave2 = Seq(
      page("a.example.com", Seq("b.example.com", "d.example.com")))
    wave2.toDF("doc_id", "url", "html").coalesce(1)
      .write.mode("append").parquet(landing)
    run()
    assert(frontierOf(state) == batchFrontier(wave1 ++ wave2),
      "wave 2: stream == batch over the merged link store")

    // redelivery: wave-1 pages as NEW files -> no novel links, the
    // rebuilt queue is identical
    val before = frontierOf(state)
    wave1.toDF("doc_id", "url", "html").coalesce(1)
      .write.mode("append").parquet(landing)
    run()
    assert(frontierOf(state) == before, "redelivery is a no-op")
    val links = spark.read.parquet(s"$state/links")
    assert(links.count() == links.distinct().count(),
      "link store stays duplicate-free")
  }
}
