package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.{CacheRegistry, LinkGraph}

class LinkStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** A page whose links are fully determined by (host, targets). */
  private def page(host: String, targets: Seq[String]): (Long, String, String) = {
    val id = host.hashCode.toLong & 0xffffL
    val hrefs = targets.map(t =>
      s"""<a href="https://$t/doc">to $t</a>""").mkString
    (id, s"https://$host/idx", s"<html><body>$hrefs</body></html>")
  }

  private def ranksOf(stateDir: String): Map[String, Long] =
    spark.read.parquet(s"$stateDir/ranks")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def batchRanks(pages: Seq[(Long, String, String)]): Map[String, Long] = {
    val df = pages.toDF("doc_id", "url", "html")
    val links = LinkGraph.extractLinks(df, "doc_id", "url", "html")
    val out = LinkGraph.pageRank(LinkGraph.hostEdges(links, "url", "dst_url"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    CacheRegistry.releaseAll()
    out
  }

  test("stream == batch across waves; redelivery leaves ranks unchanged") {
    val landing = TestSpark.tmpDir("link_landing")
    val state = TestSpark.tmpDir("link_state")
    val ckpt = TestSpark.tmpDir("link_ckpt")
    def run(): Unit = {
      val q = LinkStreamIngest.start(spark, landing, state, ckpt)
      q.awaitTermination(120000)
    }
    val wave1 = Seq(
      page("a.example.com", Seq("b.example.com", "c.example.com")),
      page("b.example.com", Seq("c.example.com")),
      page("c.example.com", Seq("a.example.com")))
    wave1.toDF("doc_id", "url", "html").coalesce(1)
      .write.mode("append").parquet(landing)
    run()
    assert(ranksOf(state) == batchRanks(wave1), "wave 1: stream == batch")

    // wave 2 adds a page with one old edge (must not duplicate) and
    // one new host
    val wave2 = Seq(
      page("a.example.com", Seq("b.example.com", "d.example.com")))
    wave2.toDF("doc_id", "url", "html").coalesce(1)
      .write.mode("append").parquet(landing)
    run()
    assert(ranksOf(state) == batchRanks(wave1 ++ wave2),
      "wave 2: stream == batch over the merged graph")
    val edges = spark.read.parquet(s"$state/edges")
    assert(edges.count() == edges.distinct().count(),
      "edge store stays duplicate-free")

    // redelivery: the same wave-1 pages as NEW files — no novel edges,
    // ranks byte-identical
    val before = ranksOf(state)
    wave1.toDF("doc_id", "url", "html").coalesce(1)
      .write.mode("append").parquet(landing)
    run()
    assert(ranksOf(state) == before, "redelivery is a no-op")
    assert(edges.count() == 5, s"5 distinct edges, got ${edges.count()}")
  }
}
