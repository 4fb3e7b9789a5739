package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end pipeline semantics on a fully planted crawl: every stage
  * must claim exactly its own victims, nothing else. */
class CrawlCurateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def body(i: Int): String =
    (0 until 30).map(j => s"word${(i * 53 + j * 11) % 300} tail$j").mkString(" ")

  private def page(i: Int, text: String): String =
    s"<html><head><title>Page $i</title></head><body>" +
      "<div><a href=\"/\">Home</a> <a href=\"/a\">About</a></div>" +
      s"<p>$text</p></body></html>"

  private val leak =
    "the quick brown fox jumps over the lazy dog " + body(99)

  test("each stage claims exactly its planted victims") {
    val pages = (
      (0 until 20).map(i => (i.toLong, s"https://site$i.example.com/p/$i", page(i, body(i)))) ++ Seq(
        // exact dup of doc 3 at a fresh URL -> dies at exact dedup
        (103L, "https://mirror.example.org/x/103", page(3, body(3))),
        // near dup of doc 5 (first word changed) -> dies at near dedup
        (105L, "https://mirror.example.org/x/105",
          page(5, "zzz " + body(5).substring(body(5).indexOf(' ') + 1))),
        // URL-variant re-crawl of doc 7 -> dies at URL dedup
        (107L, "HTTPS://WWW.site7.example.com/p/7/?utm_source=x", page(7, body(7))),
        // too short -> dies at the quality gate
        (110L, "https://site110.example.com/", page(110, "tiny")),
        // shares a 5-gram run with the benchmark -> decontaminated
        (111L, "https://site111.example.com/", page(111, leak)),
        // robots-disallowed path -> dies at the compliance gate
        (112L, "https://site0.example.com/private/x", page(112, body(112))))
      ).toDF("doc_id", "url", "html")
    val benchmark = Seq("the quick brown fox jumps over the lazy dog")
      .toDF("text")
    val rules = Robots.parseRulesTable(Seq(
      ("example.com", "User-agent: *\nDisallow: /private\n"))
      .toDF("domain", "robots_txt"))

    val out = CrawlCurate.curatePages(pages, benchmark,
      robotsRules = Some(rules))
    val rows = out.collect()
    CacheRegistry.releaseAll()
    val kept = rows.map(_.getAs[Long]("doc_id")).toSet
    assert(kept == (0L until 20L).toSet, s"got $kept")
    assert(rows.forall(r => Set("train", "val", "test")
      .contains(r.getAs[String]("split"))))
    // extraction really ran: chrome present as block lines, tags gone
    val t3 = rows.find(_.getAs[Long]("doc_id") == 3L).get.getAs[String]("text")
    assert(t3.startsWith("Page 3\nHome About\n") && !t3.contains("<"))
  }

  test("HTTP-record form: status/mime gates and charset decode feed the chain") {
    import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
    def http(status: Int, ctype: String, body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 $status X\r\nContent-Type: $ctype\r\n\r\n")
        .getBytes(UTF_8) ++ body
    def rec(i: Long, payload: Array[Byte]): (String, String, Array[Byte]) =
      (s"<urn:r:$i>", s"https://s$i.example.com/doc/$i", payload)
    val recs = ((0 until 8).map(i => rec(i.toLong,
      http(200, "text/html; charset=utf-8",
        page(i, body(i)).getBytes(UTF_8)))) ++ Seq(
      // 404: body is fine html but the status gate must drop it
      rec(40L, http(404, "text/html", page(40, body(40)).getBytes(UTF_8))),
      // wrong mime: 200 but an image
      rec(41L, http(200, "image/png", Array[Byte](1, 2, 3))),
      // Latin-1 page: declared charset must decode é correctly
      rec(30L, http(200, "text/html; charset=ISO-8859-1",
        page(30, body(30) + " café bar").getBytes(ISO_8859_1))),
      // not an HTTP response at all -> NULL status -> dropped here
      rec(42L, page(42, body(42)).getBytes(UTF_8))))
      .toDF("record_id", "target_uri", "content")
    val bench = Seq("completely unrelated benchmark sentence here")
      .toDF("text")
    val out = CrawlCurate.curateHttpRecords(recs, bench)
    val rows = out.collect()
    CacheRegistry.releaseAll()
    val kept = rows.map(_.getAs[Long]("doc_id")).toSet
    assert(kept == (0L until 8L).toSet + 30L, s"got $kept")
    val t30 = rows.find(_.getAs[Long]("doc_id") == 30L)
      .get.getAs[String]("text")
    assert(t30.contains("café bar"), s"charset decode lost é: $t30")
  }

  test("re-running on the curated output is a fixpoint") {
    val pages = (0 until 8).map(i =>
      (i.toLong, s"https://s$i.example.com/$i", page(i, body(i))))
      .toDF("doc_id", "url", "html")
    val bench = Seq("completely unrelated benchmark sentence here")
      .toDF("text")
    val once = CrawlCurate.curatePages(pages, bench)
    // feed the curated text back through as trivial pages
    val again = CrawlCurate.curatePages(
      once.select(col("doc_id"), col("url"),
        concat(lit("<body><p>"), col("text"), lit("</p></body>")).as("html")),
      bench)
    val a = once.select("doc_id").as[Long].collect().toSet
    val b = again.select("doc_id").as[Long].collect().toSet
    CacheRegistry.releaseAll()
    assert(a == b, "curation must be idempotent on its own output")
  }
}
