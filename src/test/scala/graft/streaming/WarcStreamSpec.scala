package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Warc

/** The crawl front end (WARC archives → HTML extraction → curation)
  * must behave identically as a landing-dir stream and as a batch read
  * — and a re-delivered archive (crawler retry) must add nothing. */
class WarcStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def body(i: Int): String =
    (0 until 30).map(j => s"word${(i * 89 + j * 17) % 400} tail$j").mkString(" ")

  private def html(i: Int): String =
    "<html><head><title>Doc " + i + "</title>" +
      "<script>if (1 < 2 && x > 0) { nav(); }</script></head>" +
      "<body><div><a href=\"/\">Home</a> <a href=\"/a\">About</a></div>" +
      s"<p>${body(i)}</p></body></html>"

  private def writeWave(landing: String, docs: Seq[(Long, String)]): Unit =
    Warc.writeCorpus(
      docs.toDF("doc_id", "page")
        .select(col("doc_id"),
          concat(lit("https://crawl.example/doc/"),
            col("doc_id").cast("string")).as("uri"),
          col("page")).coalesce(1),
      "doc_id", "uri", "page", landing)

  test("streamed WARC curation equals the batch pipeline; redelivery is a no-op") {
    val landing = TestSpark.tmpDir("warc_landing")
    val out = TestSpark.tmpDir("warc_out")
    val ckpt = TestSpark.tmpDir("warc_ckpt")
    def run(): Unit = {
      val q = CorpusStreamIngest.startWarcCurate(spark, landing, out, ckpt)
      q.awaitTermination(180000)
    }

    // wave 1: 25 good pages + a too-short page (gated out)
    writeWave(landing, (0 until 25).map(i => (i.toLong, html(i))) :+
      (90L, "<html><body><p>tiny</p></body></html>"))
    run()
    val kept1 = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(kept1 == (0L until 25L).toSet, s"wave 1: got $kept1")

    // wave 2: 10 new pages + a full REDELIVERY of wave 1's archive
    // content (same ids, same pages — content-hash dedup must drop all)
    writeWave(landing, (100 until 110).map(i => (i.toLong, html(i))) ++
      (0 until 25).map(i => (i.toLong, html(i))))
    run()
    val got = spark.read.parquet(out)
      .select("doc_id", "content_hash").as[(Long, String)].collect().toSet

    val batch = CorpusStreamIngest.curate(
      Warc.read(spark, landing)
        .select(regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1)
          .cast("long").as("doc_id"),
          graft.ops.HtmlExtract.htmlToText(col("content").cast("string"))
            .as("text")))
      .select("doc_id", "content_hash").as[(Long, String)].collect().toSet

    assert(got == batch, "stream and batch must keep identical rows")
    assert(got.map(_._1) == ((0L until 25L) ++ (100L until 110L)).toSet)
  }
}
