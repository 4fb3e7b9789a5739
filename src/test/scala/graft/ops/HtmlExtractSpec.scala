package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HtmlExtractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def textOf(html: String): String =
    Seq(html).toDF("h").select(HtmlExtract.htmlToText(col("h")))
      .head().getString(0)

  test("htmlToText strips tags, keeps block structure as newlines") {
    val got = textOf(
      "<html><body><h1>Title</h1><p>one  two</p><div>three<br>four</div></body></html>")
    assert(got == "Title\none two\nthree\nfour")
  }

  test("script/style/comment content vanishes even with < > && payloads") {
    val got = textOf(
      "<head><!-- note --><style>p > a { x: 1 }</style>" +
        "<script>if (1 < 2 && x > 0) { nav(); }</script></head><p>kept</p>")
    assert(got == "kept")
  }

  test("entities decode, &amp; last so &amp;lt; yields literal &lt;") {
    val got = textOf("<p>a &lt;tag&gt; &quot;q&quot; &#39;s&#39;" +
      " &nbsp; b &amp; c &amp;lt;</p>")
    assert(got == "a <tag> \"q\" 's' b & c &lt;")
  }

  test("titleOf extracts and decodes; NULL when absent") {
    val df = Seq("<title> A &amp; B </title><p>x</p>", "<p>no title</p>")
      .toDF("h").select(HtmlExtract.titleOf(col("h")).as("t"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("A & B"), None))
  }

  test("extract counts anchors case-insensitively") {
    val df = Seq((1L, "<a href=x>l</a> <A HREF=y>u</A> <abbr>not an anchor</abbr>"))
      .toDF("id", "h")
    val row = HtmlExtract.extract(df, "id", "h").head()
    assert(row.getAs[Int]("n_anchors") == 2)
    assert(row.getAs[String]("text_clean") == "l u not an anchor")
  }

  test("contentBlocks drops anchor-dominated blocks, keeps prose, reassembles in order") {
    val html = "<div><a href=/>Home</a> <a href=/a>About</a> <a href=/b>More</a></div>" +
      "<p>Real prose paragraph one.</p>" +
      "<div><a href=/t>Terms</a> <a href=/p>Privacy</a></div>" +
      "<p>Second real paragraph.</p>"
    val out = HtmlExtract.contentBlocks(Seq((7L, html)).toDF("id", "h"), "id", "h")
      .head()
    assert(out.getAs[Long]("n_blocks") == 4)
    assert(out.getAs[Long]("n_kept") == 2)
    assert(out.getAs[String]("text_content") ==
      "Real prose paragraph one.\nSecond real paragraph.")
  }

  test("document-level extract is one shuffle-free codegen projection") {
    val df = (0 until 50).map(i => (i.toLong, s"<p>doc $i</p>")).toDF("id", "h")
    val plan = TestSpark.executedPlan(HtmlExtract.extract(df, "id", "h"))
    assert(!plan.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
      "htmlToText/extract must not shuffle")
  }

  test("metaOf / canonicalLinkOf: attribute orders, entities, absence") {
    val cases = Seq(
      (1L, "<meta name=\"description\" content=\"A &amp; B\">" +
        "<link rel=\"canonical\" href=\"https://c/1\">"),
      (2L, "<META content=\"reversed\" extra=\"x\" name=\"description\">" +
        "<link type=\"t\" href=\"https://c/2\" rel=\"canonical\">"),
      (3L, "<meta name=\"keywords\" content=\"not description\">"),
      (4L, "<meta name=\"description\" content=\"\">")) // empty -> NULL
      .toDF("id", "html")
    val got = cases.select(col("id"),
      HtmlExtract.metaOf(col("html"), "description").as("d"),
      HtmlExtract.canonicalLinkOf(col("html")).as("c"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), Option(r.getString(2)))).toMap
    assert(got(1L) == (Some("A & B"), Some("https://c/1")))
    assert(got(2L) == (Some("reversed"), Some("https://c/2")))
    assert(got(3L) == (None, None))
    assert(got(4L) == (None, None))
  }

  test("contentBlocks keeps a NULL-html doc as an all-dropped row") {
    val out = HtmlExtract.contentBlocks(
      Seq((1L, Option.empty[String])).toDF("id", "h"), "id", "h").head()
    assert(out.getAs[Long]("n_kept") == 0)
    assert(out.isNullAt(out.fieldIndex("text_content")))
  }
}
