package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SitemapsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("urlset and sitemapindex entries; entities, whitespace, lastmod") {
    val docs = Seq(
      (1L,
        """<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
          |<url><loc> https://a.example.com/p?x=1&amp;y=2 </loc>
          |<lastmod>2026-03-01</lastmod><priority>0.8</priority></url>
          |<url><loc>https://a.example.com/q</loc></url>
          |<url><changefreq>daily</changefreq></url>
          |</urlset>""".stripMargin),
      (2L,
        """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
          |<sitemap><loc>https://b.example.com/sm1.xml</loc></sitemap>
          |</sitemapindex>""".stripMargin))
      .toDF("doc_id", "xml")
    val got = Sitemaps.urls(docs, "doc_id", "xml")
      .orderBy("doc_id", "url").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)),
        r.getBoolean(3)))
    assert(got.toSeq == Seq(
      // entity decoded, whitespace trimmed, lastmod carried
      (1L, "https://a.example.com/p?x=1&y=2", Some("2026-03-01"), false),
      (1L, "https://a.example.com/q", None, false),
      // the loc-less <url> entry dropped; index doc flagged
      (2L, "https://b.example.com/sm1.xml", None, true)))
  }
}
