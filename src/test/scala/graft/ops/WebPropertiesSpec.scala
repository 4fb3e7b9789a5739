package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Seeded property sampling for the web-crawl ops (the SketchesSpec
  * bridge pattern): generated URLs and HTML exercise corners the
  * hand-written cases don't enumerate. */
class WebPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(20260815)

  private def label(): String = {
    val n = 1 + rnd.nextInt(8)
    (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
  }

  private def genUrl(): String = {
    val scheme = if (rnd.nextBoolean()) "https" else "HTTP"
    val www = if (rnd.nextBoolean()) "WWW." else ""
    val labels = 1 + rnd.nextInt(3)
    val tld = Seq(".com", ".org", ".co.uk", ".com.au", ".io")(rnd.nextInt(5))
    val host = (0 until labels).map(_ => label()).mkString(".") + tld
    val port = rnd.nextInt(3) match {
      case 0 => ":443"
      case 1 => s":${1024 + rnd.nextInt(60000)}"
      case _ => ""
    }
    val path = (0 until rnd.nextInt(4)).map(_ => "/" + label()).mkString +
      (if (rnd.nextBoolean()) "/" else "")
    val params = (0 until rnd.nextInt(4)).map { _ =>
      rnd.nextInt(4) match {
        case 0 => s"utm_${label()}=${label()}"
        case 1 => "gclid=" + label()
        case 2 => "ref=" + label()
        case _ => s"${label()}=${label()}"
      }
    }
    val q = if (params.nonEmpty) "?" + params.mkString("&") else ""
    val frag = if (rnd.nextBoolean()) "#" + label() else ""
    s"$scheme://$www$host$port$path$q$frag"
  }

  test("canonicalize is idempotent and variant-invariant over 1000 sampled URLs") {
    val urls = (0 until 1000).map(_ => genUrl())
    val rows = urls.toDF("url")
      .select(col("url"), UrlTools.canonicalize(col("url")).as("c1"))
      .select(col("url"), col("c1"),
        UrlTools.canonicalize(col("c1")).as("c2"),
        // variants that must not move the canonical: fragment swap,
        // host case, an extra tracking param
        UrlTools.canonicalize(
          concat(regexp_replace(col("url"), "#.*$", ""), lit("#other")))
          .as("cFrag"))
      .collect()
    rows.foreach { r =>
      val (u, c1, c2, cFrag) = (r.getString(0), r.getString(1),
        r.getString(2), r.getString(3))
      assert(c1 == c2, s"not idempotent: $u -> $c1 -> $c2")
      assert(c1 == cFrag, s"fragment moved the canonical: $u -> $c1 vs $cFrag")
      assert(!c1.contains("#") && !c1.contains("utm_") &&
        !c1.contains("gclid=") && !c1.contains("WWW."), s"residue in $c1")
    }
  }

  test("registered domain is a host suffix with at most 3 labels") {
    val hosts = (0 until 500).map { _ =>
      val labels = 1 + rnd.nextInt(4)
      (0 until labels).map(_ => label()).mkString(".") +
        Seq("", ".com", ".co.uk", ".ac.jp", ".net")(rnd.nextInt(5))
    }
    val rows = hosts.toDF("h")
      .select(col("h"), UrlTools.registeredDomainOfHost(col("h")).as("d"))
      .as[(String, String)].collect()
    rows.foreach { case (h, d) =>
      assert(h == d || h.endsWith("." + d), s"'$d' not a suffix of '$h'")
      assert(d.count(_ == '.') <= 2, s"'$d' has too many labels")
    }
  }

  test("htmlToText is idempotent on its own output (1000 sampled pages)") {
    val words = Vector("alpha", "beta", "gamma", "delta", "words", "table",
      "scan", "page", "crawl", "data")
    def text() = (0 until 3 + rnd.nextInt(20))
      .map(_ => words(rnd.nextInt(words.size))).mkString(" ")
    val pages = (0 until 1000).map { _ =>
      val blocks = (0 until 1 + rnd.nextInt(5)).map { _ =>
        rnd.nextInt(4) match {
          case 0 => s"<p>${text()}</p>"
          case 1 => s"<div class=\"${label()}\"><a href=\"/${label()}\">${text()}</a></div>"
          case 2 => s"<script>var ${label()} = 1 < 2;</script>"
          case _ => s"<h2>${text()}</h2><br>"
        }
      }.mkString
      s"<html><!-- ${label()} --><body>$blocks</body></html>"
    }
    val rows = pages.toDF("h")
      .select(HtmlExtract.htmlToText(col("h")).as("t1"))
      .select(col("t1"), HtmlExtract.htmlToText(col("t1")).as("t2"))
      .as[(String, String)].collect()
    rows.foreach { case (t1, t2) =>
      assert(t1 == t2, s"not a fixpoint: '$t1' -> '$t2'")
      assert(!t1.contains("<") && !t1.contains("  "),
        s"tags or uncollapsed spaces survive: '$t1'")
    }
  }
}
