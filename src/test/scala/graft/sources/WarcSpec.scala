package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Warc.WarcRecord

class WarcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rec(i: Int, body: Array[Byte]) = WarcRecord(
    s"<urn:graft:$i>", "response", s"https://x.example/doc/$i",
    "text/plain; charset=utf-8", body)

  test("encode/parse round-trips records, including CRLF-laden binary bodies") {
    val bodies = Seq(
      "plain text".getBytes(UTF_8),
      "tricky\r\n\r\nWARC/1.0\r\nfake header\r\n\r\n".getBytes(UTF_8),
      Array.empty[Byte],
      Array.tabulate(257)(j => (j % 251).toByte))
    val recs = bodies.zipWithIndex.map { case (b, i) => rec(i, b) }
    val stream = recs.flatMap(Warc.encodeRecord).toArray
    val back = Warc.parseAll(stream).toSeq
    assert(back.size == recs.size)
    recs.zip(back).foreach { case (a, b) =>
      assert(a.recordId == b.recordId && a.targetUri == b.targetUri)
      assert(java.util.Arrays.equals(a.content, b.content))
    }
  }

  test("a truncated final record is dropped; earlier records survive") {
    val full = Seq(rec(0, "first body".getBytes(UTF_8)),
      rec(1, "second body".getBytes(UTF_8))).flatMap(Warc.encodeRecord).toArray
    // cut mid-way through record 1's body
    val cut = java.util.Arrays.copyOfRange(full, 0, full.length - 8)
    val back = Warc.parseAll(cut).toSeq
    assert(back.map(_.recordId) == Seq("<urn:graft:0>"))
    // cut mid-way through record 1's HEADER
    val headCut = java.util.Arrays.copyOfRange(full, 0,
      full.length - "second body".length - 10)
    assert(Warc.parseAll(headCut).toSeq.map(_.recordId) == Seq("<urn:graft:0>"))
  }

  test("parseStream is incremental: a lazily-generated archive parses " +
      "without the archive ever existing as one buffer") {
    // 5000 records served by a stream that materializes ONE record's
    // bytes at a time — the concatenated archive (~11 MB) never exists
    // as an array, so completing the parse proves the reader needs only
    // record-sized memory (the round-8 whole-archive-gunzip hazard).
    val n = 5000
    val body = Array.tabulate(2048)(j => (j % 97).toByte)
    var served = 0
    val lazyArchive: java.io.InputStream = new java.io.SequenceInputStream(
      new java.util.Enumeration[java.io.InputStream] {
        private var i = 0
        override def hasMoreElements: Boolean = i < n
        override def nextElement(): java.io.InputStream = {
          served += 1
          val s = new java.io.ByteArrayInputStream(
            Warc.encodeRecord(rec(i, body)))
          i += 1; s
        }
      })
    val it = Warc.parseStream(lazyArchive)
    // laziness witness: after one record, the source has not been drained
    val first = it.next()
    assert(first.recordId == "<urn:graft:0>")
    assert(served <= 8, s"parser drained $served records for one next()")
    assert(it.size == n - 1) // and the rest stream through
  }

  test("parseHttp: status/headers/body split, binary body, non-HTTP") {
    val body = Array.tabulate(300)(j => (j % 251).toByte) // binary, CRLF-laden
    val head = ("HTTP/1.1 301 Moved Permanently\r\n" +
      "Location: https://x.example/new\r\n" +
      "Content-Type: Text/HTML; charset=\"ISO-8859-1\"\r\n" +
      "\r\n").getBytes(UTF_8)
    val Some((status, headers, got)) = Warc.parseHttp(head ++ body)
    assert(status == 301)
    assert(headers == Seq(
      "location" -> "https://x.example/new",
      "content-type" -> "Text/HTML; charset=\"ISO-8859-1\""))
    assert(java.util.Arrays.equals(got, body))
    // reason-less status line is legal (RFC 9112 allows empty reason)
    assert(Warc.parseHttp("HTTP/1.1 204\r\n\r\n".getBytes(UTF_8))
      .exists(_._1 == 204))
    // not HTTP / never-terminating header block -> None
    assert(Warc.parseHttp("plain text payload".getBytes(UTF_8)).isEmpty)
    assert(Warc.parseHttp("HTTP/1.1 200 OK\r\nX: 1\r\n".getBytes(UTF_8)).isEmpty)
    assert(Warc.parseHttp("HTTP/1.1 abc\r\n\r\n".getBytes(UTF_8)).isEmpty)
  }

  test("resolveRedirects: chains, loops, external landings, hop cap") {
    val rs = Seq(
      ("https://s/a", 301, "https://s/b"),   // a -> b -> c -> final (3 hops)
      ("https://s/b", 302, "https://s/c"),
      ("https://s/c", 301, "https://s/final"),
      ("https://s/final", 200, null),
      ("https://s/x", 301, "https://s/y"),   // 2-cycle: never resolves
      ("https://s/y", 301, "https://s/x"),
      ("https://s/ext", 301, "https://elsewhere/e"), // outside corpus
      ("https://s/plain", 200, null))
      .toDF("target_uri", "status", "location")
    val got = Warc.resolveRedirects(rs, maxHops = 4)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), Option(r.get(2)), r.getInt(3), r.getBoolean(4))))
      .toMap
    assert(got("https://s/a") == (("https://s/final", Some(200), 3, true)))
    assert(got("https://s/b") == (("https://s/final", Some(200), 2, true)))
    assert(got("https://s/x")._4 == false) // still redirecting at cap
    assert(got("https://s/x")._3 == 4)
    assert(got("https://s/ext") ==
      (("https://elsewhere/e", None, 1, true))) // unknown status stops
    assert(got("https://s/plain") == (("https://s/plain", Some(200), 0, true)))
  }

  test("resolveRedirects: duplicate captures don't multiply rows") {
    // /dup captured TWICE (both 301 -> /t); /t itself captured twice.
    // The step table collapses to one capture per uri (min (st, loc),
    // NULLs last), so each input row resolves exactly once.
    val rs = Seq(
      ("https://s/dup", 301, "https://s/t"),
      ("https://s/dup", 301, "https://s/t"),
      ("https://s/t", 200, null),
      ("https://s/t", 410, null))
      .toDF("target_uri", "status", "location")
    val out = Warc.resolveRedirects(rs, maxHops = 4).collect()
    assert(out.length == 4) // one row per INPUT row, no join fan-out
    val dupRows = out.filter(_.getString(0) == "https://s/dup")
    assert(dupRows.length == 2)
    // deterministic pick: min status 200 wins for the /t lookup
    assert(dupRows.forall(r =>
      r.getString(1) == "https://s/t" && r.getInt(3) == 1 &&
        r.getBoolean(4) && r.get(2) == 200))
  }

  test("resolveRedirects: a redirect capture of a 2xx-deduped uri resolves") {
    // /u captured BOTH as 200 and as a 301 -> /t: the collapsed choice
    // for /u is the 200 (min status), so BOTH captures must resolve
    // terminally at /u — the 301 capture walks the collapsed chain,
    // it neither follows its own Location nor hangs unresolved.
    val rs = Seq(
      ("https://s/u", 200, null),
      ("https://s/u", 301, "https://s/t"),
      ("https://s/t", 200, null))
      .toDF("target_uri", "status", "location")
    val out = Warc.resolveRedirects(rs, maxHops = 4)
      .filter(col("uri") === "https://s/u").collect()
    assert(out.length == 2)
    assert(out.forall(r => r.getString(1) == "https://s/u" &&
      r.get(2) == 200 && r.getInt(3) == 0 && r.getBoolean(4)))
  }

  test("decodeBody: declared charsets, fallback, replacement, null body") {
    val rows = Seq(
      (1L, "windows-1252", Array(0x80.toByte, 'a'.toByte)), // € then a
      (2L, "iso-8859-1", Array(0xE9.toByte)),               // é
      (3L, null, "plain".getBytes(UTF_8)),                  // null -> utf-8
      (4L, "no-such-charset", "ok".getBytes(UTF_8)),        // fallback utf-8
      (5L, "utf-8", Array(0xFF.toByte, 'b'.toByte)),        // malformed
      (6L, "utf-8", null))                                  // null body
      .toDF("id", "charset", "body")
    val got = Warc.decodeBody(rows, "body", "charset")
      .select("id", "text").as[(Long, String)].collect().toMap
    assert(got(1L) == "€a")
    assert(got(2L) == "é")
    assert(got(3L) == "plain")
    assert(got(4L) == "ok")
    assert(got(5L) == "�b") // replaced, not thrown
    assert(got(6L) == null)
  }

  test("non-WARC leading bytes are a loud error, not a silent skip") {
    val e = intercept[IllegalArgumentException] {
      Warc.parseAll("HTTP/1.1 200 OK\r\n\r\nnope\r\n\r\n".getBytes(UTF_8)).toSeq
    }
    assert(e.getMessage.contains("not a WARC record"))
  }

  test("writeCorpus/read round-trips a corpus through per-record gzip members") {
    val dir = TestSpark.tmpDir("warc_rt")
    val docs = (0 until 100).map(i =>
      (i.toLong, s"https://x.example/doc/$i", s"doc $i body\nsecond line $i"))
      .toDF("doc_id", "uri", "text").repartition(4)
    Warc.writeCorpus(docs, "doc_id", "uri", "text", dir)
    val files = new java.io.File(dir).listFiles()
    assert(files.nonEmpty && files.forall(_.getName.endsWith(".warc.gz")),
      "expected per-partition .warc.gz archives")
    // each archive holds one gzip member PER RECORD (the Common Crawl
    // splittable layout): member count = record count, via magic scan
    val f0 = files.minBy(_.getName)
    val bytes = java.nio.file.Files.readAllBytes(f0.toPath)
    val members = (0 until bytes.length - 1).count(i =>
      (bytes(i) & 0xff) == 0x1f && (bytes(i + 1) & 0xff) == 0x8b &&
        (i + 2 < bytes.length && (bytes(i + 2) & 0xff) == 0x08))
    val recsIn0 = Warc.read(spark, f0.getAbsolutePath).count()
    assert(members >= recsIn0,
      s"expected >= $recsIn0 gzip members in ${f0.getName}, found $members")
    val back = Warc.read(spark, dir)
      .select(regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1)
        .cast("long").as("doc_id"), col("content").cast("string").as("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(back.length == 100)
    assert(back(42) == (42L, "doc 42 body\nsecond line 42"))
  }

  test("indexed write: random-access fetch equals the full scan") {
    val dir = TestSpark.tmpDir("warc_idx")
    val docs = (0 until 80).map(i =>
      (i.toLong, s"https://x.example/doc/$i", s"indexed body $i\nline two $i"))
      .toDF("doc_id", "uri", "text").repartition(3)
    Warc.writeCorpusIndexed(docs, "doc_id", "uri", "text", dir)
    val idx = spark.read.parquet(s"$dir/_index")
    assert(idx.count() == 80)
    // offsets really are member boundaries: a direct seek decodes
    val one = idx.filter(col("uri") === "https://x.example/doc/42")
      .head()
    val rec = Warc.readRecordAt(one.getAs[String]("path"),
      one.getAs[Long]("offset"), one.getAs[Int]("length"))
    assert(rec.targetUri == "https://x.example/doc/42")
    assert(new String(rec.content, UTF_8) == "indexed body 42\nline two 42")
    // the Spark fetch path agrees with a full-archive scan
    val uris = Seq(3L, 42L, 77L).map(i => s"https://x.example/doc/$i")
    val fetched = Warc.fetchByUri(spark, dir, uris)
      .select("target_uri", "content").collect()
      .map(r => (r.getString(0), new String(r.getAs[Array[Byte]](1), UTF_8)))
      .toSet
    val scanned = Warc.read(spark, dir)
      .filter(col("target_uri").isInCollection(uris))
      .select("target_uri", "content").collect()
      .map(r => (r.getString(0), new String(r.getAs[Array[Byte]](1), UTF_8)))
      .toSet
    assert(fetched == scanned && fetched.size == 3)
  }

  test("table-driven fetch equals the list form") {
    val dir = TestSpark.tmpDir("warc_idx_tbl")
    val docs = (0 until 30).map(i =>
      (i.toLong, s"https://x.example/doc/$i", s"body $i"))
      .toDF("doc_id", "uri", "text").repartition(2)
    Warc.writeCorpusIndexed(docs, "doc_id", "uri", "text", dir)
    val want = Seq(5L, 17L, 23L).map(i => s"https://x.example/doc/$i")
    val viaList = Warc.fetchByUri(spark, dir, want)
      .select("target_uri").as[String].collect().toSet
    val viaTable = Warc.fetchByUriTable(spark, dir, want.toDF("uri"))
      .select("target_uri").as[String].collect().toSet
    assert(viaList == want.toSet && viaTable == want.toSet)
  }

  test("indexed write works uncompressed too (offsets are raw-byte)") {
    val dir = TestSpark.tmpDir("warc_idx_plain")
    val docs = Seq((1L, "https://x.example/doc/1", "plain one"),
      (2L, "https://x.example/doc/2", "plain two"))
      .toDF("doc_id", "uri", "text").coalesce(1)
    Warc.writeCorpusIndexed(docs, "doc_id", "uri", "text", dir, gzip = false)
    val got = Warc.fetchByUri(spark, dir, Seq("https://x.example/doc/2"))
      .select("content").head().getAs[Array[Byte]](0)
    assert(new String(got, UTF_8) == "plain two")
  }

  test("read handles uncompressed archives too") {
    val dir = TestSpark.tmpDir("warc_plain")
    val docs = (0 until 10).map(i =>
      (i.toLong, s"https://x.example/doc/$i", s"plain $i"))
      .toDF("doc_id", "uri", "text").coalesce(1)
    Warc.writeCorpus(docs, "doc_id", "uri", "text", dir, gzip = false)
    assert(new java.io.File(dir).listFiles().forall(_.getName.endsWith(".warc")))
    assert(Warc.read(spark, dir).count() == 10)
  }
}
