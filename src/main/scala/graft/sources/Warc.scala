package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (ISO 28500) reader/writer — the container format web-crawl
  * corpora actually arrive in (Common Crawl publishes WARC). A file is
  * a concatenation of records, each `WARC/1.0\r\n` + header lines +
  * `\r\n` + Content-Length payload bytes + `\r\n\r\n`; the `.warc.gz`
  * form gzips EACH RECORD as its own gzip member so archives stay
  * byte-seekable (a reader can start at any member boundary — the
  * property that makes 100 TB of crawl splittable by offset index).
  *
  * Scale shape: `read` maps `binaryFile` rows (one task per archive
  * file; Common Crawl caps files at ~1 GB for exactly this reason)
  * through a streaming parser — records are emitted via Iterator, so
  * memory is one record + one file buffer, not the expanded archive.
  * `writeCorpus` builds archives executor-side, one per partition,
  * through a foreachPartition stream — no driver collect, no shuffle
  * beyond the caller's partitioning.
  *
  * Implements the public ISO 28500 layout directly (same ethos as the
  * repo's HDF4/GeoTIFF/shapefile codecs: no format library in the
  * container, so the codec is hand-rolled from the spec).
  */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("record_id", StringType),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("content_type", StringType),
    StructField("content", BinaryType)))

  final case class WarcRecord(recordId: String, warcType: String,
                              targetUri: String, contentType: String,
                              content: Array[Byte])

  // ---- record-level codec -------------------------------------------

  /** Serialize one record (uncompressed WARC bytes). */
  def encodeRecord(r: WarcRecord): Array[Byte] = {
    val header = new StringBuilder()
      .append("WARC/1.0\r\n")
      .append(s"WARC-Type: ${r.warcType}\r\n")
      .append(s"WARC-Record-ID: ${r.recordId}\r\n")
      .append(s"WARC-Target-URI: ${r.targetUri}\r\n")
      .append(s"Content-Type: ${r.contentType}\r\n")
      .append(s"Content-Length: ${r.content.length}\r\n")
      .append("\r\n").toString.getBytes(UTF_8)
    val out = new Array[Byte](header.length + r.content.length + 4)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(r.content, 0, out, header.length, r.content.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  private def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new GZIPOutputStream(bos)
    gz.write(bytes); gz.finish(); gz.close()
    bos.toByteArray
  }

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Largest header a record may carry before the parser declares the
    * input corrupt (a missing CRLFCRLF would otherwise buffer forever). */
  private val MaxHeaderBytes = 1 << 20

  /** Parse records INCREMENTALLY off a (decompressed) WARC stream.
    * Memory is one record — the header accumulator plus the
    * Content-Length body — never the archive: a 1 GB Common Crawl
    * archive parses through a 64 KB stream buffer. Tolerant of a
    * ragged tail (a final record truncated mid-header or mid-body is
    * dropped, matching how crawl readers handle mid-record upload
    * failures); malformed headers raise — corruption must be loud,
    * absence of a tail quiet. */
  def parseStream(in: java.io.InputStream): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private val s = new java.io.BufferedInputStream(in, 64 * 1024)
      private var nextRec: WarcRecord = _
      advance()

      /** Header bytes through CRLFCRLF (delimiter dropped); null on
        * clean EOF (only inter-record padding left) or a ragged tail. */
      private def readHeader(): Array[Byte] = {
        var c = s.read()
        while (c == '\r' || c == '\n') c = s.read() // inter-record padding
        if (c < 0) return null
        val bos = new ByteArrayOutputStream(256)
        var tail = 0 // last 4 bytes, big-endian rolling window
        while (c >= 0) {
          bos.write(c)
          tail = (tail << 8) | (c & 0xff)
          if (tail == 0x0d0a0d0a) {
            val all = bos.toByteArray
            return java.util.Arrays.copyOf(all, all.length - 4)
          }
          require(bos.size() <= MaxHeaderBytes, "WARC header exceeds 1 MiB")
          c = s.read()
        }
        null // ragged tail: header never completed
      }

      private def readBody(len: Int): Array[Byte] = {
        val body = new Array[Byte](len)
        var off = 0
        while (off < len) {
          val n = s.read(body, off, len - off)
          if (n < 0) return null // ragged tail: body truncated
          off += n
        }
        body
      }

      private def advance(): Unit = {
        nextRec = null
        val header = readHeader()
        if (header == null) return
        val lines = new String(header, UTF_8).split("\r\n")
        require(lines.headOption.exists(_.startsWith("WARC/")),
          s"not a WARC record: '${lines.headOption.getOrElse("")}'")
        val hs = lines.drop(1).map { l =>
          val i = l.indexOf(':')
          require(i > 0, s"malformed WARC header line: '$l'")
          l.substring(0, i).toLowerCase -> l.substring(i + 1).trim
        }.toMap
        val len = hs.getOrElse("content-length",
          sys.error("WARC record missing Content-Length")).toInt
        val body = readBody(len)
        if (body == null) return
        nextRec = WarcRecord(
          hs.getOrElse("warc-record-id", ""), hs.getOrElse("warc-type", ""),
          hs.getOrElse("warc-target-uri", ""), hs.getOrElse("content-type", ""),
          body)
      }

      override def hasNext: Boolean = nextRec != null
      override def next(): WarcRecord = {
        val r = nextRec; advance(); r
      }
    }

  /** Array convenience over [[parseStream]] (tests, member-sized
    * random access). */
  def parseAll(bytes: Array[Byte]): Iterator[WarcRecord] =
    parseStream(new ByteArrayInputStream(bytes))

  // ---- HTTP response payloads ----------------------------------------

  /** Split an HTTP/1.x response payload — what a WARC `response`
    * record's body actually holds in Common Crawl (raw status line +
    * headers + entity body, RFC 9112 framing) — into
    * (status, header pairs, body bytes). None when the payload is not
    * an HTTP response (no ASCII `HTTP/` prefix) or the header block
    * never terminates; headers keep file order, names lowercased,
    * values trimmed. The body is returned as the RAW bytes after
    * CRLFCRLF — no charset decode, no transfer-decoding (Common Crawl
    * stores payloads already de-chunked; a `transfer-encoding` header
    * is preserved so callers can quarantine the rare live-capture
    * case). */
  def parseHttp(payload: Array[Byte])
      : Option[(Int, Seq[(String, String)], Array[Byte])] = {
    val prefix = "HTTP/".getBytes(UTF_8)
    if (payload.length < 12 ||
        !prefix.indices.forall(i => payload(i) == prefix(i))) return None
    var he = -1
    var i = 0
    while (he < 0 && i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n') he = i
      i += 1
    }
    if (he < 0) return None
    val lines = new String(payload, 0, he, UTF_8).split("\r\n")
    // status line: HTTP-version SP status-code SP [reason]
    val parts = lines(0).split(" ", 3)
    val status = if (parts.length >= 2) parts(1).toIntOption else None
    if (status.isEmpty) return None
    val headers = lines.drop(1).toSeq.flatMap { l =>
      val j = l.indexOf(':')
      if (j <= 0) None
      else Some(l.substring(0, j).trim.toLowerCase -> l.substring(j + 1).trim)
    }
    val body = java.util.Arrays.copyOfRange(payload, he + 4, payload.length)
    Some((status.get, headers, body))
  }

  val httpSchema: StructType = StructType(Seq(
    StructField("record_id", StringType),
    StructField("target_uri", StringType),
    StructField("status", IntegerType),
    StructField("mime", StringType),
    StructField("charset", StringType),
    StructField("location", StringType), // Location header (3xx chains)
    StructField("body", BinaryType)))

  /** Resolve HTTP redirect chains across a response table — the
    * URL-graph repair every crawl corpus needs before page identity
    * means anything (a 301's content lives at the TARGET). Fixed-hop
    * unrolled joins (maxHops, default 4 — real chains are short and
    * UAs cap them), so the arithmetic replays exactly in the oracle:
    * per hop, rows whose current status is 3xx with a Location follow
    * one step; a location landing OUTSIDE the corpus carries NULL
    * status and stops (nothing more is known); a chain still
    * redirecting after maxHops (longer chain or a loop) reports
    * `resolved = false`.
    *
    * Output: (uri, final_uri, final_status, hops, resolved).
    *
    * Scale shape: the step table is the 3xx rows joined once against
    * response statuses; each hop is one equi-join of the state on
    * cur_uri — redirect rows are a small fraction of a crawl, so the
    * build side stays broadcast-able and non-redirecting rows pass
    * through untouched.
    *
    * Duplicate captures of the same URI (common in real crawl sets)
    * would multiply rows at every hop join, so the STEP table is built
    * from one deterministically-chosen capture per URI — min
    * (status, location) with NULLs last — while the output still
    * carries one row per INPUT row (each capture resolves through the
    * same collapsed chain). */
  def resolveRedirects(responses: DataFrame, maxHops: Int = 4,
                       uriCol: String = "target_uri",
                       statusCol: String = "status",
                       locationCol: String = "location"): DataFrame = {
    require(maxHops >= 1 && maxHops <= 8, s"maxHops $maxHops")
    def isRedir(s: org.apache.spark.sql.Column,
                l: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      s.between(300, 399) && l.isNotNull
    val base = responses.select(col(uriCol).as("uri"),
      col(statusCol).cast("int").as("st"), col(locationCol).as("loc"))
    // one capture per uri for the chain-walk: min over a struct whose
    // leading keys are non-null (NULL status/location sort LAST), the
    // true st/loc riding along — total order, engine-deterministic
    val dedupBase = base.groupBy(col("uri"))
      .agg(min(struct(
        coalesce(col("st"), lit(Int.MaxValue)).as("sk"),
        coalesce(col("loc"), lit("￿")).as("lk"),
        col("st"), col("loc"))).as("m"))
      .select(col("uri"), col("m.st").as("st"), col("m.loc").as("loc"))
    val step = dedupBase
      .filter(isRedir(col("st"), col("loc")))
      .select(col("uri").as("from_uri"), col("loc").as("to_uri"))
      .join(dedupBase.select(col("uri").as("to_uri"), col("st").as("to_st"),
        col("loc").as("to_loc")), Seq("to_uri"), "left")
      .select(col("from_uri"), col("to_uri"), col("to_st"), col("to_loc"))
    // Every capture starts the walk from its URI's COLLAPSED choice —
    // not its own st/loc. Otherwise a redirect capture of a URI that
    // also has a 2xx capture is unreachable in the step table (the
    // dedup picked the 2xx) and would sit forever "unresolved" even
    // though the collapsed chain terminates right there.
    var cur = base.select(col("uri"))
      .join(dedupBase, Seq("uri"))
      .select(col("uri"), col("uri").as("cur_uri"),
        col("st").as("cur_st"), col("loc").as("cur_loc"),
        lit(0).as("hops"))
    (1 to maxHops).foreach { _ =>
      val joined = col("from_uri").isNotNull
      cur = cur.join(step,
          cur("cur_uri") === step("from_uri") &&
            isRedir(cur("cur_st"), cur("cur_loc")), "left")
        .select(col("uri"),
          when(joined, col("to_uri")).otherwise(col("cur_uri")).as("cur_uri"),
          when(joined, col("to_st")).otherwise(col("cur_st")).as("cur_st"),
          when(joined, col("to_loc")).otherwise(col("cur_loc")).as("cur_loc"),
          (col("hops") + when(joined, 1).otherwise(0)).as("hops"))
    }
    cur.select(col("uri"), col("cur_uri").as("final_uri"),
      col("cur_st").as("final_status"), col("hops"),
      (!coalesce(isRedir(col("cur_st"), col("cur_loc")), lit(false)))
        .as("resolved"))
  }

  /** Decode entity bodies to text by their DECLARED charset (the
    * [[httpResponses]] `charset` column) — real crawls are not all
    * UTF-8: ISO-8859-1 and windows-1252 remain common, and a UTF-8
    * decode of them silently mangles every non-ASCII byte. Unknown or
    * NULL charset falls back to UTF-8; malformed/unmappable input is
    * REPLACED (U+FFFD), never thrown — a corrupt page must not kill a
    * 100 TB job. Appends `outCol`; one mapPartitions pass with a
    * per-partition Charset cache, body bytes never shuffle. */
  def decodeBody(df: DataFrame, bodyCol: String = "body",
                 charsetCol: String = "charset",
                 outCol: String = "text"): DataFrame = {
    val outSchema = df.schema.add(outCol, StringType)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val bIdx = df.schema.fieldIndex(bodyCol)
    val cIdx = df.schema.fieldIndex(charsetCol)
    df.mapPartitions { rows =>
      val cache = scala.collection.mutable.HashMap[String, java.nio.charset.Charset]()
      def charsetFor(name: String): java.nio.charset.Charset =
        cache.getOrElseUpdate(name.toLowerCase,
          try java.nio.charset.Charset.forName(name)
          catch { case _: Exception => java.nio.charset.StandardCharsets.UTF_8 })
      rows.map { r =>
        val body = r.getAs[Array[Byte]](bIdx)
        val name = if (r.isNullAt(cIdx)) "utf-8" else r.getString(cIdx)
        val text =
          if (body == null) null
          else charsetFor(name).newDecoder()
            .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
            .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
            .decode(java.nio.ByteBuffer.wrap(body)).toString
        Row.fromSeq(r.toSeq :+ text)
      }
    }(enc)
  }

  /** WARC record rows → parsed HTTP responses: (record_id, target_uri,
    * status, mime, charset, location, body). `mime` is the Content-Type
    * value with parameters stripped, lowercased; `charset` its charset
    * parameter when present (lowercased); `location` the Location
    * header verbatim (the [[resolveRedirects]] input). Non-HTTP
    * payloads (a
    * text/plain corpus record, a truncated capture) keep their row
    * with status/mime/charset NULL and the payload passed through as
    * `body` — the gate-don't-drop contract, so callers decide.
    * Imperative per-record parse in one mapPartitions pass: payload
    * bytes never ride a shuffle, cost tracks archive bytes. */
  def httpResponses(records: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(httpSchema)
    records.select(col("record_id"), col("target_uri"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](2)
          parseHttp(payload) match {
            case Some((status, headers, body)) =>
              val ct = headers.find(_._1 == "content-type").map(_._2)
              val mime = ct.map(_.split(";")(0).trim.toLowerCase).orNull
              val charset = ct.flatMap { v =>
                val m = java.util.regex.Pattern
                  .compile("(?i)charset=\"?([^\";\\s]+)").matcher(v)
                if (m.find()) Some(m.group(1).toLowerCase) else None
              }.orNull
              val location = headers.find(_._1 == "location").map(_._2).orNull
              Row(r.getString(0), r.getString(1),
                Int.box(status), mime, charset, location, body)
            case None =>
              Row(r.getString(0), r.getString(1), null, null, null, null,
                payload)
          }
        }
      }(enc)
  }

  // ---- Spark surface ------------------------------------------------

  /** Archive-file rows → record rows. `files` must carry the
    * binaryFile source's `content` column; works identically on batch
    * and streaming frames (the parse is a deterministic map stage). */
  def records(files: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(schema)
    files.select(col("content").as("file_bytes")).mapPartitions { rows =>
      rows.flatMap { row =>
        val raw = row.getAs[Array[Byte]]("file_bytes")
        // decompress INSIDE the record iterator (GZIPInputStream walks
        // consecutive members natively): beyond binaryFile's compressed
        // buffer, memory is one in-flight record, never the inflated
        // archive — the property that keeps ~1 GB crawl archives from
        // costing 3-5 GB per task
        val in: java.io.InputStream =
          if (isGzip(raw))
            new GZIPInputStream(new ByteArrayInputStream(raw), 64 * 1024)
          else new ByteArrayInputStream(raw)
        parseStream(in).map(r =>
          Row(r.recordId, r.warcType, r.targetUri, r.contentType, r.content))
      }
    }(enc)
  }

  /** Read every `*.warc` / `*.warc.gz` under `dir` into
    * (record_id, warc_type, target_uri, content_type, content). */
  def read(spark: SparkSession, dir: String): DataFrame =
    records(spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*").load(dir))

  /** The streaming twin: `dir` as a landing directory — new archives
    * are discovered per micro-batch (the crawl-upload flow). The
    * binaryFile STREAMING source does not self-describe its schema the
    * way the batch reader does, so it is declared here (the format's
    * fixed four columns). */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    records(spark.readStream.format("binaryFile")
      .schema(StructType(Seq(
        StructField("path", StringType),
        StructField("modificationTime", TimestampType),
        StructField("length", LongType),
        StructField("content", BinaryType))))
      .option("pathGlobFilter", "*.warc*").load(dir))

  /** Write one partition's rows as a single archive file; returns the
    * CDX-style index entries (uri, id, byte offset, byte length of the
    * record's gzip member — each member is independently
    * decompressible, so (offset, length) IS a random-access handle). */
  private def writeArchive(rows: Iterator[Row],
                           path: java.nio.file.Path, gzip: Boolean)
      : List[(String, String, Long, Int)] = {
    val out = new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(path), 1 << 20)
    var offset = 0L
    val entries = List.newBuilder[(String, String, Long, Int)]
    try rows.foreach { row =>
      val rec = WarcRecord(
        s"<urn:graft:${row.getString(0)}>", "response",
        row.getString(1), "text/plain; charset=utf-8",
        Option(row.getString(2)).getOrElse("").getBytes(UTF_8))
      val bytes = {
        val plain = encodeRecord(rec)
        if (gzip) gzipMember(plain) else plain
      }
      out.write(bytes)
      entries += ((row.getString(1), row.getString(0), offset, bytes.length))
      offset += bytes.length
    } finally out.close()
    entries.result()
  }

  /** Write (id, uri, content) rows as `part-NNNNN.warc[.gz]` archives,
    * one per partition, executor-side. `content` is UTF-8 text here
    * (the corpus case); binary payloads go through the Row form. */
  def writeCorpus(df: DataFrame, idCol: String, uriCol: String,
                  textCol: String, dir: String,
                  gzip: Boolean = true): Unit =
    archiveEntries(df, idCol, uriCol, textCol, dir, gzip)
      .foreach((_: Row) => ())

  /** [[writeCorpus]] plus a CDX-style offset index at `dir/_index`
    * (parquet: uri, id, path, offset, length) — the sidecar Common
    * Crawl publishes as CDX: [[fetchByUri]] then reads a requested
    * page with ONE seek + one member gunzip, never scanning the
    * archive. */
  def writeCorpusIndexed(df: DataFrame, idCol: String, uriCol: String,
                         textCol: String, dir: String,
                         gzip: Boolean = true): Unit =
    archiveEntries(df, idCol, uriCol, textCol, dir, gzip)
      .write.mode("overwrite").parquet(s"$dir/_index")

  /** The lazy shared core: an index-entry frame whose materialization
    * writes the archives as a side effect. Exactly ONE action may run
    * on it (re-materializing would rewrite the archives), which is why
    * it stays private behind the two writers above. */
  private def archiveEntries(df: DataFrame, idCol: String, uriCol: String,
                             textCol: String, dir: String,
                             gzip: Boolean): DataFrame = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val suffix = if (gzip) ".warc.gz" else ".warc"
    // per-call token: successive writes into one landing dir (the
    // crawl-upload flow) must not collide on partition ids
    val runId = java.util.UUID.randomUUID().toString.take(8)
    val idxSchema = StructType(Seq(
      StructField("uri", StringType), StructField("id", StringType),
      StructField("path", StringType), StructField("offset", LongType),
      StructField("length", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(idxSchema)
    df.select(col(idCol).cast("string").as("id"), col(uriCol).as("uri"),
        col(textCol).as("text"))
      .mapPartitions { rows =>
        if (!rows.hasNext) Iterator.empty
        else {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val path = java.nio.file.Paths.get(dir, f"part-$runId-$pid%05d$suffix")
          writeArchive(rows, path, gzip).iterator.map { case (uri, id, off, len) =>
            Row(uri, id, path.toString, off, len)
          }
        }
      }(enc)
  }

  /** Random-access read: one record from `(offset, length)` of an
    * archive — a seek + (for `.gz`) one member inflate. */
  def readRecordAt(path: String, offset: Long, length: Int): WarcRecord = {
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(path), java.nio.file.StandardOpenOption.READ)
    val buf = java.nio.ByteBuffer.allocate(length)
    try {
      ch.position(offset)
      while (buf.hasRemaining && ch.read(buf) >= 0) {}
      require(!buf.hasRemaining, s"short read at $path:$offset+$length")
    } finally ch.close()
    val raw = buf.array()
    val in: java.io.InputStream =
      if (isGzip(raw)) new GZIPInputStream(new ByteArrayInputStream(raw))
      else new ByteArrayInputStream(raw)
    val it = parseStream(in)
    require(it.hasNext, s"no record at $path:$offset")
    it.next()
  }

  /** Fetch specific pages through the index: cost is proportional to
    * the REQUESTED pages (index partition-pruned scan + one seek and
    * member inflate each), never to archive bytes — the build/probe
    * split of the crawl store, same trade as the IVF / inverted-text
    * indexes. For hand-sized request lists; a table-sized request set
    * goes through [[fetchByUriTable]] (a join, not an IN literal). */
  def fetchByUri(spark: SparkSession, dir: String,
                 uris: Seq[String]): DataFrame =
    fetchHandles(spark.read.parquet(s"$dir/_index")
      .filter(col("uri").isInCollection(uris)))

  /** The table-driven twin: `uris` is a DataFrame with a `uri` column
    * (e.g. the output of a dedup or sampling stage choosing which
    * pages to re-fetch); the index joins it instead of inlining an IN
    * literal, so the request set can be corpus-sized. */
  def fetchByUriTable(spark: SparkSession, dir: String,
                      uris: DataFrame): DataFrame =
    fetchHandles(spark.read.parquet(s"$dir/_index")
      .join(uris.select(col("uri")), Seq("uri"), "left_semi"))

  private def fetchHandles(handles: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(schema)
    handles.select(col("path"), col("offset"), col("length"))
      .mapPartitions { rows =>
        rows.map { r =>
          val rec = readRecordAt(r.getString(0), r.getLong(1), r.getInt(2))
          Row(rec.recordId, rec.warcType, rec.targetUri, rec.contentType,
            rec.content)
        }
      }(enc)
  }
}
