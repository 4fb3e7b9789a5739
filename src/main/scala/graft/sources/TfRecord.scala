package graft.sources

import java.io.{ByteArrayOutputStream, EOFException, InputStream, OutputStream}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TFRecord source/sink — the training-shard format tf.data consumes,
  * written and parsed by hand from the public specs (the same
  * no-external-libs contract as the WARC/TIFF/HDF4 codecs):
  *
  *  - Record framing (TensorFlow `core/lib/io/record_writer.cc`):
  *    `uint64 length (LE) | uint32 masked_crc32c(length) | payload |
  *    uint32 masked_crc32c(payload)`, where
  *    `mask(crc) = ((crc >> 15) | (crc << 17)) + 0xa282ead8` over
  *    uint32 and crc32c is the Castagnoli polynomial
  *    (`java.util.zip.CRC32C`).
  *  - Payloads are `tf.train.Example` protobufs
  *    (`tensorflow/core/example/example.proto` / `feature.proto`),
  *    encoded with the protobuf wire format: Example{1: Features},
  *    Features{1: map<string, Feature>} (map entries = repeated
  *    embedded messages {1: key, 2: value}), Feature oneof
  *    {1: BytesList, 2: FloatList, 3: Int64List}, each list field 1
  *    repeated (numeric lists packed).
  *
  * This is the LAST stage of the curation pipeline: curate → tokenize →
  * pack → `writeExamples` shards that a training job reads directly.
  *
  * Scale shape: the writer is one mapPartitions pass emitting one shard
  * file per task (no shuffle — partition the frame upstream to set
  * shard count/order, e.g. [[graft.ops.Layout]] or a range partition);
  * the reader maps `binaryFile` rows and parses record-at-a-time off an
  * InputStream (memory = one record, not the shard). CRCs verify on
  * read; a corrupt frame fails loudly rather than yielding bad tensors.
  */
object TfRecord {

  // ---- masked CRC32C framing -----------------------------------------

  private val MaskDelta = 0xa282ead8L

  /** Masked crc32c over `b[off, off+len)` as uint32-in-Long. */
  def maskedCrc(b: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32C()
    c.update(b, off, len)
    val crc = c.getValue & 0xffffffffL
    val rot = ((crc >>> 15) | (crc << 17)) & 0xffffffffL
    (rot + MaskDelta) & 0xffffffffL
  }

  private def le64(v: Long): Array[Byte] =
    (0 until 8).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray

  private def le32(v: Long): Array[Byte] =
    (0 until 4).map(i => ((v >>> (8 * i)) & 0xff).toByte).toArray

  private def readLe(b: Array[Byte], n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) { v |= (b(i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  /** Append one framed record. */
  def writeRecord(out: OutputStream, payload: Array[Byte]): Unit = {
    val len = le64(payload.length.toLong)
    out.write(len)
    out.write(le32(maskedCrc(len, 0, 8)))
    out.write(payload)
    out.write(le32(maskedCrc(payload, 0, payload.length)))
  }

  private def readFully(in: InputStream, n: Int): Option[Array[Byte]] = {
    val b = new Array[Byte](n)
    var got = 0
    while (got < n) {
      val r = in.read(b, got, n - got)
      if (r < 0) {
        if (got == 0) return None
        throw new EOFException(s"truncated TFRecord frame: $got of $n")
      }
      got += r
    }
    Some(b)
  }

  /** Record-at-a-time parse off a stream — memory is one record.
    * `maxRecord` bounds a corrupt length field before allocation. */
  def parseRecords(in: InputStream, verifyCrc: Boolean = true,
                   maxRecord: Int = 1 << 30): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var nextRec: Option[Array[Byte]] = advance()
      private def advance(): Option[Array[Byte]] =
        readFully(in, 8).map { len =>
          val lenCrc = readFully(in, 4).getOrElse(
            throw new EOFException("truncated length crc"))
          if (verifyCrc &&
              readLe(lenCrc, 4) != maskedCrc(len, 0, 8))
            throw new java.io.IOException("TFRecord length crc mismatch")
          val n = readLe(len, 8)
          require(n >= 0 && n <= maxRecord, s"unreasonable record size $n")
          val payload = readFully(in, n.toInt).getOrElse(
            throw new EOFException("truncated payload"))
          val payCrc = readFully(in, 4).getOrElse(
            throw new EOFException("truncated payload crc"))
          if (verifyCrc &&
              readLe(payCrc, 4) != maskedCrc(payload, 0, payload.length))
            throw new java.io.IOException("TFRecord payload crc mismatch")
          payload
        }
      override def hasNext: Boolean = nextRec.isDefined
      override def next(): Array[Byte] = {
        val r = nextRec.get; nextRec = advance(); r
      }
    }

  // ---- protobuf wire helpers -----------------------------------------

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt); v = v >>> 7
    }
    out.write(v.toInt & 0x7f)
  }

  private def tag(field: Int, wire: Int): Int = (field << 3) | wire

  private def writeLenDelim(out: ByteArrayOutputStream, field: Int,
                            body: Array[Byte]): Unit = {
    writeVarint(out, tag(field, 2).toLong)
    writeVarint(out, body.length.toLong)
    out.write(body, 0, body.length)
  }

  /** Encode one tf.train.Example. Feature order is the caller's order
    * (deterministic bytes). */
  def encodeExample(int64s: Seq[(String, Array[Long])],
                    bytess: Seq[(String, Array[Byte])] = Nil,
                    floats: Seq[(String, Array[Float])] = Nil): Array[Byte] = {
    def feature(body: ByteArrayOutputStream => Unit): Array[Byte] = {
      val b = new ByteArrayOutputStream(); body(b); b.toByteArray
    }
    def entry(key: String, feat: Array[Byte]): Array[Byte] =
      feature { e =>
        writeLenDelim(e, 1, key.getBytes("UTF-8"))
        writeLenDelim(e, 2, feat)
      }
    val features = new ByteArrayOutputStream()
    int64s.foreach { case (k, vs) =>
      val packed = feature(p => vs.foreach(writeVarint(p, _)))
      val list = feature(writeLenDelim(_, 1, packed)) // Int64List.value
      val feat = feature(writeLenDelim(_, 3, list))   // Feature.int64_list
      writeLenDelim(features, 1, entry(k, feat))      // map entry
    }
    bytess.foreach { case (k, v) =>
      val list = feature(writeLenDelim(_, 1, v))      // BytesList.value
      val feat = feature(writeLenDelim(_, 1, list))   // Feature.bytes_list
      writeLenDelim(features, 1, entry(k, feat))
    }
    floats.foreach { case (k, vs) =>
      val packed = feature { p =>
        vs.foreach { f =>
          val bits = java.lang.Float.floatToIntBits(f) & 0xffffffffL
          p.write(le32(bits), 0, 4)
        }
      }
      val list = feature(writeLenDelim(_, 1, packed)) // FloatList.value
      val feat = feature(writeLenDelim(_, 2, list))   // Feature.float_list
      writeLenDelim(features, 1, entry(k, feat))
    }
    val example = new ByteArrayOutputStream()
    writeLenDelim(example, 1, features.toByteArray)   // Example.features
    example.toByteArray
  }

  private final class Cursor(val b: Array[Byte], var i: Int, val end: Int) {
    def varint(): Long = {
      var v = 0L; var shift = 0
      while (true) {
        require(i < end, "truncated varint")
        val x = b(i); i += 1
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
        require(shift < 64, "varint overflow")
      }
      v
    }
    def lenDelim(): Cursor = {
      val n = varint().toInt
      require(n >= 0 && i + n <= end, "truncated field")
      val c = new Cursor(b, i, i + n); i += n; c
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => i += 8
      case 2 => lenDelim()
      case 5 => i += 4
      case w => throw new IllegalArgumentException(s"wire type $w")
    }
    def hasMore: Boolean = i < end
  }

  /** Decode one tf.train.Example → (int64 features, bytes features,
    * float features). Accepts packed and unpacked numeric lists. */
  def decodeExample(bytes: Array[Byte])
      : (Map[String, Array[Long]], Map[String, Array[Byte]],
         Map[String, Array[Float]]) = {
    val i64 = Map.newBuilder[String, Array[Long]]
    val bys = Map.newBuilder[String, Array[Byte]]
    val flt = Map.newBuilder[String, Array[Float]]
    def parseFeature(key: String, c: Cursor): Unit = while (c.hasMore) {
      val t = c.varint().toInt
      (t >> 3, t & 7) match {
        case (1, 2) => // BytesList
          val l = c.lenDelim()
          while (l.hasMore) {
            val lt = l.varint().toInt
            if ((lt >> 3) == 1 && (lt & 7) == 2) {
              val v = l.lenDelim()
              bys += key -> java.util.Arrays.copyOfRange(v.b, v.i, v.end)
            } else l.skip(lt & 7)
          }
        case (2, 2) => // FloatList
          val l = c.lenDelim()
          val out = Array.newBuilder[Float]
          while (l.hasMore) {
            val lt = l.varint().toInt
            if ((lt >> 3) == 1 && (lt & 7) == 2) {
              val v = l.lenDelim()
              while (v.hasMore) {
                // copyOfRange would silently ZERO-PAD past v.end — a
                // truncated (but CRC-valid) FloatList must fail loudly
                require(v.i + 4 <= v.end, "truncated float")
                out += java.lang.Float.intBitsToFloat(
                  readLe(java.util.Arrays.copyOfRange(v.b, v.i, v.i + 4),
                    4).toInt)
                v.i += 4
              }
            } else if ((lt >> 3) == 1 && (lt & 7) == 5) {
              require(l.i + 4 <= l.end, "truncated float")
              out += java.lang.Float.intBitsToFloat(
                readLe(java.util.Arrays.copyOfRange(l.b, l.i, l.i + 4),
                  4).toInt)
              l.i += 4
            } else l.skip(lt & 7)
          }
          flt += key -> out.result()
        case (3, 2) => // Int64List
          val l = c.lenDelim()
          val out = Array.newBuilder[Long]
          while (l.hasMore) {
            val lt = l.varint().toInt
            if ((lt >> 3) == 1 && (lt & 7) == 2) {
              val v = l.lenDelim()
              while (v.hasMore) out += v.varint()
            } else if ((lt >> 3) == 1 && (lt & 7) == 0) {
              out += l.varint()
            } else l.skip(lt & 7)
          }
          i64 += key -> out.result()
        case (_, w) => c.skip(w)
      }
    }
    val top = new Cursor(bytes, 0, bytes.length)
    while (top.hasMore) {
      val t = top.varint().toInt
      if ((t >> 3) == 1 && (t & 7) == 2) { // Example.features
        val fs = top.lenDelim()
        while (fs.hasMore) {
          val ft = fs.varint().toInt
          if ((ft >> 3) == 1 && (ft & 7) == 2) { // map entry
            val e = fs.lenDelim()
            var key = ""
            while (e.hasMore) {
              val et = e.varint().toInt
              (et >> 3, et & 7) match {
                case (1, 2) =>
                  val k = e.lenDelim()
                  key = new String(k.b, k.i, k.end - k.i, "UTF-8")
                case (2, 2) => parseFeature(key, e.lenDelim())
                case (_, w) => e.skip(w)
              }
            }
          } else fs.skip(ft & 7)
        }
      } else top.skip(t & 7)
    }
    (i64.result(), bys.result(), flt.result())
  }

  // ---- Spark surface ---------------------------------------------------

  /** Write `df` as TFRecord shards under `dir` — one `.tfrecord` file
    * per partition, one tf.Example per row. `int64Cols` may be LONG or
    * ARRAY<LONG> columns; `bytesCols` STRING or BINARY. Feature order =
    * the given column order (deterministic shards given a deterministic
    * partitioning — range-partition/sort upstream for stable output). */
  def writeExamples(df: DataFrame, dir: String, int64Cols: Seq[String],
                    bytesCols: Seq[String]): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val runId = java.util.UUID.randomUUID().toString.take(8)
    val cols = (int64Cols ++ bytesCols).map(col)
    val proj = df.select(cols: _*)
    val n64 = int64Cols.size
    proj.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val path = java.nio.file.Paths.get(dir,
          f"part-$runId-$pid%05d.tfrecord")
        val out = new java.io.BufferedOutputStream(
          java.nio.file.Files.newOutputStream(path))
        try {
          rows.foreach { r =>
            val i64s = (0 until n64).map { i =>
              val name = int64Cols(i)
              val v: Array[Long] = r.get(i) match {
                case l: Long => Array(l)
                case i2: Int => Array(i2.toLong)
                case s: scala.collection.Seq[_] =>
                  s.map(x => x.asInstanceOf[Number].longValue).toArray
                case null => Array.empty[Long]
                case other => throw new IllegalArgumentException(
                  s"$name: unsupported int64 value $other")
              }
              name -> v
            }
            val bss = bytesCols.zipWithIndex.map { case (name, j) =>
              val v: Array[Byte] = r.get(n64 + j) match {
                case s: String => s.getBytes("UTF-8")
                case b: Array[Byte] => b
                case null => Array.empty[Byte]
                case other => throw new IllegalArgumentException(
                  s"$name: unsupported bytes value $other")
              }
              name -> v
            }
            writeRecord(out, encodeExample(i64s, bss))
          }
        } finally out.close()
        Iterator.single(1)
      }
    }(org.apache.spark.sql.Encoders.scalaInt).foreach((_: Int) => ())
  }

  /** Write `df` as SHARD-ADDRESSED TFRecord files: rows must arrive
    * grouped by `shardCol` (long) within each partition — range-
    * partition + sort on the shard-defining order upstream — and each
    * task cuts its sorted run at shard boundaries, one file per
    * contiguous (shard, task) group, named
    * `shard-<shard>-<runId>-<pid>.tfrecord`. A shard spanning a range-
    * partition boundary lands in two files whose pid order IS the row
    * order, so (shard asc, pid asc, record order) always replays the
    * intended sequence — [[readShardedExamples]] exposes exactly those
    * keys. Shard count never materializes driver-side (no per-shard
    * loop, no collect): the 100 TB shape is one range exchange and a
    * linear write. Feature columns follow [[writeExamples]]' contract. */
  def writeShardedExamples(df: DataFrame, dir: String, shardCol: String,
                           int64Cols: Seq[String],
                           bytesCols: Seq[String]): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val runId = java.util.UUID.randomUUID().toString.take(8)
    val cols = col(shardCol).cast("long") +: (int64Cols ++ bytesCols).map(col)
    val proj = df.select(cols: _*)
    val n64 = int64Cols.size
    proj.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var cur = Long.MinValue
      var out: java.io.BufferedOutputStream = null
      // the grouped-by-shard precondition is enforced EXPLICITLY: a
      // shard value recurring non-contiguously within a partition
      // would re-roll its (shard, pid) file and silently truncate the
      // earlier records — fail loudly instead. (Tracking rolled ids
      // beats opening CREATE_NEW: a legitimate TASK RETRY reuses the
      // same pid and must be able to overwrite its own partial file.)
      val rolled = scala.collection.mutable.Set[Long]()
      def roll(shard: Long): Unit = {
        if (!rolled.add(shard))
          throw new IllegalStateException(
            s"shard $shard recurs non-contiguously in partition $pid — " +
              "rows must arrive grouped by the shard column " +
              "(range-partition + sort upstream)")
        if (out != null) out.close()
        val path = java.nio.file.Paths.get(dir,
          f"shard-$shard%06d-$runId-$pid%05d.tfrecord")
        out = new java.io.BufferedOutputStream(
          java.nio.file.Files.newOutputStream(path))
        cur = shard
      }
      try {
        rows.foreach { r =>
          val shard = r.getLong(0)
          if (out == null || shard != cur) roll(shard)
          val i64s = (0 until n64).map { i =>
            val name = int64Cols(i)
            val v: Array[Long] = r.get(1 + i) match {
              case l: Long => Array(l)
              case i2: Int => Array(i2.toLong)
              case s: scala.collection.Seq[_] =>
                s.map(x => x.asInstanceOf[Number].longValue).toArray
              case null => Array.empty[Long]
              case other => throw new IllegalArgumentException(
                s"$name: unsupported int64 value $other")
            }
            name -> v
          }
          val bss = bytesCols.zipWithIndex.map { case (name, j) =>
            val v: Array[Byte] = r.get(1 + n64 + j) match {
              case s: String => s.getBytes("UTF-8")
              case b: Array[Byte] => b
              case null => Array.empty[Byte]
              case other => throw new IllegalArgumentException(
                s"$name: unsupported bytes value $other")
            }
            name -> v
          }
          writeRecord(out, encodeExample(i64s, bss))
        }
      } finally if (out != null) out.close()
      Iterator.single(1)
    }(org.apache.spark.sql.Encoders.scalaInt).foreach((_: Int) => ())
  }

  /** Read shard-addressed TFRecords ([[writeShardedExamples]]) with the
    * layout keys alongside the features: `shard` (from the file name),
    * `shard_part` (the writing task's pid — orders a shard's files),
    * `rec_seq` (record index within the file). Ordering rows by
    * (shard, shard_part, rec_seq) replays the written sequence. */
  def readShardedExamples(spark: SparkSession, dir: String,
                          int64Cols: Seq[String],
                          bytesCols: Seq[String]): DataFrame = {
    val schema = StructType(
      Seq(StructField("shard", LongType),
        StructField("shard_part", LongType),
        StructField("rec_seq", LongType)) ++
        int64Cols.map(StructField(_, ArrayType(LongType))) ++
        bytesCols.map(StructField(_, BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val namePat = "shard-(\\d+)-[0-9a-f]+-(\\d+)\\.tfrecord$".r
    spark.read.format("binaryFile").load(s"$dir/shard-*.tfrecord")
      .select(col("path"), col("content"))
      .flatMap { (r: Row) =>
        val m = namePat.findFirstMatchIn(r.getString(0)).getOrElse(
          throw new IllegalArgumentException(
            s"not a sharded tfrecord name: ${r.getString(0)}"))
        val shard = m.group(1).toLong
        val part = m.group(2).toLong
        val in = new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1))
        parseRecords(in).zipWithIndex.map { case (payload, i) =>
          val (i64, bys, _) = decodeExample(payload)
          Row.fromSeq(Seq(shard, part, i.toLong) ++
            int64Cols.map(i64.get(_).orNull) ++
            bytesCols.map(bys.get(_).orNull))
        }
      }(enc)
  }

  /** Read TFRecord shards back: one row per example with ARRAY<LONG>
    * columns for `int64Cols` and BINARY for `bytesCols` (missing
    * features read as NULL). Record-at-a-time parse, CRC-verified. */
  def readExamples(spark: SparkSession, dir: String, int64Cols: Seq[String],
                   bytesCols: Seq[String]): DataFrame = {
    val schema = StructType(
      int64Cols.map(StructField(_, ArrayType(LongType))) ++
        bytesCols.map(StructField(_, BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    spark.read.format("binaryFile").load(s"$dir/*.tfrecord")
      .select(col("content"))
      .flatMap { (r: Row) =>
        val in = new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](0))
        parseRecords(in).map { payload =>
          val (i64, bys, _) = decodeExample(payload)
          Row.fromSeq(int64Cols.map(i64.get(_).orNull) ++
            bytesCols.map(bys.get(_).orNull))
        }
      }(enc)
  }
}
