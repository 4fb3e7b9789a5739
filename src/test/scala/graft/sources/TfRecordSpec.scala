package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** TFRecord codec: golden bytes against the public specs (masked
  * crc32c constants, hand-assembled tf.Example wire bytes), framing
  * round-trip with corruption detection, protobuf encode/decode
  * property incl. edge values, and the Spark shard write/read path.
  */
class TfRecordSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("masked crc32c matches the spec constants") {
    // crc32c check value: crc32c("123456789") = 0xE3069283 (Castagnoli)
    val nine = "123456789".getBytes("ASCII")
    val c = new java.util.zip.CRC32C(); c.update(nine)
    assert((c.getValue & 0xffffffffL) == 0xe3069283L)
    assert(TfRecord.maskedCrc(nine, 0, 9) == 0xc78ab0e5L)
    assert(TfRecord.maskedCrc(Array.empty[Byte], 0, 0) == 0xa282ead8L)
  }

  test("tf.Example golden bytes: {'a': Int64List[1]}") {
    val got = TfRecord.encodeExample(Seq("a" -> Array(1L)))
    val expect = Array(0x0a, 0x0c, 0x0a, 0x0a, 0x0a, 0x01, 0x61, 0x12,
      0x05, 0x1a, 0x03, 0x0a, 0x01, 0x01).map(_.toByte)
    assert(got.toSeq == expect.toSeq)
  }

  test("encode/decode round-trip: negatives, empties, raw bytes, floats") {
    val i64 = Seq("ids" -> Array(0L, 1L, -1L, Long.MaxValue, Long.MinValue),
      "empty" -> Array.empty[Long])
    val bys = Seq("blob" -> Array[Byte](0, -1, 127, -128),
      "text" -> "héllo".getBytes("UTF-8"))
    val flt = Seq("w" -> Array(0.0f, -1.5f, Float.MinPositiveValue))
    val bytes = TfRecord.encodeExample(i64, bys, flt)
    val (di, db, df) = TfRecord.decodeExample(bytes)
    i64.foreach { case (k, v) => assert(di(k).toSeq == v.toSeq, k) }
    bys.foreach { case (k, v) => assert(db(k).toSeq == v.toSeq, k) }
    flt.foreach { case (k, v) => assert(df(k).toSeq == v.toSeq, k) }
  }

  test("truncated FloatList fails loudly, not with zero-padded floats") {
    // a valid float feature, then its bytes cut mid-float: the decoder
    // must throw (copyOfRange would otherwise zero-pad silently)
    val good = TfRecord.encodeExample(Seq.empty, Seq.empty,
      Seq("w" -> Array(1.5f, -2.25f)))
    // hand-build nested wire bytes whose packed float payload is a
    // SELF-CONSISTENT 3 bytes (every outer length matches, so the
    // generic lenDelim checks all pass) — only the 4-byte float read
    // itself can notice the truncation
    val bad = Array[Byte](
      0x0a, 0x0e,             // Example.features, len 14
      0x0a, 0x0c,             // map entry, len 12
      0x0a, 0x01, 'w'.toByte, // key "w"
      0x12, 0x07,             // Feature, len 7
      0x12, 0x05,             // FloatList, len 5
      0x0a, 0x03,             // packed floats: 3 bytes — not 4k
      0x00, 0x00, 0x00)
    assertThrows[IllegalArgumentException] { TfRecord.decodeExample(bad) }
    // and the well-formed sibling still round-trips
    assert(TfRecord.decodeExample(good)._3("w").toSeq == Seq(1.5f, -2.25f))
  }

  test("framing: stream round-trip; a flipped byte fails the crc") {
    val recs = Seq("one", "two", "three").map(
      s => TfRecord.encodeExample(Seq.empty, Seq("t" -> s.getBytes)))
    val buf = new java.io.ByteArrayOutputStream()
    recs.foreach(TfRecord.writeRecord(buf, _))
    val back = TfRecord.parseRecords(
      new java.io.ByteArrayInputStream(buf.toByteArray)).toSeq
    assert(back.map(_.toSeq) == recs.map(_.toSeq))
    // corrupt one payload byte -> payload crc must catch it
    val bad = buf.toByteArray.clone()
    bad(14) = (bad(14) ^ 0x01).toByte
    assertThrows[java.io.IOException] {
      TfRecord.parseRecords(new java.io.ByteArrayInputStream(bad)).toSeq
    }
    // corruption is catchable but skippable: verifyCrc=false still parses
    val lax = TfRecord.parseRecords(
      new java.io.ByteArrayInputStream(bad), verifyCrc = false).toSeq
    assert(lax.size == recs.size)
  }

  test("spark shards: write + read round-trip, scalar and array int64, " +
    "string bytes") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(10L, 11L), "alpha"),
      (2L, Seq.empty[Long], "béta"),
      (3L, Seq(-7L), "")).toDF("doc_id", "toks", "text")
    val dir = TestSpark.tmpDir("tfrec")
    TfRecord.writeExamples(df, dir, Seq("doc_id", "toks"), Seq("text"))
    val back = TfRecord.readExamples(spark, dir, Seq("doc_id", "toks"),
        Seq("text"))
      .select(element_at(col("doc_id"), 1).as("doc_id"), col("toks"),
        col("text").cast("string").as("text"))
      .as[(Long, Seq[Long], String)].collect().toSet
    assert(back == Set((1L, Seq(10L, 11L), "alpha"),
      (2L, Seq.empty[Long], "béta"), (3L, Seq(-7L), "")))
  }

  test("sharded write: a shard recurring non-contiguously within a " +
    "partition fails LOUDLY instead of truncating its earlier file") {
    import spark.implicits._
    // one partition, shard sequence 0,1,0 — the grouping precondition
    // violated; without the guard, re-rolling shard 0 would silently
    // discard its first record
    val bad = Seq((0L, 1L), (1L, 2L), (0L, 3L)).toDF("shard_id", "v")
      .coalesce(1)
    val dir = TestSpark.tmpDir("tfrec_badshard")
    val e = intercept[org.apache.spark.SparkException] {
      TfRecord.writeShardedExamples(bad, dir, "shard_id", Seq("v"),
        Seq.empty)
    }
    assert(e.getMessage.contains("recurs non-contiguously") ||
      Option(e.getCause).exists(_.getMessage
        .contains("recurs non-contiguously")))
    // grouped input with the SAME values writes fine
    val ok = Seq((0L, 1L), (0L, 3L), (1L, 2L)).toDF("shard_id", "v")
      .coalesce(1).sortWithinPartitions(col("shard_id"))
    val dir2 = TestSpark.tmpDir("tfrec_okshard")
    TfRecord.writeShardedExamples(ok, dir2, "shard_id", Seq("v"),
      Seq.empty)
    val got = TfRecord.readShardedExamples(spark, dir2, Seq("v"),
        Seq.empty)
      .select(col("shard"), element_at(col("v"), 1).as("v"))
      .as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L), (0L, 3L), (1L, 2L)))
  }
}
