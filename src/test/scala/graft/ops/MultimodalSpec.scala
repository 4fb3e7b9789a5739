package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Seq(
    (0L, "abcdefgh " * 20, "en", "src0", 180L),
    (1L, "media payload " * 10, "en", "src1", 140L),
    (2L, "video bytes " * 30, "en", "src2", 360L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("synthetic media table has the production schema") {
    val m = Multimodal.syntheticMedia(docs)
    assert(m.schema("media").dataType.typeName == "binary")
    assert(m.count() == 3)
    val kinds = m.select("kind").as[String].collect().toSet
    assert(kinds.subsetOf(Set("image", "audio", "video")))
  }

  test("feature extraction: deterministic, normalized histogram") {
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.syntheticMedia(docs)).collect()
    assert(feats.length == 3)
    feats.foreach { f =>
      assert(f.features.length == 8)
      assert(math.abs(f.features.sum - 1.0f) < 1e-4)
      assert(f.n_bytes > 0)
    }
    // deterministic re-run
    val again = Multimodal.extractFeatures(spark,
      Multimodal.syntheticMedia(docs)).collect()
    assert(feats.map(_.features.toSeq).toSeq ==
      again.map(_.features.toSeq).toSeq)
  }

  // ---- real JDK codecs (MediaCodec) ---------------------------------

  /** Deterministic 16x12 RGB fixture: pixel (x, y) has r=16x, g=20y,
    * b=(x*y)%256 — written as PNG (lossless) in-spec. */
  private def pngFixture(): (Array[Byte], Array[Float]) = {
    val (w, h) = (16, 12)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bins = new Array[Float](8)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = (16 * x, 20 * y, (x * y) % 256)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
      bins((299 * r + 587 * g + 114 * b) / 1000 >> 5) += 1.0f / (w * h)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    (out.toByteArray, bins)
  }

  /** 16 kHz mono 16-bit WAV fixture: 800-sample square wave at half
    * amplitude (+/-16384), alternating every sample. */
  private def wavFixture(): Array[Byte] = {
    val n = 800
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v: Short = if (i % 2 == 0) 16384 else -16384
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("PNG decode is byte-for-byte deterministic against the fixture") {
    val (bytes, expected) = pngFixture()
    assert(MediaCodec.sniff(bytes) == "png")
    val Some((w, h, feats)) = MediaCodec.decodeImage(bytes)
    assert(w == 16 && h == 12)
    assert(feats.length == 8)
    feats.zip(expected).zipWithIndex.foreach { case ((f, e), i) =>
      assert(math.abs(f - e) < 1e-6f, s"bin $i: $f vs $e")
    }
    // decode twice -> identical bits (determinism pin)
    assert(MediaCodec.decodeImage(bytes).get._3.toSeq == feats.toSeq)
  }

  test("resize: exact box-average pixels, lossless PNG, stub quarantine") {
    import spark.implicits._
    val (png, _) = pngFixture()
    // 16x12 -> 8x6: every target pixel averages an exact 2x2 box;
    // integer truncating division replayed here as the reference
    val Some(out) = MediaCodec.resizeImage(png, 8, 6)
    val outImg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out))
    assert(outImg.getWidth == 8 && outImg.getHeight == 6)
    for (ty <- 0 until 6; tx <- 0 until 8) {
      def ch(f: (Int, Int) => Int): Int =
        (for (dy <- 0 to 1; dx <- 0 to 1)
          yield f(2 * tx + dx, 2 * ty + dy)).sum / 4
      val r = ch((x, _) => 16 * x)
      val g = ch((_, y) => 20 * y)
      val b = ch((x, y) => (x * y) % 256)
      val got = outImg.getRGB(tx, ty)
      assert(((got >> 16) & 0xff) == r && ((got >> 8) & 0xff) == g &&
        (got & 0xff) == b, s"($tx,$ty)")
    }
    // deterministic bytes (PNG re-encode of identical pixels)
    assert(MediaCodec.resizeImage(png, 8, 6).get.toSeq == out.toSeq)

    // dataset pass: the image row resizes, the text blob quarantines
    val media = Seq(
      (1L, "image", png, 16, 12, 0),
      (2L, "image", "not an image".getBytes("UTF-8"), 9, 9, 0)
    ).toDF("media_id", "kind", "media", "width", "height", "sample_rate")
    val rows = Multimodal.resizeImages(spark, media, 8, 6)
      .collect().map(r => r.media_id -> r).toMap
    assert(rows(1L).resized && rows(1L).width == 8 && rows(1L).height == 6)
    assert(rows(1L).media.toSeq == out.toSeq)
    assert(!rows(2L).resized && rows(2L).width == 9 &&
      rows(2L).media.toSeq == "not an image".getBytes("UTF-8").toSeq)
  }

  test("WAV decode recovers exact PCM statistics") {
    val bytes = wavFixture()
    assert(MediaCodec.sniff(bytes) == "wav")
    val Some((rate, n, feats)) = MediaCodec.decodeWav(bytes)
    assert(rate == 16000 && n == 800L)
    val Array(rms, peak, meanAbs, zcr) = feats
    assert(rms == 0.5f && peak == 0.5f && meanAbs == 0.5f)
    assert(math.abs(zcr - 799f / 800f) < 1e-6f)
  }

  test("extractFeatures routes real formats to real decoders, rest to stub") {
    val (png, expected) = pngFixture()
    val wav = wavFixture()
    val junk = "not a media file at all, just text".getBytes("UTF-8")
    val media = Seq(
      (10L, "image", png, 1, 1, 0),
      (11L, "audio", wav, 1, 1, 16000),
      (12L, "image", junk, 7, 9, 0)
    ).toDF("media_id", "kind", "media", "width", "height", "sample_rate")
    val out = Multimodal.extractFeatures(spark, media)
      .collect().sortBy(_.media_id)
    // PNG: decoded dims override metadata
    assert(out(0).width == 16 && out(0).height == 12)
    assert(out(0).features.zip(expected).forall {
      case (f, e) => math.abs(f - e) < 1e-6f })
    // WAV: width=sample rate, height=sample count
    assert(out(1).width == 16000 && out(1).height == 800)
    assert(out(1).features(0) == 0.5f)
    // junk: stub histogram, metadata dims pass through
    assert(out(2).width == 7 && out(2).height == 9)
    assert(out(2).features.toSeq == Multimodal.decodeStub(junk).toSeq)
  }

  private def grayPng(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = f(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("imageAHash: stable, edit-tolerant, scale-invariant, " +
    "content-sensitive") {
    val base = grayPng(32, 32, (x, _) => x * 8) // left-dark gradient
    val h1 = MediaCodec.imageAHash(base).get
    assert(MediaCodec.imageAHash(base).get == h1, "decode is deterministic")
    // one-pixel edit: Hamming-near (the whole point of a perceptual hash)
    val tweaked = grayPng(32, 32,
      (x, y) => if (x == 0 && y == 0) 255 else x * 8)
    val h2 = MediaCodec.imageAHash(tweaked).get
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 3, "small edit, near hash")
    // nearest-neighbor 2x upscale preserves every cell mean exactly
    val up = grayPng(64, 64, (x, y) => (x / 2) * 8)
    assert(MediaCodec.imageAHash(up).get == h1, "aHash is scale-invariant")
    // inverted content flips the vote of every decided cell
    val inv = grayPng(32, 32, (x, _) => 248 - x * 8)
    val h3 = MediaCodec.imageAHash(inv).get
    assert(java.lang.Long.bitCount(h1 ^ h3) > 10, "different content, far hash")
    // undecodable bytes: the byte-level fallback is deterministic and
    // single-byte-edit tolerant
    val blobA = ("alpha bravo " * 20).getBytes("UTF-8")
    val blobB = blobA.clone(); blobB(0) = 'z'.toByte
    assert(MediaCodec.imageAHash(blobA).isEmpty)
    val (ba, bb) = (MediaCodec.byteAHash(blobA), MediaCodec.byteAHash(blobB))
    assert(java.lang.Long.bitCount(ba ^ bb) <= 3)
  }

  test("nearDupMedia pairs the planted near-copies only, image and byte") {
    val base = grayPng(32, 32, (x, _) => x * 8)
    val tweaked = grayPng(32, 32,
      (x, y) => if (x == 0 && y == 0) 255 else x * 8)
    val inv = grayPng(32, 32, (x, _) => 248 - x * 8)
    val blobA = ("the quick brown fox jumps over the lazy dog " * 8)
      .getBytes("UTF-8")
    val blobB = blobA.clone(); blobB(0) = 'z'.toByte
    val blobC = ("zzzz 9999 ZZZZ @@@@ " * 16).getBytes("UTF-8")
    val media = Seq(
      (1L, "image", base, 32, 32, 0),
      (2L, "image", tweaked, 32, 32, 0),
      (3L, "image", inv, 32, 32, 0),
      (10L, "image", blobA, 1, 1, 0),
      (11L, "image", blobB, 1, 1, 0),
      (12L, "image", blobC, 1, 1, 0)
    ).toDF("media_id", "kind", "media", "width", "height", "sample_rate")
    val pairs = Multimodal.nearDupMedia(spark, media)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    CacheRegistry.releaseAll()
    assert(pairs == Set((1L, 2L), (10L, 11L)),
      s"expected exactly the planted pairs, got $pairs")
    // scope to THIS op's call sites — the context is shared across
    // concurrently-running suites (the DedupSpec convention)
    assert(spark.sparkContext.getPersistentRDDs.values
      .forall(!_.toString.contains("Multimodal.scala")))
  }

  /** 3-frame MJPEG AVI fixture: each frame a deterministic 16x12 JPEG
    * (solid gray level 32 + 64f, so JPEG encodes it losslessly enough
    * to sniff and decode). Returns (avi bytes, frame jpeg blobs). */
  private def mjpegFixture(): (Array[Byte], Seq[Array[Byte]]) = {
    val frames = (0 until 3).map { f =>
      val img = new java.awt.image.BufferedImage(16, 12,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val v = 32 + 64 * f
      for (y <- 0 until 12; x <- 0 until 16)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    (MediaCodec.writeMjpegAvi(frames, 16, 12), frames)
  }

  test("MJPEG AVI round-trips its 3 frames deterministically") {
    val (avi, frames) = mjpegFixture()
    assert(MediaCodec.sniff(avi) == "avi")
    val got = MediaCodec.decodeAviFrames(avi).get
    assert(got.length == 3)
    // container walk is byte-exact: each chunk equals the source JPEG
    got.zip(frames).foreach { case (g, f) => assert(g.sameElements(f)) }
    // and every frame decodes as a real image through the ImageIO path
    got.zipWithIndex.foreach { case (g, i) =>
      assert(MediaCodec.sniff(g) == "jpeg")
      val Some((w, h, feats)) = MediaCodec.decodeImage(g)
      assert(w == 16 && h == 12, s"frame $i")
      assert(math.abs(feats.sum - 1.0f) < 1e-4, s"frame $i")
    }
    // avi features = first-frame image features (keyframe proxy)
    val (fw, fh, ffeats) = MediaCodec.decodeAny(avi, 1, 1)
    assert(fw == 16 && fh == 12)
    assert(ffeats.toSeq == MediaCodec.decodeImage(frames.head).get._3.toSeq)
  }

  test("sampleFrames decodes real frames from AVI video rows") {
    val (avi, frames) = mjpegFixture()
    val media = Seq((42L, "video", avi, 16, 12, 0))
      .toDF("media_id", "kind", "media", "width", "height", "sample_rate")
    val got = Multimodal.sampleFrames(spark, media)
      .collect().sortBy(_.frame_idx)
    assert(got.length == 3)
    got.zip(frames).foreach { case (g, f) =>
      assert(g.media_id == 42L && g.frame_bytes.sameElements(f))
    }
  }

  test("frame sampling explodes video rows only") {
    val frames = Multimodal.sampleFrames(spark,
      Multimodal.syntheticMedia(docs)).collect()
    assert(frames.nonEmpty)
    val vids = Multimodal.syntheticMedia(docs)
      .filter(col("kind") === "video").count()
    assert(frames.map(_.media_id).distinct.length == vids)
    assert(frames.forall(_.frame_bytes.nonEmpty))
  }
}
