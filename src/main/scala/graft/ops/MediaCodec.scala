package graft.ops

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

/** Real media decode kernels from the JDK — no external libraries:
  * `javax.imageio` reads PNG/JPEG/BMP/GIF, `javax.sound.sampled` reads
  * WAV PCM. Formats are sniffed from magic bytes; anything unrecognized
  * (or corrupt) falls back to [[Multimodal.decodeStub]] so the pipeline
  * never throws on a bad blob — exactly how a production media pipeline
  * quarantines undecodable rows rather than failing the job.
  *
  * Decoding is deterministic: PNG/BMP/GIF/WAV are lossless formats and
  * the JDK decoders are pure Java (MultimodalSpec pins byte-exact
  * features on in-spec generated fixtures).
  */
object MediaCodec {

  /** Magic-byte format sniff: "png" | "jpeg" | "bmp" | "gif" | "wav" |
    * "avi" | "unknown". Cheap (no decode) and safe on arbitrary bytes. */
  def sniff(bytes: Array[Byte]): String = {
    def b(i: Int) = bytes(i) & 0xff
    if (bytes.length < 12) "unknown"
    else if (b(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
    else if (b(0) == 0xff && b(1) == 0xd8 && b(2) == 0xff) "jpeg"
    else if (b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') "gif"
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') "wav"
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ') "avi"
    else "unknown"
  }

  /** Decode an image blob: (width, height, 8-bin luminance histogram
    * normalized to [0,1]). Luma = (299 r + 587 g + 114 b) / 1000, the
    * integer BT.601 weights, so the histogram is integer-deterministic.
    * None if the blob does not decode. */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val bins = new Array[Float](8)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val luma = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
              + 114 * (rgb & 0xff)) / 1000
            bins(luma >> 5) += 1.0f
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toFloat
        var i = 0
        while (i < 8) { bins(i) /= n; i += 1 }
        Some((w, h, bins))
      }
    } catch { case _: Exception => None }
  }

  /** Box-average (area) resize of a decodable image blob to
    * (tw, th), re-encoded losslessly as PNG via the JDK writer. Each
    * target pixel averages its source box per channel with integer
    * sums and truncating division — bit-deterministic across runs and
    * hosts, unlike Graphics2D's interpolation hints. Upsampling
    * degenerates the boxes to single pixels (nearest). None when the
    * blob does not decode as an image. */
  def resizeImage(bytes: Array[Byte], tw: Int, th: Int): Option[Array[Byte]] = {
    require(tw >= 1 && th >= 1, s"target $tw x $th")
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val out = new java.awt.image.BufferedImage(tw, th,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var ty = 0
        while (ty < th) {
          val y0 = (ty.toLong * h / th).toInt
          val y1 = math.max(y0 + 1, ((ty + 1).toLong * h / th).toInt)
          var tx = 0
          while (tx < tw) {
            val x0 = (tx.toLong * w / tw).toInt
            val x1 = math.max(x0 + 1, ((tx + 1).toLong * w / tw).toInt)
            var r = 0L; var g = 0L; var b = 0L; var n = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                r += (rgb >> 16) & 0xff
                g += (rgb >> 8) & 0xff
                b += rgb & 0xff
                n += 1
                x += 1
              }
              y += 1
            }
            out.setRGB(tx, ty,
              ((r / n).toInt << 16) | ((g / n).toInt << 8) | (b / n).toInt)
            tx += 1
          }
          ty += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case _: Exception => None }
  }

  /** 64-bit perceptual average-hash (aHash) of an image blob: luminance
    * box-sampled to an 8x8 grid (integer sums / pixel counts), each
    * cell votes 1 if it exceeds the 64-cell mean. Robust to
    * re-encoding, resizing, and small edits — Hamming-near hashes are
    * near-identical images. Same integer BT.601 luma as [[decodeImage]],
    * so the hash is deterministic. None if the blob does not decode. */
  def imageAHash(bytes: Array[Byte]): Option[Long] = {
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val sums = new Array[Long](64)
        val counts = new Array[Long](64)
        var y = 0
        while (y < h) {
          val cy = math.min(7, y * 8 / h)
          var x = 0
          while (x < w) {
            val cx = math.min(7, x * 8 / w)
            val rgb = img.getRGB(x, y)
            val luma = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
              + 114 * (rgb & 0xff)) / 1000
            sums(cy * 8 + cx) += luma
            counts(cy * 8 + cx) += 1
            x += 1
          }
          y += 1
        }
        Some(thresholdHash(sums, counts))
      }
    } catch { case _: Exception => None }
  }

  /** The aHash construction over raw BYTES (64 equal chunks, chunk mean
    * vs global mean) — the quarantine fallback for undecodable blobs,
    * mirroring [[Multimodal.decodeStub]]: identical blobs hash equal,
    * byte-near blobs hash Hamming-near, and the dedup op stays total
    * over mixed/corrupt media columns. */
  def byteAHash(bytes: Array[Byte]): Long = {
    if (bytes.isEmpty) return 0L
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var i = 0
    while (i < bytes.length) {
      val c = math.min(63, i * 64 / bytes.length)
      sums(c) += (bytes(i) & 0xff)
      counts(c) += 1
      i += 1
    }
    thresholdHash(sums, counts)
  }

  private def thresholdHash(sums: Array[Long], counts: Array[Long]): Long = {
    val cells = new Array[Long](64)
    var i = 0
    var total = 0L
    while (i < 64) {
      cells(i) = if (counts(i) > 0) sums(i) / counts(i) else 0L
      total += cells(i)
      i += 1
    }
    val mean = total / 64
    var hash = 0L
    i = 0
    while (i < 64) {
      if (cells(i) > mean) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /** Decode a WAV PCM blob: (sample_rate, n_samples, features) where
    * features = [rms, peak, mean_abs, zero_crossing_rate] over channel-0
    * samples normalized to [-1, 1]. Supports 8/16-bit PCM (the
    * javax.sound baseline). None if the blob does not decode. */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Long, Array[Float])] = {
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      val bits = fmt.getSampleSizeInBits
      if (bits != 8 && bits != 16) return None
      val frameSize = fmt.getFrameSize
      val data = in.readAllBytes()
      in.close()
      val nFrames = data.length / frameSize
      var sumSq = 0.0; var sumAbs = 0.0; var peak = 0.0
      var crossings = 0L; var prevNeg = false
      var i = 0
      while (i < nFrames) {
        val off = i * frameSize
        val s: Double =
          if (bits == 16) {
            val lo = data(off) & 0xff
            val hi = data(off + 1)
            val v = if (fmt.isBigEndian) ((data(off) << 8) | (data(off + 1) & 0xff)).toShort
                    else ((hi << 8) | lo).toShort
            v / 32768.0
          } else {
            // 8-bit WAV PCM is unsigned per the RIFF spec
            ((data(off) & 0xff) - 128) / 128.0
          }
        sumSq += s * s
        sumAbs += math.abs(s)
        if (math.abs(s) > peak) peak = math.abs(s)
        val neg = s < 0
        if (i > 0 && neg != prevNeg) crossings += 1
        prevNeg = neg
        i += 1
      }
      val n = math.max(1L, nFrames.toLong)
      Some((fmt.getSampleRate.toInt, nFrames.toLong, Array(
        math.sqrt(sumSq / n).toFloat, peak.toFloat,
        (sumAbs / n).toFloat, crossings.toFloat / n)))
    } catch { case _: Exception => None }
  }

  // ---- MJPEG-in-AVI (public RIFF/AVI layout, hand-parsed like the
  // repo's HDF4/TIFF/NPY/shapefile codecs) ----------------------------

  /** Video-frame chunks of an MJPEG AVI: walk the RIFF chunk tree to
    * the 'movi' LIST and collect '..dc'/'..db' stream chunks (each one
    * JPEG image in MJPEG files). 'rec ' sub-LISTs are recursed into.
    * None if the blob is not a parseable AVI. */
  def decodeAviFrames(bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (sniff(bytes) != "avi") return None
    try {
      def u32(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
      def fourcc(o: Int): String = new String(bytes, o, 4, "ASCII")
      val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      // walk chunks in [from, to); inMovi: collect frame chunks
      def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
        var off = from
        while (off + 8 <= to) {
          val id = fourcc(off)
          val size = u32(off + 4)
          if (id == "LIST" && size >= 4) {
            val listType = fourcc(off + 8)
            walk(off + 12, off + 8 + size,
              inMovi || listType == "movi" || listType == "rec ")
          } else if (inMovi && id.length == 4 &&
            (id.endsWith("dc") || id.endsWith("db")) && size > 0) {
            frames += java.util.Arrays.copyOfRange(bytes, off + 8,
              off + 8 + size)
          }
          off += 8 + size + (size & 1) // chunks pad to even
        }
      }
      walk(12, math.min(bytes.length, 8 + u32(4)), inMovi = false)
      if (frames.isEmpty) None else Some(frames.toSeq)
    } catch { case _: Exception => None }
  }

  /** Write an MJPEG AVI from JPEG frame blobs — the fixture/export twin
    * of [[decodeAviFrames]]: RIFF('AVI ' LIST('hdrl' avih LIST('strl'
    * strh strf)) LIST('movi' '00dc'...)). Minimal but spec-shaped (56-
    * byte avih/strh, 40-byte BITMAPINFOHEADER with 'MJPG'). */
  def writeMjpegAvi(frames: Seq[Array[Byte]], width: Int, height: Int,
                    fps: Int = 10): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      id.getBytes("ASCII") ++ le32(body.length) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("ASCII") ++ body)
    val avih = le32(1000000 / math.max(1, fps)) ++ le32(0) ++ le32(0) ++
      le32(0x10) ++ le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(width) ++ le32(height) ++ Array.fill(16)(0.toByte)
    val strh = "vids".getBytes("ASCII") ++ "MJPG".getBytes("ASCII") ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(1) ++ le32(fps) ++ le32(0) ++
      le32(frames.length) ++ le32(0) ++ le32(0) ++ le32(0) ++
      Array.fill(8)(0.toByte)
    val strf = le32(40) ++ le32(width) ++ le32(height) ++
      Array(1.toByte, 0.toByte, 24.toByte, 0.toByte) ++
      "MJPG".getBytes("ASCII") ++ le32(width * height * 3) ++
      Array.fill(16)(0.toByte)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("ASCII") ++ hdrl ++ movi
    out.write("RIFF".getBytes("ASCII"))
    out.write(le32(body.length))
    out.write(body)
    out.toByteArray
  }

  /** Decode any media blob into (width, height, features), falling back
    * to the byte-histogram stub (and the caller's metadata dims) when
    * the format is unrecognized or corrupt. For WAV, width carries the
    * decoded sample rate and height the sample count (capped to Int) —
    * the typed-metadata convention for non-spatial media. */
  def decodeAny(bytes: Array[Byte], metaW: Int, metaH: Int): (Int, Int, Array[Float]) =
    sniff(bytes) match {
      case "png" | "jpeg" | "bmp" | "gif" =>
        decodeImage(bytes).getOrElse((metaW, metaH, Multimodal.decodeStub(bytes)))
      case "wav" =>
        decodeWav(bytes) match {
          case Some((rate, n, feats)) =>
            (rate, math.min(n, Int.MaxValue.toLong).toInt, feats)
          case None => (metaW, metaH, Multimodal.decodeStub(bytes))
        }
      case "avi" =>
        // video features = first frame's image features (keyframe proxy)
        decodeAviFrames(bytes).flatMap(fs => decodeImage(fs.head))
          .getOrElse((metaW, metaH, Multimodal.decodeStub(bytes)))
      case _ => (metaW, metaH, Multimodal.decodeStub(bytes))
    }
}
