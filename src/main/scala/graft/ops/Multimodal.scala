package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted per partition.
  *
  * The Spark-side machinery — schema, partitioning, per-partition batch
  * processing (`mapPartitions` on a typed Dataset, the Scala analog of
  * `mapInPandas` batches), frame-sample explode — pairs with REAL
  * decode kernels from the JDK ([[MediaCodec]]: `javax.imageio`
  * PNG/JPEG/BMP/GIF, `javax.sound.sampled` WAV PCM, and a hand-parsed
  * MJPEG-in-AVI reader for video frames — the JDK ships no video codec,
  * so AVI container walking is implemented from the public RIFF spec
  * and each MJPEG frame decodes through the ImageIO JPEG path). Blobs
  * whose format is unrecognized or corrupt fall back to [[decodeStub]]'s
  * deterministic byte-histogram pseudo-features, so the pipeline never
  * fails on a bad row.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long, kind: String, media: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int,
      features: Array[Float])

  final case class Frame(
      media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Deterministic synthetic media table derived from `documents` (the
    * fixture corpus has no binary columns): payload = utf8 bytes,
    * metadata from stable arithmetic. Stands in for a real lakehouse
    * media table with identical schema.
    */
  def syntheticMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("media"),
      (col("n_chars") % 640 + 16).cast("int").as("width"),
      (col("n_chars") % 480 + 16).cast("int").as("height"),
      lit(16000).as("sample_rate"))

  /** Fallback decode kernel for unrecognized/corrupt formats: 8-bin
    * byte histogram normalized to [0,1] — deterministic pseudo-features
    * so undecodable rows are quarantined with a signal instead of
    * failing the job. Recognized formats take the real JDK decoders in
    * [[MediaCodec]].
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      bins((bytes(i) & 0xff) >> 5) += 1.0f
      i += 1
    }
    if (bytes.length > 0) {
      var b = 0
      while (b < 8) { bins(b) /= bytes.length; b += 1 }
    }
    bins
  }

  /** Feature extraction over media batches: one task per partition, the
    * decode loop amortizes any per-batch codec setup (the mapInPandas
    * batch-shape analog).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      // per-partition codec init would go here (expensive, amortized)
      it.map { r =>
        val (w, h, feats) = MediaCodec.decodeAny(r.media, r.width, r.height)
        MediaFeatures(r.media_id, r.kind, r.media.length, w, h, feats)
      }
    }
  }

  final case class ResizedMedia(
      media_id: Long, kind: String, width: Int, height: Int,
      media: Array[Byte], resized: Boolean)

  /** Thumbnail/normalization pass: every decodable image re-encodes as
    * a (tw x th) PNG via [[MediaCodec.resizeImage]] (deterministic
    * box-average, lossless re-encode); everything else — audio, video,
    * undecodable blobs — passes through unchanged with
    * `resized = false` (the stub-quarantine discipline: no row is
    * dropped, the flag is the signal). Same scale shape as
    * [[extractFeatures]]: one mapPartitions pass over the media rows,
    * payloads transform in place and never shuffle — the batchwise
    * image-preprocessing step of a training pipeline as a partition
    * pass. */
  def resizeImages(spark: SparkSession, media: DataFrame,
                   tw: Int, th: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        MediaCodec.resizeImage(r.media, tw, th) match {
          case Some(png) => ResizedMedia(r.media_id, r.kind, tw, th,
            png, resized = true)
          case None => ResizedMedia(r.media_id, r.kind, r.width,
            r.height, r.media, resized = false)
        }
      }
    }
  }

  /** Near-duplicate media pairs by 64-bit perceptual hash: real images
    * hash via [[MediaCodec.imageAHash]] (8x8 luminance aHash — robust
    * to re-encode/resize/small edits), undecodable blobs via the
    * byte-level fallback ([[MediaCodec.byteAHash]]), so the op is total
    * over mixed media columns. Candidates block on the hash's four
    * 16-bit quarters (the SimHash discipline): Hamming distance <=
    * `maxDist` <= 3 GUARANTEES at least one equal quarter (pigeonhole),
    * so blocking loses no pair the verify step would keep.
    *
    * Scale shape: the decode+hash pass is mapPartitions over the media
    * rows (one 8-byte hash out per blob — payloads never shuffle); the
    * block self-join carries (block key, id) only; hashes re-attach per
    * candidate pair for the exact bit_count verify.
    */
  def nearDupMedia(spark: SparkSession, media: DataFrame,
                   maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      s"maxDist $maxDist: 4-block pigeonhole covers Hamming <= 3")
    import spark.implicits._
    val hashes = CacheRegistry.persist(
      media.as[MediaRow].mapPartitions { it =>
        it.map { r =>
          val h = MediaCodec.imageAHash(r.media)
            .getOrElse(MediaCodec.byteAHash(r.media))
          (r.media_id, h)
        }
      }.toDF("media_id", "ahash"))
    def shr(v: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
      call_function("shiftright", v, n)
    val blocks = hashes
      .select(col("media_id"), col("ahash"),
        explode(sequence(lit(0), lit(3))).as("b"))
      .select(col("media_id"), col("b"),
        shr(col("ahash"), col("b") * 16).bitwiseAND(lit(0xffffL)).as("bv"))
    val pairs = blocks
      .select(col("b"), col("bv"), col("media_id").as("id_a"))
      .join(blocks.select(col("b"), col("bv"), col("media_id").as("id_b")),
        Seq("b", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    pairs
      .join(hashes.select(col("media_id").as("id_a"),
        col("ahash").as("ha")), "id_a")
      .join(hashes.select(col("media_id").as("id_b"),
        col("ahash").as("hb")), "id_b")
      .withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int"))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Frame sampling for video rows: explode one row per sampled frame.
    * MJPEG-in-AVI blobs decode REAL frames ([[MediaCodec.decodeAviFrames]]
    * — each emitted frame is one JPEG image); other payloads fall back
    * to the deterministic stride-window stub so the pipeline never
    * fails on an undecodable blob. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   stride: Int = 64, maxFrames: Int = 8): Dataset[Frame] = {
    import spark.implicits._
    media.filter(col("kind") === "video").as[MediaRow].flatMap { r =>
      MediaCodec.decodeAviFrames(r.media) match {
        case Some(frames) => frames.iterator.take(maxFrames).zipWithIndex
          .map { case (b, f) => Frame(r.media_id, f, b) }
        case None =>
          val n = math.min(maxFrames, math.max(1, r.media.length / stride))
          (0 until n).iterator.map { f =>
            Frame(r.media_id, f, r.media.slice(f * stride,
              math.min((f + 1) * stride, r.media.length)))
          }
      }
    }
  }
}
