package graft.tools

import org.apache.spark.{GraftCpuTimeListener, GraftMetricsBridge}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Bpe, CacheRegistry, TensorShards}

/** Round-15 measurement probe (not part of the driver contract):
  * stage-level wall/cpu attribution for the most expensive non-A/B
  * bench entry (sft_multiturn_packed) and an in-place A/B of the
  * decodeTokenRows segment lookup — the O(segments-per-bin)-per-token
  * expression r14 left with a "binary search would save <10%" note —
  * against a segment-explode O(1)-per-token candidate, result equality
  * checked before any timing is trusted. Measured, not guessed. */
object ProbeR15 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isWritable(shm)) {
      val d = new java.io.File("/dev/shm/graft_spark_local")
      d.mkdirs()
      builder.config("spark.local.dir", d.getAbsolutePath)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val listener = GraftMetricsBridge.install(spark.sparkContext)

    def force(df: DataFrame): Unit =
      df.select(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect()

    def timed(name: String)(f: => Unit): Unit = {
      GraftMetricsBridge.flush(spark.sparkContext)
      val c0 = listener.cpuNanos.get()
      val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      GraftMetricsBridge.flush(spark.sparkContext)
      val cpu = (listener.cpuNanos.get() - c0) / 1e9
      println(f"PROBE $name%-34s wall=$wall%7.3f cpu=$cpu%8.3f")
    }

    // ---- the sft_multiturn_packed chain, stage by stage -------------
    val convo = graft.Tables.documents(spark, sfDir).select(col("doc_id"),
      concat(lit("<user> "), col("text"), lit(" <assistant> "),
        col("text"),
        lit(" <user> again please <assistant> sure thing done"))
        .as("text"))
    (0 until 2).foreach { round =>
      println(s"== round $round ==")
      var merges: List[(String, String)] = null
      var syms: List[String] = null
      var ids: DataFrame = null
      var spans: DataFrame = null
      var bins: DataFrame = null
      timed("trainMerges(share)") {
        merges = Bpe.trainMerges(convo, nMerges = 20, shareTokens = true)
      }
      timed("vocab") { syms = Bpe.vocab(convo, merges) }
      timed("encodeIds force") {
        ids = Bpe.encodeIds(convo, merges, syms); force(ids)
      }
      timed("turnMaskSpans force") {
        spans = Bpe.turnMaskSpans(convo, merges); force(spans)
      }
      timed("binTensorsMultiturn force") {
        bins = TensorShards.binTensorsMultiturn(ids, spans, capacity = 512)
        force(bins)
      }
      val shaped = bins.select(array(col("bin_id")).as("bin_id"),
        col("token_ids"), col("loss_mask"), col("seg_starts"),
        col("seg_lens"))
      timed("decodeTokenRows force (shipped)") {
        force(TensorShards.decodeTokenRows(shaped))
      }
      timed("decodePrefixSum force (r14 form)") {
        force(decodePrefixSum(shaped))
      }
      // equality gate before any timing is trusted: same row multiset
      if (round == 0) {
        val a = TensorShards.decodeTokenRows(shaped)
        val b = decodePrefixSum(shaped)
        val cntA = a.count(); val cntB = b.count()
        val diff = a.unionAll(b).groupBy(a.columns.map(col).toIndexedSeq: _*)
          .agg(count(lit(1)).as("n")).filter(col("n") % 2 =!= 0).count()
        println(s"PROBE equality: rows $cntA vs $cntB, odd-parity groups $diff")
      }
      // isolated decode A/B: cache the bins frame so both sides read
      // identical materialized input (no upstream recompute confound),
      // interleave 3 rounds
      if (round == 1) {
        val cached = shaped.persist()
        cached.count()
        (0 until 3).foreach { i =>
          timed(s"iso decode shipped #$i") {
            force(TensorShards.decodeTokenRows(cached))
          }
          timed(s"iso decode r14 prefix-sum #$i") {
            force(decodePrefixSum(cached))
          }
        }
        cached.unpersist()
      }
      timed("full chain (fresh)") {
        CacheRegistry.releaseAll()
        val m2 = Bpe.trainMerges(convo, nMerges = 20, shareTokens = true)
        val s2 = Bpe.vocab(convo, m2)
        val i2 = Bpe.encodeIds(convo, m2, s2)
        val sp2 = Bpe.turnMaskSpans(convo, m2)
        force(TensorShards.decodeTokenRows(
          TensorShards.binTensorsMultiturn(i2, sp2, capacity = 512)
            .select(array(col("bin_id")).as("bin_id"), col("token_ids"),
              col("loss_mask"), col("seg_starts"), col("seg_lens"))))
      }
      CacheRegistry.releaseAll()
    }
    spark.stop()
  }

  /** The r14 decode form, kept as the probe's A/B reference: explode
    * TOKENS, then rank each position against the offsets array —
    * O(segments-per-bin) per token. Shipped decodeTokenRows is the
    * segment-major O(1)-per-token form; this pins the before/after
    * comparison reproducible. */
  private[tools] def decodePrefixSum(examples: DataFrame): DataFrame =
    examples
      .select(element_at(col("bin_id"), 1).as("bin_id"),
        col("token_ids"), col("loss_mask"),
        col("seg_starts"), col("seg_lens"))
      .withColumn("offs", expr(
        "slice(aggregate(seg_lens, array(0L), " +
          "(acc, x) -> array_append(acc, element_at(acc, -1) + x)), " +
          "1, size(seg_lens))"))
      .select(col("bin_id"), col("offs"), col("seg_starts"),
        col("seg_lens"),
        posexplode(arrays_zip(col("token_ids"), col("loss_mask"))))
      .select(col("bin_id"), col("pos").cast("long").as("pos"),
        col("col.token_ids").as("token_id"),
        col("col.loss_mask").as("loss"),
        (size(filter(col("offs"), o => o <= col("pos"))) - 1)
          .cast("long").as("seg_idx"),
        col("offs"), col("seg_starts"), col("seg_lens"))
      .select(col("bin_id"), col("pos"), col("token_id"), col("loss"),
        col("seg_idx"),
        element_at(col("seg_starts"), (col("seg_idx") + 1).cast("int"))
          .as("seg_start"),
        element_at(col("seg_lens"), (col("seg_idx") + 1).cast("int"))
          .as("seg_len"))
}
