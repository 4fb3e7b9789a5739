package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Curriculum ordering for training data — assign every row a global
  * position under an explicit sort order (the easy-to-hard schedule of
  * curriculum learning, Bengio et al. 2009: train on predictable data
  * first, feed the tail later). The unit ordered here is whatever the
  * caller grouped to — typically PACKED BINS scored by the mean
  * Stupid-Backoff LM score of their documents ([[NgramLm]] +
  * [[Packing.packChunked]]), so the schedule is a permutation of
  * training batches, not rows.
  *
  * Scale shape: a global total order without a single-partition sort —
  * the [[Sampling.globalShuffle]] two-phase discipline. Phase 1 range-
  * partitions + locally sorts on the order key (the only shuffle);
  * phase 2 counts rows per partition (driver holds one long per
  * partition) and assigns positions by per-partition prefix offsets.
  * Range boundaries come from Spark's partitioner sampling, but the
  * POSITIONS are determined solely by the total order, so the output
  * is deterministic for any boundary placement.
  */
object Curriculum {

  /** Adds `curriculum_pos`: the row's 0-based position under
    * `orderCols` (must be a TOTAL order — include a unique tiebreak). */
  def assignPositions(df: DataFrame, orderCols: Seq[Column],
                      nParts: Int = 32): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    // the range-partitioned sort is persisted (registry-tracked, the
    // multi-reference-intermediate contract): the count pass below
    // materializes it and the assign pass reads the cache, so the local
    // sort is paid ONCE across the two jobs, not per pass
    val sorted = CacheRegistry.persist(
      df.repartitionByRange(nParts, orderCols: _*)
        .sortWithinPartitions(orderCols: _*))
    val rdd = sorted.rdd
    val counts = rdd.mapPartitionsWithIndex { (i, it) =>
      Iterator((i, it.size.toLong))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var p = offsets(i)
      it.map { r => val row = Row.fromSeq(r.toSeq :+ p); p += 1; row }
    }
    spark.createDataFrame(out, StructType(df.schema.fields :+
      StructField("curriculum_pos", LongType, nullable = false)))
  }

  /** The composed schedule: docs → per-doc LM score against the model
    * under `modelDir` ([[NgramLm.scoreWithModel]]) → token-packed bins
    * ([[Packing.packChunked]] on `tokensCol`) → per-bin mean score →
    * global easy-to-hard positions (score DESC, bin_id tiebreak).
    * Returns (bin_id, n_docs, bin_score, curriculum_pos).
    *
    * The rank key is the bin score SNAPPED to the emitted 6-decimal
    * grid, not the raw double: avg() is accumulation-order-dependent,
    * so two near-tied raw means could permute across engines (or
    * Spark runs) in the last ulps while their rounded emissions agree —
    * ranking on the snapped value keeps the order a pure function of
    * the emitted columns, with bin_id breaking genuine grid ties. */
  def lmOrderedBins(spark: org.apache.spark.sql.SparkSession,
                    modelDir: String, docs: DataFrame,
                    capacity: Long, idCol: String = "doc_id",
                    textCol: String = "text",
                    tokensCol: Column = null): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      (if (tokensCol == null)
        graft.functions.TextFunctions.approxBpeTokenCount(col(textCol))
      else tokensCol).as("n_tokens"))
    val bins = Packing.packChunked(toks, "doc_id", "n_tokens", capacity)
    val scores = NgramLm.scoreWithModel(spark, modelDir, docs,
      idCol, textCol)
    val perBin = bins.join(scores, Seq("doc_id"))
      .groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), avg(col("lm_bo_score")).as("bin_score"))
    assignPositions(perBin,
      Seq(round(col("bin_score"), 6).desc, col("bin_id")))
  }

  /** The schedule's last mile: shard `n` of the training run = the bins
    * at curriculum positions [n*binsPerShard, (n+1)*binsPerShard), in
    * position order — the physical layout a data loader streams
    * sequentially to GET the easy-to-hard order (a schedule nothing
    * consumes is just a ranking). Takes a frame carrying
    * `curriculum_pos` (from [[assignPositions]]/[[lmOrderedBins]]),
    * adds `shard_id`, and writes shard-addressed TFRecord files
    * ([[graft.sources.TfRecord.writeShardedExamples]]): ONE range
    * exchange on position, then each task cuts its sorted run at shard
    * boundaries — shard count never materializes driver-side. */
  def writeCurriculumShards(scheduled: DataFrame, dir: String,
                            binsPerShard: Int,
                            int64Cols: Seq[String],
                            nParts: Option[Int] = None): Unit = {
    require(binsPerShard > 0, s"binsPerShard $binsPerShard")
    // Shard-addressing guard (the writeManifestedShards discipline):
    // positions are 0-based by contract, but a caller-assembled frame
    // could carry anything — a negative position must fail loudly, not
    // land in a wrong shard. Integer `div` (not Column./, double math)
    // keeps the address exact past 2^53 positions.
    val withShard = scheduled.withColumn("shard_id",
      when(col("curriculum_pos") >= 0,
          expr(s"curriculum_pos div $binsPerShard"))
        .otherwise(raise_error(concat(
          lit("writeCurriculumShards: negative curriculum_pos "),
          col("curriculum_pos").cast("string"),
          lit(" — shard addressing requires non-negative positions")))))
    // explicit nParts pins the writer-task count (AQE coalesces the
    // default); either way shard reassembly is order-safe
    val sharded = (nParts match {
      case Some(n) => withShard.repartitionByRange(n, col("curriculum_pos"))
      case None => withShard.repartitionByRange(col("curriculum_pos"))
    }).sortWithinPartitions(col("curriculum_pos"))
    graft.sources.TfRecord.writeShardedExamples(sharded, dir, "shard_id",
      int64Cols, Seq.empty)
  }
}
