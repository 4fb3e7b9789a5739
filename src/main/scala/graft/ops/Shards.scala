package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard export — the handoff sink at the end of a curation
  * pipeline: the corpus written as fixed-token-budget shards (the unit
  * a training job schedules and checkpoints by), plus a MANIFEST that
  * certifies what is actually on disk (per-shard doc/token counts and
  * an order-independent content hash), and a validator that re-derives
  * the manifest from the data and reports every discrepancy — the
  * integrity check a consumer runs before pointing a training run at
  * the shards.
  *
  * Scale shape: shard assignment is [[Packing.packChunked]]'s two-phase
  * global prefix scan (no single-partition window); the write is one
  * `partitionBy(shard_id)` parquet job; the manifest and the validator
  * are partial aggregations keyed on the shard — the content hash is an
  * XOR-fold of per-row hashes, so it is order-independent (no sort) and
  * map-side combinable.
  */
object Shards {

  private def tokenCount(textCol: String) =
    graft.functions.TextFunctions.approxBpeTokenCount(col(textCol))

  /** Per-shard manifest of a (shard_id, id, text) frame, everything
    * re-derived from the text itself: doc count, token count, and an
    * order-independent content hash (XOR of xxhash64(id, text)). */
  def manifestOf(data: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    data.select(col("shard_id").cast("long").as("shard_id"),
        col(idCol), col(textCol),
        tokenCount(textCol).as("tok"),
        xxhash64(col(idCol), col(textCol)).as("h"))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).as("n_tokens"),
        expr("bit_xor(h)").as("content_hash"))

  /** Write `df` as token-budget shards under `outDir`: `data/` is the
    * corpus partitioned by shard_id (docs in `idCol` order, each shard
    * overflowing its budget by at most one document — packChunked
    * semantics), `manifest/` the per-shard certificate computed from
    * the data AS WRITTEN (read back, not from the in-flight frame — the
    * manifest certifies disk content, so a lost or corrupted write
    * surfaces immediately). Returns the manifest. */
  def writeShards(df: DataFrame, outDir: String,
                  tokensPerShard: Long,
                  idCol: String = "doc_id", textCol: String = "text",
                  nParts: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val withTok = df.select(col(idCol), col(textCol),
      tokenCount(textCol).as("n_tokens"))
    val assigned = Packing
      .packChunked(withTok, idCol, "n_tokens", tokensPerShard, nParts)
      .withColumnRenamed("bin_id", "shard_id")
      .select(col(idCol), col(textCol), col("n_tokens"), col("shard_id"))
    assigned.write.partitionBy("shard_id").mode("overwrite")
      .parquet(s"$outDir/data")
    val manifest = manifestOf(
      spark.read.parquet(s"$outDir/data"), idCol, textCol)
    manifest.write.mode("overwrite").parquet(s"$outDir/manifest")
    spark.read.parquet(s"$outDir/manifest")
  }

  /** Re-derive the manifest from `outDir/data` and report every
    * discrepancy against `outDir/manifest`: one row per shard that is
    * missing on either side or differs in any certified field. Empty
    * result = the shards are exactly what the manifest promises. */
  def validateShards(spark: SparkSession, outDir: String,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val recorded = spark.read.parquet(s"$outDir/manifest")
      .select(col("shard_id"), col("n_docs").as("rec_docs"),
        col("n_tokens").as("rec_tokens"),
        col("content_hash").as("rec_hash"))
    val actual = manifestOf(spark.read.parquet(s"$outDir/data"),
        idCol, textCol)
      .select(col("shard_id"), col("n_docs").as("act_docs"),
        col("n_tokens").as("act_tokens"),
        col("content_hash").as("act_hash"))
    recorded.join(actual, Seq("shard_id"), "full_outer")
      .filter(col("rec_docs").isNull || col("act_docs").isNull ||
        col("rec_docs") =!= col("act_docs") ||
        col("rec_tokens") =!= col("act_tokens") ||
        col("rec_hash") =!= col("act_hash"))
  }
}
