package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every raw-corpus document by how target-like its HASHED
  * unigram distribution is, then keep the top slice — the principled
  * replacement for binary quality gates when a trusted target corpus
  * (curated wiki/books, an in-domain seed set) exists.
  *
  * Per-doc importance weight (bucketed bag-of-words with Laplace
  * smoothing over `nBuckets` hashed buckets):
  *
  *   w(doc) = Σ_tokens [ ln p_target(b(tok)) − ln p_raw(b(tok)) ]
  *
  * Engine-exactness: the per-bucket log-ratio is snapped to an integer
  * MICRO-NAT grid (round(Δln · 1e6) as BIGINT) before any aggregation,
  * so per-doc weights are exact integer sums — order-independent,
  * shuffle-plan-independent, and replayable bit-for-bit by the DuckDB
  * oracle (a raw double Σ of logs would be summation-order-dependent).
  * Buckets are md5-derived (the [[FeatureHash]] convention), not
  * xxhash64, for the same portability reason.
  *
  * Scale shape: the bucket distribution tables are `nBuckets` rows BY
  * CONSTRUCTION (independent of corpus size), so the scoring join
  * broadcasts; the token explode carries (id, bucket) only; the per-doc
  * aggregate is partial. Nothing about the raw corpus is collected —
  * the two scalar totals come off the nBuckets-row tables.
  */
object Dsir {

  /** Bucket of one token: first 8 md5 hex chars as an integer, mod
    * nBuckets (uniform, engine-portable). */
  private def bucketOf(tok: Column, nBuckets: Int): Column =
    pmod(conv(substring(md5(tok), 1, 8), 16, 10).cast("long"), lit(nBuckets))
      .cast("int")

  private def bucketCounts(df: DataFrame, textCol: String,
                           nBuckets: Int): DataFrame =
    df.select(explode(graft.functions.TextFunctions.tokens(
        lower(col(textCol)))).as("t"))
      .select(bucketOf(col("t"), nBuckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Importance weights for every `raw` doc against `target`.
    * Returns (idCol, n_tokens, weight_micro) — weight in micro-nats as
    * an exact BIGINT; zero-token docs score 0. */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        idCol: String = "doc_id", textCol: String = "text",
                        nBuckets: Int = 1024): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val spark = raw.sparkSession
    val rawCnt = bucketCounts(raw, textCol, nBuckets)
      .withColumnRenamed("cnt", "cr")
    val tgtCnt = bucketCounts(target, textCol, nBuckets)
      .withColumnRenamed("cnt", "ct")
    // nBuckets-row table: per-bucket micro-nat log-ratio of the two
    // smoothed distributions, numerator counts only — the shared
    // (ln N_r − ln N_t) normalizer folds into one per-token constant g
    val lrTable = spark.range(nBuckets)
      .select(col("id").cast("int").as("bucket"))
      .join(rawCnt, Seq("bucket"), "left")
      .join(tgtCnt, Seq("bucket"), "left")
      .select(col("bucket"),
        round((log(coalesce(col("ct"), lit(0L)) + lit(1.0)) -
          log(coalesce(col("cr"), lit(0L)) + lit(1.0))) * lit(1e6))
          .cast("long").as("lr_micro"))
    // totals off the bounded tables (two 1-row aggregates, never the
    // corpus): g = ln(N_raw + K) − ln(N_target + K) per token
    val nRaw = rawCnt.agg(coalesce(sum("cr"), lit(0L))).head().getLong(0)
    val nTgt = tgtCnt.agg(coalesce(sum("ct"), lit(0L))).head().getLong(0)
    val gMicro = math.round((math.log(nRaw.toDouble + nBuckets) -
      math.log(nTgt.toDouble + nBuckets)) * 1e6)
    val toks = raw.select(col(idCol),
        explode(graft.functions.TextFunctions.tokens(
          lower(col(textCol)))).as("t"))
      .select(col(idCol), bucketOf(col("t"), nBuckets).as("bucket"))
    val scored = toks
      .join(broadcast(lrTable), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("lr_micro")) + count(lit(1)) * lit(gMicro))
          .as("weight_micro"))
    raw.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("weight_micro"), lit(0L)).as("weight_micro"))
  }

  /** Keep the ~`fraction` most target-like docs: weight descending,
    * ties to the lowest id (deterministic across engines and runs).
    * Selection is threshold-based, not a global sort: k-th weight via
    * percentile_disc, `weight > thr` keeps in-plan, and only the
    * boundary TIE GROUP (usually tiny) pays a rank window. Returns the
    * kept (id, n_tokens, weight_micro) rows. */
  def resampleTop(raw: DataFrame, target: DataFrame, fraction: Double,
                  idCol: String = "doc_id", textCol: String = "text",
                  nBuckets: Int = 1024): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0, s"fraction $fraction")
    // k is a function of the RAW row count (importanceWeights emits one
    // row per raw doc), so decide the degenerate k<=0 case before the
    // expensive scoring join exists — that path must not leave a cached
    // weights table behind (round-7 advice).
    val n = raw.count()
    val k = math.floor(n * fraction).toLong
    if (k <= 0)
      return raw.select(col(idCol)).limit(0)
        .withColumn("n_tokens", lit(0L))
        .withColumn("weight_micro", lit(0L))
    val w = CacheRegistry.persist(
      importanceWeights(raw, target, idCol, textCol, nBuckets))
    // exact k-th largest weight (position k of the descending order)
    // percentile_disc picks an ELEMENT but surfaces it as double —
    // micro-nat weights stay well under 2^53, so the cast is exact
    val thr = w.select(expr(
      s"CAST(percentile_disc(${(k.toDouble - 0.5) / n}) WITHIN GROUP " +
        "(ORDER BY weight_micro DESC) AS BIGINT)").as("thr"))
      .head().getLong(0)
    val above = w.filter(col("weight_micro") > thr)
    val nAbove = above.count()
    val tieQuota = k - nAbove
    val ties = w.filter(col("weight_micro") === thr)
      .withColumn("rn", row_number().over(
        Window.partitionBy(lit(1)).orderBy(col(idCol))))
      .filter(col("rn") <= tieQuota)
      .drop("rn")
    above.unionByName(ties)
  }
}
