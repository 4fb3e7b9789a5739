package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stupid-Backoff trigram language model over whitespace tokens —
  * train-on-reference / score-the-corpus, the CCNet-style LM quality
  * gate (Wenzek et al. 2020) with the penalized-backoff score of
  * Brants et al. 2007 ("Large Language Models in Machine Translation",
  * §4: S(w|u,v) = c(uvw)/c(uv), backing off to 0.4·S(w|v), 0.4·S(w)) —
  * the score those authors designed precisely FOR distributed count
  * tables at web scale, which is why it fits a Spark join pipeline
  * where Kneser-Ney's iterative discounting would not.
  *
  * [[TermStats.bigramLmScore]] is the one-join bigram version of this
  * gate; this op adds the trigram order, the penalized backoff chain,
  * and a PERSISTED model (count tables as parquet), so one trained
  * reference model scores many corpus batches — the
  * [[TextSearch]]-index discipline applied to LM counts.
  *
  * Portability convention ([[TermStats.bigramLmScore]]): NO logarithm.
  * The per-doc score is the arithmetic mean of per-token S values —
  * integer counts, IEEE divides and 0.4 products in a fixed order, a
  * per-doc mean — every step replays exactly in the DuckDB oracle;
  * ln(geometric mean) would rank the same docs through libm calls that
  * are not bit-portable across engines.
  *
  * Sequence convention: each document is padded with two BOS sentinels
  * (U+0002 — whitespace-split tokens cannot collide with it in this
  * corpus), so every real token is scored by the same trigram formula,
  * including positions 0 and 1 (their contexts are BOS; the trained
  * counts include BOS contexts, so document-initial tokens are scored
  * by genuine "starts a document" statistics, not by a backoff
  * penalty). Counts, N and V are over the padded streams — the
  * absolute normalization is a documented constant offset, irrelevant
  * to a threshold gate and exactly mirrored by the oracle.
  *
  * Scale shape: the ONLY corpus-sized work is the trigram projection
  * (array transform + explode — no shuffle) and one scoring join keyed
  * on the trigram. All count aggregates are map-side-combined partial
  * aggs keyed by the n-gram. Scoring joins the count tables against
  * the DISTINCT context table (trigram-vocabulary-sized, the
  * [[Bpe.pieceCounts]] distinct-word discipline), then the corpus
  * stream joins that scored table once. Count tables are open-
  * vocabulary — NOT force-broadcast (AQE broadcasts a sampled-train
  * model when small). (N, V) is a one-row broadcast.
  */
object NgramLm {

  /** Document-start sentinel. */
  val Bos = "\u0002"

  private def paddedTokens(textCol: Column): Column =
    concat(array(lit(Bos), lit(Bos)),
      graft.functions.TextFunctions.tokens(lower(textCol)))

  /** Trigram struct array over a BOS-padded token array column —
    * guarded for zero-token documents: the padded array then has size
    * 2, where Spark's sequence(3, 2) DESCENDS through i = 2 and
    * element_at(ts, 0) throws unconditionally, so empty docs yield an
    * empty array instead (they carry no scorable tokens — the same
    * no-rows outcome the DuckDB oracle's empty range(3, 3) produces). */
  private val trigramsOfTs: String =
    """CASE WHEN size(ts) >= 3 THEN
      |  transform(sequence(3, size(ts)),
      |    i -> struct(element_at(ts, i - 2) AS u,
      |                element_at(ts, i - 1) AS v,
      |                element_at(ts, i) AS w))
      |ELSE CAST(array() AS array<struct<u:string,v:string,w:string>>)
      |END""".stripMargin

  /** One row per real token: (doc_id, u, v, w) with u,v its two
    * predecessors (BOS-padded). Pure projection + explode — the
    * corpus-sized stream everything else keys off. */
  def trigramStream(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val padded = paddedTokens(col(textCol))
    df.select(col(idCol).as("doc_id"), padded.as("ts"))
      .select(col("doc_id"), explode(expr(trigramsOfTs)).as("g"))
      .select(col("doc_id"), col("g.u"), col("g.v"), col("g.w"))
  }

  /** Train the count tables and persist them under `modelDir`:
    * `trigrams` (u,v,w,c3), `bigrams` (v,w,c2), `unigrams` (w,c1) —
    * all over the BOS-padded streams — and `meta` (n_tokens = total
    * padded tokens, vocab = distinct padded tokens). */
  def trainModel(train: DataFrame, modelDir: String,
                 idCol: String = "doc_id", textCol: String = "text"): Unit = {
    // persist the PADDED arrays — the tokenization projection feeds
    // all four count consumers (tri/bi/uni/meta) from one cache entry
    val padded = CacheRegistry.persist(
      train.select(paddedTokens(col(textCol)).as("ts")))
    val toks = padded.select(explode(col("ts")).as("w"))
    // n-gram counts straight from the padded arrays (projection-only)
    val tri = padded.select(explode(expr(trigramsOfTs)).as("g"))
      .groupBy(col("g.u"), col("g.v"), col("g.w"))
      .agg(count(lit(1)).as("c3"))
    val bi = padded.select(explode(expr(
        """transform(sequence(2, size(ts)),
          |  i -> struct(element_at(ts, i - 1) AS v,
          |              element_at(ts, i) AS w))""".stripMargin)).as("g"))
      .groupBy(col("g.v"), col("g.w"))
      .agg(count(lit(1)).as("c2"))
    val uni = toks.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val meta = toks.agg(count(lit(1)).as("n_tokens"),
      count_distinct(col("w")).as("vocab"))
    tri.write.mode("overwrite").parquet(s"$modelDir/trigrams")
    bi.write.mode("overwrite").parquet(s"$modelDir/bigrams")
    uni.write.mode("overwrite").parquet(s"$modelDir/unigrams")
    meta.write.mode("overwrite").parquet(s"$modelDir/meta")
  }

  /** Per-document mean Stupid-Backoff score against a trained model:
    * (doc_id, n_tokens, lm_bo_score). Higher = more predictable under
    * the reference model — threshold low scores away ([[scoreFilter]]).
    *
    * Per token: S = c3/c2(u,v) if the trigram was seen, else
    * 0.4·(c2(v,w)/c1(v)) if the bigram was seen, else
    * 0.4·0.4·(c1(w)+1)/(N+V) — the final unigram level Laplace-floored
    * so OOV tokens score positive mass, [[TermStats.bigramLmScore]]'s
    * smoothing convention. */
  def scoreWithModel(spark: SparkSession, modelDir: String, docs: DataFrame,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val tri = spark.read.parquet(s"$modelDir/trigrams")
    val bi = spark.read.parquet(s"$modelDir/bigrams")
    val uni = spark.read.parquet(s"$modelDir/unigrams")
    val meta = spark.read.parquet(s"$modelDir/meta")
    val stream = CacheRegistry.persist(trigramStream(docs, idCol, textCol))
    // trigram-vocabulary-sized scoring table: every count lookup and
    // the backoff arithmetic happen once per DISTINCT context
    val contexts = stream.select("u", "v", "w").distinct()
      .join(tri, Seq("u", "v", "w"), "left")
      .join(bi.select(col("v").as("u"), col("w").as("v"),
        col("c2").as("c2_ctx")), Seq("u", "v"), "left")
      .join(bi, Seq("v", "w"), "left")
      .join(uni.select(col("w").as("v"), col("c1").as("c1_ctx")),
        Seq("v"), "left")
      .join(uni, Seq("w"), "left")
      .crossJoin(broadcast(meta))
    val s1 = (coalesce(col("c1"), lit(0L)) + lit(1L)) /
      (col("n_tokens") + col("vocab"))
    val s2 = when(col("c2").isNotNull, col("c2") / col("c1_ctx"))
      .otherwise(lit(0.4) * s1)
    val s3 = when(col("c3").isNotNull, col("c3") / col("c2_ctx"))
      .otherwise(lit(0.4) * s2)
    val scored = contexts.select(col("u"), col("v"), col("w"), s3.as("s"))
    stream.join(scored, Seq("u", "v", "w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), avg(col("s")).as("lm_bo_score"))
    // stream stays registry-tracked until the caller's terminal action
    // (the CacheRegistry contract: Verify/Bench releaseAll per entry)
  }

  /** Train on `train`, persist under `modelDir`, score `docs` — the
    * one-call composition. */
  def trainAndScore(train: DataFrame, docs: DataFrame, modelDir: String,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    trainModel(train, modelDir, idCol, textCol)
    scoreWithModel(train.sparkSession, modelDir, docs, idCol, textCol)
  }

  /** The gate: keep documents scoring at least `minScore`. */
  def scoreFilter(spark: SparkSession, modelDir: String, docs: DataFrame,
                  minScore: Double, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    docs.join(
      scoreWithModel(spark, modelDir, docs, idCol, textCol)
        .filter(col("lm_bo_score") >= minScore)
        .select(col("doc_id").as(idCol), col("lm_bo_score")),
      Seq(idCol))
}
