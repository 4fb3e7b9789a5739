package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation — the IR metrics a search/RAG pipeline
  * reports against a judged set: per query, precision@k, recall@k,
  * MRR@k, and nDCG@k of a RANKING table against a QRELS (relevance
  * judgments) table. This is the measurement half of the retrieval
  * surface (BM25 / ANN / hybrid fusion produce rankings; this op
  * scores them), the same split as the ANN recall@k record but
  * engine-exact and oracle-replayable.
  *
  * Engine-exactness (the integer micro-unit convention — PageRank/DSIR
  * precedent): the per-rank gain 1/log2(r+1) and reciprocal-rank 1/r
  * exist only at ranks 1..k, so both are embedded as k PRECOMPUTED
  * micro-unit literals (round(1e6·w) as BIGINT) — DCG/IDCG/MRR are
  * then exact LONG sums (order-free, no float-accumulation
  * nondeterminism), and the final ratios are single IEEE divisions of
  * exact longs that the DuckDB oracle replays bit-identically.
  *
  * Scale shape: one equi-join of the ranking against qrels on
  * (query, doc) — rankings are k-bounded per query, so the join input
  * is |Q|·k rows regardless of corpus size; per-query totals come off
  * qrels with a (query)-keyed partial agg. Nothing corpus-sized moves.
  */
object RankingMetrics {

  /** Micro-unit DCG gain at rank r (1-based): round(1e6 / log2(r+1)). */
  def dcgGainMicro(r: Int): Long =
    math.round(1e6 / (math.log(r + 1.0) / math.log(2.0)))

  /** Micro-unit reciprocal rank: round(1e6 / r). */
  def rrMicro(r: Int): Long = math.round(1e6 / r.toDouble)

  private def lookup(vals: Seq[Long], r: Column): Column =
    vals.zipWithIndex.foldLeft(lit(0L)) { case (acc, (v, i)) =>
      when(r === (i + 1), lit(v)).otherwise(acc)
    }

  /** Score `ranking` (queryCol, docCol, rankCol with ranks 1..k)
    * against `qrels` (queryCol, docCol = the relevant pairs). Returns
    * one row per query: n_rel_top (relevant found in the top-k),
    * n_rel (total relevant), p_at_k, recall_at_k, mrr_micro,
    * dcg_micro, idcg_micro, ndcg. Queries with no qrels row score 0
    * with n_rel = 0 (ndcg 0 by convention); judged queries the ranking
    * returns NOTHING for (no rows at rank <= k) score 0 rather than
    * vanish — a retrieval that comes back empty must drag the mean
    * down, not shrink the denominator. */
  def evaluate(ranking: DataFrame, qrels: DataFrame, k: Int,
               queryCol: String = "query_id", docCol: String = "doc_id",
               rankCol: String = "rank"): DataFrame = {
    require(k >= 1 && k <= 1000, s"k $k out of range")
    val gains = (1 to k).map(dcgGainMicro)
    val idcgPrefix = gains.scanLeft(0L)(_ + _).tail // idcg for R = 1..k
    val rrs = (1 to k).map(rrMicro)

    val q = col(queryCol)
    val hits = ranking
      .select(q, col(docCol), col(rankCol).cast("int").as("r"))
      .filter(col("r") <= k)
      .join(qrels.select(q, col(docCol), lit(true).as("rel")),
        Seq(queryCol, docCol), "left")
      .withColumn("rel", coalesce(col("rel"), lit(false)))
    val perQuery = hits.groupBy(q).agg(
      sum(when(col("rel"), 1L).otherwise(0L)).as("n_rel_top"),
      sum(when(col("rel"), lookup(gains, col("r"))).otherwise(0L))
        .as("dcg_micro"),
      coalesce(min(when(col("rel"), col("r"))), lit(0)).as("first_rel"))
    val totals = qrels.groupBy(q).agg(count(lit(1)).as("n_rel"))
    // full outer: ranking-only queries keep n_rel = 0 (score 0 by the
    // convention above), and qrels-only queries surface as zero rows
    // instead of silently dropping out of the macro average
    perQuery.join(totals, Seq(queryCol), "full_outer")
      .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
      .withColumn("n_rel_top", coalesce(col("n_rel_top"), lit(0L)))
      .withColumn("dcg_micro", coalesce(col("dcg_micro"), lit(0L)))
      .withColumn("first_rel", coalesce(col("first_rel"), lit(0)))
      .withColumn("p_at_k", col("n_rel_top").cast("double") / k)
      .withColumn("recall_at_k",
        when(col("n_rel") > 0,
          col("n_rel_top").cast("double") / col("n_rel")).otherwise(0.0))
      .withColumn("mrr_micro", lookup(rrs, col("first_rel")))
      .withColumn("idcg_micro",
        when(col("n_rel") >= k, lit(idcgPrefix.last))
          .otherwise(lookup(idcgPrefix, col("n_rel").cast("int"))))
      .withColumn("ndcg",
        when(col("idcg_micro") > 0,
          col("dcg_micro").cast("double") / col("idcg_micro"))
          .otherwise(0.0))
      .drop("first_rel")
  }
}
