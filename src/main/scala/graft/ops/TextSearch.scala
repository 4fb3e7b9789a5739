package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Okapi BM25 full-text search over a document corpus (Robertson &
  * Spärck Jones's probabilistic ranking; the scoring function behind
  * Lucene/Elasticsearch defaults) — gives the engine ad-hoc relevance
  * search over its own corpus tables, the retrieval complement of the
  * TF-IDF keyword extractor.
  *
  *   score(d, Q) = Σ_{t ∈ Q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *   idf(t) = ln((N − df + 0.5) / (df + 0.5))
  *
  * Engine-exactness: idf values are snapped to the integer micro-nat
  * grid (the [[Dsir]] convention) and embedded as literals; per-term
  * contributions are added in FIXED query-term order (a literal
  * left-associated sum, not an aggregate), so the whole score chain is
  * deterministic IEEE arithmetic the DuckDB oracle replays exactly.
  *
  * Scale shape: one corpus pass builds the (doc, term) tf table for
  * QUERY TERMS ONLY (the explode filters to ≤|Q| distinct terms before
  * the partial agg, so the shuffle is hit-sized, not corpus-sized); one
  * more pass takes N and Σdl as a 1-row aggregate. df comes off the tf
  * table (≤|Q| rows collected — bounded by the query, not the data).
  * Scoring is a projection over the tf join; top-k is
  * TakeOrderedAndProject (per-partition top-k, no global sort).
  */
object TextSearch {

  /** Top-`k` docs for `queryTerms` (matched case-insensitively against
    * whitespace tokens). Returns (idCol, dl, score) — score unrounded;
    * ties rank by ascending id. Docs matching no term score 0 and are
    * only returned if fewer than `k` docs match. */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty && k > 0, "need query terms and k > 0")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val id = col(idCol)

    val toks = docs.select(id,
        explode(graft.functions.TextFunctions.tokens(
          lower(col(textCol)))).as("t"))
      .filter(col("t").isin(terms: _*))
    // (doc, term)-grouped hits, pivoted to one tf column per query term
    // (terms are a literal list — no discovery scan); persisted because
    // both df and the scoring join read it, hit-sized by construction
    val aggs = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("t") === t, 1L).otherwise(0L)).as(s"tf_$i")
    }
    val tf = CacheRegistry.persist(
      toks.groupBy(id).agg(aggs.head, aggs.tail: _*))

    // bounded stats: N + Σdl in ONE corpus aggregate; df off the
    // hit-sized tf table (≤ |terms| values collected)
    val stats = docs.agg(count(lit(1)).as("n"),
      coalesce(sum(graft.functions.TextFunctions.tokenCount(col(textCol))
        .cast("long")), lit(0L)).as("sumdl")).head()
    val n = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / n
    val dfRow = tf.select(terms.indices.map(i =>
      sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i")): _*).head()
    // idf snapped to micro-nats (exact integer -> deterministic double)
    val idf = terms.indices.map { i =>
      val df = dfRow.getLong(i)
      math.round(math.log((n - df + 0.5) / (df + 0.5)) * 1e6) / 1e6
    }

    val scored = docs.select(id,
        graft.functions.TextFunctions.tokenCount(col(textCol))
          .cast("long").as("dl"))
      .join(tf, Seq(idCol), "left")
    // fixed left-associated per-term sum — NOT an aggregate, so the
    // addition order is part of the plan and the oracle mirrors it
    val score = terms.indices.map { i =>
      val tfc = coalesce(col(s"tf_$i"), lit(0L))
      when(tfc > 0,
        lit(idf(i)) * (tfc * lit(k1 + 1.0)) /
          (tfc + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / lit(avgdl)))))
        .otherwise(lit(0.0))
    }.reduceLeft[Column](_ + _)
    scored.select(id, col("dl"), score.as("score"))
      .orderBy(col("score").desc, id.asc)
      .limit(k)
  }
}
