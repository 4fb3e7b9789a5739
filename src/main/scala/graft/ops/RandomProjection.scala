package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection for embedding columns —
  * the dimensionality-reduction stage in front of similarity search:
  * at 100 TB, shrinking float32[768] to float64[16] cuts the ANN
  * scan's arithmetic and shuffle bytes by ~an order of magnitude while
  * JL keeps pairwise geometry within (1 ± eps). The shortlist is
  * ranked in projected space; survivors are re-ranked exactly on the
  * original vectors ([[projectedTopK]]) — the same
  * shortlist-then-confirm shape as the IVF/PQ paths in [[Similarity]].
  *
  * The projection matrix is Achlioptas's sparse database-friendly one
  * (Achlioptas 2003, JCSS — "Database-friendly random projections"):
  * entries +1 / -1 with probability 1/6 each, 0 with probability 2/3,
  * scaled by sqrt(3/dimOut). Entries derive from md5 of
  * "seed:row:col" — not a PRNG stream: every entry is addressable by
  * (row, col) alone, so Spark and the DuckDB oracle materialize the
  * SAME matrix independently, executors never ship it (12 KiB of
  * closure for 768→16), and a re-run on appended data projects
  * identically (the [[Sampling.hashDraw]] determinism discipline).
  * The sign buckets are fixed-width lowercase-hex string compares on
  * the first 8 md5 chars — exactly representable thresholds, identical
  * lexicographic/numeric order in both engines.
  *
  * Scale shape: projection is a pure per-row projection (dimOut native
  * [[graft.functions.DotProductExpr]] dot products against literal
  * rows — codegen, no shuffle, no UDF); nothing is corpus-joined.
  */
object RandomProjection {

  /** 16^8 / 6 and 2·16^8 / 6 as fixed-width lowercase hex — the
    * Achlioptas bucket boundaries on the first 8 md5 hex chars. */
  private val PlusBelow = "2aaaaaaa"
  private val MinusBelow = "55555555"

  /** The (row, col) matrix entry in {+1, -1, 0} — unscaled. */
  def entry(seed: String, row: Int, col: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$row:$col".getBytes("UTF-8"))
    val hex = h.take(4).map(b => f"${b & 0xff}%02x").mkString
    if (hex < PlusBelow) 1.0 else if (hex < MinusBelow) -1.0 else 0.0
  }

  /** The dimOut x dimIn Achlioptas matrix, unscaled entries. */
  def matrix(dimIn: Int, dimOut: Int, seed: String): Array[Array[Double]] =
    Array.tabulate(dimOut, dimIn)((j, i) => entry(seed, j, i))

  /** Adds `outCol`: array<double> of length `dimOut` — each component
    * one native dot against a literal matrix row, times sqrt(3/dimOut).
    */
  def project(df: DataFrame, dimIn: Int, dimOut: Int,
              seed: String = "rp",
              vecCol: String = "embedding",
              outCol: String = "rp"): DataFrame = {
    val m = matrix(dimIn, dimOut, seed)
    val scale = math.sqrt(3.0 / dimOut)
    val comps: Seq[Column] = m.toSeq.map { row =>
      Similarity.dot(col(vecCol), typedLit(row.toSeq)) * lit(scale)
    }
    df.withColumn(outCol, array(comps: _*))
  }

  /** Shortlist-then-confirm top-k: rank `shortlist` candidates per
    * query by PROJECTED cosine (cheap: dimOut wide), then re-rank the
    * shortlist by exact cosine on the original vectors and keep `k`.
    * Both rank windows break ties by corpus id — fully deterministic.
    * Recall vs [[Similarity.bruteForceTopK]] is measured in
    * [[graft.tools.AnnRecall]]; at 100 TB the projected scan reads
    * dimOut/dimIn of the bytes and the exact re-rank touches only
    * |queries| x shortlist rows. */
  def projectedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                    shortlist: Int, dimIn: Int, dimOut: Int,
                    seed: String = "rp",
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pc = project(corpus, dimIn, dimOut, seed, vecCol, "pvec")
      .select(col(idCol).as("corpus_id"), col(vecCol).as("cvec"),
        col("pvec").as("pcvec"))
    val pq = project(queries, dimIn, dimOut, seed, vecCol, "pvec")
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        col("pvec").as("pqvec"))
    val short = pc.crossJoin(broadcast(pq))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("pcos", Similarity.cosine(col("pcvec"), col("pqvec")))
    val w1 = Window.partitionBy(col("query_id"))
      .orderBy(col("pcos").desc, col("corpus_id"))
    val confirmed = short.withColumn("prank", row_number().over(w1))
      .filter(col("prank") <= shortlist)
      .withColumn("cos", Similarity.cosine(col("cvec"), col("qvec")))
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id"))
    confirmed.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("rank"),
        round(col("cos"), 6).as("cos"))
  }
}
