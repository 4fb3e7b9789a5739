package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature hashing (the hashing trick): turn raw text into fixed-width
  * signed bag-of-words vectors with NO vocabulary pass — the classic
  * Vowpal-Wabbit/scikit HashingVectorizer shape. Gives the engine a
  * model-free way to MAKE vectors for its own similarity/ANN surface
  * (Similarity.scala consumes them after densification), not just
  * consume precomputed embeddings.
  *
  * Hashes are md5-derived (like the simhash kernel) so they are
  * engine-portable: DuckDB replays bucket and sign bit-for-bit, making
  * the output exactly oracle-checkable — the reason this does not use
  * xxhash64.
  *
  * Scale shape: token explode carries (id, bucket, sign) rows only; ONE
  * partial-agg shuffle on (id, bucket). No vocabulary state, no fit
  * pass, nothing driver-side — the property that makes the hashing
  * trick the 100 TB vectorizer.
  */
object FeatureHash {

  /** Sparse signed hashed term frequencies: (id, bucket, weight) rows,
    * bucket in [0, dim), weight = sum of per-token signs (exact
    * integers; cancelled-to-zero buckets are dropped — they carry no
    * information and sparse consumers treat absent as 0). */
  def hashedTf(df: DataFrame, idCol: String, textCol: String,
               dim: Int): DataFrame = {
    require(dim > 0, "hashedTf: dim must be positive")
    val toks = df.select(col(idCol).as("id"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("t"))
    val h = conv(substring(md5(col("t")), 1, 8), 16, 10).cast("long")
    val signEven =
      conv(substring(md5(col("t")), 9, 1), 16, 10).cast("int") % 2 === 0
    toks
      .select(col("id"), pmod(h, lit(dim)).cast("int").as("bucket"),
        when(signEven, lit(1L)).otherwise(lit(-1L)).as("sign"))
      .groupBy(col("id"), col("bucket"))
      .agg(sum(col("sign")).as("weight"))
      .filter(col("weight") =!= 0)
  }

  /** Densify [[hashedTf]] output into the (id, embedding) shape the
    * Similarity/ANN surface consumes: one Array[Float] of length `dim`
    * per id, absent buckets as 0. One groupBy(id) — the map lookup per
    * slot is in-plan column arithmetic (try_element_at: ANSI-safe on
    * missing keys). */
  def densify(sparse: DataFrame, dim: Int,
              idOut: String = "vec_id",
              vecOut: String = "embedding"): DataFrame =
    sparse.groupBy(col("id"))
      .agg(map_from_entries(
        collect_list(struct(col("bucket"), col("weight")))).as("m"))
      .select(col("id").as(idOut),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(try_element_at(col("m"), i), lit(0L)).cast("float"))
          .as(vecOut))
}
