package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard. Designed for the 100 TB case:
  *  - signatures are per-row Column expressions (no shuffle, codegen'd);
  *  - candidate generation only ever shuffles (band_hash) or
  *    (bucket) keys — never all-pairs;
  *  - verification joins happen per-bucket, so cost scales with true
  *    duplicate density, not corpus size squared.
  */
object Dedup {

  // ---- exact --------------------------------------------------------

  /** Exact dedup by content hash: one row per distinct normalized text,
    * keeping the smallest id (deterministic keeper). */
  def exact(df: DataFrame, idCol: String, textCol: String,
            normalize: Boolean = false): DataFrame = {
    val key = if (normalize) TextFunctions.fingerprint(col(textCol))
              else md5(col(textCol))
    df.withColumn("content_hash", key)
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))
  }

  // ---- MinHash + LSH ------------------------------------------------

  /** k minhash values per row from word-shingle sets: hash function i is
    * xxhash64 seeded with i (an extra hashed column). Avoids the affine-
    * permutation construction whose multiply overflows under ANSI mode.
    */
  def minhashSignature(textCol: Column, k: Int, shingleSize: Int = 3): Column = {
    val sh = array_distinct(TextFunctions.wordShingles(textCol, shingleSize))
    array((0 until k).map(i =>
      array_min(transform(sh, s => xxhash64(s, lit(i))))): _*)
  }

  /** LSH banding: split the signature into `bands` bands of
    * `rowsPerBand`, hash each band, emit (band_id, band_hash) keys. Docs
    * sharing any band key are candidates.
    */
  def withLshBands(df: DataFrame, sigCol: String, bands: Int,
                   rowsPerBand: Int): DataFrame = {
    df.withColumn("band",
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band_id"),
          xxhash64(array_join(
            transform(slice(col(sigCol), b * rowsPerBand + 1, lit(rowsPerBand)),
              _.cast("string")), ","))
            .as("band_hash")))))
      .withColumn("band_id", col("band.band_id"))
      .withColumn("band_hash", col("band.band_hash"))
      .drop("band")
  }

  /** Candidate near-duplicate pairs via MinHash LSH, verified with exact
    * shingle-set Jaccard. Output: (id_a, id_b, est_jaccard, jaccard).
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 32, bands: Int = 8, shingleSize: Int = 3,
                      minJaccard: Double = 0.5): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sig", minhashSignature(col("text"), k, shingleSize))
      .withColumn("shingles",
        array_distinct(TextFunctions.wordShingles(col("text"), shingleSize)))
    val banded = withLshBands(sigs, "sig", bands, k / bands)
      .select(col("id"), col("sig"), col("shingles"),
        col("band_id"), col("band_hash"))
    val a = banded.select(col("band_id"), col("band_hash"),
      col("id").as("id_a"), col("sig").as("sig_a"), col("shingles").as("sh_a"))
    val b = banded.select(col("band_id"), col("band_hash"),
      col("id").as("id_b"), col("sig").as("sig_b"), col("shingles").as("sh_b"))
    a.join(b, Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / size(col("sig_a")))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"),
        round(col("est_jaccard"), 4).as("est_jaccard"),
        round(col("jaccard"), 4).as("jaccard"))
  }

  // ---- SimHash ------------------------------------------------------

  /** 64-bit SimHash over word tokens: per-bit signed vote of token
    * hashes. Pure array expressions — one pass builds token hashes, then
    * 64 generated-code folds over that (~100-element) array.
    */
  def simhash64(textCol: Column): Column = {
    // shiftright/shiftleft with a Column shift amount need call_function
    // (the Scala DSL overloads only accept Int literals)
    def shr(v: Column, n: Column) = call_function("shiftright", v, n)
    def shl(v: Column, n: Column) = call_function("shiftleft", v, n)
    val hs = transform(TextFunctions.tokens(textCol), t => xxhash64(t))
    aggregate(
      transform(sequence(lit(0), lit(63)), i =>
        when(
          aggregate(hs, lit(0L), (acc, h) =>
            acc + when(shr(h, i.cast("int")).bitwiseAND(lit(1L)) === 1L,
              lit(1L)).otherwise(lit(-1L))) > 0,
          shl(lit(1L), i.cast("int"))).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: band the 64 bits into 4x16-bit blocks;
    * pairs sharing any block are candidates; verify hamming <= maxDist.
    * (Classic Charikar/Manku-Jain-Sarma blocking: any pair with <= 3
    * differing bits shares at least one of 4 blocks.)
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxDist: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sim"))
    val banded = sigs.withColumn("block",
      explode(transform(sequence(lit(0), lit(3)),
        b => struct(b.as("block_id"),
          call_function("shiftright", col("sim"), (b * 16).cast("int"))
            .bitwiseAND(lit(0xffffL)).as("block_bits")))))
      .select(col("id"), col("sim"),
        col("block.block_id").as("block_id"),
        col("block.block_bits").as("block_bits"))
    val a = banded.select(col("block_id"), col("block_bits"),
      col("id").as("id_a"), col("sim").as("sim_a"))
    val b = banded.select(col("block_id"), col("block_bits"),
      col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("block_id", "block_bits"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hammingDistance(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  // ---- n-gram Jaccard ----------------------------------------------

  /** Exact n-gram Jaccard similarity for pairs sharing a cheap blocking
    * key (any shared shingle among the `blockOn` rarest — here: any
    * shared shingle hash bucketed mod `blocks`). For corpora where exact
    * small-block verification is affordable.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, minJaccard: Double = 0.3,
                        maxBlockSize: Int = 1000): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      array_distinct(TextFunctions.wordShingles(col(textCol), n)).as("shingles"))
    // block by shingle hash; cap pathological blocks (stopword shingles)
    val blocked = sh.withColumn("shingle", explode(col("shingles")))
      .withColumn("block", xxhash64(col("shingle")))
    val smallBlocks = blocked.groupBy("block")
      .agg(count(lit(1)).as("bn")).filter(col("bn") <= maxBlockSize &&
        col("bn") >= 2)
    val cand = blocked.join(smallBlocks, "block")
    val a = cand.select(col("block"), col("id").as("id_a"),
      col("shingles").as("sh_a"))
    val b = cand.select(col("block"), col("id").as("id_b"),
      col("shingles").as("sh_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }
}
