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

  /** k minhash values from a PRE-MATERIALIZED shingle-hash array column
    * (one string-hash pass per row; hash function i re-mixes the 64-bit
    * values with xxhash64(h, i) — fixed-width, overflow-free).
    *
    * Materializing the hash array in its own projection matters: inlining
    * the whole chain would re-run tokenize+shingle+hash once per hash
    * function (no common-subexpression elimination across array
    * elements) — a 30x slowdown measured at sf0.1.
    */
  def minhashSignatureFromHashes(hashesCol: Column, k: Int): Column =
    array((0 until k).map(i =>
      array_min(transform(hashesCol, h => xxhash64(h, lit(i))))): _*)

  /** Distinct word-shingle xxhash64 array for a text column. */
  def shingleHashes(textCol: Column, shingleSize: Int): Column =
    transform(array_distinct(TextFunctions.wordShingles(textCol, shingleSize)),
      s => xxhash64(s))

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
    // persist the signature table: it feeds BOTH sides of the self-join
    // and the banding generator would otherwise re-inline (and so
    // recompute) the k-hash signature per band — the standard
    // sign-then-join LSH shape (at cluster scale this is a checkpointed
    // signature table)
    val sigs = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("shingles",
        array_distinct(TextFunctions.wordShingles(col("text"), shingleSize)))
      .withColumn("hs", transform(col("shingles"), s => xxhash64(s)))
      .withColumn("sig", minhashSignatureFromHashes(col("hs"), k))
      .drop("hs", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
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

  /** 64-bit SimHash from a PRE-MATERIALIZED token-hash array column:
    * per-bit signed vote, 64 generated-code folds over the (bound,
    * evaluated-once) array. Pass `simhashTokenHashes` as the column.
    */
  def simhashFromHashes(hashesCol: Column): Column = {
    // shiftright/shiftleft with a Column shift amount need call_function
    // (the Scala DSL overloads only accept Int literals)
    def shr(v: Column, n: Column) = call_function("shiftright", v, n)
    def shl(v: Column, n: Column) = call_function("shiftleft", v, n)
    aggregate(
      transform(sequence(lit(0), lit(63)), i =>
        when(
          aggregate(hashesCol, lit(0L), (acc, h) =>
            acc + when(shr(h, i.cast("int")).bitwiseAND(lit(1L)) === 1L,
              lit(1L)).otherwise(lit(-1L))) > 0,
          shl(lit(1L), i.cast("int"))).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  def simhashTokenHashes(textCol: Column): Column =
    transform(TextFunctions.tokens(textCol), t => xxhash64(t))

  /** Convenience single-expression form (fine for small frames; prefer
    * materializing `simhashTokenHashes` in its own projection first). */
  def simhash64(textCol: Column): Column =
    simhashFromHashes(simhashTokenHashes(textCol))

  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: band the 64 bits into 4x16-bit blocks;
    * pairs sharing any block are candidates; verify hamming <= maxDist.
    * (Classic Charikar/Manku-Jain-Sarma blocking: any pair with <= 3
    * differing bits shares at least one of 4 blocks.)
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxDist: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"),
      simhashTokenHashes(col(textCol)).as("hs"))
      .select(col("id"), simhashFromHashes(col("hs")).as("sim"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
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
