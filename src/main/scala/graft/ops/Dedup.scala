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

  /** The call every real corpus pipeline makes: the input ROWS with
    * exact duplicates dropped — one surviving row (the smallest id) per
    * distinct (optionally normalized) content. [[exact]] reports groups;
    * this returns rows. The keeper-id set re-attaches as a left-semi
    * join on the id column, so payload columns never ride a shuffle —
    * at corpus scale the semi-join side is one id per distinct document.
    */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String,
                          normalize: Boolean = false): DataFrame =
    df.join(exact(df, idCol, textCol, normalize)
      .select(col("keeper_id").as(idCol)), Seq(idCol), "left_semi")

  /** Near-duplicate twin: given the PAIR output of any near-dup
    * detector ([[minhashNearDups]], [[simhashNearDups]],
    * [[ngramJaccardPairs]], embedding cosine), keep one row per
    * duplicate cluster (the minimum id) plus every unpaired row.
    * Clusters come from [[clusterDuplicates]]; the losers — each
    * cluster's non-minimum members — anti-join against the corpus by
    * id, so payloads never shuffle and the anti side is |duplicates|,
    * not |corpus|. */
  def dropNearDuplicates(df: DataFrame, idCol: String, pairs: DataFrame,
                         idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    val losers = clusterDuplicates(pairs, idA, idB)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Quality-aware near-dedup: keep the BEST member of each duplicate
    * cluster by an explicit score, not the first-seen id — what
    * production pipelines actually do (keep the longest / highest-
    * quality / preferred-source copy; e.g. CCNet keeps by source order,
    * RefinedWeb by quality). `score` is any Column over `df`'s columns;
    * ties break to the lowest id so the keeper is deterministic.
    *
    * Shape (the same payload discipline as [[dropNearDuplicates]]):
    * unpaired rows always survive, so only the PAIRED ids are scored —
    * the cluster label table (|duplicates| rows, broadcastable)
    * inner-joins the corpus, the score projects down to
    * (id, cluster_id, score) BEFORE the keeper window, and each
    * cluster's non-winners anti-join back against the corpus by id.
    * Payload columns never ride a shuffle; the window partitions are
    * duplicate-group-sized. */
  def keepBestPerCluster(df: DataFrame, idCol: String, pairs: DataFrame,
                         score: Column,
                         idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    val clusters = clusterDuplicates(pairs, idA, idB)
      .withColumnRenamed("id", idCol)
    val scored = df.join(clusters, Seq(idCol))
      .withColumn("graft_score", score)
      .select(col(idCol), col("cluster_id"), col("graft_score"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("graft_score").desc, col(idCol))
    val losers = scored.withColumn("graft_keep_rn", row_number().over(w))
      .filter(col("graft_keep_rn") =!= 1)
      .select(col(idCol))
    df.join(losers, Seq(idCol), "left_anti")
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
    *
    * Runs through the native one-pass [[graft.functions.MinhashSigExpr]]
    * kernel (bit-identical to the k-pass
    * `array_min(transform(.., xxhash64(h, i)))` column form — pinned by
    * GraftFunctionsSpec).
    */
  def minhashSignatureFromHashes(hashesCol: Column, k: Int): Column =
    graft.functions.MinhashSigExpr(hashesCol, k)

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

  /** MinHash signatures via explode + hash aggregation: one row per
    * (doc, distinct shingle), then k `min(xxhash64(h, i))` aggregates.
    *
    * This beats the per-row array-fold form (`transform` + `array_min`
    * k times) on BOTH axes that matter at scale: Spark's higher-order
    * array functions are CodegenFallback (every lambda application is
    * an interpreted Expression.eval), while min-aggregates run inside
    * whole-stage codegen; and the shuffle carries only map-side-combined
    * k-long partials per doc, so cost is one codegen pass over the
    * exploded shingles regardless of k.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        k: Int, shingleSize: Int): DataFrame =
    minhashSignaturesFromShingles(
      df.select(col(idCol).as("id"), array_distinct(
        TextFunctions.wordShingles(col(textCol), shingleSize)).as("shingles")), k)

  /** Same, from a pre-shingled (id, shingles) frame — callers that also
    * need the shingle arrays (verification) compute them ONCE and pass
    * them here: wordShingles is a higher-order-function chain
    * (interpreted per element), so a second evaluation pass is the
    * dominant cost at corpus scale. */
  def minhashSignaturesFromShingles(shingled: DataFrame, k: Int): DataFrame = {
    val exploded = shingled
      .select(col("id"), explode(col("shingles")).as("sh"))
      .withColumn("h", xxhash64(col("sh")))
    exploded.groupBy(col("id"))
      .agg(min(xxhash64(col("h"), lit(0))).as("m_0"),
        (1 until k).map(i => min(xxhash64(col("h"), lit(i))).as(s"m_$i")): _*)
      .select(col("id"), array((0 until k).map(i => col(s"m_$i")): _*).as("sig"))
  }

  /** Candidate near-duplicate pairs via MinHash LSH, verified with exact
    * shingle-set Jaccard. Output: (id_a, id_b, est_jaccard, jaccard).
    *
    * Skew defenses for boilerplate-heavy corpora (the 100 TB failure
    * mode — web nav chrome producing million-row band buckets):
    *  - identical full signatures collapse to ONE representative before
    *    banding (exact-signature groups share every band, so the band
    *    self-join runs over representatives; pairs expand back from the
    *    group membership afterwards — output-identical, and the
    *    dominant exact/near-exact mass leaves the quadratic join). The
    *    collapse engages ADAPTIVELY: a one-pass sketch over the
    *    signature table estimates duplicate-signature mass, and a
    *    clean corpus (the normal case after exact dedup) keeps the
    *    cheaper direct band self-join — same output either way;
    *  - `maxBucket > 0` caps BOTH the members kept per signature group
    *    and the representatives kept per (band_id, band_hash) bucket
    *    (deterministic: lowest ids survive), bounding any single
    *    bucket's join work at maxBucket². Capping drops candidates, so
    *    it is off by default and NEVER silent: use
    *    [[minhashNearDupsWithDrops]] to read the per-cap drop counts
    *    (the `ngramJaccardPairs` no-silent-caps discipline).
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 32, bands: Int = 8, shingleSize: Int = 3,
                      minJaccard: Double = 0.5, maxBucket: Int = 0): DataFrame =
    minhashNearDupsWithDrops(df, idCol, textCol, k, bands, shingleSize,
      minJaccard, maxBucket)._1

  /** [[minhashNearDups]] plus its cap-drop audit frame: one row per cap
    * site — ("group", signature-group hash) for members sliced off an
    * exact-signature group, ("bucket", band-bucket hash) for
    * representatives dropped from an over-full band bucket — with the
    * dropped count. Empty when `maxBucket` is 0 (uncapped) or nothing
    * exceeded the cap. The audit shares the persisted signature/group
    * tables with the pair plan, so counting it costs one small scan.
    *
    * EAGER at call time when `maxBucket == 0`: the adaptive plan
    * choice runs one sketch aggregate over the signature table (a
    * Spark job that materializes the shingle/signature persists)
    * before returning — the cost class of one corpus scan, paid even
    * if the caller never consumes the result. With `maxBucket > 0`
    * the collapse is unconditional and the call is pure plan
    * construction. */
  def minhashNearDupsWithDrops(df: DataFrame, idCol: String, textCol: String,
                               k: Int = 32, bands: Int = 8,
                               shingleSize: Int = 3, minJaccard: Double = 0.5,
                               maxBucket: Int = 0): (DataFrame, DataFrame) = {
    // shingle ONCE and persist: the arrays feed the signature explode
    // AND the verify stage, and wordShingles is an interpreted
    // higher-order chain — recomputing it was the dominant cost here
    val shingled = df.select(col(idCol).as("id"),
      array_distinct(TextFunctions.wordShingles(col(textCol), shingleSize))
        .as("shingles"))
      .transform(CacheRegistry.persist)
    // persist the signature table too: it feeds BOTH sides of the
    // band self-join and the verify joins — the standard sign-then-join
    // LSH shape (at cluster scale this is a checkpointed signature table)
    val sigs = minhashSignaturesFromShingles(shingled, k)
      .join(shingled, "id")
      .transform(CacheRegistry.persist)
    // ADAPTIVE plan choice (the AQE discipline, one level up): the
    // signature-collapse plan below defends against boilerplate skew
    // but costs one extra corpus exchange + expansion joins — pure
    // overhead on a corpus whose signatures are (near-)all distinct,
    // which is the normal case AFTER exact dedup (measured: +3-4 s
    // wall on curate_crawl_e2e at sf0.1 for zero avoided work). One
    // single-pass sketch aggregate over the cached signature table
    // estimates the duplicate-signature mass; the collapse engages
    // when that mass is large enough to matter ABSOLUTELY (a 2000-row
    // group would put ~4M rows in each of its band buckets) or as a
    // FRACTION (boilerplate-heavy corpus), and always when a cap is
    // requested (cap semantics are defined on the collapsed plan).
    // Decision errs toward collapsing: HLL ±2% on a large corpus
    // overstates dup mass far more often than it hides a 2000-row
    // group. Outputs of the two plans are identical (oracle-pinned).
    val collapse = maxBucket > 0 || {
      val r = sigs.agg(count(lit(1)).as("n"),
        approx_count_distinct(xxhash64(col("sig")), 0.02).as("d")).head()
      val n = r.getLong(0)
      val dupMass = math.max(0L, n - r.getLong(1))
      dupMass >= 2000L || (n > 0 && dupMass.toDouble / n >= 0.01)
    }
    val (pairs, drops) =
      if (collapse) collapsedPairs(sigs, k, bands, maxBucket)
      else {
        // direct banding: every id into its 8 band buckets, one
        // self-join — the cheapest plan when buckets stay small
        val banded = withLshBands(sigs.select(col("id"), col("sig")),
          "sig", bands, k / bands)
          .select(col("id"), col("band_id"), col("band_hash"))
        val a = banded.select(col("band_id"), col("band_hash"),
          col("id").as("id_a"))
        val b = banded.select(col("band_id"), col("band_hash"),
          col("id").as("id_b"))
        (a.join(b, Seq("band_id", "band_hash"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"))
          .dropDuplicates("id_a", "id_b"),
          emptyDrops(sigs))
      }
    // the verified pair frame is PERSISTED (pair-count-sized): the
    // batch consumers (dropNearDuplicates, keepBestPerCluster,
    // clusterDuplicates, the leakage-safe split) all reference it more
    // than once — clusterDuplicates alone evaluates it twice for the
    // two edge directions
    (CacheRegistry.persist(pairs
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a"),
        col("shingles").as("sh_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b"),
        col("shingles").as("sh_b")), "id_b")
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
        round(col("jaccard"), 4).as("jaccard"))),
      drops)
  }

  private def emptyDrops(any: DataFrame): DataFrame =
    any.sparkSession.emptyDataFrame
      .withColumn("cap_site", lit("")).withColumn("cap_key", lit(0L))
      .withColumn("n_dropped", lit(0L)).limit(0)

  /** The skew-proof candidate plan of [[minhashNearDupsWithDrops]]:
    * collapse identical signatures to one representative before
    * banding, enumerate within-group pairs from membership, cap group
    * membership and band buckets when `maxBucket > 0`. Returns
    * (candidate pairs, cap-drop audit frame). */
  private def collapsedPairs(sigs: DataFrame, k: Int, bands: Int,
                             maxBucket: Int): (DataFrame, DataFrame) = {
    // collapse identical signatures: exact/near-exact duplicates (the
    // boilerplate mass) agree on ALL k components, so banding each copy
    // would put the whole group in every one of its band buckets —
    // quadratic join work for pairs we can enumerate from membership.
    // Groups are (signature -> min-id representative, sorted members);
    // the group shuffle keys on the k-long signature array itself.
    //
    // The cap slices BEFORE collecting: a row_number over (sig, id)
    // ranks members and only rank <= maxBucket rows enter the
    // collect_list, so a pathological group (10^8 identical-signature
    // docs) never materializes a group-sized array row — the window
    // streams/spills row-wise where a post-collect slice would first
    // build the multi-GB array it was about to trim. The window's
    // sig-hash exchange is the same exchange the groupBy needs, so the
    // capped plan pays no extra shuffle; drop counts stay exact
    // (count(*) - maxBucket) without ever holding the dropped ids.
    val groups = CacheRegistry.persist(
      if (maxBucket > 0)
        sigs.select(col("id"), col("sig"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("sig")).orderBy(col("id"))))
          .groupBy(col("sig"))
          .agg(min(col("id")).as("rep"),
            sort_array(collect_list(
              when(col("rn") <= maxBucket, col("id")))).as("kept"),
            greatest(count(lit(1)) - maxBucket, lit(0L))
              .cast("int").as("grp_dropped"))
      else
        sigs.select(col("id"), col("sig"))
          .groupBy(col("sig"))
          .agg(min(col("id")).as("rep"),
            sort_array(collect_list(col("id"))).as("kept"),
            lit(0).as("grp_dropped")))
    // within-group pairs: same signature => collision in every band, no
    // join needed — enumerate directly from the (capped) membership
    val within = groups.select(col("kept"))
      .filter(size(col("kept")) > 1)
      .select(explode(col("kept")).as("id_a"), col("kept"))
      .select(col("id_a"), explode(col("kept")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
    // cross-group candidates: band the representatives only — candidate
    // generation shuffles ONLY (band keys, id); signature and shingle
    // payloads re-attach by id AFTER the pair set is deduplicated
    val banded = withLshBands(groups.select(col("rep").as("id"), col("sig")),
      "sig", bands, k / bands)
      .select(col("id"), col("band_id"), col("band_hash"))
      .transform(b => if (maxBucket > 0) CacheRegistry.persist(b) else b)
    val capped =
      if (maxBucket > 0)
        banded.withColumn("rn", row_number().over(
          Window.partitionBy(col("band_id"), col("band_hash"))
            .orderBy(col("id"))))
          .filter(col("rn") <= maxBucket).drop("rn")
      else banded
    val a = capped.select(col("band_id"), col("band_hash"), col("id").as("id_a"))
    val b = capped.select(col("band_id"), col("band_hash"), col("id").as("id_b"))
    val repPairs = a.join(b, Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    // expand representative pairs back to member pairs (each doc lives
    // in exactly one signature group, so expansion introduces no
    // duplicates; least/greatest restores id_a < id_b ordering)
    val cross = repPairs
      .join(groups.select(col("rep").as("id_a"), col("kept").as("ms_a")), "id_a")
      .join(groups.select(col("rep").as("id_b"), col("kept").as("ms_b")), "id_b")
      .select(explode(col("ms_a")).as("ma"), col("ms_b"))
      .select(col("ma"), explode(col("ms_b")).as("mb"))
      .select(least(col("ma"), col("mb")).as("id_a"),
        greatest(col("ma"), col("mb")).as("id_b"))
    // no dedup exchange needed: every doc lives in exactly ONE
    // signature group, so an unordered pair arises under exactly one
    // rep pair (already deduplicated) or exactly once inside `within`,
    // and the two branches are disjoint by construction
    val pairs = within.unionByName(cross)
    val drops =
      if (maxBucket == 0) emptyDrops(groups)
      else {
        val grpDrops = groups.filter(col("grp_dropped") > 0)
          .select(lit("group").as("cap_site"),
            xxhash64(col("sig")).as("cap_key"),
            col("grp_dropped").cast("long").as("n_dropped"))
        val bucketDrops = banded
          .groupBy(col("band_id"), col("band_hash"))
          .agg((count(lit(1)) - maxBucket).as("n_dropped"))
          .filter(col("n_dropped") > 0)
          .select(lit("bucket").as("cap_site"),
            xxhash64(col("band_id"), col("band_hash")).as("cap_key"),
            col("n_dropped"))
        grpDrops.unionByName(bucketDrops)
      }
    (pairs, drops)
  }

  /** MinHash signature estimate of Jaccard: fraction of equal
    * signature components. */
  private def estJaccardSig(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / size(a)

  /** The probe-able MinHash index of a corpus: `(sigs, bands)` =
    * ((id, sig), (id, band_id, band_hash)). Build once, persist/store,
    * probe many times — the incremental-dedup analog of the ANN
    * build/query split ([[graft.ops.Similarity.buildIvfIndex]]); the
    * streaming curator ([[graft.streaming.CorpusStreamIngest]])
    * accumulates exactly these two tables as its history state. */
  def buildMinhashIndex(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 32, bands: Int = 8,
                        shingleSize: Int = 3): (DataFrame, DataFrame) = {
    val sigs = minhashSignatures(df, idCol, textCol, k, shingleSize)
    val banded = withLshBands(sigs, "sig", bands, k / bands)
      .select(col("id"), col("band_id"), col("band_hash"))
    (sigs, banded)
  }

  /** Ids of `incoming` documents that near-duplicate the indexed
    * history: any-band LSH collision confirmed by the signature
    * Jaccard estimate (the standard online-LSH rule — exact shingle
    * verification would require retaining history shingle sets).
    *
    * Scale shape: the collision join keys on (band_id, band_hash) and
    * carries ids only; the confirm joins attach signatures per
    * CANDIDATE (collision-count-sized, not corpus-sized). History text
    * is never touched. At cluster scale store the band index bucketed
    * on the band key for shuffle-free probes. */
  def nearDupsAgainstIndex(inSigs: DataFrame, inBands: DataFrame,
                           histSigs: DataFrame, histBands: DataFrame,
                           minEstJaccard: Double = 0.5): DataFrame = {
    val cand = inBands
      .join(histBands
        .select(col("id").as("hist_id"), col("band_id"), col("band_hash")),
        Seq("band_id", "band_hash"))
      .select(col("id"), col("hist_id")).distinct()
    cand
      .join(inSigs, "id")
      .join(histSigs.select(col("id").as("hist_id"),
        col("sig").as("hist_sig")), "hist_id")
      .filter(estJaccardSig(col("sig"), col("hist_sig")) >= minEstJaccard)
      .select(col("id")).distinct()
  }

  /** The batch cross-corpus near-dedup call ("keep only what crawl N
    * adds over crawls 1..N-1"): rows of `incoming` that are NOT
    * near-duplicates of any `history` document. Builds both indexes in
    * place; callers probing one history repeatedly should
    * [[buildMinhashIndex]] it once, store the two tables, and use
    * [[nearDupsAgainstIndex]] directly (the streaming curator's shape).
    */
  def nearNovelAgainstHistory(incoming: DataFrame, idCol: String,
                              textCol: String, history: DataFrame,
                              k: Int = 32, bands: Int = 8,
                              shingleSize: Int = 3,
                              minEstJaccard: Double = 0.5): DataFrame = {
    val (inSigs0, inBands) =
      buildMinhashIndex(incoming, idCol, textCol, k, bands, shingleSize)
    val inSigs = CacheRegistry.persist(inSigs0)
    val (hSigs0, hBands) =
      buildMinhashIndex(history, idCol, textCol, k, bands, shingleSize)
    val hSigs = CacheRegistry.persist(hSigs0)
    val dups = nearDupsAgainstIndex(inSigs, inBands, hSigs, hBands,
      minEstJaccard)
    incoming.join(dups.withColumnRenamed("id", idCol), Seq(idCol),
      "left_anti")
  }

  // ---- SimHash ------------------------------------------------------

  /** SimHash width: 60 bits — the first 15 hex chars of md5(token)
    * ([[simhashTokenHashes]]). md5 rather than xxhash64 so the hash is
    * ENGINE-PORTABLE: DuckDB (the correctness oracle) replays the
    * signatures bit-exactly, which xxhash64 cannot (no DuckDB twin —
    * this op was the one rows-only dedup entry until round 4). 15 hex
    * chars because 16 would overflow a signed long. md5 costs ~2x
    * xxhash64 per token; swap the one line in [[simhashTokenHashes]] if
    * portability ever stops mattering. */
  val SimhashBits = 60

  /** SimHash from a PRE-MATERIALIZED token-hash array column:
    * per-bit signed vote, [[SimhashBits]] generated-code folds over the
    * (bound, evaluated-once) array. Pass `simhashTokenHashes` as the
    * column.
    */
  def simhashFromHashes(hashesCol: Column): Column = {
    // shiftright/shiftleft with a Column shift amount need call_function
    // (the Scala DSL overloads only accept Int literals)
    def shr(v: Column, n: Column) = call_function("shiftright", v, n)
    def shl(v: Column, n: Column) = call_function("shiftleft", v, n)
    aggregate(
      transform(sequence(lit(0), lit(SimhashBits - 1)), i =>
        when(
          aggregate(hashesCol, lit(0L), (acc, h) =>
            acc + when(shr(h, i.cast("int")).bitwiseAND(lit(1L)) === 1L,
              lit(1L)).otherwise(lit(-1L))) > 0,
          shl(lit(1L), i.cast("int"))).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** 60-bit engine-portable token hash: first 15 hex chars of
    * md5(token), base-16 decoded (see [[SimhashBits]]). */
  def simhashTokenHashes(textCol: Column): Column =
    transform(TextFunctions.tokens(textCol), t =>
      conv(substring(md5(t), 1, 15), 16, 10).cast("long"))

  /** Convenience single-expression form (fine for small frames; prefer
    * materializing `simhashTokenHashes` in its own projection first). */
  def simhash64(textCol: Column): Column =
    simhashFromHashes(simhashTokenHashes(textCol))

  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exploded (id, token hash) rows: tokens explode FIRST and the hash
    * runs on the plain column (codegen'd; hashing inside a transform()
    * lambda is a CodegenFallback higher-order call — interpreted,
    * measured ~2x the CPU). The hash itself is the native
    * [[graft.functions.Md5Prefix60Expr]] — value-identical to the
    * `conv(substring(md5(tok),1,15),16,10)` chain the oracle replays,
    * minus that chain's three per-token string materializations
    * (simhash was the engine's most CPU-dense text op; the chain is
    * kept in [[simhashTokenHashes]] as the differential twin).
    * explode_outer keeps empty docs as one NULL-hash row. */
  private def explodedTokenHashes(df: DataFrame, idCol: String,
                                  textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      explode_outer(TextFunctions.tokens(col(textCol))).as("tok"))
      .select(col("id"),
        graft.functions.Md5Prefix60Expr(col("tok")).as("h"))

  /** SimHash signatures: explode + ONE custom vote aggregate
    * ([[graft.functions.SimhashVotesAgg]] — all [[SimhashBits]] per-bit
    * counters in a single typed buffer, vs 60 separate sum() columns).
    * A NULL hash (empty doc) votes -1 on every bit, so sim = 0.
    */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    explodedTokenHashes(df, idCol, textCol)
      .groupBy(col("id"))
      .agg(graft.functions.SimhashVotesAgg(col("h"), SimhashBits).as("sim"))

  /** The original 60-sum-column formulation — retained as the
    * differential-test reference for [[simhashSignatures]]. */
  def simhashSignaturesColumnForm(df: DataFrame, idCol: String,
                                  textCol: String): DataFrame = {
    val exploded = explodedTokenHashes(df, idCol, textCol)
    val votes = exploded.groupBy(col("id"))
      .agg(sum(when(shiftright(col("h"), 0).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as("b_0"),
        (1 until SimhashBits).map(i =>
          sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1L)
            .otherwise(-1L)).as(s"b_$i")): _*)
    val sim = (0 until SimhashBits).map(i =>
      when(col(s"b_$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)): Column)
      .reduce((a, b) => a.bitwiseOR(b))
    votes.select(col("id"), sim.as("sim"))
  }

  /** SimHash near-dup pairs: band the 60 bits into 4x15-bit blocks;
    * pairs sharing any block are candidates; verify hamming <= maxDist.
    * (Classic Charikar/Manku-Jain-Sarma blocking: any pair with <= 3
    * differing bits shares at least one of 4 blocks.)
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxDist: Int = 3): DataFrame = {
    val blockBits = SimhashBits / 4
    val sigs = CacheRegistry.persist(simhashSignatures(df, idCol, textCol))
    val banded = sigs.withColumn("block",
      explode(transform(sequence(lit(0), lit(3)),
        b => struct(b.as("block_id"),
          call_function("shiftright", col("sim"), (b * blockBits).cast("int"))
            .bitwiseAND(lit((1L << blockBits) - 1)).as("block_bits")))))
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
    // persisted: feeds the blocking explode AND both verify-stage joins
    val sh = df.select(col(idCol).as("id"),
      array_distinct(TextFunctions.wordShingles(col(textCol), n)).as("shingles"))
      .transform(CacheRegistry.persist)
    // block by shingle hash; cap pathological blocks (stopword shingles).
    // Candidates carry ONLY (block, id): shingle arrays re-attach by id
    // after pair dedup instead of riding the block self-join duplicated
    // once per colliding pair.
    val blocked = sh.select(col("id"), explode(col("shingles")).as("shingle"))
      .withColumn("block", xxhash64(col("shingle")))
      .select(col("block"), col("id"))
    val smallBlocks = blocked.groupBy("block")
      .agg(count(lit(1)).as("bn")).filter(col("bn") <= maxBlockSize &&
        col("bn") >= 2)
    val cand = blocked.join(smallBlocks, "block")
    val a = cand.select(col("block"), col("id").as("id_a"))
    val b = cand.select(col("block"), col("id").as("id_b"))
    val pairs = a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    pairs
      .join(sh.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  // ---- incremental (bloom-gated) dedup -------------------------------

  /** Serialized Bloom filter over the 64-bit content hashes of a text
    * column — the persistable novelty index for [[novelAgainstHistory]].
    * Built with the distributed sketch aggregate (map-side partial
    * filters OR-merged on the driver), so the history corpus is scanned
    * once and never shuffled. Size it honestly: bits ≈ 1.44 · n ·
    * log2(1/fpp), i.e. ~1.2 GB for 10^9 documents at 1% — a real but
    * broadcastable object, the point of the pattern. */
  def contentBloom(df: DataFrame, textCol: String,
                   expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    val bf = df.select(xxhash64(col(textCol)).as("h64"))
      .stat.bloomFilter("h64", expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Codegen'd membership probe against a [[contentBloom]] byte image —
    * Spark's own runtime-filter expression (the one AQE injects for
    * shuffle pruning), constructed directly: the filter bytes ride the
    * plan as a binary literal and deserialize once per executor. `value`
    * must be the same hash the bloom was built from (xxhash64 long). */
  def bloomMightContain(bloomBytes: Array[Byte], value: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(BloomFilterMightContain(
      Literal(bloomBytes, org.apache.spark.sql.types.BinaryType),
      GraftColumnBridge.expression(value)))
  }

  /** Incremental exact dedup — the daily-increment shape of
    * [[dropExactDuplicates]]: the rows of `incoming` whose content does
    * NOT already occur in `history`, decided exactly. A Bloom filter
    * over the history hashes (built here, or pass a persisted
    * [[contentBloom]] image) gates the expensive check: no-false-
    * negatives means a bloom miss is DEFINITELY novel and skips the
    * join entirely, so only true duplicates plus an `fpp` sliver of
    * novel rows are ever confirmed against history.
    *
    * Scale shape: history is scanned (hash columns only), never
    * shuffled — with `broadcastCandidates` (default) the confirm step
    * is two broadcast joins: candidate keys broadcast to semi-join
    * history (emitting only the keys that really are duplicates), and
    * that duplicate-key set broadcasts back to anti-join the
    * candidates. Incoming payload columns never ride a shuffle either
    * way. Set `broadcastCandidates = false` if the increment is
    * mostly duplicates (candidate keys no longer executor-memory-sized)
    * — the confirm becomes one shuffled anti-join on (hash, id).
    * Output: the novel incoming rows plus their `content_hash`.
    */
  def novelAgainstHistory(incoming: DataFrame, idCol: String, textCol: String,
                          history: DataFrame, historyTextCol: String,
                          expectedItems: Long, fpp: Double = 0.01,
                          bloom: Option[Array[Byte]] = None,
                          broadcastCandidates: Boolean = true): DataFrame = {
    val bytes = bloom.getOrElse(
      contentBloom(history, historyTextCol, expectedItems, fpp))
    val keyed = incoming.withColumn("content_hash", md5(col(textCol)))
    val might = bloomMightContain(bytes, xxhash64(col(textCol)))
    val sureNovel = keyed.filter(!might)
    val candidates = keyed.filter(might)
    val histKeys = history.select(md5(col(historyTextCol)).as("content_hash"))
    val novelCandidates =
      if (broadcastCandidates) {
        val candKeys = candidates.select(col("content_hash")).distinct()
        val dupKeys = histKeys
          .join(broadcast(candKeys), Seq("content_hash"), "left_semi")
          .distinct()
        candidates.join(broadcast(dupKeys), Seq("content_hash"), "left_anti")
      } else {
        candidates.join(histKeys, Seq("content_hash"), "left_anti")
      }
    sureNovel.unionByName(novelCandidates)
  }

  // ---- benchmark decontamination -------------------------------------

  /** Flag corpus documents sharing at least `minShared` distinct word
    * n-grams with ANY benchmark document — the standard pre-training
    * hygiene step (the GPT-3-appendix-C / PaLM-style n-gram overlap
    * filter) that keeps eval sets out of the training corpus.
    *
    * Scale shape: the benchmark side collapses to a DISTINCT shingle
    * set and is broadcast (eval suites are MBs next to a training
    * corpus; the hint matters — a 250k-string shingle set already
    * exceeds the AQE auto-broadcast threshold, and the fallback
    * sort-merge join sorts the full corpus shingle stream: measured 10x
    * the wall time). The corpus side explodes to (shingle, id) pairs
    * carrying nothing else, and only matching pairs survive. No
    * all-pairs work anywhere. Output: (id, n_shared) for flagged
    * documents — anti-join the ids against the corpus to drop them.
    * Set `broadcastBenchmark = false` only if the benchmark set is too
    * big for executor memory (then the shuffle join is the right plan).
    */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
                    benchmark: DataFrame, benchTextCol: String,
                    n: Int = 5, minShared: Int = 1,
                    broadcastBenchmark: Boolean = true): DataFrame = {
    val corpusSh = corpus.select(col(idCol).as("id"),
      explode(array_distinct(TextFunctions.wordShingles(col(textCol), n)))
        .as("sh"))
    val benchSh = benchmark.select(
      explode(array_distinct(TextFunctions.wordShingles(col(benchTextCol), n)))
        .as("sh"))
      .distinct()
    corpusSh.join(
      if (broadcastBenchmark) broadcast(benchSh) else benchSh, "sh")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Per-document contamination SCORE — the graded companion to
    * [[decontaminate]]'s boolean gate: the fraction of a document's
    * DISTINCT word n-grams that also occur anywhere in the benchmark
    * set. Pipelines threshold this ("drop above 10% overlap, audit
    * 1-10%") rather than dropping on a single shared shingle.
    * Returns one row per corpus document: (id, n_shingles,
    * n_contaminated, contamination) — zero-overlap docs included.
    *
    * Scale shape: identical to [[decontaminate]] — benchmark collapses
    * to a broadcast distinct-shingle set; the corpus side explodes to
    * (id, shingle) pairs; the per-doc denominator rides the exploded
    * rows as one int column so no second pass over the text is needed.
    */
  def contaminationScore(corpus: DataFrame, idCol: String, textCol: String,
                         benchmark: DataFrame, benchTextCol: String,
                         n: Int = 5,
                         broadcastBenchmark: Boolean = true): DataFrame = {
    val docSh = corpus.select(col(idCol).as("id"),
      array_distinct(TextFunctions.wordShingles(col(textCol), n))
        .as("shingles"))
    val exploded = docSh.select(col("id"), size(col("shingles"))
      .as("n_shingles"), explode(col("shingles")).as("sh"))
    val benchSh = benchmark.select(
      explode(array_distinct(TextFunctions.wordShingles(col(benchTextCol), n)))
        .as("sh"))
      .distinct()
    exploded.join(
        if (broadcastBenchmark) broadcast(benchSh) else benchSh,
        Seq("sh"), "left_semi")
      .groupBy(col("id"), col("n_shingles"))
      .agg(count(lit(1)).as("n_contaminated"))
      // re-attach zero-hit docs (one row per doc on both sides)
      .join(docSh.select(col("id"), size(col("shingles")).as("n_shingles")),
        Seq("id", "n_shingles"), "right")
      .select(col("id"), col("n_shingles"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        round(coalesce(col("n_contaminated"), lit(0L)).cast("double") /
          greatest(col("n_shingles"), lit(1)).cast("double"), 4)
          .as("contamination"))
  }

  // ---- paragraph-level dedup -----------------------------------------

  /** Paragraph-level exact dedup (the CCNet / MassiveText line-dedup
    * step): split each document on `sep`, keep only the GLOBALLY first
    * occurrence of every distinct paragraph — first by document id,
    * then by position within the document — and reassemble each
    * document from its surviving paragraphs in original order. Kills
    * boilerplate (headers, footers, cookie banners) that document-level
    * dedup can't see because the surrounding text differs.
    *
    * Returns one row per input document:
    * (id, n_paras, n_kept, text_deduped) — `text_deduped` is NULL when
    * every paragraph of the document occurred earlier elsewhere.
    *
    * Scale shape: two keyed shuffles of paragraph-level rows and
    * nothing else — a window partitioned BY PARAGRAPH HASH (groups =
    * duplicate sets, overwhelmingly tiny; never a global window) picks
    * the first occurrence, then a groupBy(id) reassembles. No
    * all-pairs joins; payload rides as one paragraph string per row.
    */
  def dedupParagraphs(df: DataFrame, idCol: String, textCol: String,
                      sep: String = "\n"): DataFrame = {
    val paras = df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), sep)).as(Seq("para_idx", "para")))
      .filter(length(trim(col("para"))) > 0)
    val w = Window.partitionBy(md5(col("para")))
      .orderBy(col("id"), col("para_idx"))
    paras.withColumn("rn", row_number().over(w))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_paras"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        array_sort(collect_list(when(col("rn") === 1,
          struct(col("para_idx"), col("para"))))).as("kept"))
      .select(col("id"), col("n_paras"), col("n_kept"),
        when(col("n_kept") > 0,
          array_join(transform(col("kept"), k => k.getField("para")), sep))
          .as("text_deduped"))
  }

  /** Repeated-SPAN removal — the ExactSubstr dedup of "Deduplicating
    * Training Data Makes Language Models Better" (Lee et al. 2022),
    * reformulated for a distributed engine: any token span of length ≥
    * `k` that occurs more than once in the corpus survives only at its
    * globally-first occurrence (by document id, then position); every
    * later occurrence is cut out of its document, within-document
    * repeats included. Document-level dedup can't see these — a page
    * that quotes a duplicated paragraph keeps its unique text and loses
    * just the quote.
    *
    * Formulation: a maximal duplicated span of length L ≥ k is exactly
    * the union of its L-k+1 duplicated k-grams, so flagging non-first
    * k-gram occurrences and removing the token positions they cover
    * removes precisely the spans the suffix-array formulation finds.
    * Documents shorter than `k` tokens never flag (no span to match).
    *
    * Returns one row per input document: (id, n_tokens, n_removed,
    * text_clean) — `text_clean` NULL when everything was removed (an
    * exact duplicate document).
    *
    * Scale shape: rows are only ever (id, pos) pairs — one per token
    * and one per k-gram, the same order of work as tokenization itself.
    * The first-occurrence window partitions by K-GRAM HASH (duplicate
    * sets, tiny groups); covered positions explode flagged grams k-fold
    * (bounded by k × true duplication volume, not corpus size); the
    * final anti-join and reassembly shuffle by document id. No suffix
    * array, no driver state, no all-pairs work.
    */
  def removeRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                          k: Int = 10): DataFrame = {
    require(k >= 2, s"span length $k")
    val toks = df.select(col(idCol).as("id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    // k-gram occurrences with their start-token position
    val kg = toks.filter(size(col("toks")) >= k)
      .select(col("id"),
        posexplode(TextFunctions.wordShingles(
          array_join(col("toks"), " "), k)).as(Seq("pos", "gram")))
    val w = Window.partitionBy(md5(col("gram")))
      .orderBy(col("id"), col("pos"))
    // non-first occurrences cover token range [pos, pos+k)
    val covered = kg.withColumn("rn", row_number().over(w))
      .filter(col("rn") > 1)
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + k - 1)).as("j"))
      .distinct()
    val tokPos = toks.select(col("id"), size(col("toks")).as("n_tokens"),
      posexplode(col("toks")).as(Seq("j", "tok")))
    val kept = tokPos.join(covered, Seq("id", "j"), "left_anti")
      .groupBy(col("id"))
      .agg(first(col("n_tokens")).as("n_tokens"),
        count(lit(1)).as("n_kept"),
        array_sort(collect_list(struct(col("j"), col("tok")))).as("ks"))
      .select(col("id"), col("n_tokens"),
        (col("n_tokens") - col("n_kept")).as("n_removed"),
        array_join(transform(col("ks"), x => x.getField("tok")), " ")
          .as("text_clean"))
    // re-attach fully-removed docs (kept has no row for them)
    toks.select(col("id"), size(col("toks")).as("n_tokens"))
      .join(kept.select(col("id"), col("n_removed"), col("text_clean")),
        Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        coalesce(col("n_removed"), col("n_tokens")).as("n_removed"),
        col("text_clean"))
  }

  // ---- duplicate clustering (connected components) -------------------

  /** Group near-duplicate PAIRS into clusters: connected components of
    * the pair graph, each node labeled with the minimum id reachable
    * from it. Returns one row per node: (id, cluster_id).
    *
    * Dedup pipelines need this step — pairwise output alone can't
    * answer "which copies do I drop": A~B and B~C must collapse into
    * one {A,B,C} cluster keeping only A.
    *
    * Graphs at or under `smallGraphEdges` distinct directed edges (and
    * long-typed ids) take a driver-side union-find fast path — same
    * min-label output, one job instead of ~5 iterative rounds of
    * scheduling overhead; see the inline rationale. At-scale algorithm:
    * iterative min-label propagation with pointer jumping
    * (the two-step of Kiveris et al.'s star contraction):
    *   1. neighbor-min — lab(v) <- min(lab(v), min over edges lab(u));
    *   2. pointer jump — lab(v) <- lab(lab(v)) (labels are node ids, so
    *      one self-join halves every label chain).
    * Each round is two equi-join shuffles; pointer jumping makes the
    * round count O(log diameter) instead of O(diameter), and duplicate
    * clusters are overwhelmingly tiny-diameter cliques, so real corpora
    * converge in 2-3 rounds. Labels persist per round (and the previous
    * round unpersists), and each round's frame is REBASED onto its
    * materialized RDD (GraftColumnBridge.truncateLineage): persistence
    * alone only truncates physical recompute — the LOGICAL plan still
    * triples per round (labels referenced three times), and driver-side
    * analysis + cache-lookup grows with it (measured 1.9s -> 8.6s
    * between rounds on an 81-edge graph; at corpus scale the compounding
    * plan would overwhelm the driver long before the data hurts the
    * executors). The convergence check is one count per round — the
    * standard driver-side scalar any iterative Spark graph algorithm
    * pays (GraphX does the same).
    */
  def clusterDuplicates(pairs: DataFrame, idA: String = "id_a",
                        idB: String = "id_b", maxIter: Int = 25,
                        smallGraphEdges: Long = 1000000L): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .union(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct()
      .persist(MEMORY_AND_DISK)
    // Small-graph fast path: the duplicate-pair graph of a corpus is
    // |duplicates|-sized, not |corpus|-sized — at bench scale it is a
    // few hundred edges, and the iterative path below pays ~5 rounds of
    // multi-stage jobs in pure scheduling overhead to converge it. Under
    // the edge bound (1M edges ≈ 16 MB — the same bounded-collect
    // discipline as SkewTools' hot-key list), union-find on the driver
    // produces the identical min-label components in one job. Above the
    // bound — the genuinely-at-scale case — the distributed propagation
    // runs unchanged. The count also materializes the edge cache the
    // distributed path would build anyway.
    val isLongIds = edges.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    if (isLongIds && edges.count() <= smallGraphEdges) {
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      edges.unpersist()
      val parent = scala.collection.mutable.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val nxt = parent(c); parent(c) = r; c = nxt
        }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        // union by MIN root: the component label IS the minimum id
        if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      }
      val spark = pairs.sparkSession
      import spark.implicits._
      return parent.keys.toSeq.map(id => (id, find(id)))
        .toDF("id", "cluster_id")
    }
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lab", col("id"))
      .persist(MEMORY_AND_DISK)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // 1) neighbor-min
      val viaNbr = edges
        .join(labels.select(col("id").as("dst"), col("lab")), "dst")
        .select(col("src").as("id"), col("lab"))
      val m1 = labels.select(col("id"), col("lab")).union(viaNbr)
        .groupBy("id").agg(min(col("lab")).as("lab"))
      // 2) pointer jump: labels are node ids — follow one hop
      val next = org.apache.spark.sql.GraftColumnBridge.truncateLineage(m1
        .join(labels.select(col("id").as("lab"), col("lab").as("lab2")),
          Seq("lab"), "left")
        .select(col("id"), least(col("lab"), coalesce(col("lab2"), col("lab")))
          .as("lab")))
        .persist(MEMORY_AND_DISK)
      val changed = next.join(labels.withColumnRenamed("lab", "old"), "id")
        .filter(col("lab") =!= col("old")).count()
      labels.unpersist()
      labels = next
      done = changed == 0
      iter += 1
    }
    edges.unpersist()
    // the surviving round's persist backs the returned DF; tracked so the
    // caller's CacheRegistry.releaseAll() drops it after the terminal action
    CacheRegistry.track(labels)
    labels.select(col("id"), col("lab").as("cluster_id"))
  }
}
