package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data curation.
  *
  * `df.sample()` is seed-dependent AND partitioning-dependent — rerunning
  * after a repartition (or on a different cluster) yields a different
  * subset, which breaks dataset reproducibility and incremental re-runs.
  * These operators derive the keep/drop decision from a cryptographic
  * hash of a stable row key instead: the same row always makes the same
  * decision, on any cluster layout, in any engine that agrees on md5
  * (DuckDB does — the oracle runs the identical predicate).
  *
  * Scale shape: both operators are a single narrow `filter` (hash +
  * compare, whole-stage codegen, no shuffle); the fixed-size variant
  * shuffles once on the stratum key — the same cost as any groupBy —
  * and never materializes more than `n` rows per stratum downstream.
  */
object Sampling {

  /** Lowercase-hex first-8 md5 chars of (salt || key) — an effectively
    * uniform draw in [0, 2^32) encoded so LEXICOGRAPHIC order equals
    * numeric order (fixed width, one case). */
  def hashDraw(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt), key.cast("string"))), 1, 8)

  /** The threshold hex literal t such that `draw < t` keeps ~fraction of
    * rows: floor(fraction * 2^32) as 8 lowercase hex digits. */
  def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction")
    val t = math.min((fraction * 4294967296.0).toLong, 0xffffffffL)
    f"$t%08x"
  }

  /** Keep ~`fraction` of rows, decided per row by hash of `keyCol`.
    * Deterministic across runs, partitionings, and engines; changing
    * `salt` re-draws an independent sample. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
                 salt: String = "graft"): DataFrame =
    df.filter(hashDraw(col(keyCol), salt) < lit(thresholdHex(fraction)))

  /** Per-stratum fractions (e.g. downsample dominant languages): strata
    * missing from `fractions` fall back to `defaultFraction`. */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0,
                       salt: String = "graft"): DataFrame = {
    val threshold = fractions.foldLeft(lit(thresholdHex(defaultFraction))) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(thresholdHex(f))).otherwise(acc)
    }
    df.filter(hashDraw(col(keyCol), salt) < threshold)
  }

  /** Resample a multi-source corpus toward target mixture RATIOS — the
    * training-mix step: kept counts come out proportional to `weights`
    * (any positive ratios; they need not sum to 1), scaled to the
    * largest mix that no source can satisfy only by upsampling. With
    * K = min over sources of floor(n_s / w_s), each source keeps
    * ~w_s * K rows via the same deterministic hash draw as
    * [[stratifiedSample]]; the binding source keeps (almost) all its
    * rows, the rest downsample. Sources absent from `weights` are
    * dropped. Engine-portable by construction: K and the per-source
    * fractions use only IEEE double ops in a fixed order (no
    * normalizing sum, whose addition order would differ between
    * engines), so the DuckDB oracle reproduces the row set exactly.
    *
    * Scale shape: one column-pruned count pass (collects one row per
    * source, bounded by |weights|) + one narrow codegen filter — no
    * shuffle of the payload anywhere.
    */
  def mixtureSample(df: DataFrame, sourceCol: String, keyCol: String,
                    weights: Map[String, Double],
                    salt: String = "graft"): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0.0),
      "mixture weights must be positive")
    val counts = df.filter(col(sourceCol).isin(weights.keySet.toSeq: _*))
      .groupBy(col(sourceCol)).count()
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val missing = weights.keySet -- counts.keySet
    require(missing.isEmpty, s"sources absent from the corpus: $missing")
    val k = weights.map { case (s, w) => math.floor(counts(s) / w) }.min
    val fractions = weights.map { case (s, w) =>
      s -> math.min(1.0, w * k / counts(s))
    }
    stratifiedSample(df, sourceCol, keyCol, fractions,
      defaultFraction = 0.0, salt = salt)
  }

  /** Deterministic TOKEN-budget subset per stratum — "give me ~N
    * tokens per source": rows are ordered by their hash draw (a stable
    * shuffle of the stratum), the running token total accumulates in
    * that order, and the kept set is the maximal prefix whose
    * cumulative count stays within `budget`. Same-input re-runs and
    * repartitionings keep the identical subset; a larger budget keeps
    * a superset (prefix property), so growing a dataset never churns
    * the rows already selected.
    *
    * Scale shape: one shuffle on the stratum key + an ordered
    * per-partition window scan — the same cost as any keyed groupBy;
    * no global window, no driver state.
    */
  def tokenBudgetSample(df: DataFrame, strataCol: String, keyCol: String,
                        tokensCol: String, budget: Long,
                        salt: String = "graft"): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashDraw(col(keyCol), salt), col(keyCol))
    df.withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** EXACTLY `n` rows per stratum (fewer if the stratum is smaller),
    * chosen as the n smallest hash draws — a deterministic reservoir.
    * One shuffle on the stratum key; ties in the 32-bit draw break on
    * the key itself, so the pick is total-order stable. */
  def stratifiedFixedSample(df: DataFrame, strataCol: String, keyCol: String,
                            n: Int, salt: String = "graft"): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashDraw(col(keyCol), salt), col(keyCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= n)
  }

  /** Deterministic train/val/test assignment: each row lands in exactly
    * one named split, decided by where its hash draw falls among the
    * cumulative fraction thresholds (`splits` in order; fractions must
    * sum to ≤ 1, any remainder goes to the LAST split so no row is
    * unassigned). The same row gets the same split on any cluster, any
    * partitioning, any engine that agrees on md5 — the property a
    * held-out set must have, or retraining after an ingest reshuffle
    * contaminates eval with former training rows.
    *
    * Scale shape: a single narrow projection (hash + when-chain,
    * whole-stage codegen) — no shuffle, no state.
    */
  def assignSplit(df: DataFrame, keyCol: String,
                  splits: Seq[(String, Double)],
                  salt: String = "graft"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0.0), s"splits $splits")
    // cumulative thresholds in declaration order — fixed IEEE add order,
    // so the DuckDB oracle reproduces the exact same hex literals.
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    require(cum.last <= 1.0 + 1e-9, s"split fractions sum to ${cum.last} > 1")
    val draw = hashDraw(col(keyCol), salt)
    val label = splits.init.zip(cum.init).foldRight(
      lit(splits.last._1): Column) { case (((name, _), c), acc) =>
      when(draw < lit(thresholdHex(c)), lit(name)).otherwise(acc)
    }
    df.withColumn("split", label)
  }

  /** Leakage-safe split assignment — [[assignSplit]] under
    * near-duplicate closure: every document is assigned by its
    * duplicate-CLUSTER representative's hash draw (the component's
    * minimum id from [[Dedup.clusterDuplicates]]; unpaired documents
    * represent themselves), so near-copies of one document can never
    * straddle train and test — the split-contamination hole a per-doc
    * hash split leaves open (a paraphrase of a training doc landing in
    * eval scores as generalization when it is memorization).
    * `pairs` is any near-dup pair table (id_a, id_b) over `idCol` ids
    * — MinHash-LSH, SimHash or semantic. Output: df + (rep_id, split).
    *
    * Scale shape: the clustering is the |duplicates|-sized component
    * pass (never corpus-sized); the representative join is id-keyed
    * (cluster table is duplicate-sized, AQE broadcasts it); the split
    * itself stays the pure hash projection. */
  def leakageSafeSplit(df: DataFrame, pairs: DataFrame, idCol: String,
                       splits: Seq[(String, Double)],
                       salt: String = "graft"): DataFrame = {
    val clusters = Dedup.clusterDuplicates(pairs)
    val withRep = df.join(
        clusters.select(col("id").as(idCol), col("cluster_id")),
        Seq(idCol), "left")
      .withColumn("rep_id", coalesce(col("cluster_id"), col(idCol)))
      .drop("cluster_id")
    assignSplit(withRep, "rep_id", splits, salt)
  }

  /** Deterministic global shuffle: adds `pos` — the row's position in
    * the corpus ordered by its hash draw (ties broken on the key) — a
    * reproducible random permutation for epoch-order materialization.
    * Re-running on a differently-partitioned copy of the same rows
    * yields the identical permutation; changing `salt` re-shuffles.
    *
    * Scale shape: NOT a single-partition window (the classic global
    * row_number bottleneck) — the same two-phase range-shuffle scan as
    * [[Packing.packChunked]]: job 1 collects per-partition COUNTS
    * (nParts tiny rows), job 2 re-reads the same shuffle output with
    * the prefix offsets closed over, so the draw order is materialized
    * once and the driver never sees a data row.
    */
  def globalShuffle(df: DataFrame, keyCol: String, salt: String = "graft",
                    nParts: Int = 32): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    val withDraw = df.withColumn("shuffle_draw", hashDraw(col(keyCol), salt))
    // ONE RDD lineage shared by both jobs (see Packing.packChunked: a
    // DataFrame would re-sample the range exchange per job; an RDD not).
    val rdd = withDraw.repartitionByRange(nParts, col("shuffle_draw"), col(keyCol))
      .sortWithinPartitions(col("shuffle_draw"), col(keyCol)).rdd
    val counts = rdd.mapPartitionsWithIndex { (i, it) =>
      Iterator((i, it.size.toLong))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var p = offsets(i)
      it.map { r => val row = Row.fromSeq(r.toSeq :+ p); p += 1; row }
    }
    spark.createDataFrame(out, StructType(withDraw.schema.fields :+
      StructField("pos", LongType, nullable = false)))
      .drop("shuffle_draw")
  }
}
