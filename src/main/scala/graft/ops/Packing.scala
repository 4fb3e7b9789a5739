package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing: assign documents to fixed-capacity context-window
  * bins for LLM training batches.
  *
  * Two variants:
  *
  * - [[packChunked]] — the "concatenate the corpus in key order, cut
  *   every `capacity` tokens" formulation: doc d goes to bin
  *   floor(prefix_tokens_before(d) / capacity). Deterministic in the
  *   key order alone (independent of partitioning), so it is DuckDB-
  *   oracle-checkable; bins overflow by at most one document (standard
  *   stream-packing approximation used by training pipelines).
  *
  * - [[packGreedy]] — first-fit-in-key-order with reset: a bin closes
  *   when the next doc would exceed `capacity`, so bins NEVER overflow
  *   (docs longer than capacity get a singleton bin). Sequential by
  *   nature; distributed by range-partitioning the key and packing each
  *   partition independently (bins never span partitions — at worst
  *   nParts-1 underfull bins, negligible for nParts ≪ nBins).
  *
  * Scale shape: the global prefix sum is NOT a single-partition window
  * (the classic driver-sized bottleneck) — it is the two-phase scan over
  * ONE range-shuffled RDD lineage (the RDD.zipWithIndex pattern): job 1
  * collects per-partition totals (nParts tiny rows), job 2 re-reads the
  * SAME shuffle output with the prefix offsets closed over. Sharing the
  * RDD object means the range shuffle is sampled and executed once and
  * its map output reused by the second job — deterministic partition
  * contents with NO persist (round-3 review flagged the previous
  * persist-as-pin here as a cache leak; shuffle files are cleaned by the
  * ContextCleaner when the lineage is GC'd).
  */
object Packing {

  private def longAt(r: Row, i: Int): Long = r.get(i) match {
    case l: Long => l
    case n: Number => n.longValue()
  }

  /** df + columns (bin_id long, cum_before long): bin assignment by
    * global token prefix sum over `keyCol` order. */
  def packChunked(df: DataFrame, keyCol: String, tokensCol: String,
                  capacity: Long, nParts: Int = 32): DataFrame = {
    require(capacity > 0, s"capacity $capacity")
    val spark = df.sparkSession
    val tokIdx = df.schema.fieldIndex(tokensCol)
    // ONE RDD lineage: both jobs below reuse its shuffle map output, so
    // they see identical range partitions (re-planning a DataFrame
    // re-samples the range exchange per job; an RDD does not).
    val rdd = df.repartitionByRange(nParts, col(keyCol))
      .sortWithinPartitions(col(keyCol)).rdd
    val totals = rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach(r => s += longAt(r, tokIdx))
      Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _) // offsets(i) = tokens before part i
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var cum = offsets(i)
      it.map { r =>
        val before = cum
        cum += longAt(r, tokIdx)
        Row.fromSeq(r.toSeq :+ (before / capacity) :+ before)
      }
    }
    spark.createDataFrame(out, StructType(df.schema.fields ++ Seq(
      StructField("bin_id", LongType, nullable = false),
      StructField("cum_before", LongType, nullable = false))))
  }

  /** df + column (bin_id long): first-fit-in-key-order bins that never
    * exceed `capacity` (singleton bins for oversized docs). Bin ids are
    * globally unique and dense within a partition's range. */
  def packGreedy(df: DataFrame, keyCol: String, tokensCol: String,
                 capacity: Long, nParts: Int = 32): DataFrame = {
    require(capacity > 0, s"capacity $capacity")
    val spark = df.sparkSession
    val tokIdx = df.schema.fieldIndex(tokensCol)
    val rdd = df.repartitionByRange(nParts, col(keyCol))
      .sortWithinPartitions(col(keyCol)).rdd
    // job 1: bins used per partition (same first-fit simulation, counts
    // only); job 2 re-runs it over the SAME shuffle output with offsets.
    val counts = rdd.mapPartitionsWithIndex { (i, it) =>
      var bin = 0L; var used = 0L; var first = true; var any = false
      it.foreach { r =>
        any = true
        val t = longAt(r, tokIdx)
        if (!first && used + t > capacity) { bin += 1; used = 0L }
        first = false
        used += t
      }
      Iterator((i, if (any) bin + 1 else 0L))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var bin = 0L; var used = 0L; var first = true
      it.map { r =>
        val t = longAt(r, tokIdx)
        if (!first && used + t > capacity) { bin += 1; used = 0L }
        first = false
        used += t
        Row.fromSeq(r.toSeq :+ (offsets(i) + bin))
      }
    }
    spark.createDataFrame(out, StructType(df.schema.fields :+
      StructField("bin_id", LongType, nullable = false)))
  }

  /** The attention-segment table of a packed batch ([[packChunked]]'s
    * companion): one row per (bin, document) with the document's token
    * offset range inside its bin — what a training loader needs to
    * build position_ids and the block-diagonal attention mask of a
    * packed example without re-tokenizing. Chunked packing cuts the
    * key-ordered token stream every `capacity` tokens, so a document's
    * in-bin offset is exactly `cum_before % capacity` — the whole
    * table is a PROJECTION over the pack assignment (no extra shuffle,
    * no window). The at-most-one overflow document per bin reports its
    * start in its HOME bin and a seg_len that may run past capacity,
    * exactly like the packing itself. Output:
    * (bin_id, <keyCol>, seg_start, seg_len). */
  def packedSegments(df: DataFrame, keyCol: String, tokensCol: String,
                     capacity: Long, nParts: Int = 32): DataFrame =
    packChunked(df, keyCol, tokensCol, capacity, nParts)
      .select(col("bin_id"), col(keyCol),
        (col("cum_before") % capacity).as("seg_start"),
        col(tokensCol).cast("long").as("seg_len"))

  /** Fill-in-the-middle transform (Bavarian et al. 2022,
    * arXiv:2207.14255 — "Efficient Training of Language Models to
    * Fill in the Middle"): rotate a character span so a causal LM
    * learns infilling. Every `everyK`-th document (id-keyed — the FIM
    * rate knob) is split at two cut points into prefix/middle/suffix
    * and re-emitted in PSM order with sentinel markers:
    * `<PRE>prefix<SUF>suffix<MID>middle`; other documents (and
    * documents under 4 chars) pass through unchanged.
    *
    * Selection and cut points derive from MD5 draws on the id (the
    * [[Sampling.hashDraw]] convention — works for ANY id type, string
    * ids included, where the previous `id % k` arithmetic required a
    * numeric id and failed analysis otherwise): production would draw
    * from an RNG, but a DETERMINISTIC, engine-portable choice is the
    * contract here — one md5, integer ops and one IEEE divide, replayed
    * exactly by the DuckDB oracle via the established
    * `conv(substring(md5(..), 1, 8), 16, 10)` <->
    * `CAST('0x' || substr(md5(..), 1, 8) AS BIGINT)` bridge.
    * cut1 ∈ [1, n-2], cut2 ∈ [cut1+1, n-1], so all three spans are
    * non-empty. Pure codegen projection — no shuffle, corpus-linear at
    * any scale. Output (id, fim_applied, text_out). */
  def fimTransform(df: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", everyK: Int = 2): DataFrame = {
    require(everyK > 0, s"everyK $everyK")
    def draw(salt: String): Column =
      conv(substring(md5(concat(lit(salt), col(idCol).cast("string"))),
        1, 8), 16, 10).cast("long")
    val applied = (draw("graft_fim") % everyK === 0) &&
      length(col(textCol)).cast("long") >= 4L
    val out = df
      .withColumn("graft_n", length(col(textCol)).cast("long"))
      .withColumn("graft_c1", lit(1L) +
        floor((draw("graft_fim1") % 97) * (col("graft_n") - 2) / 97.0))
      .withColumn("graft_c2", col("graft_c1") + 1L +
        floor((draw("graft_fim2") % 89) *
          (col("graft_n") - col("graft_c1") - 1) / 89.0))
    out.select(col(idCol),
        when(applied, lit(1)).otherwise(lit(0)).as("fim_applied"),
        when(applied, concat(lit("<PRE>"),
          expr(s"substring($textCol, 1, cast(graft_c1 as int))"),
          lit("<SUF>"),
          expr(s"substring($textCol, cast(graft_c2 as int) + 1, " +
            s"length($textCol))"),
          lit("<MID>"),
          expr(s"substring($textCol, cast(graft_c1 as int) + 1, " +
            s"cast(graft_c2 - graft_c1 as int))")))
          .otherwise(col(textCol)).as("text_out"))
  }

  /** Split long documents into fixed-size overlapping token windows —
    * the other half of context-window prep ([[packChunked]] packs short
    * docs together; this cuts long docs down). Window i covers tokens
    * [i·stride, i·stride + chunkTokens) with stride = chunkTokens −
    * overlap; the window count ⌈(n − overlap) / stride⌉ (min 1)
    * guarantees every window past the first starts with `overlap`
    * repeated tokens and contributes at least one new one. Documents
    * with zero tokens emit no rows.
    *
    * Output: (id, chunk_idx, n_chunk_tokens, chunk_text).
    *
    * Scale shape: one projection + one generator — no shuffle, no
    * window function, no driver state; rows fan out by the per-doc
    * chunk count only (plan-pinned shuffle-free).
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens, s"overlap $overlap")
    val stride = chunkTokens - overlap
    df.select(col(idCol),
        graft.functions.TextFunctions.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn("n_chunks", greatest(lit(1L),
        ceil((size(col("toks")) - lit(overlap)).cast("double") / lit(stride))))
      .select(col(idCol), col("toks"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .withColumn("chunk", slice(col("toks"),
        (col("chunk_idx") * stride + 1).cast("int"), lit(chunkTokens)))
      .select(col(idCol), col("chunk_idx"),
        size(col("chunk")).as("n_chunk_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }
}
