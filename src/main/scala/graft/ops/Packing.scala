package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  * Scale shape: the global prefix sum in [[packChunked]] is NOT a
  * single-partition window (the classic driver-sized bottleneck) — it is
  * the two-phase scan: per-range-partition local cumsum in parallel,
  * per-partition totals (one tiny row each) prefix-summed and joined
  * back as offsets. Wall-clock is one range shuffle + one narrow pass,
  * at any corpus size.
  */
object Packing {

  /** df + columns (bin_id long, cum_before long): bin assignment by
    * global token prefix sum over `keyCol` order. */
  def packChunked(df: DataFrame, keyCol: String, tokensCol: String,
                  capacity: Long, nParts: Int = 32): DataFrame = {
    require(capacity > 0, s"capacity $capacity")
    val spark = df.sparkSession
    val ranged = df.repartitionByRange(nParts, col(keyCol))
      .withColumn("_part", spark_partition_id())
    // local prefix sums, all partitions in parallel
    val w = Window.partitionBy(col("_part")).orderBy(col(keyCol))
    val local = ranged.withColumn("_cum_local",
      sum(col(tokensCol)).over(w) - col(tokensCol))
    // pin the range partitioning: it is re-sampled per job, and the
    // totals scan + the final query must see the SAME partition ids
    local.persist()
    // phase 2: per-partition totals are nParts rows — scan them on the
    // driver and broadcast-join the offsets back (no global sort).
    val totals = local.groupBy(col("_part"))
      .agg(sum(col(tokensCol)).as("_tot"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) {
      case ((_, acc), (p, tot)) => (p, acc + tot)
    }.tail.map { case (p, cumIncl) =>
      (p, cumIncl - totals.find(_._1 == p).get._2)
    }
    import spark.implicits._
    val offsetDf = offsets.toSeq.toDF("_part", "_offset")
    local.join(broadcast(offsetDf), Seq("_part"))
      .withColumn("cum_before", col("_cum_local") + col("_offset"))
      .withColumn("bin_id",
        floor(col("cum_before") / lit(capacity.toDouble)).cast("long"))
      .drop("_part", "_cum_local", "_offset")
  }

  /** df + column (bin_id long): first-fit-in-key-order bins that never
    * exceed `capacity` (singleton bins for oversized docs). Bin ids are
    * globally unique and dense within a partition's range. */
  def packGreedy(df: DataFrame, keyCol: String, tokensCol: String,
                 capacity: Long, nParts: Int = 32): DataFrame = {
    require(capacity > 0, s"capacity $capacity")
    val spark = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(df.schema.fields :+
      org.apache.spark.sql.types.StructField("local_bin",
        org.apache.spark.sql.types.LongType, nullable = false))
    val keyIdx = df.schema.fieldIndex(keyCol)
    val tokIdx = df.schema.fieldIndex(tokensCol)
    val packed = df.repartitionByRange(nParts, col(keyCol))
      .sortWithinPartitions(col(keyCol))
      .mapPartitions { rows =>
        var bin = 0L; var used = 0L; var first = true
        rows.map { r =>
          val t = r.getLong(tokIdx)
          if (!first && used + t > capacity) { bin += 1; used = 0L }
          first = false
          used += t
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ bin)
        }
      }(org.apache.spark.sql.Encoders.row(schema))
    // pin the range partitioning: it is re-sampled per job, and the
    // offset scan below + the final query must see the SAME partitions
    packed.persist()
    // globalize bin ids with the same tiny-driver-scan offset trick
    val binCounts = packed.groupBy(spark_partition_id().as("_part"))
      .agg((max(col("local_bin")) + 1).as("_nbins"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = binCounts.scanLeft((0, 0L)) {
      case ((_, acc), (p, nb)) => (p, acc + nb)
    }.tail.map { case (p, cumIncl) =>
      (p, cumIncl - binCounts.find(_._1 == p).get._2)
    }
    import spark.implicits._
    val offsetDf = offsets.toSeq.toDF("_part", "_offset")
    packed.withColumn("_part", spark_partition_id())
      .join(broadcast(offsetDf), Seq("_part"))
      .withColumn("bin_id", col("local_bin") + col("_offset"))
      .drop("_part", "local_bin", "_offset")
  }
}
