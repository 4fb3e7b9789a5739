package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

/** Bounded-fan-in maintenance for the streaming maintainers' id-history
  * tables (`docs_seen/`, `vecs_seen/`) — ONE compactor shared by every
  * stream that gates redelivery with an anti-join against an
  * append-only id directory ([[graft.streaming.TensorStreamShards]],
  * [[graft.streaming.IndexStreamMaintain]],
  * [[graft.streaming.IvfStreamMaintain]]).
  *
  * The failure mode it closes: each micro-batch appends one small
  * parquet file, and the idempotence gate re-reads the WHOLE directory
  * every trigger — after 10k unattended batches that is 10k file opens
  * per trigger, a fan-in decay no single batch ever notices.
  *
  * Scale shape of the rewrite itself: TIERED — only sub-target files
  * consolidate (full segments are immutable, see [[compact]]), so each
  * pass pays for the new tail, never the history; and the output is
  * `max(1, ceil(bytes / targetBytes))` HASH-BUCKETED files
  * (`repartition(n, id)`), never `coalesce(1)` — a single-file rewrite
  * funnels the whole tier through one task every time the threshold
  * trips. The gate's anti-join has set semantics, so multi-file output
  * costs it nothing; bucketing by the id keeps the file set balanced
  * for the re-read.
  *
  * Crash safety (the staging discipline of the whole-index rewrites):
  * consolidate into a SIBLING staging dir (never read-and-append the
  * same path), MOVE the results in under fresh names, THEN prune the
  * superseded files. A crash at any point leaves either an orphaned
  * staging dir (reclaimed on the next pass) or redundant id rows —
  * ids never vanish, and duplicates are harmless under set semantics.
  *
  * Concurrency: call from the stream's own serialized foreachBatch
  * (all three maintainers do), so no concurrent reader of the id table
  * exists during the prune — the same writer-quiesce the whole-index
  * compactions document.
  */
object SeenTable {

  /** Target bytes per compacted file — sized so a compacted history
    * re-reads in O(bytes / target) balanced tasks (the standard
    * parquet file-sizing band, well under
    * spark.sql.files.maxPartitionBytes). */
  val DefaultTargetBytes: Long = 128L * 1024 * 1024

  /** Batch-size ceiling for the broadcast gate plan: a per-trigger
    * micro-batch is far under this; a deliberate giant backfill
    * (beyond what a driver should hold twice) falls back to the plain
    * shuffle anti-join, which a one-off catch-up can afford. */
  val DefaultMaxBroadcastIds: Long = 4L * 1000 * 1000

  /** The rows of `batch` whose `idCol` is NOT in the seen table — the
    * idempotence gate every stream maintainer runs per trigger, in the
    * shape that survives a 10^10-id history: the naive
    * `batch ANTI JOIN history` sort-merge-shuffles the WHOLE history
    * every trigger. Instead (both joins broadcast the small side):
    *
    *  1. `hits` = history SEMI JOIN broadcast(batch ids) — one
    *     column-pruned scan of the history, no shuffle, output bounded
    *     by the batch;
    *  2. novel = batch ANTI JOIN broadcast(hits).
    *
    * Per-trigger cost: one parquet scan of the id column (its files
    * bounded by [[compact]]), ZERO exchanges over the history
    * (SeenTableSpec pins the plan). Batches larger than
    * `maxBroadcastIds` (a backfill, not a trigger) take the plain
    * shuffle anti-join instead — counting the deduped batch is one
    * cheap job on a frame the caller should already have persisted
    * (the gate output is consumed more than once in every maintainer).
    */
  def novelIds(batch: DataFrame, seenDir: String, idCol: String,
               maxBroadcastIds: Long = DefaultMaxBroadcastIds): DataFrame = {
    val spark = batch.sparkSession
    if (!IndexVersions.pathExists(seenDir)) return batch
    val seen = spark.read.parquet(seenDir).select(col(idCol))
    if (batch.count() > maxBroadcastIds)
      batch.join(seen, Seq(idCol), "left_anti")
    else {
      val hits = seen.join(broadcast(batch.select(col(idCol))),
        Seq(idCol), "left_semi")
      batch.join(broadcast(hits), Seq(idCol), "left_anti")
    }
  }

  /** Consolidate `seenDir` when its parquet file count exceeds
    * `threshold`. `idCol` is the single id column the table carries
    * (hash-bucket key of the rewrite). No-op when the directory is
    * missing, under threshold, or already as few files as the data
    * volume supports.
    *
    * TIERED: only files under `targetBytes / 2` (per-batch appends and
    * not-yet-full segments) are consolidated; a segment that reached
    * half target is NEVER rewritten (half, because a volume-split
    * rewrite emits files between target/2 and target — a boundary at
    * the full target would freeze nothing). Without the tier split,
    * every threshold trip rewrote the WHOLE history — O(history) work
    * every ~threshold batches, quadratic over a stream's lifetime.
    * With it, each pass pays only for the small tail; an id is
    * rewritten ~targetBytes / (2 * threshold * batchBytes) times
    * before its segment freezes (about once for MB-scale trigger
    * batches — size `targetBytes` down if triggers are tiny), and the
    * fan-in bound still holds: frozen segments are at most
    * 2 * bytes / target many — volume-bound, the floor no rewrite can
    * beat. Cross-segment duplicate ids can survive (a frozen segment
    * is immutable); the gate's anti-join has set semantics, so
    * duplicates cost storage only — and [[novelIds]] keeps redelivered
    * ids from ever being appended, so they arise only from crash
    * windows. */
  def compact(spark: SparkSession, seenDir: String, idCol: String,
              threshold: Int,
              targetBytes: Long = DefaultTargetBytes): Unit = {
    require(threshold > 0, s"threshold $threshold")
    require(targetBytes > 0, s"targetBytes $targetBytes")
    val p = new Path(seenDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return
    val small = fs.listStatus(p)
      .filter(f => f.getPath.getName.endsWith(".parquet") &&
        f.getLen < targetBytes / 2)
    if (small.length <= threshold) return
    // Output file count from the small tier's DATA VOLUME, not its file
    // count: a young history compacts to one file (the sandbox case), a
    // bulk arrival fans out to bytes/target writers. Input bytes
    // upper-bound the distinct output, which only makes files smaller
    // than target — the safe direction.
    val totalBytes = small.map(_.getLen).sum
    val nOut = math.max(1L,
      (totalBytes + targetBytes - 1) / targetBytes).toInt
    // When the small tier genuinely needs as many files as it has, a
    // rewrite cannot shrink the fan-in — churn for nothing.
    if (nOut >= small.length) return
    val tmp = new Path(seenDir + "_compact")
    fs.delete(tmp, true) // reclaim an orphan from a crashed pass
    spark.read.parquet(small.map(_.getPath.toString).toIndexedSeq: _*)
      .distinct()
      .repartition(nOut, col(idCol))
      .write.parquet(tmp.toString)
    fs.listStatus(tmp).filter(_.getPath.getName.endsWith(".parquet"))
      .zipWithIndex.foreach { case (f, i) =>
        fs.rename(f.getPath, new Path(p,
          s"compacted-${java.util.UUID.randomUUID.toString.take(8)}-$i.parquet"))
      }
    small.foreach(f => fs.delete(f.getPath, false))
    fs.delete(tmp, true)
  }
}
