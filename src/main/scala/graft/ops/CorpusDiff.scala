package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot corpus diff: which documents were added,
  * removed, or changed between two crawls/exports. The corpus-lifecycle
  * twin of the grid layer's J5 incremental anti-join (reference:
  * worldgrid updates reprocess only new dates — hadoop/spark.py:171-177);
  * here the unit is the document and "changed" is detected by content
  * fingerprint, so re-downloads with identical bytes don't churn the
  * pipeline.
  *
  * Scale stance (100 TB): both sides are projected to (id, fingerprint)
  * BEFORE the join — document payloads never ride the shuffle; the full
  * outer join is id-keyed and co-partitions the two narrow projections.
  * Unchanged documents (the overwhelming majority of a daily crawl) are
  * dropped in the join's output filter, so the delta that reaches any
  * sink is delta-sized, not corpus-sized.
  */
object CorpusDiff {

  /** (idCol, status) for every document whose membership or fingerprint
    * differs between `current` and `previous`: status is 'added'
    * (id only in current), 'removed' (id only in previous), or
    * 'changed' (both, different fingerprint). Ids must be unique per
    * snapshot; `fpCol` is any caller-chosen content fingerprint column
    * present on both sides (hash there, diff here). */
  def snapshotDelta(current: DataFrame, previous: DataFrame,
                    idCol: String, fpCol: String): DataFrame = {
    // membership is tracked by explicit presence flags, NOT fingerprint
    // nullability — a NULL fingerprint (e.g. md5 of a NULL payload) is a
    // legal value and must not read as "absent"; likewise the changed
    // test is null-safe so value<->NULL payload transitions surface
    val cur = current.select(col(idCol).as("id"), col(fpCol).as("fp_cur"),
      lit(true).as("in_cur"))
    val prev = previous.select(col(idCol).as("id"), col(fpCol).as("fp_prev"),
      lit(true).as("in_prev"))
    cur.join(prev, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("in_prev").isNull, lit("added"))
          .when(col("in_cur").isNull, lit("removed"))
          .when(!(col("fp_cur") <=> col("fp_prev")), lit("changed")))
      .filter(col("status").isNotNull)
      .select(col("id").as(idCol), col("status"))
  }

  /** [[snapshotDelta]] plus the NEW payload for added/changed rows
    * (null payload for removed) — the self-contained patch a downstream
    * consumer ships instead of the full snapshot. The classification
    * join still carries fingerprints only; payloads attach by one
    * id-keyed semi-lookup against the delta ids (delta-sized, so at
    * crawl scale it broadcasts). */
  def snapshotDeltaWithPayload(current: DataFrame, previous: DataFrame,
                               idCol: String, fpCol: String,
                               payloadCols: Seq[String]): DataFrame = {
    val delta = snapshotDelta(current, previous, idCol, fpCol)
    delta.join(current.select((col(idCol) +: payloadCols.map(col)): _*),
        Seq(idCol), "left_outer")
      .select((col(idCol) +: col("status") +: payloadCols.map(col)): _*)
  }

  /** Apply a payload-carrying delta to `previous`, producing the next
    * snapshot: removed/changed rows drop, added/changed payloads land.
    * Round-trip law (pinned by CorpusDiffSpec):
    * applyDelta(prev, snapshotDeltaWithPayload(cur, prev)) == cur.
    *
    * Scale stance: the delta is BROADCAST to both the anti-join and the
    * union (a daily delta is orders of magnitude smaller than the
    * corpus), so the surviving snapshot payloads never shuffle — the
    * merge costs one corpus scan. */
  def applyDelta(previous: DataFrame, delta: DataFrame,
                 idCol: String, payloadCols: Seq[String]): DataFrame = {
    // every delta id leaves the previous snapshot (added ids are
    // defensively included so re-applying a patch stays a no-op), then
    // added/changed payloads land
    val gone = delta.select(col(idCol))
    val landed = delta.filter(col("status").isin("added", "changed"))
      .select((col(idCol) +: payloadCols.map(col)): _*)
    previous.select((col(idCol) +: payloadCols.map(col)): _*)
      .join(broadcast(gone), Seq(idCol), "left_anti")
      .unionByName(landed)
  }
}
