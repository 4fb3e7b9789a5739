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
    val cur = current.select(col(idCol).as("id"), col(fpCol).as("fp_cur"))
    val prev = previous.select(col(idCol).as("id"), col(fpCol).as("fp_prev"))
    cur.join(prev, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("fp_prev").isNull, lit("added"))
          .when(col("fp_cur").isNull, lit("removed"))
          .when(col("fp_cur") =!= col("fp_prev"), lit("changed")))
      .filter(col("status").isNotNull)
      .select(col("id").as(idCol), col("status"))
  }
}
