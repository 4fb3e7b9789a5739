package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One valid (non-nodata) pixel observation arriving on the stream. */
final case class PixelObs(x: Int, y: Int, t: Int, value: Double)

/** Per-pixel CUSUM monitor state: baseline stats plus the running
  * prefix sum and prefix min — FOUR scalars, regardless of series
  * length. */
final case class CusumState(nTrain: Long, smTrain: Double,
                            r: Double, mn: Double)

final case class CusumEmit(x: Int, y: Int, t: Int, cusum: Double, alarm: Int)

/** Streaming face of [[graft.grid.GridTimeSeries.cusumDetect]] — the
  * Terra-i-style vegetation-loss alarm run INCREMENTALLY as new dates
  * arrive, instead of re-running the batch window over the whole
  * series.
  *
  * The batch op's prefix closed form (S_t = R_t - min(0, min R_j)) is
  * exactly what makes the streaming version possible with CONSTANT
  * state: each pixel keeps (n_train, sum_train, R, min R) — four
  * scalars — so a planet-scale monitor holds O(pixels) state with no
  * per-date growth, the property that lets the alarm run continuously
  * over a 100 TB archive's ingest stream. Arithmetic is the batch op's
  * exact integer chain (micro-snapped slack/threshold, deviations
  * scaled by n_train), so stream == batch BIT-FOR-BIT when batches
  * respect date order (file replay / AvailableNow — the same contract
  * as [[EventStreaming.clickPurchaseAttribution]]); within a
  * micro-batch rows sort by t.
  *
  * Training dates (t < trainT) only update the baseline and emit
  * nothing; monitoring dates of pixels with no baseline yet are
  * dropped, matching the batch semantics.
  */
object GridStreamCusum {

  def monitor(spark: SparkSession, obs: Dataset[PixelObs], trainT: Int,
              slack: Double, threshold: Double,
              roundTo: Int = 4): Dataset[CusumEmit] = {
    import spark.implicits._
    require(trainT >= 1, s"trainT must be >= 1, got $trainT")
    val slackMicro = math.rint(slack * 1e6)
    val hMicro = math.rint(threshold * 1e6)
    obs.groupByKey(o => (o.x, o.y))
      .flatMapGroupsWithState[CusumState, CusumEmit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((x, y), rows, state: GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(CusumState(0L, 0.0, 0.0, 0.0))
          val out = Seq.newBuilder[CusumEmit]
          rows.toSeq.sortBy(_.t).foreach { o =>
            if (o.t < trainT)
              st = st.copy(nTrain = st.nTrain + 1,
                smTrain = st.smTrain + o.value)
            else if (st.nTrain > 0) {
              val d = (st.smTrain - st.nTrain * o.value) * 1e6 -
                st.nTrain * slackMicro
              val r = st.r + d
              val mn = math.min(st.mn, r)
              st = st.copy(r = r, mn = mn)
              val s = r - mn
              // the batch op rounds via Spark's round() = decimal
              // HALF_UP; replicate it exactly for the stream==batch pin
              val cusum = BigDecimal(s / (st.nTrain * 1e6))
                .setScale(roundTo, BigDecimal.RoundingMode.HALF_UP)
                .toDouble
              out += CusumEmit(x, y, o.t, cusum,
                if (s > st.nTrain * hMicro) 1 else 0)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Publish labeled alert PATCHES per micro-batch — the downstream
    * half of the alerting chain run continuously: each batch's alarm
    * pixels label through the SAME distributed CCL as batch
    * ([[graft.grid.GridLabeling.labelPatches]]) and their patch
    * summaries append to a parquet alert log tagged with the batch id.
    * Patch extent is per batch (alarms for one physical patch arriving
    * in different triggers publish as separate alert events — the alert
    *-feed semantic, where each trigger's detections ship immediately;
    * cross-batch consolidation is the j5-style incremental anti-join's
    * job downstream). Caller starts/stops the returned query. */
  def publishAlertPatches(spark: SparkSession,
                          header: graft.grid.GridHeader,
                          alarms: Dataset[CusumEmit],
                          outDir: String): org.apache.spark.sql.streaming.DataStreamWriter[CusumEmit] = {
    import org.apache.spark.sql.functions.lit
    alarms.writeStream.foreachBatch {
      (batch: Dataset[CusumEmit], batchId: Long) =>
        // scoped, not releaseAll: a sink firing every trigger must drop
        // only the labelPatches cache IT created, never a concurrent
        // job's tracked tables
        graft.ops.CacheRegistry.scoped {
          val pts = batch.filter(_.alarm == 1).toDF()
            .select("x", "y").distinct()
          if (!pts.isEmpty) {
            val labeled = graft.grid.GridLabeling.labelPatches(
              batch.sparkSession, header, pts)
            graft.grid.GridLabeling.patchStats(labeled)
              .withColumn("batch_id", lit(batchId))
              .coalesce(1)
              .write.mode("append").parquet(outDir)
          }
        }
        ()
    }
  }
}
