package org.apache.spark

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Host-noise-proof benchmark metrics: wall-clock on a shared host can
  * swing 10-85x inside a noisy-neighbor window (two recorded rounds of
  * misleading bench artifacts), but executor CPU time — the sum of
  * per-task on-CPU nanoseconds — is unaffected by another tenant's I/O
  * stalls. This listener accumulates stage-level executorCpuTime and
  * executorRunTime; Bench snapshots the counters around each query.
  *
  * Lives in `package org.apache.spark` because draining the listener
  * bus (needed for a consistent snapshot after a query's last job) is
  * `private[spark]` — same access pattern as [[sql.GraftColumnBridge]].
  */
class GraftCpuTimeListener extends SparkListener {
  val cpuNanos = new AtomicLong(0L)
  val runMillis = new AtomicLong(0L)

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val m = sc.stageInfo.taskMetrics
    if (m != null) {
      cpuNanos.addAndGet(m.executorCpuTime)
      runMillis.addAndGet(m.executorRunTime)
    }
  }
}

object GraftMetricsBridge {
  def install(sc: SparkContext): GraftCpuTimeListener = {
    val l = new GraftCpuTimeListener
    sc.addSparkListener(l)
    l
  }

  /** Block until every posted listener event has been delivered, so the
    * CPU counters include all stages of the job that just finished. */
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
