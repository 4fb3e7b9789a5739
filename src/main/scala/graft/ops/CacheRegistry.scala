package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.storage.StorageLevel

/** Tracked persists for multi-reference intermediates (LSH signature
  * tables, shingle arrays, hyperplane projections): the operators in
  * [[Dedup]]/[[Similarity]] persist DataFrames that feed several points
  * of ONE returned DAG, so they cannot unpersist before the caller's
  * terminal action — and a long-lived session calling them repeatedly
  * would accumulate cached blocks until eviction pressure (round-3
  * review finding).
  *
  * The contract: every such persist is registered here; the CALLER
  * releases after its terminal action —
  * {{{
  *   val dups = Dedup.minhashNearDups(docs, "doc_id", "body")
  *   dups.write.parquet(out)          // terminal action
  *   CacheRegistry.releaseAll()       // drops every tracked block
  * }}}
  * Verify releases after each query dump and Bench after each timed
  * entry; DedupSpec asserts no cached blocks survive a release.
  * Releasing is always safe for correctness — the cached plans are
  * deterministic and simply recompute if re-actioned.
  */
object CacheRegistry {

  private val live = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist `df` (MEMORY_AND_DISK) and track it for [[releaseAll]]. */
  def persist(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    live.add(df)
    df
  }

  /** Track an ALREADY-persisted Dataset for [[releaseAll]] (for ops that
    * manage persistence levels themselves, e.g. iterative algorithms
    * whose surviving round output must outlive the call). */
  def track[T <: Dataset[_]](df: T): T = {
    live.add(df)
    df
  }

  /** Unpersist every tracked DataFrame; returns how many were released. */
  def releaseAll(blocking: Boolean = false): Int = {
    var n = 0
    var d = live.poll()
    while (d != null) {
      d.unpersist(blocking)
      n += 1
      d = live.poll()
    }
    n
  }

  /** Run `body` and release only the caches IT registered — for library
    * code (streaming sinks, long-lived services) that must clean up
    * after itself without dropping caches other work in the session is
    * still holding (releaseAll is a session-wide hammer; a foreachBatch
    * sink calling it every trigger would silently unpersist a
    * concurrent job's tracked tables). Snapshot-diff, not try/finally
    * per entry: registrations land on the shared queue, so we drain and
    * re-add the survivors. */
  def scoped[A](body: => A): A = {
    val before = new java.util.IdentityHashMap[Dataset[_], java.lang.Boolean]()
    live.forEach(d => before.put(d, java.lang.Boolean.TRUE))
    try body
    finally {
      val keep = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]
      var d = live.poll()
      while (d != null) {
        if (before.containsKey(d)) keep += d else d.unpersist(false)
        d = live.poll()
      }
      keep.foreach(live.add)
    }
  }
}
