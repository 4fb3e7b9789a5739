package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (reference: ST1/ST2 reimagined as
  * streams — the reference's "streaming" is batch append scripts; the
  * engine adds true incremental processing per SURVEY §2.10/§2.11).
  *
  * All transforms are source-agnostic DataFrame -> DataFrame so the same
  * code runs on `readStream` (file source watching a landing directory —
  * the complete_ndvi flow) and on batch frames in tests.
  */
object EventStreaming {

  /** Watermarked tumbling-window aggregation (late data tolerated up to
    * the watermark, the streaming analog of ST2's late-data handling). */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total_value"))

  final case class EventRow(event_id: Long, ts: java.sql.Timestamp,
                            user_id: Long, event_type: String, value: Double)
  final case class SessionSummary(user_id: Long, n_events: Long,
                                  total_value: Double)

  /** Stateful per-user running aggregation via mapGroupsWithState —
    * the custom-state path (KeyValueGroupedDataset) for logic windows
    * can't express. Emits the updated per-user summary each batch.
    */
  def userRunningSummary(spark: SparkSession,
                         events: Dataset[EventRow]): Dataset[SessionSummary] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionSummary, SessionSummary](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[SessionSummary]) =>
          val prev = state.getOption.getOrElse(SessionSummary(userId, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { r => n += 1; tot += r.value }
          val next = SessionSummary(userId, n, tot)
          state.update(next)
          next
      }
  }

  /** Continuously-maintained per-key top-k — the streaming face of
    * [[graft.functions.TopKAgg]] (same (score DESC, id ASC) total
    * order, NULL-free inputs): each micro-batch folds its new rows
    * into a k-bounded per-key state, so state stays O(k) per key no
    * matter how much history has streamed past — the property that
    * makes a per-source "best documents" leaderboard maintainable
    * over an unbounded corpus stream. Emits the key's CURRENT top-k
    * each trigger that touches it (update mode). */
  case class Scored(key: String, id: Long, score: Double)
  case class TopK(key: String, ids: Seq[Long], scores: Seq[Double])

  def topKPerKey(spark: SparkSession, rows: Dataset[Scored], k: Int)
      : Dataset[TopK] = {
    import spark.implicits._
    rows.groupByKey(_.key)
      .mapGroupsWithState[TopK, TopK](GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Scored], state: GroupState[TopK]) =>
          val prev = state.getOption
            .map(s => s.scores.zip(s.ids).toVector).getOrElse(Vector.empty)
          // sort with the batch aggregate's comparator, NOT sortBy(-sc):
          // TopKAgg.better ranks NaN first (Double.compare semantics);
          // negation-based ordering ranks it last and the twins diverge
          val top = (prev ++ it.map(r => (r.score, r.id)))
            .sortWith((a, b) => graft.functions.TopKAgg.better(
              a._1, a._2, b._1, b._2)).take(k)
          val next = TopK(key, top.map(_._2), top.map(_._1))
          state.update(next)
          next
      }
  }

  /** Streaming exactly-once dedup by key within the watermark horizon —
    * `dropDuplicates` with event-time watermark (the streaming face of
    * the Dedup module). */
  def dedupByEventId(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 day").dropDuplicates("event_id")

  /** Watermarked SESSION windows per user (30-minute inactivity gap) —
    * the streaming face of the batch `session_windows` query: state
    * closes and emits once the watermark passes a session's gap. */
  def userSessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  final case class LastPurchase(ts: java.sql.Timestamp, value: Double)
  final case class ClickAttribution(user_id: Long, click_id: Long,
                                    click_ts: java.sql.Timestamp,
                                    asof_purchase_ts: Option[java.sql.Timestamp],
                                    asof_value: Option[Double])

  /** Streaming AS-OF attribution: each click attributed to the latest
    * same-user purchase with purchase_ts <= click_ts — the streaming
    * face of [[graft.ops.AsOfJoin.backward]] (whose unbounded window
    * cannot run on a stream). State per user is ONE row (the last
    * purchase seen), so unlike an interval join there is no lookback
    * horizon and no per-event state growth — exactly the property that
    * makes as-of the scalable attribution shape at 100 TB.
    *
    * Within a micro-batch rows are sorted by event time (purchases
    * before clicks on ties — as-of is inclusive, AsOfJoin.backward's
    * `__side` rule); across micro-batches results are exact when
    * batches respect event-time order (the file-source replay and
    * AvailableNow cases). EventStreamingSpec pins stream == batch.
    */
  def clickPurchaseAttribution(spark: SparkSession, events: Dataset[EventRow])
      : Dataset[ClickAttribution] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastPurchase, ClickAttribution](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[LastPurchase]) =>
          val ordered = rows.toSeq.sortBy(r =>
            (r.ts.getTime, if (r.event_type == "purchase") 0 else 1))
          var last = state.getOption
          val out = Seq.newBuilder[ClickAttribution]
          ordered.foreach { r =>
            if (r.event_type == "purchase") last = Some(LastPurchase(r.ts, r.value))
            else if (r.event_type == "click")
              out += ClickAttribution(userId, r.event_id, r.ts,
                last.map(_.ts), last.map(_.value))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  final case class FunnelTimes(user_id: Long, n_seen: Long,
                               times: Seq[Option[Long]])

  /** Streaming strict-order funnel: the incremental face of
    * [[graft.ops.EventAnalytics.funnelSteps]]. State per user is ONE
    * Option[Long] per step (the cascade times so far) — constant-size,
    * no event retention — and each batch emits the user's updated
    * snapshot tagged with a monotone `n_seen` so a sink can keep the
    * latest. The greedy in-time-order update (take the first step-k
    * event strictly after t_(k-1)) IS the batch min-after-min cascade
    * when batches respect event-time order (file replay / AvailableNow —
    * the same contract as [[clickPurchaseAttribution]]).
    */
  def funnelProgress(spark: SparkSession, events: Dataset[EventRow],
                     steps: Seq[String]): Dataset[FunnelTimes] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[FunnelTimes, FunnelTimes](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[FunnelTimes]) =>
          val prev = state.getOption
          val cur = prev.map(_.times.toArray)
            .getOrElse(Array.fill[Option[Long]](steps.size)(None))
          var seen = prev.map(_.n_seen).getOrElse(0L)
          // ties: ts then event_id, matching the batch op's determinism
          rows.toSeq.sortBy(r => (r.ts.getTime, r.event_id)).foreach { r =>
            seen += 1
            // every step index matching the type (a funnel may repeat a
            // type, e.g. view -> view): the strict-> cascade means one
            // event can fill at most one of them
            steps.indices.foreach { k =>
              if (steps(k) == r.event_type && cur(k).isEmpty &&
                  (k == 0 || cur(k - 1).exists(_ < r.ts.getTime)))
                cur(k) = Some(r.ts.getTime)
            }
          }
          val next = FunnelTimes(userId, seen, cur.toSeq)
          state.update(next)
          next
      }
  }

  /** Watermarked stream-stream INTERVAL join: each click joins the
    * impressions of the same user within the preceding `lookback`. Both
    * sides carry watermarks + the time-range predicate, so state is
    * bounded and evicted — the canonical bounded-state stream join
    * shape.
    */
  def clicksWithRecentImpressions(impressions: DataFrame,
                                  clicks: DataFrame,
                                  lookback: String = "1 hour"): DataFrame = {
    val imp = impressions
      .select(col("user_id").as("i_user"), col("ts").as("imp_ts"),
        col("event_id").as("imp_id"))
      .withWatermark("imp_ts", lookback)
    val clk = clicks
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", lookback)
    clk.join(imp,
      col("c_user") === col("i_user") &&
        col("imp_ts") <= col("click_ts") &&
        col("imp_ts") >= col("click_ts") - expr(s"INTERVAL '$lookback'"))
      .select(col("c_user").as("user_id"), col("click_id"), col("imp_id"),
        col("click_ts"), col("imp_ts"))
  }
}
