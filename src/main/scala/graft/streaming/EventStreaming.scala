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

  /** Streaming exactly-once dedup by key within the watermark horizon —
    * `dropDuplicates` with event-time watermark (the streaming face of
    * the Dedup module). */
  def dedupByEventId(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 day").dropDuplicates("event_id")
}
