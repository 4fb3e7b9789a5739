package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions._

/** Planted-sequence semantics of the funnel cascade and transition
  * matrix: strict in-order progression (a click BEFORE the first view
  * must not count), null propagation past an unreached step, and
  * deterministic tie-broken next-event pairing.
  */
class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import java.sql.Timestamp
  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, String, Long)*) = {
    import spark.implicits._
    rows.map { case (u, t, w, id) => (u, t, ts(w), id) }
      .toDF("user_id", "event_type", "ts", "event_id")
  }

  test("funnel requires strict order: pre-view clicks don't count") {
    // u1: full in-order funnel. u2: click BEFORE its only view — reaches
    // view only. u3: view then purchase, no click — purchase must NOT
    // count (cascade passes through click). u4: no view at all — absent.
    val events = ev(
      (1L, "view", "2024-01-01 10:00:00", 1L),
      (1L, "click", "2024-01-01 11:00:00", 2L),
      (1L, "purchase", "2024-01-01 12:00:00", 3L),
      (2L, "click", "2024-01-01 09:00:00", 4L),
      (2L, "view", "2024-01-01 10:00:00", 5L),
      (3L, "view", "2024-01-01 10:00:00", 6L),
      (3L, "purchase", "2024-01-01 11:00:00", 7L),
      (4L, "purchase", "2024-01-01 10:00:00", 8L))
    val got = EventAnalytics.funnelCounts(events, "user_id", "event_type",
        "ts", Seq("view", "click", "purchase"))
      .orderBy("step_idx")
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq(("view", 3L), ("click", 1L), ("purchase", 1L)))
  }

  test("funnel step times cascade with strict inequality on millis") {
    // equal-timestamp click does NOT satisfy 'strictly after the view'
    val events = ev(
      (1L, "view", "2024-01-01 10:00:00", 1L),
      (1L, "click", "2024-01-01 10:00:00", 2L),
      (1L, "click", "2024-01-01 10:00:01", 3L))
    val row = EventAnalytics.funnelSteps(events, "user_id", "event_type",
        "ts", Seq("view", "click")).collect().head
    assert(row.getLong(1) === ts("2024-01-01 10:00:00").getTime)
    assert(row.getLong(2) === ts("2024-01-01 10:00:01").getTime)
  }

  test("transition counts pair each event with the user's next, tie-broken") {
    // u1 has two events at the same ts: event_id order decides.
    val events = ev(
      (1L, "view", "2024-01-01 10:00:00", 1L),
      (1L, "click", "2024-01-01 10:00:00", 2L),
      (1L, "purchase", "2024-01-01 11:00:00", 3L),
      (2L, "view", "2024-01-01 10:00:00", 4L))
    val got = EventAnalytics.transitionCounts(events, "user_id",
        "event_type", "ts", "event_id")
      .orderBy("from_type", "to_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // u2's lone event emits nothing
    assert(got === Seq(("click", "purchase", 1L), ("view", "click", 1L)))
  }

  test("transition matrix row sums = events minus one per active user") {
    val events = ev(
      (1L, "view", "2024-01-01 10:00:00", 1L),
      (1L, "click", "2024-01-01 10:05:00", 2L),
      (1L, "view", "2024-01-01 10:10:00", 3L),
      (2L, "error", "2024-01-01 10:00:00", 4L),
      (2L, "error", "2024-01-01 10:01:00", 5L))
    val total = EventAnalytics.transitionCounts(events, "user_id",
        "event_type", "ts", "event_id")
      .agg(sum("n")).collect().head.getLong(0)
    assert(total === 5L - 2L)
  }

  test("experimentLift: hand-computed two-proportion z, per-user " +
    "dedup, degenerate-pool NULL") {
    import spark.implicits._
    // variant 0: users 0,2,4 (2 convert — user 0 converts TWICE, must
    // count once); variant 1: users 1,3 (1 converts)
    val events = Seq(
      (0L, 0, "goal"), (0L, 0, "goal"), (2L, 0, "goal"), (4L, 0, "x"),
      (1L, 1, "goal"), (3L, 1, "x"), (3L, 1, "y"))
      .toDF("user_id", "variant", "event_type")
    val r = EventAnalytics.experimentLift(events, "variant", "user_id",
      col("event_type") === "goal").collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 2) // n_a, c_a
    assert(r.getLong(2) == 2 && r.getLong(3) == 1) // n_b, c_b
    val (pA, pB) = (2.0 / 3, 1.0 / 2)
    assert(r.getDouble(4) == pA && r.getDouble(5) == pB)
    assert(r.getDouble(6) == pA - pB)
    val pool = 3.0 / 5
    val zExp = (pA - pB) /
      math.sqrt(pool * (1.0 - pool) * (1.0 / 3 + 1.0 / 2))
    assert(r.getDouble(7) == zExp)
    // degenerate pool (everyone converts): z NULL, rates still exact
    val allConv = Seq((0L, 0, "goal"), (1L, 1, "goal"))
      .toDF("user_id", "variant", "event_type")
    val d = EventAnalytics.experimentLift(allConv, "variant", "user_id",
      col("event_type") === "goal").collect().head
    assert(d.getDouble(4) == 1.0 && d.getDouble(5) == 1.0 && d.isNullAt(7))
    // a stray third arm is EXCLUDED (the documented two-arm contract):
    // counts match the same events with the arm-2 rows removed
    val threeArm = events.union(
      Seq((7L, 2, "goal"), (8L, 2, "x")).toDF("user_id", "variant",
        "event_type"))
    val t = EventAnalytics.experimentLift(threeArm, "variant", "user_id",
      col("event_type") === "goal").collect().head
    assert(t.getLong(0) == 3 && t.getLong(1) == 2 &&
      t.getLong(2) == 2 && t.getLong(3) == 1)
  }
}
