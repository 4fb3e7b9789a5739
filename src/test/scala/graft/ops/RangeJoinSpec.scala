package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The bin-bucketed range join must equal the naive theta join exactly —
  * including both inclusive window ends and bin-boundary-straddling
  * rows (a pair whose timestamps land in different bins must still
  * match via the left row's second covering bin).
  */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import java.sql.Timestamp

  private def ts(s: String) = Timestamp.valueOf(s)

  test("bin-bucketed range join equals the naive theta join") {
    import spark.implicits._
    // deterministic scatter of events across 3 keys and ~4 hours
    val rnd = new scala.util.Random(42)
    val left = (1 to 120).map { i =>
      (i, rnd.nextInt(3), ts(f"2024-01-01 ${10 + rnd.nextInt(4)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"))
    }.toDF("lid", "k", "lts")
    val right = (1 to 150).map { i =>
      (i, rnd.nextInt(3), ts(f"2024-01-01 ${10 + rnd.nextInt(4)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"), i * 1.5)
    }.toDF("rid", "k", "rts", "v")

    val before = 17L * 60 * 1000 // deliberately non-round window
    val after = 5L * 60 * 1000
    val got = RangeJoin.byTime(left, right, "k", "lts", "rts", before, after)
      .select(col("lid"), col("r_rid")).as[(Int, Int)].collect().toSet

    val exp = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") &&
          col("r.rts") >= col("l.lts") - expr(s"INTERVAL ${before / 1000} SECOND") &&
          col("r.rts") <= col("l.lts") + expr(s"INTERVAL ${after / 1000} SECOND"))
      .select(col("lid"), col("rid")).as[(Int, Int)].collect().toSet
    assert(exp.nonEmpty, "fixture produced no pairs — window too narrow")
    assert(got == exp)
  }

  test("window ends are inclusive and pairs are emitted once") {
    import spark.implicits._
    val w = 10L * 60 * 1000
    val left = Seq((1, 7, ts("2024-01-01 10:20:00"))).toDF("lid", "k", "lts")
    val right = Seq(
      (1, 7, ts("2024-01-01 10:10:00")), // exactly -before: inclusive
      (2, 7, ts("2024-01-01 10:20:00")), // exactly leftTs (after=0 end)
      (3, 7, ts("2024-01-01 10:09:59")), // one second out
      (4, 8, ts("2024-01-01 10:15:00")) // other key
    ).toDF("rid", "k", "rts")
    val got = RangeJoin.byTime(left, right, "k", "lts", "rts", w, 0L)
      .select(col("r_rid")).as[Int].collect().sorted.toSeq
    assert(got == Seq(1, 2))
  }
}
