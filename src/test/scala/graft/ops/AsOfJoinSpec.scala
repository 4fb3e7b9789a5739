package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Semantics of the union-trick backward as-of join, in particular the
  * matched-row-atomicity property: NULLs in the matched right row must
  * surface as NULLs, never be backfilled from an older right row
  * (DuckDB ASOF semantics).
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import java.sql.Timestamp

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward asof picks latest right row at-or-before, per key") {
    import spark.implicits._
    val left = Seq(
      (1, ts("2024-01-01 10:00:00")),
      (1, ts("2024-01-01 12:00:00")),
      (2, ts("2024-01-01 09:00:00"))
    ).toDF("k", "lts")
    val right = Seq(
      (1, ts("2024-01-01 09:30:00"), "a"),
      (1, ts("2024-01-01 11:00:00"), "b"),
      (2, ts("2024-01-01 09:00:00"), "c") // exact tie: inclusive match
    ).toDF("k", "rts", "v")
    val got = AsOfJoin.backward(left, right, "k", "lts", "rts", Seq("v"))
      .orderBy("k", "lts").select("k", "asof_v").as[(Int, String)].collect()
    assert(got.toSeq == Seq((1, "a"), (1, "b"), (2, "c")))
  }

  test("left row before any right row gets NULL payload") {
    import spark.implicits._
    val left = Seq((1, ts("2024-01-01 08:00:00"))).toDF("k", "lts")
    val right = Seq((1, ts("2024-01-01 09:00:00"), "a")).toDF("k", "rts", "v")
    val got = AsOfJoin.backward(left, right, "k", "lts", "rts", Seq("v")).collect()
    assert(got.length == 1 && got(0).isNullAt(got(0).fieldIndex("asof_v")))
  }

  test("NULL column in matched right row stays NULL (no backfill from older rows)") {
    import spark.implicits._
    // right row at 11:00 has v=NULL, w=20; older row at 09:00 has v="old".
    // The 12:00 left row matches 11:00 → asof_v must be NULL, not "old".
    val left = Seq((1, ts("2024-01-01 12:00:00"))).toDF("k", "lts")
    val right = Seq(
      (1, ts("2024-01-01 09:00:00"), Option("old"), Option(10)),
      (1, ts("2024-01-01 11:00:00"), None: Option[String], Option(20))
    ).toDF("k", "rts", "v", "w")
    val row = AsOfJoin.backward(left, right, "k", "lts", "rts", Seq("v", "w"))
      .collect()(0)
    assert(row.isNullAt(row.fieldIndex("asof_v")),
      "asof_v leaked from an older right row")
    assert(row.getInt(row.fieldIndex("asof_w")) == 20)
  }

  test("all-NULL right payload still counts as a match") {
    import spark.implicits._
    val left = Seq((1, ts("2024-01-01 12:00:00"))).toDF("k", "lts")
    val right = Seq(
      (1, ts("2024-01-01 09:00:00"), Option("old")),
      (1, ts("2024-01-01 11:00:00"), None: Option[String])
    ).toDF("k", "rts", "v")
    val row = AsOfJoin.backward(left, right, "k", "lts", "rts", Seq("v"))
      .collect()(0)
    assert(row.isNullAt(row.fieldIndex("asof_v")))
  }

  test("forward asof picks earliest right row at-or-after, per key") {
    import spark.implicits._
    val left = Seq(
      (1, ts("2024-01-01 10:00:00")),
      (1, ts("2024-01-01 11:00:00")), // exact tie with right "b"
      (1, ts("2024-01-01 12:00:00")), // nothing after -> NULL
      (2, ts("2024-01-01 09:00:00"))
    ).toDF("k", "lts")
    val right = Seq(
      (1, ts("2024-01-01 10:30:00"), "a"),
      (1, ts("2024-01-01 11:00:00"), "b"),
      (2, ts("2024-01-01 09:30:00"), "c")
    ).toDF("k", "rts", "v")
    val got = AsOfJoin.forward(left, right, "k", "lts", "rts", Seq("v"))
      .orderBy("k", "lts").select("k", "asof_v").as[(Int, String)].collect()
    assert(got.toSeq == Seq((1, "a"), (1, "b"), (1, null), (2, "c")))
  }
}
