package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions._

class CorpusDiffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def snap(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text").withColumn("fp", md5(col("text")))
  }

  test("classifies added, removed, changed; drops unchanged") {
    val prev = snap((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
    val cur  = snap((1L, "alpha"), (2L, "beta EDITED"), (4L, "delta"))
    val got = CorpusDiff.snapshotDelta(cur, prev, "doc_id", "fp")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((2L, "changed"), (3L, "removed"), (4L, "added")))
  }

  test("identical snapshots produce an empty delta") {
    val a = snap((1L, "x"), (2L, "y"))
    assert(CorpusDiff.snapshotDelta(a, a, "doc_id", "fp").count() === 0L)
  }

  test("byte-identical re-download is not a change") {
    val prev = snap((7L, "same content"))
    val cur = snap((7L, "same content"))
    assert(CorpusDiff.snapshotDelta(cur, prev, "doc_id", "fp").count() === 0L)
  }

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("diff/patch round-trip: applyDelta(prev, delta(cur, prev)) == cur") {
    val prev = snap((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (5L, "keep me"))
    val cur  = snap((1L, "alpha"), (2L, "beta EDITED"), (4L, "delta"),
      (5L, "keep me"))
    val patch = CorpusDiff.snapshotDeltaWithPayload(cur, prev,
      "doc_id", "fp", Seq("text"))
    val next = CorpusDiff.applyDelta(prev, patch, "doc_id", Seq("text"))
    assert(asSet(next) === asSet(cur))
  }

  test("patch carries payloads only for added/changed; removed is null") {
    val prev = snap((1L, "a"), (2L, "b"))
    val cur  = snap((1L, "a2"), (3L, "c"))
    val rows = CorpusDiff.snapshotDeltaWithPayload(cur, prev,
        "doc_id", "fp", Seq("text"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)))).toSet
    assert(rows === Set(
      (1L, "changed", Some("a2")),
      (2L, "removed", None),
      (3L, "added", Some("c"))))
  }

  test("NULL fingerprints are values, not absence") {
    import spark.implicits._
    // doc 1: null fp on both sides -> unchanged; doc 2: value -> null
    // -> changed; doc 3 present only in prev -> removed
    def s(rows: (Long, Option[String])*) =
      rows.toDF("doc_id", "fp")
    val prev = s((1L, None), (2L, Some("x")), (3L, Some("y")))
    val cur  = s((1L, None), (2L, None))
    val got = CorpusDiff.snapshotDelta(cur, prev, "doc_id", "fp")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((2L, "changed"), (3L, "removed")))
  }

  test("re-applying the same patch is a no-op") {
    val prev = snap((1L, "a"), (2L, "b"))
    val cur  = snap((1L, "a2"), (3L, "c"))
    val patch = CorpusDiff.snapshotDeltaWithPayload(cur, prev,
      "doc_id", "fp", Seq("text"))
    val once = CorpusDiff.applyDelta(prev, patch, "doc_id", Seq("text"))
    val twice = CorpusDiff.applyDelta(once, patch, "doc_id", Seq("text"))
    assert(asSet(twice) === asSet(once))
  }
}
