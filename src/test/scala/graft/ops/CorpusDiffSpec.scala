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
}
