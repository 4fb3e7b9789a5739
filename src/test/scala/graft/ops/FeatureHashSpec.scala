package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions._

class FeatureHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tf(rows: (Long, String)*) = {
    import spark.implicits._
    FeatureHash.hashedTf(rows.toDF("doc_id", "text"), "doc_id", "text", 64)
  }

  test("buckets stay in [0, dim); identical docs get identical vectors") {
    val out = tf((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.forall { case (_, b, _) => b >= 0 && b < 64 })
    val v1 = out.filter(_._1 == 1L).map(t => (t._2, t._3)).toSet
    val v2 = out.filter(_._1 == 2L).map(t => (t._2, t._3)).toSet
    assert(v1 === v2 && v1.nonEmpty)
  }

  test("repeated tokens accumulate weight with a consistent sign") {
    val once = tf((1L, "zebra")).collect().head
    val thrice = tf((1L, "zebra zebra zebra")).collect().head
    assert(thrice.getInt(1) === once.getInt(1))
    assert(thrice.getLong(2) === 3L * once.getLong(2))
    assert(math.abs(once.getLong(2)) === 1L)
  }

  test("total absolute weight is bounded by the token count") {
    val n = tf((1L, "one two three four five six"))
      .agg(sum(abs(col("weight")))).collect().head.getLong(0)
    assert(n <= 6L && n > 0L)
  }

  test("deterministic across invocations (no vocabulary state)") {
    val a = tf((9L, "the quick brown fox")).collect().toSet
    val b = tf((9L, "the quick brown fox")).collect().toSet
    assert(a === b)
  }
}
