package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SkewToolsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 90% of left rows share key 0 (the heavy hitter); keys 1..50 thin
  lazy val left = (0 until 20000).map { i =>
    (if (i % 10 != 0) 0L else (i / 10 % 50 + 1).toLong, i.toLong)
  }.toDF("k", "lv")
  lazy val right = (0L to 50L).map(k => (k, s"dim_$k")).toDF("k", "rv")

  test("joinSkewed equals a plain join on skewed data") {
    val got = SkewTools.joinSkewed(left, right, "k", hotThreshold = 1000)
    val plain = left.join(right, "k")
    assert(got.count() == plain.count())
    assert(got.select("k", "lv", "rv").except(plain.select("k", "lv", "rv")).isEmpty)
    assert(plain.select("k", "lv", "rv").except(got.select("k", "lv", "rv")).isEmpty)
  }

  test("joinSkewed with no hot keys degrades to the plain join") {
    val got = SkewTools.joinSkewed(left, right, "k", hotThreshold = Long.MaxValue)
    assert(got.count() == left.join(right, "k").count())
  }

  test("saltedCountDistinct is exact (salt partitions the value space)") {
    // key 0: 18000 rows but only 977 distinct values; others small
    val df = (0 until 20000).map { i =>
      (if (i % 10 != 0) 0L else (i / 10 % 50 + 1).toLong, (i % 977).toLong)
    }.toDF("k", "v")
    val got = SkewTools.saltedCountDistinct(df, "k", "v", salts = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = df.groupBy("k").agg(count_distinct(col("v")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exact)
  }
}
