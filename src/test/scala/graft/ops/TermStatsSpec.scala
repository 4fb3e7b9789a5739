package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TermStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tfidfTopTerms matches hand-computed scores and tiebreaks") {
    // N = 3 docs; df: apple 2, banana 2, cherry 1, date 1
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "apple date date date")
    ).toDF("doc_id", "text")
    val out = TermStats.tfidfTopTerms(docs, k = 2)
      .orderBy("doc_id", "rank")
      .as[(Long, String, Int, Double)].collect().toList
    // doc 1: apple tf=2 -> 2*3/2=3.0; banana 1*3/2=1.5
    // doc 2: cherry 1*3/1=3.0; banana 1.5
    // doc 3: date 3*3/1=9.0; apple 1*3/2=1.5
    assert(out == List(
      (1L, "apple", 1, 3.0), (1L, "banana", 2, 1.5),
      (2L, "cherry", 1, 3.0), (2L, "banana", 2, 1.5),
      (3L, "date", 1, 9.0), (3L, "apple", 2, 1.5)))
    // equal scores break ties alphabetically on the term
    val tie = Seq((1L, "zz aa")).toDF("doc_id", "text")
    val t = TermStats.tfidfTopTerms(tie, k = 2)
      .orderBy("rank").as[(Long, String, Int, Double)].collect().toList
    assert(t.map(_._2) == List("aa", "zz"))
  }

  test("sourceOverlap computes exact pairwise shingle Jaccard") {
    // srcA: shingles {a b c, b c d}; srcB: {b c d, c d e}; srcC disjoint
    val docs = Seq(
      ("A", "a b c d"),      // shingles: "a b c", "b c d"
      ("B", "b c d e"),      // shingles: "b c d", "c d e"
      ("C", "x y z w")       // shingles: "x y z", "y z w"
    ).toDF("source", "text")
    val out = TermStats.sourceOverlap(docs, n = 3)
      .as[(String, String, Long, Double)].collect().toList
    // only (A,B) intersect: 1 common of (2 + 2 - 1) = 1/3
    assert(out == List(("A", "B", 1L, 0.333333)))
    // persisted shingle set must be registry-released after the action
    CacheRegistry.releaseAll()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
