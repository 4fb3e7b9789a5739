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
    // scope to THIS op's call sites — the context is shared across
    // concurrently-running suites (the DedupSpec convention)
    assert(spark.sparkContext.getPersistentRDDs.values
      .forall(!_.toString.contains("TermStats.scala")))
  }

  test("bigramLmScore: hand-computed smoothed transition means") {
    // self-train: corpus bigrams "a b"x3, "b a"x1, "b x"x1
    // heads: a->3, b->2; V = |{a,b,x}| = 3
    val docs = Seq((1L, "a b a b"), (2L, "a b x")).toDF("doc_id", "text")
    val out = TermStats.bigramLmScore(docs)
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toList
    CacheRegistry.releaseAll()
    val pAB = 4.0 / 6.0 // (3+1)/(3+3)
    val pBA = 2.0 / 5.0 // (1+1)/(2+3)
    val pBX = 2.0 / 5.0
    assert(out.map(r => (r._1, r._2)) == List((1L, 3L), (2L, 2L)))
    assert(math.abs(out(0)._3 - (pAB + pBA + pAB) / 3) < 1e-12)
    assert(math.abs(out(1)._3 - (pAB + pBX) / 2) < 1e-12)
    // scope to THIS op's call sites — the context is shared across
    // concurrently-running suites (the DedupSpec convention)
    assert(spark.sparkContext.getPersistentRDDs.values
      .forall(!_.toString.contains("TermStats.scala")),
      "self-train persists the bigram stream; it must be released")
  }

  test("bigramLmScore train/score split: unseen mass and ranking") {
    // LM trained on a structured reference; scored docs include pure
    // gibberish whose every bigram is unseen -> exactly 1/V each
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text") // V = 2
    val score = Seq((9L, "x z"), (10L, "a b")).toDF("doc_id", "text")
    val out = TermStats.bigramLmScore(score, train = Some(train))
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toList
    // doc 9: (0+1)/(0+2) = 0.5 (coalesce path); doc 10: (2+1)/(2+2)
    assert(out.map(_._1) == List(9L, 10L))
    assert(math.abs(out(0)._3 - 0.5) < 1e-12)
    assert(math.abs(out(1)._3 - 3.0 / 4.0) < 1e-12)
    // in-vocabulary text must outrank gibberish once the reference has
    // sharp transitions (each head has ONE dominant follower)
    assert(out(1)._3 > out(0)._3)
  }

  test("heavyHitters equals the exact groupBy on a skewed corpus") {
    import org.apache.spark.sql.functions._
    // 60 docs: each repeats "hot0".."hot4" and adds 5 unique-ish tail
    // tokens; hot tokens count 60 each, tail tokens <= 3
    val docs = (0 until 60).map { i =>
      val hot = (0 until 5).map(h => s"hot$h").mkString(" ")
      val tail = (0 until 5).map(j => s"tail${(i * 5 + j) % 97}").mkString(" ")
      (i.toLong, s"$hot $tail")
    }.toDF("doc_id", "text")
    val exact = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 10)
      .as[(String, Long)].collect().toMap
    val gated = TermStats.heavyHitters(docs, "text", minCount = 10)
      .as[(String, Long)].collect().toMap
    assert(gated == exact, "the CMS gate must not change the exact result")
    assert(gated.keySet == (0 until 5).map(h => s"hot$h").toSet)
    assert(gated.values.forall(_ == 60L))
  }

  test("bpePairCounts: weighted character-pair counts over the vocab") {
    // words: banana x1, bana x1 -> pairs banana{ba,an,na,an,na},
    // bana{ba,an,na} -> an:3, na:3, ba:2 (ordered cnt desc, pair asc)
    val docs = Seq((1L, "banana bana")).toDF("doc_id", "text")
    val out = TermStats.bpePairCounts(docs)
      .as[(String, Long)].collect().toList
    assert(out == List(("an", 3L), ("na", 3L), ("ba", 2L)))
    // word frequency weights multiply, not re-tokenize: "aa" twice in
    // one doc and once in another counts 3
    val w = Seq((1L, "aa aa"), (2L, "AA ab")).toDF("doc_id", "text")
    val o2 = TermStats.bpePairCounts(w).as[(String, Long)].collect().toList
    assert(o2 == List(("aa", 3L), ("ab", 1L)))
    // single-character words contribute no pairs
    val s1 = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(TermStats.bpePairCounts(s1).count() == 0L)
  }

  test("vocabCoverage: OOV rate against the bounded top-k vocabulary") {
    // counts a:3 b:2 z:1 c:1 -> top-2 vocab {a, b}
    val docs = Seq((1L, "a a b z"), (2L, "a b c")).toDF("doc_id", "text")
    val cov = TermStats.vocabCoverage(docs, vocabSize = 2)
    // the bounded vocab side must broadcast (contrast the open-vocab
    // LM-count join, which must not)
    assert(cov.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"),
      "top-k vocab join should be a broadcast join")
    val out = cov.orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toList
    CacheRegistry.releaseAll()
    assert(out == List((1L, 4L, 1L, 0.25), (2L, 3L, 1L, 0.333333)))
    // scope to THIS op's call sites — the context is shared across
    // concurrently-running suites (the DedupSpec convention)
    assert(spark.sparkContext.getPersistentRDDs.values
      .forall(!_.toString.contains("TermStats.scala")),
      "the token stream persist must be registry-released")
    // tiebreak pins the vocab: with k=3 the token 'c' (ties 'z' on
    // count, wins alphabetically) enters the vocab, flipping doc 2
    val o3 = TermStats.vocabCoverage(docs, vocabSize = 3)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toList
    CacheRegistry.releaseAll()
    assert(o3 == List((1L, 4L, 1L, 0.25), (2L, 3L, 0L, 0.0)))
  }

  test("cms estimate is one-sided: never below the true count") {
    import org.apache.spark.sql.functions._
    val toks = (0 until 2000).map(i => Tuple1(s"w${i % 150}"))
      .toDF("token").withColumn("h", xxhash64(col("token")))
    val cms = toks.stat.countMinSketch("h", 0.001, 0.99, 42)
    val bos = new java.io.ByteArrayOutputStream()
    cms.writeTo(bos)
    val under = toks.groupBy("token")
      .agg(count(lit(1)).as("cnt"),
        first(graft.functions.CmsEstimateExpr(bos.toByteArray, col("h")))
          .as("est"))
      .filter(col("est") < col("cnt")).count()
    assert(under == 0L, "CMS must overestimate, never underestimate")
  }

  test("pmiCollocations: exact lift, minCount gate, tie and k " +
    "semantics") {
    import spark.implicits._
    // 'new york' always adjacent (perfect collocation); 'the cat'
    // frequent but 'the' is everywhere (low lift); 'rare pair' appears
    // once (cut by minCount=2)
    val docs = Seq(
      (1L, "new york new york the cat sat"),
      (2L, "the cat saw new york and the dog"),
      (3L, "rare pair the cat the dog new york")).toDF("doc_id", "text")
    val out = TermStats.pmiCollocations(docs, k = 3, minCount = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(4)))
    val toks = Seq("new york new york the cat sat",
      "the cat saw new york and the dog",
      "rare pair the cat the dog new york").flatMap(_.split(" "))
    val n = toks.size.toDouble
    def c(w: String) = toks.count(_ == w).toLong
    // 'new york': c_ab=4 (adjacent in every occurrence incl. doubled)
    val top = out.head
    assert(top._1 == "new york" && top._2 == 4L)
    assert(top._3 == 4.0 * n / (c("new") * c("york")).toDouble)
    // lift('new york') must dominate lift('the cat')
    val theCat = out.find(_._1 == "the cat").get
    assert(top._3 > theCat._3)
    // minCount cut 'rare pair' entirely
    assert(!out.exists(_._1 == "rare pair") && out.length <= 3)
  }
}
