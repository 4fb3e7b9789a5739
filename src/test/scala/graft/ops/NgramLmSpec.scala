package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class NgramLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("ngramlm_spec").toString

  test("backoff chain scores a hand-computed fixture exactly") {
    // train: "a b c", "a b d" (BOS-padded). Counts:
    //   c3: (B,B,a)=2 (B,a,b)=2 (a,b,c)=1 (a,b,d)=1
    //   c2: (B,B)=2 (B,a)=2 (a,b)=2 (b,c)=1 (b,d)=1
    //   c1: B=4 a=2 b=2 c=1 d=1   N=10  V=5
    val train = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val dir = tmp()
    NgramLm.trainModel(train, dir)
    // "a b e": (B,B,a) -> 2/2 = 1; (B,a,b) -> 2/2 = 1;
    // (a,b,e) -> trigram unseen, bigram (b,e) unseen, e OOV:
    //   0.4 * (0.4 * ((0 + 1) / (10 + 5)))
    val scored = NgramLm.scoreWithModel(spark, dir,
        Seq((9L, "a b e")).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(scored.length == 1)
    val (_, n, s) = scored.head
    assert(n == 3)
    val expected = (1.0 + 1.0 + 0.4 * (0.4 * (1.0 / 15.0))) / 3.0
    assert(math.abs(s - expected) < 1e-12, s"got $s expected $expected")
  }

  test("seen-bigram backoff takes exactly one 0.4 penalty") {
    // "b c" is a trained bigram; trigram (a,b,c) IS seen in train, so
    // plant a context that forces the bigram level: (c, b, c) — the
    // trigram is unseen but (b,c) has c2=1 and c1(b)=2.
    val train = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val dir = tmp()
    NgramLm.trainModel(train, dir)
    val scored = NgramLm.scoreWithModel(spark, dir,
        Seq((9L, "c b c")).toDF("doc_id", "text"))
      .collect().head
    // (B,B,c): unseen tri; bigram (B,c) unseen; c seen: 0.4*0.4*((1+1)/15)
    // (B,c,b): unseen tri; bigram (c,b) unseen; b seen: 0.4*0.4*((2+1)/15)
    // (c,b,c): unseen tri; bigram (b,c) SEEN: 0.4*(1/2)
    val expected = (0.16 * (2.0 / 15.0) + 0.16 * (3.0 / 15.0) + 0.4 * 0.5) / 3.0
    assert(math.abs(scored.getDouble(2) - expected) < 1e-12)
  }

  test("trainAndScore equals trainModel + scoreWithModel; filter gates") {
    val docs = (1L to 20L).map(i =>
      (i, s"the quick brown fox ${i % 3} jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val d1 = tmp(); val d2 = tmp()
    val a = NgramLm.trainAndScore(docs, docs, d1)
      .orderBy("doc_id").collect().toSeq
    NgramLm.trainModel(docs, d2)
    val b = NgramLm.scoreWithModel(spark, d2, docs)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    // gibberish scores at the Laplace floor; the in-distribution docs
    // score high (their trigrams are trained self-counts)
    val probe = docs.union(
      Seq((99L, "zz9 qq8 vv7 kk6 mm5")).toDF("doc_id", "text"))
    val kept = NgramLm.scoreFilter(spark, d2, probe, minScore = 0.01)
      .select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(99L))
    assert((1L to 20L).forall(kept.contains))
    CacheRegistry.releaseAll()
  }

  test("scoring plan: no global sort, meta rides a broadcast") {
    // the 100 TB shape: count-table joins keyed on the n-gram, the
    // one-row (N, V) meta as a broadcast nested loop — never a
    // CartesianProduct, never a global SortExec
    val docs = (1L to 50L).map(i => (i, mkDocPlan(i))).toDF("doc_id", "text")
    val dir = tmp()
    NgramLm.trainModel(docs, dir)
    val plan = NgramLm.scoreWithModel(spark, dir, docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "meta must broadcast, not cartesian")
    assert(!plan.contains("SortExec") || !plan.contains("Exchange rangepartitioning"),
      "no global sort in the scoring plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      "the one-row meta should ride a broadcast")
    CacheRegistry.releaseAll()
  }

  private def mkDocPlan(i: Long): String =
    (0 until 12).map(j => s"w${(i * 3 + j) % 17}").mkString(" ")

  test("zero-token documents neither crash nor score") {
    // empty/whitespace text tokenizes to [] -> the padded array has
    // size 2, where an unguarded sequence(3, size) DESCENDS and
    // element_at(ts, 0) throws; such docs must simply drop out
    val train = Seq((1L, "a b c"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val dir = tmp()
    NgramLm.trainModel(train, dir)
    val scored = NgramLm.scoreWithModel(spark, dir, train)
      .select("doc_id").as[Long].collect().toSet
    assert(scored == Set(1L))
    CacheRegistry.releaseAll()
  }

  test("persisted model carries the padded-stream counts") {
    val train = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val dir = tmp()
    NgramLm.trainModel(train, dir)
    val c3 = spark.read.parquet(s"$dir/trigrams")
      .where(col("u") === NgramLm.Bos && col("v") === NgramLm.Bos &&
        col("w") === "a")
      .select("c3").as[Long].collect()
    assert(c3.toSeq == Seq(2L))
    val meta = spark.read.parquet(s"$dir/meta").collect().head
    assert(meta.getLong(0) == 10L && meta.getLong(1) == 5L)
    CacheRegistry.releaseAll()
  }
}
