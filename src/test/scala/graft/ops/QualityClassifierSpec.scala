package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class QualityClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // two disjoint vocabularies -> linearly separable in hashed BoW space
  private val goodWords = Seq("alpha", "beta", "gamma", "delta", "epsilon")
  private val badWords = Seq("zeta", "theta", "kappa", "sigma", "omega")

  private def doc(i: Int, words: Seq[String]): String =
    (0 until 12).map(j => words((i * 7 + j * 3) % words.size)).mkString(" ")

  private def corpus(n: Int, offset: Int = 0) =
    (0 until n).map { i =>
      val y = i % 2
      val words = if (y == 1) goodWords else badWords
      (i.toLong + offset, doc(i, words), y)
    }.toDF("doc_id", "text", "label")

  test("separable corpus trains to perfect holdout accuracy") {
    val model = QualityClassifier.train(corpus(120), "doc_id", "text",
      "label", dim = 256, epochs = 12, lr = 2.0)
    val holdout = corpus(60, offset = 1000)
    val scored = QualityClassifier.score(holdout, model, "doc_id", "text")
    val acc = scored.filter(col("keep") === col("label")).count()
    assert(acc == 60, s"holdout accuracy $acc/60")
    // scores are actually separated, not all hovering at the threshold
    val (lo, hi) = scored
      .agg(max(when(col("label") === 0, col("score"))),
        min(when(col("label") === 1, col("score"))))
      .as[(Double, Double)].head()
    assert(lo < 0.2 && hi > 0.8, s"weak separation: bad<=$lo good>=$hi")
  }

  test("training is bit-for-bit reproducible") {
    val m1 = QualityClassifier.train(corpus(80), "doc_id", "text",
      "label", dim = 128, epochs = 5, lr = 1.0)
    val m2 = QualityClassifier.train(corpus(80), "doc_id", "text",
      "label", dim = 128, epochs = 5, lr = 1.0)
    assert(m1.biasMicro == m2.biasMicro)
    assert(m1.weightsMicro.toSeq == m2.weightsMicro.toSeq)
  }

  test("zero-token docs score at the bias and still gate") {
    val model = QualityClassifier.train(corpus(40), "doc_id", "text",
      "label", dim = 64, epochs = 3, lr = 1.0)
    val scored = QualityClassifier.score(
      Seq((9999L, "", 0)).toDF("doc_id", "text", "label"),
      model, "doc_id", "text")
    val r = scored.select("score", "keep").head()
    val expected = 1.0 / (1.0 + math.exp(-(model.biasMicro / 1e6)))
    assert(math.abs(r.getDouble(0) - expected) < 1e-3)
    assert(r.getInt(1) == (if (r.getDouble(0) >= 0.5) 1 else 0))
  }

  test("balanced labels with empty features keep the bias near zero") {
    // all-empty texts: only the bias can move, and a balanced corpus
    // has zero mean residual at w = 0 -> bias stays 0
    val df = (0 until 10).map(i => (i.toLong, "", i % 2))
      .toDF("doc_id", "text", "label")
    val m = QualityClassifier.train(df, "doc_id", "text", "label",
      dim = 16, epochs = 4, lr = 1.0)
    assert(m.biasMicro == 0L)
    assert(m.weightsMicro.forall(_ == 0L))
  }
}
