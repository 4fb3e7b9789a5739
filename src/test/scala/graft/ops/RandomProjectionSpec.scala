package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class RandomProjectionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matrix is deterministic with Achlioptas bucket masses") {
    val m1 = RandomProjection.matrix(64, 16, "rp")
    val m2 = RandomProjection.matrix(64, 16, "rp")
    assert(m1.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq)
    val flat = m1.flatten
    assert(flat.forall(v => v == 1.0 || v == -1.0 || v == 0.0))
    // 1/6 : 1/6 : 2/3 within loose binomial bounds over 1024 entries
    val zeros = flat.count(_ == 0.0).toDouble / flat.length
    val plus = flat.count(_ == 1.0).toDouble / flat.length
    assert(zeros > 0.58 && zeros < 0.75, s"zeros $zeros")
    assert(plus > 0.10 && plus < 0.23, s"plus $plus")
    // different seed, different matrix
    assert(RandomProjection.matrix(64, 16, "other").map(_.toSeq).toSeq
      != m1.map(_.toSeq).toSeq)
  }

  test("projection is linear (exact on integer-valued vectors)") {
    val x = Array.tabulate(64)(i => (i % 7 - 3).toFloat)
    val y = Array.tabulate(64)(i => ((i * 3) % 5 - 2).toFloat)
    val sum = x.zip(y).map { case (a, b) => a + b }
    val df = Seq((1L, x), (2L, y), (3L, sum)).toDF("vec_id", "embedding")
    val p = RandomProjection.project(df, 64, 16)
      .select(col("vec_id"), col("rp")).as[(Long, Seq[Double])]
      .collect().toMap
    val lhs = p(3L)
    val rhs = p(1L).zip(p(2L)).map { case (a, b) => a + b }
    // ±1/0 entries on small integers: products and sums stay exact
    lhs.zip(rhs).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
  }

  test("identical vectors project to projected-cosine 1") {
    val v = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val df = Seq((1L, v), (2L, v.clone())).toDF("vec_id", "embedding")
    val p = RandomProjection.project(df, 64, 16)
    val cos = p.as("a").crossJoin(p.as("b"))
      .where(col("a.vec_id") < col("b.vec_id"))
      .select(Similarity.cosine(col("a.rp"), col("b.rp")).as("c"))
      .as[Double].collect().head
    assert(math.abs(cos - 1.0) < 1e-12)
  }

  test("projectedTopK recovers the brute top-1 on clustered vectors") {
    // three tight clusters far apart: the 16-dim shortlist cannot miss
    // the query's own cluster, and the exact re-rank restores the true
    // within-cluster order
    def base(c: Int): Array[Float] = {
      val r = new scala.util.Random(c * 7919 + 101)
      Array.fill(64)((r.nextGaussian() * 0.1 + (if (c == 0) 4.0
        else if (c == 1) -4.0 else 0.0)).toFloat)
    }
    val rows = for (c <- 0 until 3; i <- 0 until 20) yield {
      val r = new scala.util.Random(c * 1000 + i)
      val v = base(c).map(x => (x + r.nextGaussian().toFloat * 0.05f))
      ((c * 100 + i).toLong, v)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id").isin(0L, 100L, 200L))
    val brute = Similarity.bruteForceTopK(corpus, queries, k = 1)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toMap
    val rp = RandomProjection.projectedTopK(corpus, queries, k = 1,
        shortlist = 16, dimIn = 64, dimOut = 16)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toMap
    assert(rp == brute)
  }

  test("projectedTopK emits dense ranks 1..k per query") {
    val rows = (0 until 40).map { i =>
      val r = new scala.util.Random(i)
      (i.toLong, Array.fill(64)(r.nextGaussian().toFloat))
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val out = RandomProjection.projectedTopK(corpus,
        corpus.filter(col("vec_id") < 3), k = 5, shortlist = 12,
        dimIn = 64, dimOut = 16)
      .select("query_id", "rank").as[(Long, Int)].collect()
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.values.foreach(rs => assert(rs.map(_._2).sorted.toSeq == (1 to 5)))
  }
}
