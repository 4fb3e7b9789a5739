package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** IR metrics: exact agreement with hand-computed precision/recall/
  * MRR/nDCG on a judged toy ranking, including the edge cases (no
  * relevant found, no qrels at all, R < k truncating IDCG).
  */
class RankingMetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // query 1: rel at ranks 1 and 3 of 3, R=2 (perfect-ish)
  // query 2: rel at rank 2 only, R=3 (recall 1/3)
  // query 3: nothing relevant found, R=1
  // query 4: no qrels at all
  // query 5: judged (R=1) but the ranking returns NOTHING for it
  private val ranking = Seq(
    (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
    (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3),
    (3L, 30L, 1), (3L, 31L, 2), (3L, 32L, 3),
    (4L, 40L, 1), (4L, 41L, 2), (4L, 42L, 3))
  private val qrels = Seq(
    (1L, 10L), (1L, 12L),
    (2L, 21L), (2L, 90L), (2L, 91L),
    (3L, 99L),
    (5L, 50L))

  test("hand-computed metrics at k=3, all edge cases") {
    val out = RankingMetrics.evaluate(
      ranking.toDF("query_id", "doc_id", "rank"),
      qrels.toDF("query_id", "doc_id"), k = 3)
      .collect().map(r => r.getLong(0) -> r).toMap

    def g(r: Int) = RankingMetrics.dcgGainMicro(r)
    // q1: n_rel_top=2, dcg=g(1)+g(3), R=2 -> idcg=g(1)+g(2), mrr=1/1
    val q1 = out(1L)
    assert(q1.getLong(1) == 2 && q1.getLong(2) == g(1) + g(3))
    assert(q1.getLong(3) == 2)
    assert(q1.getDouble(4) == 2.0 / 3 && q1.getDouble(5) == 1.0)
    assert(q1.getLong(6) == RankingMetrics.rrMicro(1))
    assert(q1.getLong(7) == g(1) + g(2))
    assert(q1.getDouble(8) ==
      (g(1) + g(3)).toDouble / (g(1) + g(2)))
    // q2: rel at rank 2; R=3 >= k -> idcg = g(1)+g(2)+g(3)
    val q2 = out(2L)
    assert(q2.getLong(1) == 1 && q2.getLong(2) == g(2))
    assert(q2.getLong(3) == 3)
    assert(q2.getDouble(5) == 1.0 / 3)
    assert(q2.getLong(6) == RankingMetrics.rrMicro(2))
    assert(q2.getLong(7) == g(1) + g(2) + g(3))
    // q3: nothing found -> all zeros except n_rel
    val q3 = out(3L)
    assert(q3.getLong(1) == 0 && q3.getLong(2) == 0 && q3.getLong(3) == 1)
    assert(q3.getDouble(4) == 0.0 && q3.getDouble(5) == 0.0)
    assert(q3.getLong(6) == 0L && q3.getDouble(8) == 0.0)
    // q4: no qrels -> n_rel 0, everything 0 (idcg 0 guard)
    val q4 = out(4L)
    assert(q4.getLong(3) == 0 && q4.getDouble(5) == 0.0 &&
      q4.getLong(7) == 0L && q4.getDouble(8) == 0.0)
    // q5: judged but unreturned — must APPEAR and score 0 (not vanish
    // from the mean); idcg reflects its R=1 judgment set
    val q5 = out(5L)
    assert(q5.getLong(1) == 0 && q5.getLong(2) == 0 && q5.getLong(3) == 1)
    assert(q5.getDouble(4) == 0.0 && q5.getDouble(5) == 0.0)
    assert(q5.getLong(6) == 0L && q5.getLong(7) == g(1) &&
      q5.getDouble(8) == 0.0)
  }

  test("micro-unit literals match their definitions") {
    assert(RankingMetrics.dcgGainMicro(1) == 1000000L) // 1/log2(2) = 1
    assert(RankingMetrics.dcgGainMicro(3) ==
      math.round(1e6 / (math.log(4.0) / math.log(2.0)))) // = 500000
    assert(RankingMetrics.rrMicro(4) == 250000L)
  }
}
