package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** DSIR importance weights: exact local replay of the micro-nat
  * arithmetic, ordering sanity (target-like docs outrank off-target
  * ones), zero-token handling, and the threshold+tie resample path.
  */
class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 64

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bucket(tok: String): Int =
    (java.lang.Long.parseLong(md5hex(tok).take(8), 16) % K).toInt

  /** Pure-JVM replay of Dsir.importanceWeights. */
  private def localWeights(raw: Seq[(Long, String)],
                           target: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    def toks(s: String) = s.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
    val cr = raw.flatMap(d => toks(d._2)).groupBy(bucket).view.mapValues(_.size)
    val ct = target.flatMap(d => toks(d._2)).groupBy(bucket).view.mapValues(_.size)
    val lr = (0 until K).map { b =>
      b -> math.round((math.log(ct.getOrElse(b, 0) + 1.0) -
        math.log(cr.getOrElse(b, 0) + 1.0)) * 1e6)
    }.toMap
    val nRaw = cr.values.sum.toLong
    val nTgt = ct.values.sum.toLong
    val g = math.round((math.log(nRaw.toDouble + K) -
      math.log(nTgt.toDouble + K)) * 1e6)
    raw.map { case (id, text) =>
      val ts = toks(text)
      id -> (ts.length.toLong,
        ts.map(t => lr(bucket(t))).sum + ts.length * g)
    }.toMap
  }

  private val raw = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "stock market prices fell sharply today"),
    (3L, "the dog sat on the log"),
    (4L, ""),
    (5L, "cat dog cat dog cat"))
  private val target = Seq(
    (101L, "cat dog cat mat"),
    (102L, "the cat and the dog sat"))

  test("weights equal the pure-JVM micro-nat replay exactly") {
    val got = Dsir.importanceWeights(raw.toDF("doc_id", "text"),
        target.toDF("doc_id", "text"), nBuckets = K)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == localWeights(raw, target))
  }

  test("target-like docs outrank off-target docs; empty doc scores 0") {
    val w = Dsir.importanceWeights(raw.toDF("doc_id", "text"),
        target.toDF("doc_id", "text"), nBuckets = K)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w(5L) > w(2L)) // cat/dog doc beats the finance doc
    assert(w(1L) > w(2L))
    assert(w(4L) == 0L)
  }

  test("resampleTop keeps exactly floor(n*fraction), highest weights first") {
    val kept = Dsir.resampleTop(raw.toDF("doc_id", "text"),
        target.toDF("doc_id", "text"), fraction = 0.4, nBuckets = K)
      .select("doc_id").as[Long].collect().toSet
    val w = localWeights(raw, target)
    val expect = raw.map(_._1).sortBy(id => (-w(id)._2, id)).take(2).toSet
    assert(kept == expect)
    assert(kept.size == 2)
  }

  test("resampleTop tie group fills by lowest id") {
    // all docs identical -> all weights equal -> pure tie: lowest ids win
    val same = (1L to 5L).map(i => (i, "alpha beta gamma"))
    val kept = Dsir.resampleTop(same.toDF("doc_id", "text"),
        Seq((9L, "alpha beta")).toDF("doc_id", "text"),
        fraction = 0.6, nBuckets = K)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L))
  }
}
