package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DenoiseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex8(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(4)
      .map(b => f"${b & 0xff}%02x").mkString

  test("maskSpans: differential vs a pure-JVM replay, rate near target") {
    val docs = (0L until 200L)
      .map(i => (i, (0 until 30).map(j => s"w${(i * 31 + j * 7) % 97}")
        .mkString(" ")))
      .toDF("doc_id", "text")
    val out = Denoise.maskSpans(docs, maskFraction = 0.2, spanLen = 3)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    // pure-JVM replay of the contract: block draw, sentinel at starts
    val thr = Sampling.thresholdHex(0.2)
    val expected = (0L until 200L).map { id =>
      val ts = (0 until 30).map(j => s"w${(id * 31 + j * 7) % 97}")
      val mk = ts.indices.map(i => md5hex8(s"graft$id#${i / 3}") < thr)
      val text = ts.indices.flatMap { i =>
        if (mk(i)) { if (i % 3 == 0) Some("<mask>") else None }
        else Some(ts(i))
      }.mkString(" ")
      (id, text, mk.count(identity).toLong)
    }
    assert(out.toSeq == expected)
    // overall masked-token rate lands near 20%
    val rate = out.map(_._3).sum.toDouble / (200 * 30)
    assert(math.abs(rate - 0.2) < 0.04, s"rate $rate")
    // re-salting re-draws an independent mask
    val other = Denoise.maskSpans(docs, maskFraction = 0.2, spanLen = 3,
      salt = "epoch2").as[(Long, String, Long)].collect().sortBy(_._1)
    assert(other.map(_._2).toSeq != out.map(_._2).toSeq)
  }
}
