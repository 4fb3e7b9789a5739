package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.ops.NgramLm

/** The LM gate must behave identically on a landing-directory stream
  * and on the batch frame: the persisted model is read-only state, so
  * scoring each micro-batch is stateless across batches and the union
  * of batch outputs equals one batch run over everything. */
class NgramLmStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkDoc(i: Int): String =
    (0 until 20).map(j => s"token${(i * 7 + j) % 40} link$j").mkString(" ")

  test("streamed LM gate equals the batch gate, model trained once") {
    val refDir = TestSpark.tmpDir("lm_stream_ref")
    val landing = TestSpark.tmpDir("lm_stream_src")
    val outDir = TestSpark.tmpDir("lm_stream_out")
    val ckpt = TestSpark.tmpDir("lm_stream_ckpt")
    val modelDir = TestSpark.tmpDir("lm_stream_model")

    // reference corpus: in-distribution docs; the model trains ONCE
    val ref = (0 until 30).map(i => (i.toLong, mkDoc(i)))
      .toDF("doc_id", "text")
    ref.write.mode("overwrite").parquet(refDir)
    NgramLm.trainModel(spark.read.parquet(refDir), modelDir)

    // landing corpus: in-distribution docs + OOV gibberish that must
    // fall below the gate. mkDoc's token at position j is
    // token((i*7+j)%40), so doc i shares trigrams with ref doc i' iff
    // i == i' (mod 40) — ids 100..109 (mod 40 = 20..29) are covered by
    // ref ids 20..29; 110+ would be trigram-OOV and land near the
    // backoff floor
    val docs = (100 until 110).map(i => (i.toLong, mkDoc(i))) ++
      Seq((900L, "zq9 xv8 qj7 wv6 nb5 mx4 kd3 pr2"))
    docs.toDF("doc_id", "text")
      .repartition(3) // several files -> several micro-batches
      .write.mode("overwrite").parquet(landing)

    val minScore = 0.01
    val q = CorpusStreamIngest.startLmGate(spark, landing, modelDir,
      outDir, ckpt, minScore)
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(outDir)
      .select("doc_id", "lm_bo_score").as[(Long, Double)].collect().toMap
    val batch = NgramLm.scoreFilter(spark, modelDir,
        spark.read.parquet(landing), minScore)
      .select(col("doc_id"), col("lm_bo_score"))
      .as[(Long, Double)].collect().toMap
    assert(streamed == batch)
    assert(!streamed.contains(900L))
    assert((100L until 110L).forall(streamed.contains))
    graft.ops.CacheRegistry.releaseAll()
  }
}
