package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** The corpus curation transform must behave identically on a file
  * stream and on the batch frame — one pipeline definition, two run
  * modes (the training-data twin of EventStreamingSpec).
  */
class CorpusStreamIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // corpus with planted failures for every gate: short docs, repeated
  // boilerplate, exact duplicates (incl. cross-file re-delivery)
  def mkDoc(i: Int): String =
    (0 until 30).map(j => s"word${(i * 97 + j * 13) % 500} tail$j").mkString(" ")

  lazy val srcDir: String = {
    val d = TestSpark.tmpDir("corpus_stream_src")
    val good = (0 until 40).map(i => (i.toLong, mkDoc(i)))
    val short = Seq((100L, "too short"))
    val repetitive = Seq((101L, ("spam " * 60).trim))
    val dupes = Seq((102L, mkDoc(0)), (103L, mkDoc(1)))
    (good ++ short ++ repetitive ++ dupes).toDF("doc_id", "text")
      .repartition(3) // several files -> several stream micro-batches
      .write.mode("overwrite").parquet(d)
    d
  }

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("streamed curation equals batch curation (gates + exact dedup)") {
    val q = CorpusStreamIngest.curate(
      spark.readStream.schema(schema).parquet(srcDir))
      .writeStream.outputMode("append")
      .format("memory").queryName("curated_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("curated_stream")
      .select("content_hash", "text").as[(String, String)].collect().toSet
    val batch = CorpusStreamIngest.curate(spark.read.parquet(srcDir))
      .select("content_hash", "text").as[(String, String)].collect().toSet
    assert(got == batch, "stream and batch must keep the same documents")
    // the gates really bit: shorts/repetitive/dupes are gone, one
    // survivor per duplicated text
    val keptHashes = got.map(_._1)
    assert(got.size == 40, s"expected the 40 good docs, got ${got.size}")
    assert(keptHashes.size == got.size, "one row per distinct content")
  }
}
