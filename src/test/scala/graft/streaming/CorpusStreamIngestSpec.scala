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
    // passes every surface gate, trips only the term blocklist
    val blocked = Seq((104L, mkDoc(41) + " visit our casino tonight"))
    (good ++ short ++ repetitive ++ dupes ++ blocked).toDF("doc_id", "text")
      .repartition(3) // several files -> several stream micro-batches
      .write.mode("overwrite").parquet(d)
    d
  }

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("streamed curation equals batch curation (gates + exact dedup)") {
    val terms = Seq("casino", "free money")
    val q = CorpusStreamIngest.curate(
      spark.readStream.schema(schema).parquet(srcDir), blocklist = terms)
      .writeStream.outputMode("append")
      .format("memory").queryName("curated_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("curated_stream")
      .select("content_hash", "text").as[(String, String)].collect().toSet
    val batch = CorpusStreamIngest.curate(spark.read.parquet(srcDir),
      blocklist = terms)
      .select("content_hash", "text").as[(String, String)].collect().toSet
    assert(got == batch, "stream and batch must keep the same documents")
    // the gates really bit: shorts/repetitive/dupes are gone, one
    // survivor per duplicated text
    val keptHashes = got.map(_._1)
    assert(got.size == 40, s"expected the 40 good docs, got ${got.size}")
    assert(keptHashes.size == got.size, "one row per distinct content")
  }

  /** Near-copy: first word replaced (the corpusWithPlants perturbation —
    * shingle Jaccard stays high). */
  private def nearCopy(text: String): String =
    "zzz " + text.substring(text.indexOf(' ') + 1)

  test("incremental near-dedup: first arrival wins across waves; " +
    "within-batch ties use cluster semantics; redelivery is a no-op") {
    val landing = TestSpark.tmpDir("near_landing")
    val state = TestSpark.tmpDir("near_state")
    val ckpt = TestSpark.tmpDir("near_ckpt")
    def run(): Unit = {
      val q = CorpusStreamIngest.startNear(spark, landing, state, ckpt)
      q.awaitTermination(180000)
    }
    // wave 1: 20 originals
    val wave1 = (0 until 20).map(i => (i.toLong, mkDoc(i)))
    wave1.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(landing)
    run()
    val kept1 = spark.read.parquet(s"$state/kept")
      .select("doc_id").as[Long].collect().toSet
    assert(kept1 == (0L until 20L).toSet, s"wave 1 all kept, got $kept1")

    // wave 2: near-copies of docs 0..4 (must lose to wave-1 arrivals),
    // 5 new originals (300..304), and a near-copy of NEW doc 300
    // (id 301 — the within-batch pair: cluster keeps the lower id)
    val wave2 =
      (0 until 5).map(i => (200L + i, nearCopy(mkDoc(i)))) ++
      (0 until 5).map(i => (300L + i * 2, mkDoc(100 + i))) :+
      (301L, nearCopy(mkDoc(100)))
    wave2.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(landing)
    run()
    val kept2 = spark.read.parquet(s"$state/kept")
      .select("doc_id").as[Long].collect().toSet
    val expected = (0L until 20L).toSet ++ Set(300L, 302L, 304L, 306L, 308L)
    assert(kept2 == expected,
      s"near-copies must lose to first arrivals: got ${kept2 -- expected} " +
        s"extra, ${expected -- kept2} missing")

    // redelivery (same texts, new ids): every doc estimates 1.0 against
    // the kept index -> nothing new is kept
    (0 until 20).map(i => (900L + i, mkDoc(i)))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(landing)
    run()
    val kept3 = spark.read.parquet(s"$state/kept")
      .select("doc_id").as[Long].collect().toSet
    assert(kept3 == expected, "identical redelivered texts are no-ops")

    // index consistency: one signature row per kept doc, bands = 8x
    val nKept = kept3.size.toLong
    assert(spark.read.parquet(s"$state/sigs").count() == nKept)
    assert(spark.read.parquet(s"$state/bands").count() == nKept * 8)
    // the standing invariant: NO kept pair is a near-duplicate (the
    // batch operator finds no surviving pairs over the kept corpus)
    val keptDocs = spark.read.parquet(s"$state/kept")
    val survivors = graft.ops.Dedup.minhashNearDups(
      keptDocs, "doc_id", "text", minJaccard = 0.5)
    assert(survivors.count() == 0L, "kept corpus must be near-dup-free")
    graft.ops.CacheRegistry.releaseAll()
    // when everything lands in ONE batch, the stream equals the batch
    // operator: replay all three waves into a fresh state in one wave
    val landing2 = TestSpark.tmpDir("near_landing2")
    val state2 = TestSpark.tmpDir("near_state2")
    val ckpt2 = TestSpark.tmpDir("near_ckpt2")
    // waves 1+2 only: the 900-id redeliveries are EXACT duplicates, and
    // batch exact-dedup keeps an arbitrary row of an identical pair —
    // only the streaming path (history wins) makes that deterministic
    val all = wave1 ++ wave2
    all.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(landing2)
    val q2 = CorpusStreamIngest.startNear(spark, landing2, state2, ckpt2)
    q2.awaitTermination(180000)
    val keptOne = spark.read.parquet(s"$state2/kept")
      .select("doc_id").as[Long].collect().toSet
    assert(keptOne == expected,
      "single-batch stream must equal the batch cluster semantics")
  }
}
