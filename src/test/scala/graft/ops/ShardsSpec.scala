package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class ShardsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def mkDoc(i: Int): String =
    (0 until (5 + i % 20)).map(j => s"tok${(i * 31 + j) % 100}").mkString(" ")

  lazy val corpus = (0 until 60).map(i => (i.toLong, mkDoc(i)))
    .toDF("doc_id", "text")

  test("writeShards: budget, id-order, full partition, clean validate") {
    val dir = TestSpark.tmpDir("shards_out")
    val manifest = Shards.writeShards(corpus, dir, tokensPerShard = 40)
      .orderBy("shard_id").collect()
    assert(manifest.length > 1, "a 60-doc corpus at 40 tokens must split")
    // the data partitions the corpus exactly: every doc once
    val data = spark.read.parquet(s"$dir/data")
    assert(data.select("doc_id").as[Long].collect().sorted.toSeq
      == (0L until 60L))
    // shards are contiguous doc_id ranges (prefix-sum assignment):
    // max(doc_id) of shard s < min(doc_id) of shard s+1
    val ranges = data.groupBy("shard_id")
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .orderBy("shard_id")
      .select("lo", "hi").as[(Long, Long)].collect()
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo)
      case _ => ()
    }
    // budget: each shard exceeds the cap by at most one document
    val maxDoc = data.select(max(
      graft.functions.TextFunctions.approxBpeTokenCount(col("text"))))
      .as[Long].head()
    manifest.foreach { r =>
      val toks = r.getAs[Long]("n_tokens")
      assert(toks < 40 + maxDoc, s"shard ${r.get(0)} holds $toks tokens")
    }
    // the validator agrees with the disk state
    assert(Shards.validateShards(spark, dir).count() == 0L)
    // manifest totals cover the corpus
    assert(manifest.map(_.getAs[Long]("n_docs")).sum == 60L)
  }

  test("validateShards flags a lost shard and a tampered shard") {
    val dir = TestSpark.tmpDir("shards_tamper")
    Shards.writeShards(corpus, dir, tokensPerShard = 40)
    val shardDirs = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.startsWith("shard_id=")).sortBy(_.getName)
    assert(shardDirs.length > 1)
    // lose one shard entirely
    def rmRf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmRf)
      f.delete()
    }
    rmRf(shardDirs.head)
    val missing = Shards.validateShards(spark, dir)
    assert(missing.count() == 1L, "exactly the lost shard is flagged")
    assert(missing.filter(col("act_docs").isNull).count() == 1L)
    // tamper: rewrite another shard's files with one doc's text changed
    val victim = shardDirs(1)
    val sid = victim.getName.stripPrefix("shard_id=").toLong
    val rows = spark.read.parquet(victim.getAbsolutePath)
    val tampered = rows.withColumn("text",
      when(col("doc_id") === rows.select(min("doc_id")).as[Long].head(),
        concat(col("text"), lit(" INJECTED"))).otherwise(col("text")))
    val tmp = TestSpark.tmpDir("shards_victim_rewrite")
    tampered.write.mode("overwrite").parquet(tmp)
    rmRf(victim)
    java.nio.file.Files.move(java.nio.file.Paths.get(tmp),
      java.nio.file.Paths.get(victim.getAbsolutePath),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val bad = Shards.validateShards(spark, dir)
    assert(bad.filter(col("shard_id") === sid).count() == 1L,
      "the tampered shard's content hash must mismatch")
  }
}
