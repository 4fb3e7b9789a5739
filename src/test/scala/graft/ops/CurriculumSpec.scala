package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class CurriculumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("assignPositions is the exact permutation of the total order") {
    val rows = (0 until 200).map(i =>
      (i.toLong, ((i * 37) % 100).toDouble / 10.0))
      .toDF("id", "score")
    val got = Curriculum.assignPositions(rows,
        Seq(col("score").desc, col("id")), nParts = 8)
      .select("id", "curriculum_pos").as[(Long, Long)].collect().toMap
    val expected = rows.orderBy(col("score").desc, col("id"))
      .select("id").as[Long].collect().zipWithIndex
      .map { case (id, i) => id -> i.toLong }.toMap
    assert(got == expected)
    // positions are a 0-based permutation
    assert(got.values.toSeq.sorted == (0L until 200L))
  }

  test("lmOrderedBins: predictable bins schedule before gibberish bins") {
    def doc(i: Int): String =
      (0 until 30).map(j => s"tok${(i + j) % 25} tie$j").mkString(" ")
    // ids 0..39: in-distribution; 100..109: OOV gibberish (their own
    // shared vocabulary so they pack into bins together)
    val docs = ((0 until 40).map(i => (i.toLong, doc(i))) ++
      (100 until 110).map(i =>
        (i.toLong, (0 until 30).map(j => s"zz${i}q$j xx${i}v$j")
          .mkString(" "))))
      .toDF("doc_id", "text")
    val dir = TestSpark.tmpDir("curriculum_model")
    // train on the CLEAN docs only — gibberish is OOV under the model
    NgramLm.trainModel(docs.filter(col("doc_id") < 40), dir)
    val bins = Curriculum.lmOrderedBins(spark, dir, docs, capacity = 256)
      .collect().map(r =>
        (r.getLong(0), r.getDouble(2), r.getLong(3)))
    // positions follow (SNAPPED score desc, bin_id) — the rank key is
    // round(bin_score, 6), so the order is compared on the same grid
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byPos = bins.sortBy(_._3)
    assert(byPos.map(_._3).toSeq == bins.indices.map(_.toLong))
    byPos.sliding(2).foreach { case Array(a, b) =>
      assert(r6(a._2) > r6(b._2) || (r6(a._2) == r6(b._2) && a._1 < b._1))
    }
    // every early-position bin outscores every late gibberish bin:
    // doc_ids pack in id order, so gibberish lands in the tail bins,
    // which must occupy the tail POSITIONS too
    val tailBins = bins.filter(_._2 < 0.01).map(_._3)
    val headBins = bins.filter(_._2 >= 0.01).map(_._3)
    assert(tailBins.nonEmpty && headBins.nonEmpty)
    assert(tailBins.min > headBins.max)
    CacheRegistry.releaseAll()
  }

  test("curriculum shards: decoded (shard, part, seq) order replays the " +
    "schedule; file names carry floor(pos/k); split shards reassemble") {
    // a fabricated schedule of 40 bins; many range partitions (the
    // session default 32 over 40 rows) force shards to SPAN partition
    // boundaries, exercising the two-file-per-shard reassembly path
    val sched = (0 until 40).map(i =>
      (1000L + ((i * 17) % 40), (i % 5 + 1).toLong, i.toLong))
      .toDF("bin_id", "n_docs", "curriculum_pos")
    val dir = TestSpark.tmpDir("curriculum_shards")
    Curriculum.writeCurriculumShards(sched, dir, binsPerShard = 8,
      int64Cols = Seq("bin_id", "n_docs", "curriculum_pos"),
      nParts = Some(8))
    CacheRegistry.releaseAll()
    val decoded = graft.sources.TfRecord.readShardedExamples(spark, dir,
        Seq("bin_id", "n_docs", "curriculum_pos"), Seq.empty)
      .select(col("shard"), col("shard_part"), col("rec_seq"),
        element_at(col("bin_id"), 1).as("bin_id"),
        element_at(col("curriculum_pos"), 1).as("pos"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2, r._3))
    // replay order IS the schedule, and every shard holds its range
    assert(decoded.map(_._5).toSeq == (0L until 40L))
    decoded.foreach { case (shard, _, _, _, pos) =>
      assert(shard == pos / 8, s"pos $pos landed in shard $shard")
    }
    // bin payloads survive the roundtrip
    assert(decoded.map(r => (r._5, r._4)).toMap ==
      (0 until 40).map(i => (i.toLong, 1000L + ((i * 17) % 40))).toMap)
    // at least one shard was split across writer tasks (else the
    // reassembly claim is untested)
    val filesPerShard = decoded.groupBy(_._1)
      .map { case (_, rs) => rs.map(_._2).distinct.length }
    assert(filesPerShard.exists(_ > 1),
      "no shard spanned a partition boundary — fixture too coarse")
  }

  test("shard addressing guard: a negative curriculum_pos fails loudly " +
    "instead of mis-addressing a shard") {
    val sched = Seq((1L, 1L, -1L))
      .toDF("bin_id", "n_docs", "curriculum_pos")
    val e = intercept[Exception] {
      Curriculum.writeCurriculumShards(sched,
        TestSpark.tmpDir("curriculum_guard"), binsPerShard = 8,
        int64Cols = Seq("bin_id", "n_docs", "curriculum_pos"))
    }
    def chainHas(t: Throwable, s: String): Boolean =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .exists(x => String.valueOf(x.getMessage).contains(s))
    assert(chainHas(e, "negative curriculum_pos"), s"got $e")
    intercept[IllegalArgumentException] {
      Curriculum.writeCurriculumShards(sched,
        TestSpark.tmpDir("curriculum_guard0"), binsPerShard = 0,
        int64Cols = Seq("bin_id"))
    }
  }
}
