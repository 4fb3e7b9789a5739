package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The shared seen-table compactor: bounded fan-in, set preservation,
  * volume-sized multi-file output (never a single-task funnel), and the
  * no-op guard when the standing file count is already volume-bound. */
class SeenTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parquetFiles(dir: String): Array[java.io.File] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Array.empty
    else d.listFiles().filter(_.getName.endsWith(".parquet"))
  }

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    df.collect() // finalize any adaptive plan
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case other => other +: (other.children.flatMap(walk) ++
        other.subqueries.flatMap(walk))
    }
    walk(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[ShuffleExchangeExec])
  }

  test("novelIds == the plain anti-join, and never shuffles the history") {
    val dir = TestSpark.tmpDir("seen_gate")
    (0L until 500L).filter(_ % 2 == 0).toDF("doc_id")
      .write.mode("overwrite").parquet(dir)
    val batch = (250L until 350L).toDF("doc_id")
    val expected = (251L until 350L by 2).toSet // odds in the window
    val novel = SeenTable.novelIds(batch, dir, "doc_id")
    assert(novel.as[Long].collect().toSet == expected)
    // the 100 TB shape: the history side is scanned, never exchanged —
    // both joins broadcast the batch-bounded side (BucketedJoinSpec's
    // no-Exchange pin, applied to the idempotence gate)
    assert(shuffleCount(novel) == 0,
      "the seen-gate must not shuffle the id history")
    // no seen dir yet: the whole batch is novel
    assert(SeenTable.novelIds(batch, dir + "_nope", "doc_id")
      .count() == 100)
    // the giant-backfill fallback (plain anti-join) stays exact
    val fb = SeenTable.novelIds(batch, dir, "doc_id", maxBroadcastIds = 10)
    assert(fb.as[Long].collect().toSet == expected)
  }

  test("8 append waves at threshold 3: fan-in stays bounded, the id set " +
    "(with cross-wave duplicates) survives every pass, staging is cleaned") {
    val dir = TestSpark.tmpDir("seen_compact")
    var maxFiles = 0
    (0 until 8).foreach { b =>
      // waves overlap (ids b*10 .. b*10+14): compaction's distinct must
      // keep set semantics, not row counts
      (b * 10L until b * 10L + 15L).toDF("doc_id")
        .coalesce(1).write.mode("append").parquet(dir)
      SeenTable.compact(spark, dir, "doc_id", threshold = 3)
      maxFiles = math.max(maxFiles, parquetFiles(dir).length)
    }
    assert(maxFiles <= 4,
      s"fan-in must stay within threshold+1, saw $maxFiles")
    assert(spark.read.parquet(dir).distinct().count() == 85,
      "ids 0..84 must all survive compaction")
    assert(!new java.io.File(dir + "_compact").exists(),
      "staging dir must be cleaned up after a successful pass")
  }

  test("volume-sized output: a history larger than targetBytes compacts " +
    "to MULTIPLE hash-bucketed files, not one") {
    val dir = TestSpark.tmpDir("seen_multi")
    (0 until 8).foreach { b =>
      (b * 1000L until b * 1000L + 1000L).toDF("doc_id")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val total = parquetFiles(dir).map(_.length()).sum
    // force the volume path: target under half the bytes => nOut >= 2
    SeenTable.compact(spark, dir, "doc_id", threshold = 3,
      targetBytes = total / 3)
    val after = parquetFiles(dir)
    assert(after.length >= 2 && after.length < 8,
      s"expected 2..7 volume-sized files, got ${after.length}")
    assert(spark.read.parquet(dir).distinct().count() == 8000)
  }

  test("tiered compaction: frozen segments are immutable — each pass " +
    "pays for the small tail, never the history") {
    val dir = TestSpark.tmpDir("seen_tiered")
    import org.apache.spark.sql.functions.{col, lit, xxhash64}
    val target = 8000L // small tier = files under 4 KB
    val frozenSeen = scala.collection.mutable.Set[String]()
    (0 until 30).foreach { b =>
      // ~2.4 KB of incompressible ids per wave (hashes don't
      // delta-compress away, so file sizes track id counts)
      spark.range(200).select(
        xxhash64(col("id") + lit(b * 1000000L)).as("doc_id"))
        .coalesce(1).write.mode("append").parquet(dir)
      SeenTable.compact(spark, dir, "doc_id", threshold = 2,
        targetBytes = target)
      val now = parquetFiles(dir)
      // every segment that ever crossed the freeze line must still be
      // present, byte-identical in name — compaction may never touch it
      val fullNow = now.filter(_.length() >= target / 2).map(_.getName).toSet
      frozenSeen.foreach { n =>
        assert(now.exists(_.getName == n),
          s"wave $b rewrote frozen segment $n — history churn")
      }
      frozenSeen ++= fullNow
    }
    assert(frozenSeen.size >= 3,
      s"fixture never froze segments (${frozenSeen.size}) — tier untested")
    // the id set survives the whole tiered lifecycle
    assert(spark.read.parquet(dir).distinct().count() == 6000)
    // and fan-in stays volume-bound: frozen segments + a small tail
    assert(parquetFiles(dir).length <= frozenSeen.size + 3)
  }

  test("no-op guards: under threshold, missing dir, and a file count the " +
    "data volume already requires") {
    val dir = TestSpark.tmpDir("seen_noop")
    (0 until 2).foreach { b =>
      Seq(b.toLong).toDF("doc_id").coalesce(1)
        .write.mode("append").parquet(dir)
    }
    val before = parquetFiles(dir).map(_.getName).toSet
    SeenTable.compact(spark, dir, "doc_id", threshold = 3)
    assert(parquetFiles(dir).map(_.getName).toSet == before,
      "under threshold must not rewrite")
    // volume-bound: targetBytes=1 makes nOut >= file count — rewriting
    // could never shrink the fan-in, so the pass must decline
    Seq(2L).toDF("doc_id").coalesce(1).write.mode("append").parquet(dir)
    Seq(3L).toDF("doc_id").coalesce(1).write.mode("append").parquet(dir)
    val before2 = parquetFiles(dir).map(_.getName).toSet
    SeenTable.compact(spark, dir, "doc_id", threshold = 3, targetBytes = 1)
    assert(parquetFiles(dir).map(_.getName).toSet == before2,
      "a volume-bound file count must not churn")
    SeenTable.compact(spark, TestSpark.tmpDir("seen_missing") + "/nope",
      "doc_id", threshold = 3) // missing dir: silent no-op
  }
}
