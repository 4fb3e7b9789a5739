package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The atomic-snapshot contract: versions publish with one immutable
  * marker, readers resolve to a complete tree (legacy flat or the
  * highest version), old snapshots stay intact for in-flight probes,
  * and — the reason the layer exists — probes running CONCURRENTLY
  * with forced rebuilds only ever observe whole snapshots, never a
  * mixed layout.
  */
class IndexVersionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("resolve/publish/prune mechanics; publish-twice fails loudly") {
    val dir = TestSpark.tmpDir("ixver")
    assert(IndexVersions.currentVersion(dir).isEmpty)
    assert(IndexVersions.resolve(dir) == dir) // legacy flat layout
    val (v1, s1) = IndexVersions.nextStaging(dir)
    assert(v1 == 1 && s1 == s"$dir/v=1")
    new java.io.File(s1).mkdirs()
    IndexVersions.publish(dir, v1)
    assert(IndexVersions.currentVersion(dir).contains(1))
    assert(IndexVersions.resolve(dir) == s1)
    intercept[Exception](IndexVersions.publish(dir, v1)) // marker exists
    val (v2, s2) = IndexVersions.nextStaging(dir)
    assert(v2 == 2)
    new java.io.File(s2).mkdirs()
    IndexVersions.publish(dir, v2)
    assert(IndexVersions.resolve(dir) == s2)
    // prune keeps current + previous by default
    val (v3, s3) = IndexVersions.nextStaging(dir)
    new java.io.File(s3).mkdirs()
    IndexVersions.publish(dir, v3)
    IndexVersions.pruneTo(dir)
    assert(!new java.io.File(s1).exists())
    assert(new java.io.File(s2).exists() && new java.io.File(s3).exists())
    assert(IndexVersions.resolve(dir) == s3)
    assert(IndexVersions.pathExists(s3) && !IndexVersions.pathExists(s1))
  }

  test("staging-owner token: a fresh concurrent staging refuses reclaim " +
    "loudly; stale or token-less orphans reclaim with a warning; " +
    "publish leaves no token residue") {
    val dir = TestSpark.tmpDir("ixver_tok")
    val (v1, s1) = IndexVersions.nextStaging(dir)
    // a second writer before the first published: silent reclaim would
    // interleave both into ONE staging path — must refuse loudly
    intercept[IllegalStateException](IndexVersions.nextStaging(dir))
    // a stale token (staleAfterMs = 0 treats any age as dead) reclaims
    val (v1b, s1b) = IndexVersions.nextStaging(dir, staleAfterMs = 0)
    assert(v1b == v1 && s1b == s1)
    IndexVersions.publish(dir, v1)
    assert(!new java.io.File(s1, "_staging_owner").exists(),
      "published tree must carry no staging residue")
    // a token-less orphan (the crashed-run shape the torn-write tests
    // fabricate) reclaims without ceremony
    new java.io.File(s"$dir/v=2").mkdirs()
    val (v2, _) = IndexVersions.nextStaging(dir)
    assert(v2 == 2)
    IndexVersions.publish(dir, v2)
    assert(IndexVersions.currentVersion(dir).contains(2))
  }

  def vec(i: Int): Array[Float] = {
    val r = new scala.util.Random(i * 7919 + 13)
    Array.fill(16)(r.nextGaussian().toFloat)
  }

  test("probes concurrent with forced rebuilds only ever observe " +
    "complete snapshots — never a mixed layout") {
    val corpus = (0 until 50).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    val queries = (0 until 3).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    val dir = TestSpark.tmpDir("ixver_live")
    Similarity.buildIvfIndex(corpus, dir, nCentroids = 8)

    def probe(at: String): Seq[(Long, Long, Int)] =
      Similarity.queryIvfIndex(spark, at, queries, k = 5, nProbe = 2)
        .select(col("query_id"), col("corpus_id"), col("rank"))
        .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3)).toSeq

    // background probe loop while the foreground forces TWO rebuilds
    // (minRecall = 1.01 can never be met) — each observation must be a
    // complete 15-row result; a torn layout would miss files / cells
    val observed =
      scala.collection.mutable.ArrayBuffer[Seq[(Long, Long, Int)]]()
    @volatile var done = false
    @volatile var probeError: Option[Throwable] = None
    val prober = new Thread(() => {
      try {
        while (!done) observed.synchronized {
          observed += probe(dir)
        }
      } catch { case t: Throwable => probeError = Some(t) }
    })
    prober.start()
    try {
      val canary = queries
      val (_, r1) = Similarity.maintainIvfIndex(spark, dir, canary,
        minRecall = 1.01, k = 5, nProbe = 2)
      val (_, r2) = Similarity.maintainIvfIndex(spark, dir, canary,
        minRecall = 1.01, k = 5, nProbe = 2)
      assert(r1 && r2)
    } finally {
      done = true
      prober.join(60000)
    }
    probeError.foreach(t => fail(s"concurrent probe threw: $t", t))
    assert(IndexVersions.currentVersion(dir).contains(2))

    // every version is still on disk and complete — compute each
    // snapshot's exact probe answer post-hoc (a version dir resolves to
    // itself; the legacy flat tree through a copy) and require every
    // live observation to equal one of them
    val valid = Set(probe(s"$dir/v=1"), probe(s"$dir/v=2"), flatProbe(dir))
    assert(observed.nonEmpty)
    observed.foreach { o =>
      assert(o.size == 15, s"incomplete probe: ${o.size} rows")
      assert(valid.contains(o),
        "a live probe saw a result matching NO complete snapshot")
    }
  }

  /** Probe the LEGACY FLAT tree of `dir` (pre-versioning layout), by
    * copying its tables to a fresh unversioned dir — resolve(dir) would
    * otherwise jump to the published versions. */
  private def flatProbe(dir: String): Seq[(Long, Long, Int)] = {
    val tmp = TestSpark.tmpDir("ixver_flat")
    def cp(sub: String): Unit = {
      val src = java.nio.file.Paths.get(dir, sub)
      val walk = java.nio.file.Files.walk(src)
      try walk.forEach { p =>
        val rel = src.relativize(p)
        val dst = java.nio.file.Paths.get(tmp, sub, rel.toString)
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(dst)
        else {
          java.nio.file.Files.createDirectories(dst.getParent)
          java.nio.file.Files.copy(p, dst)
        }
      } finally walk.close()
    }
    cp("centroids"); cp("assignments")
    val queries = (0 until 3).map(i => (i.toLong, vec(i)))
    val spark0 = spark
    import spark0.implicits._
    Similarity.queryIvfIndex(spark, tmp,
        queries.toDF("vec_id", "embedding"), k = 5, nProbe = 2)
      .select(col("query_id"), col("corpus_id"), col("rank"))
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3)).toSeq
  }
}
