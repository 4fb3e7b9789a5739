package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.TestSpark

class SamplingPackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ids(n: Int) = spark.range(n).toDF("id")

  test("hashSample is deterministic, near-fraction, and salt-independent") {
    val a = Sampling.hashSample(ids(20000), "id", 0.1).select("id")
      .as[Long].collect().sorted
    val b = Sampling.hashSample(ids(20000), "id", 0.1).select("id")
      .as[Long].collect().sorted
    assert(a.sameElements(b))
    assert(math.abs(a.length - 2000) < 200, s"got ${a.length} of ~2000")
    // repartitioning must not change the sample (the df.sample failure mode)
    val c = Sampling.hashSample(ids(20000).repartition(13), "id", 0.1)
      .select("id").as[Long].collect().sorted
    assert(a.sameElements(c))
    val other = Sampling.hashSample(ids(20000), "id", 0.1, salt = "other")
      .select("id").as[Long].collect().toSet
    assert(other != a.toSet)
    // nested fractions: a 5% sample with the same salt is a subset of 10%
    val five = Sampling.hashSample(ids(20000), "id", 0.05).select("id")
      .as[Long].collect().toSet
    assert(five.subsetOf(a.toSet))
  }

  test("stratifiedSample applies per-stratum fractions") {
    val df = ids(9000).withColumn("grp",
      when(col("id") % 3 === 0, "a").when(col("id") % 3 === 1, "b")
        .otherwise("c"))
    val out = Sampling.stratifiedSample(df, "grp", "id",
      Map("a" -> 1.0, "b" -> 0.2), defaultFraction = 0.0)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(out("a") == 3000)
    assert(math.abs(out("b") - 600) < 120, s"got ${out.get("b")}")
    assert(!out.contains("c"))
  }

  test("mixtureSample hits the target mix; differential vs local md5") {
    // 3 sources with unequal counts: web 6000, books 1500, code 500
    val df = ids(8000).withColumn("src",
      when(col("id") < 6000, "web")
        .when(col("id") < 7500, "books").otherwise("code"))
    // ratios 6:3:1 → K = min(6000/6, 1500/3, 500/1)=500; targets
    // web 3000 (f=.5), books 1500 (f=1: the binding source keeps all),
    // code 500 (f=1)... make code binding instead: weights 6:3:2 →
    // K = min(1000, 500, 250) = 250 → web 1500, books 750, code 500(all)
    val weights = Map("web" -> 6.0, "books" -> 3.0, "code" -> 2.0)
    val out = Sampling.mixtureSample(df, "src", "id", weights)
      .select("id", "src").as[(Long, String)].collect()
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    // the binding source is kept whole; others land near w_s * K
    assert(bySrc("code") == 500)
    assert(math.abs(bySrc("web") - 1500) < 150, s"web ${bySrc("web")}")
    assert(math.abs(bySrc("books") - 750) < 100, s"books ${bySrc("books")}")
    // exact differential: recompute the keep set with java's own md5
    val md = java.security.MessageDigest.getInstance("MD5")
    def draw(id: Long): String = md.digest(s"graft$id".getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    val counts = Map("web" -> 6000L, "books" -> 1500L, "code" -> 500L)
    val k = weights.map { case (s, w) => math.floor(counts(s) / w) }.min
    def thr(s: String): String = Sampling.thresholdHex(
      math.min(1.0, weights(s) * k / counts(s)))
    val expected = (0L until 8000L).filter { id =>
      val s = if (id < 6000) "web" else if (id < 7500) "books" else "code"
      draw(id) < thr(s)
    }.toSet
    assert(out.map(_._1).toSet == expected)
    // partitioning must not change the mix (incremental-rerun contract)
    val again = Sampling.mixtureSample(df.repartition(17), "src", "id",
      weights).select("id").as[Long].collect().toSet
    assert(again == expected)
    // unweighted sources are dropped
    val extra = df.union(ids(100).withColumn("src", lit("junk")))
    val noJunk = Sampling.mixtureSample(extra, "src", "id", weights)
      .filter(col("src") === "junk").count()
    assert(noJunk == 0)
  }

  test("tokenBudgetSample keeps the maximal hash-ordered prefix") {
    val df = ids(3000).withColumn("grp", concat(lit("s"), col("id") % 3))
      .withColumn("toks", (col("id") % 7) + 1)
    val out = Sampling.tokenBudgetSample(df, "grp", "id", "toks",
      budget = 500).select("id", "cum_tokens")
      .as[(Long, Long)].collect()
    assert(out.nonEmpty && out.forall(_._2 <= 500))
    // local replay: per group, order by (md5 draw, id), accumulate
    val md = java.security.MessageDigest.getInstance("MD5")
    def draw(id: Long): String = md.digest(s"graft$id".getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    val expected = (0L until 3000L).groupBy(_ % 3).values.flatMap { g =>
      var cum = 0L
      g.toSeq.sortBy(id => (draw(id), id)).takeWhile { id =>
        cum += (id % 7) + 1; cum <= 500
      }
    }.toSet
    assert(out.map(_._1).toSet == expected)
    // prefix property: a larger budget keeps a strict superset
    val bigger = Sampling.tokenBudgetSample(df, "grp", "id", "toks",
      budget = 1000).select("id").as[Long].collect().toSet
    assert(expected.subsetOf(bigger) && bigger.size > expected.size)
  }

  test("stratifiedFixedSample returns exactly n per stratum, stably") {
    val df = ids(1000).withColumn("grp",
      when(col("id") < 10, "tiny").otherwise(concat(lit("g"), col("id") % 4)))
    val out = Sampling.stratifiedFixedSample(df, "grp", "id", n = 25)
    val counts = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(counts("tiny") == 10)   // stratum smaller than n: keep all
    Seq("g0", "g1", "g2", "g3").foreach(g => assert(counts(g) == 25))
    val again = Sampling.stratifiedFixedSample(df.repartition(7), "grp",
      "id", n = 25).select("id").as[Long].collect().sorted
    assert(again.sameElements(out.select("id").as[Long].collect().sorted))
  }

  test("packChunked equals the single-partition global window reference") {
    val docs = ids(5000).withColumn("ntok", col("id") % 97 + 1)
    def run(nParts: Int) =
      Packing.packChunked(docs, "id", "ntok", capacity = 1024, nParts)
        .select("id", "cum_before", "bin_id")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
    val w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    val reference = docs
      .withColumn("cum_before", coalesce(sum("ntok").over(w), lit(0L)))
      .withColumn("bin_id", floor(col("cum_before") / lit(1024.0)).cast("long"))
      .select("id", "cum_before", "bin_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val four = run(4)
    assert(four.sameElements(reference))
    // partitioning-invariant: different nParts, same assignment
    assert(run(7).sameElements(four))
  }

  test("packGreedy bins never exceed capacity and cover every doc once") {
    val docs = ids(3000).withColumn("ntok",
      when(col("id") % 500 === 0, 5000L).otherwise(col("id") % 80 + 1))
    val out = Packing.packGreedy(docs, "id", "ntok", capacity = 2048,
        nParts = 5)
      .select("id", "ntok", "bin_id").as[(Long, Long, Long)].collect()
    assert(out.map(_._1).sorted.toSeq == (0L until 3000L).toSeq)
    val byBin = out.groupBy(_._3)
    byBin.foreach { case (bin, rows) =>
      val tot = rows.map(_._2).sum
      assert(tot <= 2048 || rows.length == 1,
        s"bin $bin holds $tot tokens in ${rows.length} docs")
    }
    // oversized docs sit alone in their bin
    out.filter(_._2 == 5000L).foreach { case (id, _, bin) =>
      assert(byBin(bin).length == 1, s"oversized doc $id shares bin $bin")
    }
    // bins are contiguous runs of the key order
    byBin.foreach { case (bin, rows) =>
      val ks = rows.map(_._1).sorted
      assert(ks.last - ks.head == ks.length - 1,
        s"bin $bin keys not contiguous")
    }
  }

  test("assignSplit: total, partition-stable, md5-replayable") {
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val out = Sampling.assignSplit(ids(10000), "id", splits)
      .select("id", "split").as[(Long, String)].collect()
    assert(out.length == 10000) // every row assigned exactly once
    val counts = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(math.abs(counts("train") - 8000) < 400, s"train ${counts("train")}")
    assert(math.abs(counts("val") - 1000) < 200, s"val ${counts("val")}")
    // partitioning must not move any row across splits (the holdout
    // contamination failure mode)
    val again = Sampling.assignSplit(ids(10000).repartition(13), "id", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(out.toMap == again)
    // exact differential: java md5 + the operator's own cumulative hexes
    val md = java.security.MessageDigest.getInstance("MD5")
    def draw(id: Long): String = md.digest(s"graft$id".getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    val h1 = Sampling.thresholdHex(0.8)
    val h2 = Sampling.thresholdHex(0.8 + 0.1)
    out.foreach { case (id, s) =>
      val expect = if (draw(id) < h1) "train"
        else if (draw(id) < h2) "val" else "test"
      assert(s == expect, s"id $id: $s != $expect")
    }
  }

  test("globalShuffle: deterministic permutation in md5-draw order") {
    val out = Sampling.globalShuffle(ids(5000), "id", nParts = 7)
      .select("id", "pos").as[(Long, Long)].collect()
    assert(out.map(_._2).sorted.sameElements(0L until 5000L)) // permutation
    // input partitioning must not change the epoch order
    val again = Sampling.globalShuffle(ids(5000).repartition(13), "id",
      nParts = 7).select("id", "pos").as[(Long, Long)].collect().toMap
    assert(out.toMap == again)
    // the permutation IS the (md5 draw, id) sort order, replayed locally
    val md = java.security.MessageDigest.getInstance("MD5")
    def draw(id: Long): String = md.digest(s"graft$id".getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    val local = (0L until 5000L).sortBy(id => (draw(id), id))
      .zipWithIndex.map { case (id, p) => id -> p.toLong }.toMap
    assert(out.toMap == local)
    // a different salt yields a different epoch order
    val other = Sampling.globalShuffle(ids(5000), "id", salt = "epoch2",
      nParts = 7).select("id", "pos").as[(Long, Long)].collect().toMap
    assert(other != out.toMap)
  }

  test("chunkByTokens: coverage, overlap, and boundary cases") {
    def words(n: Int): String = (0 until n).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, words(100)), // 2 chunks: [0,64), [48,100)
      (2L, words(64)),  // exactly one full chunk
      (3L, words(65)),  // second chunk = 16 overlap + 1 new token
      (4L, words(5)),   // shorter than overlap: still one chunk
      (5L, "")          // zero tokens: no rows
    ).toDF("doc_id", "text")
    val out = Packing.chunkByTokens(docs, "doc_id", "text",
        chunkTokens = 64, overlap = 16)
      .select("doc_id", "chunk_idx", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(out(1L).map(c => (c._2, c._3)).toSeq == Seq((0L, 64), (1L, 52)))
    // stride 48: chunk 1 starts at token 48, overlapping 16 tokens
    assert(out(1L)(1)._4.startsWith("t48 ") && out(1L)(0)._4.endsWith(" t63"))
    assert(out(2L).map(c => (c._2, c._3)).toSeq == Seq((0L, 64)))
    assert(out(3L).map(c => (c._2, c._3)).toSeq == Seq((0L, 64), (1L, 17)))
    assert(out(4L).map(c => (c._2, c._3)).toSeq == Seq((0L, 5)))
    assert(!out.contains(5L))
    // every token of every doc appears in at least one chunk, in order
    val rebuilt = out(1L).map(_._4.split(" ")).reduce { (a, b) =>
      a ++ b.drop(16) // drop the overlap when stitching
    }
    assert(rebuilt.sameElements((0 until 100).map(i => s"t$i")))
  }

  test("leakageSafeSplit: every near-dup cluster shares one split; " +
    "singletons split like assignSplit on their own id") {
    val docs = (0L until 100L).map(i => Tuple1(i)).toDF("doc_id")
    // two clusters ({1,2,3} via chaining, {50,51}) + 95 singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (50L, 51L)).toDF("id_a", "id_b")
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val out = Sampling.leakageSafeSplit(docs, pairs, "doc_id", splits)
      .select("doc_id", "rep_id", "split")
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    val plain = Sampling.assignSplit(docs, "doc_id", splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // cluster members share the min-id representative AND its split
    assert(Seq(1L, 2L, 3L).map(out(_)._1).distinct == Seq(1L))
    assert(Seq(1L, 2L, 3L).map(out(_)._2).distinct.size == 1)
    assert(out(2L)._2 == plain(1L) && out(3L)._2 == plain(1L))
    assert(out(50L)._1 == 50L && out(51L)._1 == 50L &&
      out(51L)._2 == plain(50L))
    // singletons represent themselves — identical to the plain split
    ((0L until 100L).toSet -- Set(1L, 2L, 3L, 50L, 51L)).foreach { i =>
      assert(out(i) == (i, plain(i)), s"singleton $i diverged")
    }
  }

  test("packedSegments: segments tile each bin contiguously; the only " +
    "capacity overrun is the one overflow doc") {
    val docs = (0 until 40).map(i => (i.toLong, (i % 7 + 1) * 10L))
      .toDF("doc_id", "n_tokens")
    val segs = Packing.packedSegments(docs, "doc_id", "n_tokens",
        capacity = 100, nParts = 4)
      .as[(Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toList // (bin, start) orders segments
    // within each bin, seg_start chains: first starts at 0 (except a
    // bin whose opening doc is the previous bin's overflow tail —
    // chunked packing has no such bin for its HOME assignment), each
    // next starts where the previous ended, mod nothing
    segs.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (bin, rs) =>
      val inOrder = rs.sortBy(_._3)
      inOrder.zip(inOrder.tail).foreach { case (a, b) =>
        assert(b._3 == a._3 + a._4,
          s"bin $bin: segment gap ${a._3}+${a._4} -> ${b._3}")
      }
      if (bin == 0) assert(inOrder.head._3 == 0L)
    }
    // every doc appears exactly once with its own length
    assert(segs.map(_._2).sorted == (0L until 40L).toList)
    assert(segs.forall(r => r._4 == (r._2 % 7 + 1) * 10))
    // matches the pack assignment doc for doc
    val bins = Packing.packChunked(docs, "doc_id", "n_tokens", 100L, 4)
      .select("doc_id", "bin_id").as[(Long, Long)].collect().toMap
    segs.foreach(r => assert(bins(r._2) == r._1))
  }

  /** JVM twin of fimTransform's md5 selection draw (the hashDraw
    * convention): first 8 hex chars of md5(salt || id) as a long. */
  private def fimDraw(salt: String, id: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest((salt + id).getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString, 16)

  test("fimTransform: spans reassemble to the original; cuts in range; " +
    "hash-draw selection; pass-through for unselected ids and tiny docs") {
    val docs = (Seq((7L, "abc"), (8L, "ab")) ++
      (0 until 20).map(i => (i.toLong + 100,
        s"doc$i " + ("abcdefghij" * (i + 1)))))
      .toDF("doc_id", "text")
    val texts = docs.as[(Long, String)].collect().toMap
    def selected(id: Long): Boolean =
      fimDraw("graft_fim", id.toString) % 2 == 0
    val out = Packing.fimTransform(docs)
      .as[(Long, Int, String)].collect().toList
    // the hash draw selects a nonempty, non-total subset here — the
    // pass-through and transform branches are both exercised
    assert(out.exists(_._2 == 1) && out.exists(o =>
      o._2 == 0 && texts(o._1).length >= 4))
    out.foreach { case (id, applied, t) =>
      val orig = texts(id)
      if (applied == 0) {
        assert(t == orig)
        assert(!selected(id) || orig.length < 4,
          s"doc $id should have been transformed")
      } else {
        assert(selected(id) && orig.length >= 4)
        val m = "<PRE>(.*)<SUF>(.*)<MID>(.*)".r
        t match {
          case m(pre, suf, mid) =>
            assert(pre.nonEmpty && suf.nonEmpty && mid.nonEmpty,
              s"doc $id: empty span in $t")
            assert(pre + mid + suf == orig,
              s"doc $id: spans do not reassemble")
          case _ => fail(s"doc $id: bad FIM shape: $t")
        }
      }
    }
    // STRING ids work identically (the draw is md5 on the id string —
    // the old id % k arithmetic failed analysis here) and agree with
    // the long-id run: "123" hashes like 123L cast to string
    val sout = Packing.fimTransform(
        docs.select(col("doc_id").cast("string").as("doc_id"), col("text")))
      .as[(String, Int, String)].collect()
      .map { case (id, a, t) => (id.toLong, a, t) }.toList
    assert(sout.toSet == out.toSet)
    // deterministic: a second run is byte-identical
    val again = Packing.fimTransform(docs)
      .as[(Long, Int, String)].collect().toList
    assert(out.toSet == again.toSet)
  }
}
