package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Planted-duplicate tests: the operators must find exactly the planted
  * relations and nothing else on an otherwise-unrelated corpus.
  */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 20 unrelated docs + exact dupe of #0 + near dupe of #1
  def mkDoc(i: Int): String =
    (0 until 40).map(j => s"w${(i * 97 + j * 13) % 1000}x$j").mkString(" ")

  lazy val corpus = {
    val base = (0 until 20).map(i => (i.toLong, mkDoc(i)))
    val exactDupe = Seq((100L, mkDoc(0)))
    val nearDupe = Seq((101L, "zzz " + mkDoc(1).split(" ").drop(1).mkString(" ")))
    (base ++ exactDupe ++ nearDupe).toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts, keeps min id") {
    val res = Dedup.exact(corpus, "doc_id", "text").collect()
    assert(res.length == 21) // 22 rows, one exact pair collapses
    val dupe = res.filter(_.getLong(2) == 2)
    assert(dupe.length == 1 && dupe.head.getLong(1) == 0L)
  }

  test("dropExactDuplicates returns the surviving rows") {
    val kept = Dedup.dropExactDuplicates(corpus, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept.size == 21)
    assert(kept.contains(0L) && !kept.contains(100L),
      "the exact dupe must drop, its min-id keeper must survive")
    assert(kept.contains(101L), "near dupes are NOT exact dupes")
  }

  test("dropNearDuplicates keeps one row per cluster plus unpaired rows") {
    val pairs = Dedup.minhashNearDups(corpus, "doc_id", "text",
      k = 32, bands = 8, shingleSize = 3, minJaccard = 0.5)
      .select(col("id_a"), col("id_b"))
    val kept = Dedup.dropNearDuplicates(corpus, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    // planted pairs (0,100) and (1,101) each lose their non-min member
    assert(kept == (0L until 20L).toSet,
      s"expected the 20 base docs to survive, got $kept")
  }

  test("clusterDuplicates: distributed propagation equals the union-find fast path") {
    // chain 1-2-3-4 + separate pair (7,8) + self-contained clique
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (7L, 8L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("id_a", "id_b")
    val fast = Dedup.clusterDuplicates(pairs)
      .as[(Long, Long)].collect().toSet
    val distributed = Dedup.clusterDuplicates(pairs, smallGraphEdges = 0L)
      .as[(Long, Long)].collect().toSet
    graft.ops.CacheRegistry.releaseAll()
    val expected = Set(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 8L -> 7L, 10L -> 10L, 11L -> 10L, 12L -> 10L)
    assert(fast == expected)
    assert(distributed == expected)
  }

  test("keepBestPerCluster keeps the highest score, ties to lowest id") {
    val docs = Seq(
      (1L, "aa"), (2L, "aaaa"),          // cluster {1,2}: 2 is longer
      (4L, "cc"), (5L, "cc"),            // cluster {4,5}: tie -> min id 4
      (7L, "solo")                        // unpaired singleton survives
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (4L, 5L)).toDF("id_a", "id_b")
    val kept = Dedup.keepBestPerCluster(docs, "doc_id", pairs,
      length(col("text")))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L, 7L))
    // and the min-id policy of dropNearDuplicates differs on cluster 1:
    val minId = Dedup.dropNearDuplicates(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(minId == Set(1L, 4L, 7L))
  }

  test("tracked caches are fully released after the terminal action") {
    // assert on the REGISTRY's own accounting, not global
    // getPersistentRDDs counts: suites share one SparkSession and run
    // concurrently, so another suite's persist/unpersist between our
    // samples makes a global-count comparison flaky (observed once the
    // compact op started unpersisting eagerly in its finally)
    CacheRegistry.releaseAll(blocking = true)
    Dedup.minhashNearDups(corpus, "doc_id", "text").count()
    Dedup.ngramJaccardPairs(corpus, "doc_id", "text").count()
    Similarity.cosineNearDups(
      (0 until 30).map(i => (i.toLong,
        Array.tabulate(8)(j => ((i * 31 + j * 7) % 13 - 6).toFloat)))
        .toDF("vec_id", "embedding"), dim = 8, minCos = 0.95).count()
    val released = CacheRegistry.releaseAll(blocking = true)
    assert(released >= 4,
      s"ops should have persisted >=4 tracked intermediates, got $released")
    assert(CacheRegistry.releaseAll(blocking = true) == 0,
      "registry must be empty after release")
  }

  test("custom simhash vote aggregate equals the 60-sum-column form") {
    val withEmpty = corpus.union(
      Seq((200L, ""), (201L, "   ")).toDF("doc_id", "text"))
    val agg = Dedup.simhashSignatures(withEmpty, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val cols = Dedup.simhashSignaturesColumnForm(withEmpty, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(agg.toSeq == cols.toSeq)
    // empty docs: the NULL-hash row votes -1 everywhere -> sim = 0
    assert(agg.find(_._1 == 200L).exists(_._2 == 0L))
    assert(agg.find(_._1 == 201L).exists(_._2 == 0L))
  }

  test("decontaminate flags exactly the docs overlapping the benchmark") {
    // benchmark = doc 3's text; doc 103 copies a long span of doc 3
    val leaked = mkDoc(3).split(" ").slice(5, 25).mkString(" ")
    val corpus2 = corpus.union(Seq(
      (103L, "prefix words here " + leaked + " and a suffix")
    ).toDF("doc_id", "text"))
    val bench = Seq(Tuple1(mkDoc(3))).toDF("text")
    val flagged = Dedup.decontaminate(corpus2, "doc_id", "text",
      bench, "text", n = 3, minShared = 2)
      .select("id").as[Long].collect().toSet
    assert(flagged.contains(3L), "the verbatim source must be flagged")
    assert(flagged.contains(103L), "the spanning copy must be flagged")
    assert(flagged.size == 2, s"no false positives, got $flagged")
  }

  test("minhash LSH finds the planted near-dup pair (and the exact pair)") {
    val pairs = Dedup.minhashNearDups(corpus, "doc_id", "text",
      k = 32, bands = 8, shingleSize = 3, minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 100L)), "exact pair must surface")
    assert(pairs.contains((1L, 101L)), "near pair must surface")
    assert(pairs.size == 2, s"no false positives, got $pairs")
  }

  // 40 extra copies of doc 7's text: one exact-signature group of 41
  // members — the boilerplate worst case the signature collapse and
  // maxBucket cap exist for (web nav chrome at corpus scale)
  lazy val boilerCorpus = corpus.union(
    (0 until 40).map(i => (1000L + i, mkDoc(7))).toDF("doc_id", "text"))

  test("signature collapse: uncapped boilerplate output is the full pair set") {
    val (pairs, drops) = Dedup.minhashNearDupsWithDrops(boilerCorpus,
      "doc_id", "text", k = 32, bands = 8, shingleSize = 3,
      minJaccard = 0.5, maxBucket = 0)
    val got = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    graft.ops.CacheRegistry.releaseAll()
    // group {7, 1000..1039}: C(41,2) internal pairs, plus the planted
    // exact (0,100) and near (1,101) pairs
    assert(got.size == 41 * 40 / 2 + 2, s"got ${got.size} pairs")
    assert(got.contains((0L, 100L)) && got.contains((1L, 101L)))
    assert(got.contains((7L, 1000L)) && got.contains((1000L, 1039L)))
    assert(drops.count() == 0, "uncapped run must report no drops")
  }

  test("maxBucket caps boilerplate groups deterministically, with audit") {
    val (pairs, drops) = Dedup.minhashNearDupsWithDrops(boilerCorpus,
      "doc_id", "text", k = 32, bands = 8, shingleSize = 3,
      minJaccard = 0.5, maxBucket = 8)
    val got = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val dropRows = drops.collect()
      .map(r => (r.getString(0), r.getLong(2)))
    graft.ops.CacheRegistry.releaseAll()
    // the 41-member group keeps its 8 lowest ids {7, 1000..1006}:
    // C(8,2) internal pairs survive alongside the two planted pairs
    val keptGroup = Set(7L) ++ (1000L to 1006L)
    val expected = (for {
      a <- keptGroup; b <- keptGroup if a < b
    } yield (a, b)).toSet + ((0L, 100L)) + ((1L, 101L))
    assert(got == expected, s"got $got")
    // the audit reports the 33 members sliced off the signature group
    assert(dropRows.contains(("group", 33L)), s"got ${dropRows.toSeq}")
  }

  test("bucket cap truncates over-full band buckets with exact accounting") {
    // 12 variants of doc 5, each swapping a different word: signatures
    // DIFFER (distinct groups) but agree on most bands, so the shared
    // band buckets fill past a small cap — the distinct-signature
    // boilerplate shape (templated pages with one varying slot)
    val variants = (0 until 12).map { v =>
      val ws = mkDoc(5).split(" "); ws(v * 3) = s"chg$v"
      (2000L + v.toLong, ws.mkString(" "))
    }
    val corpus2 = corpus.union(variants.toDF("doc_id", "text"))
    val (pc, drops) = Dedup.minhashNearDupsWithDrops(corpus2,
      "doc_id", "text", k = 32, bands = 8, shingleSize = 3,
      minJaccard = 0.5, maxBucket = 2)
    val capped = pc.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val bucketDropTotal = drops.filter(col("cap_site") === "bucket")
      .agg(sum("n_dropped")).as[Long].head()
    graft.ops.CacheRegistry.releaseAll()
    val full = Dedup.minhashNearDups(corpus2, "doc_id", "text",
      k = 32, bands = 8, shingleSize = 3, minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    graft.ops.CacheRegistry.releaseAll()
    assert(capped.subsetOf(full),
      "capping may only drop candidates, never invent them")
    // independent accounting: the reported bucket drops must equal the
    // over-cap excess of the rep-level band histogram (reps = min id
    // per distinct signature)
    val reps = Dedup.minhashSignatures(corpus2, "doc_id", "text", 32, 3)
      .groupBy(col("sig")).agg(min(col("id")).as("id"))
      .select(col("id"), col("sig"))
    val expectedDrops = Dedup.withLshBands(reps, "sig", 8, 4)
      .groupBy(col("band_id"), col("band_hash"))
      .agg(greatest(count(lit(1)) - 2, lit(0L)).as("over"))
      .agg(sum("over")).as[Long].head()
    assert(expectedDrops > 0,
      "fixture must actually overflow some bucket at cap=2")
    assert(bucketDropTotal == expectedDrops,
      s"audit $bucketDropTotal != independent histogram $expectedDrops")
  }

  test("cap-before-collect: a 100k-member signature group caps exactly " +
    "without materializing a group-sized member array") {
    // one signature group 100,000 deep — the pathological boilerplate
    // shape. The capped plan ranks members (row_number over the sig
    // exchange) and collects ONLY rank <= maxBucket, so no aggregation
    // row ever holds the full membership (pre-round-14, slice() ran
    // AFTER collect_list built the 100k-element array); the drop audit
    // comes from count(*), exact without holding the dropped ids.
    val deep = spark.range(100000)
      .select((col("id") + 10000L).as("doc_id"))
      .withColumn("text", lit(mkDoc(7)))
    val (pairs, drops) = Dedup.minhashNearDupsWithDrops(deep,
      "doc_id", "text", k = 32, bands = 8, shingleSize = 3,
      minJaccard = 0.5, maxBucket = 8)
    val got = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val dropRows = drops.collect().map(r => (r.getString(0), r.getLong(2)))
    graft.ops.CacheRegistry.releaseAll()
    // deterministic: the 8 lowest ids survive; C(8,2) pairs, 99,992
    // members sliced off, accounted at the single group cap site
    val kept = (10000L until 10008L)
    val expected = (for { a <- kept; b <- kept if a < b } yield (a, b)).toSet
    assert(got == expected, s"got ${got.size} pairs")
    assert(dropRows.toSeq == Seq(("group", 99992L)), s"got ${dropRows.toSeq}")
  }

  test("adaptive planner branches agree on seeded random corpora") {
    // direct plan (dup mass under the 1% engage threshold) vs the
    // collapse plan (forced via a never-dropping cap): full verified
    // row sets must be identical — the randomized complement of the
    // oracle-pinned fixture equalities
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val base = (0 until 150).map { i =>
        val words = (0 until 30).map(_ => s"w${rnd.nextInt(120)}")
        (seed * 10000L + i, words.mkString(" "))
      }
      val extra = Seq(
        (seed * 10000L + 900, base(3)._2), // one exact duplicate
        (seed * 10000L + 901,             // one near duplicate
          "zzz " + base(5)._2.split(" ").drop(1).mkString(" ")))
      val corpus2 = (base ++ extra).toDF("doc_id", "text")
      def rows(cap: Int) = Dedup.minhashNearDups(corpus2, "doc_id",
          "text", k = 32, bands = 8, shingleSize = 3,
          minJaccard = 0.3, maxBucket = cap)
        .as[(Long, Long, Double, Double)].collect().toSet
      val direct = rows(0)          // 2/152 dup mass -> direct plan
      val collapsed = rows(1000000) // cap forces collapse, drops nothing
      graft.ops.CacheRegistry.releaseAll()
      assert(direct == collapsed, s"seed $seed: plans disagree")
      assert(direct.exists(r => r._1 == seed * 10000L + 3 &&
        r._2 == seed * 10000L + 900), s"seed $seed: exact pair missing")
    }
  }

  test("minhash estimate approximates true jaccard") {
    val row = Dedup.minhashNearDups(corpus, "doc_id", "text", minJaccard = 0.5)
      .filter(col("id_a") === 1 && col("id_b") === 101)
      .select("est_jaccard", "jaccard").head()
    val (est, exact) = (row.getDouble(0), row.getDouble(1))
    // one of 38 3-shingles changed in 3 places: jaccard ~ 35/41
    assert(exact > 0.7 && exact < 1.0)
    assert(math.abs(est - exact) < 0.35) // 32 hashes: coarse but close
  }

  test("simhash: exact pair at distance 0, near pair close, others far") {
    val sigs = corpus.select(col("doc_id"),
      Dedup.simhash64(col("text")).as("sim"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(0L) == sigs(100L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(101L)) <= 12)
    assert(java.lang.Long.bitCount(sigs(2L) ^ sigs(3L)) > 12)
    val pairs = Dedup.simhashNearDups(corpus, "doc_id", "text", maxDist = 12)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 100L)))
  }

  test("ngram jaccard pairs finds planted pairs only") {
    val pairs = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
      n = 3, minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 100L), (1L, 101L)))
  }

  test("clusterDuplicates collapses chains into min-id components") {
    // components: {1,2,3,4} (a chain, forcing propagation through
    // intermediate labels), {10,11}, and an 8-node path {20..27} whose
    // diameter exercises the pointer-jumping rounds
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L), (24L, 25L),
      (25L, 26L), (26L, 27L))
      .toDF("id_a", "id_b")
    val got = Dedup.clusterDuplicates(pairs)
      .as[(Long, Long)].collect().toMap
    assert((1L to 4L).forall(got(_) == 1L))
    assert(got(10L) == 10L && got(11L) == 10L)
    assert((20L to 27L).forall(got(_) == 20L))
    assert(got.size == 14)
  }

  test("dedupParagraphs keeps globally-first occurrences, reassembles in order") {
    val df = Seq(
      (1L, "alpha beta\ncommon footer\nunique one"),
      (2L, "common footer\nunique two"),
      (3L, "common footer"),            // all paragraphs seen earlier
      (4L, "solo\n\nafter blank")       // empty segment must not count
    ).toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(df, "doc_id", "text")
      .as[(Long, Long, Long, Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == ((3L, 3L, Some("alpha beta\ncommon footer\nunique one"))))
    assert(out(2L) == ((2L, 1L, Some("unique two"))))
    assert(out(3L) == ((1L, 0L, None)))
    assert(out(4L) == ((2L, 2L, Some("solo\nafter blank"))))
    // first occurrence is by (doc id, position): repartitioning the
    // input must not flip which copy survives
    val again = Dedup.dedupParagraphs(df.repartition(5), "doc_id", "text")
      .as[(Long, Long, Long, Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(again == out)
  }

  test("removeRepeatedSpans cuts later occurrences of long spans only") {
    val d1 = "a b c d e f g h i j k l"            // 12 tokens, first
    val d3 = "p q r s t u v w x y z0 z1"          // 12 unique tokens
    val df = Seq(
      (1L, d1),
      (2L, d1 + " x y z"),   // repeats d1's full span, adds 3 own tokens
      (3L, d3),
      (4L, "a b c d e"),     // 5-token prefix of d1: below k, untouched
      (5L, d1)               // exact duplicate: fully removed
    ).toDF("doc_id", "text")
    val out = Dedup.removeRepeatedSpans(df, "doc_id", "text", k = 10)
      .as[(Long, Int, Long, Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == ((12, 0L, Some(d1))))
    assert(out(2L) == ((15, 12L, Some("x y z"))))
    assert(out(3L) == ((12, 0L, Some(d3))))
    assert(out(4L) == ((5, 0L, Some("a b c d e"))))
    assert(out(5L) == ((12, 12L, None)))
  }

  test("contaminationScore is the exact distinct-shingle overlap fraction") {
    val corpus = Seq(
      (1L, "w1 w2 w3 w4"),        // identical to the benchmark doc -> 1.0
      (2L, "w1 w2 w3 x1 x2"),     // shares 1 of its 3 distinct 3-grams
      (3L, "p1 p2 p3 p4")         // disjoint -> 0.0, must still appear
    ).toDF("doc_id", "text")
    val bench = Seq(Tuple1("w1 w2 w3 w4")).toDF("text")
    val out = Dedup.contaminationScore(corpus, "doc_id", "text",
      bench, "text", n = 3)
      .as[(Long, Int, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == ((2, 2L, 1.0)))
    assert(out(2L) == ((3, 1L, 0.3333)))
    assert(out(3L) == ((2, 0L, 0.0)))
  }

  test("novelAgainstHistory equals the plain anti-join, both confirm paths") {
    val history = (0 until 150).map(i => (i.toLong, mkDoc(i)))
      .toDF("doc_id", "text")
    // incoming: 50 novel docs + 30 exact copies of history content
    val incoming = ((200 until 250).map(i => (i.toLong, mkDoc(i))) ++
      (0 until 30).map(i => (1000L + i, mkDoc(i * 4))))
      .toDF("doc_id", "text")
    val expected = (200L until 250L).toSet
    for (bcast <- Seq(true, false)) {
      val kept = Dedup.novelAgainstHistory(incoming, "doc_id", "text",
          history, "text", expectedItems = 256, broadcastCandidates = bcast)
        .select("doc_id").as[Long].collect().toSet
      assert(kept == expected, s"broadcastCandidates=$bcast")
    }
  }

  test("nearNovelAgainstHistory: copies drop, rewordings survive; " +
    "prebuilt-index probe equals the from-corpus call") {
    val history = (0 until 30).map(i => (i.toLong, mkDoc(i)))
      .toDF("doc_id", "text")
    // near-copies of docs 0..9 (first word swapped: Jaccard ~0.95) and
    // token-REVERSED docs 10..14 (same words, disjoint 3-shingles)
    val copies = (0 until 10).map(i =>
      (100L + i, "zzz " + mkDoc(i).split(" ").drop(1).mkString(" ")))
    val reworded = (10 until 15).map(i =>
      (200L + i, mkDoc(i).split(" ").reverse.mkString(" ")))
    val incoming = (copies ++ reworded).toDF("doc_id", "text")
    val kept = Dedup.nearNovelAgainstHistory(incoming, "doc_id", "text",
        history)
      .select("doc_id").as[Long].collect().toSet
    CacheRegistry.releaseAll()
    assert(kept == (210L until 215L).toSet,
      s"only the reworded docs are novel, got $kept")
    // probing a prebuilt index yields the same duplicate set
    val (hs, hb) = Dedup.buildMinhashIndex(history, "doc_id", "text")
    val (is2, ib2) = Dedup.buildMinhashIndex(incoming, "doc_id", "text")
    val dups = Dedup.nearDupsAgainstIndex(is2, ib2, hs, hb)
      .as[Long].collect().toSet
    assert(dups == (100L until 110L).toSet)
    // registry hygiene: nothing from THIS op's persists may survive the
    // releaseAll. Scope to Dedup call sites — the context is shared
    // across suites, and other suites' localCheckpoint RDDs linger
    // until GC (ContextCleaner semantics), which is not a leak here.
    val lingering = spark.sparkContext.getPersistentRDDs.values
      .filter(_.toString.contains("Dedup.scala"))
    assert(lingering.isEmpty, s"leaked Dedup persists: $lingering")
  }

  test("bloom probe has no false negatives; persisted image is reusable") {
    val history = (0 until 100).map(i => (i.toLong, mkDoc(i)))
      .toDF("doc_id", "text")
    val bytes = Dedup.contentBloom(history, "text", expectedItems = 128)
    // every history doc must probe true against its own bloom
    val hits = history
      .filter(Dedup.bloomMightContain(bytes, xxhash64(col("text"))))
      .count()
    assert(hits == 100L, "a bloom filter cannot produce false negatives")
    // a saved image drives the same novel set as an inline build
    val incoming = ((300 until 320).map(i => (i.toLong, mkDoc(i))) ++
      (0 until 10).map(i => (2000L + i, mkDoc(i))))
      .toDF("doc_id", "text")
    val kept = Dedup.novelAgainstHistory(incoming, "doc_id", "text",
        history, "text", expectedItems = 128, bloom = Some(bytes))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == (300L until 320L).toSet)
  }
}
