package graft.ops

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** BM25: exact agreement with a pure-JVM replay of the score chain,
  * ranking sanity (rarer matches outrank common ones; tf saturates;
  * longer docs penalized), tie-break and k semantics.
  */
class TextSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // df(rare)=1 -> positive idf; df(common)=4 of 6 -> NEGATIVE idf
  // (the classic-BM25 regime); df = n/2 would give idf exactly 0
  private val docs = Seq(
    (1L, "common common filler filler filler filler"),
    (2L, "common filler filler"),
    (3L, "rare rare common filler"),
    (4L, "filler filler filler filler"),
    (5L, "common"),
    (6L, ""))

  private val terms = Seq("rare", "common")
  private val (k1, b) = (1.2, 0.75)

  /** Pure-JVM replay of bm25TopK's exact arithmetic. */
  private def localScores: Map[Long, Double] = {
    def toks(s: String) = s.toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
    val n = docs.size.toLong
    val dls = docs.map { case (id, t) => id -> toks(t).length.toLong }.toMap
    val avgdl = dls.values.sum.toDouble / n
    val tf = docs.map { case (id, t) =>
      id -> terms.map(q => toks(t).count(_ == q).toLong)
    }.toMap
    val idf = terms.indices.map { i =>
      val df = docs.count { case (id, _) => tf(id)(i) > 0 }.toLong
      math.round(math.log((n - df + 0.5) / (df + 0.5)) * 1e6) / 1e6
    }
    docs.map { case (id, _) =>
      id -> terms.indices.map { i =>
        val t = tf(id)(i)
        if (t > 0)
          idf(i) * (t * (k1 + 1.0)) /
            (t + k1 * ((1.0 - b) + b * (dls(id) / avgdl)))
        else 0.0
      }.reduceLeft(_ + _)
    }.toMap
  }

  test("scores equal the pure-JVM replay exactly; ranking is sane") {
    val got = TextSearch.bm25TopK(docs.toDF("doc_id", "text"), terms, k = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val local = localScores
    got.foreach { case (id, _, s) => assert(s == local(id), s"doc $id") }
    // ranking: returned in (score desc, id asc) order
    val ranked = got.map(_._1).toSeq
    assert(ranked == local.toSeq.sortBy { case (id, s) => (-s, id) }.map(_._1))
    // the only rare-matching doc tops the ranking despite its length
    assert(ranked.head == 3L && local(3L) > local(1L))
    // common-only docs score NEGATIVE (df > n/2); no-match docs exactly 0
    assert(local(1L) < 0.0 && local(5L) < 0.0)
    assert(local(4L) == 0.0 && local(6L) == 0.0)
  }

  test("k truncates after the (score desc, id asc) order") {
    val top2 = TextSearch.bm25TopK(docs.toDF("doc_id", "text"), terms, k = 2)
      .collect().map(_.getLong(0)).toSeq
    val local = localScores
    assert(top2 == local.toSeq.sortBy { case (id, s) => (-s, id) }
      .map(_._1).take(2))
  }

  test("tf saturation: doubling tf raises the score sublinearly") {
    val one = 1.0 * (k1 + 1.0) / (1.0 + k1)
    val two = 2.0 * (k1 + 1.0) / (2.0 + k1)
    assert(two < 2 * one && two > one)
    assert(localScores(3L) > 0.0)
  }

  test("inverted index query == full-scan bm25 on matching docs") {
    val dir = java.nio.file.Files.createTempDirectory("bm25_idx").toString
    TextSearch.buildInvertedIndex(docs.toDF("doc_id", "text"), dir,
      nBuckets = 8)
    val idx = TextSearch.queryInvertedIndex(spark, dir, terms, k = 6,
        nBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val full = TextSearch.bm25TopK(docs.toDF("doc_id", "text"), terms, k = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (id, _, _) => // index can only see matching docs
        val l = localScores
        Seq(1L, 2L, 3L, 5L).contains(id)
      }.toSeq
    assert(idx == full)
  }

  test("segmented index (build + two appends) == one-shot rebuild, " +
    "cross-segment terms merge df/stats exactly") {
    import spark.implicits._
    // 'common' spans all three segments, 'rare' only the appended ones —
    // df and avgdl must merge across segments for scores to agree
    val seg1 = Seq((1L, "common common filler"), (2L, "common filler"))
    val seg2 = Seq((3L, "rare rare common filler"), (4L, "filler filler"))
    val seg3 = Seq((5L, "common rare"), (6L, ""))
    val all = seg1 ++ seg2 ++ seg3
    val inc = java.nio.file.Files.createTempDirectory("bm25_inc").toString
    TextSearch.buildInvertedIndex(seg1.toDF("doc_id", "text"), inc,
      nBuckets = 8)
    TextSearch.appendToInvertedIndex(seg2.toDF("doc_id", "text"), inc,
      nBuckets = 8)
    TextSearch.appendToInvertedIndex(seg3.toDF("doc_id", "text"), inc,
      nBuckets = 8)
    val full = java.nio.file.Files.createTempDirectory("bm25_full").toString
    TextSearch.buildInvertedIndex(all.toDF("doc_id", "text"), full,
      nBuckets = 8)
    def q(dir: String) = TextSearch.queryInvertedIndex(spark, dir,
        Seq("rare", "common"), k = 10, nBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(q(inc) == q(full), "segmented index must equal fresh rebuild")
    assert(q(inc).map(_._1).toSet == Set(1L, 2L, 3L, 5L))
  }

  test("whole-index merge folds segments appended between snapshot and " +
    "publish — zero row loss under a concurrent writer") {
    import spark.implicits._
    val seg1 = Seq((1L, "common common filler"), (2L, "common filler"))
    val seg2 = Seq((3L, "rare rare common filler"), (4L, "filler filler"))
    val late = Seq((5L, "common rare"), (6L, "novel appendix"))
    val dir = java.nio.file.Files.createTempDirectory("bm25_conc").toString
    TextSearch.buildInvertedIndex(seg1.toDF("doc_id", "text"), dir,
      nBuckets = 8)
    TextSearch.appendToInvertedIndex(seg2.toDF("doc_id", "text"), dir,
      nBuckets = 8)
    // the merge pins its snapshot listings, THEN a concurrent append
    // lands (the lost-append window the delta guard closes): the
    // published version must carry the late segments — losing them
    // would be permanent, docs_seen refuses re-appends
    TextSearch.compactInvertedIndex(spark, dir, None,
      () => TextSearch.appendToInvertedIndex(late.toDF("doc_id", "text"),
        dir, nBuckets = 8))
    val full = java.nio.file.Files
      .createTempDirectory("bm25_conc_full").toString
    TextSearch.buildInvertedIndex((seg1 ++ seg2 ++ late)
      .toDF("doc_id", "text"), full, nBuckets = 8)
    def q(d: String) = TextSearch.queryInvertedIndex(spark, d,
        Seq("rare", "common", "novel"), k = 10, nBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(q(dir) == q(full),
      "segments appended mid-merge must survive the version flip")
  }

  test("index postings scan prunes to the query terms' buckets") {
    val dir = java.nio.file.Files.createTempDirectory("bm25_idx2").toString
    TextSearch.buildInvertedIndex(docs.toDF("doc_id", "text"), dir,
      nBuckets = 8)
    val plan = TextSearch.queryInvertedIndex(spark, dir, Seq("rare"), k = 3,
        nBuckets = 8)
      .queryExecution.executedPlan.toString
    // the bucket predicate must be a PARTITION filter on the postings
    // scan (directory pruning), not a post-scan row filter
    val scanLine = plan.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("term_bucket"))
    assert(scanLine.isDefined, s"no term_bucket PartitionFilters in:\n$plan")
  }

  test("unknown term: df=0 idf applies, no candidates from that term") {
    val dir = java.nio.file.Files.createTempDirectory("bm25_idx3").toString
    TextSearch.buildInvertedIndex(docs.toDF("doc_id", "text"), dir,
      nBuckets = 8)
    val out = TextSearch.queryInvertedIndex(spark, dir,
      Seq("rare", "zzz_absent"), k = 10, nBuckets = 8).collect()
    assert(out.map(_.getLong(0)).toSet == Set(3L)) // only doc 3 has 'rare'
  }

  test("trigram grep: indexed == full scan; substrings cross token " +
    "boundaries; case-sensitive") {
    val corpus = Seq(
      (1L, "alpha beta gamma"),
      (2L, "the alphabet song"),     // 'alpha' inside a longer token
      (3L, "ALPHA BETA"),            // case differs -> no match
      (4L, "unrelated text here"),
      (5L, "ha be"))                 // shares trigrams 'ha ', 'a b', ' be'
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("tri_idx").toString
    TextSearch.buildTrigramIndex(corpus, dir)
    def grep(q: String): Set[Long] =
      TextSearch.grepIndexed(spark, dir, corpus, q)
        .collect().map(_.getLong(0)).toSet
    def full(q: String): Set[Long] =
      corpus.filter(col("text").contains(q))
        .collect().map(_.getLong(0)).toSet
    for (q <- Seq("alpha", "ha be", "alpha beta", "beta gamma",
        "ALPHA", "song", "zzz", "text here"))
      assert(grep(q) == full(q), s"literal '$q'")
    // cross-token witnesses: 'alphabet' contains 'alpha' (docs 1 AND
    // 2), and 'alpHA BEta' contains 'ha be' (doc 1 as well as the
    // verbatim doc 5) — substring search sees through token boundaries
    assert(grep("alpha") == Set(1L, 2L))
    assert(grep("ha be") == Set(1L, 5L))
  }

  test("requiredLiterals: sound under quantifiers, escapes, alternation") {
    assert(TextSearch.requiredLiterals("merge [a-z]*batch") ==
      Seq("merge ", "batch"))
    // 'b' may repeat 0 times under * -> dropped from its run
    assert(TextSearch.requiredLiterals("alphab*eta") == Seq("alpha", "eta"))
    // {0,3} may repeat 'c' zero times -> 'ab' survives but is < 3 chars
    assert(TextSearch.requiredLiterals("abcd{0,3}e") == Seq("abc"))
    // class bodies are never literals
    assert(TextSearch.requiredLiterals("xyz[abc]*w").toSet == Set("xyz"))
    // + keeps the full run (one occurrence required), space included
    assert(TextSearch.requiredLiterals("merge +batch") ==
      Seq("merge ", "batch"))
    // groups disable extraction (a trailing ? would void their runs)
    assert(TextSearch.requiredLiterals("(abc)?def").isEmpty)
    // escapes break runs; alternation disables extraction entirely
    assert(TextSearch.requiredLiterals("data\\.quality") ==
      Seq("data", "quality"))
    assert(TextSearch.requiredLiterals("alpha|beta").isEmpty)
    assert(TextSearch.requiredLiterals("^x[0-9]$").isEmpty) // all < 3 chars
  }

  test("regex grep: indexed == full scan across pattern shapes") {
    val corpus = Seq(
      (1L, "alpha beta gamma"),
      (2L, "the alphabet song"),
      (3L, "merge   batch now"),
      (4L, "merge batch"),
      (5L, "unrelated text"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("tri_idx3").toString
    TextSearch.buildTrigramIndex(corpus, dir)
    def grep(p: String): Set[Long] =
      TextSearch.grepRegexIndexed(spark, dir, corpus, p)
        .collect().map(_.getLong(0)).toSet
    def full(p: String): Set[Long] =
      corpus.filter(col("text").rlike(p))
        .collect().map(_.getLong(0)).toSet
    for (p <- Seq("merge +batch", "alpha.*gamma", "alpha|song",
        "^merge", "bat.h", "qqq+z",
        // alternation shapes: wrapped, non-capturing, per-branch
        // quantifiers, a dead branch, an unconstrained (short) branch
        "(alpha|song)", "(?:alpha|merge +batch)", "qqqz|song",
        "alpha|x", "gamma$|^the"))
      assert(grep(p) == full(p), s"pattern '$p'")
    assert(grep("merge +batch") == Set(3L, 4L))
    assert(grep("alpha|song") == Set(1L, 2L)) // pruned union, exact
    assert(grep("qqqz|song") == Set(2L)) // dead branch drops from union
  }

  test("alternationBranches: top-level split, outer group, bail shapes") {
    assert(TextSearch.alternationBranches("a|b") == Some(Seq("a", "b")))
    assert(TextSearch.alternationBranches("(alpha|beta)") ==
      Some(Seq("alpha", "beta")))
    assert(TextSearch.alternationBranches("(?:alpha|beta)") ==
      Some(Seq("alpha", "beta")))
    // '|' inside a class is literal, escapes survive the split
    assert(TextSearch.alternationBranches("a[|]b|c\\|d") ==
      Some(Seq("a[|]b", "c\\|d")))
    assert(TextSearch.alternationBranches("plain") == Some(Seq("plain")))
    // nested / mid-pattern / quantified groups bail
    assert(TextSearch.alternationBranches("(a|b)c").isEmpty)
    assert(TextSearch.alternationBranches("x(a|b)").isEmpty)
    assert(TextSearch.alternationBranches("((a)|b)").isEmpty)
  }

  test("trigram grep: short literals fall back, absent trigrams " +
    "short-circuit empty") {
    val corpus = Seq((1L, "abc def"), (2L, "xyz")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("tri_idx2").toString
    TextSearch.buildTrigramIndex(corpus, dir)
    // < 3 chars: full-scan fallback, still exact
    assert(TextSearch.grepIndexed(spark, dir, corpus, "ab")
      .collect().map(_.getLong(0)).toSet == Set(1L))
    // a literal whose trigram exists in no doc: empty without scanning
    val out = TextSearch.grepIndexed(spark, dir, corpus, "abq def")
    assert(out.collect().isEmpty)
  }

  test("rrf fusion: exact hand-computed scores, absent-list zeros, " +
    "id tie-break") {
    // lex: docs 1,2,3 at ranks 1,2,3; vec: docs 3,4 at ranks 1,2
    val lex = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val vec = Seq((3L, 1), (4L, 2)).toDF("doc_id", "rank")
    val out = TextSearch.rrfFuse(Seq("lex" -> lex, "vec" -> vec),
      k = 10, k0 = 60).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toSeq
    def c(r: Int) = 1.0 / (60.0 + r)
    // doc 3 is in both lists: 1/(60+3) + 1/(60+1) — the top fused doc
    val expect = Map(1L -> c(1), 2L -> c(2), 3L -> (c(3) + c(1)),
      4L -> c(2))
    assert(out.toMap == expect)
    // ordering: rrf desc; docs 2 and 4 tie exactly (both rank 2 in one
    // list) -> ascending id breaks the tie
    assert(out.map(_._1) == Seq(3L, 1L, 2L, 4L))
    // per-list rank columns survive with NULLs where the list misses
    val row4 = TextSearch.rrfFuse(Seq("lex" -> lex, "vec" -> vec),
      k = 10).filter(col("doc_id") === 4L).collect().head
    assert(row4.isNullAt(1) && row4.getInt(2) == 2)
  }

  test("rrf fusion: k truncates on the fused order") {
    val lex = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val vec = Seq((3L, 1), (4L, 2)).toDF("doc_id", "rank")
    val top2 = TextSearch.rrfFuse(Seq("lex" -> lex, "vec" -> vec), k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(top2 == Seq(3L, 1L))
  }
}
