package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions
import graft.ops.{Bpe, Dedup, Denoise, NgramLm, Packing, RandomProjection, Sampling, Similarity, TermStats}

/** Training-data-pipeline operator surface: text analysis, dedup,
  * similarity search over the `documents`/`embeddings` fixtures.
  *
  * Hash-based ops (MinHash/SimHash/ANN) have no DuckDB equivalent of
  * Spark's xxhash64, so they carry rows-only checks here and exact
  * ScalaTest specs with planted duplicates; the arithmetic text ops are
  * fully oracle-checked.
  *
  * To make near-dup results non-degenerate on the all-distinct fixture
  * corpus, the dedup queries plant deterministic perturbed copies
  * (doc_id + 100000, one word changed) — the operator must find exactly
  * those pairs.
  */
object TextQueries {

  type Q = (SparkSession, String) => DataFrame

  /** The deterministic "previous crawl" snapshot the diff/patch queries
    * derive from the fixture: docs with doc_id % 7 == 0 absent (they
    * read as added), % 5 == 0 re-texted (changed), plus shifted-id
    * phantoms (removed). */
  private def derivedPreviousSnapshot(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v1")))
          .otherwise(col("text")).as("text"))
      // phantom shift is NOT a multiple of any corpus replication stride
      // (ScalingProbe replicates at 10M strides; 500M clears every
      // replica band, keeping snapshot ids unique at any probe scale)
      .union(docs.filter(col("doc_id") % 97 === 0)
        .select((col("doc_id") + 500000000L).as("doc_id"), col("text")))

  /** documents ∪ perturbed copies of docs with doc_id % 10 == 0: same
    * text with the first word replaced — a high-Jaccard near-dup. */
  // one inverted index per sf dir per JVM (Verify/Bench call repeatedly)
  private val bm25IdxCache = scala.collection.concurrent.TrieMap[String, String]()
  private val bm25UpsertIdxCache = scala.collection.concurrent.TrieMap[String, String]()
  private val packShardCache = scala.collection.concurrent.TrieMap[String, String]()
  private val bpePackCache = scala.collection.concurrent.TrieMap[String, String]()
  private val trigramIdxCache = scala.collection.concurrent.TrieMap[String, String]()
  private val minerIvfCache = scala.collection.concurrent.TrieMap[String, String]()
  private val ivfUpsertCache = scala.collection.concurrent.TrieMap[String, String]()
  private val lmModelCache = scala.collection.concurrent.TrieMap[String, String]()
  private val curriculumShardCache = scala.collection.concurrent.TrieMap[String, String]()
  private val trainShardCache = scala.collection.concurrent.TrieMap[String, String]()
  private val manifestShardCache = scala.collection.concurrent.TrieMap[String, String]()
  private val trainShardEosCache = scala.collection.concurrent.TrieMap[String, String]()
  private val tokenizerCache = scala.collection.concurrent.TrieMap[String, String]()
  private val curTensorCache = scala.collection.concurrent.TrieMap[String, String]()
  private val mmShardCache = scala.collection.concurrent.TrieMap[String, String]()

  /** Trigram LM trained ONCE per dataset dir (the bpePackCache
    * convention): the model is a persisted artifact by design
    * (NgramLm's train/score split), so repeated Verify/Bench/probe
    * invocations time the SCORING path against the standing model
    * instead of retraining — and stop leaking one temp dir per call. */
  private def lmModelFor(s: org.apache.spark.sql.SparkSession,
                         d: String): String =
    lmModelCache.getOrElseUpdate(d, {
      val dir = java.nio.file.Files.createTempDirectory("graft_lm").toString
      NgramLm.trainModel(
        Tables.documents(s, d).select(col("doc_id"), col("text")), dir)
      dir
    })

  /** Deterministic labeled IVF index for the ANN miner entries: coarse
    * quantizer = the 16 lowest-id embeddings (engine-portable — the
    * DuckDB oracle replays assignment, probing and in-cell ranking
    * exactly, so the miners are hash-checked, not rows-only), labels
    * stored IN the index so mining needs no corpus-sized label join.
    * Built once per sf dir (probe cost is the thing the entries and
    * bench measure; the build is the amortized side, timed separately
    * by the ann_ivf_index_build bench entry). */
  private def minerIvfDir(s: SparkSession, d: String): String =
    minerIvfCache.getOrElseUpdate(d, {
      val r = java.nio.file.Files.createTempDirectory("graft_ivf_miner")
        .toString
      val vecs = Tables.embeddings(s, d)
      Similarity.buildIvfIndex(vecs, r, nCentroids = 16,
        labelCol = Some("label"),
        centers = Some(Similarity.lowestIdCenters(vecs, 16)))
      r
    })

  private def corpusWithPlants(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val plants = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(lit("zzz "), expr("substring(text, instr(text, ' ') + 1)"))
          .as("text"))
    docs.union(plants)
  }

  /** embeddings ∪ scaled copies (vec_id + 100000): cosine 1 pairs. */
  private def vectorsWithPlants(s: SparkSession, d: String): DataFrame = {
    val vecs = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val plants = vecs.filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.01f)).as("embedding"))
    vecs.union(plants)
  }

  val queries: Map[String, Q] = Map(
    // ---- text analysis (oracle-checked) ----
    "text_stats" -> { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        TextFunctions.digitCount(col("text")).as("n_digits"),
        round(TextFunctions.avgTokenLen(col("text")), 4).as("avg_token_len"),
        TextFunctions.approxBpeTokenCount(col("text")).as("n_bpe_tokens"))
    },

    "text_quality" -> { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        round(TextFunctions.qualityScore(col("text")), 4).as("quality"))
    },

    "text_lang_id" -> { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"), col("lang").as("lang_label"),
        TextFunctions.langId(col("text")).as("lang_pred"))
    },

    // lang-id confusion matrix: labeled vs detected language counts —
    // the calibration table a curation run reads before trusting the
    // detector's gates. Pure codegen detection + one partial-agg
    // shuffle on the (label, pred) pair.
    "lang_confusion" -> { (s, d) =>
      Tables.documents(s, d).select(
          col("lang").as("lang_label"),
          TextFunctions.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang_label"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
    },

    // per-language quality gate: keep the top half by quality score
    // (row_number with doc_id tiebreak — percentile cutoffs on the
    // coarse rule-sum score would be tie-ambiguous across engines)
    // Model-based quality gate (ops/QualityClassifier): train a
    // fastText-shaped logistic regression on hashed BoW INSIDE the
    // engine (full-batch GD, micro-grid weights -> bit-reproducible),
    // here on the deterministic is-English label, then score the whole
    // corpus. HASH-checked since round 10: the micro-grid design makes
    // the whole GD trajectory engine-exact, so the oracle unrolls all
    // six epochs as CTE chains (QualityClassifierOracle); the
    // planted-separation and reproducibility laws live in
    // QualityClassifierSpec.
    "quality_classifier" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val labeled = docs.withColumn("label",
        (col("lang") === "en").cast("int"))
      val model = graft.ops.QualityClassifier.train(labeled, "doc_id",
        "text", "label", dim = 1024, epochs = 6, lr = 1.0)
      graft.ops.QualityClassifier.score(labeled, model, "doc_id", "text")
        .select(col("doc_id"), col("label"), col("score"), col("keep"))
    },

    "quality_gate" -> { (s, d) =>
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("q").desc, col("doc_id"))
      val cw = Window.partitionBy(col("lang"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          TextFunctions.qualityScore(col("text")).as("q"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(cw))
        .filter(col("rn") <= (col("n") / lit(2)).cast("long"))
        .select(col("doc_id"), col("lang"),
          round(col("q"), 4).as("quality"))
    },

    // Per-source document cap (the RefinedWeb/CCNet anti-spam rule:
    // no single domain may dominate the corpus) — keep the K best docs
    // per source (K = 20) by quality via the bounded-heap TopKAgg: the shuffle
    // carries one k-sized buffer per (partition, source), and doc
    // payloads re-attach by an id-keyed join AFTER the cap (text never
    // rides the top-k shuffle).
    "cap_per_source" -> { (s, d) =>
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"),
          TextFunctions.qualityScore(col("text")).as("q0"))
      scored.groupBy(col("source"))
        .agg(graft.functions.TopKAgg(col("q0"), col("doc_id"), 20).as("top"))
        .select(col("source"), explode(col("top")).as("e"))
        .select(col("source"), col("e.id").as("doc_id"),
          round(col("e.score"), 4).as("quality"))
        .join(scored.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
        .select(col("doc_id"), col("source"), col("quality"), col("n_chars"))
    },

    // Gopher-style within-doc repetition gate (duplicate n-gram fraction)
    "text_repetition" -> { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextFunctions.repetitionRatio(col("text"), 2).as("rep2"),
        TextFunctions.repetitionRatio(col("text"), 3).as("rep3"))
    },

    "text_fingerprint" -> { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fp"))
    },

    // PII is planted deterministically (the fixture corpus has none), so
    // the redaction rules demonstrably fire; oracle runs the
    // byte-identical regex chain with DuckDB's 'g' flag.
    "text_redact_pii" -> { (s, d) =>
      val planted = concat(col("text"),
        lit(" Contact user"), col("doc_id").cast("string"),
        lit("@example.com or (415) 555-2671, SSN 123-45-6789, host 10.0."),
        (col("doc_id") % 256).cast("string"), lit(".7."))
      Tables.documents(s, d).select(
        col("doc_id"), TextFunctions.redactPii(planted).as("redacted"))
    },

    // Term-blocklist gate (the C4 "bad words" filter class): ONE
    // case-insensitive word-boundary alternation regex over the whole
    // list — a single codegen pass per doc regardless of list size, no
    // shuffle. Planted violations (the fixture corpus is clean) prove
    // each phrase fires and that `\b` blocks substring false-positives
    // ("casinos" must NOT hit "casino").
    "blocklist_filter" -> { (s, d) =>
      import s.implicits._
      val terms = Seq("casino", "free money", "click here", "winner")
      val plants = Seq(
        (900001L, "win FREE MONEY now at our casino tonight"),
        (900002L, "a casino-adjacent bird with a hyphen boundary"),
        (900003L, "click here to claim it, certified WINNER"),
        (900004L, "the casinos plural and moneyfree must not match"))
        .toDF("doc_id", "text")
      val corpus = Tables.documents(s, d).select(col("doc_id"), col("text"))
        .union(plants)
      corpus.select(
        col("doc_id"),
        TextFunctions.blocklistHitCount(col("text"), terms).cast("int")
          .as("n_hits"),
        (!TextFunctions.blocklistHit(col("text"), terms)).cast("int")
          .as("keep"))
    },

    // Per-doc sentence stats (Gopher-style quality features: boilerplate
    // and markup debris segment degenerately). RE2 has no lookbehind, so
    // segmentation is "maximal non-terminator run + trailing .!? run",
    // whitespace-only fragments dropped — byte-identical in DuckDB.
    "text_sentences" -> { (s, d) =>
      val sents = TextFunctions.sentences(col("text"))
      Tables.documents(s, d).select(
        col("doc_id"),
        size(sents).as("n_sentences"),
        when(size(sents) > 0,
          round(aggregate(sents, lit(0L), (a, x) => a + length(x).cast("long"))
            .cast("double") / size(sents).cast("double"), 4))
          .otherwise(lit(0.0)).as("mean_sent_chars"))
    },

    // Quality-score distribution per source (0.05-wide buckets) — the
    // threshold-picking dashboard a curation run reads before setting
    // the gate. The rule-sum score is the same double chain on both
    // engines (corpus_report already pins parity at the 0.7 gate), so
    // floor(q*20) buckets identically; one partial-agg shuffle.
    "quality_histogram" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("source"),
          TextFunctions.qualityScore(col("text")).as("q"))
        .withColumn("bucket", floor(col("q") * 20).cast("int"))
        .groupBy(col("source"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"))
    },

    // Corpus-level top-k word bigrams: explode + partial-agg count +
    // TakeOrdered (no global sort); deterministic tiebreak on the ngram.
    "corpus_top_ngrams" -> { (s, d) =>
      Tables.documents(s, d)
        .select(explode(TextFunctions.wordShingles(lower(col("text")), 2))
          .as("ngram"))
        .groupBy(col("ngram")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("ngram"))
        .limit(20)
    },

    // PIVOT (§2.11 built-ins showcase): source x lang doc-count matrix
    // — Spark's relational pivot with an explicit value list (the
    // at-scale form: no extra distinct-scan job to discover columns),
    // absent combinations filled to 0 so both engines agree
    "pivot_lang_counts" -> { (s, d) =>
      Tables.documents(s, d)
        .groupBy(col("source"))
        .pivot("lang", Seq("de", "en", "es", "fr", "zh"))
        .agg(count(lit(1)))
        .na.fill(0L)
    },

    // Per-source corpus report: the summary a curation run consults
    // before choosing mixture weights. Every column is engine-exact:
    // integer sums, a distinct count, a threshold count on the
    // deterministic per-doc quality score (no FP averages whose
    // summation order could diverge), one final divide.
    "corpus_report" -> { (s, d) =>
      Tables.documents(s, d).groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text")).cast("long"))
            .as("n_tokens"),
          sum(length(col("text")).cast("long")).as("n_chars"),
          count_distinct(col("lang")).as("n_langs"),
          sum(when(TextFunctions.qualityScore(col("text")) >= 0.7, 1L)
            .otherwise(0L)).as("n_high_quality"))
        .withColumn("mean_doc_tokens",
          round(col("n_tokens").cast("double") / col("n_docs").cast("double"),
            6))
    },

    // Feature hashing (ops/FeatureHash): vocabulary-free signed
    // bag-of-words vectors — the engine MAKES vectors from raw text
    // (hashing trick) instead of only consuming precomputed embeddings.
    // md5-derived bucket/sign so DuckDB replays the exact sparse rows.
    "embed_feature_hash" -> { (s, d) =>
      graft.ops.FeatureHash.hashedTf(
        Tables.documents(s, d), "doc_id", "text", dim = 64)
        .withColumnRenamed("id", "doc_id")
    },

    // DSIR importance weights (ops/Dsir, Xie et al. 2023): per-doc
    // hashed-unigram log-likelihood ratio against the English
    // subcorpus as the target, snapped to integer micro-nats so the
    // weight is an order-independent exact BIGINT sum — DuckDB
    // replays buckets, smoothing, and the micro-nat grid bit-for-bit.
    "dsir_weights" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.ops.Dsir.importanceWeights(docs,
        docs.filter(col("lang") === "en"), nBuckets = 256)
    },

    // DSIR selection: the top quarter by (weight desc, doc_id) — the
    // threshold + boundary-tie-fill path, equivalent to (and replayed
    // by the oracle as) an exact top-k under that total order.
    "dsir_resample" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.ops.Dsir.resampleTop(docs,
        docs.filter(col("lang") === "en"), fraction = 0.25, nBuckets = 256)
    },

    // BM25 full-text search (ops/TextSearch): ad-hoc relevance top-k
    // over the corpus — mixed-df query (rare 'dup' gets positive idf,
    // common 'key'/'vector' go negative: the classic-BM25 regime the
    // oracle must replay sign-exactly). idf micro-nat-snapped, fixed
    // per-term addition order, TakeOrderedAndProject top-k.
    "bm25_search" -> { (s, d) =>
      graft.ops.TextSearch.bm25TopK(Tables.documents(s, d),
        Seq("dup", "key", "vector"), k = 25)
        .withColumn("score", round(col("score"), 6))
    },

    // BM25 against the PERSISTED inverted index (TextSearch
    // .buildInvertedIndex / queryInvertedIndex — the Lucene-shaped
    // build/query split): query cost tracks the query terms' postings,
    // never the corpus. Built once per JVM; k=15 keeps every returned
    // rank in the positive-score region where index == full scan.
    "bm25_index_search" -> { (s, d) =>
      val dir = bm25IdxCache.getOrElseUpdate(d, {
        val r = java.nio.file.Files.createTempDirectory("graft_bm25_idx")
          .toString
        graft.ops.TextSearch.buildInvertedIndex(Tables.documents(s, d), r)
        r
      })
      graft.ops.TextSearch.queryInvertedIndex(s, dir,
        Seq("dup", "key", "vector"), k = 15)
        .withColumn("score", round(col("score"), 6))
    },

    // Incrementally MAINTAINED inverted index (TextSearch
    // .appendToInvertedIndex — the Lucene segment model: appends only,
    // probe-time df/stats merge): built on the even-id half, the odd
    // half appended as a second segment. The oracle is the one-shot
    // full-corpus BM25 chain — the segmented index must be
    // indistinguishable from a fresh rebuild.
    "bm25_index_upsert" -> { (s, d) =>
      val dir = bm25UpsertIdxCache.getOrElseUpdate(d, {
        val r = java.nio.file.Files.createTempDirectory("graft_bm25_ups")
          .toString
        val docs = Tables.documents(s, d)
        graft.ops.TextSearch.buildInvertedIndex(
          docs.filter(col("doc_id") % 2 === 0), r)
        graft.ops.TextSearch.appendToInvertedIndex(
          docs.filter(col("doc_id") % 2 === 1), r)
        r
      })
      graft.ops.TextSearch.queryInvertedIndex(s, dir,
        Seq("dup", "key", "vector"), k = 15)
        .withColumn("score", round(col("score"), 6))
    },

    // Hybrid retrieval (TextSearch.rrfFuse): reciprocal-rank fusion of
    // the BM25 lexical ranking with the brute-cosine vector ranking
    // (query = doc 7's embedding; vec_id aligns 1:1 with doc_id in the
    // fixture). Lexical depth 25 = the positive-score region at sf0.01
    // (exactly the docs containing rare 'dup'), so the hit-only Spark
    // list and the all-docs oracle chain agree on the candidate set.
    // The k-bounded window rank over the top-25 list is 25 rows — not a
    // corpus-global sort.
    "hybrid_rrf_search" -> { (s, d) =>
      val lex = graft.ops.TextSearch.bm25TopK(Tables.documents(s, d),
          Seq("dup", "key", "vector"), k = 25)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id").asc)))
        .select(col("doc_id"), col("rank"))
      val vecs = Tables.embeddings(s, d)
      val vec = Similarity.bruteForceTopK(vecs,
          vecs.filter(col("vec_id") === 7), k = 25)
        .select(col("corpus_id").as("doc_id"), col("rank"))
      graft.ops.TextSearch.rrfFuse(Seq("lex" -> lex, "vec" -> vec), k = 20)
        .withColumn("rrf", round(col("rrf"), 6))
    },

    // Literal substring grep through the PERSISTED trigram index
    // (TextSearch.buildTrigramIndex / grepIndexed — Cox's Code-Search
    // method): candidates from the phrase's rarest trigrams, exact
    // contains() confirm over candidates only. The oracle is the full
    // scan — indexed grep must equal it exactly (the trigram stage
    // only over-selects).
    "grep_indexed" -> { (s, d) =>
      val dir = trigramIdxCache.getOrElseUpdate(d, {
        val r = java.nio.file.Files.createTempDirectory("graft_tri_idx")
          .toString
        graft.ops.TextSearch.buildTrigramIndex(Tables.documents(s, d), r)
        r
      })
      graft.ops.TextSearch.grepIndexed(s, dir, Tables.documents(s, d),
        "merge batch")
    },

    // Regex grep through the same index: a top-level ALTERNATION —
    // candidates are the union of per-branch rarest-gram conjunctions
    // ('merge '+'batch' for one branch, 'value ' and 'scan' for the
    // other — BOTH branches contribute matching docs), the exact rlike confirms. Oracle = the full scan.
    "grep_regex_indexed" -> { (s, d) =>
      val dir = trigramIdxCache.getOrElseUpdate(d, {
        val r = java.nio.file.Files.createTempDirectory("graft_tri_idx")
          .toString
        graft.ops.TextSearch.buildTrigramIndex(Tables.documents(s, d), r)
        r
      })
      graft.ops.TextSearch.grepRegexIndexed(s, dir, Tables.documents(s, d),
        "merge [a-z]*batch|value +scan")
    },

    // Line-level boilerplate curation (ops/LineFilter): CCNet-style
    // line rules — reflow the fixture prose into 8-word lines, plant
    // docs carrying nav/ALL-CAPS/digit-spam/fragment lines, and keep
    // only prose-like lines, reassembling each doc. All-integer rule
    // arithmetic; DuckDB replays line building + rules + reassembly.
    "clean_lines" -> { (s, d) =>
      import s.implicits._
      val toks = TextFunctions.tokens(col("text"))
      // greatest(..., 0) guards the zero-token doc: sequence(0, -1)
      // would DESCEND ([0, -1] -> two phantom lines) where the oracle's
      // range(0, 0) is empty — both sides now emit one empty line
      val lined = array_join(
        transform(
          sequence(lit(0),
            greatest(ceil(size(toks) / lit(8.0)).cast("int") - 1, lit(0))),
          i => array_join(slice(toks, i * 8 + 1, lit(8)), " ")), "\n")
      val plants = Seq(
        (920001L, "HOME | ABOUT | CONTACT US\nA perfectly ordinary prose sentence that should survive the filter.\n12345 67890 13579 24680 999"),
        (920002L, "COOKIE NOTICE\nshort\nanother normal lowercase sentence with plenty of words here"),
        (920003L, "ALL CAPS SHOUTING HEADER LINE\nMixed Case is fine when lowercase dominates the letters."))
        .toDF("doc_id", "text")
      val corpus = Tables.documents(s, d)
        .select(col("doc_id"), lined.as("text"))
        .union(plants)
      graft.ops.LineFilter.cleanLines(corpus, "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_lines"), col("n_kept"),
          col("text_clean"))
    },

    // Snapshot diff (ops/CorpusDiff): added / removed / changed docs
    // between two crawls, detected by content fingerprint. The previous
    // snapshot is derived deterministically from the fixture: docs with
    // doc_id % 7 == 0 absent (-> added), % 5 == 0 re-texted (-> changed),
    // plus shifted-id phantoms (-> removed). md5 is the fingerprint so
    // the oracle replays it; payloads never ride the join's shuffle
    // (plan-pinned).
    "corpus_delta" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      graft.ops.CorpusDiff.snapshotDelta(
        docs.withColumn("fp", md5(col("text"))),
        derivedPreviousSnapshot(docs).withColumn("fp", md5(col("text"))),
        "doc_id", "fp")
    },

    // Diff/patch duality (ops/CorpusDiff): build the payload-carrying
    // patch against the derived previous snapshot, apply it back, and
    // the result must BE the current corpus — the driver's oracle is
    // literally `SELECT doc_id, text FROM documents`, so the round-trip
    // law is hash-checked end-to-end. applyDelta broadcasts the delta;
    // surviving snapshot payloads never shuffle.
    "corpus_patch" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val previous = derivedPreviousSnapshot(docs)
      val patch = graft.ops.CorpusDiff.snapshotDeltaWithPayload(
        docs.withColumn("fp", md5(col("text"))),
        previous.withColumn("fp", md5(col("text"))),
        "doc_id", "fp", Seq("text"))
      graft.ops.CorpusDiff.applyDelta(previous, patch, "doc_id", Seq("text"))
    },

    // Canonical normalization: NFC (native kernel) + lower + whitespace
    // collapse. Unicode is planted (the fixture corpus is ASCII) so the
    // NFC path demonstrably fires; DuckDB nfc_normalize is the twin.
    "text_normalize" -> { (s, d) =>
      import s.implicits._
      // the accents below are DECOMPOSED combining marks (base letter +
      // U+0301/U+0308), so NFC actually composes them — the oracle
      // builds the same byte sequences with chr()
      val plants = Seq(
        (900001L, "CAFÉ  du  Parc"),
        (900002L, " été\tÉTÉ "),
        (900003L, "Ängström   42")).toDF("doc_id", "text")
      Tables.documents(s, d).select(col("doc_id"), col("text")).union(plants)
        .select(col("doc_id"),
          TextFunctions.normalizeText(col("text")).as("norm"))
    },

    // C4/Gopher rule gates with planted violations (boilerplate, too
    // short, code braces, base64-ish long token, digit spam) — the
    // fixture corpus trips none of them, so each plant isolates one rule.
    "heuristic_filter" -> { (s, d) =>
      import s.implicits._
      val plants = Seq(
        (900001L, "lorem ipsum dolor sit amet consectetur adipiscing elit"),
        (900002L, "short doc"),
        (900003L, "function render(x) { return x.map(item => item.id); }"),
        (900004L, "the quick aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa brown fox jumps over"),
        (900005L, "codes 404 500 12345 67890 11111 22222 33333"))
        .toDF("doc_id", "text")
      val corpus = Tables.documents(s, d).select(col("doc_id"), col("text"))
        .union(plants)
      corpus.select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_words"),
        col("text").rlike("\\S{26,}").cast("int").as("has_long_word"),
        lower(col("text")).contains("lorem ipsum").cast("int")
          .as("has_lorem"),
        (col("text").contains("{") || col("text").contains("}")).cast("int")
          .as("has_brace"),
        round(TextFunctions.digitCount(col("text")).cast("double") /
          greatest(length(col("text")).cast("double"), lit(1.0)), 4)
          .as("digit_ratio"),
        TextFunctions.heuristicKeep(col("text")).cast("int").as("keep"))
    },

    // Paragraph-level (CCNet/MassiveText line) dedup: the corpus is
    // re-laid-out as 12-token paragraphs; the zzz plants then share
    // every paragraph but their first with their source doc, so the op
    // must strip plants down to one line while keeping originals whole.
    "dedup_paragraphs" -> { (s, d) =>
      val toks = TextFunctions.tokens(col("text"))
      val para = array_join(
        transform(
          sequence(lit(0), ceil(size(toks) / lit(12.0)).cast("int") - 1),
          i => array_join(slice(toks, i * 12 + 1, lit(12)), " ")), "\n")
      val corpus = corpusWithPlants(s, d)
        .select(col("doc_id"), para.as("text"))
      Dedup.dedupParagraphs(corpus, "doc_id", "text", "\n")
        .select(col("id").as("doc_id"), col("n_paras"), col("n_kept"),
          col("text_deduped"))
    },

    // ExactSubstr span dedup (Lee et al.): every ≥10-token span that
    // repeats anywhere in the corpus survives only at its first
    // occurrence. The zzz plants repeat their source doc from token 1
    // on, so the operator must cut that whole span out of the plant
    // while leaving the original untouched.
    "dedup_spans" -> { (s, d) =>
      Dedup.removeRepeatedSpans(corpusWithPlants(s, d), "doc_id", "text",
        k = 10)
        .select(col("id").as("doc_id"), col("n_tokens"), col("n_removed"),
          col("text_clean"))
    },

    // Graded contamination: fraction of each doc's distinct 3-grams
    // found in the benchmark set (docs with doc_id % 37 == 0) — the
    // thresholdable companion to the boolean decontaminate gate.
    "contamination_score" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val bench = docs.filter(col("doc_id") % 37 === 0).select(col("text"))
      Dedup.contaminationScore(docs, "doc_id", "text", bench, "text", n = 3)
        .select(col("id").as("doc_id"), col("n_shingles"),
          col("n_contaminated"), col("contamination"))
    },

    // Deterministic train/val/test assignment by hash-draw thresholds
    "split_assign" -> { (s, d) =>
      Sampling.assignSplit(Tables.documents(s, d).select(col("doc_id")),
        "doc_id", Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    },

    // Leakage-safe splits: assignment keyed on the near-dup CLUSTER
    // representative, so paraphrased copies never straddle train/test
    // (the planted near-dups land with their originals, provably —
    // the oracle closes the brute pair graph recursively)
    "split_leakage_safe" -> { (s, d) =>
      val corpus = corpusWithPlants(s, d)
      val pairs = Dedup.minhashNearDups(corpus, "doc_id", "text", k = 32,
        bands = 8, shingleSize = 3, minJaccard = 0.5)
      Sampling.leakageSafeSplit(corpus, pairs.select("id_a", "id_b"),
          "doc_id", Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
        .select(col("doc_id"), col("rep_id"), col("split"))
    },

    // Reproducible global permutation (epoch shuffle order): pos is the
    // rank in hash-draw order, built by the two-phase range scan — the
    // oracle's single-window row_number must agree exactly.
    "shuffle_global" -> { (s, d) =>
      Sampling.globalShuffle(
        Tables.documents(s, d).select(col("doc_id"), col("source")),
        "doc_id")
    },

    // ---- deterministic sampling (ops/Sampling) ----
    "sample_hash" -> { (s, d) =>
      Sampling.hashSample(Tables.orders(s, d), "o_orderkey", 0.1)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },

    "sample_stratified" -> { (s, d) =>
      Sampling.stratifiedSample(Tables.documents(s, d), "lang", "doc_id",
        Map("en" -> 0.5, "zh" -> 1.0), defaultFraction = 0.25)
        .select(col("doc_id"), col("lang"))
    },

    "sample_stratified_fixed" -> { (s, d) =>
      Sampling.stratifiedFixedSample(Tables.documents(s, d), "lang",
        "doc_id", n = 30)
        .select(col("doc_id"), col("lang"), col("sample_rank"))
    },

    // per-doc distinctive terms: tf * N / df (ratio idf — same ranking
    // as ln, exact IEEE replay), top-3 with term tiebreak
    "tfidf_top_terms" -> { (s, d) =>
      TermStats.tfidfTopTerms(Tables.documents(s, d), k = 3)
    },

    // source-pair redundancy matrix: Jaccard over distinct 3-gram sets
    "source_overlap" -> { (s, d) =>
      TermStats.sourceOverlap(Tables.documents(s, d), n = 3)
    },

    // CCNet-style LM quality: avg smoothed bigram transition
    // probability, TRAINED on the clean documents table and scored over
    // documents ∪ plants — the real train/score split (training on the
    // scored corpus itself would hand unique-token gibberish its own
    // self-counts). The gibberish plant's bigrams are all unseen, so its
    // score is exactly the smoothing mass 1/V via the left-join path;
    // the repetition plant exercises in-vocabulary repeated bigrams.
    "lm_quality" -> { (s, d) =>
      import s.implicits._
      val plants = Seq(
        (900001L, "zq1 xv9 qj3 wv7 nb2 mx8 kd4 pr9 tz5 lw6"),
        (900002L, "table hash table hash table hash table hash table hash"))
        .toDF("doc_id", "text")
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      TermStats.bigramLmScore(docs.union(plants), train = Some(docs))
    },

    // Stupid-Backoff trigram LM (ops/NgramLm): train count tables on
    // the clean documents, PERSIST them, score documents ∪ the same
    // two plants through the persisted model. The gibberish plant's
    // unigrams are all OOV — it walks the full 0.4·0.4·Laplace backoff
    // chain; the repetition plant saturates one trigram's conditional.
    "lm_backoff_score" -> { (s, d) =>
      import s.implicits._
      val plants = Seq(
        (900001L, "zq1 xv9 qj3 wv7 nb2 mx8 kd4 pr9 tz5 lw6"),
        (900002L, "table hash table hash table hash table hash table hash"))
        .toDF("doc_id", "text")
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      NgramLm.scoreWithModel(s, lmModelFor(s, d), docs.union(plants))
        .withColumn("lm_bo_score", round(col("lm_bo_score"), 6))
    },

    // Curriculum schedule (ops/Curriculum): LM-score the corpus, pack
    // it into 512-token bins, rank bins easy-to-hard by mean score —
    // the global positions come from the two-phase range-partition
    // rank (globalShuffle's discipline: no single-partition sort)
    "curriculum_order" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      graft.ops.Curriculum.lmOrderedBins(s, lmModelFor(s, d), docs,
          capacity = 512)
        .select(col("bin_id"), col("n_docs"),
          round(col("bin_score"), 6).as("bin_score"), col("curriculum_pos"))
    },

    // The schedule's last mile, end to end WITH the sink (the
    // pack_to_shards_e2e discipline for the CURRICULUM): rank bins
    // easy-to-hard, write shard-addressed TFRecords where shard n =
    // positions [n*8, (n+1)*8), decode. shard_id comes from the FILE
    // NAME and seq_in_shard from physical record order — the hash
    // match proves the on-disk layout IS the schedule.
    "curriculum_shards_e2e" -> { (s, d) =>
      val dir = curriculumShardCache.getOrElseUpdate(d, {
        val r = java.nio.file.Files
          .createTempDirectory("graft_curshard").toString
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val sched = graft.ops.Curriculum.lmOrderedBins(s, lmModelFor(s, d),
          docs, capacity = 512)
        graft.ops.Curriculum.writeCurriculumShards(sched, r,
          binsPerShard = 8,
          int64Cols = Seq("bin_id", "n_docs", "curriculum_pos"))
        r
      })
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard"))
        .orderBy(col("shard_part"), col("rec_seq"))
      graft.sources.TfRecord.readShardedExamples(s, dir,
          Seq("bin_id", "n_docs", "curriculum_pos"), Seq.empty)
        .select(col("shard").as("shard_id"),
          (row_number().over(w) - 1).cast("long").as("seq_in_shard"),
          element_at(col("bin_id"), 1).as("bin_id"),
          element_at(col("n_docs"), 1).as("n_docs"),
          element_at(col("curriculum_pos"), 1).as("curriculum_pos"))
    },

    // the LM gate itself: docs ∪ plants, keep score >= threshold —
    // the gibberish plant lands at the backoff floor and is dropped
    "lm_score_filter" -> { (s, d) =>
      import s.implicits._
      val plants = Seq(
        (900001L, "zq1 xv9 qj3 wv7 nb2 mx8 kd4 pr9 tz5 lw6"),
        (900002L, "table hash table hash table hash table hash table hash"))
        .toDF("doc_id", "text")
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      NgramLm.scoreFilter(s, lmModelFor(s, d), docs.union(plants),
          minScore = 0.05)
        .select(col("doc_id"), round(col("lm_bo_score"), 6).as("lm_bo_score"))
    },

    // CMS-gated heavy hitters. The fixture vocabulary is 31 tokens (all
    // heavy), so each doc plants two unique tokens — the long tail the
    // sketch gate must reject map-side; the result is exact either way.
    "heavy_hitters" -> { (s, d) =>
      val planted = Tables.documents(s, d).select(
        concat(col("text"), lit(" ux"), col("doc_id").cast("string"),
          lit("a ux"), col("doc_id").cast("string"), lit("b")).as("text"))
      TermStats.heavyHitters(planted, "text", minCount = 50)
    },

    // first-iteration BPE merge statistics: corpus-weighted adjacent
    // character-pair counts over the distinct-word vocabulary (the
    // quantity tokenizer training maximizes on merge 1)
    "bpe_pair_counts" -> { (s, d) =>
      TermStats.bpePairCounts(Tables.documents(s, d), k = 50)
    },

    // per-doc OOV rate against the corpus's top-500 token vocabulary
    // (tokenizer-coverage audit; the top-k vocab is bounded by
    // construction, so its join broadcasts)
    "vocab_oov_rate" -> { (s, d) =>
      TermStats.vocabCoverage(Tables.documents(s, d), vocabSize = 500)
    },

    // exact greedy BPE training on the corpus word counts. Hash-checked
    // since round 10: the known loop bound unrolls into one DuckDB CTE
    // chain per merge round (BpeOracle.trainSql), the same discipline as
    // the PageRank/BFS oracles; BpeSpec additionally pins the classic
    // worked example.
    "bpe_train_merges" -> { (s, d) =>
      Bpe.mergesDf(s, Bpe.trainMerges(Tables.documents(s, d), nMerges = 20))
    },

    // per-doc piece counts under the trained merges (hash-checked: the
    // oracle replays training, then priority-order encoding as a
    // recursive CTE — BpeOracle.pieceCountsSql)
    "bpe_piece_counts" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      Bpe.pieceCounts(docs, Bpe.trainMerges(docs, nMerges = 20, shareTokens = true))
    },

    // tokenizer-eval report: FERTILITY (pieces per word) and
    // COMPRESSION (normalized chars per piece) by source — the two
    // standard numbers a tokenizer is judged by before a training run
    // commits to it. One doc-keyed piece pricing + one source-keyed
    // partial agg on top.
    "tokenizer_fertility" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val pc = Bpe.pieceCounts(docs, Bpe.trainMerges(docs, nMerges = 20, shareTokens = true))
      pc.join(docs.select(col("doc_id"), col("source"),
          length(regexp_replace(lower(trim(col("text"))), "\\s+", ""))
            .cast("long").as("n_norm_chars")), "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("n_words"),
          sum(col("n_pieces")).as("n_pieces"),
          sum(col("n_norm_chars")).as("n_chars"))
        .select(col("source"), col("n_docs"), col("n_words"),
          col("n_pieces"), col("n_chars"),
          round(col("n_pieces") / col("n_words"), 6).as("fertility"),
          round(col("n_chars") / col("n_pieces"), 6).as("chars_per_piece"))
    },

    // the trained tokenizer's vocabulary: base chars in lexicographic
    // order, then merge symbols in rank order, first occurrence wins
    "bpe_vocab" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      Bpe.vocabDf(s, Bpe.vocab(docs, Bpe.trainMerges(docs, nMerges = 20, shareTokens = true)))
    },

    // documents as token-ID sequences under the trained tokenizer —
    // the training-tensor last mile (piece_counts PRICES documents;
    // this EMITS the ids a data loader feeds the model). Exploded to
    // (doc_id, piece_pos, token_id) so the full sequences are in the
    // hash.
    "bpe_encode_ids" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val merges = Bpe.trainMerges(docs, nMerges = 20, shareTokens = true)
      Bpe.encodeIds(docs, merges, Bpe.vocab(docs, merges))
    },

    // the FROZEN-tokenizer path: train once, persist the artifact
    // (merges + vocab parquet), reload in a "later job", encode under
    // the LOADED tables. The oracle is bpe_encode_ids' own replay —
    // the hash match proves save/load is bit-faithful (stable token
    // ids across jobs, the production freeze discipline).
    "bpe_encode_ids_frozen" -> { (s, d) =>
      val dir = tokenizerCache.getOrElseUpdate(d, {
        val r = java.nio.file.Files
          .createTempDirectory("graft_tokenizer").toString
        val docs = Tables.documents(s, d)
        val merges = Bpe.trainMerges(docs, nMerges = 20, shareTokens = true)
        Bpe.saveTokenizer(s, r, merges, Bpe.vocab(docs, merges))
        r
      })
      val (merges, syms) = Bpe.loadTokenizer(s, dir)
      Bpe.encodeIds(Tables.documents(s, d), merges, syms)
    },

    // prompt loss-mask spans (SFT prep): first sentence = prompt, in
    // word AND BPE-piece space — the offset a loader masks up to in
    // the bpe_encode_ids tensor
    "sft_mask_spans" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      Bpe.promptMaskSpans(docs, Bpe.trainMerges(docs, nMerges = 20, shareTokens = true))
    },

    // per-example PADDED SFT batches (the HF-collator shape, vs the
    // packed pretraining shape): token_ids truncated/right-padded to
    // 64 with pad id |vocab|, attention mask on real pieces, loss mask
    // on completion pieces only — exploded per (doc, pos) so all three
    // tensors are in the hash.
    "sft_padded_batches" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val merges = Bpe.trainMerges(docs, nMerges = 20, shareTokens = true)
      val syms = Bpe.vocab(docs, merges)
      val ids = Bpe.encodeIds(docs, merges, syms)
      val spans = Bpe.promptMaskSpans(docs, merges)
      graft.ops.TensorShards.paddedExamples(ids, spans, maxLen = 64,
          padId = syms.size.toLong)
        .select(col("doc_id"), posexplode(arrays_zip(col("token_ids"),
          col("attention_mask"), col("loss_mask"))))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("col.token_ids").as("token_id"),
          col("col.attention_mask").as("attn"),
          col("col.loss_mask").as("loss"))
    },

    // Multi-turn chat SFT collator (Bpe.turnMaskSpans +
    // TensorShards.paddedMultiturnExamples): each document becomes a
    // 4-turn conversation (user/assistant twice — the concat must stay
    // verbatim-identical to BpeOracle.multiturnSql's conv CTE); loss
    // bits land on assistant CONTENT pieces only, markers/user/padding
    // masked. Tokenizer trains on the conversation corpus, so the
    // oracle replays training + roles + collator in one chain.
    "sft_multiturn_batches" -> { (s, d) =>
      val convo = Tables.documents(s, d).select(col("doc_id"),
        concat(lit("<user> "), col("text"), lit(" <assistant> "),
          col("text"),
          lit(" <user> again please <assistant> sure thing done"))
          .as("text"))
      val merges = Bpe.trainMerges(convo, nMerges = 20, shareTokens = true)
      val syms = Bpe.vocab(convo, merges)
      val ids = Bpe.encodeIds(convo, merges, syms)
      val spans = Bpe.turnMaskSpans(convo, merges)
      graft.ops.TensorShards.paddedMultiturnExamples(ids, spans,
          maxLen = 96, padId = syms.size.toLong)
        .select(col("doc_id"), posexplode(arrays_zip(col("token_ids"),
          col("attention_mask"), col("loss_mask"))))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("col.token_ids").as("token_id"),
          col("col.attention_mask").as("attn"),
          col("col.loss_mask").as("loss"))
    },

    // the tokenizer round-trip: decode(encode(x)) == normalized(x).
    // The oracle never replays BPE at all — it IS the normalization
    // chain (lowercase, whitespace removed), which is exactly the
    // fidelity contract the Bpe Scaladoc pins.
    "bpe_decode_ids" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val merges = Bpe.trainMerges(docs, nMerges = 20, shareTokens = true)
      val syms = Bpe.vocab(docs, merges)
      Bpe.decodeIds(Bpe.encodeIds(docs, merges, syms), syms)
    },

    // Loader-ready token-tensor shards, end to end — the r11 pieces
    // COMPOSED (encode_ids + pack + segments + mask spans) into the
    // artifact a training loader mmaps: per bin, int64 token_ids +
    // loss_mask + seg_starts + seg_lens through CRC-framed TFRecords,
    // decoded back to one row per token with its segment facts (the
    // seg lookup IS the loader's block-diagonal mask arithmetic). The
    // hash match proves the stored tensors equal the composed chain.
    "train_shards_e2e" -> { (s, d) =>
      val dir = trainShardCache.getOrElseUpdate(d, {
        val r = java.nio.file.Files
          .createTempDirectory("graft_trainshard").toString
        val docs = Tables.documents(s, d)
        val merges = Bpe.trainMerges(docs, nMerges = 20, shareTokens = true)
        val ids = Bpe.encodeIds(docs, merges, Bpe.vocab(docs, merges))
        val spans = Bpe.promptMaskSpans(docs, merges)
        val bins = graft.ops.TensorShards.binTensors(ids, spans,
          capacity = 512)
        graft.sources.TfRecord.writeExamples(bins, r,
          Seq("bin_id", "token_ids", "loss_mask", "seg_starts",
            "seg_lens"), Seq.empty)
        r
      })
      graft.ops.TensorShards.decodeTokenRows(
        graft.sources.TfRecord.readExamples(s, dir,
          Seq("bin_id", "token_ids", "loss_mask", "seg_starts",
            "seg_lens"), Seq.empty))
    },

    // The manifested/versioned sink (TensorShards.writeManifestedShards
    // -> IndexVersions atomic publish): shard files + a parquet
    // manifest (records, tokens, xor fingerprint per shard) flip in as
    // one version. The entry re-derives the three numbers from the
    // PUBLISHED bytes, full-outer-joins the manifest, and emits the
    // manifest rows with an agreement flag — hash-green means
    // write -> manifest -> read-back -> verify agree with the oracle's
    // independent pack replay.
    "train_shards_manifest" -> { (s, d) =>
      val dir = manifestShardCache.getOrElseUpdate(d, {
        val r = java.nio.file.Files
          .createTempDirectory("graft_manishard").toString
        val docs = Tables.documents(s, d)
        val merges = Bpe.trainMerges(docs, nMerges = 20, shareTokens = true)
        val ids = Bpe.encodeIds(docs, merges, Bpe.vocab(docs, merges))
        val spans = Bpe.promptMaskSpans(docs, merges)
        val bins = graft.ops.TensorShards.binTensors(ids, spans,
          capacity = 512)
        graft.ops.TensorShards.writeManifestedShards(bins, r,
          binsPerShard = 8)
        r
      })
      val root = graft.ops.IndexVersions.resolve(dir)
      val manifest = s.read.parquet(s"$root/manifest")
      val recount = graft.ops.TensorShards
        .readManifestedShards(s, dir, verify = false)
        .withColumn("rx", expr("aggregate(transform(token_ids, " +
          "(t, p) -> shiftleft(cast(p as bigint), 20) + t), 0L, " +
          "(a, x) -> a ^ x)"))
        .groupBy(col("shard").as("shard_id"))
        .agg(count(lit(1)).as("r_records"),
          sum(size(col("token_ids"))).cast("long").as("r_tokens"),
          expr("bit_xor(rx)").as("r_xor"))
      manifest.join(recount, Seq("shard_id"), "full_outer")
        .select(col("shard_id"), col("n_records"), col("n_tokens"),
          col("tok_xor"),
          (col("n_records") === col("r_records") &&
            col("n_tokens") === col("r_tokens") &&
            col("tok_xor") === col("r_xor")).as("manifest_ok"))
    },

    // The PACKED multi-turn shape (TensorShards.binTensorsMultiturn):
    // same bins/segments/capacity arithmetic as train_shards_e2e, loss
    // bits from the chat-template turn spans instead of the prompt
    // prefix — the tensor layout a packed SFT run consumes. Decoded
    // per token through the same seg prefix-sum lookup, hash-checked
    // against the pack replay threaded with the per-piece role bit.
    "sft_multiturn_packed" -> { (s, d) =>
      val convo = Tables.documents(s, d).select(col("doc_id"),
        concat(lit("<user> "), col("text"), lit(" <assistant> "),
          col("text"),
          lit(" <user> again please <assistant> sure thing done"))
          .as("text"))
      val merges = Bpe.trainMerges(convo, nMerges = 20, shareTokens = true)
      val syms = Bpe.vocab(convo, merges)
      val ids = Bpe.encodeIds(convo, merges, syms)
      val spans = Bpe.turnMaskSpans(convo, merges)
      graft.ops.TensorShards.decodeTokenRows(
        graft.ops.TensorShards.binTensorsMultiturn(ids, spans,
            capacity = 512)
          .select(array(col("bin_id")).as("bin_id"), col("token_ids"),
            col("loss_mask"), col("seg_starts"), col("seg_lens")))
    },

    // The EOS variant: a document-separator token (id = |vocab|, the
    // first free id) after each document's pieces — counted in the
    // pack weights and seg lengths, loss bit 1 (always at/past the
    // prompt boundary). The decoded tensors must replay the separator
    // exactly: position, id, loss, and the grown seg_lens all in the
    // hash.
    "train_shards_eos_e2e" -> { (s, d) =>
      val dir = trainShardEosCache.getOrElseUpdate(d, {
        val r = java.nio.file.Files
          .createTempDirectory("graft_trainshard_eos").toString
        val docs = Tables.documents(s, d)
        val merges = Bpe.trainMerges(docs, nMerges = 20, shareTokens = true)
        val syms = Bpe.vocab(docs, merges)
        val ids = Bpe.encodeIds(docs, merges, syms)
        val spans = Bpe.promptMaskSpans(docs, merges)
        val bins = graft.ops.TensorShards.binTensors(ids, spans,
          capacity = 512, eosId = Some(syms.size.toLong))
        graft.sources.TfRecord.writeExamples(bins, r,
          Seq("bin_id", "token_ids", "loss_mask", "seg_starts",
            "seg_lens"), Seq.empty)
        r
      })
      graft.ops.TensorShards.decodeTokenRows(
        graft.sources.TfRecord.readExamples(s, dir,
          Seq("bin_id", "token_ids", "loss_mask", "seg_starts",
            "seg_lens"), Seq.empty))
    },

    // The capstone composition — the on-disk shard layout IS the
    // schedule AND the payload IS the loader tensor: bin tensors
    // ranked by the LENGTH curriculum (many-short-docs bins first —
    // n_segs desc; assignPositions' two-phase rank over a bin_id/
    // n_segs PROJECTION, so the tensors never ride the rank exchange),
    // then shard-addressed TFRecords (shard n = positions [n*8,
    // (n+1)*8)). Checked output decodes shard_id from the FILE NAME,
    // seq from physical record order, and folds the whole id tensor
    // into a position-salted xor — layout and payload both in the hash.
    "curriculum_tensor_shards_e2e" -> { (s, d) =>
      val dir = curTensorCache.getOrElseUpdate(d, {
        val r = java.nio.file.Files
          .createTempDirectory("graft_curtensor").toString
        val docs = Tables.documents(s, d)
        val merges = Bpe.trainMerges(docs, nMerges = 20, shareTokens = true)
        val ids = Bpe.encodeIds(docs, merges, Bpe.vocab(docs, merges))
        val spans = Bpe.promptMaskSpans(docs, merges)
        val bins = graft.ops.CacheRegistry.persist(
          graft.ops.TensorShards.binTensors(ids, spans, capacity = 512))
        val ranked = graft.ops.Curriculum.assignPositions(
          bins.select(col("bin_id"),
            size(col("seg_lens")).cast("long").as("n_segs")),
          Seq(col("n_segs").desc, col("bin_id")))
        graft.ops.Curriculum.writeCurriculumShards(
          bins.join(ranked.select(col("bin_id"), col("curriculum_pos")),
            "bin_id"),
          r, binsPerShard = 8,
          int64Cols = Seq("bin_id", "token_ids", "loss_mask",
            "seg_starts", "seg_lens"))
        r
      })
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard"))
        .orderBy(col("shard_part"), col("rec_seq"))
      graft.sources.TfRecord.readShardedExamples(s, dir,
          Seq("bin_id", "token_ids", "loss_mask", "seg_starts",
            "seg_lens"), Seq.empty)
        .select(col("shard").as("shard_id"),
          (row_number().over(w) - 1).cast("long").as("seq_in_shard"),
          element_at(col("bin_id"), 1).as("bin_id"),
          size(col("seg_lens")).cast("long").as("n_segs"),
          size(col("token_ids")).cast("long").as("n_tokens"),
          expr("aggregate(transform(token_ids, (t, p) -> " +
            "shiftleft(cast(p as bigint), 20) + t), 0L, " +
            "(a, x) -> a ^ x)").as("tok_xor"))
    },

    // Multimodal training shards: (image bytes, caption token ids)
    // pairs through TFRecord — the bytes feature decodes BYTE-IDENTICAL
    // to the source (proven by the utf8 round-trip against the source
    // text), caption ids under the corpus top-500 vocabulary
    // (vocab_oov_rate's convention), OOV -> -1.
    "multimodal_shards_e2e" -> { (s, d) =>
      val dir = mmShardCache.getOrElseUpdate(d, {
        val r = java.nio.file.Files
          .createTempDirectory("graft_mmshard").toString
        val docs = Tables.documents(s, d)
        val media = graft.ops.Multimodal.syntheticMedia(docs)
          .select(col("media_id"), col("media"))
        val toks = docs.select(col("doc_id").as("media_id"),
            posexplode(TextFunctions.tokens(lower(col("text")))))
          .toDF("media_id", "pos", "w")
        val win = org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("w"))
        val vocab = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("w")).limit(500)
          .select(col("w"),
            (row_number().over(win) - 1).cast("long").as("vid"))
        val caps = toks.join(broadcast(vocab), Seq("w"), "left")
          .groupBy("media_id")
          .agg(transform(array_sort(collect_list(struct(col("pos"),
            coalesce(col("vid"), lit(-1L)).as("vid")))),
            x => x.getField("vid")).as("caption_ids"))
        graft.sources.TfRecord.writeExamples(
          media.join(caps, Seq("media_id"))
            .select(col("media_id"), col("caption_ids"), col("media")),
          r, Seq("media_id", "caption_ids"), Seq("media"))
        r
      })
      graft.sources.TfRecord.readExamples(s, dir,
          Seq("media_id", "caption_ids"), Seq("media"))
        .select(element_at(col("media_id"), 1).as("media_id"),
          col("media").cast("string").as("media_utf8"),
          posexplode(col("caption_ids")))
        .toDF("media_id", "media_utf8", "caption_pos", "caption_tid")
        .select(col("media_id"), col("caption_pos").cast("long"),
          col("caption_tid"), col("media_utf8"))
    },

    // packed-batch attention segments: per (bin, doc) the in-bin token
    // offset range — position_ids / block-diagonal-mask inputs as a
    // pure projection over the pack assignment (cum_before % capacity)
    "pack_segments" -> { (s, d) =>
      val toks = Tables.documents(s, d).select(col("doc_id"),
        TextFunctions.approxBpeTokenCount(col("text")).as("n_tokens"))
      Packing.packedSegments(toks, "doc_id", "n_tokens", capacity = 512)
    },

    // fill-in-the-middle rotation (PSM order, deterministic md5-draw
    // cuts) — ~half the docs split into <PRE>p<SUF>s<MID>m, others
    // pass through
    "fim_transform" -> { (s, d) =>
      Packing.fimTransform(
        Tables.documents(s, d).select(col("doc_id"), col("text")))
    },

    // the same transform with STRING doc ids — the cut draws are
    // md5-based (Sampling.hashDraw convention), so non-numeric ids
    // work identically (the old id % k arithmetic failed analysis)
    "fim_transform_strid" -> { (s, d) =>
      Packing.fimTransform(
        Tables.documents(s, d).select(
          concat(lit("doc-"), col("doc_id").cast("string")).as("doc_id"),
          col("text")))
    },

    // batch cross-corpus near-dedup ("what does crawl N add"): history
    // is the documents table; incoming plants near-copies of docs
    // %10 == 0 (must be dropped: shingle Jaccard ~0.93) and token-
    // REVERSED docs %7 == 3 (share every word but almost no 3-shingle
    // -> must survive). The oracle states the planted ground truth —
    // the reversed docs, replayed exactly.
    "dedup_near_novel" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val copies = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(lit("zzz "), expr("substring(text, instr(text, ' ') + 1)"))
            .as("text"))
      val reversed = docs.filter(col("doc_id") % 7 === 3)
        .select((col("doc_id") + 200000).as("doc_id"),
          array_join(reverse(TextFunctions.tokens(col("text"))), " ")
            .as("text"))
      Dedup.nearNovelAgainstHistory(copies.union(reversed),
          "doc_id", "text", docs)
        .select(col("doc_id"), md5(col("text")).as("content_hash"))
    },

    // perceptual-hash media near-dedup over the synthetic media table.
    // Plants swap the first and last characters: the byte MULTISET is
    // preserved, so the aHash global threshold is identical and at most
    // the two edge cells change -> Hamming <= 2, guaranteed within the
    // 4-block pigeonhole. The oracle states the planted ground truth.
    // Real image blobs take the 8x8 luminance aHash path
    // (MultimodalSpec pins edit-tolerance/scale-invariance there).
    "multimodal_near_dups" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val media = graft.ops.Multimodal.syntheticMedia(docs)
      val plants = graft.ops.Multimodal.syntheticMedia(
          docs.filter(col("doc_id") % 10 === 0)
            .withColumn("text", expr(
              "concat(substr(text, -1, 1), substring(text, 2, length(text) - 2), substr(text, 1, 1))")))
        .withColumn("media_id", col("media_id") + 100000)
      graft.ops.Multimodal.nearDupMedia(s, media.union(plants))
        .select(col("id_a"), col("id_b"))
    },

    // T5-style span corruption: deterministic per-(doc, span) mask
    // draw at 20% (threshold 0x33333333), spans collapse to <mask>
    "mask_spans" -> { (s, d) =>
      Denoise.maskSpans(Tables.documents(s, d),
        maskFraction = 0.2, spanLen = 3)
    },

    // training-mix resample: kept counts proportional to 5:3:2 across
    // three sources, scaled to the largest mix needing no upsampling
    "sample_mixture" -> { (s, d) =>
      Sampling.mixtureSample(Tables.documents(s, d), "source", "doc_id",
        Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2))
        .select(col("doc_id"), col("source"))
    },

    // token-budget subset: ~2000 BPE-ish tokens per source, the maximal
    // hash-ordered prefix within budget
    "sample_token_budget" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
        TextFunctions.approxBpeTokenCount(col("text")).as("n_tokens"))
      Sampling.tokenBudgetSample(docs, "source", "doc_id", "n_tokens",
        budget = 2000L)
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("cum_tokens"))
    },

    // ---- sequence packing (ops/Packing) ----
    // long docs cut into 64-token windows overlapping by 16 — the
    // context-window sibling of pack_sequences (short docs pack, long
    // docs chunk); pure projection + generator, no shuffle (plan-pinned)
    "chunk_documents" -> { (s, d) =>
      Packing.chunkByTokens(Tables.documents(s, d), "doc_id", "text",
        chunkTokens = 64, overlap = 16)
    },

    // capacity 512 is a power of two so the bin-boundary division is
    // FP-exact in both engines (cum_before < 2^53).
    "pack_sequences" -> { (s, d) =>
      val toks = Tables.documents(s, d).select(col("doc_id"),
        TextFunctions.approxBpeTokenCount(col("text")).as("n_tokens"))
      Packing.packChunked(toks, "doc_id", "n_tokens", capacity = 512)
        .groupBy(col("bin_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("bin_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
    },

    // The pipeline's last mile, end to end WITH the sink: token counts
    // → chunked packing → one tf.Example per bin → CRC-framed TFRecord
    // shards → decode. The output must match the SAME oracle as
    // pack_sequences — the shards carry exactly the packed bins, or
    // the hash breaks.
    "pack_to_shards_e2e" -> { (s, d) =>
      val dir = packShardCache.getOrElseUpdate(d, {
        val r = java.nio.file.Files.createTempDirectory("graft_packshard")
          .toString
        val toks = Tables.documents(s, d).select(col("doc_id"),
          TextFunctions.approxBpeTokenCount(col("text")).as("n_tokens"))
        val bins = Packing.packChunked(toks, "doc_id", "n_tokens",
            capacity = 512)
          .groupBy(col("bin_id"))
          .agg(sort_array(collect_list(col("doc_id"))).as("doc_ids"),
            sum(col("n_tokens")).as("bin_tokens"))
        graft.sources.TfRecord.writeExamples(bins, r,
          Seq("bin_id", "doc_ids", "bin_tokens"), Seq.empty)
        r
      })
      graft.sources.TfRecord.readExamples(s, dir,
          Seq("bin_id", "doc_ids", "bin_tokens"), Seq.empty)
        .select(element_at(col("bin_id"), 1).as("bin_id"),
          size(col("doc_ids")).cast("long").as("n_docs"),
          element_at(col("bin_tokens"), 1).as("bin_tokens"),
          element_at(col("doc_ids"), 1).as("first_doc"),
          element_at(col("doc_ids"), size(col("doc_ids"))).as("last_doc"))
    },

    // the same last mile with the TOKENIZER in the loop: train BPE on
    // the corpus, pack bins by true per-doc PIECE counts (not the
    // whitespace heuristic), ship through TFRecord shards, decode.
    // The oracle replays training + priority encoding + the bin chain.
    "bpe_pack_shards_e2e" -> { (s, d) =>
      val dir = bpePackCache.getOrElseUpdate(d, {
        val r = java.nio.file.Files.createTempDirectory("graft_bpepack")
          .toString
        val docs = Tables.documents(s, d)
        val pieces = Bpe.pieceCounts(docs, Bpe.trainMerges(docs, nMerges = 20, shareTokens = true))
          .select(col("doc_id"), col("n_pieces"))
        val bins = Packing.packChunked(pieces, "doc_id", "n_pieces",
            capacity = 512)
          .groupBy(col("bin_id"))
          .agg(sort_array(collect_list(col("doc_id"))).as("doc_ids"),
            sum(col("n_pieces")).as("bin_pieces"))
        graft.sources.TfRecord.writeExamples(bins, r,
          Seq("bin_id", "doc_ids", "bin_pieces"), Seq.empty)
        r
      })
      graft.sources.TfRecord.readExamples(s, dir,
          Seq("bin_id", "doc_ids", "bin_pieces"), Seq.empty)
        .select(element_at(col("bin_id"), 1).as("bin_id"),
          size(col("doc_ids")).cast("long").as("n_docs"),
          element_at(col("bin_pieces"), 1).as("bin_pieces"),
          element_at(col("doc_ids"), 1).as("first_doc"),
          element_at(col("doc_ids"), size(col("doc_ids"))).as("last_doc"))
    },

    // ---- dedup ----
    "dedup_exact" -> { (s, d) =>
      Dedup.exact(Tables.documents(s, d), "doc_id", "text")
    },

    // the keep-rows API: corpus rows with exact duplicates dropped
    "dedup_drop_exact" -> { (s, d) =>
      Dedup.dropExactDuplicates(Tables.documents(s, d), "doc_id", "text")
    },

    // Incremental ingest: a bloom filter over the history corpus gates
    // the exact novelty check. Incoming plants exact copies of history
    // docs (doc_id % 8 == 1, re-idd +200000) so the duplicate path is
    // exercised deterministically; the fixture corpus itself is
    // all-distinct, so the %4==0 slice is wholly novel.
    "dedup_bloom_novel" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val history = docs.filter(col("doc_id") % 4 =!= 0)
      val incoming = docs.filter(col("doc_id") % 4 === 0)
        .union(docs.filter(col("doc_id") % 8 === 1)
          .select((col("doc_id") + 200000).as("doc_id"), col("text")))
      Dedup.novelAgainstHistory(incoming, "doc_id", "text",
          history, "text", expectedItems = 4096)
        .select(col("doc_id"), col("content_hash"))
    },

    // The LSH candidate generation is xxhash64-based (no DuckDB twin),
    // but the emitted pairs are verified with EXACT shingle Jaccard, and
    // on the fixture corpus LSH recall at j >= 0.5 is total (k=32,
    // bands=8: planted near-dups sit at j ~ 0.9 where band-collision
    // probability is ~1) — so the output equals the brute-force
    // all-pairs Jaccard >= 0.5 set and is oracle-checked against it.
    // est_jaccard (hash-dependent) is asserted in DedupSpec instead.
    "dedup_minhash_lsh" -> { (s, d) =>
      Dedup.minhashNearDups(corpusWithPlants(s, d), "doc_id", "text",
        k = 32, bands = 8, shingleSize = 3, minJaccard = 0.5)
        .select(col("id_a"), col("id_b"), col("jaccard"))
    },

    // The CAPPED twin runs the signature-collapse plan (maxBucket > 0
    // forces it; 1000 is far above any fixture bucket, so nothing
    // drops) against the SAME oracle as dedup_minhash_lsh — the driver
    // gate continuously pins that the adaptive planner's two candidate
    // plans produce identical pairs, not just the one the statistic
    // happens to pick.
    "dedup_minhash_capped" -> { (s, d) =>
      Dedup.minhashNearDups(corpusWithPlants(s, d), "doc_id", "text",
        k = 32, bands = 8, shingleSize = 3, minJaccard = 0.5,
        maxBucket = 1000)
        .select(col("id_a"), col("id_b"), col("jaccard"))
    },

    "dedup_simhash" -> { (s, d) =>
      // one-word perturbations on ~40-token docs can flip several bits;
      // 8 of 64 keeps planted pairs while random pairs stay ~32 apart
      Dedup.simhashNearDups(corpusWithPlants(s, d), "doc_id", "text",
        maxDist = 8)
    },

    "dedup_ngram_jaccard" -> { (s, d) =>
      Dedup.ngramJaccardPairs(corpusWithPlants(s, d), "doc_id", "text",
        n = 3, minJaccard = 0.5)
    },

    // Benchmark decontamination: every 37th document stands in for a
    // leaked eval item; flagged docs share >= 2 distinct 3-grams with it.
    "decontaminate" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val bench = docs.filter(col("doc_id") % 37 === 0).select(col("text"))
      Dedup.decontaminate(docs, "doc_id", "text", bench, "text",
        n = 3, minShared = 2)
        .select(col("id").as("doc_id"), col("n_shared"))
    },

    // Pairs -> clusters: connected components of the near-dup graph
    // (min-label propagation + pointer jumping); oracle is a DuckDB
    // recursive-CTE transitive closure over the brute-force pair set.
    "dedup_clusters" -> { (s, d) =>
      val pairs = Dedup.minhashNearDups(corpusWithPlants(s, d),
        "doc_id", "text", k = 32, bands = 8, shingleSize = 3,
        minJaccard = 0.5)
      Dedup.clusterDuplicates(pairs.select(col("id_a"), col("id_b")))
    },

    // the end-to-end near-dup drop: corpus rows surviving cluster dedup
    "dedup_drop_near" -> { (s, d) =>
      val corpus = corpusWithPlants(s, d)
      val pairs = Dedup.minhashNearDups(corpus, "doc_id", "text",
        k = 32, bands = 8, shingleSize = 3, minJaccard = 0.5)
        .select(col("id_a"), col("id_b"))
      Dedup.dropNearDuplicates(corpus, "doc_id", pairs)
        .select(col("doc_id"))
    },

    // quality-aware keep: the cluster member with the LONGEST text
    // survives (ties to the lowest id) — the production alternative to
    // drop_near's keep-min-id (plants prepend "zzz " to a dropped first
    // word, so some clusters keep the plant, distinguishing the two ops)
    "dedup_keep_best" -> { (s, d) =>
      val corpus = corpusWithPlants(s, d)
      val pairs = Dedup.minhashNearDups(corpus, "doc_id", "text",
        k = 32, bands = 8, shingleSize = 3, minJaccard = 0.5)
        .select(col("id_a"), col("id_b"))
      Dedup.keepBestPerCluster(corpus, "doc_id", pairs, length(col("text")))
        .select(col("doc_id"))
    },

    "dedup_embedding_cosine" -> { (s, d) =>
      Similarity.cosineNearDups(vectorsWithPlants(s, d), dim = 64,
        minCos = 0.999)
    },

    // SemDeDup: cell-scoped semantic near-dup pairs under a
    // deterministic coarse quantizer (exactly DuckDB-replayable,
    // unlike a fitted KMeans) — the looser-threshold complement of
    // the LSH near-identical path above
    "dedup_semantic" -> { (s, d) =>
      Similarity.semanticDedupPairs(vectorsWithPlants(s, d),
        nCells = 16, minCos = 0.9)
    },

    // Semantic decontamination: every 37th embedding, scaled, stands in
    // for a paraphrased benchmark leak; flagged = cosine >= 0.95 to any
    // bench vector within the deterministic quantizer's cell
    "decontaminate_semantic" -> { (s, d) =>
      val vecs = Tables.embeddings(s, d)
      val bench = vecs.filter(col("vec_id") % 37 === 0)
        .select(transform(col("embedding"), x => x * lit(1.01f))
          .as("embedding"))
      Similarity.semanticDecontaminate(vecs, bench,
        nCells = 16, minCos = 0.95)
        .select(col("id").as("vec_id"), col("n_hits"), col("max_cos"))
    },

    // ---- similarity search ----
    "ann_brute_topk" -> { (s, d) =>
      val vecs = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") < 8), k = 5)
    },

    // Collocation discovery (ops/TermStats.pmiCollocations): top-30
    // adjacent pairs by PMI lift c_ab·N/(c_a·c_b) — exact long counts,
    // fixed-order double arithmetic, no logarithm (monotone), the
    // bigramLmScore portability convention.
    "pmi_collocations" -> { (s, d) =>
      graft.ops.TermStats.pmiCollocations(Tables.documents(s, d),
        k = 30, minCount = 5)
        .withColumn("lift", round(col("lift"), 6))
    },

    // Hard-negative mining (Similarity.hardNegatives): per anchor, the
    // top-5 most-similar DIFFERENT-label vectors — the contrastive-
    // training pair generator, exact-ranking baseline for the ANN
    // mining paths. Label filter below the rank window.
    "hard_negatives" -> { (s, d) =>
      val vecs = Tables.embeddings(s, d)
      Similarity.hardNegatives(vecs, vecs.filter(col("vec_id") < 8), k = 5)
    },

    // The positives side of the contrastive batch: top-5 most-similar
    // SAME-label vectors per anchor (Similarity.positivePairs).
    "positive_pairs" -> { (s, d) =>
      val vecs = Tables.embeddings(s, d)
      Similarity.positivePairs(vecs, vecs.filter(col("vec_id") < 8), k = 5)
    },

    // The ANN-routed miner at the REAL mining scale: every corpus
    // vector is an anchor (the brute baseline above would be all-pairs
    // here), each probing 4 of 16 deterministic IVF cells, label filter
    // in-cell below the rank window. Deterministic quantizer -> the
    // whole route (assignment, probing, in-cell ranking) replays in
    // DuckDB: hash-checked, not rows-only.
    "hard_negatives_ann" -> { (s, d) =>
      Similarity.hardNegativesAnn(s, minerIvfDir(s, d),
        Tables.embeddings(s, d), k = 5, nProbe = 4)
    },

    // Positives through the same IVF route, corpus-sized anchors.
    "positive_pairs_ann" -> { (s, d) =>
      Similarity.positivePairsAnn(s, minerIvfDir(s, d),
        Tables.embeddings(s, d), k = 5, nProbe = 4)
    },

    // Incremental vector-index maintenance (Similarity
    // .appendToIvfIndex): index built over the %5!=0 corpus slice,
    // the %5==0 remainder APPENDED as new cell-partition files against
    // the standing quantizer, then probed. The deterministic quantizer
    // makes the whole build+append+query chain hash-replayable — and
    // because append assigns against the SAME centers, the oracle is
    // literally the full-corpus index query: append must be
    // indistinguishable from having built over everything (the
    // bm25_index_upsert contract, one surface over).
    "ann_ivf_index_upsert" -> { (s, d) =>
      val dir = ivfUpsertCache.getOrElseUpdate(d, {
        val r = java.nio.file.Files.createTempDirectory("graft_ivf_ups")
          .toString
        val vecs = Tables.embeddings(s, d)
        val build = vecs.filter(col("vec_id") % 5 =!= 0)
        Similarity.buildIvfIndex(build, r, nCentroids = 16,
          centers = Some(Similarity.lowestIdCenters(build, 16)))
        Similarity.appendToIvfIndex(vecs.filter(col("vec_id") % 5 === 0), r)
        r
      })
      Similarity.queryIvfIndex(s, dir,
        Tables.embeddings(s, d).filter(col("vec_id") < 8), k = 5, nProbe = 4)
    },

    // Retrieval evaluation (ops/RankingMetrics): precision/recall/MRR/
    // nDCG@10 of the exact-cosine ranking against label-derived qrels
    // (relevant = same label, the fixture's judgment set). DCG gains
    // and reciprocal ranks are k precomputed micro-unit literals, so
    // every aggregate is an exact LONG sum both engines replay.
    "ir_metrics" -> { (s, d) =>
      val vecs = Tables.embeddings(s, d)
      val ranking = Similarity.bruteForceTopK(vecs,
          vecs.filter(col("vec_id") < 8), k = 10)
        .select(col("query_id"), col("corpus_id").as("doc_id"), col("rank"))
      val qv = vecs.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("label").as("qlabel"))
      val qrels = vecs.select(col("vec_id").as("doc_id"), col("label"))
        .join(broadcast(qv),
          col("label") === col("qlabel") && col("doc_id") =!= col("query_id"))
        .select(col("query_id"), col("doc_id"))
      graft.ops.RankingMetrics.evaluate(ranking, qrels, k = 10)
        .withColumn("p_at_k", round(col("p_at_k"), 6))
        .withColumn("recall_at_k", round(col("recall_at_k"), 6))
        .withColumn("ndcg", round(col("ndcg"), 6))
    },

    // Cosine LSH at its real operating point (8 bits x 4 tables): the
    // md5-addressable ±1 planes make the BUCKETING itself replayable,
    // so the oracle rebuilds the same 32 planes, the same per-table
    // signatures, the same candidate set, and the same exact-cosine
    // rank — full hash check, no rows-only concession.
    "ann_lsh_topk" -> { (s, d) =>
      val vecs = Tables.embeddings(s, d)
      Similarity.lshTopK(vecs, vecs.filter(col("vec_id") < 8), k = 5,
        dim = 64, bitsPerTable = 8, nTables = 4)
    },

    // IVF with EVERY cell probed is exhaustive — identical to the
    // brute scan by construction (the SimilaritySpec full-probe pin,
    // registered as a driver entry: the fitted k-means quantizer
    // cancels out of the output, so the oracle is literally the
    // brute-force SQL). The approximate operating point (nProbe=4)
    // stays covered by planted-recall specs, tools/AnnRecall, and the
    // bench's ann_ivf_oneshot arm.
    "ann_ivf_fullprobe_topk" -> { (s, d) =>
      val vecs = Tables.embeddings(s, d)
      Similarity.ivfTopK(vecs, vecs.filter(col("vec_id") < 8), k = 5,
        nCentroids = 16, nProbe = 16)
    },

    // exact top-k over the QUANTIZED corpus — the compact-storage ANN
    // path: int8 vectors dequantize on the fly, ranking stays exact
    "ann_int8_topk" -> { (s, d) =>
      val deq = Tables.embeddings(s, d).select(col("vec_id"),
        Similarity.dequantizeInt8(
          Similarity.quantizeInt8(col("embedding")),
          Similarity.int8Scale(col("embedding"))).as("embedding"))
      Similarity.bruteForceTopK(deq, deq.filter(col("vec_id") < 8), k = 5)
    },

    // Johnson–Lindenstrauss random projection (ops/RandomProjection):
    // 64 -> 16 dims under the md5-derived Achlioptas matrix, exploded
    // to scalar rows so the oracle hashes component-exact values
    "embed_random_projection" -> { (s, d) =>
      RandomProjection.project(Tables.embeddings(s, d),
          dimIn = 64, dimOut = 16)
        .select(col("vec_id"), posexplode(col("rp")).as(Seq("j", "val")))
        .select(col("vec_id"), col("j"), round(col("val"), 6).as("val"))
    },

    // shortlist in projected space (top-32 by 16-dim cosine), exact
    // re-rank on the original vectors — deterministic end to end, so
    // the oracle replays BOTH stages (projection included)
    "ann_rp_topk" -> { (s, d) =>
      val vecs = Tables.embeddings(s, d)
      RandomProjection.projectedTopK(vecs, vecs.filter(col("vec_id") < 8),
        k = 5, shortlist = 32, dimIn = 64, dimOut = 16)
    },

    // int8 embedding quantization (exploded to scalar rows so the
    // oracle hashes component-exact values)
    "embed_quantize_int8" -> { (s, d) =>
      Tables.embeddings(s, d).filter(col("vec_id") < 200)
        .select(col("vec_id"),
          round(Similarity.int8Scale(col("embedding")), 6).as("scale"),
          posexplode(Similarity.quantizeInt8(col("embedding")))
            .as(Seq("i", "q")))
    },

    // PQ codes (exploded to scalar rows): deterministic codebooks →
    // the encode step itself is hash-checked against the DuckDB replay
    "embed_pq_codes" -> { (s, d) =>
      val vecs = Tables.embeddings(s, d).filter(col("vec_id") < 200)
      val cbs = Similarity.pqCodebooks(Tables.embeddings(s, d),
        dim = 64, nSub = 8, ksub = 16)
      vecs.select(col("vec_id"),
        posexplode(Similarity.pqEncode(col("embedding"), cbs))
          .as(Seq("m", "code")))
    },

    // PQ-ADC approximate top-k (Jégou et al. 2011): corpus as 8 codes
    // per vector, per-query LUT, distance = 8 lookups. Deterministic
    // codebooks make this the one ANN entry with a full hash oracle.
    "ann_pq_topk" -> { (s, d) =>
      val vecs = Tables.embeddings(s, d)
      Similarity.pqTopK(vecs, vecs.filter(col("vec_id") < 8), k = 5,
        dim = 64, nSub = 8, ksub = 16)
    },

    // IVFADC with every cell probed: the coarse quantizer cancels and
    // the output equals plain PQ-ADC over the whole corpus — so the
    // oracle is the full PQ replay (ann_pq_topk's SQL verbatim). The
    // nProbe=4 operating point keeps its planted-recall spec and the
    // bench's ann_ivfpq_oneshot arm.
    "ann_ivfpq_fullprobe_topk" -> { (s, d) =>
      val vecs = Tables.embeddings(s, d)
      Similarity.ivfPqTopK(vecs, vecs.filter(col("vec_id") < 8), k = 5,
        dim = 64, nSub = 8, ksub = 16, nCentroids = 16, nProbe = 16)
    },

    // the persisted IVFADC layout: cell-partitioned CODES (no raw
    // vectors stored), codebooks + coarse centroids as tiny tables —
    // probed exhaustively, so the SAVED layout (build + persist +
    // reload + query) is what the hash check pins (== one-shot PQ)
    "ann_ivfpq_index_fullprobe_topk" -> { (s, d) =>
      val vecs = Tables.embeddings(s, d)
      val dir = java.nio.file.Files
        .createTempDirectory("graft_ivfpq_index").toString
      Similarity.buildIvfPqIndex(vecs, dir, dim = 64,
        nCentroids = 16, nSub = 8, ksub = 16)
      Similarity.queryIvfPqIndex(s, dir, vecs.filter(col("vec_id") < 8),
        k = 5, nProbe = 16)
    },

    // the FAISS-style build/query split: index persisted as parquet
    // (centroids + cell-partitioned assignments), probed over all 16
    // cells — build+persist+reload+query must reproduce the brute scan
    "ann_ivf_index_fullprobe_topk" -> { (s, d) =>
      val vecs = Tables.embeddings(s, d)
      val dir = java.nio.file.Files
        .createTempDirectory("graft_ivf_index").toString
      Similarity.buildIvfIndex(vecs, dir, nCentroids = 16)
      Similarity.queryIvfIndex(s, dir, vecs.filter(col("vec_id") < 8),
        k = 5, nProbe = 16)
    },

    // ---- multimodal plumbing (stub codecs; see ops/Multimodal) ----
    // The metadata path of the batch feature-extraction pipeline is
    // deterministic arithmetic, so it oracles; feature VALUES are
    // asserted in MultimodalSpec (the byte-histogram stub).
    "multimodal_features" -> { (s, d) =>
      val media = graft.ops.Multimodal.syntheticMedia(
        Tables.documents(s, d).withColumn("n_chars", length(col("text"))))
      graft.ops.Multimodal.extractFeatures(s, media)
        .toDF().select(col("media_id"), col("kind"), col("n_bytes"),
          col("width"), col("height"))
    },

    "multimodal_frames" -> { (s, d) =>
      val media = graft.ops.Multimodal.syntheticMedia(
        Tables.documents(s, d).withColumn("n_chars", length(col("text"))))
      graft.ops.Multimodal.sampleFrames(s, media)
        .toDF().groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    // line-curation replay: same 8-word line reflow, same planted
    // boilerplate docs, same integer rule arithmetic, same reassembly
    "clean_lines" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> len(t) > 0) AS tk
        |  FROM documents),
        |base AS (
        |  SELECT doc_id, array_to_string(
        |    list_transform(range(0, CAST(ceil(len(tk) / 8.0) AS BIGINT)),
        |      i -> array_to_string(tk[(i*8+1):(i*8+8)], ' ')), chr(10))
        |    AS text
        |  FROM toks
        |  UNION ALL SELECT 920001, 'HOME | ABOUT | CONTACT US'
        |    || chr(10) ||
        |    'A perfectly ordinary prose sentence that should survive the filter.'
        |    || chr(10) || '12345 67890 13579 24680 999'
        |  UNION ALL SELECT 920002, 'COOKIE NOTICE' || chr(10) || 'short'
        |    || chr(10) ||
        |    'another normal lowercase sentence with plenty of words here'
        |  UNION ALL SELECT 920003, 'ALL CAPS SHOUTING HEADER LINE'
        |    || chr(10) ||
        |    'Mixed Case is fine when lowercase dominates the letters.'),
        |flat AS (SELECT doc_id, u.idx AS line_idx, u.line AS line FROM (
        |  SELECT doc_id, unnest(list_transform(range(0, len(ls)),
        |      i -> struct_pack(idx := i, line := ls[i+1]))) AS u
        |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
        |    FROM base))),
        |k AS (SELECT doc_id, line_idx, line,
        |    (len(trim(line)) >= 10
        |     AND len(list_filter(string_split(trim(line), ' '),
        |       w -> len(w) > 0)) >= 3
        |     AND len(regexp_replace(line, '[^a-z]', '', 'g'))
        |       >= len(regexp_replace(line, '[^A-Z]', '', 'g'))
        |     AND len(regexp_replace(line, '[^0-9]', '', 'g')) * 5
        |       < len(line) * 2) AS keep
        |  FROM flat)
        |SELECT doc_id, count(*) AS n_lines,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  string_agg(CASE WHEN keep THEN line END, chr(10)
        |    ORDER BY line_idx) AS text_clean
        |FROM k GROUP BY doc_id""".stripMargin,

    // diff/patch round-trip: applying the patch to the derived previous
    // snapshot must reproduce the current corpus EXACTLY
    "corpus_patch" -> "SELECT doc_id, text FROM documents",

    // feature-hash replay: same md5 bucket (first 8 hex chars as a
    // 32-bit big-endian value mod 64) and sign (9th hex char parity)
    "embed_feature_hash" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> len(t) > 0)) AS t
        |  FROM documents),
        |hb AS (SELECT doc_id,
        |    CAST(list_sum(list_transform(range(0, 8), k ->
        |      CAST(strpos('0123456789abcdef',
        |          substr(md5(t), 8 - CAST(k AS INT), 1)) - 1 AS BIGINT)
        |        * (CAST(1 AS BIGINT) << CAST(4 * k AS INT))))
        |      AS BIGINT) AS h,
        |    CAST(strpos('0123456789abcdef', substr(md5(t), 9, 1)) - 1
        |      AS INT) AS sd
        |  FROM toks)
        |SELECT doc_id, CAST(h % 64 AS INT) AS bucket,
        |  CAST(sum(CASE WHEN sd % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT)
        |    AS weight
        |FROM hb GROUP BY doc_id, h % 64
        |HAVING sum(CASE WHEN sd % 2 = 0 THEN 1 ELSE -1 END) <> 0""".stripMargin,

    // BM25 replay: same tokenizer, same micro-nat idf snap, same
    // fixed left-associated contribution sum, same (k1, b) literals
    "bm25_search" -> bm25OracleSql(25),

    // index-served BM25: same oracle at k=15 — every rank ≤ 15 scores
    // > 0 (matches ≥ 1 term), where index-served and full-scan BM25
    // provably coincide; beyond the positive region the index cannot
    // (and need not) enumerate zero-score non-matching docs
    "bm25_index_search" -> bm25OracleSql(15),

    // segmented (build + append) index must equal the fresh rebuild,
    // whose oracle is the full-corpus chain
    "bm25_index_upsert" -> bm25OracleSql(15),

    // RRF hybrid retrieval: lexical top-25 (BM25 chain) ⊕ vector top-25
    // (exact cosine of doc 7's embedding), 1/(60+rank) fusion
    "hybrid_rrf_search" -> hybridRrfOracleSql,

    // IR metrics: cosine top-10 vs same-label qrels, micro-unit DCG/RR
    "ir_metrics" -> irMetricsOracleSql,

    // positives: the same ranking restricted to SAME-label candidates
    "positive_pairs" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qvec,
        |    label AS q_label FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id AS corpus_id, embedding AS cvec,
        |    label AS c_label FROM embeddings),
        |s AS (SELECT query_id, corpus_id,
        |    list_sum(list_transform(range(1, len(cvec) + 1),
        |      i -> CAST(cvec[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(cvec) + 1),
        |        i -> CAST(cvec[i] AS DOUBLE) * CAST(cvec[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(qvec) + 1),
        |        i -> CAST(qvec[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE)))))
        |    AS cos
        |  FROM c, q WHERE corpus_id <> query_id
        |    AND c_label = q_label),
        |r AS (SELECT query_id, corpus_id, cos,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, corpus_id) AS INT) AS rank
        |  FROM s)
        |SELECT query_id, corpus_id, rank, round(cos, 6) AS cos
        |FROM r WHERE rank <= 5""".stripMargin,

    // hard negatives: the brute cosine ranking restricted to
    // different-label candidates, same tie-breaks
    "hard_negatives" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qvec,
        |    label AS q_label FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id AS corpus_id, embedding AS cvec,
        |    label AS neg_label FROM embeddings),
        |s AS (SELECT query_id, corpus_id, neg_label,
        |    list_sum(list_transform(range(1, len(cvec) + 1),
        |      i -> CAST(cvec[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(cvec) + 1),
        |        i -> CAST(cvec[i] AS DOUBLE) * CAST(cvec[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(qvec) + 1),
        |        i -> CAST(qvec[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE)))))
        |    AS cos
        |  FROM c, q WHERE corpus_id <> query_id
        |    AND neg_label <> q_label),
        |r AS (SELECT query_id, corpus_id, neg_label, cos,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, corpus_id) AS INT) AS rank
        |  FROM s)
        |SELECT query_id, corpus_id, rank, round(cos, 6) AS cos, neg_label
        |FROM r WHERE rank <= 5""".stripMargin,

    // ANN miners through the deterministic IVF route: assignment,
    // probing and in-cell label-filtered ranking all replay — the
    // miners are hash-checked end to end, unlike the fitted-KMeans ANN
    // entries (rows-only by necessity)
    "hard_negatives_ann" -> annMinerOracle("<>", withLabel = true),
    "positive_pairs_ann" -> annMinerOracle("=", withLabel = false),

    // incremental IVF append == the full-corpus index, hash-exact
    "ann_ivf_index_upsert" -> ivfUpsertOracle,

    // PMI lift replay: same token/shingle streams, same fixed-order
    // double chain (c_ab·N first, then the divisor product)
    "pmi_collocations" ->
      """WITH toks AS (SELECT
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |      t -> len(t) > 0) AS ts
        |  FROM documents),
        |uni AS (SELECT t, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT unnest(ts) AS t FROM toks) u GROUP BY t),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
        |bg AS (SELECT b, CAST(count(*) AS BIGINT) AS c_ab FROM (
        |    SELECT unnest(list_transform(range(0, len(ts) - 1),
        |      i -> ts[i + 1] || ' ' || ts[i + 2])) AS b
        |    FROM toks) x
        |  GROUP BY b HAVING count(*) >= 5),
        |j AS (SELECT bg.b, bg.c_ab, u1.c AS c_a, u2.c AS c_b,
        |    (CAST(bg.c_ab AS DOUBLE) * CAST((SELECT n FROM n) AS DOUBLE))
        |      / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)) AS lift
        |  FROM bg
        |  JOIN uni u1 ON split_part(bg.b, ' ', 1) = u1.t
        |  JOIN uni u2 ON split_part(bg.b, ' ', 2) = u2.t),
        |r AS (SELECT b, c_ab, c_a, c_b, lift,
        |    row_number() OVER (ORDER BY lift DESC, b) AS rn FROM j)
        |SELECT b, c_ab, c_a, c_b, round(lift, 6) AS lift
        |FROM r WHERE rn <= 30""".stripMargin,

    // trigram-indexed grep == the full contains() scan, by contract
    "grep_indexed" ->
      "SELECT doc_id, text FROM documents WHERE contains(text, 'merge batch')",

    // regex twin: same law against the full regexp scan
    "grep_regex_indexed" ->
      "SELECT doc_id, text FROM documents WHERE regexp_matches(text, 'merge [a-z]*batch|value +scan')",

    // DSIR weights replay: exact integer micro-nat chain end to end
    "dsir_weights" ->
      s"""WITH $dsirWeightsCte
         |SELECT doc_id, n_tokens, weight_micro FROM dw""".stripMargin,

    // DSIR top quarter: the threshold + tie-fill selection IS top-k
    // under (weight desc, doc_id asc) — replayed as the explicit rank
    "dsir_resample" ->
      s"""WITH $dsirWeightsCte,
         |r AS (SELECT doc_id, n_tokens, weight_micro,
         |    row_number() OVER (ORDER BY weight_micro DESC, doc_id) AS rn
         |  FROM dw)
         |SELECT doc_id, n_tokens, weight_micro FROM r
         |WHERE rn <= (SELECT count(*) // 4 FROM documents)""".stripMargin,

    // snapshot-diff replay: same derived previous snapshot, same md5
    // fingerprints, same full-outer classification
    "corpus_delta" ->
      """WITH cur AS (SELECT doc_id, md5(text) AS fp FROM documents),
        |  prev AS (
        |    SELECT doc_id, md5(CASE WHEN doc_id % 5 = 0
        |        THEN text || ' v1' ELSE text END) AS fp
        |      FROM documents WHERE doc_id % 7 <> 0
        |    UNION ALL
        |    SELECT doc_id + 500000000 AS doc_id, md5(text) AS fp
        |      FROM documents WHERE doc_id % 97 = 0)
        |SELECT coalesce(cur.doc_id, prev.doc_id) AS doc_id,
        |  CASE WHEN prev.fp IS NULL THEN 'added'
        |    WHEN cur.fp IS NULL THEN 'removed'
        |    WHEN cur.fp <> prev.fp THEN 'changed' END AS status
        |FROM cur FULL OUTER JOIN prev ON cur.doc_id = prev.doc_id
        |WHERE (CASE WHEN prev.fp IS NULL THEN 'added'
        |    WHEN cur.fp IS NULL THEN 'removed'
        |    WHEN cur.fp <> prev.fp THEN 'changed' END) IS NOT NULL""".stripMargin,

    "text_stats" ->
      """SELECT doc_id,
        |  length(text) AS n_chars,
        |  len(list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> len(t) > 0)) AS n_tokens,
        |  length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
        |    AS n_digits,
        |  round(CASE WHEN len(list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> len(t) > 0)) > 0
        |    THEN CAST(list_sum(list_transform(
        |        list_filter(string_split_regex(trim(text), '\s+'), t -> len(t) > 0),
        |        t -> len(t))) AS DOUBLE)
        |      / len(list_filter(string_split_regex(trim(text), '\s+'),
        |          t -> len(t) > 0))
        |    ELSE 0.0 END, 4) AS avg_token_len,
        |  CAST(list_sum(list_transform(
        |      list_filter(string_split_regex(trim(text), '\s+'), t -> len(t) > 0),
        |      t -> greatest(1, CAST(ceil(len(t) / 4.0) AS BIGINT))))
        |    AS BIGINT) AS n_bpe_tokens
        |FROM documents""".stripMargin,

    "text_quality" ->
      """WITH t AS (SELECT doc_id, text,
        |    CAST(length(text) AS DOUBLE) AS n,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> len(x) > 0)) AS DOUBLE) AS ntok,
        |    CAST(length(text) - length(regexp_replace(text,
        |        '[.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE) AS npunct,
        |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
        |        AS DOUBLE) AS ndigit,
        |    CASE WHEN len(list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> len(x) > 0)) > 0
        |      THEN CAST(list_sum(list_transform(
        |          list_filter(string_split_regex(trim(text), '\s+'),
        |            x -> len(x) > 0), x -> len(x))) AS DOUBLE)
        |        / len(list_filter(string_split_regex(trim(text), '\s+'),
        |            x -> len(x) > 0))
        |      ELSE 0.0 END AS atl
        |  FROM documents)
        |SELECT doc_id, round(CAST(
        |  (CASE WHEN ntok >= 10 AND ntok <= 10000 THEN 0.4 ELSE 0.0 END) +
        |  (CASE WHEN atl >= 2.5 AND atl <= 12.0 THEN 0.3 ELSE 0.0 END) +
        |  (CASE WHEN npunct / greatest(n, 1.0) <= 0.1 THEN 0.15 ELSE 0.0 END) +
        |  (CASE WHEN ndigit / greatest(n, 1.0) <= 0.2 THEN 0.15 ELSE 0.0 END)
        |  AS DOUBLE), 4) AS quality
        |FROM t""".stripMargin,

    "text_lang_id" -> langIdOracleSql,

    // confusion matrix = the same lang-id replay, cross-tabulated
    "lang_confusion" ->
      s"""WITH pred AS ($langIdOracleSql)
         |SELECT lang_label, lang_pred, count(*) AS n
         |FROM pred GROUP BY lang_label, lang_pred""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
        |FROM documents""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,

    "dedup_drop_exact" ->
      """SELECT d.* FROM documents d
        |JOIN (SELECT min(doc_id) AS doc_id FROM documents
        |      GROUP BY md5(text)) k USING (doc_id)""".stripMargin,

    // exact semantics regardless of the bloom gate: incoming rows whose
    // content hash is absent from the history slice
    "dedup_bloom_novel" ->
      """WITH incoming AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0
        |  UNION ALL
        |  SELECT doc_id + 200000 AS doc_id, text FROM documents
        |  WHERE doc_id % 8 = 1)
        |SELECT doc_id, md5(text) AS content_hash FROM incoming
        |WHERE md5(text) NOT IN
        |  (SELECT md5(text) FROM documents WHERE doc_id % 4 <> 0)""".stripMargin,

    // planted ground truth: every edge-swapped copy pairs with its
    // source (byte-multiset-preserving edit -> Hamming <= 2 under the
    // byte aHash; the 4-block pigeonhole guarantees candidacy)
    "multimodal_near_dups" ->
      """SELECT doc_id AS id_a, doc_id + 100000 AS id_b
        |FROM documents WHERE doc_id % 10 = 0""".stripMargin,

    // planted ground truth: the near-copies must be dropped, the
    // token-reversed docs (same words, disjoint 3-shingles) must
    // survive — replayed with the same tokenizer + list_reverse
    "dedup_near_novel" ->
      """SELECT doc_id + 200000 AS doc_id,
        |  md5(array_to_string(list_reverse(list_filter(
        |    string_split_regex(trim(text), '\s+'), t -> len(t) > 0)), ' '))
        |    AS content_hash
        |FROM documents WHERE doc_id % 7 = 3""".stripMargin,

    // the byte-identical regex chain (RE2-compatible patterns; 'g' flag
    // — DuckDB replaces only the first match without it)
    "text_redact_pii" ->
      """WITH planted AS (SELECT doc_id,
        |    text || ' Contact user' || CAST(doc_id AS VARCHAR)
        |      || '@example.com or (415) 555-2671, SSN 123-45-6789, host 10.0.'
        |      || CAST(doc_id % 256 AS VARCHAR) || '.7.' AS t
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(t,
        |          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |          '<EMAIL>', 'g'),
        |        '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
        |      '\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}', '<PHONE>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')
        |    AS redacted
        |FROM planted""".stripMargin,

    "corpus_top_ngrams" ->
      """WITH toks AS (SELECT
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |      t -> len(t) > 0) AS ts
        |  FROM documents),
        |sh AS (SELECT CASE WHEN len(ts) >= 2
        |    THEN list_transform(range(0, len(ts) - 1),
        |      i -> ts[i + 1] || ' ' || ts[i + 2])
        |    ELSE [array_to_string(ts, ' ')] END AS ngrams
        |  FROM toks),
        |e AS (SELECT unnest(ngrams) AS ngram FROM sh)
        |SELECT ngram, count(*) AS cnt FROM e GROUP BY ngram
        |ORDER BY cnt DESC, ngram LIMIT 20""".stripMargin,

    // integer counts + one IEEE divide + a short per-doc mean — every
    // step replays exactly (no ln: libm rounding is engine-specific);
    // counts TRAIN on documents only, scoring runs over documents ∪
    // plants, so unseen bigrams take the coalesce smoothing path
    "lm_quality" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT CAST(900001 AS BIGINT),
        |    'zq1 xv9 qj3 wv7 nb2 mx8 kd4 pr9 tz5 lw6'
        |  UNION ALL SELECT CAST(900002 AS BIGINT),
        |    'table hash table hash table hash table hash table hash'),
        |tokt AS (SELECT
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |      t -> len(t) > 0) AS ts
        |  FROM documents),
        |toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |      t -> len(t) > 0) AS ts
        |  FROM corpus),
        |bgt AS (SELECT unnest(list_transform(range(0, len(ts) - 1),
        |    i -> ts[i + 1] || ' ' || ts[i + 2])) AS b
        |  FROM tokt),
        |bg AS (SELECT doc_id, unnest(list_transform(range(0, len(ts) - 1),
        |    i -> ts[i + 1] || ' ' || ts[i + 2])) AS b
        |  FROM toks),
        |cnt AS (SELECT b, count(*) AS c12 FROM bgt GROUP BY b),
        |hd AS (SELECT split_part(b, ' ', 1) AS w, sum(c12) AS c1
        |  FROM cnt GROUP BY 1),
        |vv AS (SELECT count(DISTINCT t) AS v
        |  FROM (SELECT unnest(ts) AS t FROM tokt) u)
        |SELECT bg.doc_id, count(*) AS n_bigrams,
        |  avg((coalesce(cnt.c12, 0) + 1) / (coalesce(hd.c1, 0) + vv.v))
        |    AS lm_score
        |FROM bg LEFT JOIN cnt USING (b)
        |LEFT JOIN hd ON split_part(bg.b, ' ', 1) = hd.w
        |CROSS JOIN vv
        |GROUP BY bg.doc_id""".stripMargin,

    // Stupid-Backoff replay: BOS-padded token lists, the three count
    // tables from the clean documents, per-DISTINCT-context backoff
    // arithmetic in the exact Spark operand order, then the per-doc
    // mean over the scored stream (docs ∪ plants)
    "lm_backoff_score" -> NgramLmOracle.scoreSql(filterMin = None),

    // same replay, gate at the same unrounded threshold
    "lm_score_filter" -> NgramLmOracle.scoreSql(filterMin = Some(0.05)),

    // LM-score replay (no plants) + pack chain + per-bin mean +
    // easy-to-hard rank
    "curriculum_order" -> NgramLmOracle.curriculumSql(512),
    "curriculum_shards_e2e" -> NgramLmOracle.curriculumShardsSql(512, 8),

    // thresholds are thresholdHex(f) literals: floor(f * 2^32) in hex —
    // lexicographic compare on fixed-width lowercase hex == numeric
    "sample_hash" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE substr(md5('graft' || CAST(o_orderkey AS VARCHAR)), 1, 8)
        |  < '19999999'""".stripMargin,

    "sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 8)
        |  < CASE WHEN lang = 'en' THEN '80000000'
        |         WHEN lang = 'zh' THEN 'ffffffff'
        |         ELSE '40000000' END""".stripMargin,

    "sample_stratified_fixed" ->
      """WITH r AS (SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 8),
        |        doc_id) AS INT) AS sample_rank
        |  FROM documents)
        |SELECT doc_id, lang, sample_rank FROM r
        |WHERE sample_rank <= 30""".stripMargin,

    // pivot replay: conditional counts under the pivoted column names
    "pivot_lang_counts" ->
      """SELECT source,
        |  CAST(count(CASE WHEN lang = 'de' THEN 1 END) AS BIGINT) AS de,
        |  CAST(count(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT) AS en,
        |  CAST(count(CASE WHEN lang = 'es' THEN 1 END) AS BIGINT) AS es,
        |  CAST(count(CASE WHEN lang = 'fr' THEN 1 END) AS BIGINT) AS fr,
        |  CAST(count(CASE WHEN lang = 'zh' THEN 1 END) AS BIGINT) AS zh
        |FROM documents GROUP BY source""".stripMargin,

    // blocklist replay: the byte-identical RE2 alternation; DuckDB
    // counts via regexp_extract_all, gates via regexp_matches
    "blocklist_filter" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT * FROM (VALUES
        |    (900001, 'win FREE MONEY now at our casino tonight'),
        |    (900002, 'a casino-adjacent bird with a hyphen boundary'),
        |    (900003, 'click here to claim it, certified WINNER'),
        |    (900004, 'the casinos plural and moneyfree must not match'))
        |    v(doc_id, text))
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '(?i)\b(casino|free money|click here|winner)\b')) AS INT)
        |    AS n_hits,
        |  CASE WHEN regexp_matches(text,
        |    '(?i)\b(casino|free money|click here|winner)\b')
        |    THEN 0 ELSE 1 END AS keep
        |FROM corpus""".stripMargin,

    // sentence stats replay: same pattern, same trim/filter, integer
    // char sum + one divide + round
    "text_sentences" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(list_transform(
        |      regexp_extract_all(text, '[^.!?]+[.!?]*'), s -> trim(s)),
        |      s -> len(s) > 0) AS sents
        |  FROM documents)
        |SELECT doc_id, CAST(len(sents) AS INT) AS n_sentences,
        |  CASE WHEN len(sents) > 0
        |    THEN round(CAST(list_sum(list_transform(sents, s -> len(s)))
        |      AS DOUBLE) / len(sents), 4)
        |    ELSE 0.0 END AS mean_sent_chars
        |FROM t""".stripMargin,

    // histogram replay: the corpus_report quality chain (same term
    // order), bucketed by floor(q*20)
    "quality_histogram" ->
      """WITH t AS (SELECT source,
        |    (SELECT
        |      (CASE WHEN q.ntok >= 10 AND q.ntok <= 10000
        |        THEN 0.4 ELSE 0.0 END) +
        |      (CASE WHEN q.atl >= 2.5 AND q.atl <= 12.0
        |        THEN 0.3 ELSE 0.0 END) +
        |      (CASE WHEN q.npunct / greatest(q.n, 1.0) <= 0.1
        |        THEN 0.15 ELSE 0.0 END) +
        |      (CASE WHEN q.ndigit / greatest(q.n, 1.0) <= 0.2
        |        THEN 0.15 ELSE 0.0 END)
        |     FROM (SELECT
        |        CAST(length(text) AS DOUBLE) AS n,
        |        CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |          x -> len(x) > 0)) AS DOUBLE) AS ntok,
        |        CAST(length(text) - length(regexp_replace(text,
        |          '[.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE) AS npunct,
        |        CAST(length(text) - length(regexp_replace(text,
        |          '[0-9]', '', 'g')) AS DOUBLE) AS ndigit,
        |        CASE WHEN len(list_filter(string_split_regex(trim(text),
        |            '\s+'), x -> len(x) > 0)) > 0
        |          THEN CAST(list_sum(list_transform(
        |              list_filter(string_split_regex(trim(text), '\s+'),
        |                x -> len(x) > 0), x -> len(x))) AS DOUBLE)
        |            / len(list_filter(string_split_regex(trim(text), '\s+'),
        |                x -> len(x) > 0))
        |          ELSE 0.0 END AS atl) q) AS quality
        |  FROM documents)
        |SELECT source, CAST(floor(quality * 20) AS INT) AS bucket,
        |  count(*) AS n_docs
        |FROM t GROUP BY source, bucket""".stripMargin,

    // per-source report: same tokenizer, same quality rule-sum (the
    // text_quality expression, unrounded, compared at the 0.7 gate),
    // integer sums end to end, one final divide
    "corpus_report" ->
      """WITH t AS (SELECT source, lang,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |      x -> len(x) > 0)) AS ntok,
        |    length(text) AS nch,
        |    (SELECT
        |      (CASE WHEN q.ntok >= 10 AND q.ntok <= 10000
        |        THEN 0.4 ELSE 0.0 END) +
        |      (CASE WHEN q.atl >= 2.5 AND q.atl <= 12.0
        |        THEN 0.3 ELSE 0.0 END) +
        |      (CASE WHEN q.npunct / greatest(q.n, 1.0) <= 0.1
        |        THEN 0.15 ELSE 0.0 END) +
        |      (CASE WHEN q.ndigit / greatest(q.n, 1.0) <= 0.2
        |        THEN 0.15 ELSE 0.0 END)
        |     FROM (SELECT
        |        CAST(length(text) AS DOUBLE) AS n,
        |        CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |          x -> len(x) > 0)) AS DOUBLE) AS ntok,
        |        CAST(length(text) - length(regexp_replace(text,
        |          '[.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE) AS npunct,
        |        CAST(length(text) - length(regexp_replace(text,
        |          '[0-9]', '', 'g')) AS DOUBLE) AS ndigit,
        |        CASE WHEN len(list_filter(string_split_regex(trim(text),
        |            '\s+'), x -> len(x) > 0)) > 0
        |          THEN CAST(list_sum(list_transform(
        |              list_filter(string_split_regex(trim(text), '\s+'),
        |                x -> len(x) > 0), x -> len(x))) AS DOUBLE)
        |            / len(list_filter(string_split_regex(trim(text), '\s+'),
        |                x -> len(x) > 0))
        |          ELSE 0.0 END AS atl) q) AS quality
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
        |  CAST(sum(nch) AS BIGINT) AS n_chars,
        |  count(DISTINCT lang) AS n_langs,
        |  CAST(sum(CASE WHEN quality >= 0.7 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_high_quality,
        |  round(CAST(sum(ntok) AS DOUBLE) / count(*), 6) AS mean_doc_tokens
        |FROM t GROUP BY source""".stripMargin,

    "text_normalize" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT * FROM (VALUES
        |    (900001, 'CAFE' || chr(769) || '  du  Parc'),
        |    (900002, ' e' || chr(769) || 'te' || chr(769) || chr(9) ||
        |      'E' || chr(769) || 'TE' || chr(769) || ' '),
        |    (900003, 'A' || chr(776) || 'ngstro' || chr(776) || 'm   42'))
        |    v(doc_id, text))
        |SELECT doc_id,
        |  trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))
        |    AS norm
        |FROM corpus""".stripMargin,

    "heuristic_filter" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT * FROM (VALUES
        |    (900001, 'lorem ipsum dolor sit amet consectetur adipiscing elit'),
        |    (900002, 'short doc'),
        |    (900003, 'function render(x) { return x.map(item => item.id); }'),
        |    (900004, 'the quick aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa brown fox jumps over'),
        |    (900005, 'codes 404 500 12345 67890 11111 22222 33333'))
        |    v(doc_id, text)),
        |t AS (SELECT doc_id, text,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |      x -> len(x) > 0)) AS n_words,
        |    CASE WHEN regexp_matches(text, '\S{26,}') THEN 1 ELSE 0 END
        |      AS has_long_word,
        |    CASE WHEN contains(lower(text), 'lorem ipsum') THEN 1 ELSE 0 END
        |      AS has_lorem,
        |    CASE WHEN contains(text, '{') OR contains(text, '}')
        |      THEN 1 ELSE 0 END AS has_brace,
        |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
        |      AS DOUBLE) / greatest(CAST(length(text) AS DOUBLE), 1.0)
        |      AS draw_ratio
        |  FROM corpus)
        |SELECT doc_id, n_words, has_long_word, has_lorem, has_brace,
        |  round(draw_ratio, 4) AS digit_ratio,
        |  CASE WHEN n_words >= 5 AND n_words <= 50000
        |    AND has_long_word = 0 AND has_lorem = 0 AND has_brace = 0
        |    AND draw_ratio <= 0.2 THEN 1 ELSE 0 END AS keep
        |FROM t""".stripMargin,

    "dedup_paragraphs" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000,
        |    'zzz ' || substr(text, strpos(text, ' ') + 1)
        |  FROM documents WHERE doc_id % 10 = 0),
        |toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> len(t) > 0) AS tk
        |  FROM base),
        |paras AS (SELECT doc_id, unnest(
        |    list_transform(range(0, CAST(ceil(len(tk) / 12.0) AS BIGINT)),
        |      i -> struct_pack(idx := i,
        |        para := array_to_string(tk[(i*12+1):(i*12+12)], ' ')))) AS p
        |  FROM toks),
        |flat AS (SELECT doc_id, p.idx AS para_idx, p.para AS para
        |  FROM paras WHERE len(trim(p.para)) > 0),
        |ranked AS (SELECT doc_id, para_idx, para,
        |    row_number() OVER (PARTITION BY md5(para)
        |      ORDER BY doc_id, para_idx) AS rn
        |  FROM flat)
        |SELECT doc_id, count(*) AS n_paras,
        |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  string_agg(CASE WHEN rn = 1 THEN para END, chr(10)
        |    ORDER BY para_idx) AS text_deduped
        |FROM ranked GROUP BY doc_id""".stripMargin,

    "dedup_spans" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000,
        |    'zzz ' || substr(text, strpos(text, ' ') + 1)
        |  FROM documents WHERE doc_id % 10 = 0),
        |toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> len(t) > 0) AS tk
        |  FROM base),
        |kg AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM (
        |  SELECT doc_id, unnest(list_transform(range(0, len(tk) - 9),
        |      i -> struct_pack(pos := i,
        |        gram := array_to_string(tk[(i+1):(i+10)], ' ')))) AS u
        |  FROM toks WHERE len(tk) >= 10)),
        |ranked AS (SELECT doc_id, pos,
        |    row_number() OVER (PARTITION BY md5(gram)
        |      ORDER BY doc_id, pos) AS rn
        |  FROM kg),
        |cov AS (SELECT DISTINCT doc_id, j FROM (
        |  SELECT doc_id, unnest(range(pos, pos + 10)) AS j
        |  FROM ranked WHERE rn > 1)),
        |tokpos AS (SELECT doc_id, u.j AS j, u.tok AS tok FROM (
        |  SELECT doc_id, unnest(list_transform(range(0, len(tk)),
        |      j -> struct_pack(j := j, tok := tk[j + 1]))) AS u
        |  FROM toks)),
        |kept AS (SELECT t.doc_id, t.j, t.tok
        |  FROM tokpos t LEFT JOIN cov c
        |    ON t.doc_id = c.doc_id AND t.j = c.j
        |  WHERE c.doc_id IS NULL),
        |agg AS (SELECT doc_id, count(*) AS n_kept,
        |    string_agg(tok, ' ' ORDER BY j) AS text_clean
        |  FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, len(t.tk) AS n_tokens,
        |  CAST(len(t.tk) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
        |  a.text_clean
        |FROM toks t LEFT JOIN agg a ON t.doc_id = a.doc_id""".stripMargin,

    "contamination_score" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> len(t) > 0) AS ts
        |  FROM documents),
        |sh AS (SELECT doc_id, list_distinct(
        |    CASE WHEN len(ts) >= 3
        |      THEN list_transform(range(0, len(ts) - 2),
        |        i -> ts[i + 1] || ' ' || ts[i + 2] || ' ' || ts[i + 3])
        |      ELSE [array_to_string(ts, ' ')] END) AS shs
        |  FROM toks),
        |ex AS (SELECT doc_id, unnest(shs) AS s FROM sh),
        |bench AS (SELECT DISTINCT s FROM ex WHERE doc_id % 37 = 0),
        |hits AS (SELECT doc_id, count(*) AS n_contaminated
        |  FROM ex JOIN bench USING (s) GROUP BY doc_id)
        |SELECT sh.doc_id, len(sh.shs) AS n_shingles,
        |  CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
        |  round(CAST(coalesce(h.n_contaminated, 0) AS DOUBLE)
        |    / greatest(len(sh.shs), 1), 4) AS contamination
        |FROM sh LEFT JOIN hits h ON sh.doc_id = h.doc_id""".stripMargin,

    // thresholds interpolated from the SAME cumulative-sum + floor
    // arithmetic the operator uses, so the hex literals match bit-for-bit
    "split_assign" ->
      s"""SELECT doc_id,
         |  CASE WHEN substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 8)
         |      < '${graft.ops.Sampling.thresholdHex(0.8)}' THEN 'train'
         |    WHEN substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 8)
         |      < '${graft.ops.Sampling.thresholdHex(0.8 + 0.1)}' THEN 'val'
         |    ELSE 'test' END AS split
         |FROM documents""".stripMargin,

    "shuffle_global" ->
      """SELECT doc_id, source,
        |  row_number() OVER (
        |    ORDER BY substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 8),
        |      doc_id) - 1 AS pos
        |FROM documents""".stripMargin,

    // per-source cap replay: same rule-sum score, row_number <= 40
    "cap_per_source" ->
      """WITH t AS (SELECT doc_id, source, n_chars,
        |    CAST(length(text) AS DOUBLE) AS n,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> len(x) > 0)) AS DOUBLE) AS ntok,
        |    CAST(length(text) - length(regexp_replace(text,
        |        '[.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE) AS npunct,
        |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '',
        |        'g')) AS DOUBLE) AS ndigit,
        |    CASE WHEN len(list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> len(x) > 0)) > 0
        |      THEN CAST(list_sum(list_transform(
        |          list_filter(string_split_regex(trim(text), '\s+'),
        |            x -> len(x) > 0), x -> len(x))) AS DOUBLE)
        |        / len(list_filter(string_split_regex(trim(text), '\s+'),
        |            x -> len(x) > 0))
        |      ELSE 0.0 END AS atl
        |  FROM documents),
        |s AS (SELECT doc_id, source, n_chars, CAST(
        |  (CASE WHEN ntok >= 10 AND ntok <= 10000 THEN 0.4 ELSE 0.0 END) +
        |  (CASE WHEN atl >= 2.5 AND atl <= 12.0 THEN 0.3 ELSE 0.0 END) +
        |  (CASE WHEN npunct / greatest(n, 1.0) <= 0.1
        |    THEN 0.15 ELSE 0.0 END) +
        |  (CASE WHEN ndigit / greatest(n, 1.0) <= 0.2
        |    THEN 0.15 ELSE 0.0 END)
        |  AS DOUBLE) AS q FROM t),
        |r AS (SELECT doc_id, source, n_chars, q,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY q DESC, doc_id) AS rn FROM s)
        |SELECT doc_id, source, round(q, 4) AS quality, n_chars
        |FROM r WHERE rn <= 20""".stripMargin,

    // quality gate replay: same rule-sum score, same rank + floor(n/2)
    "quality_gate" ->
      """WITH t AS (SELECT doc_id, lang,
        |    CAST(length(text) AS DOUBLE) AS n,
        |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> len(x) > 0)) AS DOUBLE) AS ntok,
        |    CAST(length(text) - length(regexp_replace(text,
        |        '[.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE) AS npunct,
        |    CAST(length(text) - length(regexp_replace(text, '[0-9]', '',
        |        'g')) AS DOUBLE) AS ndigit,
        |    CASE WHEN len(list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> len(x) > 0)) > 0
        |      THEN CAST(list_sum(list_transform(
        |          list_filter(string_split_regex(trim(text), '\s+'),
        |            x -> len(x) > 0), x -> len(x))) AS DOUBLE)
        |        / len(list_filter(string_split_regex(trim(text), '\s+'),
        |            x -> len(x) > 0))
        |      ELSE 0.0 END AS atl
        |  FROM documents),
        |s AS (SELECT doc_id, lang, CAST(
        |  (CASE WHEN ntok >= 10 AND ntok <= 10000 THEN 0.4 ELSE 0.0 END) +
        |  (CASE WHEN atl >= 2.5 AND atl <= 12.0 THEN 0.3 ELSE 0.0 END) +
        |  (CASE WHEN npunct / greatest(n, 1.0) <= 0.1
        |    THEN 0.15 ELSE 0.0 END) +
        |  (CASE WHEN ndigit / greatest(n, 1.0) <= 0.2
        |    THEN 0.15 ELSE 0.0 END)
        |  AS DOUBLE) AS q FROM t),
        |r AS (SELECT doc_id, lang, q,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY q DESC, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n FROM s)
        |SELECT doc_id, lang, round(q, 4) AS quality
        |FROM r WHERE rn <= n // 2""".stripMargin,

    // tf-idf replay: same tokenizer, same (tf * N) / df double chain
    "tfidf_top_terms" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> len(t) > 0)) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf
        |  FROM toks GROUP BY doc_id, term),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (SELECT doc_id, term,
        |    CAST(tf AS DOUBLE) * (SELECT n FROM n) / df AS score
        |  FROM tf JOIN dfreq USING (term)),
        |r AS (SELECT doc_id, term, score,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, term) AS INT) AS rank
        |  FROM scored)
        |SELECT doc_id, term, rank, round(score, 6) AS score
        |FROM r WHERE rank <= 3""".stripMargin,

    // exact semantics regardless of the CMS gate: tokens at or above
    // the count threshold, same planted long tail
    "heavy_hitters" ->
      """SELECT token, count(*) AS cnt FROM (
        |  SELECT unnest(list_filter(string_split_regex(trim(
        |    concat(text, ' ux', doc_id, 'a ux', doc_id, 'b')), '\s+'),
        |    t -> len(t) > 0)) AS token
        |  FROM documents)
        |GROUP BY token HAVING count(*) >= 50""".stripMargin,

    // BPE pair replay: same word-frequency table, same 2-char substring
    // pairs, integer weights end to end (sum cast: DuckDB sums to
    // HUGEINT, Spark to BIGINT)
    "bpe_pair_counts" ->
      """WITH toks AS (SELECT
        |    unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |      t -> len(t) > 0)) AS w
        |  FROM documents),
        |wf AS (SELECT w, count(*) AS freq FROM toks GROUP BY w),
        |pairs AS (SELECT freq,
        |    unnest(list_transform(range(1, len(w)),
        |      i -> substring(w, i, 2))) AS pair
        |  FROM wf WHERE len(w) >= 2)
        |SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM pairs
        |GROUP BY pair ORDER BY cnt DESC, pair LIMIT 50""".stripMargin,

    // full greedy-training replay: 20 unrolled argmax+rewrite rounds
    "bpe_train_merges" -> BpeOracle.trainSql(20),

    // training replay + recursive-CTE priority encode over the vocab
    "bpe_piece_counts" -> BpeOracle.pieceCountsSql(20),

    // fertility/compression replay: same piece pricing, same
    // whitespace-stripped char count, source-keyed sums
    "tokenizer_fertility" -> BpeOracle.fertilitySql(20),
    "bpe_vocab" -> BpeOracle.vocabSql(20),
    "bpe_encode_ids" -> BpeOracle.encodeIdsSql(20),
    "sft_mask_spans" -> BpeOracle.maskSpansSql(20),

    // the frozen-tokenizer encode must hash-match the train-and-encode
    // replay exactly — persistence fidelity IS the claim
    "bpe_encode_ids_frozen" -> BpeOracle.encodeIdsSql(20),

    // padded SFT collator replay: grid x left-join on piece position
    "sft_padded_batches" -> BpeOracle.paddedSql(20, maxLen = 64),

    "sft_multiturn_batches" -> BpeOracle.multiturnSql(20, maxLen = 96),

    "sft_multiturn_packed" ->
      BpeOracle.multiturnShardsSql(20, capacity = 512),

    // the round-trip contract IS the oracle: decode(encode(x)) ==
    // normalized(x) — lowercase, whitespace removed; docs with no
    // tokens encode to nothing and so decode to nothing
    "bpe_decode_ids" ->
      """SELECT doc_id, array_to_string(list_filter(
        |    string_split_regex(trim(lower(text)), '\s+'),
        |    t -> len(t) > 0), '') AS text_decoded
        |FROM documents
        |WHERE len(list_filter(string_split_regex(trim(lower(text)),
        |  '\s+'), t -> len(t) > 0)) > 0""".stripMargin,

    // full loader-tensor replay: training + encode + vocab ids +
    // prompt spans + pack chain -> one row per token with segment facts
    "train_shards_e2e" -> BpeOracle.trainShardsSql(20, capacity = 512),

    // manifest grain of the same replay: shard = bin/8 arithmetic,
    // (records, tokens, xor) per shard, agreement flag TRUE
    "train_shards_manifest" ->
      BpeOracle.manifestSql(20, capacity = 512, binsPerShard = 8),

    // the separator variant: one EOS piece per doc at id |vocab|
    "train_shards_eos_e2e" ->
      BpeOracle.trainShardsSql(20, capacity = 512, eos = true),

    // layout IS the schedule, payload IS the tensor: per-bin rollup +
    // length-curriculum rank + shard/seq arithmetic
    "curriculum_tensor_shards_e2e" ->
      BpeOracle.curriculumTensorShardsSql(20, capacity = 512,
        binsPerShard = 8),

    // (image bytes, caption ids) pairs: byte identity via the utf8
    // round-trip against the source text; ids under the top-500 vocab
    "multimodal_shards_e2e" ->
      """WITH toks AS (SELECT doc_id, unnest(tsf) AS w,
        |    unnest(range(1, len(tsf) + 1)) AS pos
        |  FROM (SELECT doc_id, list_filter(
        |      string_split_regex(trim(lower(text)), '\s+'),
        |      t -> len(t) > 0) AS tsf FROM documents)),
        |vocab AS (SELECT w,
        |    CAST(row_number() OVER (ORDER BY cnt DESC, w) - 1 AS BIGINT)
        |      AS vid
        |  FROM (SELECT w, count(*) AS cnt FROM toks GROUP BY w
        |        ORDER BY cnt DESC, w LIMIT 500))
        |SELECT t.doc_id AS media_id,
        |  CAST(t.pos - 1 AS BIGINT) AS caption_pos,
        |  CAST(COALESCE(v.vid, -1) AS BIGINT) AS caption_tid,
        |  d.text AS media_utf8
        |FROM toks t LEFT JOIN vocab v USING (w)
        |JOIN documents d ON d.doc_id = t.doc_id""".stripMargin,

    // pack segments: the pack_sequences prefix chain, in-bin offset =
    // cum_before % capacity (capacity 512 = 2^9, FP-exact division)
    "pack_segments" ->
      """WITH tk AS (SELECT doc_id,
        |    COALESCE(CAST(list_sum(list_transform(
        |      list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> len(x) > 0),
        |      x -> greatest(1, CAST(ceil(len(x) / 4.0) AS BIGINT))))
        |      AS BIGINT), 0) AS n_tokens
        |  FROM documents),
        |cum AS (SELECT doc_id, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cb
        |  FROM tk)
        |SELECT CAST(floor(cb / 512.0) AS BIGINT) AS bin_id, doc_id,
        |  cb % 512 AS seg_start, n_tokens AS seg_len
        |FROM cum""".stripMargin,

    // FIM: same md5 draw chain (id-type-agnostic), same substring spans
    "fim_transform" -> fimOracleSql("documents"),

    // the same transform over STRING ids — proves the hash-draw cuts
    // never touch id arithmetic (the old id % k selection failed
    // analysis here)
    "fim_transform_strid" -> fimOracleSql(
      "(SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS doc_id, text " +
        "FROM documents)"),

    // tokenizer-in-the-loop pack: the encode replay feeds the exact
    // pack_to_shards bin chain
    "bpe_pack_shards_e2e" -> BpeOracle.packShardsSql(20, capacity = 512),

    // full GD-training replay: six unrolled epochs on the micro grid
    "quality_classifier" -> QualityClassifierOracle.sql(
      dim = 1024, epochs = 6, lr = 1.0),

    // vocabulary coverage replay: same top-500 vocab (count desc, token
    // tiebreak), same null-flag left join and per-doc ratio
    "vocab_oov_rate" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |      t -> len(t) > 0)) AS t
        |  FROM documents),
        |vocab AS (SELECT t FROM (
        |    SELECT t, count(*) AS cnt FROM toks GROUP BY t
        |    ORDER BY cnt DESC, t LIMIT 500)),
        |j AS (SELECT toks.doc_id, vocab.t AS vt
        |  FROM toks LEFT JOIN vocab ON toks.t = vocab.t)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_oov,
        |  round(CAST(sum(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS oov_rate
        |FROM j GROUP BY doc_id""".stripMargin,

    // source overlap replay: same shingle construction, integer set
    // sizes, one double divide at the end
    "source_overlap" ->
      """WITH toks AS (SELECT source, list_filter(
        |    string_split_regex(trim(text), '\s+'), t -> len(t) > 0) AS ts
        |  FROM documents),
        |shl AS (SELECT source, unnest(CASE WHEN len(ts) >= 3
        |    THEN list_transform(range(0, len(ts) - 2),
        |      i -> ts[i + 1] || ' ' || ts[i + 2] || ' ' || ts[i + 3])
        |    ELSE [array_to_string(ts, ' ')] END) AS s
        |  FROM toks),
        |sh AS (SELECT DISTINCT source AS src, s FROM shl),
        |sizes AS (SELECT src, count(*) AS n_sh FROM sh GROUP BY src),
        |inter AS (SELECT a.src AS src_a, b.src AS src_b,
        |    count(*) AS n_common
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.src < b.src
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, n_common,
        |  round(CAST(n_common AS DOUBLE)
        |    / (na.n_sh + nb.n_sh - n_common), 6) AS jaccard
        |FROM inter JOIN sizes na ON inter.src_a = na.src
        |JOIN sizes nb ON inter.src_b = nb.src""".stripMargin,

    // span corruption replay: same tokenizer, same per-(doc, span-block)
    // md5 draw, sentinel at block starts, in-span tokens dropped
    "mask_spans" ->
      """WITH toks AS (SELECT doc_id, list_filter(
        |    string_split_regex(trim(text), '\s+'), t -> len(t) > 0) AS ts
        |  FROM documents),
        |m AS (SELECT doc_id, ts,
        |    list_transform(range(0, len(ts)), i ->
        |      CASE WHEN substr(md5('graft' || CAST(doc_id AS VARCHAR)
        |          || '#' || CAST(i // 3 AS VARCHAR)), 1, 8) < '33333333'
        |        THEN 1 ELSE 0 END) AS mk
        |  FROM toks)
        |SELECT doc_id,
        |  array_to_string(list_filter(list_transform(range(0, len(ts)),
        |    i -> CASE WHEN mk[i + 1] = 1 AND i % 3 = 0 THEN '<mask>'
        |              WHEN mk[i + 1] = 1 THEN ''
        |              ELSE ts[i + 1] END), x -> x <> ''), ' ')
        |    AS text_masked,
        |  CAST(list_sum(mk) AS BIGINT) AS n_masked
        |FROM m""".stripMargin,

    // token-budget replay: same token count, same (draw, doc_id)
    // ordering, same running-sum prefix cut
    "sample_token_budget" ->
      """WITH t AS (SELECT doc_id, source,
        |    COALESCE(CAST(list_sum(list_transform(
        |      list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> len(x) > 0),
        |      x -> greatest(1, CAST(ceil(len(x) / 4.0) AS BIGINT))))
        |      AS BIGINT), 0) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, source, n_tokens,
        |    CAST(SUM(n_tokens) OVER (PARTITION BY source
        |      ORDER BY substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 8),
        |        doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_tokens
        |  FROM t)
        |SELECT doc_id, source, n_tokens, cum_tokens
        |FROM c WHERE cum_tokens <= 2000""".stripMargin,

    // mixture resample replay: K and per-source fractions recomputed in
    // the same fixed-order IEEE double arithmetic, thresholds rebuilt as
    // 8-hex-digit literals (floor matches Scala's toLong truncation;
    // least(..., 4294967295) matches the thresholdHex clamp at f=1.0)
    "sample_mixture" ->
      """WITH w(src, wt) AS (VALUES ('src0', CAST(0.5 AS DOUBLE)),
        |    ('src1', CAST(0.3 AS DOUBLE)), ('src2', CAST(0.2 AS DOUBLE))),
        |n AS (SELECT source, count(*) AS cnt FROM documents
        |  WHERE source IN ('src0', 'src1', 'src2') GROUP BY source),
        |tot AS (SELECT min(floor(cnt / wt)) AS k
        |  FROM n JOIN w ON n.source = w.src),
        |fr AS (SELECT src, lpad(lower(to_hex(least(CAST(floor(
        |      least(1.0, wt * (SELECT k FROM tot) / cnt) * 4294967296.0)
        |      AS BIGINT), 4294967295))), 8, '0') AS thr
        |  FROM w JOIN n ON n.source = w.src)
        |SELECT d.doc_id, d.source FROM documents d
        |JOIN fr ON d.source = fr.src
        |WHERE substr(md5('graft' || CAST(doc_id AS VARCHAR)), 1, 8)
        |  < thr""".stripMargin,

    // global token prefix sum in doc_id order; capacity 512 = 2^9 keeps
    // same tokenizer replay as text_stats; list slices are 1-based
    // inclusive and end-clipped in both engines
    "chunk_documents" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> len(t) > 0) AS t
        |  FROM documents),
        |ch AS (
        |  SELECT doc_id, t,
        |    unnest(generate_series(0,
        |      CAST(greatest(1, ceil((len(t) - 16) / 48.0)) AS BIGINT) - 1))
        |      AS chunk_idx
        |  FROM toks WHERE len(t) > 0)
        |SELECT doc_id, chunk_idx,
        |  len(t[chunk_idx*48 + 1 : chunk_idx*48 + 64]) AS n_chunk_tokens,
        |  array_to_string(t[chunk_idx*48 + 1 : chunk_idx*48 + 64], ' ')
        |    AS chunk_text
        |FROM ch""".stripMargin,

    // the bin division FP-exact; sums cast to BIGINT (DuckDB sum of
    // integers is HUGEINT, which the driver bridge would coerce to float)
    "pack_sequences" ->
      """WITH t AS (SELECT doc_id,
        |    COALESCE(CAST(list_sum(list_transform(
        |      list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> len(x) > 0),
        |      x -> greatest(1, CAST(ceil(len(x) / 4.0) AS BIGINT))))
        |      AS BIGINT), 0) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM t),
        |b AS (SELECT doc_id, n_tokens,
        |    CAST(floor(cb / 512.0) AS BIGINT) AS bin_id FROM c)
        |SELECT bin_id, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM b GROUP BY bin_id""".stripMargin,

    // Brute-force all-pairs word-3-gram Jaccard >= 0.5 over the planted
    // corpus. Equals BOTH pair queries: any pair with j >= 0.5 shares a
    // shingle (blocking is lossless) and no shingle block exceeds the
    // 1000 cap at sf0.01, so ngramJaccardPairs is exhaustive; minhash
    // LSH recall is total on this corpus (see the query comment).
    // the shard roundtrip must reproduce the pack chain exactly
    "pack_to_shards_e2e" -> """WITH t AS (SELECT doc_id,
        |    COALESCE(CAST(list_sum(list_transform(
        |      list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> len(x) > 0),
        |      x -> greatest(1, CAST(ceil(len(x) / 4.0) AS BIGINT))))
        |      AS BIGINT), 0) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM t),
        |b AS (SELECT doc_id, n_tokens,
        |    CAST(floor(cb / 512.0) AS BIGINT) AS bin_id FROM c)
        |SELECT bin_id, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM b GROUP BY bin_id""".stripMargin,

    "dedup_ngram_jaccard" -> ngramJaccardOracle,
    "dedup_minhash_lsh" -> ngramJaccardOracle,
    "dedup_minhash_capped" -> ngramJaccardOracle,
    "dedup_simhash" -> simhashOracle,
    "dedup_clusters" -> dedupClustersOracle,
    "split_leakage_safe" -> splitLeakageSafeOracle,
    "dedup_drop_near" -> dedupDropNearOracle,

    "dedup_keep_best" -> dedupKeepBestOracle,

    // text_repetition: 1 - distinct/total word n-grams (n = 2, 3)
    "text_repetition" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> len(t) > 0) AS ts
        |  FROM documents),
        |sh AS (SELECT doc_id,
        |    CASE WHEN len(ts) >= 2
        |      THEN list_transform(range(0, len(ts) - 1),
        |        i -> ts[i + 1] || ' ' || ts[i + 2])
        |      ELSE [array_to_string(ts, ' ')] END AS s2,
        |    CASE WHEN len(ts) >= 3
        |      THEN list_transform(range(0, len(ts) - 2),
        |        i -> ts[i + 1] || ' ' || ts[i + 2] || ' ' || ts[i + 3])
        |      ELSE [array_to_string(ts, ' ')] END AS s3
        |  FROM toks)
        |SELECT doc_id,
        |  CASE WHEN len(s2) > 1
        |    THEN 1.0 - CAST(len(list_distinct(s2)) AS DOUBLE) / len(s2)
        |    ELSE 0.0 END AS rep2,
        |  CASE WHEN len(s3) > 1
        |    THEN 1.0 - CAST(len(list_distinct(s3)) AS DOUBLE) / len(s3)
        |    ELSE 0.0 END AS rep3
        |FROM sh""".stripMargin,

    // decontaminate: distinct-3-gram overlap count vs the benchmark set
    "decontaminate" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> len(t) > 0) AS ts
        |  FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(ts) >= 3
        |      THEN list_transform(range(0, len(ts) - 2),
        |        i -> ts[i + 1] || ' ' || ts[i + 2] || ' ' || ts[i + 3])
        |      ELSE [array_to_string(ts, ' ')] END)) AS s
        |  FROM toks),
        |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 37 = 0)
        |SELECT doc_id, count(*) AS n_shared
        |FROM sh JOIN bench USING (s)
        |GROUP BY doc_id HAVING count(*) >= 2""".stripMargin,

    // Brute-force all-pairs cosine >= 0.999 over base + scaled plants.
    // Positive scaling preserves hyperplane signs, so every qualifying
    // pair shares all LSH table signatures — bucketing is lossless here.
    // Dot products in DOUBLE mirror Similarity.dot's left-to-right fold.
    "dedup_embedding_cosine" ->
      """WITH v AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000,
        |    list_transform(embedding, x -> CAST(x * CAST(1.01 AS FLOAT) AS FLOAT))
        |  FROM embeddings WHERE vec_id % 25 = 0),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_sum(list_transform(range(1, len(a.embedding) + 1),
        |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1),
        |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(b.embedding) + 1),
        |        i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))))
        |    AS cos
        |  FROM v a, v b WHERE a.vec_id < b.vec_id)
        |SELECT id_a, id_b, round(cos, 6) AS cos FROM p
        |WHERE cos >= 0.999""".stripMargin,

    // SemDeDup replay: same plants; centroids = the 16 lowest-id
    // vectors; assignment = argmax cosine (ties to the lowest cell,
    // mirroring the engine's array_max over (cos, -cell) structs);
    // pairs compared only within a cell.
    "dedup_semantic" ->
      """WITH v AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000,
        |    list_transform(embedding, x -> CAST(x * CAST(1.01 AS FLOAT) AS FLOAT))
        |  FROM embeddings WHERE vec_id % 25 = 0),
        |c AS (SELECT CAST(vec_id AS INT) AS cell, embedding AS cvec
        |  FROM v WHERE vec_id < 16),
        |s AS (SELECT a.vec_id AS id, a.embedding AS vec, c.cell,
        |    list_sum(list_transform(range(1, len(a.embedding) + 1),
        |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1),
        |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(c.cvec) + 1),
        |        i -> CAST(c.cvec[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))))
        |    AS ccos
        |  FROM v a, c),
        |asg AS (SELECT id, vec, cell FROM (
        |    SELECT id, vec, cell,
        |      row_number() OVER (PARTITION BY id ORDER BY ccos DESC, cell ASC) AS rn
        |    FROM s) WHERE rn = 1),
        |p AS (SELECT x.id AS id_a, y.id AS id_b, x.cell AS cell,
        |    list_sum(list_transform(range(1, len(x.vec) + 1),
        |      i -> CAST(x.vec[i] AS DOUBLE) * CAST(y.vec[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(x.vec) + 1),
        |        i -> CAST(x.vec[i] AS DOUBLE) * CAST(x.vec[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(y.vec) + 1),
        |        i -> CAST(y.vec[i] AS DOUBLE) * CAST(y.vec[i] AS DOUBLE)))))
        |    AS cos
        |  FROM asg x JOIN asg y ON x.cell = y.cell AND x.id < y.id)
        |SELECT id_a, id_b, cell, round(cos, 6) AS cos FROM p
        |WHERE cos >= 0.9""".stripMargin,

    // Semantic decontamination replay: same centroids/assignment CTEs
    // as dedup_semantic; bench = scaled %37 copies assigned through the
    // same argmax (scale-invariant, so each leak shares its source's
    // cell); hits joined on cell, grouped per corpus id
    "decontaminate_semantic" ->
      """WITH c AS (SELECT CAST(vec_id AS INT) AS cell, embedding AS cvec
        |  FROM embeddings WHERE vec_id < 16),
        |sa AS (SELECT a.vec_id AS id, a.embedding AS vec, c.cell,
        |    list_sum(list_transform(range(1, len(a.embedding) + 1),
        |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1),
        |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(c.cvec) + 1),
        |        i -> CAST(c.cvec[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))))
        |    AS ccos
        |  FROM embeddings a, c),
        |asg AS (SELECT id, vec, cell FROM (
        |    SELECT id, vec, cell,
        |      row_number() OVER (PARTITION BY id ORDER BY ccos DESC, cell ASC) AS rn
        |    FROM sa) WHERE rn = 1),
        |bv AS (SELECT vec_id AS bid,
        |    list_transform(embedding, x -> CAST(x * CAST(1.01 AS FLOAT) AS FLOAT)) AS bvec
        |  FROM embeddings WHERE vec_id % 37 = 0),
        |sb AS (SELECT b.bid, b.bvec, c.cell,
        |    list_sum(list_transform(range(1, len(b.bvec) + 1),
        |      i -> CAST(b.bvec[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(b.bvec) + 1),
        |        i -> CAST(b.bvec[i] AS DOUBLE) * CAST(b.bvec[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(c.cvec) + 1),
        |        i -> CAST(c.cvec[i] AS DOUBLE) * CAST(c.cvec[i] AS DOUBLE)))))
        |    AS ccos
        |  FROM bv b, c),
        |basg AS (SELECT bid, bvec, cell FROM (
        |    SELECT bid, bvec, cell,
        |      row_number() OVER (PARTITION BY bid ORDER BY ccos DESC, cell ASC) AS rn
        |    FROM sb) WHERE rn = 1),
        |j AS (SELECT a.id,
        |    list_sum(list_transform(range(1, len(a.vec) + 1),
        |      i -> CAST(a.vec[i] AS DOUBLE) * CAST(b.bvec[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, len(a.vec) + 1),
        |        i -> CAST(a.vec[i] AS DOUBLE) * CAST(a.vec[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, len(b.bvec) + 1),
        |        i -> CAST(b.bvec[i] AS DOUBLE) * CAST(b.bvec[i] AS DOUBLE)))))
        |    AS cos
        |  FROM asg a JOIN basg b ON a.cell = b.cell)
        |SELECT id AS vec_id, count(*) AS n_hits,
        |  round(max(cos), 6) AS max_cos
        |FROM j WHERE cos >= 0.95 GROUP BY id""".stripMargin,

    "multimodal_features" ->
      """SELECT doc_id AS media_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |    WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
        |  CAST(length(text) % 640 + 16 AS INT) AS width,
        |  CAST(length(text) % 480 + 16 AS INT) AS height
        |FROM documents""".stripMargin,

    "multimodal_frames" ->
      """SELECT doc_id AS media_id,
        |  least(8, greatest(1, octet_length(CAST(text AS BLOB)) // 64))
        |    AS n_frames
        |FROM documents WHERE doc_id % 3 = 2""".stripMargin,

    // Exact brute-force cosine top-5 per query vector — the ANN
    // baseline is itself exact, so DuckDB reproduces it fully.
    "ann_brute_topk" -> bruteCosineTopkSql,

    // IVF full probe is exhaustive: the quantizer cancels, the output
    // IS the brute scan — one SQL serves the one-shot and the
    // build/persist/query twins (see the queries-side comments)
    "ann_ivf_fullprobe_topk" -> bruteCosineTopkSql,
    "ann_ivf_index_fullprobe_topk" -> bruteCosineTopkSql,

    // cosine LSH replay: rebuild the 32 md5-addressable ±1 planes
    // (Similarity.mdSignPlanes — sign = first 8 md5 hex chars of
    // "lsh:t:b:j" < '80000000'), per-table signatures as bit-summed
    // sign dots, candidates = distinct pairs agreeing on (table, sig),
    // exact cosine + (cos DESC, corpus_id) rank within candidates —
    // the approximate op at its real operating point, hash-checked
    "ann_lsh_topk" ->
      """WITH mx AS MATERIALIZED (
        |  SELECT t, b, list_transform(range(0, 64), j ->
        |      CASE WHEN substr(md5('lsh:' || t || ':' || b || ':' || j),
        |                 1, 8) < '80000000'
        |      THEN 1.0 ELSE -1.0 END) AS plane
        |  FROM range(4) tt(t), range(8) bb(b)),
        |bits AS (
        |  SELECT e.vec_id, m.t,
        |    CASE WHEN list_sum(list_transform(range(1, 65),
        |        i -> CAST(e.embedding[i] AS DOUBLE) * m.plane[i])) > 0
        |    THEN CAST(pow(2, m.b) AS BIGINT) ELSE 0 END AS bit
        |  FROM embeddings e, mx m),
        |sig AS MATERIALIZED (
        |  SELECT vec_id, t, sum(bit) AS sig FROM bits GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS corpus_id
        |  FROM sig c JOIN sig q ON c.t = q.t AND c.sig = q.sig
        |  WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
        |x AS (SELECT cand.query_id, cand.corpus_id,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(ce.embedding[i] AS DOUBLE)
        |         * CAST(qe.embedding[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(range(1, 65),
        |        i -> CAST(ce.embedding[i] AS DOUBLE)
        |           * CAST(ce.embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(range(1, 65),
        |        i -> CAST(qe.embedding[i] AS DOUBLE)
        |           * CAST(qe.embedding[i] AS DOUBLE)))))
        |    AS cos
        |  FROM cand
        |  JOIN embeddings ce ON ce.vec_id = cand.corpus_id
        |  JOIN embeddings qe ON qe.vec_id = cand.query_id),
        |r AS (SELECT query_id, corpus_id, cos,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, corpus_id) AS INT) AS rank
        |  FROM x)
        |SELECT query_id, corpus_id, rank, round(cos, 6) AS cos
        |FROM r WHERE rank <= 5""".stripMargin,

    // JL projection replay: the md5-derived Achlioptas matrix is
    // rebuilt from scratch (same "seed:row:col" keys, same fixed-hex
    // bucket compares), each component the same left-to-right dot
    // times sqrt(3/16)
    "embed_random_projection" ->
      (RandomProjectionOracle.matrixCtes +
        """
          |SELECT vec_id, CAST(j AS INT) AS j,
          |  round(list_sum(list_transform(range(1, 65),
          |      i -> CAST(embedding[i] AS DOUBLE) * mx[j + 1][i]))
          |    * sqrt(3.0 / 16), 6) AS val
          |FROM embeddings CROSS JOIN mm CROSS JOIN range(16) r(j)""".stripMargin),

    // both stages replayed: project all vectors, shortlist top-32 by
    // projected cosine (ties to corpus_id), exact re-rank on the
    // original float vectors, top-5
    "ann_rp_topk" ->
      (RandomProjectionOracle.matrixCtes +
        """,
          |pv AS MATERIALIZED (SELECT vec_id, embedding AS e,
          |    list_transform(range(0, 16), jj ->
          |      list_sum(list_transform(range(1, 65),
          |        i -> CAST(embedding[i] AS DOUBLE) * mx[jj + 1][i]))
          |      * sqrt(3.0 / 16)) AS p
          |  FROM embeddings CROSS JOIN mm),
          |s AS (SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
          |    list_sum(list_transform(range(1, 17), i -> c.p[i] * q.p[i]))
          |    / (sqrt(list_sum(list_transform(range(1, 17),
          |          i -> c.p[i] * c.p[i])))
          |     * sqrt(list_sum(list_transform(range(1, 17),
          |          i -> q.p[i] * q.p[i])))) AS pcos,
          |    c.e AS ce, q.e AS qe
          |  FROM pv c, (SELECT * FROM pv WHERE vec_id < 8) q
          |  WHERE c.vec_id <> q.vec_id),
          |sh AS (SELECT query_id, corpus_id, ce, qe FROM (
          |    SELECT *, row_number() OVER (PARTITION BY query_id
          |      ORDER BY pcos DESC, corpus_id) AS prank FROM s)
          |  WHERE prank <= 32),
          |x AS (SELECT query_id, corpus_id,
          |    list_sum(list_transform(range(1, 65),
          |      i -> CAST(ce[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))
          |    / (sqrt(list_sum(list_transform(range(1, 65),
          |          i -> CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE))))
          |     * sqrt(list_sum(list_transform(range(1, 65),
          |          i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))))
          |    AS cos
          |  FROM sh),
          |r2 AS (SELECT query_id, corpus_id, cos,
          |    CAST(row_number() OVER (PARTITION BY query_id
          |      ORDER BY cos DESC, corpus_id) AS INT) AS rank
          |  FROM x)
          |SELECT query_id, corpus_id, rank, round(cos, 6) AS cos
          |FROM r2 WHERE rank <= 5""".stripMargin),

    // quantize -> dequantize -> exact cosine top-k, replayed end-to-end
    "ann_int8_topk" ->
      """WITH dq AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x ->
        |      CASE WHEN amax = 0 THEN 0.0
        |           ELSE round(CAST(x AS DOUBLE) / (amax / 127.0))
        |                * (amax / 127.0) END) AS v
        |  FROM (SELECT vec_id, embedding,
        |      list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
        |        AS amax
        |    FROM embeddings) t),
        |q AS (SELECT vec_id AS query_id, v AS qvec FROM dq WHERE vec_id < 8),
        |c AS (SELECT vec_id AS corpus_id, v AS cvec FROM dq),
        |s AS (SELECT query_id, corpus_id,
        |    list_sum(list_transform(range(1, len(cvec) + 1),
        |      i -> cvec[i] * qvec[i]))
        |    / (sqrt(list_sum(list_transform(range(1, len(cvec) + 1),
        |        i -> cvec[i] * cvec[i])))
        |     * sqrt(list_sum(list_transform(range(1, len(qvec) + 1),
        |        i -> qvec[i] * qvec[i]))))
        |    AS cos
        |  FROM c, q WHERE corpus_id <> query_id),
        |r AS (SELECT query_id, corpus_id, cos,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, corpus_id) AS INT) AS rank
        |  FROM s)
        |SELECT query_id, corpus_id, rank, round(cos, 6) AS cos
        |FROM r WHERE rank <= 5""".stripMargin,

    // int8 quantization replay: identical double arithmetic (IEEE) and
    // round-half-away-from-zero in both engines
    "embed_quantize_int8" ->
      """SELECT t.vec_id, round(t.amax / 127.0, 6) AS scale,
        |  CAST(p.i AS INT) AS i,
        |  CAST(CASE WHEN t.amax = 0 THEN 0
        |       ELSE round(CAST(t.embedding[CAST(p.i AS INT) + 1] AS DOUBLE)
        |            / (t.amax / 127.0))
        |       END AS TINYINT) AS q
        |FROM (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
        |      AS amax
        |  FROM embeddings WHERE vec_id < 200) t,
        |  LATERAL (SELECT unnest(range(len(t.embedding))) AS i) p""".stripMargin,

    // PQ encode replay: codebook m = subvectors [m*8+1 .. m*8+8] of the
    // 16 lowest-id vectors; code = argmin squared L2 (ties to lowest j),
    // identical left-to-right double arithmetic on both sides
    "embed_pq_codes" ->
      s"""WITH cb AS ($pqCodebookCte),
         |d AS (
         |  SELECT v.vec_id, cb.m, cb.j,
         |    ${pqSqDist("v")} AS dist
         |  FROM embeddings v, cb WHERE v.vec_id < 200),
         |code AS (
         |  SELECT vec_id, m, j FROM (
         |    SELECT vec_id, m, j,
         |      row_number() OVER (PARTITION BY vec_id, m
         |        ORDER BY dist ASC, j ASC) AS rn
         |    FROM d) WHERE rn = 1)
         |SELECT vec_id, CAST(m AS INT) AS m, CAST(j AS INT) AS code
         |FROM code""".stripMargin,

    // PQ-ADC replay: corpus codes as above, per-query subspace distances
    // to every centroid, adist = the 8 looked-up distances summed in
    // subspace order (list(... ORDER BY m) pins the fold order to the
    // engine's m = 0..7 reduce)
    "ann_pq_topk" -> pqAdcTopkSql,

    // IVFADC full probe == plain PQ-ADC (coarse quantizer cancels):
    // one replay serves the one-shot and the persisted-index twins
    "ann_ivfpq_fullprobe_topk" -> pqAdcTopkSql,
    "ann_ivfpq_index_fullprobe_topk" -> pqAdcTopkSql
  )

  /** Exact brute-force cosine top-5 for the vec_id < 8 query set — the
    * shared oracle of ann_brute_topk and the IVF full-probe twins
    * (probing every cell makes IVF exhaustive, so the fitted quantizer
    * cancels out of the output). */
  private def bruteCosineTopkSql: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
      |    FROM embeddings WHERE vec_id < 8),
      |c AS (SELECT vec_id AS corpus_id, embedding AS cvec FROM embeddings),
      |s AS (SELECT query_id, corpus_id,
      |    list_sum(list_transform(range(1, len(cvec) + 1),
      |      i -> CAST(cvec[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(range(1, len(cvec) + 1),
      |        i -> CAST(cvec[i] AS DOUBLE) * CAST(cvec[i] AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(range(1, len(qvec) + 1),
      |        i -> CAST(qvec[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE)))))
      |    AS cos
      |  FROM c, q WHERE corpus_id <> query_id),
      |r AS (SELECT query_id, corpus_id, cos,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY cos DESC, corpus_id) AS INT) AS rank
      |  FROM s)
      |SELECT query_id, corpus_id, rank, round(cos, 6) AS cos
      |FROM r WHERE rank <= 5""".stripMargin

  /** PQ-ADC replay (corpus codes, per-query LUT, subspace-ordered
    * distance fold) — shared by ann_pq_topk and the IVFADC full-probe
    * twins, which reduce to it when every cell is probed. */
  private def pqAdcTopkSql: String =
    s"""WITH cb AS ($pqCodebookCte),
       |enc AS (
       |  SELECT v.vec_id AS corpus_id, cb.m, cb.j,
       |    ${pqSqDist("v")} AS dist
       |  FROM embeddings v, cb),
       |code AS (
       |  SELECT corpus_id, m, j AS code FROM (
       |    SELECT corpus_id, m, j,
       |      row_number() OVER (PARTITION BY corpus_id, m
       |        ORDER BY dist ASC, j ASC) AS rn
       |    FROM enc) WHERE rn = 1),
       |qd AS (
       |  SELECT q.vec_id AS query_id, cb.m, cb.j,
       |    ${pqSqDist("q")} AS qdist
       |  FROM embeddings q, cb WHERE q.vec_id < 8),
       |s AS (
       |  SELECT c.corpus_id, qd.query_id,
       |    list_sum(list(qd.qdist ORDER BY qd.m)) AS adist
       |  FROM code c JOIN qd ON c.m = qd.m AND c.code = qd.j
       |  WHERE c.corpus_id <> qd.query_id
       |  GROUP BY c.corpus_id, qd.query_id),
       |r AS (SELECT query_id, corpus_id, adist,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY adist ASC, corpus_id) AS INT) AS rank
       |  FROM s)
       |SELECT query_id, corpus_id, rank, round(adist, 6) AS adist
       |FROM r WHERE rank <= 5""".stripMargin

  /** FIM oracle over any (doc_id, text) relation: the exact
    * [[graft.ops.Packing.fimTransform]] replay — md5 draws on the id
    * (selection, cut1, cut2) via the established
    * `CAST('0x' || substr(md5(..), 1, 8) AS BIGINT)` hex bridge, same
    * substring spans, same PSM sentinels. Parameterized on the source
    * relation so the long-id and string-id entries share one replay. */
  private def fimOracleSql(rel: String): String =
    s"""WITH t AS (SELECT doc_id, text,
       |    CAST(length(text) AS BIGINT) AS n,
       |    CAST(('0x' || substr(md5('graft_fim' ||
       |      CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h0,
       |    CAST(('0x' || substr(md5('graft_fim1' ||
       |      CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h1,
       |    CAST(('0x' || substr(md5('graft_fim2' ||
       |      CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h2
       |  FROM $rel),
       |c1t AS (SELECT doc_id, text, n, h0, h2,
       |    1 + CAST(floor((h1 % 97) * (n - 2) / 97.0) AS BIGINT) AS c1
       |  FROM t),
       |c2t AS (SELECT doc_id, text, n, h0, c1,
       |    c1 + 1 + CAST(floor((h2 % 89) * (n - c1 - 1) / 89.0)
       |      AS BIGINT) AS c2
       |  FROM c1t)
       |SELECT doc_id,
       |  CASE WHEN h0 % 2 = 0 AND n >= 4 THEN 1 ELSE 0 END
       |    AS fim_applied,
       |  CASE WHEN h0 % 2 = 0 AND n >= 4 THEN
       |    '<PRE>' || substr(text, 1, CAST(c1 AS INT)) ||
       |    '<SUF>' || substr(text, CAST(c2 AS INT) + 1) ||
       |    '<MID>' || substr(text, CAST(c1 AS INT) + 1,
       |      CAST(c2 - c1 AS INT))
       |  ELSE text END AS text_out
       |FROM c2t""".stripMargin

  /** BM25 oracle: replays TextSearch.bm25TopK for terms
    * (dup, key, vector), k1=1.2, b=0.75, k=25 — df/N/avgdl computed in
    * SQL from the same token stream, idf snapped to micro-nats, and the
    * per-term contributions added in the SAME left-associated order
    * with the SAME arithmetic shape (idf * (tf * (k1+1))) / (tf + k1 *
    * ((1-b) + b * (dl / avgdl))). Constants embedded via exact
    * round-trip literals. */
  /** The BM25 replay CTE chain (WITH-body, no `WITH` keyword) ending in
    * relation `r(doc_id, dl, score, rn)` — shared by the bm25 oracles
    * and the hybrid-fusion oracle. */
  private def bm25RankedCte: String = {
    import OracleBuilders.d
    val (k1, b) = (1.2, 0.75)
    val terms = Seq("dup", "key", "vector")
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(sum(CASE WHEN t = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS tf_$i"
    }.mkString(",\n        |    ")
    val dfCols = terms.indices.map(i =>
      s"CAST(sum(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$i")
      .mkString(", ")
    val idfCols = terms.indices.map(i =>
      s"CAST(round(ln(((SELECT n FROM n) - df_$i + 0.5) / (df_$i + 0.5)) " +
        s"* 1000000) AS BIGINT) / 1000000.0 AS idf_$i").mkString(",\n        |    ")
    val contribs = terms.indices.map { i =>
      s"""CASE WHEN coalesce(tf_$i, 0) > 0
         |      THEN (c.idf_$i * (coalesce(tf_$i, 0) * ${d(k1 + 1.0)}))
         |        / (coalesce(tf_$i, 0) + ${d(k1)} * (${d(1.0 - b)}
         |          + ${d(b)} * (s.dl / c.avgdl)))
         |      ELSE 0.0 END""".stripMargin
    }.mkString("\n        |    + ")
    s"""toks AS (SELECT doc_id,
       |    unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
       |      t -> len(t) > 0)) AS t
       |  FROM documents),
       |n AS (SELECT count(*) AS n FROM documents),
       |tf AS (SELECT doc_id,
       |    $tfCols
       |  FROM toks WHERE t IN (${terms.map(t => s"'$t'").mkString(", ")})
       |  GROUP BY doc_id),
       |dls AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
       |dfs AS (SELECT $dfCols FROM tf),
       |c AS (SELECT
       |    CAST((SELECT count(*) FROM toks) AS DOUBLE)
       |      / (SELECT n FROM n) AS avgdl,
       |    $idfCols
       |  FROM dfs),
       |s AS (SELECT d.doc_id, coalesce(dls.dl, 0) AS dl,
       |    ${terms.indices.map(i => s"tf.tf_$i").mkString(", ")}
       |  FROM documents d
       |  LEFT JOIN dls ON d.doc_id = dls.doc_id
       |  LEFT JOIN tf ON d.doc_id = tf.doc_id),
       |scored AS (SELECT s.doc_id, s.dl,
       |    $contribs AS score
       |  FROM s, c),
       |r AS (SELECT doc_id, dl, score,
       |    row_number() OVER (ORDER BY score DESC, doc_id) AS rn
       |  FROM scored)""".stripMargin
  }

  private def bm25OracleSql(k: Int): String =
    s"""WITH $bm25RankedCte
       |SELECT doc_id, dl, round(score, 6) AS score FROM r
       |WHERE rn <= $k""".stripMargin

  /** IR-metrics replay: the exact-cosine top-10 ranking scored against
    * same-label qrels, with the SAME micro-unit gain/RR literals the
    * engine embeds (generated from RankingMetrics' functions) — every
    * aggregate is an exact BIGINT sum, ratios single IEEE divisions. */
  private def irMetricsOracleSql: String = {
    val k = 10
    val gains = (1 to k).map(graft.ops.RankingMetrics.dcgGainMicro)
    val idcgPrefix = gains.scanLeft(0L)(_ + _).tail
    val rrs = (1 to k).map(graft.ops.RankingMetrics.rrMicro)
    def arms(vals: Seq[Long]) = vals.zipWithIndex
      .map { case (v, i) => s"WHEN ${i + 1} THEN CAST($v AS BIGINT)" }
      .mkString(" ")
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec,
       |    label AS qlabel FROM embeddings WHERE vec_id < 8),
       |c AS (SELECT vec_id AS corpus_id, embedding AS cvec
       |  FROM embeddings),
       |s AS (SELECT query_id, corpus_id,
       |    list_sum(list_transform(range(1, len(cvec) + 1),
       |      i -> CAST(cvec[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE)))
       |    / (sqrt(list_sum(list_transform(range(1, len(cvec) + 1),
       |        i -> CAST(cvec[i] AS DOUBLE) * CAST(cvec[i] AS DOUBLE))))
       |     * sqrt(list_sum(list_transform(range(1, len(qvec) + 1),
       |        i -> CAST(qvec[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE)))))
       |    AS cos
       |  FROM c, q WHERE corpus_id <> query_id),
       |topk AS (SELECT query_id, corpus_id AS doc_id, rank FROM (
       |    SELECT query_id, corpus_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY cos DESC, corpus_id) AS rank
       |    FROM s) WHERE rank <= $k),
       |qrels AS (SELECT q.query_id, e.vec_id AS doc_id
       |  FROM embeddings e JOIN q ON e.label = q.qlabel
       |    AND e.vec_id <> q.query_id),
       |hits AS (SELECT t.query_id, t.rank,
       |    (qr.doc_id IS NOT NULL) AS rel
       |  FROM topk t LEFT JOIN qrels qr
       |    ON t.query_id = qr.query_id AND t.doc_id = qr.doc_id),
       |pq AS (SELECT query_id,
       |    CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_rel_top,
       |    CAST(sum(CASE WHEN rel THEN
       |        (CASE rank ${arms(gains)} ELSE 0 END) ELSE 0 END)
       |      AS BIGINT) AS dcg_micro,
       |    CAST(coalesce(min(CASE WHEN rel THEN rank END), 0) AS INT)
       |      AS first_rel
       |  FROM hits GROUP BY query_id),
       |tot AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
       |  FROM qrels GROUP BY query_id),
       |m AS (SELECT p.query_id, p.n_rel_top, p.dcg_micro,
       |    coalesce(t.n_rel, 0) AS n_rel,
       |    CASE p.first_rel ${arms(rrs)} ELSE CAST(0 AS BIGINT) END
       |      AS mrr_micro,
       |    CASE WHEN coalesce(t.n_rel, 0) >= $k
       |      THEN CAST(${idcgPrefix.last} AS BIGINT)
       |      ELSE (CASE coalesce(t.n_rel, 0) ${arms(idcgPrefix)}
       |            ELSE CAST(0 AS BIGINT) END) END AS idcg_micro
       |  FROM pq p LEFT JOIN tot t ON p.query_id = t.query_id)
       |SELECT query_id, n_rel_top, dcg_micro, n_rel,
       |  round(CAST(n_rel_top AS DOUBLE) / $k, 6) AS p_at_k,
       |  round(CASE WHEN n_rel > 0
       |    THEN CAST(n_rel_top AS DOUBLE) / n_rel ELSE 0.0 END, 6)
       |    AS recall_at_k,
       |  mrr_micro, idcg_micro,
       |  round(CASE WHEN idcg_micro > 0
       |    THEN CAST(dcg_micro AS DOUBLE) / idcg_micro ELSE 0.0 END, 6)
       |    AS ndcg
       |FROM m""".stripMargin
  }

  /** RRF fusion replay: the BM25 chain's top-25 as the lexical list,
    * the exact-cosine top-25 of doc 7's embedding as the vector list,
    * fused with 1/(60+rank) in fixed (lex, vec) addition order — the
    * identical IEEE double chain rrfFuse builds. */
  private def hybridRrfOracleSql: String =
    s"""WITH $bm25RankedCte,
       |lex AS (SELECT doc_id, CAST(rn AS INT) AS lex_rank FROM r
       |  WHERE rn <= 25),
       |q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 7),
       |cvecs AS (SELECT vec_id AS corpus_id, embedding AS cvec
       |  FROM embeddings WHERE vec_id <> 7),
       |cs AS (SELECT corpus_id,
       |    list_sum(list_transform(range(1, len(cvec) + 1),
       |      i -> CAST(cvec[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE)))
       |    / (sqrt(list_sum(list_transform(range(1, len(cvec) + 1),
       |        i -> CAST(cvec[i] AS DOUBLE) * CAST(cvec[i] AS DOUBLE))))
       |     * sqrt(list_sum(list_transform(range(1, len(qvec) + 1),
       |        i -> CAST(qvec[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE)))))
       |    AS cos
       |  FROM cvecs, q),
       |vec AS (SELECT corpus_id AS doc_id, CAST(vr AS INT) AS vec_rank
       |  FROM (SELECT corpus_id,
       |      row_number() OVER (ORDER BY cos DESC, corpus_id) AS vr
       |    FROM cs) WHERE vr <= 25),
       |fused AS (SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id,
       |    lex_rank, vec_rank,
       |    coalesce(1.0 / (60.0 + lex_rank), 0.0)
       |      + coalesce(1.0 / (60.0 + vec_rank), 0.0) AS rrf
       |  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id),
       |ranked AS (SELECT doc_id, lex_rank, vec_rank, rrf,
       |    row_number() OVER (ORDER BY rrf DESC, doc_id) AS frn
       |  FROM fused)
       |SELECT doc_id, lex_rank, vec_rank, round(rrf, 6) AS rrf
       |FROM ranked WHERE frn <= 20""".stripMargin

  /** DSIR weights CTE chain ending in relation `dw(doc_id, n_tokens,
    * weight_micro)` — the full importanceWeights replay: md5 hex8
    * buckets mod 256, +1 Laplace smoothing, per-bucket micro-nat
    * log-ratio as BIGINT, per-doc integer sum + n_tokens * g. */
  private def dsirWeightsCte: String =
    """toks AS (SELECT doc_id, lang,
      |    unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |      t -> len(t) > 0)) AS t
      |  FROM documents),
      |hb AS (SELECT doc_id, lang,
      |    CAST(CAST(list_sum(list_transform(range(0, 8), k ->
      |      CAST(strpos('0123456789abcdef',
      |          substr(md5(t), 8 - CAST(k AS INT), 1)) - 1 AS BIGINT)
      |        * (CAST(1 AS BIGINT) << CAST(4 * k AS INT))))
      |      AS BIGINT) % 256 AS INT) AS bucket
      |  FROM toks),
      |cr AS (SELECT bucket, count(*) AS cr FROM hb GROUP BY bucket),
      |ct AS (SELECT bucket, count(*) AS ct FROM hb WHERE lang = 'en'
      |  GROUP BY bucket),
      |lr AS (SELECT CAST(k.b AS INT) AS bucket,
      |    CAST(round((ln(coalesce(ct.ct, 0) + 1.0)
      |      - ln(coalesce(cr.cr, 0) + 1.0)) * 1000000) AS BIGINT) AS lrm
      |  FROM range(0, 256) k(b)
      |  LEFT JOIN cr ON k.b = cr.bucket
      |  LEFT JOIN ct ON k.b = ct.bucket),
      |gm AS (SELECT CAST(round((
      |    ln((SELECT coalesce(sum(cr), 0) FROM cr) + 256.0)
      |    - ln((SELECT coalesce(sum(ct), 0) FROM ct) + 256.0)) * 1000000)
      |  AS BIGINT) AS g),
      |per AS (SELECT hb.doc_id, count(*) AS n_tokens,
      |    CAST(sum(lr.lrm) AS BIGINT) AS slr
      |  FROM hb JOIN lr USING (bucket) GROUP BY hb.doc_id),
      |dw AS (SELECT d.doc_id,
      |    coalesce(per.n_tokens, 0) AS n_tokens,
      |    coalesce(per.slr + per.n_tokens * (SELECT g FROM gm), 0)
      |      AS weight_micro
      |  FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id)""".stripMargin

  /** Squared-L2 between embedding lists `$a` and `$b` — the
    * left-to-right list_sum fold matching Similarity's zip_with/
    * aggregate assignment and probe metric. */
  private def l2Sql(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, len($a) + 1), i ->
       |      (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))
       |      * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))))""".stripMargin

  /** Cosine between embedding lists `$a` and `$b` — the spelling every
    * ANN oracle shares (left-to-right sums, double math). */
  private def cosSql(a: String, b: String): String =
    s"""(list_sum(list_transform(range(1, len($a) + 1),
       |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))
       |    / (sqrt(list_sum(list_transform(range(1, len($a) + 1),
       |        i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))))
       |     * sqrt(list_sum(list_transform(range(1, len($b) + 1),
       |        i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))))))""".stripMargin

  /** Deterministic-IVF replay CTEs (Similarity.buildIvfIndex with
    * lowestIdCenters): `ctr` = the 16 lowest-id embeddings of the rows
    * satisfying `centerWhere` (cell = rank order, matching
    * lowestIdCenters' ORDER BY id), `asg` = argmin-L2 cell of every
    * corpus vector (ties to the lowest cell — the assignCellL2 struct-
    * min), `probe` = each anchor's 4 nearest cells (anchors = rows
    * satisfying `anchorWhere`). */
  private def ivfDetCtes(centerWhere: String, anchorWhere: String): String =
    s"""ctr AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
       |      AS cell, embedding AS cvec
       |  FROM (SELECT vec_id, embedding FROM embeddings
       |    WHERE $centerWhere ORDER BY vec_id LIMIT 16)),
       |ad AS (SELECT e.vec_id AS corpus_id, e.embedding AS cvec,
       |    e.label AS c_label, c.cell,
       |    ${l2Sql("e.embedding", "c.cvec")} AS dist
       |  FROM embeddings e, ctr c),
       |asg AS (SELECT corpus_id, cvec, c_label, cell FROM (
       |  SELECT corpus_id, cvec, c_label, cell,
       |    row_number() OVER (PARTITION BY corpus_id
       |      ORDER BY dist, cell) AS rn FROM ad) WHERE rn = 1),
       |pd AS (SELECT q.vec_id AS query_id, q.embedding AS qvec,
       |    q.label AS q_label, c.cell,
       |    ${l2Sql("q.embedding", "c.cvec")} AS dist
       |  FROM embeddings q, ctr c WHERE $anchorWhere),
       |probe AS (SELECT query_id, qvec, q_label, cell FROM (
       |  SELECT query_id, qvec, q_label, cell,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY dist, cell) AS rn FROM pd) WHERE rn <= 4)""".stripMargin

  /** The ANN miner oracles: candidates = probed-cell members with the
    * label predicate, exact cosine rank within (cos DESC, corpus_id). */
  private def annMinerOracle(labelOp: String, withLabel: Boolean): String = {
    val lbl = if (withLabel) ", neg_label" else ""
    s"""WITH ${ivfDetCtes("TRUE", "TRUE")},
       |s AS (SELECT p.query_id, a.corpus_id, a.c_label AS neg_label,
       |    ${cosSql("a.cvec", "p.qvec")} AS cos
       |  FROM asg a JOIN probe p ON a.cell = p.cell
       |  WHERE a.corpus_id <> p.query_id AND a.c_label $labelOp p.q_label),
       |r AS (SELECT query_id, corpus_id, neg_label, cos,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, corpus_id) AS INT) AS rank
       |  FROM s)
       |SELECT query_id, corpus_id, rank, round(cos, 6) AS cos$lbl
       |FROM r WHERE rank <= 5""".stripMargin
  }

  /** ann_ivf_index_upsert: the appended index must answer EXACTLY like
    * an index built over the full corpus — same centers (the build
    * slice's 16 lowest ids), same assignment, same probe, exact cosine
    * rank. */
  private def ivfUpsertOracle: String =
    s"""WITH ${ivfDetCtes("vec_id % 5 <> 0", "q.vec_id < 8")},
       |s AS (SELECT p.query_id, a.corpus_id,
       |    ${cosSql("a.cvec", "p.qvec")} AS cos
       |  FROM asg a JOIN probe p ON a.cell = p.cell
       |  WHERE a.corpus_id <> p.query_id),
       |r AS (SELECT query_id, corpus_id, cos,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, corpus_id) AS INT) AS rank
       |  FROM s)
       |SELECT query_id, corpus_id, rank, round(cos, 6) AS cos
       |FROM r WHERE rank <= 5""".stripMargin

  /** Shared PQ codebook CTE body: (m 0..7, j = seed vec_id < 16,
    * ctr = 8-double subvector). */
  private def pqCodebookCte: String =
    """SELECT m.m, CAST(e.vec_id AS INT) AS j,
      |    list_transform(range(1, 9),
      |      i -> CAST(e.embedding[CAST(m.m * 8 + i AS INT)] AS DOUBLE)) AS ctr
      |  FROM embeddings e,
      |    (SELECT CAST(unnest(range(8)) AS INT) AS m) m
      |  WHERE e.vec_id < 16""".stripMargin

  /** Squared L2 between `tbl`.embedding's m-th subvector and cb.ctr —
    * the left-to-right list_sum matching Similarity.sqDistLit's fold. */
  private def pqSqDist(tbl: String): String =
    s"""list_sum(list_transform(range(1, 9), i ->
       |      (CAST($tbl.embedding[CAST(cb.m * 8 + i AS INT)] AS DOUBLE) - cb.ctr[i])
       |      * (CAST($tbl.embedding[CAST(cb.m * 8 + i AS INT)] AS DOUBLE) - cb.ctr[i])))""".stripMargin

  /** Brute-force all-pairs shingle-Jaccard CTE chain over the planted
    * corpus — the `p` relation carries every (id_a < id_b, jac) pair.
    * Shared by the pair oracles and the clustering oracle. */
  private def dedupPairCtes: String =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000,
      |    'zzz ' || substr(text, strpos(text, ' ') + 1)
      |  FROM documents WHERE doc_id % 10 = 0),
      |toks AS (SELECT doc_id,
      |    list_filter(string_split_regex(trim(text), '\s+'),
      |      t -> len(t) > 0) AS ts
      |  FROM corpus),
      |sh AS (SELECT doc_id AS id, list_distinct(
      |    CASE WHEN len(ts) >= 3
      |      THEN list_transform(range(0, len(ts) - 2),
      |        i -> ts[i + 1] || ' ' || ts[i + 2] || ' ' || ts[i + 3])
      |      ELSE [array_to_string(ts, ' ')] END) AS shingles
      |  FROM toks),
      |p AS (SELECT a.id AS id_a, b.id AS id_b,
      |    CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
      |      / len(list_distinct(a.shingles || b.shingles)) AS jac
      |  FROM sh a, sh b WHERE a.id < b.id)""".stripMargin

  /** Shared by dedup_ngram_jaccard and dedup_minhash_lsh (see above). */
  private def ngramJaccardOracle: String =
    s"""WITH $dedupPairCtes
       |SELECT id_a, id_b, round(jac, 4) AS jaccard FROM p
       |WHERE jac >= 0.5""".stripMargin

  /** dedup_simhash: bit-exact DuckDB replay of the whole SimHash
    * pipeline (Dedup.simhashSignatures/simhashNearDups) — possible
    * because token hashes are md5-derived (both engines agree on md5;
    * xxhash64 has no DuckDB twin, which kept this entry rows-only
    * until round 4). Token hash = first 15 hex chars of md5 decoded
    * base-16 (exact BIGINT digit arithmetic, no doubles); signatures =
    * 60 per-bit majority votes; candidates = pairs sharing any of the
    * 4 x 15-bit blocks, EXACTLY like the op (blocking is part of the
    * operator's semantics, so the oracle replicates it rather than
    * brute-forcing hamming <= 8 over all pairs). */
  /** Shared lang-id replay (stopword scores + argmax cascade) for
    * text_lang_id and the confusion matrix. */
  private def langIdOracleSql: String =
    """WITH t AS (SELECT doc_id, lang AS lang_label,
        |    ' ' || lower(text) || ' ' AS p,
        |    regexp_matches(text, '[\x{4e00}-\x{9fff}]') AS zh
        |  FROM documents),
        |s AS (SELECT doc_id, lang_label, zh,
        |    (CASE WHEN p LIKE '% the %' THEN 1 ELSE 0 END) +
        |    (CASE WHEN p LIKE '% and %' THEN 1 ELSE 0 END) +
        |    (CASE WHEN p LIKE '% of %' THEN 1 ELSE 0 END) +
        |    (CASE WHEN p LIKE '% is %' THEN 1 ELSE 0 END) AS en,
        |    (CASE WHEN p LIKE '% el %' THEN 1 ELSE 0 END) +
        |    (CASE WHEN p LIKE '% los %' THEN 1 ELSE 0 END) +
        |    (CASE WHEN p LIKE '% que %' THEN 1 ELSE 0 END) +
        |    (CASE WHEN p LIKE '% es %' THEN 1 ELSE 0 END) AS es,
        |    (CASE WHEN p LIKE '% le %' THEN 1 ELSE 0 END) +
        |    (CASE WHEN p LIKE '% les %' THEN 1 ELSE 0 END) +
        |    (CASE WHEN p LIKE '% est %' THEN 1 ELSE 0 END) +
        |    (CASE WHEN p LIKE '% une %' THEN 1 ELSE 0 END) AS fr,
        |    (CASE WHEN p LIKE '% der %' THEN 1 ELSE 0 END) +
        |    (CASE WHEN p LIKE '% und %' THEN 1 ELSE 0 END) +
        |    (CASE WHEN p LIKE '% ist %' THEN 1 ELSE 0 END) +
        |    (CASE WHEN p LIKE '% das %' THEN 1 ELSE 0 END) AS de
        |  FROM t)
        |SELECT doc_id, lang_label,
        |  CASE WHEN zh THEN 'zh'
        |    WHEN en >= es AND en >= fr AND en >= de AND en > 0 THEN 'en'
        |    WHEN es >= fr AND es >= de AND es > 0 THEN 'es'
        |    WHEN fr >= de AND fr > 0 THEN 'fr'
        |    WHEN de > 0 THEN 'de'
        |    ELSE 'und' END AS lang_pred
        |FROM s""".stripMargin

  private def simhashOracle: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000,
      |    'zzz ' || substr(text, strpos(text, ' ') + 1)
      |  FROM documents WHERE doc_id % 10 = 0),
      |toks AS (SELECT doc_id,
      |    unnest(list_filter(string_split_regex(trim(text), '\s+'),
      |      t -> len(t) > 0)) AS t
      |  FROM corpus),
      |hv AS (SELECT doc_id,
      |    CAST(list_sum(list_transform(range(0, 15), k ->
      |      CAST(strpos('0123456789abcdef', substr(md5(t), 15 - CAST(k AS INT), 1)) - 1
      |        AS BIGINT) * (CAST(1 AS BIGINT) << CAST(4 * k AS INT))))
      |      AS BIGINT) AS h
      |  FROM toks),
      |bits AS (SELECT doc_id, CAST(bs.b AS INT) AS b,
      |    SUM(CASE WHEN (h >> CAST(bs.b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS v
      |  FROM hv, (SELECT unnest(range(0, 60)) AS b) bs
      |  GROUP BY doc_id, bs.b),
      |sig0 AS (SELECT doc_id,
      |    CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
      |      AS BIGINT) AS sim
      |  FROM bits GROUP BY doc_id),
      |sig AS (SELECT c.doc_id, COALESCE(s.sim, 0) AS sim
      |  FROM (SELECT DISTINCT doc_id FROM corpus) c
      |  LEFT JOIN sig0 s ON c.doc_id = s.doc_id),
      |blk AS (SELECT doc_id, sim, CAST(bs.b AS INT) AS block_id,
      |    (sim >> CAST(15 * bs.b AS INT)) & 32767 AS block_bits
      |  FROM sig, (SELECT unnest([0, 1, 2, 3]) AS b) bs),
      |pairs AS (SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
      |    a.sim AS sim_a, c.sim AS sim_b
      |  FROM blk a JOIN blk c
      |    ON a.block_id = c.block_id AND a.block_bits = c.block_bits
      |    AND a.doc_id < c.doc_id)
      |SELECT id_a, id_b,
      |  CAST(bit_count(xor(sim_a, sim_b)) AS INT) AS hamming
      |FROM pairs WHERE bit_count(xor(sim_a, sim_b)) <= 8""".stripMargin

  /** dedup_clusters: transitive closure of the >= 0.5 pair graph, each
    * node labeled with its component's minimum id (the recursive CTE
    * twin of Dedup.clusterDuplicates' min-label propagation). */
  private def dedupClustersOracle: String =
    s"""WITH RECURSIVE $dedupPairCtes,
       |dup AS (SELECT id_a, id_b FROM p WHERE jac >= 0.5),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM dup
       |  UNION SELECT id_b, id_a FROM dup),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |reach(id, lab) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.id)
       |SELECT id, min(lab) AS cluster_id FROM reach GROUP BY id""".stripMargin

  /** split_leakage_safe: the dedup_clusters closure feeding the split
    * hash — assignment keyed on coalesce(cluster min id, own id), so
    * every component provably shares one split. */
  private def splitLeakageSafeOracle: String =
    s"""WITH RECURSIVE $dedupPairCtes,
       |dup AS (SELECT id_a, id_b FROM p WHERE jac >= 0.5),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM dup
       |  UNION SELECT id_b, id_a FROM dup),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |reach(id, lab) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.id),
       |cl AS (SELECT id, min(lab) AS cluster_id FROM reach GROUP BY id),
       |rep AS (SELECT c.doc_id,
       |    coalesce(cl.cluster_id, c.doc_id) AS rep_id
       |  FROM corpus c LEFT JOIN cl ON c.doc_id = cl.id)
       |SELECT doc_id, rep_id,
       |  CASE WHEN substr(md5('graft' || CAST(rep_id AS VARCHAR)), 1, 8)
       |      < '${graft.ops.Sampling.thresholdHex(0.8)}' THEN 'train'
       |    WHEN substr(md5('graft' || CAST(rep_id AS VARCHAR)), 1, 8)
       |      < '${graft.ops.Sampling.thresholdHex(0.8 + 0.1)}' THEN 'val'
       |    ELSE 'test' END AS split
       |FROM rep""".stripMargin

  /** dedup_keep_best: one survivor per cluster, chosen by
    * (length(text) DESC, doc_id) instead of min-id — the closure CTEs
    * of dedup_clusters plus a singleton fallback and a keeper window. */
  private def dedupKeepBestOracle: String =
    s"""WITH RECURSIVE $dedupPairCtes,
       |dup AS (SELECT id_a, id_b FROM p WHERE jac >= 0.5),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM dup
       |  UNION SELECT id_b, id_a FROM dup),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |reach(id, lab) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.id),
       |cl AS (SELECT id, min(lab) AS cluster_id FROM reach GROUP BY id),
       |lab AS (SELECT c.doc_id, c.text,
       |    coalesce(cl.cluster_id, c.doc_id) AS cluster_id
       |  FROM corpus c LEFT JOIN cl ON c.doc_id = cl.id)
       |SELECT doc_id FROM (
       |  SELECT doc_id, row_number() OVER (PARTITION BY cluster_id
       |    ORDER BY length(text) DESC, doc_id) AS rn
       |  FROM lab) WHERE rn = 1""".stripMargin

  /** dedup_drop_near: the corpus rows that SURVIVE cluster dedup — every
    * unpaired row plus each component's minimum id (clusters via the
    * same recursive-CTE closure as dedup_clusters). */
  private def dedupDropNearOracle: String =
    s"""WITH RECURSIVE $dedupPairCtes,
       |dup AS (SELECT id_a, id_b FROM p WHERE jac >= 0.5),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM dup
       |  UNION SELECT id_b, id_a FROM dup),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |reach(id, lab) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.id),
       |losers AS (SELECT id FROM reach GROUP BY id
       |  HAVING id <> min(lab))
       |SELECT doc_id FROM corpus
       |WHERE doc_id NOT IN (SELECT id FROM losers)""".stripMargin
}
