package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level term statistics for training-data analysis.
  *
  * TF-IDF keyword extraction surfaces each document's most DISTINCTIVE
  * terms (what is this doc about, relative to the corpus) — the
  * standard tool for domain analysis, cluster labeling, and spot-
  * checking a curation pipeline's source mix. The idf factor here is
  * the raw ratio N/df rather than the textbook ln(N/df): ranking is
  * identical (ln is monotone), and the ratio keeps every arithmetic
  * step an exact IEEE double op (integer-valued products, one divide)
  * that the DuckDB oracle replays bit-for-bit — ln's libm rounding is
  * not portable across engines.
  */
object TermStats {

  /** Top-k terms per document by tf * N / df, ties broken on the term
    * itself. Tokenization is the engine-wide whitespace tokenizer
    * ([[graft.functions.TextFunctions.tokens]], the native kernel).
    *
    * Scale shape: explode carries (doc_id, term) pairs only; both
    * aggregates are partial (map-side combined); the doc-frequency
    * join keys on term — vocab-sized, NOT broadcast (a 100 TB corpus
    * vocabulary does not fit one executor); the final top-k is a
    * per-doc rank window. One column-pruned count() action for N —
    * a single long on the driver.
    */
  /** Pairwise content overlap between corpus SOURCES: Jaccard over each
    * source's distinct n-gram shingle set — the redundancy/contamination
    * matrix a curation run consults before choosing mixture weights
    * (two highly-overlapping sources should not both be upweighted).
    *
    * Scale shape: the distinct (source, shingle) set is the only big
    * intermediate (shuffle-keyed on both columns, partial-combined);
    * the intersection self-join keys on the shingle, where each group
    * is at most |sources| rows, so the pair explosion is bounded by
    * |sources| choose 2 per shingle — never all-pairs of documents.
    * The set feeds three consumers (sizes + both join sides), so it is
    * persisted and registry-released. Output is |sources|^2 rows: tiny.
    */
  def sourceOverlap(df: DataFrame, sourceCol: String = "source",
                    textCol: String = "text", n: Int = 3): DataFrame = {
    val sh = df.select(col(sourceCol).as("src"),
        explode(graft.functions.TextFunctions.wordShingles(col(textCol), n))
          .as("s"))
      .distinct()
      .transform(CacheRegistry.persist)
    val sizes = sh.groupBy("src").agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col("src").as("src_a"), col("n_sh").as("na")), "src_a")
      .join(sizes.select(col("src").as("src_b"), col("n_sh").as("nb")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_common"),
        round(col("n_common").cast("double")
          / (col("na") + col("nb") - col("n_common")).cast("double"), 6)
          .as("jaccard"))
  }

  def tfidfTopTerms(df: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", k: Int = 3): DataFrame = {
    val nDocs = df.count()
    val toks = df.select(col(idCol).as("doc_id"),
      explode(graft.functions.TextFunctions.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, Seq("term"))
      .withColumn("score",
        col("tf").cast("double") * lit(nDocs.toDouble) / col("df").cast("double"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("rank"),
        round(col("score"), 6).as("score"))
  }

  /** Per-document LM quality score: the average smoothed bigram
    * transition probability avg((c12+1)/(c1+V)) over the document's
    * token bigrams, where c12 is the corpus count of the bigram, c1 the
    * corpus count of its head token (as a bigram head) and V the
    * distinct-token vocabulary size — the CCNet-style "train an n-gram
    * LM on a reference corpus, keep documents it finds predictable"
    * quality gate (reference analog: the quality-scoring stage next to
    * [[graft.functions.TextFunctions.qualityScore]]; gibberish and
    * boilerplate-free spam score near the 1/(c1+V) smoothing floor).
    *
    * Deliberately NO logarithm: perplexity's ln ranks identically
    * (monotone) but libm rounding is not portable across engines,
    * while every step here — integer counts, one IEEE divide, a short
    * per-doc mean — replays exactly in the DuckDB oracle.
    *
    * `train` is the reference corpus the counts come from (defaults to
    * `df` itself — score-against-self). At 100 TB the CCNet recipe is
    * `train = Sampling.hashSample(corpus, ...)`: the count tables stay
    * bounded by the sample's vocabulary while the full corpus streams
    * through the scoring join. Bigrams unseen in the training side get
    * the (0+1)/(c1+V) smoothing mass via the left joins.
    *
    * Scale shape: both count aggregates are partial (map-side
    * combined), keyed on the bigram / head token; the scoring join
    * keys on the bigram — vocabulary-sized, NOT broadcast (an open-
    * vocabulary bigram table does not fit one executor; AQE broadcasts
    * it when a sampled train side makes it small). The vocabulary size
    * V is a one-row aggregate, broadcast by construction. When scoring
    * against itself the exploded bigram stream feeds both the count
    * build and the scoring join, so it is persisted and
    * registry-released ([[CacheRegistry]]).
    */
  def bigramLmScore(df: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text",
                    train: Option[DataFrame] = None): DataFrame = {
    import graft.functions.TextFunctions
    val selfTrain = train.isEmpty
    val bg = {
      val raw = df.select(col(idCol).as("doc_id"),
        explode(TextFunctions.wordShingles(lower(col(textCol)), 2)).as("b"))
      if (selfTrain) CacheRegistry.persist(raw) else raw
    }
    val trainDf = train.getOrElse(df)
    val trainBg =
      if (selfTrain) bg.select(col("b"))
      else trainDf.select(
        explode(TextFunctions.wordShingles(lower(col(textCol)), 2)).as("b"))
    val cnt = trainBg.groupBy("b").agg(count(lit(1)).as("c12"))
    val hd = cnt.groupBy(substring_index(col("b"), " ", 1).as("w"))
      .agg(sum(col("c12")).as("c1"))
    val vocab = trainDf.select(
        explode(TextFunctions.tokens(lower(col(textCol)))).as("t"))
      .agg(count_distinct(col("t")).as("v"))
    bg.join(cnt, Seq("b"), "left")
      .withColumn("w", substring_index(col("b"), " ", 1))
      .join(hd, Seq("w"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        avg((coalesce(col("c12"), lit(0L)) + lit(1L)) /
          (coalesce(col("c1"), lit(0L)) + col("v"))).as("lm_score"))
  }

  /** Collocation discovery: the top-`k` adjacent token pairs by PMI
    * lift c_ab·N / (c_a·c_b) — the corpus-statistics op behind
    * multi-word-expression vocabularies ("new york", "machine
    * learning") and phrase-aware tokenizer seeding (Mikolov et al.
    * 2013's word2vec phrases use exactly this score with a discount;
    * `minCount` is the discount's job here). Pairs above lift 1 co-
    * occur more than independence predicts; ln(lift) is textbook PMI
    * and ranks identically (monotone), so — the [[bigramLmScore]]
    * convention — NO logarithm: exact long counts cast to double, two
    * products and one divide in fixed order, replayed exactly by the
    * oracle. Casting BEFORE the products keeps 100 TB counts (c·N up
    * to ~1e26) out of long-overflow territory, which ANSI mode would
    * throw on.
    *
    * Scale shape: one token pass (unigram counts) + one shingle pass
    * (bigram counts), both map-side-combined partial aggs keyed by the
    * term; the `minCount` filter cuts the long tail BEFORE the two
    * vocabulary-sized count joins; top-k is TakeOrderedAndProject. N
    * is a one-row aggregate. Nothing corpus-sized joins. */
  def pmiCollocations(df: DataFrame, k: Int, minCount: Long = 5,
                      textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions
    require(k > 0 && minCount >= 1)
    // persisted: the unigram counts feed BOTH pair joins and the total
    // — without the cache each reference re-runs the corpus tokenize
    // (3 scans instead of 1; caught by the plan audit)
    val uni = CacheRegistry.persist(df.select(
        explode(TextFunctions.tokens(lower(col(textCol)))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c")))
    val total = uni.agg(sum(col("c")).as("n"))
    val bg = df.select(
        explode(TextFunctions.wordShingles(lower(col(textCol)), 2)).as("b"))
      .groupBy("b").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
      .withColumn("w1", substring_index(col("b"), " ", 1))
      .withColumn("w2", substring_index(col("b"), " ", -1))
    bg.join(uni.select(col("t").as("w1"), col("c").as("c_a")), Seq("w1"))
      .join(uni.select(col("t").as("w2"), col("c").as("c_b")), Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("b"), col("c_ab"), col("c_a"), col("c_b"),
        (col("c_ab").cast("double") * col("n").cast("double") /
          (col("c_a").cast("double") * col("c_b").cast("double")))
          .as("lift"))
      .orderBy(col("lift").desc, col("b").asc)
      .limit(k)
  }

  /** First-iteration BPE merge statistics: the corpus-weighted count of
    * every adjacent symbol pair, where the initial symbol vocabulary is
    * single characters — exactly the quantity byte-pair-encoding
    * tokenizer training maximizes on its first merge (Sennrich et al.
    * 2016). A curation pipeline runs this to train/refresh the
    * tokenizer on the corpus it just built (reference analog: the
    * vocabulary/stats passes next to the quality stage).
    *
    * Scale shape: the corpus token stream is aggregated ONCE into the
    * distinct-word frequency table (partial agg, keyed on the word);
    * the character-pair explode then runs over the VOCABULARY — orders
    * of magnitude smaller than the token stream — with each word
    * carrying its frequency weight, so the expensive per-character work
    * never touches corpus-sized data. Final top-k is TakeOrdered (no
    * global sort). Every step is integer arithmetic — the DuckDB
    * oracle replays it exactly.
    */
  def bpePairCounts(df: DataFrame, textCol: String = "text",
                    k: Int = 50): DataFrame = {
    val wf = df.select(
        explode(graft.functions.TextFunctions.tokens(lower(col(textCol))))
          .as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    wf.filter(length(col("w")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(k)
  }

  /** Per-document vocabulary coverage: the fraction of a document's
    * tokens OUTSIDE the corpus's top-`vocabSize` token vocabulary — the
    * OOV-rate audit a pipeline runs before committing to a tokenizer or
    * when diagnosing a source whose text the model will see as rare
    * pieces (high OOV = transliteration, code, or junk).
    *
    * Scale shape: the token stream feeds two consumers (vocabulary
    * build and the coverage join), so it is persisted and
    * registry-released; the vocabulary is top-k BY CONSTRUCTION —
    * bounded at `vocabSize` rows regardless of corpus size — so the
    * coverage join broadcasts it (contrast [[bigramLmScore]]'s
    * open-vocabulary count table, which must NOT broadcast); the
    * per-doc aggregate is partial. No corpus-sized shuffle carries
    * payloads.
    */
  def vocabCoverage(df: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text",
                    vocabSize: Int = 500): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
        explode(graft.functions.TextFunctions.tokens(lower(col(textCol))))
          .as("t"))
      .transform(CacheRegistry.persist)
    val vocab = toks.groupBy("t").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("t")).limit(vocabSize)
      .select(col("t"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("t"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens").cast("double"), 6)
          .as("oov_rate"))
  }

  /** Heavy hitters: every token whose corpus-wide count reaches
    * `minCount`, with its EXACT count — the Count-Min-Sketch companion
    * of the Bloom novelty gate (same shape: a one-sided sketch prunes,
    * an exact pass confirms, the result stays oracle-checkable).
    *
    * Why not a plain groupBy? At corpus scale the token→count shuffle
    * carries the full distinct vocabulary — billions of near-unique
    * keys (typos, ids, urls) that can never reach `minCount`. The CMS
    * estimate is an overcount, so filtering the exploded stream on
    * `estimate >= minCount` BEFORE the aggregation drops the long tail
    * map-side while provably keeping every true heavy hitter; all
    * occurrences of a token share one hash, so surviving tokens arrive
    * with complete counts and the confirm `count >= minCount` is exact.
    * The shuffle shrinks to true heavies + the sketch's eps·N
    * collision sliver.
    *
    * Two scans of the token stream (sketch build, gated count) — the
    * sketch is driver-merged `depth x width` counters, broadcast back
    * inside [[graft.functions.CmsEstimateExpr]]; size it by eps ~
    * minCount/(10·total_tokens) so the overcount stays well under the
    * threshold.
    */
  def heavyHitters(df: DataFrame, textCol: String, minCount: Long,
                   eps: Double = 1e-4, confidence: Double = 0.99,
                   seed: Int = 42): DataFrame = {
    require(minCount > 0, s"minCount $minCount")
    val toks = df.select(
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("token"))
      .withColumn("h", xxhash64(col("token")))
    val cms = toks.stat.countMinSketch("h", eps, confidence, seed)
    val bos = new java.io.ByteArrayOutputStream()
    cms.writeTo(bos)
    toks
      .filter(graft.functions.CmsEstimateExpr(bos.toByteArray, col("h"))
        >= minCount)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }
}
