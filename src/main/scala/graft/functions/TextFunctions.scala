package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, language ID, quality scoring, fingerprinting. All pure
  * Column expressions (whole-stage codegen; no UDFs) so they hold up at
  * 100 TB — per-row cost is a tight generated loop, and every operator
  * is embarrassingly parallel (no shuffle).
  */
object TextFunctions {

  /** Whitespace tokenization; empty string -> empty array. Native
    * kernel ([[WordShinglesExpr]] in token mode) — the
    * `filter(split(...))` column form pays an interpreted lambda per
    * token (higher-order functions are CodegenFallback);
    * [[tokensColumnForm]] retains it as the equality-pin reference. */
  def tokens(text: Column): Column = WordShinglesExpr.tokens(text)

  /** The original higher-order formulation — differential-test twin. */
  def tokensColumnForm(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish subword count approximation: words + digit runs +
    * punctuation marks each count; long words count ceil(len/4) pieces.
    * Deterministic arithmetic only — mirrors cl100k-style budgeting
    * closely enough for data curation.
    */
  def approxBpeTokenCount(text: Column): Column =
    aggregate(
      transform(tokens(text), t => greatest(lit(1), ceil(length(t) / lit(4.0)))),
      lit(0L), (acc, x) => acc + x.cast("long")).cast("long")

  def avgTokenLen(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) > 0,
      aggregate(ts, lit(0L), (a, t) => a + length(t).cast("long"))
        .cast("double") / size(ts).cast("double"))
      .otherwise(lit(0.0))
  }

  def digitCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[0-9]", ""))

  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,;:!?'\"()\\[\\]{}-]", ""))

  def whitespaceCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "\\s", ""))

  /** Heuristic quality score in [0,1] from surface statistics (length,
    * punctuation/digit ratios, mean token length) — the usual pre-filter
    * for web-scrape corpora. Rule weights are fixed and documented so the
    * oracle can mirror them.
    */
  def qualityScore(text: Column): Column = {
    val n = length(text).cast("double")
    val nTok = tokenCount(text).cast("double")
    val punctR = punctCount(text).cast("double") / greatest(n, lit(1.0))
    val digitR = digitCount(text).cast("double") / greatest(n, lit(1.0))
    val atl = avgTokenLen(text)
    val lenOk = when(nTok >= 10 && nTok <= 10000, lit(0.4)).otherwise(lit(0.0))
    val atlOk = when(atl >= 2.5 && atl <= 12.0, lit(0.3)).otherwise(lit(0.0))
    val punctOk = when(punctR <= 0.1, lit(0.15)).otherwise(lit(0.0))
    val digitOk = when(digitR <= 0.2, lit(0.15)).otherwise(lit(0.0))
    lenOk + atlOk + punctOk + digitOk
  }

  /** Stopword-hit language ID over {en, es, fr, de, zh}: count hits of a
    * small per-language marker set, CJK codepoints trump, ties break in
    * fixed order en>es>fr>de. N-gram-heuristic class (SURVEY prompt), as
    * a codegen'd when-chain.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " is "),
    "es" -> Seq(" el ", " los ", " que ", " es "),
    "fr" -> Seq(" le ", " les ", " est ", " une "),
    "de" -> Seq(" der ", " und ", " ist ", " das "))

  def langHits(text: Column, lang: String): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    langMarkers(lang).map(m =>
      when(padded.contains(m), 1).otherwise(0): Column).reduce(_ + _)
  }

  def langId(text: Column): Column = {
    val zh = length(regexp_replace(text, "[^\\u4e00-\\u9fff]", "")) > 0
    val en = langHits(text, "en"); val es = langHits(text, "es")
    val fr = langHits(text, "fr"); val de = langHits(text, "de")
    when(zh, lit("zh"))
      .when(en >= es && en >= fr && en >= de && en > 0, lit("en"))
      .when(es >= fr && es >= de && es > 0, lit("es"))
      .when(fr >= de && fr > 0, lit("fr"))
      .when(de > 0, lit("de"))
      .otherwise(lit("und"))
  }

  /** Normalized-content fingerprint (rolling-hash class): lowercase,
    * collapse non-alphanumerics, md5. Identical content up to
    * punctuation/case/whitespace gets one fingerprint.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")))

  /** PII redaction for web-scrape corpora: emails, US-SSN-shaped ids,
    * (NNN) NNN-NNNN phone shapes, and dotted-quad IPs become typed
    * placeholder tags. Pattern order matters (SSN before phone — the
    * 3-2-4 digit grouping must not be half-eaten by the phone rule);
    * all four regexes are RE2-compatible so the DuckDB oracle runs the
    * byte-identical chain. Pure regexp_replace — codegen'd, no shuffle.
    */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ssn = regexp_replace(email, "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>")
    val phone = regexp_replace(ssn,
      "\\(?\\d{3}\\)?[-. ]\\d{3}[-. ]\\d{4}", "<PHONE>")
    regexp_replace(phone,
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
  }

  /** Word n-gram shingles as an array of strings — the native
    * [[WordShinglesExpr]] kernel (one generated call per row; see its
    * scaladoc for why the higher-order column form was retired from the
    * hot path). [[wordShinglesColumnForm]] keeps the original chain for
    * the equality pin in GraftFunctionsSpec. */
  def wordShingles(text: Column, n: Int): Column =
    WordShinglesExpr(text, n)

  /** The original higher-order formulation (CodegenFallback) — retained
    * as the differential-test reference for [[wordShingles]] (built on
    * [[tokensColumnForm]] so the reference shares NO native code). */
  def wordShinglesColumnForm(text: Column, n: Int): Column = {
    val ts = tokensColumnForm(text)
    when(size(ts) >= n,
      transform(sequence(lit(0), size(ts) - n),
        i => array_join(slice(ts, i + 1, lit(n)), " ")))
      .otherwise(array(array_join(ts, " ")))
  }

  /** Canonical text normalization for ingest: Unicode NFC (native
    * [[NfcNormalizeExpr]] kernel — Spark has no built-in), lowercase,
    * collapse whitespace runs to one space, trim. Run FIRST in a corpus
    * pipeline so every downstream hash (dedup, fingerprint, shingles)
    * sees one canonical byte sequence per canonically-equal string.
    * DuckDB mirrors it exactly:
    * `trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))`.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(NfcNormalizeExpr(text)), "\\s+", " "))

  /** C4/Gopher-style heuristic keep/drop gates from surface features —
    * the cheap rule filter that runs BEFORE any model-based scoring.
    * Every gate is a codegen'd regex/length test (no higher-order
    * functions), so the filter is a narrow projection at any scale.
    * Returned struct fields (all also exposed by the `heuristic_filter`
    * query): n_words, has_long_word (a 26+-char token — markup/base64
    * debris), has_lorem ("lorem ipsum" boilerplate), has_brace (code or
    * templating in a prose corpus), digit_ratio, and the combined
    * `keep` verdict.
    */
  def heuristicKeep(text: Column,
                    minWords: Int = 5, maxWords: Int = 50000,
                    maxDigitRatio: Double = 0.2): Column = {
    val nWords = tokenCount(text)
    val longWord = text.rlike("\\S{26,}")
    val lorem = lower(text).contains("lorem ipsum")
    val brace = text.contains("{") || text.contains("}")
    val digitR = digitCount(text).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))
    nWords >= minWords && nWords <= maxWords &&
      !longWord && !lorem && !brace && digitR <= maxDigitRatio
  }

  /** Term-blocklist gate (the C4 "bad words" filter class): one
    * case-insensitive word-boundary alternation over the whole blocklist
    * — a SINGLE regex pass per document regardless of list size (the
    * per-term `contains` chain is |terms| passes), codegen'd, no
    * shuffle. Terms are regex-escaped, so the list can hold arbitrary
    * phrases. `\b`/`(?i)` are RE2-compatible — the DuckDB oracle runs
    * the byte-identical pattern.
    */
  def blocklistPattern(terms: Seq[String]): String =
    "(?i)\\b(" +
      terms.map(_.replaceAll("([\\\\.^$|?*+\\[\\]{}()])", "\\\\$1"))
        .mkString("|") + ")\\b"

  def blocklistHit(text: Column, terms: Seq[String]): Column =
    text.rlike(blocklistPattern(terms))

  def blocklistHitCount(text: Column, terms: Seq[String]): Column =
    regexp_count(text, lit(blocklistPattern(terms)))

  /** Sentence segmentation without lookbehind (RE2 has none): maximal
    * runs of non-terminator chars plus their trailing `.!?` run are the
    * sentences; whitespace-only fragments (the gap after a terminator)
    * are dropped after trim. Shared by the per-doc sentence stats — a
    * Gopher-style quality feature (too few / degenerate sentences flag
    * boilerplate and markup debris).
    */
  val sentencePattern = "[^.!?]+[.!?]*"

  def sentences(text: Column): Column =
    filter(transform(regexp_extract_all(text, lit(sentencePattern), lit(0)),
      s => trim(s)), s => length(s) > 0)

  /** Within-document repetition: the fraction of word n-gram
    * occurrences that are duplicates (1 - distinct/total) — the
    * Gopher-style boilerplate/spam gate ("fraction of duplicate
    * n-grams"). 0 for docs with at most one shingle. Pure column
    * arithmetic; integer-ratio doubles, so engine-exact.
    */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val sh = wordShingles(text, n)
    when(size(sh) > 1,
      lit(1.0) - size(array_distinct(sh)).cast("double")
        / size(sh).cast("double"))
      .otherwise(lit(0.0))
  }
}
