package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL face of the scalar kernels must agree with the Scala face. */
class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("registered SQL functions evaluate the same kernels") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT modis_qa_conf(2048) AS a,
        |  modis_qa_conf(2048 + 4) AS b,
        |  landsat8_qa_conf(1) AS c,
        |  glcf_class_name(12) AS d,
        |  round(sinusoidal_x(0.0, 1.0), 3) AS e,
        |  lang_id(' the quick and lazy dog is here ') AS f,
        |  token_count('a b  c') AS g
        |""".stripMargin).head()
    assert(row.getFloat(0) == 1.0f)
    assert(row.getFloat(1) == (1.0 - 1 / 12.0).toFloat)
    assert(row.getFloat(2) == 0.0f)
    assert(row.getString(3) == "Croplands")
    assert(math.abs(row.getDouble(4) -
      GeoRound(graft.grid.GeoTransform.SinusoidalRadius * math.Pi / 180)) < 1e-9)
    assert(row.getString(5) == "en")
    assert(row.getInt(6) == 3)
  }

  test("SQL sketch aggregates run the whole cube chain in one query") {
    import spark.implicits._
    GraftFunctions.register(spark)
    (for (d <- 1 to 2; i <- 1 to 50) yield (d, i.toDouble))
      .toDF("day", "v").createOrReplaceTempView("sql_hist_src")
    // build day-grain sketches, merge them, extract p50 — pure SQL
    val p50 = spark.sql(
      """WITH cube AS (
        |  SELECT day, eq_hist(v, 0.0, 50.0, 50) AS hist
        |  FROM sql_hist_src GROUP BY day)
        |SELECT hist_quantile(hist_merge(hist), 0.5, 0.0, 50.0) AS p50
        |FROM cube""".stripMargin).head().getDouble(0)
    // 100 values (1..50 twice): r = 50 -> bin 25 holds ranks 49-50,
    // pos (50-48)/2 = 1 -> 26.0
    assert(math.abs(p50 - 26.0) < 1e-12)

    // INT score and INT id: the builder must coerce (TopKAgg declares
    // no inputTypes, so uncast columns would CCE executor-side)
    val top = spark.sql(
      """SELECT topk_agg(CAST(v AS INT), CAST(day * 100 + v AS INT), 3) AS t
        |FROM sql_hist_src""".stripMargin)
      .selectExpr("transform(t, e -> e.id) AS ids").head().getSeq[Long](0)
    // best scores 50.0, 50.0, 49.0; ties to lowest id
    assert(top == Seq(150L, 250L, 149L))
    // int-typed histogram input through the SQL merge path: the cast
    // to array<bigint> keeps 4-byte elements from being read as 8-byte
    val mergedInts = spark.sql(
      "SELECT hist_merge(h) AS m FROM VALUES (array(1, 2)), (array(3, 4)) t(h)")
      .head().getSeq[Long](0)
    assert(mergedInts == Seq(4L, 6L))
  }

  test("native word shingles equal the higher-order column form") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.TextFunctions
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b", "one", "", "   ", "  leading and trailing  ",
      "tab\tseparated\nand newline separated tokens",
      "x " * 50 // long repetitive doc
    ).map(Tuple1(_)).toDF("text")
    for (n <- Seq(1, 2, 3, 5)) {
      val rows = texts.select(
        TextFunctions.wordShingles(col("text"), n).as("native"),
        TextFunctions.wordShinglesColumnForm(col("text"), n).as("hof"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n text shingles diverge")
      }
    }
    // token mode: empty array (not one empty shingle) for token-less text
    val toks = texts.select(
      TextFunctions.tokens(col("text")).as("native"),
      TextFunctions.tokensColumnForm(col("text")).as("hof")).collect()
    toks.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("repetition ratio: known duplicate-shingle fractions") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT repetition_ratio('a b c a b c a b c') AS rep,
        |  repetition_ratio('all words are unique here today') AS uniq,
        |  repetition_ratio('one') AS single,
        |  repetition_ratio('') AS empty""".stripMargin).head()
    // 7 trigram occurrences, 3 distinct -> 1 - 3/7
    assert(row.getDouble(0) == 1.0 - 3.0 / 7.0)
    assert(row.getDouble(1) == 0.0)
    assert(row.getDouble(2) == 0.0 && row.getDouble(3) == 0.0)
  }

  test("nfc normalization: native kernel vs java.text.Normalizer") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.{NfcNormalizeExpr, TextFunctions}
    val cases = Seq(
      "CAFÉ",           // combining acute -> composes
      "ÄÖ",       // combining diaeresis x2
      "already composed éÄ", // NFC fixed point
      "plain ascii stays",    // fast path (isNormalized)
      "")
    val df = cases.map(Tuple1(_)).toDF("s")
    val got = df.select(NfcNormalizeExpr(col("s"))).as[String].collect()
    val want = cases.map(
      java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(got.sameElements(want))
    assert(got(0) == "CAFÉ" && got(1) == "ÄÖ")
    // the full normalizeText chain: NFC + lower + whitespace collapse
    val norm = Seq(Tuple1(" CAFÉ  du\tParc ")).toDF("s")
      .select(TextFunctions.normalizeText(col("s"))).as[String].head()
    assert(norm == "café du parc")
  }

  test("heuristic gates fire on exactly the planted violations") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.TextFunctions
    val rows = Seq(
      (1L, "a clean document with plenty of ordinary words in it", true),
      (2L, "too short", false),                       // < 5 words
      (3L, "this has lorem ipsum buried in the middle", false),
      (4L, "code like { return x } is not prose at all", false),
      (5L, "one aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa token is suspicious here", false),
      (6L, "numbers 11111 22222 33333 44444 55555 66666 77777", false))
    val out = rows.map(r => (r._1, r._2)).toDF("id", "text")
      .select(col("id"), TextFunctions.heuristicKeep(col("text")).as("keep"))
      .as[(Long, Boolean)].collect().toMap
    rows.foreach { case (id, _, want) =>
      assert(out(id) == want, s"doc $id keep=${out(id)}, want $want")
    }
  }

  private def GeoRound(v: Double): Double =
    BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("extensions class wires the same registry entries") {
    // identity check: the extensions entry point injects exactly the
    // registered function set
    val names = GraftFunctions.all.keySet
    assert(names.contains("modis_qa_conf") && names.contains("simhash64"))
    new GraftExtensions() // constructible (spark.sql.extensions contract)
  }

  test("native md5-prefix60 hash equals the conv/substring/md5 chain") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // unicode, empty string, long strings — the chain is the oracle's
    // definition, so the native kernel must match it bit-for-bit
    val rows = (0 until 500).map(i => s"tok$i-é中${"x" * (i % 37)}") :+ ""
    val df = rows.toDF("tok")
      .select(col("tok"),
        graft.functions.Md5Prefix60Expr(col("tok")).as("native"),
        conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long")
          .as("chain"))
    assert(df.filter(col("native") =!= col("chain")).count() == 0)
  }

  test("native minhash signature equals the k-pass column form") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val k = 32
    // random long arrays of varied length, plus the empty array whose
    // signature is k nulls (array_min over an empty transform)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map(i =>
      Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong())) :+ Seq.empty[Long]
    val hof = array((0 until k).map(i =>
      array_min(transform(col("hs"), h => xxhash64(h, lit(i))))): _*)
    val df = rows.toDF("hs")
      .select(
        graft.functions.MinhashSigExpr(col("hs"), k).as("native"),
        hof.as("chain"))
    // element-wise bit equality including the null pattern
    assert(df.filter(not(col("native") <=> col("chain"))).count() == 0)
  }

  test("blocklist gate: word boundaries, case folding, phrases, escaping") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    import graft.functions.TextFunctions
    val terms = Seq("casino", "free money", "c.e.o")
    val rows = Seq(
      ("hit plain", "a night at the casino downtown", 1, false),
      ("hit case", "CASINO lights", 1, false),
      ("hit phrase", "get free money fast", 1, false),
      ("hit punct boundary", "casino-adjacent", 1, false),
      ("hit two", "casino free money", 2, false),
      ("miss plural", "casinos are plural", 0, true),
      ("miss substring", "moneyfree is glued", 0, true),
      // the dot in "c.e.o" is escaped — "cxexo" must NOT match
      ("miss regex meta", "the cxexo spoke", 0, true),
      ("hit escaped dots", "our c.e.o spoke", 1, false),
      ("miss empty", "", 0, true))
    val df = rows.map(r => (r._1, r._2)).toDF("name", "text")
      .select(col("name"),
        TextFunctions.blocklistHitCount(col("text"), terms).as("n"),
        TextFunctions.blocklistHit(col("text"), terms).as("hit"))
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getBoolean(2)))
      .toMap
    rows.foreach { case (name, _, n, keep) =>
      assert(df(name) == ((n, !keep)), name)
    }
  }

  test("sentence segmentation: terminator runs, fragments, no-terminator") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    import graft.functions.TextFunctions
    val rows = Seq(
      ("two", "First one. Second one!", Seq("First one.", "Second one!")),
      ("ellipsis run", "Wait... Really?!", Seq("Wait...", "Really?!")),
      ("no terminator", "just a fragment", Seq("just a fragment")),
      ("trailing space", "Done.   ", Seq("Done.")),
      ("empty", "", Seq.empty[String]))
    val got = rows.map(r => (r._1, r._2)).toDF("name", "text")
      .select(col("name"), TextFunctions.sentences(col("text")).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    rows.foreach { case (name, _, want) => assert(got(name) == want, name) }
  }
}
