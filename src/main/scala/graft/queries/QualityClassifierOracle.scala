package graft.queries

/** Generated DuckDB replay of [[graft.ops.QualityClassifier]] — full
  * in-engine logistic-regression TRAINING plus scoring, previously the
  * only rows-only text entry whose loop bound was known up front. Like
  * the BPE/PageRank/BFS oracles, the fixed epoch count unrolls into
  * one CTE chain per epoch.
  *
  * Why this replays exactly (the reason the op was designed on the
  * micro grid — QualityClassifier's "engine-exactness" contract):
  *
  *  - features are md5-derived hashed term frequencies — the 8-hex
  *    prefix parses to an integer via a positional strpos sum (exact
  *    doubles up to 2^32), the 9th hex char's parity is the sign;
  *  - weights and bias live on the integer MICRO grid, residuals are
  *    micro-snapped (round() — half away from zero in BOTH engines)
  *    before the gradient sums, so every gradient is an exact integer
  *    in any accumulation order;
  *  - the only libm call is exp() inside the sigmoid; its <=1-ulp
  *    divergence would have to land within ~1e-10 of a rounding
  *    boundary to flip a snapped residual — negligible over the
  *    fixture's 3000 evaluations, and the same exposure the lm/dsir
  *    oracles already carry;
  *  - the weight update is math.rint(lr·g/n) — ties-to-EVEN, which
  *    DuckDB's round() is not, so the replay spells rint out
  *    ([[rint]]).
  */
object QualityClassifierOracle {

  /** Ties-to-even rounding of a double expression, as SQL. */
  private def rint(x: String): String =
    s"""(CASE WHEN ($x) - floor($x) > 0.5 THEN floor($x) + 1
       |      WHEN ($x) - floor($x) < 0.5 THEN floor($x)
       |      WHEN CAST(floor($x) AS BIGINT) % 2 = 0 THEN floor($x)
       |      ELSE floor($x) + 1 END)""".stripMargin

  /** The full replay: train `epochs` rounds of full-batch GD at
    * learning rate `lr` over dim-`dim` hashed-BoW features with label
    * (lang = 'en'), then score — (doc_id, label, score, keep). */
  def sql(dim: Int, epochs: Int, lr: Double): String = {
    val head = Seq(
      """docs0 AS MATERIALIZED (SELECT doc_id AS id,
        |    CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS DOUBLE) AS y
        |  FROM documents)""".stripMargin,
      s"""feat AS MATERIALIZED (SELECT id, bucket,
         |    CAST(sum(sign) AS BIGINT) AS weight
         |  FROM (SELECT id,
         |      CAST(CAST(list_sum(list_transform(range(1, 9),
         |          i -> (strpos('0123456789abcdef', substring(md5(t), i, 1))
         |                - 1) * 16.0 ** (8 - i))) AS BIGINT) % $dim AS INT)
         |        AS bucket,
         |      CASE WHEN (strpos('0123456789abcdef', substring(md5(t), 9, 1))
         |                 - 1) % 2 = 0 THEN 1 ELSE -1 END AS sign
         |    FROM (SELECT doc_id AS id,
         |        unnest(list_filter(string_split_regex(trim(text), '\\s+'),
         |          t -> len(t) > 0)) AS t
         |      FROM documents))
         |  GROUP BY id, bucket HAVING sum(sign) <> 0)""".stripMargin,
      "nn AS (SELECT count(*) AS n FROM docs0)",
      """w0 AS (SELECT CAST(NULL AS INT) AS bucket,
        |    CAST(NULL AS BIGINT) AS wm WHERE FALSE)""".stripMargin,
      "b0 AS (SELECT CAST(0 AS BIGINT) AS bm)")
    val epochCtes = (1 to epochs).flatMap { e =>
      val p = e - 1
      Seq(
        // per-doc micro margin under the previous epoch's weights
        s"""m$e AS MATERIALIZED (SELECT d.id, d.y,
           |    COALESCE(SUM(w.wm * f.weight), 0) AS dotm
           |  FROM docs0 d
           |  LEFT JOIN feat f ON d.id = f.id
           |  LEFT JOIN w$p w ON f.bucket = w.bucket
           |  GROUP BY d.id, d.y)""".stripMargin,
        // micro-snapped residual (round: half away from zero, both engines)
        s"""r$e AS MATERIALIZED (SELECT id,
           |    CAST(round((1.0 / (1.0 + exp(-(dotm / 1e6 + b.bm / 1e6)))
           |      - y) * 1e6) AS BIGINT) AS r
           |  FROM m$e CROSS JOIN b$p b)""".stripMargin,
        s"""g$e AS MATERIALIZED (SELECT f.bucket,
           |    CAST(sum(r.r * f.weight) AS BIGINT) AS g
           |  FROM feat f JOIN r$e r ON f.id = r.id GROUP BY f.bucket)""".stripMargin,
        s"""w$e AS MATERIALIZED (SELECT
           |    COALESCE(w.bucket, g.bucket) AS bucket,
           |    COALESCE(w.wm, 0) - CAST(COALESCE(
           |      ${rint(s"$lr * g.g / nn.n")}, 0) AS BIGINT) AS wm
           |  FROM w$p w FULL JOIN g$e g ON w.bucket = g.bucket
           |  CROSS JOIN nn)""".stripMargin,
        s"""b$e AS (SELECT b.bm - CAST(
           |    ${rint(s"$lr * gb.gb / nn.n")} AS BIGINT) AS bm
           |  FROM b$p b
           |  CROSS JOIN (SELECT CAST(sum(r) AS BIGINT) AS gb FROM r$e) gb
           |  CROSS JOIN nn)""".stripMargin)
    }
    val fin =
      s"""fin AS (SELECT d.id, d.y,
         |    COALESCE(SUM(w.wm * f.weight), 0) AS dotm
         |  FROM docs0 d
         |  LEFT JOIN feat f ON d.id = f.id
         |  LEFT JOIN w$epochs w ON f.bucket = w.bucket
         |  GROUP BY d.id, d.y)
         |SELECT fin.id AS doc_id, CAST(fin.y AS INT) AS label,
         |  round(1.0 / (1.0 + exp(-(fin.dotm / 1e6 + b.bm / 1e6))), 4)
         |    AS score,
         |  CAST(round(1.0 / (1.0 + exp(-(fin.dotm / 1e6 + b.bm / 1e6))), 4)
         |    >= 0.5 AS INT) AS keep
         |FROM fin CROSS JOIN b$epochs b""".stripMargin
    "WITH " + (head ++ epochCtes).mkString(",\n") + ",\n" + fin
  }
}
