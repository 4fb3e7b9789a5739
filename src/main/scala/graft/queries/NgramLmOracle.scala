package graft.queries

/** DuckDB replay of [[graft.ops.NgramLm]]'s Stupid-Backoff scoring —
  * shared by the `lm_backoff_score` and `lm_score_filter` oracles.
  *
  * Mirrors the Spark pipeline stage by stage: BOS-pad (two chr(2)
  * sentinels) the lowercased whitespace tokens; trigram/bigram/unigram
  * counts and (N, V) over the padded TRAIN streams (the clean
  * documents table); the scored corpus is documents ∪ the two planted
  * docs; the backoff chain evaluates once per DISTINCT (u,v,w) context
  * with the operand order copied from NgramLm.scoreWithModel —
  * c3/c2(u,v), else 0.4·(c2(v,w)/c1(v)), else 0.4·(0.4·((c1(w)+1)/
  * (N+V))) — integer counts and IEEE true division in both engines.
  */
object NgramLmOracle {

  private val plants =
    """UNION ALL SELECT CAST(900001 AS BIGINT),
      |    'zq1 xv9 qj3 wv7 nb2 mx8 kd4 pr9 tz5 lw6'
      |  UNION ALL SELECT CAST(900002 AS BIGINT),
      |    'table hash table hash table hash table hash table hash'""".stripMargin

  /** `filterMin = None` → (doc_id, n_tokens, lm_bo_score);
    * `Some(t)` → (doc_id, lm_bo_score) for docs with mean score >= t
    * (threshold applied UNROUNDED, like the Spark gate). */
  def scoreSql(filterMin: Option[Double]): String = {
    val tail = filterMin match {
      case None =>
        """SELECT tri.doc_id, count(*) AS n_tokens,
          |  round(avg(ctx.s), 6) AS lm_bo_score
          |FROM tri JOIN ctx ON tri.u = ctx.u AND tri.v = ctx.v
          |  AND tri.w = ctx.w
          |GROUP BY tri.doc_id""".stripMargin
      case Some(t) =>
        s"""SELECT tri.doc_id, round(avg(ctx.s), 6) AS lm_bo_score
           |FROM tri JOIN ctx ON tri.u = ctx.u AND tri.v = ctx.v
           |  AND tri.w = ctx.w
           |GROUP BY tri.doc_id HAVING avg(ctx.s) >= $t""".stripMargin
    }
    s"""WITH corpus AS (SELECT doc_id, text FROM documents
       |  $plants),
       |$scoreChain
       |$tail""".stripMargin
  }

  /** The shared CTE chain from `dt` (train tokenization) through `ctx`
    * (per-distinct-context backoff scores); expects a `corpus` CTE with
    * (doc_id, text) as the scored side. Plain string (no interpolation)
    * so the regex escapes read as written. */
  private val scoreChain: String =
    """dt AS MATERIALIZED (SELECT
       |    list_concat([chr(2), chr(2)],
       |      list_filter(string_split_regex(trim(lower(text)), '\s+'),
       |        t -> len(t) > 0)) AS ts
       |  FROM documents),
       |ds AS MATERIALIZED (SELECT doc_id,
       |    list_concat([chr(2), chr(2)],
       |      list_filter(string_split_regex(trim(lower(text)), '\s+'),
       |        t -> len(t) > 0)) AS ts
       |  FROM corpus),
       |c3 AS MATERIALIZED (SELECT u, v, w, count(*) AS c3 FROM (
       |    SELECT
       |      unnest(list_transform(range(3, len(ts) + 1), i -> ts[i - 2])) AS u,
       |      unnest(list_transform(range(3, len(ts) + 1), i -> ts[i - 1])) AS v,
       |      unnest(list_transform(range(3, len(ts) + 1), i -> ts[i])) AS w
       |    FROM dt) GROUP BY u, v, w),
       |c2 AS MATERIALIZED (SELECT v, w, count(*) AS c2 FROM (
       |    SELECT
       |      unnest(list_transform(range(2, len(ts) + 1), i -> ts[i - 1])) AS v,
       |      unnest(list_transform(range(2, len(ts) + 1), i -> ts[i])) AS w
       |    FROM dt) GROUP BY v, w),
       |c1 AS MATERIALIZED (SELECT w, count(*) AS c1 FROM (
       |    SELECT unnest(ts) AS w FROM dt) GROUP BY w),
       |meta AS (SELECT CAST(sum(c1) AS BIGINT) AS n_tok,
       |    CAST(count(*) AS BIGINT) AS vocab FROM c1),
       |tri AS MATERIALIZED (SELECT doc_id,
       |    unnest(list_transform(range(3, len(ts) + 1), i -> ts[i - 2])) AS u,
       |    unnest(list_transform(range(3, len(ts) + 1), i -> ts[i - 1])) AS v,
       |    unnest(list_transform(range(3, len(ts) + 1), i -> ts[i])) AS w
       |  FROM ds),
       |ctx AS MATERIALIZED (SELECT t.u, t.v, t.w,
       |    CASE WHEN t3.c3 IS NOT NULL THEN t3.c3 / cc.c2
       |         ELSE 0.4 * (CASE WHEN b2.c2 IS NOT NULL THEN b2.c2 / cv.c1
       |                          ELSE 0.4 * ((coalesce(uw.c1, 0) + 1)
       |                                      / (m.n_tok + m.vocab)) END)
       |    END AS s
       |  FROM (SELECT DISTINCT u, v, w FROM tri) t
       |  LEFT JOIN c3 t3 ON t.u = t3.u AND t.v = t3.v AND t.w = t3.w
       |  LEFT JOIN (SELECT v AS cu, w AS cv2, c2 FROM c2) cc
       |    ON t.u = cc.cu AND t.v = cc.cv2
       |  LEFT JOIN c2 b2 ON t.v = b2.v AND t.w = b2.w
       |  LEFT JOIN (SELECT w AS uv, c1 FROM c1) cv ON t.v = cv.uv
       |  LEFT JOIN c1 uw ON t.w = uw.w
       |  CROSS JOIN meta m)""".stripMargin

  /** Oracle for `curriculum_order`: LM-score the clean documents (no
    * plants), pack them into capacity-`capacity` bins by the
    * approx-BPE token-count replay (the pack_sequences idiom), take
    * each bin's mean score, and rank bins easy-to-hard (score DESC,
    * bin_id tiebreak; 0-based positions — the two-phase rank's
    * offsets). The rank key is round(bin_score, 6) — the SNAPPED score,
    * matching Curriculum.lmOrderedBins: the raw avg is accumulation-
    * order-dependent in its last ulps, so ranking on the emitted grid
    * keeps both engines' orders a pure function of the emitted value. */
  def curriculumSql(capacity: Int): String =
    s"""WITH corpus AS (SELECT doc_id, text FROM documents),
       |$scoreChain,
       |sc AS MATERIALIZED (SELECT tri.doc_id, avg(ctx.s) AS lm_bo_score
       |  FROM tri JOIN ctx ON tri.u = ctx.u AND tri.v = ctx.v
       |    AND tri.w = ctx.w
       |  GROUP BY tri.doc_id),
       |tk AS (SELECT doc_id,
       |    COALESCE(CAST(list_sum(list_transform(
       |      list_filter(string_split_regex(trim(text), '\\s+'),
       |        x -> len(x) > 0),
       |      x -> greatest(1, CAST(ceil(len(x) / 4.0) AS BIGINT))))
       |      AS BIGINT), 0) AS n_tokens
       |  FROM documents),
       |cum AS (SELECT doc_id, n_tokens,
       |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
       |  FROM tk),
       |b AS (SELECT doc_id,
       |    CAST(floor(cb / $capacity.0) AS BIGINT) AS bin_id FROM cum),
       |pb AS (SELECT b.bin_id, count(*) AS n_docs,
       |    avg(sc.lm_bo_score) AS bin_score
       |  FROM b JOIN sc USING (doc_id) GROUP BY b.bin_id)
       |SELECT bin_id, n_docs, round(bin_score, 6) AS bin_score,
       |  CAST(row_number() OVER (ORDER BY round(bin_score, 6) DESC,
       |    bin_id) - 1 AS BIGINT) AS curriculum_pos
       |FROM pb""".stripMargin

  /** Oracle for `curriculum_shards_e2e`: the schedule mapped onto
    * training shards — shard n carries positions
    * [n*binsPerShard, (n+1)*binsPerShard) in position order. The Spark
    * side decodes shard_id from the FILE NAME and seq_in_shard from
    * physical record order, so a hash match proves the on-disk layout
    * IS the schedule, not merely that a shard column was computed. */
  def curriculumShardsSql(capacity: Int, binsPerShard: Int): String =
    s"""WITH sched AS (${curriculumSql(capacity)})
       |SELECT CAST(floor(curriculum_pos / $binsPerShard.0) AS BIGINT)
       |    AS shard_id,
       |  curriculum_pos % $binsPerShard AS seq_in_shard,
       |  bin_id, n_docs, curriculum_pos
       |FROM sched""".stripMargin
}
