package graft.queries

/** Generated DuckDB replay of exact greedy BPE training and encoding —
  * the oracle for `bpe_train_merges` / `bpe_piece_counts`, which were
  * rows-only until round 10 because the merge loop is iterative. The
  * loop bound is known up front (`nMerges`), so training unrolls into
  * one CTE chain per round, exactly like the PageRank and BFS oracles;
  * encoding's bound is per-word (symbols strictly decrease), so it runs
  * as a recursive CTE instead.
  *
  * Replay semantics, mirrored from [[graft.ops.Bpe]] statement by
  * statement:
  *
  *  - word counts: whitespace-split lowercased tokens (the exact idiom
  *    every text oracle here uses). `trainMerges`'s `maxWords` cap is
  *    most-frequent-first and the fixture vocabulary sits far below it,
  *    so the replay omits the cap (precondition: vocab <= maxWords).
  *    A second precondition of the same kind: `nMerges` must not
  *    EXHAUST the mergeable pairs — if every word collapsed to a single
  *    symbol before round n, that round's b$r is empty and the
  *    w$r = w$(r-1) CROSS JOIN b$r chain would silently wipe the word
  *    table (Spark's trainMerges early-stops instead). The fixture
  *    corpus at nMerges = 20 is nowhere near collapse; a caller raising
  *    nMerges toward full-vocabulary training must re-check this.
  *  - one training round = weighted adjacent-pair counts over the
  *    current symbol tables, argmax with the (count DESC, left, right)
  *    tiebreak, then one greedy left-to-right non-overlapping rewrite.
  *  - the rewrite is a `list_reduce` fold over the symbol list with a
  *    chr(1)-joined string accumulator: append " x", or append just "r"
  *    when the accumulator's LAST symbol equals the merge's left and x
  *    equals its right. The fold equals [[graft.ops.Bpe.applyMerge]]'s
  *    restart-after-merge scan because a symbol just produced by the
  *    fold ends in `left+right`, never `left` (right is nonempty), so a
  *    freshly merged symbol can never chain as the LEFT of the next
  *    merge within the same pass — exactly applyMerge's `cur = rest`.
  *  - encoding applies the LOWEST-RANKED applicable merge everywhere,
  *    repeatedly ([[graft.ops.Bpe.encodeWord]] — priority order, not
  *    table order: trained tables are not confluent, e.g. a table can
  *    hold both (as,h) and the later (h,ash)). The recursive CTE step
  *    picks `list_filter(merge_table, applicable)[1]` — the merge table
  *    is rank-ordered, so [1] IS the lowest applicable rank — and
  *    terminal rows are those with no applicable merge.
  *
  * chr(1) is the symbol separator inside fold accumulators and the
  * adjacency probe strings; tokens are whitespace-split so they cannot
  * contain the only characters that would collide (whitespace), and the
  * synthetic corpus carries no control bytes.
  */
object BpeOracle {

  private val SEP = "chr(1)"

  /** Shared CTE chain: tokenize, count words, unroll `n` training
    * rounds (p/b/w per round). MATERIALIZED throughout — DuckDB
    * otherwise re-inlines each round's word table into both of its two
    * consumers, doubling work per round (2^20 scans by round 20). */
  private def trainingCtes(n: Int,
                           docRel: String = "documents"): Seq[String] = {
    val head = Seq(
      s"""toks AS MATERIALIZED (SELECT doc_id,
        |    unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
        |      t -> len(t) > 0)) AS w
        |  FROM $docRel)""".stripMargin,
      "wf AS MATERIALIZED (SELECT w, count(*) AS freq FROM toks GROUP BY w)",
      ("w0 AS MATERIALIZED (SELECT w, freq, list_transform(" +
        "range(1, len(w) + 1), i -> substring(w, i, 1)) AS syms FROM wf)"))
    val rounds = (1 to n).flatMap { r =>
      val p = r - 1
      Seq(
        s"""p$r AS MATERIALIZED (SELECT l, r, sum(freq) AS c FROM (
           |    SELECT freq,
           |      unnest(list_transform(range(1, len(syms)), i -> syms[i])) AS l,
           |      unnest(list_transform(range(1, len(syms)), i -> syms[i + 1])) AS r
           |    FROM w$p WHERE len(syms) >= 2) GROUP BY l, r)""".stripMargin,
        s"b$r AS MATERIALIZED (SELECT l, r FROM p$r ORDER BY c DESC, l, r LIMIT 1)",
        s"""w$r AS MATERIALIZED (SELECT w, freq,
           |    string_split(list_reduce(syms, (acc, x) ->
           |      CASE WHEN x = b.r AND (acc = b.l OR ends_with(acc, $SEP || b.l))
           |           THEN acc || x ELSE acc || $SEP || x END), $SEP) AS syms
           |  FROM w$p CROSS JOIN b$r b)""".stripMargin)
    }
    head ++ rounds
  }

  private def mergeRows(n: Int): String =
    (1 to n).map(r =>
      s"SELECT $r AS rank, l AS left_sym, r AS right_sym FROM b$r")
      .mkString("\n  UNION ALL ")

  /** Oracle for `bpe_train_merges`: (rank, left_sym, right_sym). */
  def trainSql(n: Int): String =
    "WITH " + trainingCtes(n).mkString(",\n") +
      s"\nSELECT * FROM (${mergeRows(n)}) ORDER BY rank"

  /** Oracle for `bpe_piece_counts`: per-doc (n_words, n_pieces) under
    * the merges trained by the same CTE chain. */
  def pieceCountsSql(n: Int): String =
    encodePrefix(n) +
      """
        |SELECT doc_id, count(*) AS n_words,
        |  CAST(sum(pieces) AS BIGINT) AS n_pieces
        |FROM toks JOIN vp USING (w) GROUP BY doc_id""".stripMargin

  /** The full WITH chain through `vp` (word -> final piece count):
    * training rounds, rank-ordered merge table, recursive priority
    * encode, terminal rows. Shared by the piece-count and pack
    * oracles. */
  private def encodePrefix(n: Int, docRel: String = "documents",
                           pre: Seq[String] = Nil): String = {
    val applicable =
      s"""(list_filter(ms, m -> contains(
         |        $SEP || array_to_string(syms, $SEP) || $SEP,
         |        $SEP || m.l || $SEP || m.r || $SEP)))[1]""".stripMargin
    val encodeCtes = Seq(
      s"""mt AS MATERIALIZED (SELECT
         |    list({'rk': rank, 'l': left_sym, 'r': right_sym} ORDER BY rank)
         |      AS ms
         |  FROM (${mergeRows(n)}))""".stripMargin,
      s"""enc AS (
         |  SELECT w, syms, $applicable AS mm
         |  FROM w0 CROSS JOIN mt
         |  UNION ALL
         |  SELECT w, syms, $applicable AS mm
         |  FROM (
         |    SELECT w,
         |      string_split(list_reduce(syms, (acc, x) ->
         |        CASE WHEN x = mm.r AND (acc = mm.l OR ends_with(acc, $SEP || mm.l))
         |             THEN acc || x ELSE acc || $SEP || x END), $SEP) AS syms
         |    FROM enc WHERE mm IS NOT NULL) e CROSS JOIN mt)""".stripMargin,
      "vp AS (SELECT w, len(syms) AS pieces FROM enc WHERE mm IS NULL)")
    "WITH RECURSIVE " +
      (pre ++ trainingCtes(n, docRel) ++ encodeCtes).mkString(",\n")
  }

  /** Oracle for `sft_padded_batches`: per (doc, position 0..maxLen-1)
    * the padded/truncated token id (pad = |vocab|), attention bit and
    * loss bit — the per-example SFT collator replay
    * ([[graft.ops.TensorShards.paddedExamples]]). */
  def paddedSql(n: Int, maxLen: Int): String =
    encodePrefix(n) +
      s""",
         |${vocabCtes(n)},
         |wp AS (SELECT w, unnest(syms) AS s,
         |    unnest(range(1, len(syms) + 1)) AS j
         |  FROM enc WHERE mm IS NULL),
         |wid AS (SELECT wp.w, wp.j, COALESCE(v.token_id, -1) AS tid
         |  FROM wp LEFT JOIN vocab v ON wp.s = v.symbol),
         |tpos AS (SELECT doc_id, unnest(tsf) AS w,
         |    unnest(range(1, len(tsf) + 1)) AS pos
         |  FROM (SELECT doc_id, list_filter(
         |      string_split_regex(trim(lower(text)), '\\s+'),
         |      t -> len(t) > 0) AS tsf FROM documents)),
         |eids AS (SELECT doc_id,
         |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY pos, j)
         |      - 1 AS BIGINT) AS piece_pos,
         |    CAST(tid AS BIGINT) AS token_id
         |  FROM tpos JOIN wid USING (w)),
         |jm AS (SELECT doc_id, pos, pieces,
         |    min(CASE WHEN regexp_matches(w, '[.!?]$$') THEN pos END)
         |      OVER (PARTITION BY doc_id) AS b
         |  FROM tpos JOIN vp USING (w)),
         |spans AS (SELECT doc_id,
         |    CAST(COALESCE(SUM(CASE WHEN pos <= b THEN pieces END), 0)
         |      AS BIGINT) AS prompt_pieces,
         |    CAST(sum(pieces) AS BIGINT) AS n_pieces
         |  FROM jm GROUP BY doc_id),
         |grid AS (SELECT doc_id, prompt_pieces,
         |    least(n_pieces, $maxLen) AS n_real,
         |    unnest(range(0, $maxLen)) AS pos
         |  FROM spans)
         |SELECT g.doc_id, CAST(g.pos AS BIGINT) AS pos,
         |  CAST(COALESCE(e.token_id, (SELECT count(*) FROM vocab))
         |    AS BIGINT) AS token_id,
         |  CAST(CASE WHEN g.pos < g.n_real THEN 1 ELSE 0 END AS BIGINT)
         |    AS attn,
         |  CAST(CASE WHEN g.pos >= g.prompt_pieces AND g.pos < g.n_real
         |    THEN 1 ELSE 0 END AS BIGINT) AS loss
         |FROM grid g LEFT JOIN eids e
         |  ON g.doc_id = e.doc_id AND g.pos = e.piece_pos
         |    AND g.pos < g.n_real""".stripMargin

  /** Oracle for `sft_multiturn_batches`: the [[paddedSql]] grid over
    * the CONVERSATION fixture ('<user> ' + text + ' <assistant> ' +
    * text + a fixed second round — must match the queries-side concat
    * verbatim), with the single prompt-prefix rule replaced by the
    * chat-template rule: per word, role = last marker at or before it
    * (none yet = system), and the loss bit is 1 only on assistant
    * CONTENT pieces (markers excluded) inside the real length. Merges
    * train on the conversation corpus itself, so one CTE chain replays
    * tokenizer + roles + collator end to end. */
  /** The conversation fixture CTE — must match the queries-side concat
    * verbatim (shared by the padded and packed multi-turn oracles). */
  private val convCte: String =
    """conv AS MATERIALIZED (SELECT doc_id,
      |    '<user> ' || text || ' <assistant> ' || text ||
      |      ' <user> again please <assistant> sure thing done' AS text
      |  FROM documents)""".stripMargin

  /** Piece stream with chat roles: word positions over `conv`, role =
    * last marker at or before the word, per-piece ids in (pos, j)
    * order with the assistant-content loss bit — the shared front half
    * of [[multiturnSql]] and [[multiturnShardsSql]], ending in
    * relation `eids(doc_id, piece_pos, token_id, lossw)`. */
  private def multiturnEidsCtes: String =
    s"""wp AS (SELECT w, unnest(syms) AS s,
       |    unnest(range(1, len(syms) + 1)) AS j
       |  FROM enc WHERE mm IS NULL),
       |wid AS (SELECT wp.w, wp.j, COALESCE(v.token_id, -1) AS tid
       |  FROM wp LEFT JOIN vocab v ON wp.s = v.symbol),
       |tpos AS (SELECT doc_id, unnest(tsf) AS w,
       |    unnest(range(1, len(tsf) + 1)) AS pos
       |  FROM (SELECT doc_id, list_filter(
       |      string_split_regex(trim(lower(text)), '\\s+'),
       |      t -> len(t) > 0) AS tsf FROM conv)),
       |rt AS (SELECT doc_id, w, pos, mk,
       |    last_value(mk IGNORE NULLS) OVER (PARTITION BY doc_id
       |      ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND
       |      CURRENT ROW) AS role
       |  FROM (SELECT doc_id, w, pos,
       |      CASE WHEN w = '<user>' THEN 'user'
       |           WHEN w = '<assistant>' THEN 'assistant' END AS mk
       |    FROM tpos)),
       |eids AS (SELECT doc_id,
       |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY pos, j)
       |      - 1 AS BIGINT) AS piece_pos,
       |    CAST(tid AS BIGINT) AS token_id,
       |    (role = 'assistant' AND mk IS NULL) AS lossw
       |  FROM rt JOIN wid USING (w))""".stripMargin

  /** Oracle for `sft_multiturn_packed`: the loader-tensor pack replay
    * (doc-id-ordered cumulative-before sum, floor(cum/capacity) bins,
    * overflow keeps its home bin) with the per-piece chat-template
    * loss bit instead of the prompt-prefix rule — one row per token:
    * (bin_id, pos, token_id, loss, seg_idx, seg_start, seg_len). */
  def multiturnShardsSql(n: Int, capacity: Int): String =
    encodePrefix(n, docRel = "conv", pre = Seq(convCte)) +
      s""",
         |${vocabCtes(n)},
         |$multiturnEidsCtes,
         |spans AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pieces
         |  FROM eids GROUP BY doc_id),
         |cum AS (SELECT doc_id, n_pieces,
         |    CAST(COALESCE(SUM(n_pieces) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cb
         |  FROM spans),
         |bins AS (SELECT doc_id, n_pieces,
         |    CAST(floor(cb / $capacity.0) AS BIGINT) AS bin_id,
         |    CAST(cb % $capacity AS BIGINT) AS seg_start
         |  FROM cum),
         |segix AS (SELECT doc_id, n_pieces, bin_id, seg_start,
         |    CAST(row_number() OVER (PARTITION BY bin_id ORDER BY doc_id)
         |      - 1 AS BIGINT) AS seg_idx
         |  FROM bins)
         |SELECT sx.bin_id,
         |  CAST(row_number() OVER (PARTITION BY sx.bin_id
         |    ORDER BY doc_id, e.piece_pos) - 1 AS BIGINT) AS pos,
         |  e.token_id,
         |  CAST(CASE WHEN e.lossw THEN 1 ELSE 0 END AS BIGINT) AS loss,
         |  sx.seg_idx, sx.seg_start,
         |  sx.n_pieces AS seg_len
         |FROM segix sx JOIN eids e USING (doc_id)""".stripMargin

  def multiturnSql(n: Int, maxLen: Int): String = {
    // composes the SAME eids chain as multiturnShardsSql — the padded
    // and packed multi-turn oracles cannot drift apart on future edits
    encodePrefix(n, docRel = "conv", pre = Seq(convCte)) +
      s""",
         |${vocabCtes(n)},
         |$multiturnEidsCtes,
         |tot AS (SELECT doc_id, count(*) AS n_pieces
         |  FROM eids GROUP BY doc_id),
         |grid AS (SELECT doc_id, least(n_pieces, $maxLen) AS n_real,
         |    unnest(range(0, $maxLen)) AS pos
         |  FROM tot)
         |SELECT g.doc_id, CAST(g.pos AS BIGINT) AS pos,
         |  CAST(COALESCE(e.token_id, (SELECT count(*) FROM vocab))
         |    AS BIGINT) AS token_id,
         |  CAST(CASE WHEN g.pos < g.n_real THEN 1 ELSE 0 END AS BIGINT)
         |    AS attn,
         |  CAST(CASE WHEN e.lossw THEN 1 ELSE 0 END AS BIGINT) AS loss
         |FROM grid g LEFT JOIN eids e
         |  ON g.doc_id = e.doc_id AND g.pos = e.piece_pos
         |    AND g.pos < g.n_real""".stripMargin
  }

  /** Oracle for `tokenizer_fertility`: the piece-count replay rolled
    * up by source with the whitespace-stripped char count — fertility
    * (pieces/word) and compression (chars/piece), the two standard
    * tokenizer-eval numbers. */
  def fertilitySql(n: Int): String =
    encodePrefix(n) +
      s""",
         |pcf AS (SELECT doc_id, count(*) AS n_words,
         |    CAST(sum(pieces) AS BIGINT) AS n_pieces
         |  FROM toks JOIN vp USING (w) GROUP BY doc_id),
         |nc AS (SELECT doc_id, source,
         |    CAST(length(regexp_replace(lower(trim(text)), '\\s+', '',
         |      'g')) AS BIGINT) AS n_norm_chars
         |  FROM documents)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(n_words) AS BIGINT) AS n_words,
         |  CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
         |  CAST(sum(n_norm_chars) AS BIGINT) AS n_chars,
         |  round(CAST(sum(n_pieces) AS DOUBLE) / sum(n_words), 6)
         |    AS fertility,
         |  round(CAST(sum(n_norm_chars) AS DOUBLE) / sum(n_pieces), 6)
         |    AS chars_per_piece
         |FROM pcf JOIN nc USING (doc_id)
         |GROUP BY source""".stripMargin

  /** The vocabulary CTE chain ending in `vocab` (symbol, token_id):
    * distinct base characters of the training words in lexicographic
    * order, then merge symbols (left||right) in rank order, FIRST
    * occurrence winning on duplicates — the exact
    * [[graft.ops.Bpe.vocab]] construction. */
  private def vocabCtes(n: Int): String =
    s"""vsyms AS (
       |  SELECT s, 0 AS grp, s AS so, 0 AS ro
       |  FROM (SELECT DISTINCT unnest(syms) AS s FROM w0)
       |  UNION ALL
       |  SELECT left_sym || right_sym AS s, 1 AS grp, '' AS so,
       |    rank AS ro
       |  FROM (${mergeRows(n)})),
       |vfirst AS (SELECT s, grp, so, ro,
       |    row_number() OVER (PARTITION BY s ORDER BY grp, ro) AS dup
       |  FROM vsyms),
       |vocab AS (SELECT s AS symbol,
       |    CAST(row_number() OVER (ORDER BY grp, so, ro) - 1 AS BIGINT)
       |      AS token_id
       |  FROM vfirst WHERE dup = 1)""".stripMargin

  /** Oracle for `bpe_vocab`: (token_id, symbol). */
  def vocabSql(n: Int): String =
    "WITH " + (trainingCtes(n) :+ vocabCtes(n)).mkString(",\n") +
      "\nSELECT token_id, symbol FROM vocab"

  /** Oracle for `bpe_encode_ids`: per-document token-ID sequences —
    * the training replay feeding the recursive priority encode, each
    * terminal piece joined to its vocab id, documents reassembled in
    * (token position, within-word piece position) order. */
  def encodeIdsSql(n: Int): String =
    encodePrefix(n) +
      s""",
         |${vocabCtes(n)},
         |wp AS (SELECT w, unnest(syms) AS s,
         |    unnest(range(1, len(syms) + 1)) AS j
         |  FROM enc WHERE mm IS NULL),
         |wid AS (SELECT wp.w, wp.j, COALESCE(v.token_id, -1) AS tid
         |  FROM wp LEFT JOIN vocab v ON wp.s = v.symbol),
         |tpos AS (SELECT doc_id, unnest(tsf) AS w,
         |    unnest(range(1, len(tsf) + 1)) AS pos
         |  FROM (SELECT doc_id, list_filter(
         |      string_split_regex(trim(lower(text)), '\\s+'),
         |      t -> len(t) > 0) AS tsf FROM documents))
         |SELECT doc_id,
         |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY pos, j)
         |    - 1 AS BIGINT) AS piece_pos,
         |  CAST(tid AS BIGINT) AS token_id
         |FROM tpos JOIN wid USING (w)""".stripMargin

  /** Oracle for `sft_mask_spans`: the piece-count replay feeding the
    * prompt-boundary window — first token ending in [.!?] closes the
    * prompt; conditional sums give the word- and piece-space mask
    * offsets. */
  def maskSpansSql(n: Int): String =
    encodePrefix(n) +
      s""",
         |tpos2 AS (SELECT doc_id, unnest(tsf) AS w,
         |    unnest(range(1, len(tsf) + 1)) AS pos
         |  FROM (SELECT doc_id, list_filter(
         |      string_split_regex(trim(lower(text)), '\\s+'),
         |      t -> len(t) > 0) AS tsf FROM documents)),
         |jm AS (SELECT doc_id, pos, pieces,
         |    min(CASE WHEN regexp_matches(w, '[.!?]$$') THEN pos END)
         |      OVER (PARTITION BY doc_id) AS b
         |  FROM tpos2 JOIN vp USING (w))
         |SELECT doc_id,
         |  CAST(COALESCE(SUM(CASE WHEN pos <= b THEN 1 END), 0)
         |    AS BIGINT) AS prompt_words,
         |  CAST(COALESCE(SUM(CASE WHEN pos <= b THEN pieces END), 0)
         |    AS BIGINT) AS prompt_pieces,
         |  count(*) AS n_words,
         |  CAST(sum(pieces) AS BIGINT) AS n_pieces
         |FROM jm GROUP BY doc_id""".stripMargin

  /** Oracle for `train_shards_e2e`: the FULL loader-tensor replay —
    * training, priority encode, vocab ids, per-doc piece streams
    * (eids), prompt boundaries (spans), the doc-id-ordered pack chain
    * (cum/bins), per-bin segment indexes, and finally one row per
    * TOKEN with its loss bit and segment facts: exactly what
    * [[graft.ops.TensorShards.decodeTokenRows]] reconstructs from the
    * written TFRecord shards. A hash match therefore proves the
    * on-disk tensors equal the composed chain end to end.
    *
    * `eos = true` replays the document-separator variant
    * ([[graft.ops.TensorShards.binTensors]] with
    * `eosId = Some(vocabSize)`): one extra piece per document at the
    * first free vocab id, counted in the pack weights and seg lengths,
    * loss bit 1. */
  def trainShardsSql(n: Int, capacity: Int, eos: Boolean = false): String =
    tokenRowCtes(n, capacity, eos) + "\nSELECT * FROM tokrows"

  /** The full WITH chain ending in relation `tokrows(bin_id, pos,
    * token_id, loss, seg_idx, seg_start, seg_len)` — the per-token
    * loader-tensor replay shared by [[trainShardsSql]] and
    * [[curriculumTensorShardsSql]]. */
  private def tokenRowCtes(n: Int, capacity: Int, eos: Boolean): String =
    encodePrefix(n) +
      s""",
         |${vocabCtes(n)},
         |wp AS (SELECT w, unnest(syms) AS s,
         |    unnest(range(1, len(syms) + 1)) AS j
         |  FROM enc WHERE mm IS NULL),
         |wid AS (SELECT wp.w, wp.j, COALESCE(v.token_id, -1) AS tid
         |  FROM wp LEFT JOIN vocab v ON wp.s = v.symbol),
         |tpos AS (SELECT doc_id, unnest(tsf) AS w,
         |    unnest(range(1, len(tsf) + 1)) AS pos
         |  FROM (SELECT doc_id, list_filter(
         |      string_split_regex(trim(lower(text)), '\\s+'),
         |      t -> len(t) > 0) AS tsf FROM documents)),
         |eids0 AS (SELECT doc_id,
         |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY pos, j)
         |      - 1 AS BIGINT) AS piece_pos,
         |    CAST(tid AS BIGINT) AS token_id
         |  FROM tpos JOIN wid USING (w)),
         |jm AS (SELECT doc_id, pos, pieces,
         |    min(CASE WHEN regexp_matches(w, '[.!?]$$') THEN pos END)
         |      OVER (PARTITION BY doc_id) AS b
         |  FROM tpos JOIN vp USING (w)),
         |spans0 AS (SELECT doc_id,
         |    CAST(COALESCE(SUM(CASE WHEN pos <= b THEN pieces END), 0)
         |      AS BIGINT) AS prompt_pieces,
         |    CAST(sum(pieces) AS BIGINT) AS n_pieces
         |  FROM jm GROUP BY doc_id),""".stripMargin +
      (if (eos)
        s"""
           |eids AS (SELECT doc_id, piece_pos, token_id FROM eids0
           |  UNION ALL
           |  SELECT doc_id, n_pieces AS piece_pos,
           |    (SELECT count(*) FROM vocab) AS token_id
           |  FROM spans0),
           |spans AS (SELECT doc_id, prompt_pieces,
           |    n_pieces + 1 AS n_pieces
           |  FROM spans0),""".stripMargin
      else
        """
          |eids AS (SELECT * FROM eids0),
          |spans AS (SELECT * FROM spans0),""".stripMargin) +
      s"""
         |cum AS (SELECT doc_id, prompt_pieces, n_pieces,
         |    CAST(COALESCE(SUM(n_pieces) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cb
         |  FROM spans),
         |bins AS (SELECT doc_id, prompt_pieces, n_pieces,
         |    CAST(floor(cb / $capacity.0) AS BIGINT) AS bin_id,
         |    CAST(cb % $capacity AS BIGINT) AS seg_start
         |  FROM cum),
         |segix AS (SELECT doc_id, prompt_pieces, n_pieces, bin_id,
         |    seg_start,
         |    CAST(row_number() OVER (PARTITION BY bin_id ORDER BY doc_id)
         |      - 1 AS BIGINT) AS seg_idx
         |  FROM bins),
         |tokrows AS (SELECT sx.bin_id,
         |  CAST(row_number() OVER (PARTITION BY sx.bin_id
         |    ORDER BY doc_id, e.piece_pos) - 1 AS BIGINT) AS pos,
         |  e.token_id,
         |  CAST(CASE WHEN e.piece_pos < sx.prompt_pieces THEN 0 ELSE 1 END
         |    AS BIGINT) AS loss,
         |  sx.seg_idx, sx.seg_start,
         |  sx.n_pieces AS seg_len
         |FROM segix sx JOIN eids e USING (doc_id))""".stripMargin

  /** Oracle for `curriculum_tensor_shards_e2e`: the per-token replay
    * rolled up to bins (token count + a position-salted xor over the
    * id tensor — the whole payload is in the hash), ranked by the
    * LENGTH curriculum (many-short-docs bins first: n_segs DESC,
    * bin_id), sharded binsPerShard at a time. The Spark side decodes
    * shard_id from the FILE NAME and seq from physical record order,
    * so the hash match proves the on-disk layout IS the schedule AND
    * the payload IS the loader tensor. */
  def curriculumTensorShardsSql(n: Int, capacity: Int,
                                binsPerShard: Int): String =
    tokenRowCtes(n, capacity, eos = false) +
      s""",
         |binagg AS (SELECT bin_id,
         |    count(*) AS n_tokens,
         |    bit_xor((pos << 20) + token_id) AS tok_xor,
         |    CAST(max(seg_idx) + 1 AS BIGINT) AS n_segs
         |  FROM tokrows GROUP BY bin_id),
         |ranked AS (SELECT bin_id, n_segs, n_tokens, tok_xor,
         |    CAST(row_number() OVER (ORDER BY n_segs DESC, bin_id) - 1
         |      AS BIGINT) AS cpos
         |  FROM binagg)
         |SELECT CAST(floor(cpos / $binsPerShard.0) AS BIGINT) AS shard_id,
         |  CAST(cpos % $binsPerShard AS BIGINT) AS seq_in_shard,
         |  bin_id, n_segs, n_tokens, tok_xor
         |FROM ranked""".stripMargin

  /** Oracle for `train_shards_manifest`: the per-token loader replay
    * aggregated to the manifest grain — shard = bin_id / binsPerShard
    * (pure arithmetic), per shard the record count, token count and
    * xor fingerprint the manifest attests. The Spark side re-derives
    * the same three numbers from the PUBLISHED bytes and emits the
    * manifest row with an agreement flag, so a hash match proves
    * write -> manifest -> read-back -> verify end to end. */
  def manifestSql(n: Int, capacity: Int, binsPerShard: Int): String =
    tokenRowCtes(n, capacity, eos = false) +
      s""",
         |binagg AS (SELECT bin_id, count(*) AS n_tokens,
         |    bit_xor((pos << 20) + token_id) AS bin_xor
         |  FROM tokrows GROUP BY bin_id)
         |SELECT CAST(floor(bin_id / $binsPerShard.0) AS BIGINT)
         |    AS shard_id,
         |  count(*) AS n_records,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  bit_xor(bin_xor) AS tok_xor,
         |  TRUE AS manifest_ok
         |FROM binagg GROUP BY 1""".stripMargin

  /** Oracle for `bpe_pack_shards_e2e`: the piece-count replay above
    * feeding the exact pack_to_shards bin chain (doc_id-ordered
    * cumulative-before sum, floor(cum/capacity) bins) — tokenizer in
    * the loop instead of the whitespace-heuristic count. */
  def packShardsSql(n: Int, capacity: Int): String =
    encodePrefix(n) +
      s""",
         |pc AS (SELECT doc_id, CAST(sum(pieces) AS BIGINT) AS n_pieces
         |  FROM toks JOIN vp USING (w) GROUP BY doc_id),
         |cum AS (SELECT doc_id, n_pieces,
         |    COALESCE(SUM(n_pieces) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |  FROM pc),
         |bins AS (SELECT doc_id, n_pieces,
         |    CAST(floor(cb / $capacity.0) AS BIGINT) AS bin_id FROM cum)
         |SELECT bin_id, count(*) AS n_docs,
         |  CAST(sum(n_pieces) AS BIGINT) AS bin_pieces,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM bins GROUP BY bin_id""".stripMargin
}
