package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off scale probe for the dedup chain: replicates the sf0.1
  * documents fixture Nx (default 10x ≈ the sf1 row budget) and runs the
  * three heaviest dedup operators at 1x and Nx, printing one JSON line
  * per (query, scale) with wall/cpu seconds — the order-of-magnitude
  * sanity datapoint that the plan shapes (windowed span cover, banded
  * LSH, blocked simhash) hold when the corpus grows 10x.
  *
  * Replicas are near-duplicates (each replica r > 0 prefixes a replica
  * token to the text), so the near-dup operators face 10-deep duplicate
  * groups — harder than organic data, bounded pair growth (45 pairs per
  * group), which is exactly the stress the banded/blocked designs must
  * absorb without quadratic blowup.
  *
  * Usage: runMain graft.ScalingProbe [multiplier] — writes scratch under
  * /dev/shm when available, never touches /root/testdata.
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = org.apache.spark.GraftMetricsBridge.install(spark.sparkContext)

    val shm = java.nio.file.Paths.get("/dev/shm")
    val base = (if (java.nio.file.Files.isWritable(shm))
      java.nio.file.Files.createTempDirectory(shm, "graft_scaling")
    else java.nio.file.Files.createTempDirectory("graft_scaling")).toString

    // Nx corpus: replica 0 is the fixture verbatim; replicas 1..N-1 get
    // distinct doc_ids (10M stride clears corpusWithPlants' +100000
    // planted band) and a replica-token prefix -> 10-deep NEAR-duplicate
    // groups for the similarity ops.
    val src = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val vsrc = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val esrc = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    def scaled(n: Int): String = {
      val dir = s"$base/sf_x$n"
      val reps = spark.range(n).select(col("id").cast("int").as("rep"))
      src.crossJoin(broadcast(reps))
        .select(
          (col("doc_id") + col("rep").cast("long") * 10000000L).as("doc_id"),
          when(col("rep") === 0, col("text"))
            .otherwise(concat(lit("rep"), col("rep"), lit(" "), col("text")))
            .as("text"),
          col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // embeddings replicas: rep 0 verbatim (so the PQ codebook seeds —
      // the lowest-id vectors — are scale-invariant); later replicas
      // slightly scaled, distinct ids. Volume test for the
      // |corpus|-proportional encode + ADC scan.
      vsrc.crossJoin(broadcast(reps))
        .select(
          (col("vec_id") + col("rep").cast("long") * 10000000L).as("vec_id"),
          when(col("rep") === 0, col("embedding"))
            .otherwise(transform(col("embedding"),
              x => x * (lit(1.0f) + col("rep").cast("float") / lit(1000.0f))))
            .as("embedding"),
          col("label"))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      // events replicas: N times the USERS (id strides keep replicas
      // disjoint), each carrying the original per-user series verbatim —
      // the event-sequence ops' claim is that cost scales with user
      // count while per-user window/array state stays bounded, and this
      // replication grows exactly the user dimension.
      esrc.crossJoin(broadcast(reps))
        .select(
          (col("event_id") + col("rep").cast("long") * 1000000000L)
            .as("event_id"),
          col("ts"),
          (col("user_id") + col("rep").cast("long") * 10000000L)
            .as("user_id"),
          col("event_type"), col("value"), col("props"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }

    def force(df: DataFrame): Long = df.count()

    // Projection-only queries need the every-column checksum force —
    // count() references no output column, so Catalyst prunes the whole
    // projection and the probe times a parquet row count (the same trap
    // the quantile-cube arm documents). The same pruning can drop
    // NON-GROUPING aggregate expressions under a count (group count is
    // computable without them), so aggregate-heavy web entries checksum
    // too; queries whose cost is joins/dedup keyed on every column keep
    // the cheaper count() force.
    val checksumForced = Set("html_extract", "html_block_filter",
      "url_domains", "url_dedup_canonical", "link_extract",
      "fim_transform")
    def forceChecksum(df: DataFrame): Long = {
      df.select(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*))
        .as("h")).agg(expr("bit_xor(h)")).collect()
      -1L
    }

    val chain = Seq("dedup_spans", "dedup_simhash", "dedup_minhash_lsh",
      // round-7 additions: keep-best faces the same 10-deep clusters
      // with the score window on top; PQ-ADC's encode is the
      // |corpus|-proportional stage the 10x run must scale linearly
      "dedup_keep_best", "ann_pq_topk",
      // round-7 wave 2: semantic dedup's cell-scoped pair join must
      // stay O(n^2/cells) when every cell gains 10x members; the BPE
      // pair explode must stay vocab-bounded while the token stream
      // grows 10x
      "dedup_semantic", "bpe_pair_counts",
      // round-7 wave 3: cross-corpus near-novelty (two index builds +
      // band probe) and perceptual-hash media dedup (hash pass + block
      // join) — both must stay linear in corpus volume
      "dedup_near_novel", "multimodal_near_dups",
      // round-7 wave 4: snapshot diff (id-keyed fingerprint join must
      // stay projection-sized) and the event-sequence ops (funnel's
      // user_id shuffle + transition's per-user window must scale with
      // user count, never super-linearly)
      "corpus_delta", "funnel_steps", "event_transitions",
      // round-7 wave 5: the two token-volume passes — line curation
      // (explode + codegen rules + reassembly) and the hashing-trick
      // vectorizer (explode + (id, bucket) agg) must track token count
      "clean_lines", "embed_feature_hash",
      // round-7 wave 6: DSIR scoring (token explode + broadcast bucket
      // join must track token volume; the bucket tables stay 256 rows
      // at ANY corpus size) and BM25 (the tf shuffle must stay
      // hit-sized while hits grow 10x)
      "dsir_weights", "bm25_search",
      // round-8 wave: the per-source cap (10x docs per source must
      // shuffle only k-sized heap buffers and emit the SAME capped
      // output) and the sketch rollup (10x users, sketch rows stay
      // kilobyte-sized per (day, type))
      "cap_per_source", "hll_rollup_users",
      // round-8 wave 2: the web-crawl front end — the HTML strip chain
      // must track markup volume (pure codegen scan, no shuffle), the
      // domain rollup's multi-distinct must shuffle projections only,
      // and the WARC read must track archive bytes (the archive build
      // caches per dir, so the kept second pass probes READ cost)
      "html_extract", "html_block_filter", "url_domains",
      "url_dedup_canonical", "src_warc_roundtrip",
      // the composed crawl pipeline: URL dedup + gates + exact/near
      // dedup + decontamination + split in one number — replicas are
      // 10-deep near-dup groups, so the MinHash/cluster stages face
      // their worst shape while everything upstream grows linearly
      "curate_crawl_e2e",
      // round-8 wave 3: trigram-indexed grep — the probe side must
      // track HIT count while the corpus (and its one-time index
      // build, dropped by the min-of-2 rule since run 1 pays it and
      // run 2 reuses the per-dir cache) grows 10x
      "grep_indexed",
      // round-8 wave 3: link extraction must track markup volume (one
      // generator pass), and PageRank's per-round cost must track the
      // HOST graph (~constant here: replicas multiply pages, not
      // hosts), never page rows — only the one edge-derivation scan
      // may grow 10x
      "link_extract", "host_pagerank",
      // round-9: the composed frontier — extraction + canonical count
      // grow with pages, the gate/rank/delay joins and the per-host
      // window stay host-sized (replicas add pages, not hosts), so
      // total cpu must stay well under page-linear
      "crawl_frontier",
      // round-9 wave 3: hybrid fusion — the corpus-sized work is the
      // two upstream retrievals (both corpus-linear scans here); the
      // fusion joins stay k-bounded at any scale
      "hybrid_rrf_search",
      // round-9 wave 4: PMI (two token-linear count passes; the pair
      // joins stay vocab-sized behind the minCount cut), BFS depth
      // (rounds are HOST-sized — replicas add pages, not hosts, so cpu
      // must stay far under page-linear), and the A/B readout (one
      // user-keyed partial agg — user-linear)
      "pmi_collocations", "host_distance", "experiment_lift",
      // IO formats: shard write caches per dir inside the entries, so
      // the kept second pass probes the READ path — record-at-a-time
      // TFRecord decode and schema'd gzip JSONL must track corpus bytes
      "src_tfrecord_roundtrip", "src_jsonl_roundtrip",
      // round-10: the two newest e2e read paths — the raw-HTTP curation
      // (WARC build caches per dir; the kept pass probes the composed
      // parse→decode→dedup→curate→shards→decode chain) and the
      // tokenizer-priced pack (BPE train + encode + pack cache per dir;
      // the kept pass probes the CRC-verified shard decode)
      "curate_http_e2e", "bpe_pack_shards_e2e",
      // round-10: the Stupid-Backoff gate (train + score in one number
      // — the count aggs and the trigram scoring stream are both
      // token-linear; the distinct-context join stays trigram-vocab-
      // sized, which replicas grow only via the "repN" prefix tokens)
      // and the projected-shortlist ANN (projection + 16-dim scan are
      // corpus-linear; the exact re-rank stays |queries| x 32)
      "lm_backoff_score", "ann_rp_topk",
      // round-11: the ANN-routed contrastive miner with CORPUS-SIZED
      // anchors (the real mining shape). The index build caches per dir
      // (minerIvfCache), so the kept min-of-2 pass probes the mining
      // join itself: candidate volume is |corpus| * nProbe/nCentroids
      // through one cell-keyed join — expect ~cells-fraction
      // sub-linearity vs the corpus decade, with the brute miner's 1x
      // reading as the all-pairs control
      "hard_negatives_ann",
      // round-11: token-ID emission (encode once per DISTINCT word —
      // replicas mostly re-use the vocab, so the corpus-sized work is
      // the token stream join + the doc-keyed reassembly agg, both
      // token-linear) and the FIM rotation (pure codegen projection —
      // the byte-linear floor; checksum-forced or Catalyst prunes the
      // substring work under a count)
      "bpe_encode_ids", "fim_transform",
      // round-12: the composed loader-tensor shard chain. The write
      // caches per dir (trainShardCache), so the kept min-of-2 pass
      // probes the READ path: CRC-framed decode + the per-token
      // posexplode + the seg prefix-sum lookup — all token-linear; the
      // build pass (run 1) adds the doc-keyed array agg + one bin-keyed
      // exchange on top of the encode chain already probed by
      // bpe_encode_ids
      "train_shards_e2e",
      // round-12: the curriculum-ordered tensor shards (write caches
      // per dir; the kept pass probes the shard-addressed read — file
      // decode + the per-shard replay window, shard-bounded state —
      // plus the per-bin xor fold, token-linear)
      "curriculum_tensor_shards_e2e",
      // round-13: the packed multi-turn SFT tensors — tokenizer train
      // + encode + turn-span windows + pack + per-token decode, all
      // token-linear stages (NOT dir-cached: both probe passes pay the
      // full compose, which is the honest per-epoch-build number)
      "sft_multiturn_packed")
    // optional 2nd arg: comma-separated query filter for targeted probes
    val only = args.drop(1).headOption.map(_.split(',').toSet)
    only.foreach { names =>
      val unknown = names -- chain.toSet - "quantile_cube" -
        "index_maintain" - "ivf_maintain" - "miner_scale" -
        "minhash_boiler" - "cluster_distributed" - "seen_compact" -
        "seen_gate"
      require(unknown.isEmpty,
        s"unknown probe name(s): ${unknown.mkString(", ")}")
    }
    val selected = only match {
      case Some(names) => chain.filter(names.contains)
      case None => chain
    }
    Seq(1 -> scaled(1), mult -> scaled(mult)).foreach { case (n, dir) =>
      // round-8: the quantile-sketch cube's build/probe/raw split. The
      // claim under test: the raw percentile re-scan grows with event
      // volume while the sketch probe reads the SAME (event_type, day)
      // grain rows at any scale — replication grows users, not days.
      if (only.isEmpty || only.exists(_.contains("quantile_cube"))) {
        Bench.attachListener(listener)
        // checksum force, NOT count(): count() references no output
        // column, so Catalyst prunes the histQuantile rank walk and
        // percentile_approx aggregates — the exact work the A/B times
        // (Bench.main's force contract)
        def forceAll(df: DataFrame): Unit =
          df.select(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*))
            .as("h")).agg(expr("bit_xor(h)")).collect()
        Bench.quantileCubeAB(spark, dir, forceAll).foreach { t =>
          println(f"""{"query":"${t.name}","scale_x":$n,"rows":-1,"wall_sec":${t.wall}%.3f,"cpu_sec":${t.cpu}%.3f}""")
        }
      }
      // round-9: the segmented index's maintenance claim — appending a
      // FIXED batch must cost the same whether the standing index holds
      // 1x or 10x documents (segments never rewrite); the probe stays
      // hit-sized; the build (and compaction, which rewrites postings)
      // are the passes ALLOWED to grow with the corpus.
      def timed(label: String)(f: => Unit): Unit = {
        org.apache.spark.GraftMetricsBridge.flush(spark.sparkContext)
        val cpu0 = listener.cpuNanos.get()
        val t0 = System.nanoTime()
        f
        val wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.GraftMetricsBridge.flush(spark.sparkContext)
        val cpu = (listener.cpuNanos.get() - cpu0) / 1e9
        graft.ops.CacheRegistry.releaseAll()
        println(f"""{"query":"$label","scale_x":$n,"rows":-1,"wall_sec":$wall%.3f,"cpu_sec":$cpu%.3f}""")
      }
      if (only.isEmpty || only.exists(_.contains("index_maintain"))) {
        import graft.ops.TextSearch
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        val idxDir = s"$dir/probe_idx"
        timed("idx_build")(
          TextSearch.buildInvertedIndex(docs, idxDir))
        // the SAME batch at both scales: 5000 fixture docs, fresh ids
        val batch = spark.read
          .parquet("/root/testdata/sf0.1/documents.parquet")
          .limit(5000)
          .select((col("doc_id") + 2000000000L).as("doc_id"), col("text"))
        timed("idx_append_fixed")(
          TextSearch.appendToInvertedIndex(batch, idxDir))
        timed("idx_probe")(
          TextSearch.queryInvertedIndex(spark, idxDir,
            Seq("dup", "key", "vector"), k = 15).collect())
        timed("idx_compact")(
          TextSearch.compactInvertedIndex(spark, idxDir))
        timed("idx_probe_compacted")(
          TextSearch.queryInvertedIndex(spark, idxDir,
            Seq("dup", "key", "vector"), k = 15).collect())
      }
      // round-10: the IVF vector index's maintenance claim, mirroring
      // idx_append_fixed one surface over — appending a FIXED vector
      // batch must cost the same whether the standing index holds 1x
      // or 10x vectors (assignment is a shuffle-free projection against
      // the centroid table + a pure parquet append; the standing
      // assignments are never read). The build is the pass allowed to
      // grow; the probe must track probed-cell volume.
      if (only.isEmpty || only.exists(_.contains("ivf_maintain"))) {
        import graft.ops.Similarity
        val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
        val ivfDir = s"$dir/probe_ivf"
        timed("ivf_build")(
          Similarity.buildIvfIndex(vecs, ivfDir, nCentroids = 16))
        // the SAME batch at both scales: 2000 fixture vectors, fresh ids
        val batch = spark.read
          .parquet("/root/testdata/sf0.1/embeddings.parquet")
          .limit(2000)
          .select((col("vec_id") + 2000000000L).as("vec_id"),
            col("embedding"))
        timed("ivf_append_fixed")(
          Similarity.appendToIvfIndex(batch, ivfDir))
        val qs = spark.read
          .parquet("/root/testdata/sf0.1/embeddings.parquet")
          .filter(col("vec_id") < 8)
        timed("ivf_probe")(
          Similarity.queryIvfIndex(spark, ivfDir, qs, k = 5, nProbe = 4)
            .collect())
      }
      // round-11: the ANN miner at PRODUCTION quantizer sizing —
      // nCentroids ~ sqrt(corpus) (the repo's own sizing note), nProbe
      // fixed, anchors = the whole corpus. Candidate volume is then
      // |corpus|^2 * nProbe / sqrt(|corpus|) = nProbe * n^1.5 — the
      // n^1.5 decade curve that makes corpus-sized mining tractable
      // where the brute miner's n^2 is not (the chain's
      // hard_negatives_ann entry keeps the oracle's FIXED 16 cells, so
      // its decade ratio is deliberately the quadratic control). The
      // deterministic lowest-id quantizer keeps the build cheap — the
      // probe times the mining JOIN, not a k-means fit.
      if (only.isEmpty || only.exists(_.contains("miner_scale"))) {
        import graft.ops.Similarity
        val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
        val nVec = vecs.count()
        val nCentroids =
          math.max(16, math.sqrt(nVec.toDouble).round.toInt)
        val minerDir = s"$dir/probe_miner"
        timed(s"miner_build_c$nCentroids")(
          Similarity.buildIvfIndex(vecs, minerDir,
            nCentroids = nCentroids, labelCol = Some("label"),
            centers = Some(Similarity.lowestIdCenters(vecs, nCentroids))))
        timed("miner_hard_negatives_ann")(
          Similarity.hardNegativesAnn(spark, minerDir, vecs,
            k = 5, nProbe = 4).count())
      }
      // round-13: EXACT-duplicate boilerplate skew (the nav-chrome
      // shape MinHash banding is weakest against). Replica depth = the
      // scale decade with IDENTICAL text — every group shares one full
      // signature, so pre-collapse each band bucket held the whole
      // group (depth² join rows per group, per band). With signature
      // collapse the band self-join sees ONE representative per
      // distinct text at any depth; the within-group pair expansion is
      // output-sized (C(depth,2) per group — the true answer). Expect
      // ~linear-in-output growth, nothing quadratic in the band join.
      if (only.exists(_.contains("minhash_boiler"))) {
        import graft.ops.Dedup
        val src1 = spark.read
          .parquet("/root/testdata/sf0.1/documents.parquet")
          .limit(20000)
        val reps1 = spark.range(n).select(col("id").cast("int").as("rep"))
        val boiler = src1.crossJoin(broadcast(reps1))
          .select((col("doc_id") + col("rep").cast("long") * 10000000L)
            .as("doc_id"), col("text"))
        timed("minhash_boiler_uncapped")(
          Dedup.minhashNearDups(boiler, "doc_id", "text").count())
        timed("minhash_boiler_cap16") {
          val (p, drops) = Dedup.minhashNearDupsWithDrops(boiler,
            "doc_id", "text", maxBucket = 16)
          val nPairs = p.count()
          val nDrop = drops.agg(coalesce(sum("n_dropped"), lit(0L)))
            .head().getLong(0)
          println(s"""{"note":"minhash_boiler_cap16","pairs":$nPairs,"dropped":$nDrop,"scale_x":$n}""")
        }
      }
      // round-13: the distributed min-label clustering path FORCED
      // (smallGraphEdges=0) on a clique-per-group duplicate graph —
      // scale_x multiplies the number of 10-member cliques (the
      // duplicate-group shape), so per-round join volume must track
      // edge count linearly while the round count stays at the clique
      // convergence floor.
      if (only.exists(_.contains("cluster_distributed"))) {
        import graft.ops.Dedup
        val pairsDf = spark.range(20000L * n).select(col("id").as("g"))
          .select(col("g"), explode(sequence(lit(0), lit(9))).as("a"))
          .select(col("g"), col("a"),
            explode(sequence(lit(0), lit(9))).as("b"))
          .filter(col("a") < col("b"))
          .select((col("g") * 100 + col("a")).as("id_a"),
            (col("g") * 100 + col("b")).as("id_b"))
        timed("cluster_distributed")(
          Dedup.clusterDuplicates(pairsDf, smallGraphEdges = 0L).count())
      }
      // round-14: the shared seen-table compactor's scale claim
      // (graft.ops.SeenTable) — consolidating the id history must cost
      // per-id FLAT as the history grows 10x (one distinct + write over
      // the ids, nothing super-linear), and the output must fan out
      // with volume (hash-bucketed multi-file sized by bytes/target —
      // the coalesce(1) single-writer funnel this replaced would show
      // here as one task absorbing the whole decade). History = n x 2M
      // incompressible ids (xxhash64 of a range) across 80 append
      // files, the shape an unattended stream leaves behind.
      if (only.exists(_.contains("seen_compact"))) {
        import graft.ops.SeenTable
        val seenDir = s"$dir/probe_seen"
        spark.range(n * 2000000L)
          .select(xxhash64(col("id")).as("doc_id"))
          .repartition(160)
          .write.mode("overwrite").parquet(seenDir)
        timed("seen_compact")(
          SeenTable.compact(spark, seenDir, "doc_id", threshold = 64,
            targetBytes = 4L * 1024 * 1024))
        val outFiles = new java.io.File(seenDir).listFiles()
          .count(_.getName.endsWith(".parquet"))
        println(s"""{"note":"seen_compact","out_files":$outFiles,"scale_x":$n}""")
        // the TIERED claim: once the history is consolidated into
        // frozen (>= target/2) segments, a later pass pays only for
        // the new small tail — its cost must be HISTORY-INDEPENDENT
        // (same reading at 1x and 10x), because frozen segments are
        // immutable and only the 10 fresh batch files consolidate.
        (0 until 10).foreach { i =>
          spark.range(10000)
            .select(xxhash64(col("id") + lit(7777770000L + i)).as("doc_id"))
            .coalesce(1).write.mode("append").parquet(seenDir)
        }
        timed("seen_compact_tail")(
          SeenTable.compact(spark, seenDir, "doc_id", threshold = 5,
            targetBytes = 4L * 1024 * 1024))
        val outFiles2 = new java.io.File(seenDir).listFiles()
          .count(_.getName.endsWith(".parquet"))
        println(s"""{"note":"seen_compact_tail","out_files":$outFiles2,"scale_x":$n}""")
      }
      // round-14: the idempotence gate's per-trigger cost under a 10x
      // id history — SeenTable.novelIds (one column-pruned scan, both
      // joins broadcasting the batch-bounded side) A/B'd against the
      // naive plan it replaced (batch ANTI JOIN history: sort-merge
      // shuffles the WHOLE history every trigger). Batch is FIXED at
      // 10k ids (half seen, half novel) while the history grows with
      // scale: the gate's decade ratio must track the scan, the naive
      // plan pays sort+exchange over every historical id.
      if (only.exists(_.contains("seen_gate"))) {
        import graft.ops.SeenTable
        val seenDir = s"$dir/probe_seen_gate"
        spark.range(n * 2000000L)
          .select(xxhash64(col("id")).as("doc_id"))
          .repartition(40)
          .write.mode("overwrite").parquet(seenDir)
        // 5k redelivered ids (hash of in-range rows) + 5k novel ones
        val batch = spark.range(5000)
          .select(xxhash64(col("id")).as("doc_id"))
          .unionByName(spark.range(5000)
            .select((col("id") - 100000000L).as("doc_id")))
          .localCheckpoint()
        timed("seen_gate_broadcast")(
          SeenTable.novelIds(batch, seenDir, "doc_id").count())
        timed("seen_gate_shuffle_naive")(
          batch.join(spark.read.parquet(seenDir), Seq("doc_id"),
            "left_anti").count())
      }
      selected.foreach { name =>
        // one warm pass at 1x only would skew; instead run each (query,
        // scale) twice and keep the second (steady-state JIT/codegen)
        var rows = 0L
        var best = (Double.MaxValue, Double.MaxValue)
        (0 until 2).foreach { _ =>
          org.apache.spark.GraftMetricsBridge.flush(spark.sparkContext)
          val cpu0 = listener.cpuNanos.get()
          val t0 = System.nanoTime()
          val df = SparkEntry.queries(name)(spark, dir)
          rows = if (checksumForced(name)) forceChecksum(df) else force(df)
          val wall = (System.nanoTime() - t0) / 1e9
          org.apache.spark.GraftMetricsBridge.flush(spark.sparkContext)
          val cpu = (listener.cpuNanos.get() - cpu0) / 1e9
          graft.ops.CacheRegistry.releaseAll()
          if (wall < best._1) best = (wall, best._2)
          if (cpu < best._2) best = (best._1, cpu)
        }
        println(f"""{"query":"$name","scale_x":$n,"rows":$rows,"wall_sec":${best._1}%.3f,"cpu_sec":${best._2}%.3f}""")
      }
    }
    try { graft.sources.GridExports.deleteStore(spark, base) }
    catch { case _: Throwable => }
    spark.stop()
  }
}
