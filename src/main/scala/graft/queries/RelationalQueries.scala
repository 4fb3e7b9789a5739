package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Relational operator surface of the engine, exercised over the driver's
  * TPC-H-ish fixtures (TESTDATA.md). Each entry re-expresses a reference
  * operator (SURVEY.md §2 IDs cited per query) as a declarative DataFrame
  * plan so Catalyst handles pushdown/pruning/join strategy; the DuckDB
  * oracle in [[oracleSql]] pins semantics.
  *
  * Scale notes (100 TB stance): filters/projections sit directly on the
  * parquet scan (pushdown + column pruning); dimension joins (nation,
  * region) are broadcast; fact-fact joins shuffle on their equi-keys and
  * rely on AQE for skew/coalescing.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // A7/§2.5 — masked per-group stats (TPC-H Q1 shape). Partial aggregation
    // (map-side combine) keeps the shuffle tiny at any scale.
    "q1_pricing_summary" -> { (s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    },

    // P1-P3/P6-P8 — windowed slice: range predicates pushed to the parquet
    // scan (frac/time pruning analog: jgrid3.py:470-489).
    "p3_window_slice" -> { (s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate").between(
          lit("1995-01-01").cast("timestamp"), lit("1995-12-31").cast("timestamp")))
        .filter(col("l_partkey").between(100, 900))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity"), col("l_shipdate").cast("date").as("ship_day"))
    },

    // P9 — nodata↔NULL duality: nodata → NULL on read, NULL → fill on write
    // (jgrid3.py:332-336, modis.py:252-262).
    "p9_nodata_mask" -> { (s, d) =>
      lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        nullif(col("l_quantity"), lit(1.0)).as("qty_masked"),
        coalesce(nullif(col("l_quantity"), lit(1.0)), lit(-3000.0)).as("qty_filled"))
    },

    // J1 — multi-grid align as equi-join + agg (jgrid/utils.py:54-81).
    // nation is a broadcast dim; customer⋈orders shuffles on the key.
    "j1_multi_grid_align" -> { (s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
    },

    // J4 — input intersection as left-semi (hadoop/spark.py:166-167).
    "j4_semi_join" -> { (s, d) =>
      customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    },

    // J5 — incremental anti-join: todo = inputs − done (hadoop/spark.py:171-177).
    // "done" = customers already seen in 1998; todo = the rest.
    "j5_anti_join" -> { (s, d) =>
      customer(s, d)
        .join(orders(s, d)
          .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    },

    // J6 — broadcast lookup join (complete_ndvi_worldgrid.py:220-237).
    "j6_broadcast_lookup" -> { (s, d) =>
      nation(s, d)
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
    },

    // J7 — coverage check: required − available must be inspectable
    // (create_ndvi_worldgrid.py:238-247).
    "j7_coverage_check" -> { (s, d) =>
      orders(s, d)
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"), "left_anti")
        .select(col("o_orderkey"), col("o_orderstatus"))
    },

    // J8 — tile∩grid fraction selection (np.intersect1d,
    // complete_ndvi_worldgrid.py:196-201).
    "j8_intersect_keys" -> { (s, d) =>
      lineitem(s, d).select(col("l_partkey").as("partkey"))
        .intersect(part(s, d).select(col("p_partkey").as("partkey")))
    },

    // Fuzzy (edit-distance) join via deletion-neighborhood blocking
    // (ops/FuzzyJoin): supplier names vs deterministically-corrupted
    // twins (one char deleted at s_suppkey % length), distance <= 1 —
    // candidates from the variant equi-join, confirmed by exact
    // levenshtein; the oracle is the brute-force theta join, so the
    // blocking's no-loss property is what the hash compare checks.
    "fuzzy_join_names" -> { (s, d) =>
      val sup = supplier(s, d).select(col("s_suppkey"), col("s_name"))
      val cut = "CAST(s_suppkey % length(s_name) AS INT)"
      val corrupted = supplier(s, d).select(col("s_suppkey").as("c_id"),
        expr(s"concat(substring(s_name, 1, $cut), " +
          s"substring(s_name, $cut + 2, 1000000))").as("c_name"))
      graft.ops.FuzzyJoin.joinWithinEditDistance(
        sup, "s_suppkey", "s_name", corrupted, "c_id", "c_name", maxDist = 1)
    },

    // §2.8 — set union (worldgrid accumulation).
    "set_union_nationkeys" -> { (s, d) =>
      customer(s, d).select(col("c_nationkey").as("nationkey"))
        .union(supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .distinct()
    },

    // §2.8 — set difference (ndvi_hdf_stats.py:50-56): customers who
    // ordered, minus those who ordered in 1998.
    "set_except_custkeys" -> { (s, d) =>
      orders(s, d).select(col("o_custkey").as("custkey"))
        .except(orders(s, d)
          .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
          .select(col("o_custkey").as("custkey")))
    },

    // A1 — per-day completeness: dates where not every tile reported
    // (ndvi_hdf_stats.py:42-59).
    "a1_incomplete_days" -> { (s, d) =>
      events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(countDistinct(col("event_type")).as("n_types"),
          count(lit(1)).as("n_events"))
        .withColumn("complete", col("n_types") === lit(5))
    },

    // A2 — distinct sorted date collection (ndvi_collect_dates.py:49-59).
    "a2_distinct_dates" -> { (s, d) =>
      orders(s, d).select(col("o_orderdate").cast("date").as("day"))
        .distinct().orderBy(col("day"))
    },

    // A4 — per-tile counts (ndvi_hdf_stats.py:31-39).
    "a4_group_counts" -> { (s, d) =>
      customer(s, d).groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    },

    // A5 — per-pixel index select c[i,j] = a[i,j,idx[i,j]] (utils.py:152-181).
    "a5_index_select" -> { (s, d) =>
      embeddings(s, d).select(col("vec_id"),
        element_at(col("embedding"), (col("label") % 64 + 1).cast("int")).as("picked"))
    },

    // A6 — unique label inventory (glcf.py:71-77).
    "a6_distinct_labels" -> { (s, d) =>
      embeddings(s, d).select(col("label")).distinct()
    },

    // W1 — per-pixel time series with lag/sequence (load_ndvi_qa notebook);
    // partitions by series key so state never leaves one task.
    "w1_series_lag" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events(s, d).select(
        col("user_id"), col("event_id"), unix_millis(col("ts")).as("ts_ms"),
        col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        row_number().over(w).as("seq"))
    },

    // W2 — ordered reassembly as running aggregate (jgrid3.py:341-371).
    "w2_running_sum" -> { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d).select(
        col("user_id"), col("event_id"),
        sum(col("value")).over(w).as("running_value"))
    },

    // O1/O3 — deterministic top-k (takeOrdered under the hood: no full sort
    // at scale, each partition keeps k).
    "o1_topk" -> { (s, d) =>
      lineitem(s, d)
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .limit(10)
    },

    // O4 — head/tail date picks as min/max agg (create_ndvi_worldgrid.py:271-272).
    "o4_minmax_dates" -> { (s, d) =>
      orders(s, d).agg(
        min(col("o_orderdate")).cast("date").as("d_min"),
        max(col("o_orderdate")).cast("date").as("d_max"),
        count(lit(1)).as("n"))
    },

    // F1 — date codecs (utils.py:79-110).
    "f1_date_codecs" -> { (s, d) =>
      orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        dayofyear(col("o_orderdate")).as("doy"),
        date_format(col("o_orderdate"), "yyyy_MM_dd").as("ymd"),
        // o_orderdate reads as TIMESTAMP_NTZ; session TZ is UTC so the cast
        // is an exact reinterpretation.
        unix_millis(col("o_orderdate").cast("timestamp")).as("ts_ms"))
    },

    // F2 — filename/tilename regex parse (modis.py:17-77).
    "f2_regex_parse" -> { (s, d) =>
      documents(s, d).select(
        col("doc_id"),
        regexp_extract(col("source"), "src([0-9]+)", 1).cast("int").as("src_num"))
    },

    // F7 — class→name lookup as literal when-chain (glcf.py:9-58).
    "f7_class_lookup" -> { (s, d) =>
      events(s, d)
        .withColumn("type_code",
          when(col("event_type") === "click", 1)
            .when(col("event_type") === "view", 2)
            .when(col("event_type") === "purchase", 3)
            .when(col("event_type") === "signup", 4)
            .when(col("event_type") === "error", 5)
            .otherwise(0))
        .groupBy(col("type_code")).agg(count(lit(1)).as("n"))
    },

    // F9 — grid⇄chunk arithmetic (jgrid3.py:278-296): pure column math.
    "f9_chunk_math" -> { (s, d) =>
      lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_partkey") % 4800).as("px"),
        (col("l_suppkey") % 4800).as("py"))
        .withColumn("frac_x", floor(col("px") / 400).cast("long"))
        .withColumn("frac_y", floor(col("py") / 400).cast("long"))
        .withColumn("frac_num", (col("frac_y") * 12 + col("frac_x")).cast("long"))
    },

    // ST2 — late/missing-data detection: expected×observed anti-join
    // (create_fake_hdf.py:85-105). "Observed" = high-value events, so
    // (day, type) slots lacking one get a synthesized nodata row.
    "st2_gap_fill" -> { (s, d) =>
      val ev = events(s, d)
      val days = ev.select(to_date(col("ts")).as("day")).distinct()
      val types = ev.select(col("event_type")).distinct()
      val observed = ev.filter(col("value") > 90)
        .select(to_date(col("ts")).as("day"), col("event_type")).distinct()
      days.crossJoin(types)
        .join(observed, Seq("day", "event_type"), "left_anti")
        .withColumn("fill_value", lit(-3000.0))
    },

    // §2.11 — rollup (hierarchy totals).
    "cube_rollup" -> { (s, d) =>
      lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n"))
    },

    // §2.11 — ranking window, top-5 per group with deterministic tie-break.
    "rank_topn" -> { (s, d) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          rank().over(w).as("rnk"))
        .filter(col("rnk") <= 5)
    },

    // §2.11 — per-group top-k via the bounded-heap aggregate
    // (functions/TopKAgg): row_number()<=5 semantics with a k-sized
    // buffer per (partition, group) through the shuffle instead of the
    // window form's full sorted group. The A/B vs the window shape is
    // the topk_heap_agg/topk_window bench pair.
    "topk_group" -> { (s, d) =>
      orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(graft.functions.TopKAgg(
          col("o_totalprice"), col("o_orderkey"), 5).as("top"))
        .select(col("o_orderpriority"), explode(col("top")).as("e"))
        .select(col("o_orderpriority"),
          col("e.id").as("o_orderkey"), col("e.score").as("o_totalprice"))
    },

    // Data layout — Z-order clustering key (ops/Layout): the Morton
    // interleave that gives parquet min/max pruning on BOTH key
    // dimensions. The layout op itself (range partition + local sort)
    // is plan-pinned in LayoutSpec; the oracle checks the bit
    // interleave value per row.
    "layout_zorder" -> { (s, d) =>
      orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        graft.ops.Layout.zorderKey(
          col("o_custkey"), col("o_orderkey"), 16).as("zkey"))
    },

    // Hilbert-curve clustering key (ops/Layout.hilbertKey, native
    // codegen expr): the locality-preserving layout alternative —
    // the oracle replays the 16-level rotate/flip walk as nested
    // subselects (state chained level to level, not unrolled into
    // one expression).
    "layout_hilbert" -> { (s, d) =>
      orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        graft.ops.Layout.hilbertKey(
          col("o_custkey"), col("o_orderkey"), 16).as("hkey"))
    },

    // A/B experiment readout (ops/EventAnalytics.experimentLift):
    // deterministic user_id-parity variants, conversion = any
    // high-value purchase; exact counts + fixed-order z chain (sqrt is
    // IEEE-correctly-rounded, the one portable libm-style call).
    "experiment_lift" -> { (s, d) =>
      graft.ops.EventAnalytics.experimentLift(
        events(s, d).withColumn("variant",
          pmod(col("user_id"), lit(2)).cast("int")),
        "variant", "user_id",
        col("event_type") === "purchase" && col("value") >= 95.0)
        .withColumn("rate_a", round(col("rate_a"), 6))
        .withColumn("rate_b", round(col("rate_b"), 6))
        .withColumn("lift", round(col("lift"), 6))
        .withColumn("z", round(col("z"), 6))
    },

    // §2.11 — tumbling event-time window (daily).
    "tumbling_daily" -> { (s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
        .select(col("window.start").cast("date").as("day"), col("event_type"),
          col("n"), col("total_value"))
    },

    // §2.11 — JSON/meta extraction (header meta analog, jgrid3.py:127).
    "json_props" -> { (s, d) =>
      events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
    },

    // §2.11 — approx distinct (HLL). No oracle on the VALUES (sketch
    // estimates are implementation-specific; driver records a
    // rows-only check) — but the accuracy of this exact path is
    // hash-pinned by the hll_estimate_bounds twin below.
    "hll_approx_users" -> { (s, d) =>
      events(s, d).groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("approx_users"))
    },

    // Sketch-as-data rollup (ops/Sketches): distinct users per type
    // answered from a day-grained HLL sketch table by lossless union —
    // the persisted-cube pattern that serves every coarser rollup
    // without re-scanning raw events. Approximate -> rows-only check;
    // SketchesSpec pins rollup == sketch-of-whole and ~exactness, and
    // the hll_union_lossless / hll_estimate_bounds twins hash-pin the
    // union and accuracy invariants of this exact path.
    "hll_rollup_users" -> { (s, d) =>
      val daily = graft.ops.Sketches.buildHllCube(
        events(s, d).withColumn("day", to_date(col("ts"))),
        Seq("day", "event_type"), "user_id")
      graft.ops.Sketches.rollupDistinct(daily, Seq("event_type"))
    },

    // The invariant that makes the sketch-cube pattern SOUND, as a
    // hash-checkable driver entry: HLL union is lossless, so rolling
    // day-grain sketches up to event_type must estimate EXACTLY what a
    // sketch built over the whole type estimates (registers are
    // max-merged — order- and partition-independent). Sketch VALUES
    // stay implementation-specific (hll_rollup_users remains
    // rows-only), but this per-group equality is deterministic: the
    // oracle is the literal TRUE per group.
    "hll_union_lossless" -> { (s, d) =>
      val ev = events(s, d).withColumn("day", to_date(col("ts")))
      val viaRollup = graft.ops.Sketches.rollupDistinct(
        graft.ops.Sketches.buildHllCube(ev, Seq("day", "event_type"),
          "user_id"),
        Seq("event_type"), estimateCol = "est_rollup")
      val whole = graft.ops.Sketches.buildHllCube(ev, Seq("event_type"),
          "user_id")
        .select(col("event_type"),
          hll_sketch_estimate(col("hll")).as("est_whole"))
      viaRollup.join(whole, "event_type")
        .select(col("event_type"),
          (col("est_rollup") === col("est_whole")).as("union_lossless"))
    },

    // The ACCURACY invariant as a hash-checkable entry — the bounds
    // twin that makes the two estimate-valued HLL entries
    // (hll_approx_users, hll_rollup_users) checkable: per event_type,
    // BOTH engine estimate paths — the datasketches
    // rollup-of-day-sketches (hll_rollup_users' exact pipeline) and
    // the default-rsd approx_count_distinct (hll_approx_users') —
    // must land within an eps matched to each path's configured
    // accuracy: 5% for lgK=12 datasketches (~3x its 1.6% rel err) and
    // 15% for the HLL++ default rsd 0.05 (3 standard deviations;
    // measured 6.7% at sf0.1 — a 5% bound there would pin luck, not
    // the contract). The estimates are deterministic functions of the
    // data, so the booleans are stable and the oracle is the literal
    // TRUE per group (the hll_union_lossless convention); an
    // implementation drift past its bound turns the entry red even
    // though the estimate VALUES stay engine-specific.
    "hll_estimate_bounds" -> { (s, d) =>
      val ev = events(s, d).withColumn("day", to_date(col("ts")))
      val viaRollup = graft.ops.Sketches.rollupDistinct(
        graft.ops.Sketches.buildHllCube(ev, Seq("day", "event_type"),
          "user_id"),
        Seq("event_type"), estimateCol = "est_rollup")
      val viaApprox = ev.groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("est_approx"),
          countDistinct(col("user_id")).as("exact_users"))
      viaApprox.join(viaRollup, "event_type")
        .select(col("event_type"),
          (abs(col("est_rollup") - col("exact_users")).cast("double")
            <= lit(0.05) * col("exact_users")).as("rollup_within_eps"),
          (abs(col("est_approx") - col("exact_users")).cast("double")
            <= lit(0.15) * col("exact_users")).as("approx_within_eps"))
    },

    // Mergeable quantile-sketch cube (the percentile analogue of
    // hll_rollup_users): ONE raw scan builds day-grain equi-width
    // histogram sketches (custom EqHistAgg, map-side combinable);
    // the event_type-grain percentiles are answered entirely from the
    // sketches (element-wise HistMergeAgg union + codegen'd HOF rank
    // walk — no explode, no raw re-scan). Deterministic bin edges make
    // the whole chain hash-oracle-able, unlike percentile_approx.
    "quantile_sketch_cube" -> { (s, d) =>
      val cube = graft.ops.Sketches.buildHistCube(
        events(s, d).filter(col("value").isNotNull)
          .withColumn("day", to_date(col("ts"))),
        Seq("event_type", "day"), "value", lo = 0.0, hi = 200.0,
        bins = 256)
      graft.ops.Sketches.rollupQuantiles(cube, Seq("event_type"),
        lo = 0.0, hi = 200.0,
        qs = Seq("p50" -> 0.5, "p95" -> 0.95, "p99" -> 0.99))
    },

    // Skew-safe EXACT distinct: two-phase salted aggregation — a hot
    // group's distinct set spreads over salt buckets instead of one
    // reducer (SkewTools). Result is exact, so it oracles directly.
    "skew_salted_distinct" -> { (s, d) =>
      graft.ops.SkewTools.saltedCountDistinct(
        events(s, d), "event_type", "user_id", salts = 16)
    },

    // §2.11 gap — backward as-of join (engine operator Spark lacks;
    // union+window implementation, DuckDB native ASOF JOIN as oracle):
    // each click matched to the user's latest prior-or-equal purchase.
    "asof_join" -> { (s, d) =>
      val ev = events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      graft.ops.AsOfJoin.backward(clicks, purchases, key = "user_id",
        leftTs = "ts", rightTs = "ts", rightCols = Seq("ts", "value"))
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("ts_ms"), col("value"),
          unix_millis(col("asof_ts")).as("asof_ts_ms"),
          col("asof_value"))
    },

    // §2.11 — session windows (30-minute inactivity gap per user).
    "session_windows" -> { (s, d) =>
      events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
        .select(col("user_id"),
          unix_millis(col("session_window.start")).as("session_start_ms"),
          col("n_events"), col("total_value"))
    },

    // §2.11 — FORWARD as-of join (next-event attribution): each click
    // matched to the user's earliest at-or-after purchase. Same
    // union+window operator scanned in descending time order; DuckDB's
    // native ASOF with the reversed inequality is the oracle.
    "asof_join_forward" -> { (s, d) =>
      val ev = events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      graft.ops.AsOfJoin.forward(clicks, purchases, key = "user_id",
        leftTs = "ts", rightTs = "ts", rightCols = Seq("ts", "value"))
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("ts_ms"), col("value"),
          unix_millis(col("asof_ts")).as("next_ts_ms"),
          col("asof_value").as("next_value"))
    },

    // §2.11 — bounded-interval range join, bin-bucketed to stay an
    // equi-join (ops/RangeJoin): purchases within the 6 hours before
    // each click, per user. The oracle is the naive theta-join the
    // operator must reproduce exactly.
    "range_join_recent" -> { (s, d) =>
      val ev = events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      graft.ops.RangeJoin.byTime(clicks, purchases, key = "user_id",
        leftTs = "ts", rightTs = "ts",
        beforeMs = 6L * 3600 * 1000, afterMs = 0L)
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("ts_ms"),
          col("r_event_id"), unix_millis(col("r_ts")).as("r_ts_ms"),
          col("r_value"))
    },

    // §2.11 — cohort retention (the classic event-analytics matrix):
    // users grouped by first-activity day, counted per week-offset of
    // later activity. The cohort aggregate and the activity join share
    // the user_id partitioning (one exchange reused), then two
    // partial-agg shuffles on day-keyed groups; all-integer arithmetic,
    // engine-exact.
    "cohort_retention" -> { (s, d) =>
      val ev = events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val first = ev.groupBy(col("user_id")).agg(min(col("day")).as("day0"))
      ev.join(first, "user_id")
        .select(col("user_id"), col("day0"),
          floor(datediff(col("day"), col("day0")) / 7.0).cast("int")
            .as("week_offset"))
        .distinct()
        .groupBy(col("day0").as("cohort_day"), col("week_offset"))
        .agg(count(lit(1)).as("n_users"))
    },

    // §2.11 — UNPIVOT/melt (inverse of the pivot showcase): per-nation
    // order metrics wide -> (n_name, metric, value) long form via the
    // built-in unpivot — a pure per-row generator above the aggregate,
    // no extra shuffle. Metrics are exact (counts + min/max; no
    // order-dependent FP sums), nation is broadcast.
    "unpivot_metrics" -> { (s, d) =>
      val wide = orders(s, d)
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).cast("double").as("n_orders"),
          count_distinct(col("o_custkey")).cast("double").as("n_customers"),
          max(col("o_totalprice")).as("max_price"),
          min(col("o_totalprice")).as("min_price"))
      wide.unpivot(Array(col("n_name")),
        Array(col("n_orders"), col("n_customers"), col("max_price"),
          col("min_price")), "metric", "value")
    },

    // §2.11 — exact discrete quantiles (SQL-standard percentile_disc
    // picks an element of the set: no interpolation arithmetic to
    // diverge between engines).
    "quantiles_disc" -> { (s, d) =>
      events(s, d).groupBy(col("event_type"))
        .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)")
          .as("p50"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY value)")
            .as("p90"),
          count(lit(1)).as("n"))
    },

    // §2.11 — the SQL-parser surface itself: TPC-H Q3 (shippable
    // revenue of unshipped orders) submitted as TEXT through spark.sql
    // over temp views — the one entry that proves a reference user can
    // bring plain SQL, not just the DataFrame API. Catalyst plans it
    // identically to the DataFrame form: dim filter pushed to the
    // customer scan, fact join shuffles on the keys.
    "sql_tpch_q3" -> { (s, d) =>
      customer(s, d).createOrReplaceTempView("g_customer")
      orders(s, d).createOrReplaceTempView("g_orders")
      lineitem(s, d).createOrReplaceTempView("g_lineitem")
      s.sql("""
        SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_day,
          o_orderpriority,
          sum(l_extendedprice * (1 - l_discount)) AS revenue,
          count(*) AS n_items
        FROM g_customer
        JOIN g_orders ON c_custkey = o_custkey
        JOIN g_lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-06-01'
          AND l_shipdate > TIMESTAMP '1997-06-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority""")
    },

    // SQL-text path, TPC-H Q5 shape: the 6-table join chain through the
    // region dimension — the parser + join-reorder generality check
    // (region/nation broadcast; lineitem never joins without its
    // orderkey equi-condition).
    "sql_tpch_q5" -> { (s, d) =>
      customer(s, d).createOrReplaceTempView("g_customer")
      orders(s, d).createOrReplaceTempView("g_orders")
      lineitem(s, d).createOrReplaceTempView("g_lineitem")
      supplier(s, d).createOrReplaceTempView("g_supplier")
      nation(s, d).createOrReplaceTempView("g_nation")
      region(s, d).createOrReplaceTempView("g_region")
      s.sql("""
        SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS revenue,
          count(*) AS n_items
        FROM g_customer
        JOIN g_orders ON c_custkey = o_custkey
        JOIN g_lineitem ON l_orderkey = o_orderkey
        JOIN g_supplier ON l_suppkey = s_suppkey
          AND c_nationkey = s_nationkey
        JOIN g_nation ON s_nationkey = n_nationkey
        JOIN g_region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name""")
    },

    // SQL-text path, TPC-H Q10 shape: returned-item revenue per
    // customer, top 20 (deterministic tiebreak on custkey).
    "sql_tpch_q10" -> { (s, d) =>
      customer(s, d).createOrReplaceTempView("g_customer")
      orders(s, d).createOrReplaceTempView("g_orders")
      lineitem(s, d).createOrReplaceTempView("g_lineitem")
      nation(s, d).createOrReplaceTempView("g_nation")
      s.sql("""
        SELECT c_custkey, c_name, n_name,
          sum(l_extendedprice * (1 - l_discount)) AS revenue,
          round(sum(c_acctbal) / count(*), 4) AS acctbal
        FROM g_customer
        JOIN g_orders ON c_custkey = o_custkey
        JOIN g_lineitem ON l_orderkey = o_orderkey
        JOIN g_nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20""")
    },

    // SQL-text path, TPC-H Q18 shape (large-volume customer): the
    // HAVING-subquery semi-join pattern — the inner group-by must plan
    // as one lineitem pass whose result SEMI-joins orders (never a
    // re-scan per order), then the outer 3-table join re-aggregates.
    "sql_tpch_q18" -> { (s, d) =>
      customer(s, d).createOrReplaceTempView("g_customer")
      orders(s, d).createOrReplaceTempView("g_orders")
      lineitem(s, d).createOrReplaceTempView("g_lineitem")
      s.sql("""
        SELECT c_name, c_custkey, o_orderkey,
          CAST(o_orderdate AS DATE) AS order_day, o_totalprice,
          sum(l_quantity) AS total_qty
        FROM g_customer
        JOIN g_orders ON c_custkey = o_custkey
        JOIN g_lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM g_lineitem
          GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice""")
    },

    // §2.11 — explicit GROUPING SETS (finer than cube_rollup's
    // ROLLUP): the two one-dimension marginals plus the full cross,
    // with arithmetic grouping flags so both engines report identical
    // provenance bits. Plans as ONE scan + Expand — never one scan per
    // grouping set.
    "grouping_sets_report" -> { (s, d) =>
      lineitem(s, d).createOrReplaceTempView("g_lineitem_gs")
      s.sql("""
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
          coalesce(l_linestatus, 'ALL') AS linestatus,
          grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid,
          sum(l_quantity) AS sum_qty, count(*) AS n
        FROM g_lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
          (l_returnflag, l_linestatus))""")
    },

    // §2.11 — strict-order funnel cascade (ops/EventAnalytics): how many
    // users did view -> click -> purchase IN ORDER. One shuffle on
    // user_id; each later step is array arithmetic above it (no
    // per-step self-join). Oracle = the cascading min-after-min CTEs.
    "funnel_steps" -> { (s, d) =>
      graft.ops.EventAnalytics.funnelCounts(events(s, d), "user_id",
        "event_type", "ts", Seq("view", "click", "purchase"))
    },

    // §2.11 — funnel conversion latency: over users who completed the
    // cascade, the distribution of view -> purchase time. All-integer
    // millis + percentile_disc (element-picking), so the oracle replays
    // exactly on the same cascading CTEs.
    "funnel_latency" -> { (s, d) =>
      val times = graft.ops.EventAnalytics.funnelSteps(events(s, d),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      times.filter(col("t_2").isNotNull)
        .select((col("t_2") - col("t_0")).as("ms"))
        .agg(count(lit(1)).as("n_converted"),
          min(col("ms")).as("min_ms"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY ms)")
            .cast("long").as("p50_ms"),
          max(col("ms")).as("max_ms"))
    },

    // §2.11 — event-transition matrix: (event, user's next event)
    // counts in (ts, event_id) order — the Markov view of the log.
    // User-partitioned window: partitions are entity-sized, never a
    // global sort.
    "event_transitions" -> { (s, d) =>
      graft.ops.EventAnalytics.transitionCounts(events(s, d), "user_id",
        "event_type", "ts", "event_id")
    },

    // §2.5 — one-pass column profiling (the warehouse ANALYZE shape):
    // nulls / exact distinct / min / max for every metric column in ONE
    // scan. The multi-distinct lands as Catalyst's Expand (rows×k into
    // one shuffle, not k scans); the 1-row aggregate explodes to
    // per-column rows in-plan, so the driver never sees data.
    "profile_columns" -> { (s, d) =>
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val li = lineitem(s, d)
      val aggs = cols.flatMap { c => Seq(
        (count(lit(1)) - count(col(c))).as(s"${c}_nulls"),
        count_distinct(col(c)).as(s"${c}_distinct"),
        min(col(c)).cast("double").as(s"${c}_min"),
        max(col(c)).cast("double").as(s"${c}_max"))
      }
      val one = li.agg(count(lit(1)).as("n_rows"), aggs: _*)
      val rows = cols.map { c =>
        struct(lit(c).as("col_name"), col("n_rows"),
          col(s"${c}_nulls").as("n_nulls"),
          col(s"${c}_distinct").as("n_distinct"),
          col(s"${c}_min").as("min_val"), col(s"${c}_max").as("max_val"))
      }
      one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "sql_tpch_q3" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_day,
        |  o_orderpriority,
        |  sum(l_extendedprice * (1 - l_discount)) AS revenue,
        |  count(*) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-06-01'
        |  AND l_shipdate > TIMESTAMP '1997-06-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority""".stripMargin,

    "sql_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey,
        |  CAST(o_orderdate AS DATE) AS order_day, o_totalprice,
        |  sum(l_quantity) AS total_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice""".stripMargin,

    "sql_tpch_q5" ->
      """SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS revenue,
        |  count(*) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name""".stripMargin,

    "sql_tpch_q10" ->
      """SELECT c_custkey, c_name, n_name,
        |  sum(l_extendedprice * (1 - l_discount)) AS revenue,
        |  round(sum(c_acctbal) / count(*), 4) AS acctbal
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "grouping_sets_report" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
        |  sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
        |  (l_returnflag, l_linestatus))""".stripMargin,

    // funnel replay: cascading min-after-min CTEs; ms-resolution strict
    // inequality on both sides (epoch_ms truncates like unix_millis)
    "funnel_steps" ->
      """WITH v AS (SELECT user_id, min(epoch_ms(ts)) AS t0 FROM events
        |    WHERE event_type = 'view' GROUP BY user_id),
        |  c AS (SELECT e.user_id, min(epoch_ms(e.ts)) AS t1
        |    FROM events e JOIN v USING (user_id)
        |    WHERE e.event_type = 'click' AND epoch_ms(e.ts) > v.t0
        |    GROUP BY e.user_id),
        |  p AS (SELECT e.user_id, min(epoch_ms(e.ts)) AS t2
        |    FROM events e JOIN c USING (user_id)
        |    WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) > c.t1
        |    GROUP BY e.user_id)
        |SELECT * FROM (VALUES
        |  (0, 'view', (SELECT count(*) FROM v)),
        |  (1, 'click', (SELECT count(*) FROM c)),
        |  (2, 'purchase', (SELECT count(*) FROM p)))
        |  AS t(step_idx, step, n_users)""".stripMargin,

    "funnel_latency" ->
      """WITH v AS (SELECT user_id, min(epoch_ms(ts)) AS t0 FROM events
        |    WHERE event_type = 'view' GROUP BY user_id),
        |  c AS (SELECT e.user_id, min(epoch_ms(e.ts)) AS t1
        |    FROM events e JOIN v USING (user_id)
        |    WHERE e.event_type = 'click' AND epoch_ms(e.ts) > v.t0
        |    GROUP BY e.user_id),
        |  p AS (SELECT e.user_id, min(epoch_ms(e.ts)) AS t2
        |    FROM events e JOIN c USING (user_id)
        |    WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) > c.t1
        |    GROUP BY e.user_id),
        |  lat AS (SELECT p.t2 - v.t0 AS ms FROM p JOIN v USING (user_id))
        |SELECT count(*) AS n_converted, min(ms) AS min_ms,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY ms) AS p50_ms,
        |  max(ms) AS max_ms FROM lat""".stripMargin,

    // order by epoch_us, not raw ts: a nanosecond-encoded fixture would
    // otherwise tie-break at ns in DuckDB while Spark (micros) uses
    // event_id — same resolution pinning as the funnel's epoch_ms
    "event_transitions" ->
      """WITH nxt AS (SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS to_type
        |  FROM events)
        |SELECT from_type, to_type, count(*) AS n FROM nxt
        |WHERE to_type IS NOT NULL GROUP BY from_type, to_type""".stripMargin,

    "profile_columns" ->
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_nulls,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS DOUBLE) AS min_val,
           |  CAST(max($c) AS DOUBLE) AS max_val FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n"),

    // cohort replay: same day truncation (both engines naive/UTC),
    // same floor(days/7) offset, distinct then count
    "cohort_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |f AS (SELECT user_id, min(day) AS day0 FROM e GROUP BY user_id),
        |w AS (SELECT DISTINCT e.user_id, f.day0,
        |    CAST(floor(date_diff('day', f.day0, e.day) / 7.0) AS INT)
        |      AS week_offset
        |  FROM e JOIN f USING (user_id))
        |SELECT day0 AS cohort_day, week_offset, count(*) AS n_users
        |FROM w GROUP BY day0, week_offset""".stripMargin,

    // unpivot replay: the wide aggregate UNPIVOTed (DuckDB's UNPIVOT
    // emits the same (id, name, value) long form as Spark's melt)
    "unpivot_metrics" ->
      """WITH wide AS (
        |  SELECT n_name,
        |    CAST(count(*) AS DOUBLE) AS n_orders,
        |    CAST(count(DISTINCT o_custkey) AS DOUBLE) AS n_customers,
        |    max(o_totalprice) AS max_price,
        |    min(o_totalprice) AS min_price
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name)
        |SELECT n_name, metric, value FROM wide
        |UNPIVOT (value FOR metric IN
        |  (n_orders, n_customers, max_price, min_price))""".stripMargin,

    "skew_salted_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_distinct
        |FROM events GROUP BY event_type""".stripMargin,

    // quantile_sketch_cube: day-grain sketches merged to event_type
    // collapse to direct per-type bin counts (element-wise sum is
    // associative), so the oracle bins once and replays the same rank
    // rule: r = max(ceil(q*n), 1), first bin with cumulative >= r,
    // linear rank interpolation within the bin. Bin width 200/256 and
    // the clamp into edge bins mirror EqHistAgg exactly.
    "quantile_sketch_cube" ->
      """WITH b AS (
        |  SELECT event_type,
        |    CAST(least(greatest(floor(value / (200.0 / 256.0)), 0), 255)
        |      AS INT) AS bin
        |  FROM events WHERE value IS NOT NULL),
        |c AS (
        |  SELECT event_type, bin, count(*) AS cnt FROM b GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, bin, cnt,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM c),
        |q(qname, q) AS (VALUES ('p50', 0.5), ('p95', 0.95), ('p99', 0.99)),
        |r AS (
        |  SELECT t.event_type, q.qname,
        |    min_by(
        |      (200.0 / 256.0) * (t.bin
        |        + (greatest(ceil(q.q * t.n), 1) - (t.cum - t.cnt))
        |          / CAST(t.cnt AS DOUBLE)),
        |      t.bin)
        |      FILTER (WHERE t.cum >= greatest(ceil(q.q * t.n), 1)) AS est
        |  FROM t, q GROUP BY 1, 2)
        |SELECT event_type,
        |  max(CASE WHEN qname = 'p50' THEN est END) AS p50,
        |  max(CASE WHEN qname = 'p95' THEN est END) AS p95,
        |  max(CASE WHEN qname = 'p99' THEN est END) AS p99
        |FROM r GROUP BY event_type""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_base_price,
        |  sum(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "p3_window_slice" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
        |  CAST(l_shipdate AS DATE) AS ship_day
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1995-12-31'
        |  AND l_partkey BETWEEN 100 AND 900""".stripMargin,

    "p9_nodata_mask" ->
      """SELECT l_orderkey, l_linenumber,
        |  nullif(l_quantity, 1.0) AS qty_masked,
        |  coalesce(nullif(l_quantity, 1.0), -3000.0) AS qty_filled
        |FROM lineitem""".stripMargin,

    "j1_multi_grid_align" ->
      """SELECT n_name, sum(o_totalprice) AS revenue, count(*) AS n_orders
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "j4_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "j5_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '1998-01-01')""".stripMargin,

    "j6_broadcast_lookup" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey""".stripMargin,

    "j7_coverage_check" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)""".stripMargin,

    "j8_intersect_keys" ->
      """SELECT l_partkey AS partkey FROM lineitem
        |INTERSECT
        |SELECT p_partkey AS partkey FROM part""".stripMargin,

    "set_union_nationkeys" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,

    // brute-force theta-join truth for the deletion-neighborhood join
    "fuzzy_join_names" ->
      """WITH a AS (SELECT s_suppkey AS a_id, s_name AS a_str FROM supplier),
        |b AS (SELECT s_suppkey AS b_id,
        |    concat(substr(s_name, 1, CAST(s_suppkey % length(s_name) AS INT)),
        |      substr(s_name, CAST(s_suppkey % length(s_name) AS INT) + 2,
        |        1000000)) AS b_str
        |  FROM supplier)
        |SELECT a_id, b_id, CAST(levenshtein(a_str, b_str) AS INT) AS dist
        |FROM a, b WHERE levenshtein(a_str, b_str) <= 1""".stripMargin,

    "set_except_custkeys" ->
      """SELECT o_custkey AS custkey FROM orders
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1998-01-01'""".stripMargin,

    "a1_incomplete_days" ->
      """SELECT CAST(ts AS DATE) AS day,
        |  count(DISTINCT event_type) AS n_types,
        |  count(*) AS n_events,
        |  count(DISTINCT event_type) = 5 AS complete
        |FROM events GROUP BY CAST(ts AS DATE)""".stripMargin,

    "a2_distinct_dates" ->
      """SELECT DISTINCT CAST(o_orderdate AS DATE) AS day FROM orders ORDER BY day""".stripMargin,

    "a4_group_counts" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer GROUP BY c_mktsegment""".stripMargin,

    "a5_index_select" ->
      """SELECT vec_id, embedding[(label % 64) + 1] AS picked FROM embeddings""".stripMargin,

    "a6_distinct_labels" ->
      """SELECT DISTINCT label FROM embeddings""".stripMargin,

    "w1_series_lag" ->
      """SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value,
        |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
        |FROM events""".stripMargin,

    "w2_running_sum" ->
      """SELECT user_id, event_id,
        |  sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_value
        |FROM events""".stripMargin,

    "o1_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin,

    "o4_minmax_dates" ->
      """SELECT CAST(min(o_orderdate) AS DATE) AS d_min,
        |  CAST(max(o_orderdate) AS DATE) AS d_max,
        |  count(*) AS n
        |FROM orders""".stripMargin,

    "f1_date_codecs" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y,
        |  dayofyear(o_orderdate) AS doy,
        |  strftime(o_orderdate, '%Y_%m_%d') AS ymd,
        |  epoch_ms(o_orderdate) AS ts_ms
        |FROM orders""".stripMargin,

    "f2_regex_parse" ->
      """SELECT doc_id,
        |  CAST(regexp_extract(source, 'src([0-9]+)', 1) AS INT) AS src_num
        |FROM documents""".stripMargin,

    "f7_class_lookup" ->
      """SELECT CASE event_type
        |    WHEN 'click' THEN 1 WHEN 'view' THEN 2 WHEN 'purchase' THEN 3
        |    WHEN 'signup' THEN 4 WHEN 'error' THEN 5 ELSE 0 END AS type_code,
        |  count(*) AS n
        |FROM events
        |GROUP BY 1""".stripMargin,

    "f9_chunk_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_partkey % 4800 AS px,
        |  l_suppkey % 4800 AS py,
        |  CAST(floor((l_partkey % 4800) / 400) AS BIGINT) AS frac_x,
        |  CAST(floor((l_suppkey % 4800) / 400) AS BIGINT) AS frac_y,
        |  CAST(floor((l_suppkey % 4800) / 400) * 12
        |    + floor((l_partkey % 4800) / 400) AS BIGINT) AS frac_num
        |FROM lineitem""".stripMargin,

    "st2_gap_fill" ->
      """WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
        |  types AS (SELECT DISTINCT event_type FROM events),
        |  observed AS (SELECT DISTINCT CAST(ts AS DATE) AS day, event_type
        |    FROM events WHERE value > 90)
        |SELECT d.day, t.event_type, CAST(-3000.0 AS DOUBLE) AS fill_value
        |FROM days d CROSS JOIN types t
        |WHERE NOT EXISTS (SELECT 1 FROM observed o
        |  WHERE o.day = d.day AND o.event_type = t.event_type)""".stripMargin,

    "cube_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "rank_topn" ->
      """SELECT * FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    rank() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 5""".stripMargin,

    "layout_zorder" -> {
      // the same 16-bit Morton interleave, unrolled as DuckDB bit ops
      val terms = (0 until 16).map { i =>
        s"((((o_custkey & 65535) >> $i) & 1) << ${2 * i}) + " +
          s"((((o_orderkey & 65535) >> $i) & 1) << ${2 * i + 1})"
      }.mkString(" + ")
      s"SELECT o_orderkey, o_custkey, CAST($terms AS BIGINT) AS zkey FROM orders"
    },

    "layout_hilbert" -> {
      // the same 16-bit Hilbert walk, one nested subselect per bit
      // level (s = 2^15 .. 1): d += s²·(3·rx XOR ry), then the
      // quadrant rotate/flip of (x, y). mask 65535 = n-1 reflections.
      val bits = 16
      val mask = (1L << bits) - 1
      var q = "SELECT o_orderkey, o_custkey, " +
        s"CAST(o_custkey & $mask AS BIGINT) AS x, " +
        s"CAST(o_orderkey & $mask AS BIGINT) AS y, " +
        "CAST(0 AS BIGINT) AS d FROM orders"
      for (i <- (bits - 1) to 0 by -1) {
        val s = 1L << i
        q = s"""SELECT o_orderkey, o_custkey,
           |  CASE WHEN (y & $s) = 0 THEN
           |    CASE WHEN (x & $s) <> 0 THEN $mask - y ELSE y END
           |  ELSE x END AS x,
           |  CASE WHEN (y & $s) = 0 THEN
           |    CASE WHEN (x & $s) <> 0 THEN $mask - x ELSE x END
           |  ELSE y END AS y,
           |  d + ${s * s} * xor(
           |    CASE WHEN (x & $s) <> 0 THEN 3 ELSE 0 END,
           |    CASE WHEN (y & $s) <> 0 THEN 1 ELSE 0 END) AS d
           |FROM ($q)""".stripMargin
      }
      s"SELECT o_orderkey, o_custkey, d AS hkey FROM ($q)"
    },

    "topk_group" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 5""".stripMargin,

    "tumbling_daily" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |  count(*) AS n, sum(value) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // the lossless-union invariant is deterministic even though the
    // estimates are not engine-portable: per group, rollup-of-parts
    // equals sketch-of-whole EXACTLY, so the oracle is TRUE per group
    "hll_union_lossless" ->
      """SELECT event_type, TRUE AS union_lossless
        |FROM events GROUP BY event_type""".stripMargin,

    // the accuracy bound is deterministic even though the estimates
    // are not engine-portable: per group, |estimate - exact| <= 5% of
    // exact for both engine paths, so the oracle is TRUE per group
    "hll_estimate_bounds" ->
      """SELECT event_type, TRUE AS rollup_within_eps,
        |  TRUE AS approx_within_eps
        |FROM events GROUP BY event_type""".stripMargin,

    // two-proportion z replay: same per-user conversion max, same
    // fixed-order double chain (pool*(1-pool) first, then the 1/n sum)
    "experiment_lift" ->
      """WITH u AS (SELECT user_id, CAST(user_id % 2 AS INT) AS v,
        |    max(CASE WHEN event_type = 'purchase' AND value >= 95.0
        |        THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY 1, 2),
        |a AS (SELECT
        |    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN v = 0 THEN conv ELSE 0 END) AS BIGINT) AS c_a,
        |    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN v = 1 THEN conv ELSE 0 END) AS BIGINT) AS c_b
        |  FROM u),
        |m AS (SELECT n_a, c_a, n_b, c_b,
        |    CAST(c_a AS DOUBLE) / n_a AS p_a,
        |    CAST(c_b AS DOUBLE) / n_b AS p_b,
        |    CAST(c_a + c_b AS DOUBLE) / (n_a + n_b) AS pool
        |  FROM a)
        |SELECT n_a, c_a, n_b, c_b,
        |  round(CASE WHEN n_a > 0 THEN p_a END, 6) AS rate_a,
        |  round(CASE WHEN n_b > 0 THEN p_b END, 6) AS rate_b,
        |  round(CASE WHEN n_a > 0 AND n_b > 0 THEN p_a - p_b END, 6)
        |    AS lift,
        |  round(CASE WHEN n_a > 0 AND n_b > 0
        |      AND pool > 0.0 AND pool < 1.0
        |    THEN (p_a - p_b) / sqrt(pool * (1.0 - pool)
        |      * (1.0 / n_a + 1.0 / n_b)) END, 6) AS z
        |FROM m""".stripMargin,

    "json_props" ->
      """SELECT event_id,
        |  CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) AS k
        |FROM events""".stripMargin,

    "asof_join" ->
      """SELECT l.event_id, l.user_id, epoch_ms(l.ts) AS ts_ms, l.value,
        |  epoch_ms(r.ts) AS asof_ts_ms, r.value AS asof_value
        |FROM (SELECT event_id, user_id, ts, value FROM events
        |      WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
        |      WHERE event_type = 'purchase') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin,

    "session_windows" ->
      """WITH e AS (SELECT user_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM events),
        |f AS (SELECT user_id, ts, value,
        |    CASE WHEN prev IS NULL OR ts >= prev + INTERVAL 30 MINUTE
        |      THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |g AS (SELECT user_id, ts, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM f)
        |SELECT user_id, epoch_ms(min(ts)) AS session_start_ms,
        |  count(*) AS n_events, sum(value) AS total_value
        |FROM g GROUP BY user_id, sess""".stripMargin,

    "asof_join_forward" ->
      """SELECT l.event_id, l.user_id, epoch_ms(l.ts) AS ts_ms, l.value,
        |  epoch_ms(r.ts) AS next_ts_ms, r.value AS next_value
        |FROM (SELECT event_id, user_id, ts, value FROM events
        |      WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
        |      WHERE event_type = 'purchase') r
        |  ON l.user_id = r.user_id AND l.ts <= r.ts""".stripMargin,

    "range_join_recent" ->
      """SELECT l.event_id, l.user_id, epoch_ms(l.ts) AS ts_ms,
        |  r.event_id AS r_event_id, epoch_ms(r.ts) AS r_ts_ms,
        |  r.value AS r_value
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'click') l
        |JOIN (SELECT event_id, user_id, ts, value FROM events
        |      WHERE event_type = 'purchase') r
        |  ON l.user_id = r.user_id
        |  AND r.ts >= l.ts - INTERVAL 6 HOUR AND r.ts <= l.ts""".stripMargin,

    "quantiles_disc" ->
      """SELECT event_type,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50,
        |  percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS p90,
        |  count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin
  )
}
