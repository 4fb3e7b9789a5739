package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** Streaming semantics: the same transform applied to a file-source
  * stream (memory sink, processAllAvailable) must equal the batch run.
  */
class EventStreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // small deterministic event set written as parquet for the file source
  lazy val srcDir: String = {
    val d = TestSpark.tmpDir("stream_src")
    val df = (0 until 500).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, i / 60, i % 60, 0)),
        (i % 37).toLong,
        Seq("click", "view", "purchase")(i % 3),
        (i % 100) / 10.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    df.write.mode("overwrite").parquet(d)
    d
  }

  def streamEvents = spark.readStream
    .schema(StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType))))
    .parquet(srcDir)

  test("streaming hourly window agg equals the batch result") {
    val q = EventStreaming.hourlyTypeCounts(streamEvents)
      .writeStream.outputMode("append")
      .format("memory").queryName("hourly")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // append mode only emits windows below the watermark; compare those
    val got = spark.table("hourly")
    val batch = EventStreaming.hourlyTypeCounts(spark.read.parquet(srcDir))
    // batch mode ignores the watermark and emits everything; the stream
    // (single batch + AvailableNow) emits all windows closed at end
    assert(got.count() > 0)
    val joined = got.join(batch,
      Seq("hour_start", "event_type", "n", "total_value"), "left_anti")
    assert(joined.isEmpty, "every streamed window must match batch")
  }

  test("stateful per-user running summary equals batch totals") {
    val out = EventStreaming.userRunningSummary(spark,
      spark.read.parquet(srcDir).as[EventStreaming.EventRow])
    val got = out.collect().map(s => s.user_id -> (s.n_events, s.total_value)).toMap
    val batch = spark.read.parquet(srcDir)
      .groupBy("user_id").agg(count(lit(1)).as("n"), sum("value").as("v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == batch.keySet)
    got.foreach { case (u, (n, v)) =>
      assert(n == batch(u)._1 && math.abs(v - batch(u)._2) < 1e-9, s"user $u")
    }
  }

  test("streaming dedup drops re-delivered event ids") {
    // duplicate the source into a second directory batch
    val d2 = TestSpark.tmpDir("stream_dup")
    spark.read.parquet(srcDir).write.mode("overwrite").parquet(d2)
    spark.read.parquet(srcDir).write.mode("append").parquet(d2)
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema).parquet(d2)
    val q = EventStreaming.dedupByEventId(stream)
      .groupBy().count()
      .writeStream.outputMode("complete")
      .format("memory").queryName("deduped")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val n = spark.table("deduped").head().getLong(0)
    assert(n == 500, s"expected 500 unique events, got $n")
  }

  test("streaming sketch-cube maintenance equals the batch rollup") {
    // the sketch table as a continuously-maintained product: the same
    // hll_sketch_agg cube over the stream (complete mode = the current
    // cube each trigger); distinct-count rollups from the streamed cube
    // must equal batch exactly (HLL state is a function of the VALUE
    // SET, so trigger boundaries cannot change estimates)
    val cube = graft.ops.Sketches.buildHllCube(
      streamEvents.withColumn("day", to_date(col("ts"))),
      Seq("day", "event_type"), "user_id")
    val q = cube.writeStream.outputMode("complete")
      .format("memory").queryName("hll_cube_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = graft.ops.Sketches.rollupDistinct(
        spark.table("hll_cube_stream"), Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = graft.ops.Sketches.rollupDistinct(
        graft.ops.Sketches.buildHllCube(
          spark.read.parquet(srcDir).withColumn("day", to_date(col("ts"))),
          Seq("day", "event_type"), "user_id"),
        Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("streaming histogram-cube maintenance equals the batch percentiles") {
    // same continuously-maintained-product shape as the HLL cube: the
    // equi-width histogram sketch is a pure function of the value
    // MULTISET (commutative + associative custom aggregate), so the
    // complete-mode streamed cube must roll up to bit-identical
    // percentiles regardless of trigger boundaries
    val cube = graft.ops.Sketches.buildHistCube(
      streamEvents.filter(col("value").isNotNull)
        .withColumn("day", to_date(col("ts"))),
      Seq("day", "event_type"), "value", 0.0, 10.0, bins = 64)
    val q = cube.writeStream.outputMode("complete")
      .format("memory").queryName("hist_cube_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val qs = Seq("p50" -> 0.5, "p95" -> 0.95)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    val streamed = canon(graft.ops.Sketches.rollupQuantiles(
      spark.table("hist_cube_stream"), Seq("event_type"), 0.0, 10.0, qs))
    val batch = canon(graft.ops.Sketches.rollupQuantiles(
      graft.ops.Sketches.buildHistCube(
        spark.read.parquet(srcDir).filter(col("value").isNotNull)
          .withColumn("day", to_date(col("ts"))),
        Seq("day", "event_type"), "value", 0.0, 10.0, bins = 64),
      Seq("event_type"), 0.0, 10.0, qs))
    assert(streamed == batch && streamed.size == 3)
  }

  test("streaming per-key top-k state carries across batches, equals TopKAgg") {
    // two DISJOINT source files + maxFilesPerTrigger(1) force two
    // micro-batches; the second batch's emission must still contain
    // first-batch winners (state carry-over), and must equal the batch
    // bounded-heap aggregate over the full data
    val d2 = TestSpark.tmpDir("topk_stream")
    val full = spark.read.parquet(srcDir)
    full.filter(col("event_id") < 250).repartition(1)
      .write.mode("overwrite").parquet(s"$d2/w1.parquet")
    full.filter(col("event_id") >= 250).repartition(1)
      .write.mode("overwrite").parquet(s"$d2/w2.parquet")
    val stream = spark.readStream
      .schema(full.schema).option("maxFilesPerTrigger", 1)
      .parquet(s"$d2/*.parquet")
    val scored = stream.select(col("event_type").as("key"),
        col("event_id").as("id"), col("value").as("score"))
      .as[EventStreaming.Scored]
    val q = EventStreaming.topKPerKey(spark, scored, k = 5)
      .writeStream.outputMode("update")
      .format("memory").queryName("topk_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val emitted = spark.table("topk_stream")
      .collect().map(r => (r.getString(0),
        r.getSeq[Long](1), r.getSeq[Double](2)))
    // batch truth: the bounded-heap aggregate over everything
    val batch = full.groupBy(col("event_type"))
      .agg(graft.functions.TopKAgg(col("value"), col("event_id"), 5)
        .as("top"))
      .collect().map { r =>
        val es = r.getSeq[org.apache.spark.sql.Row](1)
        val ids = es.map(e => e.getLong(e.fieldIndex("id")))
        val scores = es.map(e => e.getDouble(e.fieldIndex("score")))
        r.getString(0) -> (ids, scores)
      }.toMap
    // each key emitted once per batch it appeared in (2), and one of
    // its emissions is the complete cross-batch top-k
    batch.keys.foreach { key =>
      val mine = emitted.filter(_._1 == key)
      assert(mine.length == 2, s"$key emissions")
      assert(mine.exists(e => (e._2, e._3) == batch(key)),
        s"$key final state must equal the batch heap")
    }
    // the complete answers mix ids from both waves for at least one
    // key — the matching emission can only come from a batch whose
    // state carried the OTHER wave's winners across the boundary
    assert(batch.values.exists { case (ids, _) =>
      ids.exists(_ < 250) && ids.exists(_ >= 250)
    }, s"fixture must mix waves in some top-k: $batch")
  }

  test("streaming top-k ranks NaN like the batch heap (NaN first)") {
    // the comparator must be TopKAgg.better, not sortBy(-score): a
    // negation-based order ranks NaN last and the twins diverge
    import spark.implicits._
    val rows = Seq(
      EventStreaming.Scored("k", 1L, 5.0),
      EventStreaming.Scored("k", 2L, Double.NaN),
      EventStreaming.Scored("k", 3L, 7.0),
      EventStreaming.Scored("k", 4L, 1.0)).toDS()
    // batch evaluation of the stateful op (empty initial state)
    val got = EventStreaming.topKPerKey(spark, rows, 2).collect().head
    val batch = rows.toDF().groupBy("key")
      .agg(graft.functions.TopKAgg(col("score"), col("id"), 2).as("t"))
      .selectExpr("transform(t, e -> e.id) AS ids").head().getSeq[Long](0)
    assert(got.ids == batch && got.ids == Seq(2L, 3L))
  }

  test("streaming session windows equal the batch session windows") {
    val q = EventStreaming.userSessions(streamEvents)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("sessions")
    val batch = EventStreaming.userSessions(spark.read.parquet(srcDir))
    assert(got.count() > 0)
    // every emitted (closed) session must exist identically in batch
    assert(got.join(batch, got.columns.toSeq, "left_anti").isEmpty)
  }

  test("streaming as-of attribution equals the batch AsOfJoin.backward") {
    val typed = streamEvents.as[EventStreaming.EventRow]
    val q = EventStreaming.clickPurchaseAttribution(spark, typed)
      .writeStream.outputMode("append")
      .format("memory").queryName("asof_attr")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("asof_attr")
      .select("user_id", "click_id", "click_ts", "asof_purchase_ts", "asof_value")

    // batch twin: the union+window as-of join on the same fixture
    val b = spark.read.parquet(srcDir)
    val clicks = b.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = b.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"), col("value"))
    val batch = graft.ops.AsOfJoin.backward(clicks, purchases, "user_id",
      "click_ts", "purchase_ts", Seq("purchase_ts", "value"))

    // clicks before any purchase carry NULL attribution, and NULL never
    // equals NULL under join keys — compare materialized row sets instead
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Option[Long], Option[Double])] =
      df.collect().map { r =>
        (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime,
          Option(r.getTimestamp(3)).map(_.getTime),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))
      }.toSet
    val gotSet = rows(got)
    val batchSet = rows(batch.select("user_id", "click_id", "click_ts",
      "asof_purchase_ts", "asof_value"))
    assert(gotSet.nonEmpty)
    assert(gotSet == batchSet)
  }

  test("stream-stream interval join equals the batch interval join") {
    val impressions = streamEvents.filter(col("event_type") === "view")
    val clicks = streamEvents.filter(col("event_type") === "click")
    // fixture users emit every 37 min with types cycling mod 3, so the
    // nearest same-user view sits 74 min before a click — 2h lookback
    val q = EventStreaming.clicksWithRecentImpressions(impressions, clicks,
      lookback = "2 hours")
      .writeStream.outputMode("append")
      .format("memory").queryName("clickimp")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("clickimp")
    val b = spark.read.parquet(srcDir)
    val batch = EventStreaming.clicksWithRecentImpressions(
      b.filter(col("event_type") === "view"),
      b.filter(col("event_type") === "click"), lookback = "2 hours")
    assert(got.count() > 0)
    // inner interval join: stream (all data within watermark by end of
    // the AvailableNow run) must equal batch exactly
    assert(got.join(batch, got.columns.toSeq, "left_anti").isEmpty &&
      batch.join(got, got.columns.toSeq, "left_anti").isEmpty)
  }

  test("funnel with a repeated step type matches the batch cascade") {
    // steps view -> view: the second view event must fill step 1
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 7L, "view", 0.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 7L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventStreaming.funnelProgress(spark,
        rows.as[EventStreaming.EventRow], Seq("view", "view"))
      .collect().head
    val times = got.times.map(_.map(identity))
    val batch = graft.ops.EventAnalytics.funnelSteps(
        rows, "user_id", "event_type", "ts", Seq("view", "view"))
      .collect().head
    assert(times === Seq(Some(batch.getLong(1)), Some(batch.getLong(2))))
  }

  test("streaming funnel state equals the batch funnel cascade") {
    // two event-time-ordered waves delivered as separate micro-batches,
    // so the cascade state genuinely carries across batches
    val d = TestSpark.tmpDir("stream_funnel")
    val all = spark.read.parquet(srcDir)
    all.filter(col("event_id") < 250)
      .coalesce(1).write.mode("overwrite").parquet(s"$d/wave=1")
    all.filter(col("event_id") >= 250)
      .coalesce(1).write.mode("overwrite").parquet(s"$d/wave=2")
    val stream = spark.readStream
      .schema(all.schema)
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true")
      .parquet(d)
      .as[EventStreaming.EventRow]
    val steps = Seq("view", "click", "purchase")
    val q = EventStreaming.funnelProgress(spark, stream, steps)
      .writeStream.outputMode("update")
      .format("memory").queryName("funnel_state")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // latest snapshot per user = the row with the max n_seen
    val got = spark.table("funnel_state")
      .orderBy(col("user_id"), col("n_seen").desc)
      .collect()
      .groupBy(_.getLong(0)).map { case (u, rows) =>
        // Option[Long] elements land in the Row as nullable longs
        u -> rows.head.getSeq[Any](2)
          .map(v => Option(v).map(_.asInstanceOf[Long])).toList
      }
    val batch = graft.ops.EventAnalytics.funnelSteps(
        all, "user_id", "event_type", "ts", steps)
      .collect().map { r =>
        r.getLong(0) -> (1 to steps.size).map(i =>
          if (r.isNullAt(i)) None else Some(r.getLong(i))).toList
      }.toMap
    assert(batch.nonEmpty)
    batch.foreach { case (u, times) =>
      assert(got(u) === times, s"user $u")
    }
    // users the batch op omits (never reached step 0) must show an
    // empty cascade in the stream state too
    (got.keySet -- batch.keySet).foreach { u =>
      assert(got(u).head.isEmpty, s"user $u should not have reached view")
    }
  }
}
