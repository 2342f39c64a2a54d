package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.Tables.t

class StreamingSpec extends SparkSpec {

  /** Events staged to a micros-timestamp parquet dir (the raw testdata is
    * TIMESTAMP(NANOS), which neither batch nor streaming Spark reads). */
  private lazy val stagedEvents: String = {
    val dir = Files.createTempDirectory("graft_stream").resolve("events").toString
    t(spark, sf(), "events").write.parquet(dir)
    dir
  }

  test("windowed counts: streaming result == batch result (parity)") {
    import spark.implicits._
    // Complete mode re-emits all windows (append would hold back windows
    // the watermark hasn't closed), so the final table equals batch.
    EventStream.runToMemory(spark, stagedEvents,
      EventStream.hourlyCounts, "hourly_stream", OutputMode.Complete())
    val streamed = spark.table("hourly_stream")
      .orderBy($"hour", $"event_type")
      .collect()

    val batch = EventStream.hourlyCounts(spark.read.parquet(stagedEvents))
      .orderBy($"hour", $"event_type")
      .collect()

    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("dp hourly monitor: streaming == batch == declared release on observed hours") {
    import spark.implicits._
    EventStream.runToMemory(spark, stagedEvents,
      EventStream.dpHourlyMonitor, "dp_hourly_stream",
      OutputMode.Complete())
    val streamed = spark.table("dp_hourly_stream")
      .orderBy($"hour_us").collect()
    val batch = EventStream.dpHourlyMonitor(
        spark.read.parquet(stagedEvents))
      .orderBy($"hour_us").collect()
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
    // shared mechanism + shared seed key => every observed hour's row
    // is BIT-EQUAL to the declared batch release's row (the grid's
    // noised zero-hours are the batch release's own, absent here)
    val observed = streamed.map(_.getLong(0)).toSet
    val declared = graft.SparkEntry.queries("log_dp_hourly")(spark, sf())
      .select($"hour_us", $"n_released", $"epsilon", $"delta")
      .collect().filter(r => observed(r.getLong(0)))
      .sortBy(_.getLong(0))
    assert(streamed.map(_.toString).toSeq ==
      declared.map(_.toString).toSeq,
      "streaming emission must replay the declared release bit-for-bit")
    // the mechanism is live on the stream too (not a zero-noise path)
    val rawCounts = spark.read.parquet(stagedEvents)
      .groupBy(expr("unix_micros(date_trunc('hour', ts))").as("hour_us"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed.exists(r =>
      r.getLong(1) != math.max(0L, rawCounts(r.getLong(0)))),
      "no window was perturbed — mechanism inert on the stream")
  }

  test("sliding windows: streaming result == batch == declared log_sliding") {
    import spark.implicits._
    EventStream.runToMemory(spark, stagedEvents,
      EventStream.slidingCounts, "sliding_stream", OutputMode.Complete())
    val streamed = spark.table("sliding_stream")
      .orderBy($"w_start").collect()
    val batch = EventStream.slidingCounts(spark.read.parquet(stagedEvents))
      .orderBy($"w_start").collect()
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
    // and the (w_start, n) columns agree with the declared batch query
    val declared = graft.SparkEntry.queries("log_sliding")(spark, sf())
      .select($"w_start", $"n").orderBy($"w_start").collect()
    assert(streamed.toSeq == declared.toSeq)
  }

  test("windowed approx distinct: streaming == batch exactly (HLL merge is lossless)") {
    import spark.implicits._
    EventStream.runToMemory(spark, stagedEvents,
      EventStream.hourlyUserEstimates, "hourly_users_stream",
      OutputMode.Complete())
    val streamed = spark.table("hourly_users_stream")
      .orderBy($"hour").collect()
    val batch = EventStream.hourlyUserEstimates(
        spark.read.parquet(stagedEvents))
      .orderBy($"hour").collect()
    assert(streamed.nonEmpty)
    // exact equality, not tolerance: the sketch merge is order-insensitive
    assert(streamed.toSeq == batch.toSeq)
    // and the estimate is a real distinct count: within 5% of exact
    val exact = spark.read.parquet(stagedEvents)
      .groupBy(date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:00")
        .as("hour"))
      .agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    streamed.foreach { r =>
      val (h, est) = (r.getString(0), r.getLong(1))
      val ex = exact(h)
      assert(math.abs(est - ex) <= math.max(1L, (ex * 0.05).toLong),
        s"window $h: estimate $est vs exact $ex")
    }
  }

  test("stream-static broadcast enrichment == batch join (parity)") {
    import spark.implicits._
    val dim = spark.read.parquet(stagedEvents)
      .groupBy($"user_id").agg(min($"ts").as("first_seen"))
    EventStream.runToMemory(spark, stagedEvents,
      df => EventStream.enriched(df, dim), "enrich_stream")
    val streamed = spark.table("enrich_stream").orderBy($"event_id").collect()
    val batch = EventStream.enriched(spark.read.parquet(stagedEvents), dim)
      .orderBy($"event_id").collect()
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
    // every event must resolve its user (the dim was built from the
    // same data) — a null first_seen means the join silently degraded
    assert(streamed.forall(!_.isNullAt(3)))
  }

  test("mapGroupsWithState running counts match batch groupBy") {
    import spark.implicits._
    EventStream.runToMemory(spark, stagedEvents,
      df => EventStream.runningUserCounts(df).toDF(),
      "user_counts_stream", OutputMode.Update())
    // final state per user = last update emitted
    val streamed = spark.table("user_counts_stream")
      .groupBy($"user_id").agg(max($"n").as("n"))
      .orderBy($"user_id").collect()

    val batch = spark.read.parquet(stagedEvents)
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
      .orderBy($"user_id").collect()

    assert(streamed.nonEmpty)
    assert(streamed.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      batch.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("anomaly stats: streaming decimal power sums match batch bit-exact") {
    import spark.implicits._
    EventStream.runToMemory(spark, stagedEvents,
      df => EventStream.anomalyStats(df).toDF(),
      "anom_stream", OutputMode.Update())
    // n strictly increases per emission, so max(struct) is the final row
    val streamed = spark.table("anom_stream")
      .groupBy($"user_id")
      .agg(max(struct($"n_events", $"mu", $"sd")).as("f"))
      .select($"user_id", $"f.n_events", $"f.mu", $"f.sd")
      .orderBy($"user_id").collect()
    // the batch log_anomaly stats stage, verbatim
    val batch = spark.read.parquet(stagedEvents)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(28,10)")).cast("double").as("s1"),
        sum(($"value" * $"value").cast("decimal(28,10)")).cast("double")
          .as("s2"))
      .select($"user_id", $"n", ($"s1" / $"n").as("mu"),
        when($"n" === 1, 0.0)
          .otherwise(sqrt(($"s2" - $"s1" * ($"s1" / $"n")) / ($"n" - 1)))
          .as("sd"))
      .orderBy($"user_id").collect()
    assert(streamed.nonEmpty && streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getLong(0) == b.getLong(0) && s.getLong(1) == b.getLong(1))
      // == on doubles: the parity claim is BIT-exact, not approximate
      assert(s.getDouble(2) == b.getDouble(2), s"mu, user ${s.getLong(0)}")
      assert(s.getDouble(3) == b.getDouble(3), s"sd, user ${s.getLong(0)}")
    }
  }

  test("streaming dedup drops in-window duplicates, batch parity on uniques") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dedup").resolve("dup").toString
    val src = t(spark, sf(), "events")
    // duplicate every event (same event_id, same ts) — stream must emit
    // each id exactly once
    src.union(src).write.parquet(dir)
    EventStream.runToMemory(spark, dir,
      EventStream.dedupedEvents, "dedup_stream")
    val streamed = spark.table("dedup_stream")
    assert(streamed.count() == src.count())
    assert(streamed.select("event_id").distinct().count() == src.count())
  }

  test("session_window: streaming result == batch result (parity)") {
    import spark.implicits._
    EventStream.runToMemory(spark, stagedEvents,
      df => EventStream.sessionCounts(df), "sessions_stream",
      OutputMode.Complete())
    val streamed = spark.table("sessions_stream")
      .orderBy($"user_id", $"s_start").collect()
    val batch = EventStream.sessionCounts(spark.read.parquet(stagedEvents))
      .orderBy($"user_id", $"s_start").collect()
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("custom flatMapGroupsWithState sessionization == session_window") {
    import spark.implicits._
    val ev = spark.read.parquet(stagedEvents)
    val custom = EventStream.sessionizeCustom(ev, 1800000000L).toDF()
      .orderBy($"user_id", $"s_start").collect()
    val native = EventStream.sessionCounts(ev)
      .orderBy($"user_id", $"s_start").collect()
    assert(custom.nonEmpty)
    assert(custom.toSeq == native.toSeq)

    // pin the boundary the staged data may not contain: events EXACTLY
    // 30 min apart merge (Spark merges when next start <= current end);
    // one microsecond past the gap splits
    val exact = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:30:00")),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00.000001")))
      .toDF("user_id", "ts")
    val nat = EventStream.sessionCounts(exact)
      .orderBy($"s_start").collect().map(r => (r.getLong(3)))
    assert(nat.toSeq == Seq(2L, 1L), s"native boundary: ${nat.toSeq}")
    val cus = EventStream.sessionizeCustom(exact, 1800000000L)
      .toDF().orderBy($"s_start").collect().map(_.getLong(3))
    assert(cus.toSeq == Seq(2L, 1L), s"custom boundary: ${cus.toSeq}")
  }

  test("custom sessionization (streaming): watermark timeout flushes final session") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_sess_to").toString
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-06-01 10:10:00")
    val far = java.sql.Timestamp.valueOf("2024-06-01 20:00:00")
    Seq((1L, t0), (1L, t1)).toDF("user_id", "ts").write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val q = EventStream.sessionizeCustom(
        spark.readStream.schema(schema).parquet(s"$dir/*"), 1800000000L).toDF()
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_timeout").start()
    try {
      q.processAllAvailable()
      // user 1's session is still open: append mode has emitted nothing
      assert(spark.table("sess_timeout").isEmpty)
      // an event ~10h later advances the watermark (1h delay) far past
      // user 1's session end — the event-time timeout must close and
      // emit that session even though user 1 never sends another event
      Seq((2L, far)).toDF("user_id", "ts").write.parquet(s"$dir/b2")
      q.processAllAvailable()
      val got = spark.table("sess_timeout")
        .select($"user_id", $"s_start", $"s_end", $"n_events").collect()
      assert(got.map(r => (r.getLong(0), r.getLong(3))).toSeq == Seq((1L, 2L)),
        s"expected user 1's closed session, got ${got.toSeq}")
      assert(got.head.getLong(2) == t1.getTime * 1000L + 1800000000L,
        "session end must be last event + gap")
    } finally q.stop()
  }

  test("session type pairs: batch rollup == log_cooccurrence; streaming flush") {
    import spark.implicits._
    // batch parity: rolling the emitted pairs up by type pair must equal
    // the declared lag-based query row-for-row
    val rolled = EventStream
      .sessionTypePairs(t(spark, sf(), "events"), 1800000000L)
      .groupBy($"type_a", $"type_b").agg(count(lit(1)).as("n_sessions"))
      .orderBy($"type_a", $"type_b").collect()
    val declared = graft.queries.EventsLog
      .queries("log_cooccurrence")(spark, sf()).collect()
    assert(rolled.nonEmpty)
    assert(rolled.toSeq == declared.toSeq)

    // streaming: pairs for a closed session appear only after the
    // watermark passes its end (event-time timeout), and carry the
    // session's distinct sorted types
    val dir = Files.createTempDirectory("graft_cooc_to").toString
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-06-01 10:05:00")
    val t2 = java.sql.Timestamp.valueOf("2024-06-01 10:10:00")
    val far = java.sql.Timestamp.valueOf("2024-06-01 20:00:00")
    Seq((1L, t0, "view"), (1L, t1, "click"), (1L, t2, "view"))
      .toDF("user_id", "ts", "event_type").write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val q = EventStream.sessionTypePairs(
        spark.readStream.schema(schema).parquet(s"$dir/*"), 1800000000L).toDF()
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("cooc_timeout").start()
    try {
      q.processAllAvailable()
      assert(spark.table("cooc_timeout").isEmpty,
        "open session must not emit pairs yet")
      Seq((2L, far, "error")).toDF("user_id", "ts", "event_type")
        .write.parquet(s"$dir/b2")
      q.processAllAvailable()
      val got = spark.table("cooc_timeout")
        .select($"user_id", $"type_a", $"type_b").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      assert(got.toSeq == Seq((1L, "click", "view")),
        s"expected user 1's single click/view pair, got ${got.toSeq}")
    } finally q.stop()
  }

  test("funnel hits: batch pass reproduces log_funnel; streaming == batch") {
    import spark.implicits._
    val batch = EventStream.funnelHits(spark.read.parquet(stagedEvents))
    val byStage = batch.groupBy($"stage").agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val declared = graft.SparkEntry.queries("log_funnel")(spark, sf()).head()
    assert(byStage.getOrElse("view", 0L) == declared.getLong(0))
    assert(byStage.getOrElse("click", 0L) == declared.getLong(1))
    assert(byStage.getOrElse("purchase", 0L) == declared.getLong(2))

    EventStream.runToMemory(spark, stagedEvents,
      df => EventStream.funnelHits(df).toDF(), "funnel_stream")
    val streamed = spark.table("funnel_stream")
      .orderBy($"user_id", $"t_us", $"stage").collect()
    assert(streamed.toSeq ==
      batch.toDF().orderBy($"user_id", $"t_us", $"stage").collect().toSeq)
    // a user's stages latch in order: view <= click <= purchase times
    val perUser = batch.groupBy($"user_id").pivot("stage",
        Seq("view", "click", "purchase")).agg(first($"t_us")).collect()
    perUser.foreach { r =>
      if (!r.isNullAt(2)) assert(r.getLong(2) > r.getLong(1), "click after view")
      if (!r.isNullAt(3)) assert(r.getLong(3) > r.getLong(2), "purchase after click")
    }
  }

  test("attributed purchases: rollup reproduces log_attribution; streaming == batch") {
    import spark.implicits._
    val batch = EventStream.attributedPurchases(spark.read.parquet(stagedEvents))
    def rollup(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(date_format(timestamp_micros($"purchase_us"), "yyyy-MM-dd")
        .as("day"))
      .agg(count(lit(1)).as("n_purchases"),
        sum($"attributed".cast("long")).as("n_attributed"),
        sum(when($"attributed", $"value").otherwise(0.0)
          .cast("decimal(18,2)")).cast("double").as("attr_value"))
      .orderBy($"day")
    val declared = graft.SparkEntry.queries("log_attribution")(spark, sf())
      .collect().toSeq
    assert(rollup(batch.toDF()).collect().toSeq == declared)

    EventStream.runToMemory(spark, stagedEvents,
      df => EventStream.attributedPurchases(df).toDF(), "attr_stream")
    val streamed = spark.table("attr_stream")
      .orderBy($"user_id", $"purchase_us").collect()
    assert(streamed.nonEmpty)
    assert(streamed.toSeq ==
      batch.toDF().orderBy($"user_id", $"purchase_us").collect().toSeq)
  }

  test("attribution: a late purchase OLDER than the click anchor is not credited") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_attr_late").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 1 latches the click anchor at 10:00
    Seq((1L, ts("2024-06-01 10:00:00"), "click", 0.0, 100L))
      .toDF("user_id", "ts", "event_type", "value", "event_id")
      .write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val q = EventStream.attributedPurchases(
        spark.readStream.schema(schema).parquet(s"$dir/*")).toDF()
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("attr_late").start()
    try {
      q.processAllAvailable()
      // batch 2: a late purchase at 09:30 — within the 1h watermark, but
      // BEFORE the anchor: no click preceded it, so it must not be
      // credited (a negative gap would satisfy the 24h check alone)
      Seq((1L, ts("2024-06-01 09:30:00"), "purchase", 5.0, 101L))
        .toDF("user_id", "ts", "event_type", "value", "event_id")
        .write.parquet(s"$dir/b2")
      q.processAllAvailable()
      val got = spark.table("attr_late")
        .select($"user_id", $"attributed").collect()
        .map(r => (r.getLong(0), r.getBoolean(1)))
      assert(got.toSeq == Seq((1L, false)),
        s"late pre-anchor purchase must be unattributed, got ${got.toSeq}")
    } finally q.stop()
  }

  test("stream-stream interval self-join == batch join (parity)") {
    import spark.implicits._
    EventStream.runToMemory(spark, stagedEvents,
      df => EventStream.pairsWithin(df, 60)
        .select($"a_user", $"a_id", $"b_id"),
      "pairs_stream", OutputMode.Append())
    val streamed = spark.table("pairs_stream")
      .orderBy($"a_user", $"a_id", $"b_id").collect()
    val batch = EventStream.pairsWithin(spark.read.parquet(stagedEvents), 60)
      .select($"a_user", $"a_id", $"b_id")
      .orderBy($"a_user", $"a_id", $"b_id").collect()
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("attribution state evicts invisibly once a click's 24h horizon passes") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_attr_evict").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // two users hold click state; user 1 also converts within 24h
    Seq(
      (1L, ts("2024-06-01 10:00:00"), "click", 0.0, 100L),
      (1L, ts("2024-06-01 11:00:00"), "purchase", 9.5, 101L),
      (2L, ts("2024-06-01 10:30:00"), "click", 0.0, 200L))
      .toDF("user_id", "ts", "event_type", "value", "event_id")
      .write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val q = EventStream.attributedPurchases(
        spark.readStream.schema(schema).parquet(s"$dir/*")).toDF()
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("attr_evict").start()
    try {
      q.processAllAvailable()
      val live = spark.table("attr_evict").collect()
      assert(live.map(r => (r.getLong(0), r.getBoolean(2))).toSeq ==
        Seq((1L, true)), s"expected user 1 attributed, got ${live.toSeq}")
      def stateRows: Long =
        q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal))
          .lastOption.getOrElse(-1L)
      assert(stateRows == 2L, s"both clicks held as state, got $stateRows")
      // three days later: the watermark passes both clicks' 24h horizons
      // — their state rows must be dropped, and that eviction is
      // invisible (any future purchase by users 1/2 would be
      // non-attributed with OR without the state row)
      Seq((3L, ts("2024-06-04 12:00:00"), "click", 0.0, 300L))
        .toDF("user_id", "ts", "event_type", "value", "event_id")
        .write.parquet(s"$dir/b2")
      q.processAllAvailable()
      assert(stateRows == 1L,
        s"users 1-2 evicted, only user 3's click held; got $stateRows")
      assert(spark.table("attr_evict").count() == 1, "eviction emitted rows")
    } finally q.stop()
  }

  test("running counts: idle user state evicts once the TTL horizon passes") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_rc_evict").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Seq((1L, ts("2024-06-01 10:00:00")), (1L, ts("2024-06-01 10:05:00")))
      .toDF("user_id", "ts").write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val q = EventStream.runningUserCounts(
        spark.readStream.schema(schema).parquet(s"$dir/*")).toDF()
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("rc_evict").start()
    try {
      q.processAllAvailable()
      def stateRows: Long =
        q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal))
          .lastOption.getOrElse(-1L)
      assert(stateRows == 1L, s"user 1 held as state, got $stateRows")
      // three days later: the watermark passes user 1's 24h idle horizon
      // — their state row must drop, leaving only the fresh user's
      Seq((2L, ts("2024-06-04 12:00:00")))
        .toDF("user_id", "ts").write.parquet(s"$dir/b2")
      q.processAllAvailable()
      assert(stateRows == 1L,
        s"user 1 evicted, only user 2 held; got $stateRows")
      // eviction emitted nothing: one update per (user, micro-batch)
      // — both user-1 events fold in one batch, so one (1,2) row
      val got = spark.table("rc_evict")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == Seq((1L, 2L), (2L, 1L)),
        s"unexpected emissions: ${got.toSeq}")
    } finally q.stop()
  }

  test("funnel: idle user state evicts once the TTL horizon passes") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_fn_evict").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Seq((1L, ts("2024-06-01 10:00:00"), "view"),
        (1L, ts("2024-06-01 10:05:00"), "click"))
      .toDF("user_id", "ts", "event_type").write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val q = EventStream.funnelHits(
        spark.readStream.schema(schema).parquet(s"$dir/*")).toDF()
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("fn_evict").start()
    try {
      q.processAllAvailable()
      def stateRows: Long =
        q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal))
          .lastOption.getOrElse(-1L)
      assert(stateRows == 1L, s"user 1's funnel held as state, got $stateRows")
      assert(spark.table("fn_evict").count() == 2, "view+click hits emitted")
      // three days later: watermark passes user 1's idle horizon — the
      // half-complete funnel is dropped; only the fresh user's state stays
      Seq((2L, ts("2024-06-04 12:00:00"), "view"))
        .toDF("user_id", "ts", "event_type").write.parquet(s"$dir/b2")
      q.processAllAvailable()
      assert(stateRows == 1L,
        s"user 1 evicted, only user 2 held; got $stateRows")
      assert(spark.table("fn_evict").count() == 3, "eviction emitted rows")
    } finally q.stop()
  }

  test("stream-stream FULL OUTER join: both sides null-extend on flush") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_fouter").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: matched click+purchase; user 2: purchase with no click;
    // user 3: click with no purchase — both 2 and 3 must null-extend
    val rows = Seq(
      (1L, ts("2024-06-01 10:00:00"), "click", 100L),
      (1L, ts("2024-06-01 10:00:30"), "purchase", 101L),
      (2L, ts("2024-06-01 10:01:00"), "purchase", 200L),
      (3L, ts("2024-06-01 10:02:00"), "click", 300L))
    rows.toDF("user_id", "ts", "event_type", "event_id")
      .write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val q = EventStream.purchasesFullOuterClicks(
        spark.readStream.schema(schema).parquet(s"$dir/*"), 60)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("fouter").start()
    try {
      q.processAllAvailable()
      val live = spark.table("fouter").collect()
      assert(live.map(_.getLong(0)).toSeq == Seq(1L),
        s"only the matched pair may emit live, got ${live.toSeq}")
      // advance BOTH watermark nodes (the query watermark is their min):
      // one far click and one far purchase; each stays withheld itself
      // (its own outer verdict is still open)
      Seq((8L, ts("2024-06-01 20:00:00"), "click", 800L),
          (9L, ts("2024-06-01 20:00:00"), "purchase", 900L))
        .toDF("user_id", "ts", "event_type", "event_id")
        .write.parquet(s"$dir/b2")
      q.processAllAvailable()
      val got = spark.table("fouter")
        .select($"user_id", $"p_id", $"c_id").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2)))
        .sortBy(_._1)
      assert(got.toSeq == Seq((1L, 101L, 100L), (2L, 200L, -1L), (3L, -1L, 300L)),
        s"expected both-side null extension, got ${got.toSeq}")

      // batch parity: the same transform over a static frame is a plain
      // full join producing the same three rows
      val batch = EventStream.purchasesFullOuterClicks(
          rows.toDF("user_id", "ts", "event_type", "event_id"), 60)
        .select($"user_id", $"p_id", $"c_id").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2)))
        .sortBy(_._1)
      assert(batch.toSeq == got.toSeq)
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join: matches emit live, null rows on flush") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_louter").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: click then purchase 30s later (matched); user 2: purchase
    // with no click (must null-extend once the watermark passes it)
    Seq(
      (1L, ts("2024-06-01 10:00:00"), "click", 100L),
      (1L, ts("2024-06-01 10:00:30"), "purchase", 101L),
      (2L, ts("2024-06-01 10:01:00"), "purchase", 200L))
      .toDF("user_id", "ts", "event_type", "event_id")
      .write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val q = EventStream.purchasesWithClicks(
        spark.readStream.schema(schema).parquet(s"$dir/*"), 60)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("louter").start()
    try {
      q.processAllAvailable()
      // the matched pair emits as soon as both sides arrive...
      val live = spark.table("louter").collect()
      assert(live.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 101L)),
        s"expected only the matched purchase live, got ${live.toSeq}")
      // ...the unmatched purchase is withheld: no click can be ruled out
      // until the click-side watermark passes p_ts
      assert(!live.exists(_.getLong(0) == 2L))
      // far-future events advance the watermark (1h delay) beyond user
      // 2's purchase — on BOTH sides: the query watermark is the MIN
      // over the two watermark nodes, so a click alone would leave the
      // purchase-side watermark (and the join's flush point) behind.
      // The null-extended row must then flush and its state drop; the
      // far purchase itself stays withheld (its own no-click verdict is
      // still open).
      Seq((3L, ts("2024-06-01 20:00:00"), "click", 300L),
          (4L, ts("2024-06-01 20:00:00"), "purchase", 301L))
        .toDF("user_id", "ts", "event_type", "event_id")
        .write.parquet(s"$dir/b2")
      q.processAllAvailable()
      val all = spark.table("louter").orderBy($"user_id").collect()
      assert(all.map(r => (r.getLong(0), r.getLong(1), r.isNullAt(3))).toSeq ==
        Seq((1L, 101L, false), (2L, 200L, true)),
        s"expected user 2 null-extended after flush, got ${all.toSeq}")
    } finally q.stop()

    // batch parity: the same transform over a batch frame is a plain
    // left join — same rows as the flushed streaming table on the fixture
    val batch = EventStream.purchasesWithClicks(
        spark.read.parquet(stagedEvents), 60)
      .orderBy($"user_id", $"p_id", $"c_id").collect()
    val expected = {
      val ev = spark.read.parquet(stagedEvents)
      val p = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts".as("p_ts"), $"event_id".as("p_id"))
      val c = ev.filter($"event_type" === "click")
        .select($"user_id".as("cu"), $"ts".as("c_ts"), $"event_id".as("c_id"))
      p.join(c, $"user_id" === $"cu" &&
          $"c_ts" >= $"p_ts" - expr("INTERVAL 60 SECONDS") &&
          $"c_ts" <= $"p_ts", "left_outer")
        .select($"user_id", $"p_id", $"p_ts", $"c_id", $"c_ts")
        .orderBy($"user_id", $"p_id", $"c_id").collect()
    }
    assert(batch.nonEmpty && batch.toSeq == expected.toSeq)
  }

  test("dedup state survives a query restart via checkpoint (exactly-once)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_restart").toString
    val (src, sink, chk) = (s"$root/src", s"$root/sink", s"$root/chk")
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00")
    val t5 = java.sql.Timestamp.valueOf("2024-06-01 10:05:00")
    def rows(r: Seq[(Long, java.sql.Timestamp)]) =
      r.toDF("event_id", "ts")
    rows(Seq((1L, t0), (2L, t0), (3L, t0), (3L, t0)))
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema

    def runOnce(): Unit = {
      val q = EventStream.dedupedEvents(
          spark.readStream.schema(schema).parquet(src))
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", chk)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    // second run: id 3 re-arrives within the watermark window plus a new
    // id — the recovered state store must still drop the duplicate
    rows(Seq((3L, t5), (4L, t5))).write.mode("append").parquet(src)
    runOnce()

    val out = spark.read.parquet(sink).select($"event_id").as[Long].collect()
    assert(out.sorted.toSeq == Seq(1L, 2L, 3L, 4L),
      s"restart lost or duplicated state: ${out.sorted.toSeq}")
  }

  test("watermark bounds state: late rows beyond watermark are dropped") {
    import spark.implicits._
    // Two batches: second contains a row >2h older than the max event
    // time of the first — with a 1h watermark it must be dropped from
    // the append-mode result.
    val dir = Files.createTempDirectory("graft_late").toString
    val base = java.sql.Timestamp.valueOf("2024-06-01 10:30:00")
    val late = java.sql.Timestamp.valueOf("2024-06-01 07:10:00")
    Seq((base, "click")).toDF("ts", "event_type")
      .write.parquet(s"$dir/b1")

    val schema = spark.read.parquet(s"$dir/b1").schema
    val q = EventStream.hourlyCounts(
        spark.readStream.schema(schema).parquet(s"$dir/*"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("late_stream").start()
    try {
      q.processAllAvailable()
      Seq((late, "click")).toDF("ts", "event_type")
        .write.parquet(s"$dir/b2")
      q.processAllAvailable()
    } finally q.stop()
    // the late 07:00 window never appears in append output; the 10:00
    // window is still open (not emitted) — so nothing contains 07:00
    val hours = spark.table("late_stream").select($"hour").as[String].collect()
    assert(!hours.contains("2024-06-01 07:00"))
  }

  test("hash reservoir: multi-batch stream converges to the batch sample") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_reservoir").toString
    val src = s"$root/src"
    val docs = t(spark, sf(), "documents").select($"source", $"doc_id")
    // two arrival waves in REVERSE doc order — membership must not care
    docs.filter($"doc_id" % 2 === 1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = DocStream.hashReservoir(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(src), k = 5).toDF()
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("reservoir_stream").start()
    try {
      q.processAllAvailable()
      docs.filter($"doc_id" % 2 === 0).write.mode("append").parquet(src)
      q.processAllAvailable()
    } finally q.stop()
    // live sample = rows of each source's final version
    val emitted = spark.table("reservoir_stream")
    val finalVer = emitted.groupBy($"source".as("s"))
      .agg(max($"ver").as("v"))
    val got = emitted.join(finalVer,
        $"source" === $"s" && $"ver" === $"v")
      .select($"source", $"doc_id", $"h32")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    // batch truth: the 5 smallest (h32, doc_id) per source
    val batch = DocStream.hashReservoir(docs, k = 5).collect()
    val batchFinal = batch.groupBy(_.source).flatMap { case (s, rows) =>
      val v = rows.map(_.ver).max
      rows.filter(_.ver == v).map(r => (r.source, r.doc_id, r.h32)).toSeq
    }.toSet
    assert(got.nonEmpty && got == batchFinal,
      s"streaming reservoir != batch (got ${got.size}, want ${batchFinal.size})")
    // and the batch side equals a plain window-rank replay
    val replay = docs.select($"source", $"doc_id", expr(
        "cast(conv(substring(md5(cast(cast(doc_id as string) as binary))," +
          " 1, 8), 16, 10) as bigint)").as("h32"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).flatMap { case (_, rows) =>
        rows.sortBy(r => (r._3, r._2)).take(5).toSeq
      }.toSet
    assert(got == replay, "reservoir != rank-window truth")
  }

  /** Per-shard word truth for the MG monitor tests: (shard -> (word
    * -> exact count)), sharded by the SAME md5 rule as mgHeavy. */
  private def mgTruth(): Map[Int, Map[String, Long]] = {
    import spark.implicits._
    t(spark, sf(), "documents")
      .select(explode(expr(
        "filter(split(lower(text), '\\\\s+'), x -> x != '')")).as("word"))
      .select($"word", expr(
        "cast(conv(substring(md5(cast(word as binary)), 1, 2)," +
          " 16, 10) as int) % 8").as("shard"))
      .as[(String, Int)].collect()
      .groupBy(_._2).view.mapValues(
        _.groupBy(_._1).view.mapValues(_.length.toLong).toMap).toMap
  }

  private def assertMgBounds(est: Map[(Int, String), Long],
      truth: Map[Int, Map[String, Long]], k: Int): Unit = {
    for (((shard, w), e) <- est) {
      val tr = truth(shard).getOrElse(w, 0L)
      assert(e <= tr, s"shard $shard '$w': est $e exceeds true $tr")
    }
    for ((shard, words) <- truth) {
      val n = words.values.sum
      for ((w, tr) <- words if tr * (k + 1) > n) {
        val e = est.getOrElse((shard, w), 0L)
        assert(e > 0, s"shard $shard heavy '$w' missing from the sketch")
        assert((tr - e) * (k + 1) <= n,
          s"shard $shard '$w': est $e violates the n/(k+1) bound")
      }
    }
  }

  test("mg heavy (batch): every counter under-counts, every heavy " +
      "word survives within the n/(k+1) bound") {
    val rows = DocStream.mgHeavy(t(spark, sf(), "documents"))
      .collect().map(c => (c.shard, c.word) -> c.est).toMap
    assert(rows.nonEmpty)
    assertMgBounds(rows, mgTruth(), k = 64)
  }

  test("mg heavy (streaming): the bound holds across micro-batches, " +
      "state carries the counters") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_mg").toString
    val src = s"$root/src"
    val docs = t(spark, sf(), "documents").select($"doc_id", $"text")
    docs.filter($"doc_id" % 2 === 0).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = DocStream.mgHeavy(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(src)).toDF()
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("mg_stream").start()
    try {
      q.processAllAvailable()
      docs.filter($"doc_id" % 2 === 1).write.mode("append").parquet(src)
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("mg_stream")
    val finalVer = emitted.groupBy($"shard".as("s"))
      .agg(max($"ver").as("v"))
    val got = emitted.join(finalVer, $"shard" === $"s" && $"ver" === $"v")
      .select($"shard", $"word", $"est")
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got.nonEmpty)
    // versions advanced: at least one shard saw 2 micro-batches
    assert(emitted.agg(max($"ver")).head().getLong(0) >= 2L,
      "state did not carry across micro-batches")
    assertMgBounds(got, mgTruth(), k = 64)
  }

  test("doc admission (batch): equals the dedup_incremental admit set") {
    import spark.implicits._
    val docs = t(spark, sf(), "documents")
    val corpusFps = docs.filter($"doc_id" % 5 <= 2)
      .select(md5($"text".cast("binary")).as("fp")).distinct()
    val batch = docs.filter($"doc_id" % 5 === 4)
      .unionAll(docs.filter($"doc_id" % 10 === 0)
        .select(($"doc_id" + 1000000L).as("doc_id"), $"text", $"lang",
          $"source", $"n_chars"))
      .select($"doc_id", $"text")
    val got = DocStream.admittedDocs(batch, corpusFps).collect()
      .map(a => (a.fp, a.doc_id)).sortBy(_._2)
    val want = graft.SparkEntry.queries("dedup_incremental")(spark, sf())
      .filter($"admit_id" < 2000000L) // same two sub-batches as above
      .select($"fp", $"admit_id").as[(String, Long)].collect().sortBy(_._2)
    assert(got.toSeq == want.toSeq,
      s"batch admission differs: got ${got.length}, want ${want.length}")
  }

  test("doc admission (streaming): corpus + cross-batch dups rejected exactly once") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_docstream").toString
    val src = s"$root/src"
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-06-01 10:05:00")
    // corpus knows contents A and B; the stream delivers:
    //   batch 1: A (corpus dup), C (new), C again (in-batch dup, higher id)
    //   batch 2: C (cross-batch dup), D (new)
    Seq((10L, "doc A", t0), (12L, "doc C", t0), (11L, "doc C", t0))
      .toDF("doc_id", "text", "ingest_ts").write.mode("append").parquet(src)
    val corpusFps = Seq("doc A", "doc B").toDF("text")
      .select(md5($"text".cast("binary")).as("fp"))
    val schema = spark.read.parquet(src).schema
    val q = DocStream.admittedDocs(
        spark.readStream.schema(schema).parquet(src), corpusFps)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("doc_admit").start()
    try {
      q.processAllAvailable()
      Seq((13L, "doc C", t1), (14L, "doc D", t1))
        .toDF("doc_id", "text", "ingest_ts").write.mode("append").parquet(src)
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("doc_admit")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    // C admitted once at its min in-batch id (11), D admitted once; A
    // rejected by the corpus side; nothing admitted twice
    assert(out == Seq(11L, 14L), s"admissions: $out")
  }

  test("doc admission state survives a query restart via checkpoint") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_docrestart").toString
    val (src, sink, chk) = (s"$root/src", s"$root/sink", s"$root/chk")
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-06-01 10:05:00")
    Seq((1L, "doc X", t0)).toDF("doc_id", "text", "ingest_ts")
      .write.mode("append").parquet(src)
    val corpusFps = Seq("doc Z").toDF("text")
      .select(md5($"text".cast("binary")).as("fp"))
    val schema = spark.read.parquet(src).schema
    def runOnce(): Unit = {
      val q = DocStream.admittedDocs(
          spark.readStream.schema(schema).parquet(src), corpusFps)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", chk)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    // X re-arrives after restart plus a new Y — the recovered state
    // store must still reject the duplicate admission
    Seq((2L, "doc X", t1), (3L, "doc Y", t1))
      .toDF("doc_id", "text", "ingest_ts").write.mode("append").parquet(src)
    runOnce()
    val out = spark.read.parquet(sink).select($"doc_id").as[Long]
      .collect().sorted.toSeq
    assert(out == Seq(1L, 3L), s"restart lost or duplicated state: $out")
  }

  test("doc admission: idle fingerprint state evicts past the TTL horizon") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_docttl").toString
    val src = s"$root/src"
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00")
    // 10 days later: beyond the 7-day idle TTL AND the 1h watermark delay
    val t10 = java.sql.Timestamp.valueOf("2024-06-11 10:00:00")
    Seq((1L, "doc E", t0)).toDF("doc_id", "text", "ingest_ts")
      .write.mode("append").parquet(src)
    val corpusFps = Seq("doc Z").toDF("text")
      .select(md5($"text".cast("binary")).as("fp"))
    val schema = spark.read.parquet(src).schema
    val q = DocStream.admittedDocs(
        spark.readStream.schema(schema).parquet(src), corpusFps)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("doc_ttl").start()
    try {
      q.processAllAvailable()
      // advance the watermark far past E's horizon with an unrelated doc,
      // then re-deliver E — after eviction it is re-admitted (the
      // documented TTL trade)
      Seq((2L, "doc F", t10)).toDF("doc_id", "text", "ingest_ts")
        .write.mode("append").parquet(src)
      q.processAllAvailable()
      Seq((3L, "doc E", t10)).toDF("doc_id", "text", "ingest_ts")
        .write.mode("append").parquet(src)
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("doc_ttl")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 2L, 3L),
      s"expected E re-admitted after TTL eviction: $out")
  }

  test("curation rates (batch): equals the doc_filter_reasons verdict rollup") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:30:00")
    val staged = t(spark, sf(), "documents")
      .withColumn("ingest_ts", lit(t0))
    val got = DocStream.curationRates(staged)
      .select($"verdict", $"n_docs").as[(String, Long)]
      .collect().toMap
    val want = graft.SparkEntry.queries("doc_filter_reasons")(spark, sf())
      .groupBy($"verdict").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == want, s"per-row verdicts differ from declared: $got vs $want")
  }

  test("curation rates (streaming): windowed verdict counts == batch") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_curate").toString
    val src = s"$root/src"
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:10:00")
    val t1 = java.sql.Timestamp.valueOf("2024-06-01 11:20:00")
    Seq(
      (1L, "the cat sat on the mat with a hat and a bat of it is", t0),
      (2L, "tiny", t0),
      (3L, "zz zz zz zz zz zz zz zz zz zz zz zz", t1),
      (4L, "the dog ran to the park and it is a big day in town", t1))
      .toDF("doc_id", "text", "ingest_ts").write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = DocStream.curationRates(
        spark.readStream.schema(schema).parquet(src))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("curate_stream").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("curate_stream")
      .select($"w_start", $"verdict", $"n_docs")
      .orderBy($"w_start", $"verdict").collect().toSeq
    val batch = DocStream.curationRates(spark.read.parquet(src))
      .orderBy($"w_start", $"verdict").collect().toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"streaming $streamed != batch $batch")
    // the fixture exercises both windows and at least 2 verdicts
    assert(streamed.map(_.getString(1)).distinct.length >= 2)
  }

  test("seasonal anomaly (batch): flags equal the declared query's live hours") {
    import spark.implicits._
    val ev = t(spark, sf(), "events")
    val base = EventStream.seasonalBaseline(ev)
    val got = EventStream.seasonalAnomaly(ev, base)
      .collect().map(r => (r.getTimestamp(0).getTime * 1000L,
        r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // the declared query covers the DENSE grid; a stream only emits
    // windows that saw events, so compare on n > 0 rows
    val want = graft.SparkEntry.queries("log_anomaly_seasonal")(spark, sf())
      .filter($"n" > 0L)
      .collect().map(r => (r.getLong(1), r.getString(0)) ->
        (r.getLong(2), r.getLong(4))).toMap
    assert(got.nonEmpty && got == want,
      s"live-hour flags differ: got ${got.size}, want ${want.size}")
  }

  test("seasonal anomaly (streaming): windowed flags == batch") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_seasonal").toString
    val src = s"$root/src"
    val ev = t(spark, sf(), "events")
    // stream the fixture in two arbitrary halves (restart-shaped input)
    ev.filter($"event_id" % 2 === 0).write.mode("append").parquet(src)
    ev.filter($"event_id" % 2 === 1).write.mode("append").parquet(src)
    val base = EventStream.seasonalBaseline(ev)
    val schema = spark.read.parquet(src).schema
    val q = EventStream.seasonalAnomaly(
        spark.readStream.schema(schema).parquet(src), base)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("seasonal_stream").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("seasonal_stream")
      .orderBy($"w_start", $"event_type").collect().toSeq
    val batch = EventStream.seasonalAnomaly(spark.read.parquet(src), base)
      .orderBy($"w_start", $"event_type").collect().toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"streaming ${streamed.size} rows != batch ${batch.size}")
    // the 1.5σ rule must actually fire somewhere on this fixture
    assert(streamed.exists(_.getLong(3) == 1L),
      "expected at least one live anomaly flag")
  }

  test("ewma chart (batch): rows equal the declared log_ewma_chart") {
    import spark.implicits._
    val ev = t(spark, sf(), "events")
    val model = graft.queries.EventsLog.ewmaModel(ev)
    val got = EventStream.ewmaChart(ev, model).collect()
      .map(p => (p.event_type, p.hour_us) -> (p.n, p.ewma, p.is_alert))
      .toMap
    val want = graft.SparkEntry.queries("log_ewma_chart")(spark, sf())
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    assert(got.nonEmpty && got == want,
      s"batch-mode monitor ${got.size} rows != declared ${want.size}")
  }

  test("ewma chart (streaming): finalized hours replay the batch chart") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ewma").toString
    val ev = t(spark, sf(), "events")
    val b = ev.agg(min(unix_micros($"ts")), max(unix_micros($"ts"))).head()
    val mid = (b.getLong(0) + b.getLong(1)) / 2
    ev.filter(unix_micros($"ts") <= mid).write.parquet(s"$dir/b1")
    val model = graft.queries.EventsLog.ewmaModel(ev)
    val schema = spark.read.parquet(s"$dir/b1").schema
    val q = EventStream.ewmaChart(
        spark.readStream.schema(schema).parquet(s"$dir/*"), model).toDF()
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("ewma_stream").start()
    try {
      q.processAllAvailable()
      // the second half arrives later — state must carry the open hour
      // and the 8-count ring across micro-batches
      ev.filter(unix_micros($"ts") > mid).write.parquet(s"$dir/b2")
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ewma_stream").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    val batch = EventStream.ewmaChart(ev, model).collect()
      .map(p => (p.event_type, p.hour_us) -> (p.n, p.ewma, p.is_alert))
      .toMap
    assert(streamed.nonEmpty)
    // every finalized streamed hour is bit-identical to the batch chart
    for ((k, v) <- streamed)
      assert(batch(k) == v, s"$k: streamed point diverges from batch")
    // coverage: finalization is watermark-driven, and the watermark a
    // micro-batch SEES lags one batch — so after the two batches every
    // hour comfortably below the first half's horizon must have closed
    // for every type (later hours stay pending until the watermark
    // passes them)
    val step = 3600000000L
    val wantBelow = mid - 4 * step
    for ((k, _) <- batch if k._2 + step <= wantBelow)
      assert(streamed.contains(k), s"$k: in-watermark hour not closed")
  }

  test("hourly quantiles: declared == typed batch; streaming == batch") {
    import spark.implicits._
    val ev = t(spark, sf(), "events")
    val model = EventStream.quantileModel(ev)
    // three-way leg 1: the declared query == the typed batch path
    // (identical binning, integer cut, and midpoint arithmetic)
    val declared = graft.SparkEntry.queries("log_hourly_quantiles")(
        spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val batch = EventStream.quantileWindows(ev, model).collect()
      .map(p => (p.w_start, p.q_pct) -> (p.n, p.qbin, p.est)).toMap
    assert(batch.nonEmpty && declared == batch,
      "declared query and typed batch path diverge")
    // three-way leg 2: streaming finalized windows == batch, state
    // carried across micro-batches (two halves)
    val dir = Files.createTempDirectory("graft_quant").toString
    val b = ev.agg(min(unix_micros($"ts")), max(unix_micros($"ts"))).head()
    val mid = (b.getLong(0) + b.getLong(1)) / 2
    ev.filter(unix_micros($"ts") <= mid).write.parquet(s"$dir/b1")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val q = EventStream.quantileWindows(
        spark.readStream.schema(schema).parquet(s"$dir/*"), model).toDF()
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("quant_stream").start()
    try {
      q.processAllAvailable()
      ev.filter(unix_micros($"ts") > mid).write.parquet(s"$dir/b2")
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("quant_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(streamed.nonEmpty)
    for ((k, v) <- streamed)
      assert(batch(k) == v, s"$k: streamed quantile diverges from batch")
    // coverage floor (watermark a micro-batch sees lags one batch);
    // k._1 is the window start (k._2 is the percentile)
    val step = 3600000000L
    for ((k, _) <- batch if k._1 + step <= mid - 4 * step)
      assert(streamed.contains(k), s"$k: in-watermark hour not closed")
  }

  test("ewma chart (streaming): event-time timeout flushes an idle " +
      "type's open hour, bit-identical to the batch point") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ewma_to").toString
    def ts(h: Int) =
      java.sql.Timestamp.valueOf(f"2024-06-01 $h%02d:30:00")
    val far = java.sql.Timestamp.valueOf("2024-07-01 00:00:00")
    val xs = (0 to 9).map(h => ("x", ts(h)))
    val all = (xs :+ (("y", far))).toDF("event_type", "ts")
    xs.toDF("event_type", "ts").write.parquet(s"$dir/b1")
    val model = graft.queries.EventsLog.ewmaModel(all)
    val schema = spark.read.parquet(s"$dir/b1").schema
    val q = EventStream.ewmaChart(
        spark.readStream.schema(schema).parquet(s"$dir/*"), model,
        idleUs = 3600000000L).toDF()
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("ewma_timeout").start()
    try {
      q.processAllAvailable()
      // the watermark a batch sees lags one batch: nothing can have
      // closed during the first micro-batch
      assert(spark.table("ewma_timeout")
        .filter($"event_type" === "x").isEmpty,
        "no x hour can close before the watermark moves")
      // a far-future event advances the watermark a month past x's
      // horizon — the no-data timeout batch must close hours 8 and 9
      // (and the zero hours after) even though x never sends again
      Seq(("y", far)).toDF("event_type", "ts")
        .write.parquet(s"$dir/b2")
      q.processAllAvailable()
    } finally q.stop()
    val h9 = java.sql.Timestamp.valueOf("2024-06-01 09:00:00")
      .getTime * 1000L
    val got = spark.table("ewma_timeout")
      .filter($"event_type" === "x" && $"hour_us" === h9)
      .collect().map(r => (r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(got.length == 1, "timeout did not flush the open hour")
    // the flushed point equals the batch twin's row for the same hour
    val want = EventStream.ewmaChart(all, model).collect()
      .filter(p => p.event_type == "x" && p.hour_us == h9)
      .map(p => (p.n, p.ewma, p.is_alert))
    assert(want.length == 1 && got.head == want.head,
      s"timeout point ${got.head} != batch point ${want.headOption}")
  }

  test("ewma chart (streaming): an in-watermark straggler still " +
      "counts — finalization is watermark-driven, not arrival-driven") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ewma_straggle").toString
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-06-01 $h%02d:$m%02d:00")
    val far = java.sql.Timestamp.valueOf("2024-07-01 00:00:00")
    val base = (0 to 12).map(h => ("x", ts(h, 30)))
    val straggler = ("x", ts(11, 45)) // hour 11, arrives AFTER hour 12
    val all = (base :+ straggler :+ (("y", far)))
      .toDF("event_type", "ts")
    base.toDF("event_type", "ts").write.parquet(s"$dir/b1")
    val model = graft.queries.EventsLog.ewmaModel(all)
    val schema = spark.read.parquet(s"$dir/b1").schema
    val q = EventStream.ewmaChart(
        spark.readStream.schema(schema).parquet(s"$dir/*"), model,
        idleUs = 3600000000L).toDF()
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("ewma_straggle").start()
    try {
      q.processAllAvailable()
      // watermark after b1 is 11:30; hour 11 is NOT yet closed, so
      // the straggler at 11:45 must still be merged, not dropped
      Seq(straggler).toDF("event_type", "ts").write.parquet(s"$dir/b2")
      q.processAllAvailable()
      Seq(("y", far)).toDF("event_type", "ts").write.parquet(s"$dir/b3")
      q.processAllAvailable()
    } finally q.stop()
    val h11 = java.sql.Timestamp.valueOf("2024-06-01 11:00:00")
      .getTime * 1000L
    val got = spark.table("ewma_straggle")
      .filter($"event_type" === "x" && $"hour_us" === h11)
      .collect().map(r => (r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(got.length == 1 && got.head._1 == 2L,
      s"hour-11 count must include the straggler, got $got")
    // and the closed point is bit-identical to the batch twin's
    val want = EventStream.ewmaChart(all, model).collect()
      .filter(p => p.event_type == "x" && p.hour_us == h11)
      .map(p => (p.n, p.ewma, p.is_alert))
    assert(want.length == 1 && got.head == want.head,
      s"straggler point ${got.head} != batch ${want.headOption}")
  }

  test("embed drift (batch): cell histogram equals the declared assignment rollup") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:15:00")
    val emb = t(spark, sf(), "embeddings").withColumn("ingest_ts", lit(t0))
    val cb = EmbedStream.codebook(t(spark, sf(), "embeddings"))
    val got = EmbedStream.cellDrift(emb, cb)
      .select($"cell", $"n_vecs").as[(Long, Long)].collect().toMap
    val want = graft.SparkEntry.queries("sim_ivf_assign")(spark, sf())
      .groupBy($"cent_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got == want, s"drift cells differ from sim_ivf_assign: $got vs $want")
  }

  test("embed drift (streaming): windowed cell counts == batch") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_drift").toString
    val src = s"$root/src"
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:10:00")
    val t1 = java.sql.Timestamp.valueOf("2024-06-01 11:40:00")
    val ref = t(spark, sf(), "embeddings")
    // two hour-windows of streamed vectors drawn from the fixture
    ref.filter($"vec_id" % 3 === 0).withColumn("ingest_ts", lit(t0))
      .unionAll(ref.filter($"vec_id" % 3 === 1).withColumn("ingest_ts", lit(t1)))
      .write.mode("append").parquet(src)
    val cb = EmbedStream.codebook(ref)
    val schema = spark.read.parquet(src).schema
    val q = EmbedStream.cellDrift(
        spark.readStream.schema(schema).parquet(src), cb)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("drift_stream").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("drift_stream")
      .orderBy($"w_start", $"cell").collect().toSeq
    val batch = EmbedStream.cellDrift(spark.read.parquet(src), cb)
      .orderBy($"w_start", $"cell").collect().toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"streaming $streamed != batch $batch")
    // both windows present
    assert(streamed.map(_.getTimestamp(0)).distinct.length == 2)
  }

  test("band index (batch): owners equal the declared sig table's band minima") {
    import spark.implicits._
    val got = DocStream.bandIndex(t(spark, sf(), "documents"))
      .collect().map(b => (b.band_i, b.band_key) -> b.owner_id).toMap
    // independent expectation from the DECLARED minhash sig table:
    // band b = h(2b+1) || h(2b+2), owner = min doc_id per band value
    val sigs = graft.SparkEntry.queries("dedup_minhash_sigs")(spark, sf())
      .collect()
    val want = sigs.flatMap { r =>
      (0 until 3).map(b => (b, r.getString(1 + 2 * b) +
        r.getString(2 + 2 * b)) -> r.getLong(0))
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
    assert(got.nonEmpty && got == want,
      s"band index differs: got ${got.size} entries, want ${want.size}")
  }

  test("near-dup candidates: collisions are a subset of dedup_lsh_pairs") {
    import spark.implicits._
    val docs = t(spark, sf(), "documents")
    val index = DocStream.bandIndex(docs).toDF()
    val flagged = DocStream.nearDupCandidates(docs, index)
      .collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    val pairs = graft.SparkEntry.queries("dedup_lsh_pairs")(spark, sf())
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(flagged.nonEmpty, "fixture has near-dups; collisions expected")
    assert(flagged.subsetOf(pairs),
      s"index collisions not in the candidate relation: ${flagged -- pairs}")
    // exact spec: flagged == every (doc, owner-of-a-shared-band) with
    // owner != doc, derived independently from the declared sig table
    val sigs = graft.SparkEntry.queries("dedup_minhash_sigs")(spark, sf())
      .collect()
    val bandsByDoc = sigs.map { r =>
      r.getLong(0) -> (0 until 3).map(b =>
        (b, r.getString(1 + 2 * b) + r.getString(2 + 2 * b)))
    }
    val owner = bandsByDoc.flatMap { case (id, bs) => bs.map(_ -> id) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
    val want = (for {
      (id, bs) <- bandsByDoc; b <- bs
      own = owner(b) if own != id
    } yield (math.min(id, own), math.max(id, own))).toSet
    assert(flagged == want,
      s"collisions differ from spec: missing ${want -- flagged}, " +
        s"extra ${flagged -- want}")
  }

  test("band index (streaming): first-write wins across batches, restart-safe") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_bandidx").toString
    val (src, sink, chk) = (s"$root/src", s"$root/sink", s"$root/chk")
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-06-01 10:05:00")
    // two docs sharing all 3 bands (identical text) in batch 1 — the min
    // id owns; batch 2 re-delivers the same content under a higher id
    // (no new bands) plus a disjoint doc (3 new bands)
    Seq((7L, "alpha beta gamma delta", t0), (5L, "alpha beta gamma delta", t0))
      .toDF("doc_id", "text", "ingest_ts").write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    def runOnce(): Unit = {
      val q = DocStream.bandIndex(
          spark.readStream.schema(schema).parquet(src))
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", chk)
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    Seq((9L, "alpha beta gamma delta", t1),
        (8L, "epsilon zeta eta theta", t1))
      .toDF("doc_id", "text", "ingest_ts").write.mode("append").parquet(src)
    runOnce()
    val out = spark.read.parquet(sink)
      .select($"owner_id").as[Long].collect()
    // 3 bands owned by 5 (batch-1 min), 3 by 8; 7 and 9 own nothing
    assert(out.count(_ == 5L) == 3 && out.count(_ == 8L) == 3 &&
      out.length == 6, s"owners: ${out.toSeq.sorted}")
    // and the recovered index equals the batch index over the same data
    val batchIdx = DocStream.bandIndex(spark.read.parquet(src))
      .collect().map(b => (b.band_i, b.band_key, b.owner_id)).toSet
    val streamIdx = spark.read.parquet(sink)
      .as[DocStream.BandOwner].collect()
      .map(b => (b.band_i, b.band_key, b.owner_id)).toSet
    assert(streamIdx == batchIdx, "streaming index != batch replay")
  }

  test("psi drift (batch): per-window PSI replays from the raw values") {
    import spark.implicits._
    val ev = t(spark, sf(), "events")
    val model = EventStream.psiModel(ev)
    val got = EventStream.psiDrift(ev, model)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // exact driver replay: model bins from global bounds over the SAME
    // events, per (hour, type) Laplace-smoothed PSI in e10 integers
    val raw = ev.select($"event_type", unix_micros($"ts").as("us"),
        $"value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val v0 = raw.map(_._3).min; val v1 = raw.map(_._3).max
    def binOf(v: Double): Int =
      if (v1 == v0) 0 else math.min(9, math.floor((v - v0) * 10.0 / (v1 - v0)).toInt)
    val ref = raw.groupBy(_._1).map { case (ty, g) =>
      ty -> (g.length.toLong, g.groupBy(e => binOf(e._3))
        .map { case (b, h) => b -> h.length.toLong }) }
    val hourUs = 3600000000L
    val expected = raw.groupBy(e => (e._2 / hourUs * hourUs, e._1))
      .map { case ((h, ty), g) =>
        val n = g.length.toLong
        val cnt = g.groupBy(e => binOf(e._3))
          .map { case (b, x) => b -> x.length.toLong }
        val (nRef, rCnt) = ref(ty)
        val psiE10 = (0 to 9).map { b =>
          val p2 = (cnt.getOrElse(b, 0L) + 1) / (n + 10).toDouble
          val p1 = (rCnt.getOrElse(b, 0L) + 1) / (nRef + 10).toDouble
          math.round((p2 - p1) * math.log(p2 / p1) * 1e10)
        }.sum
        (h, ty) -> (n, math.round(psiE10.toDouble / 1e10 * 1e4)
          / 1e4.toDouble)
      }
    assert(got == expected, "windowed PSI diverges from exact replay")
  }

  test("psi drift: live values below the model's range land in bin 0") {
    import spark.implicits._
    val ev = t(spark, sf(), "events")
    // model trained ONLY on the upper value range — live traffic then
    // includes values below the training min, the downward-drift path
    val model = EventStream.psiModel(ev.filter($"value" >= 200.0))
    val got = EventStream.psiDrift(ev, model)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val bounds = ev.filter($"value" >= 200.0)
      .agg(min($"value"), max($"value")).head()
    val (v0, v1) = (bounds.getDouble(0), bounds.getDouble(1))
    def binOf(v: Double): Int =
      if (v1 == v0) 0
      else math.max(0, math.min(9,
        math.floor((v - v0) * 10.0 / (v1 - v0)).toInt))
    val refRaw = ev.filter($"value" >= 200.0)
      .select($"event_type", $"value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val ref = refRaw.groupBy(_._1).map { case (ty, g) =>
      ty -> (g.length.toLong, g.groupBy(e => binOf(e._2))
        .map { case (b, h) => b -> h.length.toLong }) }
    val raw = ev.select($"event_type", unix_micros($"ts").as("us"),
        $"value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val hourUs = 3600000000L
    val expected = raw.groupBy(e => (e._2 / hourUs * hourUs, e._1))
      .map { case ((h, ty), g) =>
        val n = g.length.toLong
        val cnt = g.groupBy(e => binOf(e._3))
          .map { case (b, x) => b -> x.length.toLong }
        val (nRef, rCnt) = ref(ty)
        val psiE10 = (0 to 9).map { b =>
          val p2 = (cnt.getOrElse(b, 0L) + 1) / (n + 10).toDouble
          val p1 = (rCnt.getOrElse(b, 0L) + 1) / (nRef + 10).toDouble
          math.round((p2 - p1) * math.log(p2 / p1) * 1e10)
        }.sum
        (h, ty) -> (n, math.round(psiE10.toDouble / 1e10 * 1e4)
          / 1e4.toDouble)
      }
    assert(got == expected,
      "below-range values must clamp into bin 0, not vanish")
    // every window's n must equal its raw event count (nothing is
    // silently dropped by a negative bin)
    assert(got.values.map(_._1).sum == raw.length.toLong)
  }

  test("psi drift (streaming): windowed PSI == batch (parity)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_psi").toString
    val src = s"$root/src"
    val ev = t(spark, sf(), "events")
    ev.filter($"event_id" % 2 === 0).write.mode("append").parquet(src)
    ev.filter($"event_id" % 2 === 1).write.mode("append").parquet(src)
    val model = EventStream.psiModel(ev)
    val schema = spark.read.parquet(src).schema
    val q = EventStream.psiDrift(
        spark.readStream.schema(schema).parquet(src), model)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("psi_stream").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("psi_stream")
      .orderBy($"hour_us", $"event_type").collect().toSeq
    val batch = EventStream.psiDrift(spark.read.parquet(src), model)
      .orderBy($"hour_us", $"event_type").collect().toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"streaming ${streamed.size} rows != batch ${batch.size}")
    // hourly slices of a stationary fixture should mostly sit BELOW
    // the 0.1 page-out line — the verdict must not fire everywhere
    assert(streamed.count(_.getBoolean(4)) < streamed.size,
      "drift verdict fired on every window of a stationary stream")
  }

  test("nn serve (batch): per-query top-1 is the exact cell maximum") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:15:00")
    val all = t(spark, sf(), "embeddings")
    val queries = all.filter($"vec_id" % 37 === 1)
      .withColumn("ingest_ts", lit(t0))
    val cb = EmbedStream.codebook(all)
    val got = EmbedStream.nnServe(queries, all, cb)
      .select($"qid", $"nn_id", $"nn_sim").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // replay: per vector, its 8-centroid cell; per query, the exact
    // rounded-cosine argmax over same-cell candidates (ties → low id)
    val vecs = all.select($"vec_id",
        $"embedding".cast("array<double>").as("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0d; var na = 0d; var nb = 0d
      a.indices.foreach { i =>
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      math.round(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e4) / 1e4.toDouble
    }
    val cents = (0L until 8L).map(c => c -> vecs(c))
    def cellOf(v: Array[Double]): Long =
      cents.map { case (c, cv) => (-cos(v, cv), c) }.min._2
    val cells = vecs.map { case (id, v) => id -> cellOf(v) }
    got.foreach { case (qid, (nnId, nnSim)) =>
      val cands = vecs.keys.filter(c =>
        c != qid && cells(c) == cells(qid))
      val want = cands.map(c => (-cos(vecs(qid), vecs(c)), c)).min
      assert(nnId == want._2 && math.abs(nnSim + want._1) < 1e-9,
        s"q$qid: got ($nnId, $nnSim), want (${want._2}, ${-want._1})")
    }
    assert(got.nonEmpty)
  }

  test("nn serve (streaming): windowed top-1 == batch (parity)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_nn").toString
    val src = s"$root/src"
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:10:00")
    val t1 = java.sql.Timestamp.valueOf("2024-06-01 11:40:00")
    val all = t(spark, sf(), "embeddings")
    all.filter($"vec_id" % 37 === 1).withColumn("ingest_ts", lit(t0))
      .unionAll(all.filter($"vec_id" % 37 === 2)
        .withColumn("ingest_ts", lit(t1)))
      .write.mode("append").parquet(src)
    val cb = EmbedStream.codebook(all)
    val schema = spark.read.parquet(src).schema
    val q = EmbedStream.nnServe(
        spark.readStream.schema(schema).parquet(src), all, cb)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("nn_stream").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("nn_stream")
      .orderBy($"w_start", $"qid").collect().toSeq
    val batch = EmbedStream.nnServe(spark.read.parquet(src), all, cb)
      .orderBy($"w_start", $"qid").collect().toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"streaming ${streamed.size} rows != batch ${batch.size}")
    assert(streamed.map(_.getTimestamp(0)).distinct.length == 2,
      "both serve windows must be present")
  }

  test("nn serve: duplicate same-window arrivals don't inflate n_cand") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:10:00")
    val t1 = java.sql.Timestamp.valueOf("2024-06-01 10:40:00")
    val all = t(spark, sf(), "embeddings")
    val once = all.filter($"vec_id" % 37 === 1).withColumn("ingest_ts", lit(t0))
    val twice = once.unionAll(once.withColumn("ingest_ts", lit(t1)))
    val cb = EmbedStream.codebook(all)
    def res(q: org.apache.spark.sql.DataFrame) =
      EmbedStream.nnServe(q, all, cb)
        .select($"qid", $"nn_id", $"nn_sim", $"n_cand").collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    // ADVICE r8: a query arriving twice within one hour window must
    // produce the same row as arriving once — including n_cand
    assert(res(twice) == res(once),
      "duplicate arrival changed the serve row (n_cand inflation)")
  }

  test("bloom guard (batch): eval docs always flag, geometry matches") {
    import spark.implicits._
    val docs = t(spark, sf(), "documents")
    val h = substring(md5($"doc_id".cast("string").cast("binary")), 1, 1)
    val evalDocs = docs.filter(h.isin("d", "e", "f"))
    val model = DocStream.evalGramBloom(evalDocs)
    // the word table is the bounded artifact the stream broadcasts
    assert(model.count() <= graft.queries.PipelineOps.BloomM / 63 + 1)
    val got = DocStream.bloomGuard(docs, model).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    val evalIds = evalDocs.select($"doc_id").collect()
      .map(_.getLong(0)).toSet
    // no false negatives: an eval doc's grams are ALL in the filter
    got.filter(r => evalIds(r._1) && r._2 > 0).foreach {
      case (id, ng, nh, flag) =>
        assert(nh == ng && flag, s"doc $id: eval grams missed ($nh/$ng)")
    }
    // and the filter discriminates: not every non-eval doc is a flag
    val nonEval = got.filter(r => !evalIds(r._1) && r._2 > 0)
    assert(nonEval.exists(!_._4), "guard flags everything (no FP control)")
  }

  test("bloom guard (streaming): stateless parity with batch") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_bloomg").toString
    val src = s"$root/src"
    val docs = t(spark, sf(), "documents")
    docs.write.mode("append").parquet(src)
    val h = substring(md5($"doc_id".cast("string").cast("binary")), 1, 1)
    val model = DocStream.evalGramBloom(docs.filter(h.isin("d", "e", "f")))
    val schema = spark.read.parquet(src).schema
    val q = DocStream.bloomGuard(
        spark.readStream.schema(schema).parquet(src), model)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("bloomg_stream").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("bloomg_stream")
      .orderBy($"doc_id").collect().toSeq
    val batch = DocStream.bloomGuard(spark.read.parquet(src), model)
      .orderBy($"doc_id").collect().toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"streaming ${streamed.size} rows != batch ${batch.size}")
  }

  test("recall canary: low-hit shares replay from the serve rows") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:15:00")
    val all = t(spark, sf(), "embeddings")
    val queries = all.filter($"vec_id" % 37 === 1)
      .withColumn("ingest_ts", lit(t0))
    val cb = EmbedStream.codebook(all)
    val serve = EmbedStream.nnServe(queries, all, cb)
      .select($"nn_sim").collect().map(_.getDouble(0))
    val floor = 5000L
    val expLow = serve.count(s => math.round(s * 1e4) < floor).toLong
    val got = EmbedStream.recallCanary(queries, all, cb, floor).collect()
    assert(got.length == 1)
    assert(got.head.getLong(1) == serve.length.toLong,
      "canary lost queries")
    assert(got.head.getLong(2) == expLow, "low-hit count diverges")
    assert(got.head.getBoolean(3) == (expLow * 5 >= serve.length),
      "alert rule diverges")
  }

  test("recall canary (streaming): closed window == batch (parity)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_canary").toString
    val src = s"$root/src"
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:10:00")
    val t1 = java.sql.Timestamp.valueOf("2024-06-01 13:40:00")
    val all = t(spark, sf(), "embeddings")
    all.filter($"vec_id" % 37 === 1).withColumn("ingest_ts", lit(t0))
      .unionAll(all.filter($"vec_id" % 37 === 2)
        .withColumn("ingest_ts", lit(t1)))
      .write.mode("append").parquet(src)
    val cb = EmbedStream.codebook(all)
    val schema = spark.read.parquet(src).schema
    // chained windowed aggs → append mode; the t1 batch pushes the
    // watermark past window [10:00, 11:00)'s close, so that window
    // emits; [13:00, 14:00) stays open and must NOT emit yet
    val q = EmbedStream.recallCanary(
        spark.readStream.schema(schema).parquet(src), all, cb)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("canary_stream").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("canary_stream").collect().toSeq
    val batch = EmbedStream.recallCanary(spark.read.parquet(src), all, cb)
      .filter($"w_start" === java.sql.Timestamp.valueOf("2024-06-01 10:00:00"))
      .collect().toSeq
    assert(streamed.nonEmpty, "closed canary window never emitted")
    assert(streamed == batch, "canary stream != batch on closed window")
  }

  test("cdc monitor (batch): geometry replays; band verdicts; null rule") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:15:00")
    val base = t(spark, sf(), "documents")
    val docs = base.withColumn("ingest_ts", lit(t0))
    val model = DocStream.cdcModel(base)
    val got = DocStream.cdcMonitor(docs, model).collect()
    assert(got.nonEmpty)
    // pure-Scala replay of the cut rule per source
    val raw = base.select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter(_._2.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    def chunksOf(text: String): Long = {
      val cuts = (8 to text.length).count { i =>
        val hex = md.digest(text.substring(i - 8, i).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8)
        java.lang.Long.parseLong(hex, 16) % 64 == 0 && i < text.length
      }
      cuts + 1L
    }
    val bySrc = raw.groupBy(_._1).map { case (s0, xs) =>
      s0 -> (xs.length.toLong, xs.map(_._2.length.toLong).sum,
        xs.map(x => chunksOf(x._2)).sum)
    }
    got.foreach { r =>
      val (src, nDocs, bytes, nChunks) =
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val (en, eb, ec) = bySrc(src)
      assert(nDocs == en && bytes == eb && nChunks == ec,
        s"$src: geometry diverges from the pure-Scala cut replay")
      // trained on the identical corpus → live == expected → ok
      assert(r.getString(7) == "ok", s"$src: ${r.getString(7)}")
    }
    assert(got.map(_.getString(1)).toSet == bySrc.keySet)
    // unmodeled source → null verdict (LEFT-join baseline rule)
    val dropSrc = bySrc.keySet.min
    val got2 = DocStream
      .cdcMonitor(docs, model.filter($"source" =!= dropSrc)).collect()
    assert(got2.find(_.getString(1) == dropSrc).get.isNullAt(7),
      "unmodeled source must publish a null verdict")
    // a 3x-inflated baseline puts every live length outside ±25%
    val got3 = DocStream
      .cdcMonitor(docs, model.withColumn("exp_len_e4", $"exp_len_e4" * 3))
      .collect()
    got3.foreach(r => assert(r.getString(7) == "drift",
      s"${r.getString(1)}: expected drift against a 3x baseline"))
  }

  test("cdc monitor (streaming): == batch (parity)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_cdc").toString
    val src = s"$root/src"
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:15:00")
    val base = t(spark, sf(), "documents")
    base.filter($"doc_id" % 2 === 0).withColumn("ingest_ts", lit(t0))
      .write.mode("append").parquet(src)
    base.filter($"doc_id" % 2 === 1).withColumn("ingest_ts", lit(t0))
      .write.mode("append").parquet(src)
    val model = DocStream.cdcModel(base)
    val schema = spark.read.parquet(src).schema
    val q = DocStream.cdcMonitor(
        spark.readStream.schema(schema).parquet(src), model)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("cdc_stream").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("cdc_stream")
      .orderBy($"w_start", $"source").collect().toSeq
    val batch = DocStream.cdcMonitor(spark.read.parquet(src), model)
      .orderBy($"w_start", $"source").collect().toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"streaming ${streamed.size} rows != batch ${batch.size}")
  }

  test("stored-index serve (streaming): windowed top-k == batch == searchTopKStored") {
    import spark.implicits._
    // persisted index built once, served by a later "session" (here: a
    // streaming query that only sees the index DIRECTORY)
    val idxDir = Files.createTempDirectory("graft_serveidx").toString
    graft.engine.AnnIndexStore.save(spark, sf(), idxDir)
    val root = Files.createTempDirectory("graft_serve").toString
    val src = s"$root/src"
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:10:00")
    val t1 = java.sql.Timestamp.valueOf("2024-06-01 11:40:00")
    val all = t(spark, sf(), "embeddings")
      .select($"vec_id".as("q_id"),
        $"embedding".cast("array<double>").as("q"))
    all.filter($"q_id" % 97 === 0).withColumn("ingest_ts", lit(t0))
      .unionAll(all.filter($"q_id" % 97 === 1)
        .withColumn("ingest_ts", lit(t1)))
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = AnnIndexServe.serveTopK(spark, idxDir,
        spark.readStream.schema(schema).parquet(src), k = 5)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("ann_serve_stream").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ann_serve_stream")
      .orderBy($"w_start", $"q_id", $"rank").collect().toSeq
    val batch = AnnIndexServe.serveTopK(spark, idxDir,
        spark.read.parquet(src), k = 5)
      .orderBy($"w_start", $"q_id", $"rank").collect().toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"streaming ${streamed.size} rows != batch ${batch.size}")
    assert(streamed.map(_.getTimestamp(0)).distinct.length == 2,
      "both serve windows must be present")
    // and per query the served rows ARE the batch stored-search rows
    val w0 = streamed.filter(_.getTimestamp(0)
        .equals(java.sql.Timestamp.valueOf("2024-06-01 10:00:00")))
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val stored = graft.engine.AnnIndexStore
      .searchTopKStored(spark, idxDir, all.filter($"q_id" % 97 === 0), 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(w0.sorted == stored.sorted,
      "streamed window-0 rows != batch searchTopKStored rows")
  }

  test("stored-index serve straddling a compact stays consistent (no torn read)") {
    import spark.implicits._
    // a FRAGMENTED index (base + two append waves), served by a
    // long-running stream while compact() commits a new snapshot
    // mid-stream: the stream's static side pinned the pre-compact
    // snapshot at start, compact leaves those files on disk (vacuum
    // is deferred by contract), and compaction is row-preserving — so
    // every batch, before or after the commit, must return exactly
    // the batch-mode serve rows: either-version-consistent, never a
    // FileNotFound or a half-compacted mixture (verdict r14 ask #3)
    val idxDir = Files.createTempDirectory("graft_cptserveidx").toString
    val emb = t(spark, sf(), "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val baseDir = Files.createTempDirectory("graft_cptserveb").toString
    emb.filter($"vec_id" % 3 === 0)
      .select($"vec_id", $"v".as("embedding"))
      .write.mode("overwrite").parquet(s"$baseDir/embeddings.parquet")
    graft.engine.AnnIndexStore.save(spark, baseDir, idxDir)
    graft.engine.AnnIndexStore.append(spark, idxDir,
      emb.filter($"vec_id" % 3 === 1))
    graft.engine.AnnIndexStore.append(spark, idxDir,
      emb.filter($"vec_id" % 3 === 2))
    assert(graft.engine.AnnIndexStore
      .cellFileCounts(spark, idxDir).values.max >= 3)

    val root = Files.createTempDirectory("graft_cptserve").toString
    val src = s"$root/src"
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:10:00")
    val t1 = java.sql.Timestamp.valueOf("2024-06-01 11:40:00")
    val all = t(spark, sf(), "embeddings")
      .select($"vec_id".as("q_id"),
        $"embedding".cast("array<double>").as("q"))
    all.filter($"q_id" % 97 === 0).withColumn("ingest_ts", lit(t0))
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = AnnIndexServe.serveTopK(spark, idxDir,
        spark.readStream.schema(schema).parquet(src), k = 3)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("ann_cpt_stream").start()
    try {
      q.processAllAvailable() // wave 1 served on the pre-compact pin
      // compact commits underneath the running stream
      assert(graft.engine.AnnIndexStore.compact(spark, idxDir).nonEmpty)
      // wave 2 arrives and is served across the commit
      all.filter($"q_id" % 97 === 1).withColumn("ingest_ts", lit(t1))
        .write.mode("append").parquet(src)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ann_cpt_stream")
      .orderBy($"w_start", $"q_id", $"rank").collect().toSeq
    // batch replay over the POST-compact snapshot: compaction is
    // row-preserving, so either pinned version must produce these rows
    val batch = AnnIndexServe.serveTopK(spark, idxDir,
        spark.read.parquet(src), k = 3)
      .orderBy($"w_start", $"q_id", $"rank").collect().toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"straddling serve: streaming ${streamed.size} rows != batch ${batch.size}")
    assert(streamed.map(_.getTimestamp(0)).distinct.length == 2,
      "both serve windows must be present")
  }

  test("index frag monitor (streaming): == batch; predicts append's landing") {
    import spark.implicits._
    // index over the even vectors; the odd ones arrive as two append
    // waves on the stream
    val idxDir = Files.createTempDirectory("graft_fragmon_idx").toString
    val emb = t(spark, sf(), "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val baseDir = Files.createTempDirectory("graft_fragmon_b").toString
    emb.filter($"vec_id" % 2 === 0)
      .select($"vec_id", $"v".as("embedding"))
      .write.mode("overwrite").parquet(s"$baseDir/embeddings.parquet")
    graft.engine.AnnIndexStore.save(spark, baseDir, idxDir)

    val root = Files.createTempDirectory("graft_fragmon").toString
    val src = s"$root/src"
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:10:00")
    val t1 = java.sql.Timestamp.valueOf("2024-06-01 11:40:00")
    val odd = emb.filter($"vec_id" % 2 === 1)
    odd.filter($"vec_id" % 4 === 1).withColumn("ingest_ts", lit(t0))
      .unionAll(odd.filter($"vec_id" % 4 === 3)
        .withColumn("ingest_ts", lit(t1)))
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = AnnIndexServe.fragMonitor(spark, idxDir,
        spark.readStream.schema(schema).parquet(src))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("frag_mon_stream").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("frag_mon_stream")
      .orderBy($"w_start", $"cell").collect().toSeq
    val batch = AnnIndexServe.fragMonitor(spark, idxDir,
        spark.read.parquet(src))
      .orderBy($"w_start", $"cell").collect().toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"frag monitor: streaming ${streamed.size} != batch ${batch.size}")
    assert(streamed.map(_.getTimestamp(0)).distinct.size == 2,
      "both append-wave windows must be present")
    // a fresh index holds 1 file/cell: a first wave projects 2 —
    // under the default bound of 3 — so no premature recommendation
    streamed.foreach { r =>
      assert(r.getLong(r.fieldIndex("files_after")) == 2L, r.toString)
      assert(!r.getBoolean(r.fieldIndex("compact_recommended")), r.toString)
    }

    // the monitor's cell assignment IS append's: commit wave 1 and the
    // touched-cell set must equal the cells whose file count grew
    val before = graft.engine.AnnIndexStore.cellFileCounts(spark, idxDir)
    graft.engine.AnnIndexStore.append(spark, idxDir,
      odd.filter($"vec_id" % 4 === 1))
    val after = graft.engine.AnnIndexStore.cellFileCounts(spark, idxDir)
    val grew = after.collect {
      case (c, n) if n > before.getOrElse(c, 0) => c }.toSet
    val touched = spark.read.parquet(src)
      .filter($"ingest_ts" === lit(t0))
    val predicted = AnnIndexServe.fragMonitor(spark, idxDir, touched)
      .collect()
    // after one committed wave the touched cells hold 2 files, so the
    // NEXT wave of the same vectors projects 3 -> recommend compact
    predicted.foreach { r =>
      assert(r.getLong(r.fieldIndex("files_after")) == 3L, r.toString)
      assert(r.getBoolean(r.fieldIndex("compact_recommended")), r.toString)
    }
    assert(predicted.map(_.getLong(1)).toSet == grew,
      s"monitor predicted cells ${predicted.map(_.getLong(1)).toSet}; " +
        s"append landed in $grew")
  }

  test("qdigest monitor: streaming == batch == independent q-digest replay") {
    import spark.implicits._
    EventStream.runToMemory(spark, stagedEvents,
      df => EventStream.qdigestMonitor(df), "quant_stream",
      OutputMode.Complete())
    val streamed = spark.table("quant_stream")
      .orderBy($"w_start").collect().toSeq
    val batch = EventStream
      .qdigestMonitor(spark.read.parquet(stagedEvents))
      .orderBy($"w_start").collect().toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"quantile monitor: streaming ${streamed.size} != batch ${batch.size}")

    // independent replay: plain-Scala q-digest per hour window over
    // the same staged rows — the monitor must reproduce it exactly,
    // self-audit green, nothing clamped on the fixture domain
    val raw = spark.read.parquet(stagedEvents)
      .select(date_trunc("hour", $"ts").as("w"), $"value")
      .collect().map(r => (r.getTimestamp(0), r.getDouble(1)))
    val expected = raw.groupBy(_._1).map { case (w, rows) =>
      val e2 = rows.map { case (_, v) =>
        math.max(0L, math.min(graft.engine.QDigest.U - 1L,
          math.round(v * 100))).toInt
      }.toSeq
      val (dig, n) = graft.engine.QDigest.fromValues(e2.iterator, 1024)
      def est(q: Long): Double =
        graft.engine.QDigest.quantile(dig, (n * q + 99L) / 100L) / 100.0
      w -> ((n, est(50L), est(99L)))
    }
    streamed.foreach { r =>
      val (n, p50, p99) = expected(r.getTimestamp(0))
      assert(r.getLong(r.fieldIndex("n_events")) == n, r.toString)
      assert(r.getDouble(r.fieldIndex("p50_est")) == p50, r.toString)
      assert(r.getDouble(r.fieldIndex("p99_est")) == p99, r.toString)
      assert(r.getBoolean(r.fieldIndex("within_bound")), r.toString)
      assert(r.getLong(r.fieldIndex("n_clamped")) == 0L, r.toString)
    }
  }

  test("k-anonymity monitor (batch): classes equal an independent rollup") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = spark.read.parquet(stagedEvents)
    val got = EventStream.kAnonymityMonitor(ev)
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2),
        r.getLong(3)) -> (r.getLong(4), r.getBoolean(5))).toMap

    // independent expectation: two-level modal folds via window
    // functions, the batch-qiProfile discipline restricted per window
    val base = ev.select(window($"ts", "1 hour")("start").as("ws"),
      $"user_id", $"event_type", expr("hour(ts) div 6").cast("long").as("hb"))
    val byType = base.groupBy($"ws", $"user_id", $"event_type")
      .agg(count(lit(1)).as("c"))
    val mtype = byType.withColumn("rn", row_number().over(
        Window.partitionBy($"ws", $"user_id")
          .orderBy($"c".desc, $"event_type")))
      .filter($"rn" === 1).select($"ws", $"user_id",
        $"event_type".as("mtype"))
    val n = base.groupBy($"ws", $"user_id").agg(count(lit(1)).as("n"))
      .select($"ws", $"user_id", expr(
        "cast(case when n < 4 then 0 when n < 16 then 1 when n < 64" +
          " then 2 when n < 256 then 3 else 4 end as long)").as("vband"))
    val hband = base.groupBy($"ws", $"user_id", $"hb")
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"ws", $"user_id").orderBy($"c".desc, $"hb")))
      .filter($"rn" === 1).select($"ws", $"user_id", $"hb".as("hband"))
    val want = mtype.join(hband, Seq("ws", "user_id"))
      .join(n, Seq("ws", "user_id"))
      .groupBy($"ws", $"hband", $"mtype", $"vband")
      .agg(count(lit(1)).as("n_users"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2),
        r.getLong(3)) -> (r.getLong(4), r.getLong(4) >= 5L)).toMap
    assert(got.nonEmpty && got == want,
      s"monitor classes diverge: ${got.size} vs ${want.size}")
    // the monitor is a monitor: the fixture must produce real alerts
    assert(got.values.exists(!_._2), "expected at least one sub-k alert")
  }

  test("l-diversity monitor: batch classes match k monitor; streaming == batch") {
    import spark.implicits._
    val ev = spark.read.parquet(stagedEvents)
    val sens = graft.queries.EventsLog.userSpendBand(spark, sf())
      .localCheckpoint()
    val got = EventStream.lDiversityMonitor(ev, sens).collect()
    assert(got.nonEmpty)
    // class keys and sizes agree with the k monitor (sens covers every
    // user of the same events fixture, so the inner join drops nobody)
    val km = EventStream.kAnonymityMonitor(ev).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2),
        r.getLong(3)) -> r.getLong(4)).toMap
    got.foreach { r =>
      val key = (r.getTimestamp(0), r.getLong(1), r.getString(2),
        r.getLong(3))
      assert(km.get(key).contains(r.getLong(r.fieldIndex("n_users"))),
        s"class $key disagrees with the k monitor")
      val ld = r.getLong(r.fieldIndex("l_distinct"))
      assert(ld >= 1L && ld <= r.getLong(r.fieldIndex("n_users")),
        s"l_distinct out of range: $r")
    }
    assert(got.length == km.size, "monitors must see the same classes")

    // streaming parity on closed windows (sentinel pushes the watermark)
    val dir = Files.createTempDirectory("graft_ldiv").toString
    val src = s"$dir/src"
    t(spark, sf(), "events").select($"ts", $"user_id", $"event_type")
      .write.mode("append").parquet(src)
    Seq((java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), 999999L,
        "view"))
      .toDF("ts", "user_id", "event_type")
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = EventStream.lDiversityMonitor(
        spark.readStream.schema(schema).parquet(src), sens)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ldiv_stream").start()
    try q.processAllAvailable() finally q.stop()
    val cutoff = java.sql.Timestamp.valueOf("2029-01-01 00:00:00")
    val streamed = spark.table("ldiv_stream")
      .orderBy($"w_start", $"hband", $"mtype", $"vband")
      .collect().toSeq
    val batch = EventStream
      .lDiversityMonitor(spark.read.parquet(src), sens)
      .filter($"w_start" < cutoff)
      .orderBy($"w_start", $"hband", $"mtype", $"vband")
      .collect().toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"streaming ${streamed.size} rows != batch ${batch.size}")
  }

  test("stored-tokenizer doc stream: windowed counts == batch artifact encode") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft_bpe_serve").toString
    graft.engine.BpeStore.save(spark, sf(), store)

    // batch, one window: per-source sums must equal the batch
    // stored-artifact encode exactly
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:15:00")
    val docs1 = t(spark, sf(), "documents").withColumn("ingest_ts", lit(t0))
    val got = DocStream.bpeTokenCounts(docs1, store)
      .select($"source", $"n_words", $"n_cps", $"n_tokens", $"compression")
      .orderBy($"source").collect().toSeq
    val want = graft.engine.BpeStore.encodeStoredCounts(spark, store, sf())
      .orderBy($"source").collect().toSeq
    assert(got.nonEmpty && got == want,
      s"windowed stored encode != batch artifact encode")

    // streaming over two windows == batch same plan
    val root = Files.createTempDirectory("graft_bpe_stream").toString
    val src = s"$root/src"
    val t1 = java.sql.Timestamp.valueOf("2024-06-01 11:40:00")
    val ref = t(spark, sf(), "documents")
    ref.filter($"doc_id" % 2 === 0).withColumn("ingest_ts", lit(t0))
      .unionAll(ref.filter($"doc_id" % 2 === 1)
        .withColumn("ingest_ts", lit(t1)))
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = DocStream.bpeTokenCounts(
        spark.readStream.schema(schema).parquet(src), store)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("bpe_stream").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("bpe_stream")
      .orderBy($"w_start", $"source").collect().toSeq
    val batch = DocStream.bpeTokenCounts(spark.read.parquet(src), store)
      .orderBy($"w_start", $"source").collect().toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"streaming ${streamed.size} != batch ${batch.size}")
    assert(streamed.map(_.getTimestamp(0)).distinct.length == 2,
      "both ingest windows must be present")
  }

  test("privacy trio monitor: EMD matches an independent replay; streaming == batch") {
    import spark.implicits._
    val ev = spark.read.parquet(stagedEvents)
    val sens = graft.queries.EventsLog.userSpendBand(spark, sf())
      .localCheckpoint()
    val globBands = sens.groupBy($"sband").count()
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    val nn = globBands.map(_._2).sum
    val bb = globBands.size

    val got = EventStream.privacyTrioMonitor(ev, sens, globBands).collect()
    assert(got.nonEmpty)

    // class keys/sizes/l_distinct agree with the l monitor (one
    // aggregator vs two — same classes by construction)
    val lm = EventStream.lDiversityMonitor(ev, sens).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2),
        r.getLong(3)) -> (r.getLong(4), r.getLong(5))).toMap
    assert(got.length == lm.size)
    got.foreach { r =>
      val key = (r.getTimestamp(0), r.getLong(1), r.getString(2),
        r.getLong(3))
      assert(lm.get(key).contains((r.getLong(r.fieldIndex("n_users")),
        r.getLong(r.fieldIndex("l_distinct")))),
        s"trio disagrees with l monitor at $key")
    }

    // EMD: independent plain-Scala replay of the batch arithmetic
    // over the per-(window, user) profile rows
    val perUser = ev
      .join(broadcast(sens), Seq("user_id"))
      .select(window($"ts", "1 hour")("start").as("ws"), $"user_id",
        $"event_type", $"sband",
        expr("hour(ts) div 6").cast("long").as("hb"))
      .collect()
      .groupBy(r => (r.getTimestamp(0), r.getLong(1)))
      .toSeq
      .map { case ((ws, _), rows) =>
        val hb = rows.groupBy(_.getLong(4)).view.mapValues(_.size).toSeq
          .minBy { case (h, c) => (-c, h) }._1
        val mt = rows.groupBy(_.getString(2)).view.mapValues(_.size).toSeq
          .minBy { case (t, c) => (-c, t) }._1
        val n = rows.size
        val vb = if (n < 4) 0L else if (n < 16) 1L else if (n < 64) 2L
          else if (n < 256) 3L else 4L
        ((ws, hb, mt, vb), rows.head.getLong(3))
      }.toSeq
    val wantEmd = perUser.groupBy(_._1).map { case (key, members) =>
      val hist = members.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val n = members.size.toLong
      var cc = 0L; var gc = 0L; var emd = 0L
      globBands.foreach { case (band, g) =>
        cc += hist.getOrElse(band, 0L); gc += g
        emd += math.round(1e6 * math.abs(
          cc.toDouble / n - gc.toDouble / nn))
      }
      key -> (if (bb > 1)
        BigDecimal(emd.toDouble / 1e6 / (bb - 1))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      else 0.0)
    }
    got.foreach { r =>
      val key = (r.getTimestamp(0), r.getLong(1), r.getString(2),
        r.getLong(3))
      val e = r.getDouble(r.fieldIndex("emd"))
      assert(wantEmd.get(key).exists(w => math.abs(w - e) < 5e-5),
        s"EMD mismatch at $key: got $e want ${wantEmd.get(key)}")
    }

    // streaming parity on closed windows
    val dir = Files.createTempDirectory("graft_trio").toString
    val src = s"$dir/src"
    t(spark, sf(), "events").select($"ts", $"user_id", $"event_type")
      .write.mode("append").parquet(src)
    Seq((java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), 999999L,
        "view"))
      .toDF("ts", "user_id", "event_type")
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = EventStream.privacyTrioMonitor(
        spark.readStream.schema(schema).parquet(src), sens, globBands)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("trio_stream").start()
    try q.processAllAvailable() finally q.stop()
    val cutoff = java.sql.Timestamp.valueOf("2029-01-01 00:00:00")
    val streamed = spark.table("trio_stream")
      .orderBy($"w_start", $"hband", $"mtype", $"vband")
      .collect().toSeq
    val batch = EventStream
      .privacyTrioMonitor(spark.read.parquet(src), sens, globBands)
      .filter($"w_start" < cutoff)
      .orderBy($"w_start", $"hband", $"mtype", $"vband")
      .collect().toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"streaming ${streamed.size} rows != batch ${batch.size}")
  }

  test("k-anonymity monitor (streaming): append output == batch on closed windows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_kanon").toString
    val src = s"$dir/src"
    t(spark, sf(), "events")
      .select($"ts", $"user_id", $"event_type")
      .write.mode("append").parquet(src)
    // far-future sentinel: pushes the watermark past every fixture
    // window so append mode emits them all (its own window stays open)
    Seq((java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), 999999L,
        "view"))
      .toDF("ts", "user_id", "event_type")
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = EventStream.kAnonymityMonitor(
        spark.readStream.schema(schema).parquet(src))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("kanon_stream").start()
    try q.processAllAvailable() finally q.stop()
    val cutoff = java.sql.Timestamp.valueOf("2029-01-01 00:00:00")
    val streamed = spark.table("kanon_stream")
      .orderBy($"w_start", $"hband", $"mtype", $"vband")
      .collect().toSeq
    val batch = EventStream.kAnonymityMonitor(spark.read.parquet(src))
      .filter($"w_start" < cutoff)
      .orderBy($"w_start", $"hband", $"mtype", $"vband")
      .collect().toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"streaming ${streamed.size} rows != batch ${batch.size}")
  }
}
