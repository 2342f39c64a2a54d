package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.4 "streaming" row; the
  * reference is batch-only, so this is the §2.5 scale extension for the
  * `events` stream): watermarked tumbling-window aggregation and
  * GroupState-based per-key running state.
  *
  * The transforms are defined against plain DataFrames so the SAME code
  * path serves batch and streaming (`spark.read` vs `spark.readStream`) —
  * batch-stream parity is asserted in StreamingSpec.
  */
object EventStream {

  /** Hour-of-week baseline model for [[seasonalAnomaly]]: per
    * (event_type, dow, hod) cell, exact integer count/Σx/Σx² over the
    * DENSE hourly grid — absent hours count as zeros, exactly the
    * declared log_anomaly_seasonal's stats stage. Built from history in
    * batch; the result is bounded by types × 168 rows, so it broadcasts
    * into the live stream (the cellDrift batch-model→stream-serving
    * pattern applied to the events family). */
  def seasonalBaseline(events: DataFrame): DataFrame =
    // ONE definition of the dense grid + stats, shared with the
    // declared log_anomaly_seasonal — the twins cannot drift
    graft.queries.EventsLog.seasonalStats(events)

  /** Online seasonal anomaly flags: hourly windowed counts per type,
    * flagged against the broadcast hour-of-week baseline with the SAME
    * wide-integer 1.5σ rule as the declared log_anomaly_seasonal — the
    * live half of train-in-batch / serve-in-stream. The stream-static
    * join runs BEFORE the windowed agg (Structured Streaming forbids
    * joins after a streaming aggregation); the baseline columns are
    * constant within a (window, type) group, so min() carries them
    * through the agg unchanged. State is the windowed agg's only.
    *
    * The baseline join is LEFT OUTER (ADVICE r8): an event type the
    * training history never saw — arguably the most anomalous traffic
    * — still produces a monitor row, with `is_anomaly = null` as the
    * explicit "unmodeled" verdict (a 1-hour window maps to exactly one
    * (dow, hod) cell, so a group is entirely modeled or entirely not;
    * null never silently reads as "normal" the way a dropped row or a
    * defaulted 0 would). */
  def seasonalAnomaly(events: DataFrame, baseline: DataFrame,
      wmDelay: String = "1 hour"): DataFrame = {
    import events.sparkSession.implicits._
    val keyed = events
      .select($"ts", $"event_type",
        (weekday($"ts") + 1).cast("long").as("dow"),
        hour($"ts").cast("long").as("hod"))
      .join(broadcast(baseline), Seq("event_type", "dow", "hod"),
        "left_outer")
    val src = if (events.isStreaming) keyed.withWatermark("ts", wmDelay)
      else keyed
    src.groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), min($"c").as("c"),
        min($"sx").as("sx"), min($"sxx").as("sxx"))
      .select($"window.start".as("w_start"), $"event_type", $"n",
        when($"c".isNull, lit(null).cast("long")).otherwise(
          when(expr(
            "4 * (cast(n as decimal(38,0)) * cast(c as decimal(38,0))" +
              " - cast(sx as decimal(38,0)))" +
              " * (cast(n as decimal(38,0)) * cast(c as decimal(38,0))" +
              " - cast(sx as decimal(38,0)))" +
              " > 9 * (cast(c as decimal(38,0)) * cast(sxx as" +
              " decimal(38,0)) - cast(sx as decimal(38,0))" +
              " * cast(sx as decimal(38,0)))"), 1L).otherwise(0L))
          .as("is_anomaly"))
  }

  /** Reference bin model for [[psiDrift]]: per event_type, the
    * history's 10-bin value counts r0..r9 with total n_ref, plus the
    * GLOBAL value bounds every bin assignment derives from. Bounded by
    * the type alphabet (one flat row per type), so it broadcasts into
    * the live stream — the train-in-batch half of the PSI monitor.
    * The bin rule is the ONE definition shared with the declared
    * log_psi_drift ([[graft.queries.EventsLog.valueBin]]). */
  def psiModel(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val bounds = events
      .agg(min($"value").as("v0"), max($"value").as("v1"))
    val binSums = (1 to 9).map(b =>
      sum(when($"bin" === b.toLong, 1L).otherwise(0L)).as(s"r$b")) ++
      Seq(count(lit(1)).as("n_ref"), min($"v0").as("v0"),
        min($"v1").as("v1"))
    events.select($"event_type", $"value").crossJoin(broadcast(bounds))
      .select($"event_type",
        graft.queries.EventsLog.valueBin.as("bin"), $"v0", $"v1")
      .groupBy($"event_type")
      .agg(sum(when($"bin" === 0L, 1L).otherwise(0L)).as("r0"),
        binSums: _*)
  }

  /** Online PSI drift monitor — the serve-in-stream half of the
    * declared log_psi_drift: per (hour window, event_type), the
    * Laplace-smoothed PSI of the window's value distribution against
    * the broadcast reference model. The stream-static join runs
    * BEFORE the windowed agg (the seasonalAnomaly discipline); the
    * agg carries ten conditional bin sums, so per-key state is a
    * fixed 10-counter row — never a value list; the ln() fold is a
    * post-agg projection built from the SAME e10-quantized term as
    * the batch query ([[graft.queries.EventsLog.psiTermE10]]). The
    * page-out verdict is the batch 0.1 line PLUS a 2(k−1)/n
    * small-sample noise floor: a no-drift window of n samples has
    * E[PSI] ≈ (k−1)/n, so an hourly window of tens of events would
    * page constantly on the raw batch threshold — the floor demands
    * proportionally more evidence from smaller windows and converges
    * to the batch rule as n grows. Evaluated as the exact integer
    * cross-product psi_e10·n > 10⁹·n + 18·10¹⁰. */
  def psiDrift(events: DataFrame, model: DataFrame,
      wmDelay: String = "1 hour"): DataFrame = {
    import events.sparkSession.implicits._
    val keyed = events.select($"ts", $"event_type", $"value")
      // LEFT OUTER (ADVICE r8): an event type absent from the trained
      // model still surfaces as a monitor row — psi/drifted are null
      // ("unmodeled"), never a silent drop. The bin column is null for
      // such rows (valueBin needs v0/v1), which the conditional sums
      // simply never match — n still counts the arrivals.
      .join(broadcast(model), Seq("event_type"), "left_outer")
      .withColumn("bin", graft.queries.EventsLog.valueBin)
    val src = if (events.isStreaming) keyed.withWatermark("ts", wmDelay)
      else keyed
    val aggs = (1 to 9).map(b =>
      sum(when($"bin" === b.toLong, 1L).otherwise(0L)).as(s"c$b")) ++
      (0 to 9).map(b => min(col(s"r$b")).as(s"r$b")) ++
      Seq(min($"n_ref").as("n_ref"), count(lit(1)).as("n"))
    val psiE10 = (0 to 9).map { b =>
      graft.queries.EventsLog.psiTermE10(
        s"(cast(c$b + 1 as double) / (n + 10))",
        s"(cast(r$b + 1 as double) / (n_ref + 10))")
    }.mkString("(", " + ", ")")
    src.groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(sum(when($"bin" === 0L, 1L).otherwise(0L)).as("c0"), aggs: _*)
      .select(unix_micros($"window.start").as("hour_us"),
        $"event_type", $"n", expr(psiE10).as("psi_e10"), $"n_ref")
      .select($"hour_us", $"event_type", $"n",
        round($"psi_e10".cast("double") / 1e10, 4).as("psi"),
        // DECIMAL(38,0): psi_e10·n overflows int64 at cluster-scale n;
        // null psi_e10 (unmodeled type) propagates to a null verdict
        expr("""cast(psi_e10 as decimal(38,0))
          |  * cast(n as decimal(38,0))
          |  > cast(1000000000 as decimal(38,0))
          |    * cast(n as decimal(38,0))
          |    + cast(180000000000 as decimal(38,0))""".stripMargin)
          .as("drifted"))
  }

  /** Watermarked tumbling-window counts per event_type. In streaming
    * mode the 1-hour watermark bounds state; in batch mode the watermark
    * is a no-op and results equal the `log_hourly` batch query. */
  def hourlyCounts(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select(date_format($"w.start", "yyyy-MM-dd HH:00").as("hour"),
        $"event_type", $"n")
  }

  /** Watermarked SLIDING-window counts (2h windows every 1h): each event
    * lands in two overlapping windows — the streaming twin of the
    * declared `log_sliding` batch query. Distinct-user counting is
    * deliberately absent here: exact distinct is unsupported in
    * streaming aggregation (unbounded per-window state); the scale path
    * is `approx_count_distinct`, which is mergeable and bounded. */
  def slidingCounts(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "2 hours", "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros($"w.start").as("w_start"), $"n")
  }

  /** Watermarked tumbling-window APPROXIMATE distinct users — the scale
    * path slidingCounts' scaladoc points at: exact distinct needs
    * unbounded per-window state on a stream, while HLL state is
    * fixed-size and MERGEABLE, so partial sketches combine across
    * micro-batches and shuffle partitions. Batch parity is EXACT, not
    * approximate-vs-approximate: the HLL merge is order-insensitive and
    * lossless (shard-union == global estimate, proven in SketchesSpec),
    * so streaming and batch produce identical estimates over the same
    * data regardless of how micro-batches split it. */
  def hourlyUserEstimates(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour").as("w"))
      .agg(approx_count_distinct($"user_id", 0.01).as("approx_users"))
      .select(date_format($"w.start", "yyyy-MM-dd HH:00").as("hour"),
        $"approx_users")
  }

  /** Windowed DP-noised hourly count (r15 verdict ask #7) — the
    * STREAMING emission of the declared `log_dp_release` family's
    * hourly release: per closed event-time window, the event count
    * plus the SAME seeded discrete-Laplace mechanism, keyed on the
    * SAME 'h:<hour index>:dp2' seed as the batch `log_dp_hourly` row.
    * Because mechanism and key are shared definitions
    * (EventsLog.dpSeedM/DpKmagExpr/DpNoiseExpr — one string each),
    * a closed window's emitted row is BIT-EQUAL to the batch
    * release's row for that hour, so streaming emission is a replay
    * of the same release, not a second one: publishing an identical
    * value twice is post-processing and spends NO additional budget
    * (the ledger stays epsilon = ln 2, delta = 6.4e-7, event-level,
    * exactly as the batch row states). Two honest scope notes, stated
    * not hidden: the stream emits only OBSERVED hours — the
    * data-independent collection-window grid (noised zeros for silent
    * hours) is the batch release's job at window close, so the
    * streaming feed alone is a pre-release monitor, not the release
    * artifact; and exactly-once emission matters for privacy here —
    * a sink that re-derived noise per attempt would leak — which the
    * seeded mechanism guarantees by construction (replays are
    * bit-identical; kill sweep in StreamingRestartSpec). State is one
    * count per open window. */
  def dpHourlyMonitor(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .withColumn("h", expr("unix_micros(w.start) div 3600000000"))
      .withColumn("m", expr(graft.queries.EventsLog.dpSeedM(
        "concat('h:', cast(h as string), ':dp2')")))
      .withColumn("kmag", expr(graft.queries.EventsLog.DpKmagExpr))
      .withColumn("noise", expr(graft.queries.EventsLog.DpNoiseExpr))
      .select(($"h" * 3600000000L).as("hour_us"),
        greatest(lit(0L), $"n" + $"noise").as("n_released"),
        lit(0.6931).as("epsilon"), lit(6.4e-7).as("delta"))
  }

  /** Windowed k-anonymity monitor (r13 verdict ask #7) — the streaming
    * half of the batch privacy gate (`log_k_anonymity`): per event-time
    * window, each active user generalizes to a quasi-identifier
    * profile (modal 6-hour band, modal event type, volume band of the
    * window's count — the batch hierarchy applied to the window's
    * slice of activity), and every (window, QI class) emits its size
    * with the k verdict; `anonymous = false` rows are the alerts a
    * release pipeline pages on BEFORE the batch audit would catch the
    * dip. Two chained stateful operators, both watermark-bounded
    * (Spark's multiple-stateful-operator support): the per-(window,
    * user) fold runs [[graft.engine.TypedAggregators.QiProfile]] —
    * ONE aggregation with state bounded by the generalization
    * alphabets (4 bands × event types), not user volume — and the
    * class count re-windows the closed profiles, so its state is the
    * QI lattice × open windows (the cellDrift state-shape rule).
    * Batch mode runs the identical plan minus the watermark (parity
    * asserted in StreamingSpec). */
  def kAnonymityMonitor(events: DataFrame, k: Long = 5L,
      wmDelay: String = "1 hour"): DataFrame = {
    import events.sparkSession.implicits._
    val prof = udaf(graft.engine.TypedAggregators.QiProfile)
    val base = events.select($"ts", $"user_id", $"event_type",
      expr("hour(ts) div 6").cast("long").as("hb"))
    val src =
      if (events.isStreaming) base.withWatermark("ts", wmDelay) else base
    src
      .groupBy(window($"ts", "1 hour").as("w"), $"user_id")
      .agg(prof($"hb", $"event_type").as("p"))
      .groupBy(window($"w", "1 hour").as("w2"), $"p.hband".as("hband"),
        $"p.mtype".as("mtype"), $"p.vband".as("vband"))
      .agg(count(lit(1)).as("n_users"))
      .select($"w2.start".as("w_start"), $"hband", $"mtype", $"vband",
        $"n_users", ($"n_users" >= k).as("anonymous"))
  }

  /** Windowed q-digest quantile monitor (r15) — the streaming twin of
    * the declared `sketch_qdigest_quantiles`: per event-hour window,
    * the p50/p99 of `value` from ONE stateful aggregation running
    * [[graft.engine.TypedAggregators.QDigestWindow]]. The buffer is
    * the leaf-count map over the bounded 2-dp e2 lattice (domain-
    * bounded state, order-free merge — see the aggregator scaladoc
    * for why compression waits until finish), and every emitted row
    * SELF-AUDITS the q-digest rank guarantee against the buffer's
    * exact counts (`within_bound`). Values outside the lattice clamp
    * to its edges and are counted (`n_clamped`) — the monitor's own
    * out-of-domain alarm. Batch mode runs the identical plan minus
    * the watermark (parity + kill sweep in the streaming specs). */
  def qdigestMonitor(events: DataFrame,
      wmDelay: String = "1 hour"): DataFrame = {
    import events.sparkSession.implicits._
    val qd = udaf(graft.engine.TypedAggregators.QDigestWindow(1024))
    val u = graft.engine.QDigest.U.toLong
    val base = events.select($"ts",
      expr("cast(round(value * 100) as bigint)").as("e2raw"))
      .select($"ts",
        greatest(lit(0L), least(lit(u - 1L), $"e2raw")).as("e2"),
        ($"e2raw" < 0L || $"e2raw" >= u).cast("long").as("clamped"))
    val src =
      if (events.isStreaming) base.withWatermark("ts", wmDelay) else base
    src
      .groupBy(window($"ts", "1 hour").as("w"))
      .agg(qd($"e2").as("q"), sum($"clamped").as("n_clamped"))
      .select($"w.start".as("w_start"), $"q.n_events".as("n_events"),
        $"q.p50_est".as("p50_est"), $"q.p99_est".as("p99_est"),
        $"q.within_bound".as("within_bound"), $"n_clamped")
  }

  /** Windowed l-diversity companion of [[kAnonymityMonitor]] — the
    * live homogeneity-attack gate: a window's QI class can meet k and
    * still leak when its members share the sensitive value, so each
    * (window, class) also reports its distinct sensitive-band count.
    * The sensitive attribute rides a STATIC broadcast dimension
    * (`sens`: user_id -> sband, trained in batch — the
    * model-in-batch/serve-in-stream pattern of cellDrift/ewmaChart):
    * the stream-static join is map-side, and the class fold's
    * `collect_set(sband)` state is bounded by the BAND ALPHABET, not
    * the class population — exact l_distinct with streaming-legal
    * state (the reason this is not a countDistinct). Same two chained
    * stateful operators as the k monitor; batch parity + identical
    * plan minus the watermark. */
  def lDiversityMonitor(events: DataFrame, sens: DataFrame, k: Long = 5L,
      l: Long = 3L, wmDelay: String = "1 hour"): DataFrame = {
    import events.sparkSession.implicits._
    val prof = udaf(graft.engine.TypedAggregators.QiProfile)
    // watermark BEFORE the dimension join: a user missing from `sens`
    // (the dimension lags new arrivals) drops from the monitor, but
    // their events must still advance the watermark — a post-join
    // watermark would let an unsensed burst stall every open window
    val evw =
      if (events.isStreaming) events.withWatermark("ts", wmDelay)
      else events
    evw
      .join(broadcast(sens), Seq("user_id"))
      .select($"ts", $"user_id", $"event_type", $"sband",
        expr("hour(ts) div 6").cast("long").as("hb"))
      .groupBy(window($"ts", "1 hour").as("w"), $"user_id")
      .agg(prof($"hb", $"event_type").as("p"),
        first($"sband").as("sband")) // sband is functional per user
      .groupBy(window($"w", "1 hour").as("w2"), $"p.hband".as("hband"),
        $"p.mtype".as("mtype"), $"p.vband".as("vband"))
      .agg(count(lit(1)).as("n_users"),
        size(collect_set($"sband")).cast("long").as("l_distinct"))
      .select($"w2.start".as("w_start"), $"hband", $"mtype", $"vband",
        $"n_users", $"l_distinct", ($"n_users" >= k).as("anonymous"),
        ($"l_distinct" >= l).as("diverse"))
  }

  /** The FULL live privacy gate — k-anonymity, l-diversity, AND
    * t-closeness per (window, QI class), completing the streaming twin
    * of the batch audit trio: a class can meet k and l and still leak
    * by skewing far from the corpus distribution, so each class also
    * reports the exact EMD of its sensitive-band distribution against
    * the batch-trained GLOBAL one. Same chained two-operator shape as
    * [[kAnonymityMonitor]]; the class fold is
    * [[graft.engine.TypedAggregators.TClose]] — its buffer is the
    * class band histogram (bounded by the band alphabet) and its
    * finish replays the batch log_t_closeness EMD arithmetic verbatim
    * (cumulative over the ordered global band domain, per-band terms
    * e6-quantized before the sum), with the global distribution
    * captured as a broadcast-constant closure (model-in-batch/
    * serve-in-stream). `globBands` = (band, global user count) over
    * the training corpus, e.g. from the same frame as `sens`.
    * Watermark before the dimension join (the [[lDiversityMonitor]]
    * rationale). Batch mode: identical plan minus the watermark. */
  def privacyTrioMonitor(events: DataFrame, sens: DataFrame,
      globBands: Seq[(Long, Long)], k: Long = 5L, l: Long = 3L,
      wmDelay: String = "1 hour"): DataFrame = {
    import events.sparkSession.implicits._
    val prof = udaf(graft.engine.TypedAggregators.QiProfile)
    val sorted = globBands.sortBy(_._1)
    val tc = udaf(graft.engine.TypedAggregators.TClose(
      sorted, sorted.iterator.map(_._2).sum))
    val bb = sorted.size.toLong
    val evw =
      if (events.isStreaming) events.withWatermark("ts", wmDelay)
      else events
    evw
      .join(broadcast(sens), Seq("user_id"))
      .select($"ts", $"user_id", $"event_type", $"sband",
        expr("hour(ts) div 6").cast("long").as("hb"))
      .groupBy(window($"ts", "1 hour").as("w"), $"user_id")
      .agg(prof($"hb", $"event_type").as("p"),
        first($"sband").as("sband")) // sband is functional per user
      .groupBy(window($"w", "1 hour").as("w2"), $"p.hband".as("hband"),
        $"p.mtype".as("mtype"), $"p.vband".as("vband"))
      .agg(tc($"sband").as("t"))
      .select($"w2.start".as("w_start"), $"hband", $"mtype", $"vband",
        $"t.n_users".as("n_users"), $"t.l_distinct".as("l_distinct"),
        when(lit(bb > 1L), round($"t.emd_e6".cast("double")
          / lit(1e6) / lit(bb - 1L), 4)).otherwise(lit(0.0)).as("emd"),
        ($"t.n_users" >= k).as("anonymous"),
        ($"t.l_distinct" >= l).as("diverse"),
        when(lit(bb > 1L), $"t.emd_e6" * 5L <= lit((bb - 1L) * 1000000L))
          .otherwise(lit(true)).as("close"))
  }

  /** Stream-static enrichment join: each event picks up its user's
    * first-seen timestamp from a STATIC dimension frame. The static side
    * is broadcast-hinted — on a cluster every executor joins map-side
    * with zero shuffle of the unbounded stream, the canonical shape for
    * dimension enrichment at scale. Works identically in batch. */
  def enriched(events: DataFrame, firstSeen: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events.join(broadcast(firstSeen), Seq("user_id"), "left_outer")
      .select($"event_id", $"user_id", $"event_type",
        unix_micros($"first_seen").as("first_seen_us"))
  }

  case class UserCount(user_id: Long, n: Long)

  case class EwmaPoint(event_type: String, hour_us: Long, n: Long,
    ewma: Double, is_alert: Long)

  /** Online EWMA control chart — the streaming twin of the declared
    * `log_ewma_chart`: per event type, the exact-e7 truncated EWMA
    * recurrence over consecutive hours (gap hours count as ZERO, the
    * dense-grid semantics) with the same 3σ integer alert verdict
    * against the broadcast σ model ([[graft.queries.EventsLog
    * .ewmaModel]] — trained in batch, served here; the weight ladder
    * is the shared `ewmaWeightsE7`, so the twins cannot drift).
    *
    * Finalization is WATERMARK-driven (review findings, round 11 —
    * the first cut closed an hour when any later hour arrived, which
    * dropped in-watermark stragglers and re-emitted zero history when
    * an idle type revived): state per type is the next hour to close,
    * the ring of the last 8 finalized counts, and a pending
    * hour→count map bounded by the reorder window. An hour H emits
    * only once the watermark passes H + 1h (so `wmDelay` really is
    * the straggler budget); gap hours finalize as zeros; rows older
    * than an already-finalized hour are genuinely beyond the
    * watermark and drop. The event-time timeout exists to keep
    * CLOSING hours for a type that went silent (types absent from a
    * micro-batch are not invoked otherwise); state is never removed —
    * it is bounded by the type alphabet, not by a population. In
    * BATCH mode the group is seen whole and pads to the model's h1
    * bound, so batch-mode output is row-for-row the declared
    * query's (asserted in StreamingSpec). */
  def ewmaChart(events: DataFrame, model: DataFrame,
      idleUs: Long = 86400000000L * 7, wmDelay: String = "1 hour")
      : Dataset[EwmaPoint] = {
    import events.sparkSession.implicits._
    val wE7 = graft.queries.EventsLog.ewmaWeightsE7
    val isBatch = !events.isStreaming
    val in = if (isBatch) events else events.withWatermark("ts", wmDelay)
    val stepUs = 3600000000L
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    in.select($"event_type",
        unix_micros(date_trunc("hour", $"ts")).as("hour_us"), $"ts")
      .join(broadcast(model), Seq("event_type"))
      .select($"event_type", $"hour_us", $"ts",
        $"nh", $"stot", $"sxx", $"h0_us", $"h1_us")
      .as[(String, Long, java.sql.Timestamp, Long, Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(),
          if (isBatch) GroupStateTimeout.NoTimeout
          else GroupStateTimeout.EventTimeTimeout) {
        (et: String,
         batch: Iterator[(String, Long, java.sql.Timestamp, Long, Long,
           Long, Long, Long)],
         state: GroupState[(Long, Seq[Long], Map[Long, Long],
           Long, Long, Long)]) =>
          def ewmaE7(win: Seq[Long]): Long = // most-recent-LAST
            (0 to 7).map(j => win(7 - j) * wE7(j)).sum
          val rows = batch.toSeq
          if (rows.isEmpty && !state.exists) Iterator.empty
          else {
            val (nh, stot, sxx, h0) =
              if (rows.nonEmpty) {
                val r = rows.head; (r._4, r._5, r._6, r._7)
              } else {
                val s0 = state.get; (s0._4, s0._5, s0._6, 0L)
              }
            // 9·(nh·Σx² − (Σx)²)·10¹⁴ — the σ² side of the verdict
            val rhs = (BigInt(nh) * sxx - BigInt(stot) * stot) * 9 *
              BigInt("100000000000000")
            var (nextHour, ring, pending) = state.getOption
              .map(s0 => (s0._1, s0._2, s0._3))
              .getOrElse((h0, Seq.empty[Long], Map.empty[Long, Long]))
            // merge the batch; rows below nextHour are beyond the
            // watermark by construction (nextHour only advances once
            // the watermark passes) and drop
            rows.groupBy(_._2).foreach { case (h, rs) =>
              if (h >= nextHour)
                pending += h -> (pending.getOrElse(h, 0L) + rs.length)
            }
            val out = scala.collection.mutable.ArrayBuffer
              .empty[EwmaPoint]
            def finalizeNext(): Unit = {
              val c = pending.getOrElse(nextHour, 0L)
              if (ring.length == 8) {
                val cur = ewmaE7(ring.drop(1) :+ c)
                val d = BigInt(c) * 10000000L - ewmaE7(ring)
                out += EwmaPoint(et, nextHour, c,
                  r4(cur.toDouble / 1e7),
                  if (d * d * nh * nh > rhs) 1L else 0L)
              }
              ring = (ring :+ c).takeRight(8)
              pending -= nextHour
              nextHour += stepUs
            }
            if (isBatch) {
              val h1 = rows.head._8
              while (nextHour <= h1) finalizeNext()
            } else {
              // close every hour the watermark has fully passed
              val wmUs = state.getCurrentWatermarkMs() * 1000L
              while (nextHour + stepUs <= wmUs) finalizeNext()
              state.update((nextHour, ring, pending, nh, stot, sxx))
              state.setTimeoutTimestamp(
                state.getCurrentWatermarkMs() + idleUs / 1000L)
            }
            out.iterator
          }
      }
  }

  case class AnomStats(user_id: Long, n_events: Long, mu: Double, sd: Double)

  /** Online per-user anomaly-model stats — the streaming twin of the
    * batch `log_anomaly` stats stage: each update emits the user's
    * current (n, mean, sample-sd) so a scoring join can flag live events
    * against the freshest model without re-scanning history.
    *
    * Exactness discipline: state holds the DECIMAL power sums (n, Σx,
    * Σx²) with each term rounded to scale 10 HALF_UP exactly as Spark's
    * double→decimal(28,10) cast does in the batch query — decimal sums
    * are associative, so after any interleaving/restart the final
    * streaming stats are BIT-IDENTICAL to batch (asserted in
    * StreamingSpec), not approximately equal. mu/sd reproduce the batch
    * operand order: mu = Σx/n, sd = sqrt((Σx² − Σx·(Σx/n))/(n−1)).
    * Same event-time TTL as runningUserCounts bounds state to the
    * active user set. */
  def anomalyStats(events: DataFrame,
      idleUs: Long = 86400000000L, wmDelay: String = "1 hour"): Dataset[AnomStats] = {
    import events.sparkSession.implicits._
    val isBatch = !events.isStreaming
    val in = if (isBatch) events else events.withWatermark("ts", wmDelay)
    def d10(x: Double): BigDecimal =
      BigDecimal(java.math.BigDecimal.valueOf(x)
        .setScale(10, java.math.RoundingMode.HALF_UP))
    in.select($"user_id".cast("long"), $"value".cast("double"),
        unix_micros($"ts").as("us"), $"ts")
      .as[(Long, Double, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(),
          if (isBatch) GroupStateTimeout.NoTimeout
          else GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[(Long, Double, Long, java.sql.Timestamp)],
         state: GroupState[(Long, BigDecimal, BigDecimal, Long)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var (n, s1, s2, seen) = state.getOption
              .getOrElse((0L, BigDecimal(0), BigDecimal(0), Long.MinValue))
            batch.foreach { e =>
              n += 1; s1 += d10(e._2); s2 += d10(e._2 * e._2)
              if (e._3 > seen) seen = e._3
            }
            state.update((n, s1, s2, seen))
            if (!isBatch)
              state.setTimeoutTimestamp(math.max((seen + idleUs) / 1000L,
                state.getCurrentWatermarkMs() + 1L))
            val s1d = s1.toDouble
            val sd = if (n == 1) 0.0
              else math.sqrt((s2.toDouble - s1d * (s1d / n)) / (n - 1))
            Iterator.single(AnomStats(user, n, s1d / n, sd))
          }
      }
  }

  /** Stateful per-user running event counts via flatMapGroupsWithState —
    * the Spark-native form of the reference's per-key reduce state
    * (M5 whole-partition reduce generalized to unbounded streams).
    *
    * State is O(1) per user but the user POPULATION is unbounded over an
    * infinite stream, so in streaming mode state carries an event-time
    * TTL: a user idle (no events) for `idleUs` of event time is evicted
    * once the watermark passes their horizon — the state store is then
    * bounded by the ACTIVE user set, not the all-time population. A user
    * returning after eviction restarts at 0 (the usual TTL trade; size
    * `idleUs` to the longest absence worth bridging). Batch mode sees
    * each group whole and keeps the exact NoTimeout shape. */
  def runningUserCounts(events: DataFrame,
      idleUs: Long = 86400000000L, wmDelay: String = "1 hour"): Dataset[UserCount] = {
    import events.sparkSession.implicits._
    val isBatch = !events.isStreaming
    val in = if (isBatch) events else events.withWatermark("ts", wmDelay)
    // `ts` rides along: the event-time-timeout checker requires the
    // watermarked column to reach the state operator
    in.select($"user_id".cast("long"), unix_micros($"ts").as("us"), $"ts")
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(),
          if (isBatch) GroupStateTimeout.NoTimeout
          else GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            // idle past the TTL horizon: drop the state row, emit nothing
            state.remove()
            Iterator.empty
          } else {
            var (n, seen) = state.getOption.getOrElse((0L, Long.MinValue))
            batch.foreach { e => n += 1; if (e._2 > seen) seen = e._2 }
            state.update((n, seen))
            if (!isBatch)
              state.setTimeoutTimestamp(math.max((seen + idleUs) / 1000L,
                state.getCurrentWatermarkMs() + 1L))
            Iterator.single(UserCount(user, n))
          }
      }
  }

  /** Streaming exact dedup — the training-data-pipeline op (§2.5) on an
    * unbounded stream: state is bounded by the watermark window (an
    * event_id seen twice >1h apart is re-admitted; within the window it
    * is dropped). In batch mode this degrades to plain dropDuplicates. */
  def dedupedEvents(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    if (events.isStreaming)
      events.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")
  }

  /** Session windows via the native `session_window` operator — the same
    * transform serves batch and streaming (watermark bounds streaming
    * state; sessions close after `gap` of event-time inactivity and the
    * window end is last-event + gap, exclusive). Mirrors the declared
    * batch query `q_session_window`. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame = {
    import events.sparkSession.implicits._
    val in = if (events.isStreaming) events.withWatermark("ts", gap) else events
    in.groupBy(session_window($"ts", gap), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id",
        unix_micros($"session_window.start").as("s_start"),
        unix_micros($"session_window.end").as("s_end"),
        $"n_events")
  }

  case class Session(user_id: Long, s_start: Long, s_end: Long, n_events: Long)

  /** Custom-state sessionization via flatMapGroupsWithState — the
    * hand-rolled form of `sessionCounts` for when session logic outgrows
    * the built-in (e.g. value-dependent gaps). Per-user state is one open
    * session (start, lastTs, n); arriving events are folded in event-time
    * order. In batch mode every group sees all its events at once (the
    * per-user sort is bounded by a user's event count — fine for
    * per-entity streams; a user with unbounded events would need the
    * native operator). Boundary semantics match session_window: an event
    * exactly `gapUs` after the previous one still merges (Spark merges
    * when next start <= current end), so the split test is strict >.
    *
    * Streaming: the input is watermarked (`wmDelay`) and the state uses
    * `GroupStateTimeout.EventTimeTimeout` — after each update the timeout
    * is armed at the open session's end, so when the watermark passes it
    * the session is EMITTED and its state removed. A user whose events
    * stop arriving therefore still gets their final session, and state is
    * bounded by the watermark (no per-key entry outlives watermark +
    * gap). Remaining caveat: an event arriving in a LATER batch with a
    * timestamp earlier than already-folded state is mis-sessioned (the
    * native `session_window` operator handles such late merges); batch
    * mode sees each group whole and is exact. */
  def sessionizeCustom(events: DataFrame, gapUs: Long,
      wmDelay: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val isBatch = !events.isStreaming // plain boolean: the closure must not capture the DataFrame
    val in = if (isBatch) events else events.withWatermark("ts", wmDelay)
    // keep `ts` through the projection: the EventTimeTimeout check needs
    // the watermarked event-time column present in the operator's input
    in.select($"user_id".cast("long"), unix_micros($"ts").as("us"), $"ts")
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
          if (isBatch) GroupStateTimeout.NoTimeout
          else GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[(Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            // watermark passed the open session's end: close and emit it
            val (start, last, n) = state.get
            state.remove()
            Iterator.single(Session(user, start, last + gapUs, n))
          } else {
            val ts = batch.map(_._2).toArray.sorted
            var (start, last, n) = state.getOption.getOrElse((-1L, -1L, 0L))
            val out = Seq.newBuilder[Session]
            ts.foreach { t =>
              if (start < 0) { start = t; last = t; n = 1 }
              else if (t - last > gapUs) {
                out += Session(user, start, last + gapUs, n)
                start = t; last = t; n = 1
              } else {
                // a cross-batch late event (t < last, still within the
                // watermark) must never move the open session's end — and
                // its timeout horizon — BACKWARD
                last = math.max(last, t); n += 1
              }
            }
            if (start >= 0) {
              state.update((start, last, n))
              if (isBatch) {
                // batch mode sees everything: flush the final open session
                out += Session(user, start, last + gapUs, n)
              } else {
                // arm the event-time timeout at session end (ms); must be
                // beyond the current watermark or Spark rejects it — a
                // session already ended before the watermark fires on the
                // next no-data batch
                val endMs = (last + gapUs) / 1000
                state.setTimeoutTimestamp(
                  math.max(endMs, state.getCurrentWatermarkMs() + 1))
              }
            }
            out.result().iterator
          }
      }
  }

  case class TypePair(user_id: Long, s_start: Long,
      type_a: String, type_b: String)

  /** Streaming session co-occurrence — the unbounded-stream twin of the
    * declared `log_cooccurrence` batch query. Per-user state is the open
    * session's (start, last, distinct-type list); the list is bounded by
    * the event-type ALPHABET, not the event volume, so state stays a few
    * dozen bytes per user at any stream length. A session emits its
    * unordered type pairs the moment it closes — gap exceeded in-stream,
    * or event-time timeout once the watermark passes the session end
    * (same arming discipline as sessionizeCustom) — so downstream pair
    * counting is an ordinary incremental streaming aggregation. Batch
    * mode sees each user's history whole and reproduces the declared
    * query's pair multiset exactly (asserted in StreamingSpec); the
    * late-data caveat is also sessionizeCustom's. */
  def sessionTypePairs(events: DataFrame, gapUs: Long,
      wmDelay: String = "1 hour"): Dataset[TypePair] = {
    import events.sparkSession.implicits._
    val isBatch = !events.isStreaming
    val in = if (isBatch) events else events.withWatermark("ts", wmDelay)
    def pairs(user: Long, start: Long, tys: Seq[String]): Iterator[TypePair] = {
      val st = tys.sorted
      st.indices.iterator.flatMap(i =>
        (i + 1 until st.size).iterator.map(j =>
          TypePair(user, start, st(i), st(j))))
    }
    in.select($"user_id".cast("long"), unix_micros($"ts").as("us"),
        $"event_type", $"ts")
      .as[(Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
          if (isBatch) GroupStateTimeout.NoTimeout
          else GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[(Long, Long, String, java.sql.Timestamp)],
         state: GroupState[(Long, Long, Seq[String])]) =>
          if (state.hasTimedOut) {
            val (start, _, tys) = state.get
            state.remove()
            pairs(user, start, tys)
          } else {
            val evs = batch.map(e => (e._2, e._3)).toArray.sorted
            var (start, last, tys) =
              state.getOption.getOrElse((-1L, -1L, Seq.empty[String]))
            val out = Seq.newBuilder[TypePair]
            evs.foreach { case (ts, ty) =>
              if (start < 0) { start = ts; last = ts; tys = Seq(ty) }
              else if (ts - last > gapUs) {
                out ++= pairs(user, start, tys)
                start = ts; last = ts; tys = Seq(ty)
              } else {
                // same cross-batch late-data guard as sessionizeCustom:
                // never shrink the open session's end / timeout horizon
                last = math.max(last, ts)
                if (!tys.contains(ty)) tys = tys :+ ty
              }
            }
            if (start >= 0) {
              state.update((start, last, tys))
              if (isBatch) out ++= pairs(user, start, tys)
              else {
                val endMs = (last + gapUs) / 1000
                state.setTimeoutTimestamp(
                  math.max(endMs, state.getCurrentWatermarkMs() + 1))
              }
            }
            out.result().iterator
          }
      }
  }

  case class FunnelHit(user_id: Long, stage: String, t_us: Long)

  /** Streaming ordered-funnel detection via flatMapGroupsWithState — the
    * unbounded-stream twin of the declared `log_funnel` batch query.
    * Per-user state is three timestamps (earliest view, earliest click
    * strictly after it, earliest purchase strictly after that); a row is
    * EMITTED the moment a user first advances a stage, so downstream
    * consumers see conversions as they happen instead of per-run totals.
    * State is three longs per user — but the user POPULATION is
    * unbounded over an infinite stream, so in streaming mode the state
    * carries an event-time TTL: a user with no funnel activity for
    * `idleUs` of event time is evicted once the watermark passes their
    * horizon, bounding the store by the active user set. A user
    * returning after eviction starts a fresh funnel (the TTL trade —
    * size `idleUs` to the longest conversion window worth tracking; a
    * completed funnel's state is likewise dropped on idle). Each
    * micro-batch folds its events in event-time order so within-batch
    * ordering is exact.
    *
    * Batch mode sees each user's full history in one sorted NoTimeout
    * pass, which reproduces log_funnel's min/join semantics exactly
    * (asserted in StreamingSpec). Streaming caveat, same as
    * sessionizeCustom: an event arriving in a later batch with a
    * timestamp before an already-latched stage cannot retro-correct
    * earlier decisions. */
  def funnelHits(events: DataFrame,
      idleUs: Long = 86400000000L, wmDelay: String = "1 hour"): Dataset[FunnelHit] = {
    import events.sparkSession.implicits._
    val isBatch = !events.isStreaming
    val src = if (isBatch) events else events.withWatermark("ts", wmDelay)
    // `ts` rides along for the event-time-timeout checker
    src.filter($"event_type".isin("view", "click", "purchase"))
      .select($"user_id".cast("long"), $"event_type",
        unix_micros($"ts").as("us"), $"ts")
      .as[(Long, String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
          if (isBatch) GroupStateTimeout.NoTimeout
          else GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[(Long, String, Long, java.sql.Timestamp)],
         state: GroupState[(Long, Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            // idle past the TTL horizon: drop the funnel state row
            state.remove()
            Iterator.empty
          } else {
            var (tv, tc, tp, seen) =
              state.getOption.getOrElse((-1L, -1L, -1L, Long.MinValue))
            val out = Seq.newBuilder[FunnelHit]
            batch.toArray.sortBy(e => (e._3, e._2)).foreach { case (_, et, t, _) =>
              if (t > seen) seen = t
              et match {
                case "view" if tv < 0 =>
                  tv = t; out += FunnelHit(user, "view", t)
                case "click" if tv >= 0 && tc < 0 && t > tv =>
                  tc = t; out += FunnelHit(user, "click", t)
                case "purchase" if tc >= 0 && tp < 0 && t > tc =>
                  tp = t; out += FunnelHit(user, "purchase", t)
                case _ =>
              }
            }
            state.update((tv, tc, tp, seen))
            if (!isBatch)
              state.setTimeoutTimestamp(math.max((seen + idleUs) / 1000L,
                state.getCurrentWatermarkMs() + 1L))
            out.result().iterator
          }
      }
  }

  case class Attribution(user_id: Long, purchase_us: Long,
      attributed: Boolean, value: Double)

  /** Streaming last-touch attribution — the unbounded twin of the
    * declared `log_attribution` batch query: per-user state is ONE long
    * (the latest click time); each purchase is emitted immediately,
    * credited iff a click happened within the preceding 24h. Events
    * fold in (event-time, event_id) order per micro-batch, which is
    * exactly the batch query's window frame order, so a single-batch
    * pass reproduces it row-for-row (asserted in StreamingSpec); the
    * usual cross-batch late-data caveat applies.
    *
    * State eviction is SEMANTICS-PRESERVING, unlike a session timeout:
    * a click only influences purchases in the next 24h, and the 1h
    * watermark already drops purchases older than the watermark — so
    * once the watermark passes lastClick + 24h, no admissible purchase
    * can ever be credited to that click and the user's state row can be
    * dropped invisibly (event-time timeout; idle users cost nothing
    * forever, asserted via state-store row counts in StreamingSpec).
    * Batch mode keeps the single-pass NoTimeout shape. */
  def attributedPurchases(events: DataFrame): Dataset[Attribution] = {
    import events.sparkSession.implicits._
    val isBatch = !events.isStreaming
    val src = if (isBatch) events else events.withWatermark("ts", "1 hour")
    // `ts` rides along: the event-time-timeout checker requires the
    // watermarked column to reach the state operator (same as
    // sessionizeCustom)
    src.filter($"event_type".isin("click", "purchase"))
      .select($"user_id".cast("long"), $"event_type",
        unix_micros($"ts").as("us"), $"value", $"event_id", $"ts")
      .as[(Long, String, Long, Double, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
          if (isBatch) GroupStateTimeout.NoTimeout
          else GroupStateTimeout.EventTimeTimeout) {
        (user: Long,
         batch: Iterator[(Long, String, Long, Double, Long, java.sql.Timestamp)],
         state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            // watermark ≥ lastClick + 24h: the click is dead weight
            state.remove()
            Iterator.empty
          } else {
            var lastClick = state.getOption.getOrElse(-1L)
            val out = Seq.newBuilder[Attribution]
            batch.toArray.sortBy(e => (e._3, e._5)).foreach {
              case (_, et, us, v, _, _) =>
                // cross-batch late clicks (us < lastClick, within the
                // watermark) must not move the attribution anchor backward
                if (et == "click") { if (us > lastClick) lastClick = us }
                else out += Attribution(user, us,
                  // `us >= lastClick`: a cross-batch late PURCHASE older
                  // than the anchor has no preceding click — a negative
                  // gap must not satisfy the 24h window
                  lastClick >= 0 && us >= lastClick &&
                    us - lastClick <= 86400000000L, v)
            }
            if (lastClick >= 0) {
              state.update(lastClick)
              if (!isBatch) {
                // timeouts must sit beyond the current watermark: a late
                // click already inside the eviction horizon times out at
                // the next possible instant instead of throwing
                val horizonMs = lastClick / 1000L + 86400000L + 1L
                state.setTimeoutTimestamp(
                  math.max(horizonMs, state.getCurrentWatermarkMs() + 1L))
              }
            }
            out.result().iterator
          }
      }
  }

  /** Stream-stream self interval join: same-user event pairs within
    * `seconds` of each other — the streaming form of the declared
    * `q_range_join`. Watermarks on both sides plus the time-bound join
    * condition let Spark expire join state (without them a stream-stream
    * join buffers forever). */
  def pairsWithin(events: DataFrame, seconds: Int): DataFrame = {
    import events.sparkSession.implicits._
    def side(p: String) = {
      val s = events.select($"user_id".as(s"${p}_user"), $"ts".as(s"${p}_ts"),
        $"event_id".as(s"${p}_id"))
      if (s.isStreaming) s.withWatermark(s"${p}_ts", "1 hour") else s
    }
    side("a").join(side("b"),
      col("a_user") === col("b_user") && col("a_id") < col("b_id") &&
        col("b_ts") >= col("a_ts") - expr(s"INTERVAL $seconds SECONDS") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $seconds SECONDS"))
  }

  /** Stream-stream LEFT OUTER interval join: every purchase, matched to
    * the same user's clicks in the `seconds` window before it — or
    * null-extended when no click arrives. The outer side is the part
    * inner joins can't express: an unmatched purchase is emitted (with
    * null click columns) only once the click-side watermark proves no
    * matching click can still arrive, which is exactly the point at
    * which Spark can also DROP the buffered purchase from state. Both
    * watermarks plus the time-bound condition keep state finite at any
    * scale; in batch mode the same plan is a plain left join (parity
    * asserted in StreamingSpec). Append-mode caveat: null-extended rows
    * for the newest purchases stay withheld until a later batch advances
    * the watermark — the flush is tested explicitly. */
  def purchasesWithClicks(events: DataFrame, seconds: Int): DataFrame = {
    import events.sparkSession.implicits._
    def side(tpe: String, p: String) = {
      val s = events.filter($"event_type" === tpe)
        .select($"user_id".as(s"${p}_user"), $"ts".as(s"${p}_ts"),
          $"event_id".as(s"${p}_id"))
      if (s.isStreaming) s.withWatermark(s"${p}_ts", "1 hour") else s
    }
    side("purchase", "p").join(side("click", "c"),
        $"p_user" === $"c_user" &&
          $"c_ts" >= $"p_ts" - expr(s"INTERVAL $seconds SECONDS") &&
          $"c_ts" <= $"p_ts",
        "left_outer")
      .select($"p_user".as("user_id"), $"p_id", $"p_ts", $"c_id", $"c_ts")
  }

  /** Stream-stream FULL OUTER interval join — completes the join-mode
    * matrix (inner `pairsWithin`, LEFT OUTER `purchasesWithClicks`): an
    * unmatched purchase null-extends its click columns AND an unmatched
    * click null-extends the purchase columns, each exactly when the
    * opposing watermark proves no match can still arrive — the same
    * instant the buffered row leaves state, so outer emission adds no
    * state beyond the inner join's. Both key columns are nullable in the
    * output, so the user id is surfaced as coalesce(p_user, c_user).
    * Batch mode plans a plain full join (parity asserted in
    * StreamingSpec). */
  def purchasesFullOuterClicks(events: DataFrame, seconds: Int): DataFrame = {
    import events.sparkSession.implicits._
    def side(tpe: String, p: String) = {
      val s = events.filter($"event_type" === tpe)
        .select($"user_id".as(s"${p}_user"), $"ts".as(s"${p}_ts"),
          $"event_id".as(s"${p}_id"))
      if (s.isStreaming) s.withWatermark(s"${p}_ts", "1 hour") else s
    }
    side("purchase", "p").join(side("click", "c"),
        $"p_user" === $"c_user" &&
          $"c_ts" >= $"p_ts" - expr(s"INTERVAL $seconds SECONDS") &&
          $"c_ts" <= $"p_ts",
        "full_outer")
      .select(coalesce($"p_user", $"c_user").as("user_id"),
        $"p_id", $"p_ts", $"c_id", $"c_ts")
  }

  /** Launch helper: run a streaming query over a parquet directory into
    * an in-memory table and block until all available data is processed. */
  /** One quantile readout row: per closed hour window, the q-th
    * percentile's bin + midpoint estimate over the model's 1000-bin
    * value lattice. */
  case class QuantileRow(w_start: Long, q_pct: Long, n: Long,
      qbin: Long, est: Double)

  /** Bin-bounds model for [[quantileWindows]]: the historical value
    * range, trained in batch, broadcast into the live stream — the
    * psiModel train/serve split applied to quantiles (a stream cannot
    * bin on global min/max it has not seen yet). */
  def quantileModel(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events.agg(min($"value").as("v0"), max($"value").as("v1"))
  }

  /** Windowed p50/p95/p99 monitor — the ops staple (latency/value
    * percentiles per hour) in the engine's bounded-histogram
    * discipline: state per open window is ONE 1000-long bin array
    * (the shard-mergeable histogram IS the sketch; cell-sum is the
    * merge law), the cut is the exact integer rank rule shared with
    * the declared log_hourly_quantiles (`hcum ≥ (n·q + 99) div 100`),
    * and a window emits its 3 rows once the event-time watermark
    * passes its close (append mode; idle windows flush by timeout
    * like sessionizeCustom). The SAME code path serves batch — the
    * declared query, this batch path, and the stream are three-way
    * parity-tested. Live values outside the trained range clamp into
    * the edge bins (the model's domain is the contract). */
  def quantileWindows(events: DataFrame, model: DataFrame,
      wmDelay: String = "1 hour"): Dataset[QuantileRow] = {
    import events.sparkSession.implicits._
    // fail fast on a degenerate model (trained on zero rows → null
    // bounds): the tuple decode below would otherwise kill the first
    // micro-batch with an opaque null-in-primitive error (review
    // finding r12); the model frame is batch-built, so this probe is
    // one tiny job at query construction, never per-batch
    val mrow = model.select($"v0", $"v1").head(1)
    require(mrow.nonEmpty && !mrow(0).isNullAt(0) && !mrow(0).isNullAt(1),
      "quantileModel is degenerate (trained on zero rows): null bounds")
    val isBatch = !events.isStreaming
    val in0 = if (isBatch) events else events.withWatermark("ts", wmDelay)
    val binned = in0.crossJoin(broadcast(model))
      .select(
        expr(graft.queries.EventsLog.hourStartSql).as("ws"),
        expr(graft.queries.EventsLog.quantileBinSql("int")).as("bin"),
        $"v0", $"v1", $"ts")
      .as[(Long, Int, Double, Double, java.sql.Timestamp)]
    binned.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
          if (isBatch) GroupStateTimeout.NoTimeout
          else GroupStateTimeout.EventTimeTimeout) {
        (ws: Long, rows: Iterator[(Long, Int, Double, Double, java.sql.Timestamp)],
         state: GroupState[(Double, Double, Array[Long])]) =>
          if (state.hasTimedOut) {
            val (v0, v1, h) = state.get
            state.remove()
            finalizeQuantiles(ws, v0, v1, h)
          } else {
            val first = rows.next()
            val (v0, v1, h0) = state.getOption
              .getOrElse((first._3, first._4, new Array[Long](1000)))
            h0(first._2) += 1
            rows.foreach(r => h0(r._2) += 1)
            if (isBatch) {
              state.remove()
              finalizeQuantiles(ws, v0, v1, h0)
            } else {
              state.update((v0, v1, h0))
              // flush when the watermark passes the window close
              state.setTimeoutTimestamp(
                math.max((ws + 3600000000L) / 1000L,
                  state.getCurrentWatermarkMs() + 1L))
              Iterator.empty
            }
          }
      }
  }

  /** The exact integer quantile cut over a closed window's histogram —
    * `need = (n·q + 99) div 100`, qbin = first bin whose cumulative
    * count reaches it; est is the bin midpoint on the model lattice,
    * HALF_UP-rounded to 6 dp exactly like the declared
    * log_hourly_quantiles (review finding r12: emitting the unrounded
    * double made QuantileRow.est differ from the declared table and
    * pushed a compensating round into the parity test). */
  private def finalizeQuantiles(ws: Long, v0: Double, v1: Double,
      h: Array[Long]): Iterator[QuantileRow] = {
    val n = h.sum
    if (n == 0L) Iterator.empty
    else Seq(50L, 95L, 99L).iterator.map { q =>
      val need = (n * q + 99L) / 100L
      var cum = 0L
      var b = 0
      var qbin = -1
      while (b < h.length && qbin < 0) {
        cum += h(b)
        if (cum >= need) qbin = b
        b += 1
      }
      val est = v0 + (qbin + 0.5) * (v1 - v0) / 1000.0
      QuantileRow(ws, q, n, qbin.toLong,
        BigDecimal(est).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }
  }

  def runToMemory(spark: SparkSession, srcDir: String,
      transform: DataFrame => DataFrame, queryName: String,
      mode: OutputMode = OutputMode.Append()): Unit = {
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val q = transform(stream).writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable() finally q.stop()
  }
}
