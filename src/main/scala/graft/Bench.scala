package graft

import org.apache.spark.sql.SparkSession

/** Bench surface: times every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}}. The stdout line is
  * kept under ~1.5 KB (slowest queries inlined first) so it survives the
  * driver's bounded stdout-tail capture; the complete per-query map is
  * written to ./bench_detail.json and echoed on stderr.
  *
  * A warm-up pass on the smallest scale factor (sibling sf0.001, when
  * present) runs first so the timed numbers measure query execution, not
  * first-run JVM/codegen compilation — standard JIT benchmarking
  * methodology; profiling showed cold-start dominating otherwise. Each
  * query is then timed SPARK_GRAFT_BENCH_REPS times (default 3) at the
  * target scale factor and the minimum reported — steady-state timing
  * that removes one-off GC/page-cache spikes (observed run-to-run noise
  * on identical code was ±20%+). A System.gc() runs before each query's
  * timed reps so a heavy neighbor's garbage is collected on ITS OWN
  * clock, not billed to whichever query happens to run next — the
  * residual noise class after round 4 pinned sorted ordering (r4's
  * mr_log_report 4.4x "regression" at byte-identical code was exactly
  * this: it sorts directly after the allocation-heavy mr_inverted_index).
  *
  * Optional CLI args name a subset of queries to time (local iteration);
  * no args = the full declared inventory (the driver's mode).
  *
  * A query that throws is reported as -1 (never as a fake fast time).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // default 3 reps: the r5→r6 phantom-regression investigation (PLANS.md
    // "Round-6 notes") measured ~1.7x run-to-run variance on identical
    // code at min-of-2 but stable numbers at min-of-3
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").flatMap(_.toIntOption)
      .filter(_ >= 1).getOrElse(3)
    // The declared inventory PLUS the *_raw builds of memo-backed frames
    // (RawBuilds): a declared query that reads a FrameMemo table times a
    // cache read at min-of-N reps, so the raw rows carry the real build
    // cost in bench_detail.json and keep the auto-diff honest (ADVICE
    // r7 — text_bigram_lm's 0.758→0.028 s "win" was a memo hit).
    val inventory = SparkEntry.queries ++ RawBuilds.map
    val wanted: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      if (args.isEmpty) inventory
      else {
        val unknown = args.filterNot(inventory.contains)
        if (unknown.nonEmpty)
          System.err.println(s"[bench] unknown queries ignored: ${unknown.mkString(",")}")
        inventory.view.filterKeys(args.contains).toMap
      }

    val warmDir = new java.io.File(new java.io.File(sfDir).getParent, "sf0.001")
    if (warmDir.isDirectory && warmDir.getPath != new java.io.File(sfDir).getPath) {
      wanted.foreach { case (_, fn) =>
        try fn(spark, warmDir.getPath).count() catch { case _: Throwable => }
      }
    }

    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        -1.0
      }
    }
    // deterministic (sorted) timing order: hash-map order reshuffles
    // every query's neighborhood whenever the inventory grows, which is
    // exactly the round-over-round noise source diagnosed in PLANS.md
    // "Round-4 notes" — a fixed order keeps per-query numbers comparable
    // across rounds
    val results = wanted.toSeq.sortBy(_._1).map { case (name, fn) =>
      // collect the PREVIOUS query's garbage before this one's clock
      // starts (see scaladoc — kills the heavy-neighbor noise class)
      System.gc()
      // a failure on ANY rep reports -1 — an intermittent throw must
      // never hide behind another rep's clean time
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      var ok = true
      var i = 0
      while (i < reps && ok) {
        val t = timeOnce(name, fn)
        if (t < 0) ok = false else times += t
        i += 1
      }
      // Short rows get EXTRA reps (to 7 total): their run-to-run
      // distribution is wide relative to the value, so two runs'
      // min-of-3 can differ 1.5x+ on identical code — r11's seven
      // flagged "regressions" were all <0.6 s timer noise (verdict
      // ask #7). More reps make the MIN estimator converge to the
      // floor on both sides of the round-over-round diff; the verdict
      // suggested median-of-3, but a median reads systematically
      // ~1.5-2x above every committed min-based baseline (measured:
      // dedup_lsh_verified 0.29 min vs 0.69 median on one run) and
      // would flag the whole sub-second inventory as regressed once —
      // stabilizing the min keeps the series comparable instead.
      // Threshold 1.5 s (was 1.0, verdict r12 ask #6): q8_domestic_share
      // showed the noise family reaches 0.3→0.45 s swings that ride
      // just over the old cutoff's Δ≥0.1 s floor.
      while (ok && times.nonEmpty && times.min < 1.5 && times.size < 7) {
        val t = timeOnce(name, fn)
        if (t < 0) ok = false else times += t
      }
      name -> (if (!ok) -1.0 else times.min)
    }
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.count(_._2 < 0)

    def fmt(v: Double): String = f"$v%.3f"
    val full = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }

    // Full per-query detail goes to a sidecar file + stderr; the stdout
    // JSON line must stay parseable from the driver's bounded (2000-char)
    // stdout tail — rounds 1-2 overflowed it and were recorded unparsed.
    // Inline as many per-query entries as fit a conservative budget,
    // slowest queries first (the ones worth reading in a bench report).
    // A query-filtered run must not overwrite the full-inventory detail
    // file — bench_detail.json is the round-over-round regression
    // baseline, and a 4-query local iteration would silently destroy
    // the other ~150 queries' numbers. Filtered runs get a sidecar.
    val detailFile =
      if (args.isEmpty) "bench_detail.json" else "bench_detail_partial.json"

    // Round-over-round auto-diff: read the PREVIOUS full-inventory detail
    // file (before this run overwrites it) and surface per-query deltas
    // >1.5x either way — so a regression cluster is seen at build time,
    // not first at judging. The file is flat {"name":sec,...}; parse it
    // without a JSON dependency. Filtered runs diff too (their baseline
    // is still the last full run) but never overwrite the baseline.
    val prevDetail: Map[String, Double] =
      try {
        val f = new java.io.File("bench_detail.json")
        if (!f.isFile) Map.empty
        else {
          val txt = scala.io.Source.fromFile(f)
          val s = try txt.mkString.trim.stripPrefix("{").stripSuffix("}") finally txt.close()
          s.split(',').iterator.flatMap { kv =>
            kv.split(':') match {
              case Array(k, v) =>
                v.toDoubleOption.map(k.trim.stripPrefix("\"").stripSuffix("\"") -> _)
              case _ => None
            }
          }.toMap
        }
      } catch { case _: Throwable => Map.empty }
    // ratio gate (1.5x) AND a Δ floor that scales with the base
    // (verdict r12 ask #6): a 0.05->0.14 s flutter is scheduler
    // jitter, and a 0.3->0.45 s swing on an untouched query is the
    // same noise family one octave up — neither is a regression worth
    // a line. The floor is max(0.1, 0.3·p, min(0.25, p)) (round 13):
    // the min(0.25, p) term absorbs the measured jitter band on
    // sub-half-second rows — min-of-7 on UNTOUCHED rows oscillates
    // 0.14-0.27 s across isolated runs (q_session_window 0.22-0.36
    // over r11-r13 at identical code, sim_clustering_coefficient
    // 0.315-0.59 with r11-close == the r13 value exactly) — while
    // capping at p keeps a true 2x regression visible at ANY base
    // >= 0.2 s (a 2x move has Δ = p >= the floor); a flat 0.25 s
    // floor would have blinded the gate to 2-3x regressions on rows
    // under 0.25 s (review r13).
    // the jitter-band term applies ONLY below 0.5 s (second review
    // pass: an unconditional min(0.25, p) also suppressed legitimate
    // "faster" lines for 0.5-0.83 s bases, outside the band the
    // evidence covers)
    val deltas = results.toSeq.flatMap { case (name, v) =>
      prevDetail.get(name).collect {
        case p if p > 0 && v > 0 && (v >= p * 1.5 || v <= p / 1.5) &&
          math.abs(v - p) >= math.max(0.1, math.max(0.3 * p,
            if (p < 0.5) math.min(0.25, p) else 0.0)) =>
          (name, p, v, v / p)
      }
    }.sortBy { case (_, _, _, r) => -r }
    if (prevDetail.nonEmpty) {
      deltas.foreach { case (name, p, v, r) =>
        val tag = if (r >= 1.5) "SLOWER" else "faster"
        System.err.println(f"[bench-diff] $tag $name ${p}%.3f -> ${v}%.3f (${r}%.2fx)")
      }
      val n = deltas.count(_._4 >= 1.5)
      System.err.println(s"[bench-diff] ${n} quer${if (n == 1) "y" else "ies"} >=1.5x slower than previous detail file")
    }
    val regressed = deltas.count(_._4 >= 1.5)
    // Contention self-labeling (verdict r9 ask #8): the median per-row
    // ratio vs the previous committed detail file — the diagnosis the
    // round-8 sessions ran by hand. Host contention inflates (nearly)
    // ALL rows by a uniform 1.1–1.3x, so median_ratio >> 1 with few
    // per-row regressions reads "contended run, re-bench isolated",
    // while median_ratio ≈ 1 with a concentrated slow cluster reads
    // "real regression". Computed over rows present in both runs with
    // positive times; -1 when there is no baseline to compare.
    val ratios = results.flatMap { case (name, v) =>
      prevDetail.get(name).collect { case p if p > 0 && v > 0 => v / p }
    }.sorted
    val medianRatio =
      if (ratios.isEmpty) -1.0
      else if (ratios.size % 2 == 1) ratios(ratios.size / 2)
      else (ratios(ratios.size / 2 - 1) + ratios(ratios.size / 2)) / 2.0
    // n_raw makes the series comparable across rounds: total includes the
    // raw build rows (new in r8), declared-query subtotal = recompute
    // from bench_detail.json minus *_raw entries
    val nRaw = results.count { case (name, _) => RawBuilds.map.contains(name) }
    val header = s""""metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir","n_queries":${results.size},"n_raw":$nRaw,"failed":$failed,"regressed":$regressed,"median_ratio":${fmt(medianRatio)},"detail":"$detailFile","queries":"""
    val budget = 1500 - header.length - 4
    val bySlowest = results.toSeq.sortBy { case (_, v) => -v }
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
    val inline = new StringBuilder
    var used = 0
    bySlowest.foreach { e =>
      if (used + e.length + 1 <= budget) {
        if (inline.nonEmpty) inline.append(',')
        inline.append(e); used = inline.length
      }
    }
    try {
      val w = new java.io.PrintWriter(detailFile)
      try w.println(full.mkString("{", ",", "}")) finally w.close()
    } catch { case e: Throwable => System.err.println(s"[bench] detail write failed: ${e.getMessage}") }
    System.err.println("[bench-detail] " + full.mkString("{", ",", "}"))
    println("{" + header + "{" + inline + "}}")
    spark.stop()
    // a run with failing queries must not read as green to automation:
    // the JSON line already carries "failed":N, and the process exit
    // code now agrees (the round-6 bench logged [success] at 11 failures)
    if (failed > 0) sys.exit(1)
  }
}
