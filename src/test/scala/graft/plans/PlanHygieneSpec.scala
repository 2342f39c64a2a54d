package graft.plans

import graft.{SparkEntry, SparkSpec}

/** Scale-hygiene guard over the ENTIRE declared-query inventory: no query
  * may plan a cartesian product or a broadcast nested-loop join — the two
  * shapes that silently turn a 100 TB query into an O(n²) job. Inspects
  * the initial physical plan without running actions, computed ONCE and
  * shared by both tests; will trip on any future query whose join
  * condition quietly stops being an equi-join. */
class PlanHygieneSpec extends SparkSpec {

  // Queries that materialize shared state eagerly while BUILDING their
  // DataFrame (connected components / checkpointed LSH pairs / q11's
  // aggregate) run real jobs during this sweep and their checkpointed
  // subtrees surface as LogicalRDD scans, hiding those joins from the
  // audit. That is acceptable ONLY because every hidden subtree's join
  // shape is swept explicitly — the raw LSH band join is appended to
  // the sweep below (every declared consumer rides the checkpoint now),
  // the components loop is unit-tested in ComponentsSpec, and q11's
  // aggregate has no join. dedup_clusters alone is excluded (the
  // 15-round propagation makes the sweep pay for it twice).
  private val eagerlyMaterializing = Set("dedup_clusters")

  private lazy val planStrings: Seq[(String, String)] =
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => eagerlyMaterializing(q._1))
      .map { case (name, fn) =>
        name -> fn(spark, sf()).queryExecution.executedPlan.toString
      } :+ ("dedup_lsh_pairs (raw band join)" ->
        graft.queries.Dedup.lshPairs(spark, sf())
          .queryExecution.executedPlan.toString) :+
      ("pqIndex (raw build)" ->
        graft.queries.Similarity.pqIndexRaw(spark, sf())
          .queryExecution.executedPlan.toString) :+
      ("ivfCells (raw build)" ->
        graft.queries.Similarity.ivfCellsRaw(spark, sf())
          .queryExecution.executedPlan.toString) :+
      ("shingles3 (raw build)" ->
        graft.queries.Dedup.shingles(spark, sf(), 3, hashed = true)
          .queryExecution.executedPlan.toString) :+
      ("shingles5 (raw build)" ->
        graft.queries.Dedup.shingles(spark, sf(), 5, hashed = true)
          .queryExecution.executedPlan.toString) :+
      ("winnowFingerprints (raw build)" ->
        graft.queries.TextAnalysis.winnowFingerprints(
            graft.Tables.t(spark, sf(), "documents"))
          .queryExecution.executedPlan.toString) :+
      ("sketch_cms (raw build)" ->
        graft.queries.Sketches.cmsBuild(spark, sf())
          .queryExecution.executedPlan.toString) :+
      ("sketch_bloom (raw build)" ->
        graft.queries.Sketches.bloomBuild(spark, sf())
          .queryExecution.executedPlan.toString) :+
      ("simhash (raw build)" ->
        graft.queries.Dedup.simhash(spark, sf())
          .queryExecution.executedPlan.toString) :+
      // the ACF/MK/EWMA/MAD/Holt family reads the grid through a
      // checkpoint (round 11); the raw build keeps its bounds
      // crossJoin under audit here
      ("denseHourGrid (raw build)" ->
        graft.queries.EventsLog.denseHourGridRaw(spark, sf())
          .queryExecution.executedPlan.toString)

  // BroadcastNestedLoopJoin is legitimate ONLY as a scalar broadcast: a
  // crossJoin against a 1-row aggregate (corpus mean, query vector,
  // centroid set) — constant-size build side at any data scale. Every
  // entry here must be that shape; anything new that BNLJs is a bug.
  private val scalarBroadcastOk = Set(
    "q_above_avg_customers", // 1-row global avg
    "sim_cosine_topk",       // 1-row query vector
    "sim_ivf_assign",        // fixed k-row centroid table
    "sim_sample_percell",    // 1-row codebook (same assignment fold)
    "sim_kmeans",            // 1-row codebook array, both iterations
    "sim_pq_search",         // 1-row codebook + 1-row query vector
    "sim_pq_rerank",         // 1-row query LUT/vector + 100-row shortlist
    "sim_ivf_pq_search",     // 1-row codebook + 1-row query + 2 probe rows
    "sim_ivf_topk",          // 1-row query vector + centroid probe
    "sim_lsh_sigs",          // 1-row hyperplane matrix
    "sim_lsh_topk",          // 1-row hyperplane matrix + 1-row query sig
    "sim_lsh_multiprobe",    // 1-row hyperplane matrix + 5 probe rows
    "text_tfidf",            // 1-row corpus doc count
    "text_keywords",         // 1-row corpus doc count (same idf input)
    "q11_important_parts",   // 1-row global lineitem value
    "q20_heavy_suppliers",   // 1-row per-supplier volume total
    "q22_idle_customers",    // 1-row positive-balance sum+count
    "log_gapfill",           // 1-row global (min,max) hour bounds
    "log_rfm",               // 1-row quartile-boundary agg (3x3 values)
    "doc_token_budget",      // 1-row total-token budget agg
    "doc_sample_weighted",   // 1-row PPS step (total weight / k) agg
    // doc_dsir_weights / doc_dsir_select dropped (r17): both read the
    // memoized DSIR score table, so the (R,T) totals BNLJ lives in the
    // doc_dsir_raw build now, not in these queries' own plans
    "text_perplexity_tiers", // 1-row scored-doc count agg
    "doc_sample_temperature",// 1-row temperature-weight sum agg
    "doc_sample_unimax",     // 1-row source count + 1-row first-uncapped agg
    "doc_interleave",        // 1-row source-count scalar (n_src)
    "log_skew_profile",      // 1-row total-event-count scalar
    "log_error_burst",       // 1-row corpus error-rate scalar
    "sim_batch_topk",        // 1-row query-batch array (10 vectors)
    "sketch_qdigest_quantiles", // 3-row quantile-target frame theta-
                             // joining the value-domain-bounded cum
                             // table (rank-of-estimate is a <= by
                             // nature, not an equi-join)
    "doc_canary_scan",       // 3-row broadcast canary registry (substring
                             // predicate — not an equi-join by nature)
    "text_learnability",     // 1-row corpus bigram-total agg
    "sim_silhouette",        // 1-row seed-codebook array (kmeans shape)
    "doc_epoch_plan",        // 1-row corpus-total agg + 1-row chosen (k,m)
    "doc_epoch_expand",      // same water-fill scalars feeding the manifest
    "dedup_df_profile",      // 1-row total-occurrence-mass agg
    "log_ab_cuped",          // 1-row ts min/max bounds scalar + 1-row
                             // pooled-sums scalar (was 6 global
                             // windows, r17 verdict ask #7)
    "text_kl_source_drift",  // 1-row corpus-token-total scalar (was a
                             // global window, r17 verdict ask #7)
    // log_markov_stationary / mm_bytes_balance: broadcast-scalar form
    // tried and reverted (exchange reuse defeated by pruning /
    // pushed-filter asymmetry — see the query comments); they keep
    // their bounded global windows and plan no BNLJ
    "doc_mixture_targets",   // 1-row (n_src, ttok) + 1-row teff scalars
                             // (was 3 global windows, r17 verdict
                             // ask #7)
    "log_ab_sequential",     // 1-row ts bounds + 5-row look lattice
                             // over the <=60-row (variant,fs,cs) hist
    "log_chi2_independence", // 1-row (N, rows, cols) totals scalar
    "log_survival_curve",    // 1-row window-end (max day) scalar
    "log_change_decomposition", // 1-row ts min/max bounds scalar
    "text_pmi_top",          // 1-row bigram-total scalar
    "log_psi_drift",         // 1-row (ts,value) min/max bounds scalar
    "log_ks_drift",          // 1-row ts min/max bounds scalar
    "sim_centroid_shift",    // 1-row seed-codebook array (kmeans shape)
    "sim_pair_recall_bounds",// DELIBERATE sampled all-pairs truth join (the
                             // recall diagnostic's ground truth exists only
                             // over the vec_id%2 half-sample, never in a
                             // dedup path) + 1-row hit aggs for the gain row
    // log_t_closeness dropped (r17): the shared qiClassMetrics memo
    // reads back as a LogicalRDD, so its scalar BNLJ no longer appears
    // in this query's own plan
    "log_anonymize_release", // the same class-metric scalars (via the
                             // shared qiClassMetrics) + the 1-row
                             // release-wide k_min scalar broadcast
    "log_k_widen_release",   // 1-row suppression-accounting scalar
                             // broadcast onto the bounded release rows
    "sketch_hll_merge",      // 1-row single-pass estimate + exact agg
    "log_pagerank",          // 1-row node count (rank vector joins are equi)
    "sim_recall_eval",       // 1-row query vec/planes/codebook, 2-row probes
    "sim_recall_vs_nprobe",  // 1-row query vec + 8-row probe-rank bcast
    "sim_matryoshka_recall", // 1-row query vector scalar broadcast
    "sim_init_quality",      // two 1-row 8-center codebook broadcasts
    "sim_hubness",           // 1-row corpus-count scalar broadcast
    "sim_energy_distance",   // three 1-row collected-block broadcasts
                             // (≤100-vector population rows, the
                             // codebook fold shape) + 1-row count row
    "sim_ivf_probe_cost",    // 1-row 8-centroid codebook broadcast
    "doc_coreset_weights",   // 1-row 8-seed codebook broadcast
    "sim_norm_outliers",     // two 1-row median/p90 scalar broadcasts
    // sim_index_append_serve dropped (r17): the serve reuses append's
    // persisted (cell, cell2) probe list, so the stored-codebook BNLJ
    // replay no longer appears in the plan
    "sim_recall_bounds",     // wraps sim_recall_eval + 5-row floor table
    "sim_power_iteration",   // 1-row norm scalars (n1, n2) between passes
    "log_forecast_baseline", // inherits log_gapfill's 1-row hour bounds
    "log_seasonality_profile", // 1-row (total, cells) scalar
    "log_user_gini",         // 1-row (n_users, total_events) scalar
    "doc_novelty_curve",     // 1-row max-doc-id batch-cut scalar
    "log_shapley_attribution", // constant 16-mask × 4-channel lattice
                             // (non-equi mask-filter joins; size fixed
                             // by the alphabet at any corpus scale)
    "log_entropy_rate",      // 1-row total-transition-count scalar
    "log_rank_movers",       // 1-row (first-day, last-day) bounds
    "q_revenue_concentration", // constant 5-cutoff lattice (rn <= k)
    "q_basket_pairs",        // 1-row distinct-order-count scalar
    "sketch_kmv",            // 1-row exact-distinct scalar broadcast
    "sketch_kmv_merge",      // 1-row direct-sketch + shard-count scalars
    "sketch_kmv_intersect",  // 1-row exact-jaccard audit scalar
    "sketch_ams_f2",         // 1-row median/exact-F2/merge-check scalars
    "sim_clustering_coefficient", // 1-row wedge/triangle/local scalars
    "sim_ann_ndcg",          // 1-row planes + 1-row query-panel array
    "sim_ann_mrr_map",       // same 1-row planes + query-panel shape
    "doc_bm25_topk",         // 1-row (n_docs, total-token) scalars
    "text_word_dispersion",  // constant 15-word × source lattice +
                             // 1-row corpus-token scalar
    "text_log_odds",         // source-alphabet × capped-vocab lattice
                             // (both broadcast-size) + 1-row total
    "text_burrows_delta",    // constant 15-word × source lattice
    "sketch_mg_heavy",       // 1-row merge-subtrahend + 1-row total
    "sim_hard_negatives",    // 1-row anchor-panel array (batch_topk shape)
    "sim_rank_fusion",       // 1-row hyperplane matrix + 1-row anchor panel
    "doc_cdc_dedup",         // 1-row corpus-savings scalar
    "log_hourly_quantiles",  // 1-row (v0,v1) bin-bounds scalar — the
                             // sketch_hist_quantiles shape per hour
    "log_removal_effect",    // constant 5-variant × alphabet² removal
                             // lattice + 1-row full-chain scalars
    "pqIndex (raw build)",   // 1-row codebook (the materialized index build)
    "ivfCells (raw build)",  // 1-row adaptive-k count + super-centroid row
    "denseHourGrid (raw build)") // 1-row (min,max) hour bounds crossJoin —
                             // the grid zero-fill every dense-series
                             // query reads through the round-11 memo

  test("no declared query plans a cartesian or nested-loop join") {
    val offenders = planStrings.flatMap { case (name, plan) =>
      val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
        .filter(plan.contains)
        .filterNot(_ == "BroadcastNestedLoopJoin" && scalarBroadcastOk(name))
      if (bad.nonEmpty) Some(s"$name: ${bad.mkString(", ")}") else None
    }
    assert(offenders.isEmpty,
      s"quadratic join shapes in declared queries:\n${offenders.mkString("\n")}")
  }

  test("every scalar-broadcast exemption is live") {
    // A blanket per-query exemption whose plan no longer contains any
    // BNLJ (e.g. because the subtree moved behind a memoized
    // checkpoint) is dead weight that would silently excuse a FUTURE
    // non-scalar nested-loop join in that query. The allowlist must
    // shrink in the same commit that removes the join shape.
    val byName = planStrings.toMap
    val dead = scalarBroadcastOk.toSeq.sorted.filter { name =>
      byName.get(name).forall(!_.contains("BroadcastNestedLoopJoin"))
    }
    assert(dead.isEmpty,
      s"dead BNLJ exemptions (no such join in plan):\n${dead.mkString("\n")}")
  }

  test("no declared query plans a driver-side collect limit over raw data") {
    // CollectLimit on a huge child is fine (top-k), but a query whose
    // ROOT is CollectLimit with no preceding exchange/sort would pull
    // unordered raw rows to the driver. All declared queries end in a
    // total ORDER BY, so the root must be a Sort/TakeOrdered, never a
    // bare CollectLimit.
    val offenders = planStrings.flatMap { case (name, plan) =>
      if (plan.linesIterator.take(2).exists(_.contains("CollectLimit")))
        Some(name)
      else None
    }
    assert(offenders.isEmpty,
      s"unordered driver-side collect at query root:\n${offenders.mkString("\n")}")
  }
}
