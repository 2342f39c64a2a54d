package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Raw (non-memoized) builds of the frames that several declared queries
  * read through FrameMemo. The declared query IS the product surface — a
  * production deployment builds an index/sketch/LM once and queries the
  * artifact — but a benchmark that times only the declared query measures
  * a cache read (bench_detail r7: text_bigram_lm 0.758→0.028 s was a
  * memo hit, not a speedup). ScaleStress has always driven these raw
  * builds for its 10× ratios; Bench now times them too, as explicit
  * `*_raw` rows, so the full-inventory bench carries the real build cost
  * and the round-over-round auto-diff never mistakes a memo hit for a
  * win (ADVICE r7).
  */
object RawBuilds {
  val map: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_cms_raw" -> ((s, d) => queries.Sketches.cmsBuild(s, d)),
    "dedup_lsh_pairs_raw" -> ((s, d) => queries.Dedup.lshPairs(s, d)),
    "sim_pq_codes_raw" -> ((s, d) => queries.Similarity.pqIndexRaw(s, d)),
    // the declared sim_kcenter_init / sim_init_quality read the memoized
    // farthest-first seed frame; this drives the real 7-pass build
    "sim_kcenter_init_raw" -> ((s, d) => queries.Similarity.kcenterRaw(s, d)),
    "dedup_clusters_raw" -> ((s, d) => queries.Dedup.componentsRaw(s, d)),
    // the candidate-pair exact-Jaccard table five dedup governance
    // queries read through a FrameMemo since r16; this drives the real
    // candidate shingle explode + pair-join build
    "dedup_cand_jaccard_raw" -> ((s, d) =>
      queries.Dedup.candJaccard3Raw(s, d)),
    // the per-user QI profile six privacy-governance queries read
    // through a FrameMemo since r16; this drives the real user-keyed
    // event aggs + profile join
    "log_qi_profile_raw" -> ((s, d) =>
      queries.EventsLog.qiProfileRaw(s, d)),
    // the per-QI-class metric frame log_t_closeness and
    // log_anonymize_release read through a FrameMemo since r17; this
    // drives the real spendband join + lattice windows build
    "log_qi_class_raw" -> ((s, d) =>
      queries.EventsLog.qiClassMetricsRaw(s, d)),
    // the per-doc DSIR score table doc_dsir_weights and
    // doc_dsir_select read through a FrameMemo since r17; this drives
    // the real tokenize + bucket + LLR build
    "doc_dsir_raw" -> ((s, d) =>
      queries.PipelineOps.dsirScoresRaw(s, d)),
    // the per-doc cascade attribution dedup_cascade and
    // dedup_cascade_spans read through a FrameMemo since r17; this
    // drives the real exact→near→semantic funnel build
    "dedup_cascade_att_raw" -> ((s, d) =>
      queries.Similarity.cascadeAttributionRaw(s, d)),
    // the declared mm_neardup_pairs/clusters read the memoized frame
    // pair graph (r12 drift fix); this drives the real band-join build
    "mm_neardup_pairs_raw" -> ((s, d) =>
      queries.Multimodal.neardupPairsRaw(s, d)),
    // the declared merge queries read memoized shard tables; these drive
    // the full shard fold + merge (the actual operator)
    "sketch_cms_merge_raw" -> ((s, d) => queries.Sketches.cmsMergeRaw(s, d)),
    "sketch_bloom_merge_raw" -> ((s, d) => queries.Sketches.bloomMergeRaw(s, d)),
    // the declared LM consumers read the memoized lmScores table; these
    // drive the full corpus bigram-agg build (and, for tiers, build +
    // rank end-to-end)
    "text_bigram_lm_raw" -> ((s, d) => queries.PipelineOps.lmScoresRaw(s, d)),
    "text_perplexity_tiers_raw" -> ((s, d) =>
      queries.PipelineOps.perplexityTiers(queries.PipelineOps.lmScoresRaw(s, d))),
    // the ACF/Mann-Kendall/EWMA/MAD/Holt family reads the memoized
    // dense hourly grid; this drives the real one-pass zero-fill build
    "log_dense_grid_raw" -> ((s, d) =>
      queries.EventsLog.denseHourGridRaw(s, d)),
    // the source-forensics lattice pair reads the memoized
    // (source, token) cell counts; this drives the real tokenize+agg
    "text_source_counts_raw" -> ((s, d) =>
      queries.TextAnalysis.sourceTokenCountsRaw(s, d)),
    // the declared doc_dup_spans/doc_dup_savings read the memoized
    // per-doc span summary; this drives the real gram pass + island
    // merge (the span-level dedup operator)
    "doc_dup_spans_raw" -> ((s, d) =>
      queries.PipelineOps.dupSpansRaw(s, d)),
    // the corpus-scale BPE lifecycle: fit 32 merges on the top-512
    // vocabulary sample (the one bounded collect — a tokenizer is fit
    // on a size-capped sample by design), then encode every document
    // distributively with the broadcast rank table
    "text_bpe_corpus_raw" -> ((s, d) =>
      engine.BpeTokenizer.corpusTokenCounts(s, d)),
    // the declared doc_cdc_* trio runs on the engine chunker since
    // r12; this keeps the declarative md5-contract build timed so the
    // engine-vs-contract cost ratio stays visible in bench_detail
    "doc_cdc_chunks_sql_raw" -> ((s, d) =>
      queries.PipelineOps.cdcChunksSqlPath(s, d)),
    // the rolling-hash production path (no md5 per char) — the
    // geometry twin of the md5 rule, invariant-tested not oracled
    "doc_cdc_chunks_poly_raw" -> ((s, d) =>
      queries.PipelineOps.cdcChunksPoly(s, d)),
    // the full persisted-index lifecycle: build + write the
    // cell-partitioned artifact, reload with manifest validation,
    // serve a ~1% query panel top-10 — the serve-tomorrow cost the
    // in-session memo rows can't see
    "sim_index_store_raw" -> ((s, d) => {
      // stable scratch dir, reused across reps (save() overwrites) —
      // a fresh tempdir per rep accumulated unbounded /tmp disk
      // (review r13); one shared derivation with the lifecycle rows
      val dir = queries.Similarity.idxScratch("bench", d)
      engine.AnnIndexStore.save(s, d, dir)
      engine.AnnIndexStore.load(s, dir, verify = true) // footer integrity
      import org.apache.spark.sql.functions.col
      val qs = Tables.t(s, d, "embeddings")
        .select(col("vec_id").as("q_id"),
          col("embedding").cast("array<double>").as("q"))
        .filter(col("q_id") % 97 === 0)
      // the stored-quantizer serve path — the only correct one once an
      // index has been appended to
      engine.AnnIndexStore.searchTopKStored(s, dir, qs, 10)
    }),
    // the vacuum-retention lifecycle (r15 verdict ask #3): clone a
    // write-once four-generation fixture, vacuum at keep=2 (retained
    // generation must stay readable, zero data files reclaimed), then
    // at keep=1 (the compact-replaced deltas go) — see the
    // vacuumRetentionRaw scaladoc for the cost shape
    "sim_index_vacuum_raw" -> ((s, d) =>
      queries.Similarity.vacuumRetentionRaw(s, d)))
}
