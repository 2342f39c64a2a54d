package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface for the EMBEDDING ingest path — the
  * drift monitor a production vector pipeline runs while embeddings
  * stream in: assign every arriving vector to its nearest cell of a
  * FIXED reference codebook (broadcast — the batch-built IVF/k-means
  * artifact), then publish per-event-time-window cell occupancy. A
  * window whose cell histogram shifts against the reference corpus
  * flags embedding-model drift or an upstream data change long before
  * any downstream recall metric notices.
  *
  * Same discipline as EventStream/DocStream: the transform is one code
  * path over a plain DataFrame — batch (`spark.read`) and streaming
  * (`spark.readStream`) run identical logic, parity asserted in
  * StreamingSpec.
  *
  * Scale shape: the codebook rides ONE broadcast row (an array of
  * (cell_id, centroid) structs — the sim_ivf_assign fold), assignment
  * is a within-row argmin projection (no shuffle, no explode), and the
  * only stateful streaming operator is the windowed count keyed on
  * (window, cell) — state bounded by windows × cells, independent of
  * vector volume.
  */
object EmbedStream {

  /** The reference codebook as a 1-row broadcastable frame: an
    * array_sort'ed list of (cell_id, centroid) structs. `refEmb` is the
    * batch embedding table the cells were built from; the seed
    * convention (vec_id < k) matches the declared sim_ivf_assign /
    * sim_kmeans queries so batch parity is checkable against them. */
  def codebook(refEmb: DataFrame, k: Int = 8): DataFrame = {
    import refEmb.sparkSession.implicits._
    refEmb
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .filter($"vec_id" < k)
      .select($"vec_id".as("cell_id"), $"v".as("c"))
      .agg(expr("array_sort(collect_list(named_struct(" +
        "'cell_id', cell_id, 'c', c)))").as("cents"))
  }

  /** Windowed cell-occupancy histogram over an embedding stream: for
    * each event-time hour, how many arriving vectors landed in each
    * codebook cell (nearest by cosine, ties to the lowest cell id —
    * the sim_ivf_assign argmin fold, negated-similarity struct order).
    * Batch mode runs the identical plan minus the watermark. */
  /** The ONE cell-assignment rule (argmin over the broadcast codebook
    * by negated rounded cosine, ties to the lowest cell id — the
    * sim_ivf_assign fold) parameterized over the vector column, so
    * cellDrift and nnServe's two sides can never assign differently
    * (review finding — three hand-kept copies risked divergence). */
  private def cellOf(vcol: String): org.apache.spark.sql.Column =
    expr(
      s"""array_min(transform(cents, ct -> named_struct(
         |  'nsim', -round(cosine_similarity($vcol, ct.c), 4),
         |  'cell_id', ct.cell_id)))""".stripMargin)
      .getField("cell_id")

  def cellDrift(emb: DataFrame, cb: DataFrame,
      wmDelay: String = "1 hour"): DataFrame = {
    import emb.sparkSession.implicits._
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val assigned = emb
      .select($"ingest_ts", $"embedding".cast("array<double>").as("v"))
      .crossJoin(broadcast(cb))
      .select($"ingest_ts", cellOf("v").as("cell"))
    val src = if (emb.isStreaming) assigned.withWatermark("ingest_ts", wmDelay)
      else assigned
    src.groupBy(window($"ingest_ts", "1 hour"), $"cell")
      .agg(count(lit(1)).as("n_vecs"))
      .select($"window.start".as("w_start"), $"cell", $"n_vecs")
  }

  /** Streaming nearest-neighbor serving — the online half of the IVF
    * search family: each arriving query vector is assigned to its
    * coarse cell IN-ROW against the broadcast codebook (zero shuffle
    * on the stream side), candidates are fetched by a stream-static
    * equi-join on the cell id against the STATIC index table, and the
    * exact top-1 per (window, query) is a windowed agg whose state is
    * ONE struct per key (max over (sim, −vec_id) — deterministic ties
    * to the lowest id, the family's convention). Self-matches are
    * excluded so a query that already lives in the index returns its
    * neighbor, not itself. Batch mode runs the identical plan minus
    * the watermark (parity asserted in StreamingSpec).
    *
    * Queries are DEDUPED per (hour, qid) BEFORE the probe join
    * (ADVICE r8): a query vector that arrives twice within one window
    * would otherwise double every candidate into n_cand (nn_id/nn_sim
    * were unaffected — max is idempotent — but the candidate count
    * read as arrivals×candidates). The dedup keys on (qid, hour
    * bucket) with the hour bucket as the event-time column, so the
    * dedup state is watermark-evicted; it also probes each distinct
    * query ONCE per window — re-arrivals no longer re-pay the
    * candidate join. Assumes qid → embedding is functional (two
    * same-window arrivals of one qid carry the same vector; the
    * survivor is otherwise arbitrary).
    *
    * @param queries stream (or batch) of (ingest_ts, vec_id, embedding)
    * @param index   static (vec_id, embedding) table to search
    * @param cb      broadcast codebook row from [[codebook]]. */
  def nnServe(queries: DataFrame, index: DataFrame, cb: DataFrame,
      wmDelay: String = "1 hour"): DataFrame = {
    import queries.sparkSession.implicits._
    servedWindowed(queries, index, cb, wmDelay)
      .select($"window.start".as("w_start"), $"qid",
        (-$"m.nid").as("nn_id"), $"m.cs".as("nn_sim"), $"n_cand")
  }

  /** The per-(window, query) serve agg with the time-window STRUCT
    * still attached — the seam [[recallCanary]] chains its second
    * windowed aggregation onto (Spark propagates event-time through
    * the window column, not through a projected-out start timestamp). */
  private def servedWindowed(queries: DataFrame, index: DataFrame,
      cb: DataFrame, wmDelay: String): DataFrame = {
    import queries.sparkSession.implicits._
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val idx = index
      .select($"vec_id".as("cand_id"),
        $"embedding".cast("array<double>").as("cv"))
      .crossJoin(broadcast(cb))
      .select($"cand_id", $"cv", cellOf("cv").as("cell"))
    val q0 = queries
      .select(date_trunc("hour", $"ingest_ts").as("ts_h"),
        $"vec_id".as("qid"),
        $"embedding".cast("array<double>").as("v"))
    val q1 = if (queries.isStreaming) q0.withWatermark("ts_h", wmDelay)
      else q0
    val q = q1.dropDuplicates("qid", "ts_h")
      .crossJoin(broadcast(cb))
      .select($"ts_h", $"qid", $"v", cellOf("v").as("cell"))
    val probed = q.join(idx, Seq("cell"))
      .filter($"cand_id" =!= $"qid")
      .select($"ts_h", $"qid", $"cand_id",
        expr("round(cosine_similarity(v, cv), 4)").as("cs"))
    probed.groupBy(window($"ts_h", "1 hour"), $"qid")
      .agg(max(struct($"cs", (-$"cand_id").as("nid"))).as("m"),
        count(lit(1)).as("n_cand"))
  }

  /** Index-miss canary — the serving-quality alert on top of
    * [[nnServe]]: per hour window, the share of queries whose best
    * hit sits below a similarity floor (`simE4Floor`, e4-quantized so
    * the verdict is an integer compare, never a float threshold). A
    * rising low-hit share is the canary for index staleness / query
    * drift out of the indexed distribution — the first number an ANN
    * serving dashboard pages on. Implemented as a SECOND windowed
    * aggregation stacked on nnServe's per-(window, query) rows
    * (Spark's chained-stateful support; the re-window over `w_start`
    * is 1:1 with the first window, so state is one counter row per
    * hour). Batch mode runs the identical plan (parity-tested). */
  def recallCanary(queries: DataFrame, index: DataFrame, cb: DataFrame,
      simE4Floor: Long = 5000L, wmDelay: String = "1 hour"): DataFrame = {
    import queries.sparkSession.implicits._
    servedWindowed(queries, index, cb, wmDelay)
      .withColumn("low",
        when(expr("cast(round(m.cs * 1e4) as bigint)") < simE4Floor,
          1L).otherwise(0L))
      .groupBy(window($"window", "1 hour"))
      .agg(count(lit(1)).as("n_queries"), sum($"low").as("n_low"))
      .select($"window.start".as("w_start"), $"n_queries", $"n_low",
        ($"n_low" * 5 >= $"n_queries").as("alert"))
  }
}
