package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the declared-query inventory from the `graft.queries`
  * modules. Every query has a DuckDB oracle twin unless it is
  * non-SQL-expressible (then the driver records a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Word-count top-k over documents — scan, projection, explode,
    * 2-phase agg, top-k (SURVEY.md §7.2 M0). */
  def entry(spark: SparkSession): DataFrame =
    queries("wc_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.TpchDeep.queries ++
      graft.queries.TextWordCount.queries ++
      graft.queries.EventsLog.queries ++
      graft.queries.Dedup.queries ++
      graft.queries.Similarity.queries ++
      graft.queries.TextAnalysis.queries ++
      graft.queries.Multimodal.queries ++
      graft.queries.Sketches.queries ++
      graft.queries.PipelineOps.queries ++
      graft.queries.MapReduceQueries.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.TpchDeep.oracle ++
      graft.queries.TextWordCount.oracle ++
      graft.queries.EventsLog.oracle ++
      graft.queries.Dedup.oracle ++
      graft.queries.Similarity.oracle ++
      graft.queries.TextAnalysis.oracle ++
      graft.queries.Multimodal.oracle ++
      graft.queries.Sketches.oracle ++
      graft.queries.PipelineOps.oracle ++
      graft.queries.MapReduceQueries.oracle
}
