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

  case class UserCount(user_id: Long, n: Long)

  /** Stateful per-user running event counts via mapGroupsWithState —
    * the Spark-native form of the reference's per-key reduce state
    * (M5 whole-partition reduce generalized to unbounded streams). */
  def runningUserCounts(events: DataFrame): Dataset[UserCount] = {
    import events.sparkSession.implicits._
    events.select($"user_id".cast("long"))
      .as[Long]
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Long], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + batch.size
          state.update(n)
          UserCount(user, n)
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

  /** Launch helper: run a streaming query over a parquet directory into
    * an in-memory table and block until all available data is processed. */
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
