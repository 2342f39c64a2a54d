package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface for the DOCUMENT ingest path (SURVEY.md
  * §2.5 dedup family) — the streaming twin of `dedup_incremental`: a
  * training-data pipeline does not receive its corpus as one batch, it
  * ingests an unbounded stream of crawled documents and must admit each
  * NEW content fingerprint exactly once, rejecting both what the durable
  * corpus already holds and what earlier micro-batches already admitted.
  *
  * Same discipline as EventStream: the transform is written against a
  * plain DataFrame so one code path serves batch (`spark.read`) and
  * streaming (`spark.readStream`), with batch-stream parity asserted in
  * StreamingSpec.
  */
object DocStream {

  case class Admit(fp: String, doc_id: Long)

  /** Exactly-once corpus admission.
    *
    *  - fingerprint = md5(text) (the dedup_exact/dedup_incremental key);
    *  - the existing-corpus rejection is a stream-static LEFT ANTI join
    *    against `corpusFps(fp)` — the static side is the durable corpus
    *    fingerprint artifact, re-read per micro-batch, so a corpus
    *    refresh is picked up without restarting the query;
    *  - cross-batch dedup is keyed state (flatMapGroupsWithState): the
    *    FIRST micro-batch containing a fingerprint emits one admission
    *    (the min doc_id inside that batch, matching the batch twin's
    *    deterministic min-id rule); later arrivals are dropped.
    *
    * State is one row per admitted fingerprint and the admitted
    * POPULATION is unbounded over an infinite crawl, so streaming mode
    * requires an `ingest_ts` column (crawl records carry fetch times)
    * and carries an EVENT-TIME TTL, exactly like
    * EventStream.runningUserCounts: a fingerprint idle past `idleUs` of
    * event time is evicted once the watermark passes its horizon, so
    * the state store is bounded by the active-horizon fingerprint set;
    * a duplicate arriving after eviction would be re-admitted (the
    * usual TTL trade — the periodic BATCH dedup pass collapses anything
    * beyond the horizon). Event-time timeout is deliberate:
    * ProcessingTimeTimeout + the default continuous trigger makes the
    * engine run no-data batches forever (observed: epoch 612 and
    * climbing on a drained source), while the event-time clock only
    * advances with data.
    *
    * Batch mode needs no timestamp column and degrades to exactly the
    * dedup_incremental shape: anti join + min-doc_id per fingerprint. */
  def admittedDocs(docs: DataFrame, corpusFps: DataFrame,
      idleUs: Long = 7L * 86400000000L,
      wmDelay: String = "1 hour"): Dataset[Admit] = {
    import docs.sparkSession.implicits._
    def anti(d: DataFrame) = d.join(corpusFps.select($"fp"), Seq("fp"), "left_anti")
    if (!docs.isStreaming)
      anti(docs.select(md5($"text".cast("binary")).as("fp"),
          $"doc_id".cast("long")))
        .as[(String, Long)]
        .groupByKey(_._1)
        .mapGroups((fp, rows) => Admit(fp, rows.map(_._2).min))
    else
      anti(docs.withWatermark("ingest_ts", wmDelay)
          .select(md5($"text".cast("binary")).as("fp"),
            $"doc_id".cast("long"), unix_micros($"ingest_ts").as("us"),
            $"ingest_ts"))
        .as[(String, Long, Long, java.sql.Timestamp)]
        .groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Append(),
            GroupStateTimeout.EventTimeTimeout) {
          (fp: String, batch: Iterator[(String, Long, Long, java.sql.Timestamp)],
           state: GroupState[Long]) =>
            if (state.hasTimedOut) { state.remove(); Iterator.empty }
            else {
              val rows = batch.toSeq
              val already = state.exists
              val seen = math.max(state.getOption.getOrElse(Long.MinValue),
                rows.iterator.map(_._3).max)
              state.update(seen)
              // keep the horizon alive on every arrival, admitted or not
              state.setTimeoutTimestamp(math.max((seen + idleUs) / 1000L,
                state.getCurrentWatermarkMs() + 1L))
              if (already) Iterator.empty
              else Iterator.single(Admit(fp, rows.iterator.map(_._2).min))
            }
        }
  }
}
