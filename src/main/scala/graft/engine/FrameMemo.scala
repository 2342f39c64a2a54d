package graft.engine

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small BOUNDED memo for materialized frames shared across queries —
  * the same discipline as Tables' session cache: insertion-order
  * eviction after MaxEntries. Eviction is DETERMINISTIC about storage:
  * the evicted frame's checkpointed RDD handle (captured at insert)
  * is unpersisted immediately rather than waiting for GC + the
  * ContextCleaner to notice the dropped reference — with ~10 memo
  * instances × 8 entries of checkpointed frames in a long-lived
  * session, lazy release would accrete pinned blocks.
  * Data dirs are immutable for a cache entry's useful life
  * (TESTDATA.md), so entries never go stale. A racing first compute
  * may run twice; the loser's checkpoint is released explicitly —
  * correctness is unaffected and no lock is held across a Spark job.
  *
  * At 100 TB the pattern is the same one a production pipeline uses for
  * shared index artifacts (LSH candidate pairs, PQ codes, connected
  * components): build once, materialize, and let every consumer read
  * the materialized frame instead of re-running the build stage.
  * (For the durable variant of that pattern — the artifact written
  * through the catalog and re-read by consumers, surviving executor
  * loss — see Similarity's persisted PQ-index path.)
  */
final class FrameMemo {
  private val MaxEntries = 8
  private val m =
    new java.util.LinkedHashMap[(SparkSession, String), (DataFrame, Option[RDD[_]])](
      16, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), (DataFrame, Option[RDD[_]])])
          : Boolean = {
        val evict = size() > MaxEntries
        // release the evicted frame's exact persisted blocks now;
        // Dataset.unpersist would be a no-op on a localCheckpoint frame
        // (see Frames.checkpointRdd scaladoc)
        if (evict) e.getValue._2.foreach(_.unpersist(blocking = false))
        evict
      }
    }
  def get(s: SparkSession, d: String)(compute: => DataFrame): DataFrame = {
    val k = (s, d)
    val hit = m.synchronized(m.get(k))
    if (hit != null) hit._1
    else {
      val v = compute // outside the lock: a Spark job runs here
      val rdd = Frames.checkpointRdd(v)
      m.synchronized {
        val again = m.get(k)
        if (again != null) {
          // lost the race: drop this compute's checkpoint explicitly
          rdd.foreach(_.unpersist(blocking = false))
          again._1
        } else { m.put(k, (v, rdd)); v }
      }
    }
  }
}

/** Frame-level storage helpers shared by FrameMemo and Components. */
object Frames {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The exact persisted RDD behind a localCheckpoint'd frame, extracted
    * from its LogicalRDD plan. `Dataset.unpersist` is a no-op on such a
    * frame (no CacheManager entry — the storage belongs to the RDD), so
    * releasing the blocks deterministically requires this handle.
    * Returns None for frames that are not checkpoint-backed (nothing
    * persisted → nothing to release). */
  def checkpointRdd(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case other =>
        // A localCheckpoint frame analyzes to a LogicalRDD on Spark 4.1;
        // a non-checkpointed frame analyzes to its ordinary plan and
        // carries no persisted blocks — only warn when the frame claims
        // checkpoint storage we failed to extract.
        if (df.storageLevel.useMemory || df.storageLevel.useDisk)
          log.warn(
            "checkpoint RDD extraction failed — analyzed plan is " +
              s"${other.getClass.getName}, not LogicalRDD; the persisted " +
              "blocks will not be released until the ContextCleaner runs")
        None
    }
}
