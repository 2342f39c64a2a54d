package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small BOUNDED memo for materialized frames shared across queries —
  * the same discipline as Tables' session cache: insertion-order
  * eviction after MaxEntries, so stopped sessions and their
  * checkpointed RDDs are released instead of pinned for the JVM
  * lifetime (the evicted frame's blocks go with it once GC'd).
  * Data dirs are immutable for a cache entry's useful life
  * (TESTDATA.md), so entries never go stale. A racing first compute
  * may run twice; the loser's checkpoint is GC-released — correctness
  * is unaffected and no lock is held across a Spark job.
  *
  * At 100 TB the pattern is the same one a production pipeline uses for
  * shared index artifacts (LSH candidate pairs, PQ codes, connected
  * components): build once, materialize, and let every consumer read
  * the materialized frame instead of re-running the build stage.
  */
final class FrameMemo {
  private val MaxEntries = 8
  private val m =
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame](16, 0.75f, false) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), DataFrame]): Boolean =
        size() > MaxEntries
    }
  def get(s: SparkSession, d: String)(compute: => DataFrame): DataFrame = {
    val k = (s, d)
    val hit = m.synchronized(m.get(k))
    if (hit != null) hit
    else {
      val v = compute // outside the lock: a Spark job runs here
      m.synchronized {
        val again = m.get(k)
        if (again != null) again else { m.put(k, v); v }
      }
    }
  }
}
