package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * Every declared query receives `(spark, sfDir)` and reads tables through
  * here so the parquet scan stays a plain `FileSourceScanExec` that Catalyst
  * can push filters/projections into (verified via `.explain("formatted")`
  * in the specs).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Plan memoization: re-reading the same table re-lists files and
  // re-reads footers; with 50+ queries per Verify/Bench run that fixed
  // cost dominates small scale factors. Weak keys can't work here — the
  // cached DataFrames strongly reference their session, so a weak-keyed
  // map would never evict. Instead the cache is explicitly bounded to the
  // few most-recent sessions (Verify/Bench/tests use 1-2), evicting in
  // session-creation (FIFO) order; a stopped session is retained only
  // until pushed out. Concurrency: the hot path (session present) is a
  // lock-free ConcurrentHashMap read — no global lock is ever held while
  // load() runs (file listing + footer reads), and concurrent first-reads
  // of DIFFERENT tables proceed in parallel via the inner map's
  // per-bin computeIfAbsent. The small `order` lock is taken only on a
  // session miss (a handful of times per JVM). Testdata dirs are
  // immutable (TESTDATA.md), so cached listings never go stale.
  private type Inner =
    java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]
  private val MaxSessions = 4
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, Inner]()
  private val order = new java.util.ArrayDeque[SparkSession]()

  private def innerFor(spark: SparkSession): Inner = {
    val hit = cache.get(spark)
    if (hit != null) hit
    else order.synchronized {
      val again = cache.get(spark) // raced: another thread registered it
      if (again != null) again
      else {
        val created = new Inner()
        cache.put(spark, created)
        order.addLast(spark)
        while (order.size > MaxSessions) cache.remove(order.removeFirst())
        created
      }
    }
  }

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    innerFor(spark).computeIfAbsent((dir, name), _ => load(spark, dir, name))

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df =
      if (name == "events") {
        // The driver's events.ts has shipped as parquet TIMESTAMP(NANOS)
        // (which Spark 4 refuses to read natively) and, since the round-7
        // data refresh, as TIMESTAMP(MICROS) with isAdjustedToUTC=false
        // (which Spark reads as TIMESTAMP_NTZ). Normalize the nanos era
        // here; the NTZ case falls through to the uniform pass below —
        // the whole events family extracts epochs via unix_micros(),
        // which rejects NTZ outright (the round-6 11-query failure
        // cluster).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = spark.read.parquet(s"$dir/$name.parquet")
        raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType => // nanos-as-long era
            raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          case _ => raw
        }
      } else spark.read.parquet(s"$dir/$name.parquet")
    // Uniform NTZ→TIMESTAMP normalization for EVERY table (r7 verdict
    // ask #3): orders.o_orderdate / lineitem.l_shipdate also read NTZ
    // after the testdata refresh, and leaving them NTZ is the same
    // latent class that detonated 11 queries in round 6 — one future
    // unix_micros-style expression in the relational family would
    // re-trip it. Under the UTC session timezone the cast is
    // value-preserving and identical to DuckDB's reading of the file.
    val ntz = df.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.TimestampNTZType =>
        f.name
    }
    ntz.foldLeft(df)((acc, c) => acc.withColumn(c, col(c).cast("timestamp")))
  }
}
