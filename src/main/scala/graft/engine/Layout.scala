package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout tools: bucketing for co-located joins and
  * aggregations (SURVEY.md §7.1 scale stance).
  *
  * At 100 TB the dominant cost of a fact-fact join is the shuffle of
  * both sides. Writing the tables bucketed (and sorted) by the join key
  * makes that shuffle a one-time write-side cost: every subsequent join
  * or aggregation on the bucket key reads co-located buckets and plans
  * with NO Exchange on either side (asserted in BucketedJoinSpec) — the
  * sort-merge join streams bucket-to-bucket. Bucket count is chosen at
  * write time: target ≈ table size / healthy partition size (128-512 MB)
  * and keep it a multiple of the executor count so every core gets
  * buckets.
  */
object Layout {

  /** Write `df` as a bucketed+sorted managed table (Parquet). Both sides
    * of a future join must use the SAME bucket count and key for the
    * exchanges to be elided. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    require(buckets >= 1)
    df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table) // managed: lives under spark.sql.warehouse.dir
  }

  /** Join two same-bucketed tables on their bucket key — plans
    * exchange-free when the bucketing matches. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))

  /** Small-file compaction: rewrite a parquet directory into
    * ceil(totalBytes / targetBytes) files. Long-running ingest (striped
    * writers, streaming micro-batches) accretes thousands of KB-sized
    * files per partition; at 100 TB the resulting scan pays a task per
    * file and the NameNode/listing pays per entry — periodic compaction
    * to 128-512 MB files is routine table maintenance. The rewrite is one
    * round-robin repartition (no key shuffle); file sizing derives from
    * the ACTUAL on-disk byte size, not row counts, so it holds across
    * schema/compression changes.
    *
    * @return number of files written */
  def compact(spark: SparkSession, srcDir: String, dstDir: String,
      targetBytes: Long): Int = {
    require(targetBytes > 0)
    val path = new org.apache.hadoop.fs.Path(srcDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(path)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(srcDir)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(dstDir)
    nFiles
  }
}
