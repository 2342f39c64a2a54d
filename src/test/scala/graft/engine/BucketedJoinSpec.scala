package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables.t

/** Co-located (bucketed) joins and aggregations: the write-once
  * shuffle-never layout for 100 TB fact-fact joins. The assertions pin
  * the PLAN (no ShuffleExchange on the bucketed sides), not just the
  * result — a silent bucketing mismatch would re-introduce the shuffle
  * without changing any output.
  */
class BucketedJoinSpec extends SparkSpec {

  private def shuffleCount(plan: org.apache.spark.sql.execution.SparkPlan): Int =
    plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.size

  test("same-bucketed fact tables join with zero shuffle exchanges") {
    import spark.implicits._
    Layout.writeBucketed(t(spark, sf(), "orders"), "b_orders", "o_orderkey", 4)
    Layout.writeBucketed(t(spark, sf(), "lineitem"), "b_lineitem", "l_orderkey", 4)
    // force the merge-join path (a broadcast would trivially avoid the
    // exchange and prove nothing about the bucket layout); AQE off so
    // the plan tree is inspectable without unwrapping query stages
    withSqlConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
      val p = spark.table("b_lineitem")
        .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
        .queryExecution.executedPlan
      assert(shuffleCount(p) == 0, s"bucketed join still shuffles:\n$p")
      assert(p.toString.contains("SortMergeJoin"))
    }
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")

    // same rows as the plain (shuffling) join
    val expected = t(spark, sf(), "lineitem")
      .join(t(spark, sf(), "orders"), $"l_orderkey" === $"o_orderkey").count()
    assert(joined.count() == expected)
  }

  test("aggregation on the bucket key plans without a shuffle") {
    import spark.implicits._
    // b_lineitem written by the join test; groupBy on the bucket key
    // consumes the bucketed distribution directly
    withSqlConf("spark.sql.adaptive.enabled" -> "false") {
      val p = spark.table("b_lineitem")
        .groupBy($"l_orderkey").agg(count(lit(1)).as("n"))
        .queryExecution.executedPlan
      assert(shuffleCount(p) == 0, s"bucket-key aggregation still shuffles:\n$p")
    }
    val agg = spark.table("b_lineitem")
      .groupBy($"l_orderkey").agg(count(lit(1)).as("n"))
    assert(agg.count() ==
      t(spark, sf(), "lineitem").select($"l_orderkey").distinct().count())
  }

  test("mismatched bucket counts fall back to a correct shuffling join") {
    import spark.implicits._
    Layout.writeBucketed(t(spark, sf(), "orders"), "b_orders8", "o_orderkey", 8)
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders8"), $"l_orderkey" === $"o_orderkey")
    val expected = t(spark, sf(), "lineitem")
      .join(t(spark, sf(), "orders"), $"l_orderkey" === $"o_orderkey").count()
    assert(joined.count() == expected)
  }

  test("compaction rewrites a many-small-file dir into sized files") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_compact")
    val (src, dst) = (s"$root/src", s"$root/dst")
    val df = t(spark, sf(), "events")
    df.repartition(64).write.parquet(src) // simulate micro-batch litter
    def files(d: String) = new java.io.File(d).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).toSeq
    assert(files(src).size == 64)

    val target = files(src).map(_.length).sum / 4 // aim for ~4 files
    val n = Layout.compact(spark, src, dst, target)
    assert(files(dst).size == n && n <= 5, s"wrote ${files(dst).size} files")
    // content unchanged
    assert(spark.read.parquet(dst).orderBy($"event_id").collect().toSeq ==
      df.orderBy($"event_id").collect().toSeq)
  }

  private def withSqlConf[A](pairs: (String, String)*)(f: => A): A = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
