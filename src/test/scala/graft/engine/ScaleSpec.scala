package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables.t

/** Scale-mechanism demos pinned by tests: salted skew joins and bucketed
  * co-located joins — the two plan-level levers the 100 TB design rules
  * call for beyond AQE defaults. */
class ScaleSpec extends SparkSpec {

  test("saltedJoin == plain join on a skewed key distribution") {
    import spark.implicits._
    // 10k rows of one hot key + a long tail, joined to a small dim
    val big = spark.range(10000).select(
      when($"id" < 9000, lit(7)).otherwise($"id" % 50).cast("long").as("k"),
      ($"id" * 31 % 1000).as("payload"))
    val dim = spark.range(50).select($"id".as("k"), concat(lit("d"), $"id").as("name"))

    val plain = big.join(dim, "k")
    val salted = Skew.saltedJoin(big, dim, "k", salts = 8)

    assert(salted.count() == plain.count())
    assert(salted.select("k", "payload", "name").except(
      plain.select("k", "payload", "name")).isEmpty)
    assert(plain.select("k", "payload", "name").except(
      salted.select("k", "payload", "name")).isEmpty)
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    import spark.implicits._
    // one hot key carrying ~20 MB against a tiny tail: with the skew
    // thresholds lowered, AQE must replan the SMJ with isSkewJoin=true
    // (the hot partition is split across tasks instead of one straggler)
    val pad = "x" * 100
    val big = spark.range(200000).select(
      when($"id" < 190000, lit(7L)).otherwise($"id" % 50).as("k"),
      concat(lit(pad), $"id").as("payload"))
    val right = spark.range(2000).select(($"id" % 50).as("k"),
      concat(lit("r"), $"id").as("rv"))
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val olds = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = big.join(right, "k")
      // run THIS dataset's own QueryExecution: a .write or .count builds
      // a separate one, leaving this AdaptiveSparkPlanExec unexecuted
      // (its executedPlan would still be the initial, un-replanned tree)
      joined.queryExecution.toRdd.count()
      val fin = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p                        => p
      }
      // plan.collect does not descend into materialized query stages
      // (QueryStageExec keeps its subtree in `plan`, not `children`)
      def smjsIn(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.joins.SortMergeJoinExec] =
        p match {
          case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
            j +: j.children.flatMap(smjsIn)
          case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            smjsIn(qs.plan)
          case other => other.children.flatMap(smjsIn)
        }
      val smjs = smjsIn(fin)
      assert(smjs.nonEmpty, s"expected a sort-merge join:\n$fin")
      assert(smjs.exists(_.isSkewJoin),
        s"AQE did not mark the join skew-handled:\n$fin")
      // and the runtime replan changed nothing semantically
      assert(joined.count() == 190000L * 40 + 10000L * 40)
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed tables co-locate the join: no shuffle on the join key") {
    import spark.implicits._
    val li = t(spark, sf(), "lineitem").select($"l_orderkey", $"l_quantity")
    val ord = t(spark, sf(), "orders").select($"o_orderkey", $"o_totalprice")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), $"l_orderkey" === $"o_orderkey")
      joined.collect()
      val fin = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p                        => p
      }
      val shuffles = fin.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty,
        s"bucketed join should not shuffle, got:\n$fin")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("AQE coalesces tiny shuffle partitions at runtime") {
    import spark.implicits._
    import org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec
    // The flip side of the skew split: when an aggregation's shuffle
    // output is tiny, AQE must merge the configured partitions into
    // fewer reads instead of scheduling near-empty tasks — at 100 TB
    // with thousands of shuffle partitions configured, final-stage
    // fan-in depends on it. Drive the dataset's OWN toRdd so the
    // adaptive plan is final (ScaleSpec lesson: .count() builds a
    // separate QueryExecution).
    val df = t(spark, sf(), "orders")
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
    df.queryExecution.toRdd.count()
    val fin = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    // plan.collect does not descend into QueryStageExec (its subtree is
    // in `.plan`, not `children`) — recurse manually
    def readsIn(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[AQEShuffleReadExec] = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        readsIn(q.plan)
      case r: AQEShuffleReadExec => r +: r.children.flatMap(readsIn)
      case other => other.children.flatMap(readsIn)
    }
    val reads = readsIn(fin)
    assert(reads.nonEmpty, s"no AQE shuffle read in:\n$fin")
    assert(reads.exists(_.partitionSpecs.size <
        spark.conf.get("spark.sql.shuffle.partitions").toInt),
      s"5-row aggregate kept all shuffle partitions:\n$fin")
  }

  test("runtime bloom filter prunes the big side of a selective shuffle join") {
    import spark.implicits._
    // At 100 TB a fact-to-filtered-dim shuffle join must not shuffle the
    // unmatched fact rows: Spark's InjectRuntimeFilter builds a bloom
    // filter on the selective (creation) side and pushes
    // bloom_filter_might_contain into the fact scan. Pin that the
    // injection actually fires for our join shape (thresholds lowered —
    // at test scale the fact side is below the 10 GB default) and that
    // pruning is semantics-preserving.
    val overrides = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = overrides.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      overrides.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = t(spark, sf("sf0.01"), "lineitem")
        .select($"l_orderkey", $"l_quantity")
      val ord = t(spark, sf("sf0.01"), "orders")
        .filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey")
      val q = li.join(ord, $"l_orderkey" === $"o_orderkey")
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain") && opt.contains("bloom_filter_agg"),
        s"runtime bloom filter was not injected into the fact side:\n$opt")
      val n = q.count()

      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val n0 = li.join(ord, $"l_orderkey" === $"o_orderkey").count()
      assert(n == n0, s"bloom pruning changed the result: $n vs $n0")
    } finally {
      saved.foreach { case (k, vo) =>
        vo.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
    }
  }
}
