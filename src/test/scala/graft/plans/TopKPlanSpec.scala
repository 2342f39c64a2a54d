package graft.plans

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables.t

class TopKPlanSpec extends SparkSpec {

  import org.apache.spark.sql.expressions.Window

  private def top3DF = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    t(spark, sf(), "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"rn")
      .orderBy($"o_custkey", $"rn")
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame) = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
  }

  test("window+filter row_number<=k pattern plans as TopKPerKeyExec") {
    val plan = finalPlan(top3DF).toString
    assert(plan.contains("TopKPerKey"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("Window"), s"WindowExec still present:\n$plan")
  }

  test("the rewrite fires on the plain SQL surface too (QUALIFY-style text)") {
    // the user-facing parity claim: spark.sql window queries get the
    // same physical rewrite as the DataFrame API — no API-specific path
    t(spark, sf(), "orders").createOrReplaceTempView("orders_v")
    val df = spark.sql(
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders_v) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin)
    val plan = finalPlan(df).toString
    assert(plan.contains("TopKPerKey"), s"SQL-surface rewrite missing:\n$plan")
    assert(df.collect().toSeq == top3DF.collect().toSeq,
      "SQL-surface result differs from the DataFrame pattern")
  }

  test("rewrite result == WindowExec result (rule excluded)") {
    val got = top3DF.collect().toSeq
    spark.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.TopKPerKeyRule")
    try {
      val base = top3DF
      val want = base.collect().toSeq
      assert(finalPlan(base).toString.contains("Window"),
        "exclusion did not restore WindowExec — comparison is vacuous")
      assert(got == want)
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("rn = 1 (argmax per key) also rewrites and matches") {
    import spark.implicits._
    val w = Window.partitionBy($"l_orderkey")
      .orderBy($"l_extendedprice".desc, $"l_linenumber".asc)
    def df = t(spark, sf(), "lineitem")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"l_orderkey", $"l_linenumber")
      .orderBy($"l_orderkey")
    val got = df.collect().toSeq
    assert(finalPlan(df).toString.contains("TopKPerKey"))
    spark.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.TopKPerKeyRule")
    try assert(got == df.collect().toSeq)
    finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("null partition keys group together, matching WindowExec") {
    import spark.implicits._
    val df0 = Seq(
      (Some("a"), 3L), (Some("a"), 1L), (None, 9L), (None, 4L),
      (None, 7L), (Some("b"), 5L)).toDF("k", "v")
    def top2 = {
      val w = Window.partitionBy($"k").orderBy($"v".desc, $"k".asc_nulls_first)
      df0.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
        .select($"k", $"v", $"rn").orderBy($"k".asc_nulls_first, $"rn")
    }
    val got = top2.collect().toSeq
    assert(finalPlan(top2).toString.contains("TopKPerKey"))
    spark.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.TopKPerKeyRule")
    try assert(got == top2.collect().toSeq)
    finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("empty PARTITION BY (global top-N) declines the rewrite and works") {
    import spark.implicits._
    // ClusteredDistribution(Nil) is rejected by Spark's planner — the rule
    // must leave the global-window form alone (vanilla handles it via
    // LimitPushDownThroughWindow)
    val w = Window.orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val df = t(spark, sf(), "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
      .select($"o_orderkey", $"rn")
    val rows = df.collect() // would throw IllegalArgumentException pre-fix
    assert(rows.length == 5)
    assert(rows.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
    assert(!finalPlan(df).toString.contains("TopKPerKey"))
  }

  test("float/double partition keys decline the rewrite (-0.0 vs 0.0)") {
    import spark.implicits._
    val df0 = Seq((0.0, 1L), (-0.0, 2L), (0.0, 3L), (1.5, 4L))
      .toDF("k", "v")
    def top1 = {
      val w = Window.partitionBy($"k").orderBy($"v".desc)
      df0.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"k", $"v").orderBy($"v")
    }
    assert(!finalPlan(top1).toString.contains("TopKPerKey"),
      "rewrite must decline: UnsafeRow grouping splits -0.0 from 0.0")
    // WindowExec normalizes: -0.0 and 0.0 are ONE group → 2 rows not 3
    assert(top1.collect().length == 2)
  }

  test("state is O(k): high-cardinality keys stream group-at-a-time") {
    import spark.implicits._
    // 200k distinct keys × 2 rows; per-key-heap-in-HashMap would hold all
    // 200k heaps — the sort-grouped exec holds one. This is a smoke proof
    // of the bounded-state path (correctness vs WindowExec).
    val n = 200000
    def df = spark.range(n * 2)
      .select(($"id" % n).as("k"), $"id".as("v"))
      .withColumn("rn",
        row_number().over(Window.partitionBy($"k").orderBy($"v".desc)))
      .filter($"rn" <= 1)
    val withRule = df.agg(sum($"v"), count(lit(1))).collect().head
    assert(finalPlan(df).toString.contains("TopKPerKey"))
    spark.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.TopKPerKeyRule")
    try assert(withRule == df.agg(sum($"v"), count(lit(1))).collect().head)
    finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  test("randomized equivalence vs WindowExec: 30 seeded shapes") {
    import spark.implicits._
    val rng = new scala.util.Random(42) // fixed seed — deterministic CI
    (1 to 30).foreach { trial =>
      val nKeys = 1 + rng.nextInt(20)
      val nRows = 1 + rng.nextInt(400)
      val k = 1 + rng.nextInt(6)
      // duplicate order values on purpose: ties exercise heap vs sort
      val rows = Seq.fill(nRows)(
        (rng.nextInt(nKeys).toLong, rng.nextInt(10).toLong, rng.nextInt(1000).toLong))
      val df0 = rows.toDF("key", "ord", "payload")
      def topk = {
        val w = Window.partitionBy($"key")
          .orderBy($"ord".desc, $"payload".asc) // total order: deterministic
        df0.withColumn("rn", row_number().over(w)).filter($"rn" <= k)
          .orderBy($"key", $"rn")
      }
      val got = topk.collect().toSeq
      assert(finalPlan(topk).toString.contains("TopKPerKey"),
        s"trial $trial: rewrite did not fire")
      spark.conf.set("spark.sql.optimizer.excludedRules",
        "graft.plans.TopKPerKeyRule")
      try {
        val base = topk
        val want = base.collect().toSeq
        // guard against a vacuous rewrite-vs-rewrite comparison
        assert(finalPlan(base).toString.contains("Window"),
          s"trial $trial: exclusion did not restore WindowExec")
        assert(got == want, s"trial $trial mismatch " +
          s"(nKeys=$nKeys nRows=$nRows k=$k)")
      } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
  }

  // The DECLARED queries expected to ride the operator — pinned on the
  // executed plan of the exact SparkEntry.queries entries the driver
  // runs, so a silent decline (e.g. a refactor inserting a
  // non-passthrough Project between Filter and Window) falls back to a
  // full WindowExec and FAILS here instead of staying hash-green while
  // voiding the billion-rows-per-key scale claim. Current riders:
  //   doc_sample_stratified  k=10 per source   (PipelineOps.scala)
  //   q_window_top3          k=3 per customer  (Relational.scala)
  //   q_stratified_sample    k=5 per priority  (Relational.scala)
  //   text_keywords          k=3 per doc       (TextAnalysis.scala)
  //   sim_mutual_knn         k=3 per src (one join side; the other is
  //                          native WindowGroupLimit — see PLANS.md)
  //   q_lateral_topk         LIMIT 2 per nation (lateral subquery —
  //                          Spark rewrites to a rank window)
  // Documented non-riders: dedup_canonical (a second window —
  // cluster_size — shares the partition sort, so the single-window
  // rewrite correctly declines), text_tfidf (no rank filter at all).
  private val declaredRiders = Seq(
    "doc_sample_stratified", "q_window_top3", "q_stratified_sample",
    "text_keywords", "sim_mutual_knn", "q_lateral_topk",
    // round-7: the constant-100 pre-cut before the variable per-source
    // cut — the billion-doc-source scale claim rests on this planning
    // as a map-side partial top-k
    "doc_sample_temperature",
    // round-7: k=2 per IVF cell (the cluster-balanced diverse draw)
    "sim_sample_percell",
    // round-8: the constant-100 within-source rank pre-cut of the
    // round-robin interleave — same bounded-shuffle claim as
    // doc_sample_temperature
    "doc_interleave",
    // round-8: top-5 per query of the batched ANN serving shape
    "sim_batch_topk")

  test("declared queries ride TopKPerKeyExec in their EXECUTED plans") {
    declaredRiders.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sf())
      val plan = finalPlan(df).toString
      assert(plan.contains("TopKPerKey"),
        s"$name silently declined the TopKPerKey rewrite:\n$plan")
    }
  }

  test("large k declines the rewrite (falls back to WindowExec)") {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderkey")
    val df = t(spark, sf(), "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5000)
    assert(!finalPlan(df).toString.contains("TopKPerKey"))
  }
}
