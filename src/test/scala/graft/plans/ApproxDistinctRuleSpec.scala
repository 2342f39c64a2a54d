package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables.t

/** The approx-distinct session dial: default off (bit-exact plans
  * untouched), on = every single-column count(DISTINCT) becomes an
  * HLL++ estimate — including plain SQL strings — while multi-column
  * distincts stay exact. */
class ApproxDistinctRuleSpec extends SparkSpec {

  private def withFlag[T](on: Boolean)(f: => T): T = {
    spark.conf.set("spark.graft.approxDistinct", on.toString)
    try f finally spark.conf.unset("spark.graft.approxDistinct")
  }

  test("flag off: count(DISTINCT) plans and stays exact") {
    import spark.implicits._
    val df = t(spark, sf(), "events")
      .groupBy($"event_type").agg(countDistinct($"user_id").as("u"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("approx_count_distinct"), "rewrote without opt-in")
    val exact = t(spark, sf(), "events")
      .select($"event_type", $"user_id").distinct()
      .groupBy($"event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exact, "exact path must be exact")
  }

  test("flag on: count(DISTINCT) rewrites to HLL++ and estimates within 5%") {
    import spark.implicits._
    withFlag(on = true) {
      val df = t(spark, sf(), "events")
        .groupBy($"event_type").agg(countDistinct($"user_id").as("u"))
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("approx_count_distinct"),
        s"no HLL++ rewrite in:\n$plan")
      val exact = t(spark, sf(), "events")
        .select($"event_type", $"user_id").distinct()
        .groupBy($"event_type").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      df.collect().foreach { r =>
        val (ty, est) = (r.getString(0), r.getLong(1))
        val ex = exact(ty)
        assert(math.abs(est - ex) <= math.max(1L, (ex * 0.05).toLong),
          s"$ty: estimate $est vs exact $ex")
      }
    }
  }

  test("flag on: plain spark.sql strings get the rewrite too") {
    t(spark, sf(), "events").createOrReplaceTempView("adr_events")
    withFlag(on = true) {
      val df = spark.sql(
        "SELECT COUNT(DISTINCT user_id) AS u FROM adr_events")
      assert(df.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct"))
      assert(df.head().getLong(0) > 0)
    }
  }

  test("flag on: multi-column count(DISTINCT a, b) stays exact") {
    import spark.implicits._
    withFlag(on = true) {
      val df = t(spark, sf(), "events")
        .agg(countDistinct($"user_id", $"event_type").as("u"))
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("approx_count_distinct"),
        "multi-column distinct must not rewrite (no single-sketch form)")
      val exact = t(spark, sf(), "events")
        .select($"user_id", $"event_type").distinct().count()
      assert(df.head().getLong(0) == exact)
    }
  }
}
