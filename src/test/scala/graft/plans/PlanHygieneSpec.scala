package graft.plans

import graft.{SparkEntry, SparkSpec}

/** Scale-hygiene guard over the ENTIRE declared-query inventory: no query
  * may plan a cartesian product or a broadcast nested-loop join — the two
  * shapes that silently turn a 100 TB query into an O(n²) job. Runs on
  * the optimized logical + initial physical plan (no execution), so it is
  * cheap enough to sweep all queries and will trip on any future query
  * whose join condition quietly stops being an equi-join. */
class PlanHygieneSpec extends SparkSpec {

  // BroadcastNestedLoopJoin is legitimate ONLY as a scalar broadcast: a
  // crossJoin against a 1-row aggregate (corpus mean, query vector,
  // centroid set) — constant-size build side at any data scale. Every
  // entry here must be that shape; anything new that BNLJs is a bug.
  private val scalarBroadcastOk = Set(
    "q_above_avg_customers", // 1-row global avg
    "sim_cosine_topk",       // 1-row query vector
    "sim_ivf_assign",        // fixed k-row centroid table
    "sim_ivf_topk",          // 1-row query vector + centroid probe
    "sim_lsh_sigs",          // 1-row hyperplane matrix
    "sim_lsh_topk",          // 1-row hyperplane matrix + 1-row query sig
    "text_tfidf")            // 1-row corpus doc count

  test("no declared query plans a cartesian or nested-loop join") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf()).queryExecution.executedPlan.toString
        val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
          .filter(plan.contains)
          .filterNot(_ == "BroadcastNestedLoopJoin" && scalarBroadcastOk(name))
        if (bad.nonEmpty) Some(s"$name: ${bad.mkString(", ")}") else None
    }
    assert(offenders.isEmpty,
      s"quadratic join shapes in declared queries:\n${offenders.mkString("\n")}")
  }

  test("no declared query plans a driver-side collect limit over raw data") {
    // CollectLimit on a huge child is fine (top-k), but a query whose
    // ROOT is CollectLimit with no preceding exchange/sort would pull
    // unordered raw rows to the driver. All declared queries end in a
    // total ORDER BY, so the root must be a Sort/TakeOrdered, never a
    // bare CollectLimit.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf()).queryExecution.executedPlan.toString
        if (plan.linesIterator.take(2).exists(_.contains("CollectLimit")))
          Some(name)
        else None
    }
    assert(offenders.isEmpty,
      s"unordered driver-side collect at query root:\n${offenders.mkString("\n")}")
  }
}
