package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** PageRank invariants the value-hash oracle cannot express: mass
  * conservation bounds and the uniform-teleport floor. */
class GraphSpec extends SparkSpec {

  test("log_pagerank: ranks respect the teleport floor and mass bound") {
    import spark.implicits._
    val pr = SparkEntry.queries("log_pagerank")(spark, sf())
    val n = pr.count()
    assert(n > 0)
    // every node receives at least the teleport share 0.15/N
    val floor = 0.15 / n - 1e-9
    assert(pr.filter($"pr" < floor).count() == 0, "node below teleport floor")
    // dangling mass is dropped, never created: total rank stays <= 1
    val total = pr.agg(sum($"pr")).head().getDouble(0)
    assert(total <= 1.0 + 1e-6, s"rank mass exceeds 1: $total")
    assert(total >= 0.15, s"teleport mass lost: $total")
    // transitions concentrate rank: some node must sit above uniform
    assert(pr.filter($"pr" > 1.0 / n).count() > 0, "no concentration")
  }
}
