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

  test("sim_triangles: strictly ordered triples whose three edges all close") {
    import spark.implicits._
    val tri = SparkEntry.queries("sim_triangles")(spark, sf()).collect()
    assert(tri.nonEmpty, "fixture graph has triangles at threshold 0.25")
    tri.foreach { r =>
      assert(r.getLong(0) < r.getLong(1) && r.getLong(1) < r.getLong(2),
        s"triple not strictly ordered: $r")
    }
    // closure: every edge of every reported triangle is a real edge
    // (recomputed brute-force on the fixture — collect the cell
    // assignment, then pure driver-side Scala pairwise cosine, fully
    // independent of the query's join pipeline), and no triangle is missed
    val cells = Similarity.ivfCells(spark, sf())
      .select($"vec_id", $"v", $"cell").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getLong(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val edges = (for {
      (ia, va, ca) <- cells; (ib, vb, cb) <- cells
      if ca == cb && ia < ib && cos(va, vb) >= 0.25
    } yield (ia, ib)).toSet
    val expected = for {
      (a, b) <- edges.toSeq; (a2, c) <- edges if a2 == a && c > b
      if edges.contains((b, c))
    } yield (a, b, c)
    val got = tri.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected.toSet, "triangle set differs from brute force")
  }

  test("log_transitions: rows are a stochastic matrix over observed pairs") {
    import spark.implicits._
    val tr = SparkEntry.queries("log_transitions")(spark, sf())
    // per-src probabilities sum to 1 (up to 6-dp rounding per cell)
    val sums = tr.groupBy($"src")
      .agg(sum($"p").as("sp"), count(lit(1)).as("k")).collect()
    sums.foreach { r =>
      assert(math.abs(r.getDouble(1) - 1.0) <= r.getLong(2) * 5e-7 + 1e-9,
        s"row ${r.getString(0)} sums to ${r.getDouble(1)}")
    }
    // total transition count == sum over users of (events - 1)
    val totalCnt = tr.agg(sum($"cnt")).head().getLong(0)
    val expected = graft.Tables.t(spark, sf(), "events")
      .groupBy($"user_id").agg((count(lit(1)) - 1).as("m"))
      .agg(sum($"m")).head().getLong(0)
    assert(totalCnt == expected, "transition mass != sum(user events - 1)")
  }
}
