package graft

import java.nio.file.Files

import graft.engine.jobs.WordCountJob

class GraftEngineSpec extends SparkSpec {

  test("store → mapReduce → results, reference REPL flow end-to-end") {
    val wh = Files.createTempDirectory("graft_engine_wh").toString
    val g = GraftEngine(spark, wh)

    val local = Files.createTempFile("graft", ".txt")
    Files.writeString(local, "apple banana apple\nbanana apple cherry\n")
    g.store(local.toString, "fruit.txt")
    assert(g.list() == Seq("fruit.txt"))

    val out = g.mapReduce(WordCountJob, Seq("fruit.txt"))
      .collect().map(_.getString(1)).sorted.toSeq
    assert(out == Seq(
      "apple        ::    3",
      "banana       ::    2",
      "cherry       ::    1"))

    // default file selection = all stored files
    assert(g.mapReduce(WordCountJob).count() == 3)
    // unknown file rejected (cn/mr_actions.go:69-85)
    intercept[IllegalArgumentException] {
      g.mapReduce(WordCountJob, Seq("nope.txt"))
    }
  }

  test("query registry lookup") {
    val g = GraftEngine(spark, Files.createTempDirectory("graft_wh2").toString)
    assert(g.queryNames.contains("q1_pricing_summary"))
    assert(g.query("wc_topk", sf()).count() > 0)
  }
}
