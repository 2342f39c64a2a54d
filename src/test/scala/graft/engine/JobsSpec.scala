package graft.engine

import graft.SparkSpec
import graft.engine.jobs.{LogAnalyzerJob, WordCountJob}

class JobsSpec extends SparkSpec {

  // ---- WordCountJob -------------------------------------------------------

  test("wc fMap: lowercase, tokenize, strip; empty-normalized tokens kept") {
    val out = WordCountJob.fMap("f", 0, "The quick --- a+b  Hello, WORLD!").toSeq
    assert(out == Seq(
      "the" -> "1", "quick" -> "1", "" -> "1", "ab" -> "1",
      "hello" -> "1", "world" -> "1"))
  }

  test("wc fMap: blank and whitespace-only lines emit nothing") {
    assert(WordCountJob.fMap("f", 0, "").isEmpty)
    assert(WordCountJob.fMap("f", 0, "   \t ").isEmpty)
  }

  test("wc sumByKey: adjacent-run sums, parse errors skipped") {
    val sorted = Iterator(
      "a" -> "1", "a" -> "junk", "a" -> "2", "b" -> "1", "c" -> "5")
    assert(WordCountJob.sumByKey(sorted).toSeq ==
      Seq("a" -> 3L, "b" -> 1L, "c" -> 5L))
  }

  test("wc fReduce: golden %-12s :: %4d formatting in key order") {
    val out = WordCountJob.fReduce(Iterator(
      "longwordhere" -> "1", "x" -> "1", "x" -> "1")).toSeq
    assert(out == Seq(
      "longwordhere ::    1",
      "x            ::    2"))
  }

  // ---- LogAnalyzerJob: normalize branch coverage (L1-L6) ------------------

  def norm(line: String): Option[(String, String, String)] =
    LogAnalyzerJob.normalize(line.split("\\s+").filter(_.nonEmpty))

  test("log normalize: scheme strip, subdomain strip, port keep (non-numeric)") {
    // >1 dot on a non-digit host drops the first label; ':8080' survives
    // because port-strip only applies to digit-leading hosts (log_analyzer.go:34-42)
    assert(norm("d t googlebot https://a.b.example.com:8080/path/x?q=1#f") ==
      Some(("googlebot", "b.example.com:8080", "path/x")))
  }

  test("log normalize: http scheme, single-dot host untouched") {
    assert(norm("d t bingbot http://example.com/path/y") ==
      Some(("bingbot", "example.com", "path/y")))
  }

  test("log normalize: bare host (no scheme)") {
    assert(norm("d t bot example.org/z") == Some(("bot", "example.org", "z")))
  }

  test("log normalize: numeric host loses port") {
    assert(norm("d t y http://10.0.0.5:9090/beta?x=2") ==
      Some(("y", "10.0.0.5", "beta")))
    assert(norm("d t y http://10.0.0.5/gamma") ==
      Some(("y", "10.0.0.5", "gamma")))
  }

  test("log normalize: query/fragment only stripped at index > 0") {
    assert(norm("d t c http://example.com/?onlyquery") ==
      Some(("c", "example.com", "?onlyquery"))) // '?' at idx 0 → kept
    assert(norm("d t c http://example.com/a?q") ==
      Some(("c", "example.com", "a")))
  }

  test("log normalize: no path, <4 tokens dropped") {
    assert(norm("d t c http://example.com") == Some(("c", "example.com", "")))
    assert(norm("short line") == None)
  }

  test("log fMap key shape: 'crawler domain [path]'") {
    assert(LogAnalyzerJob.fMap("f", 0,
      "d t googlebot https://www.popular.com/page1").toSeq ==
      Seq("googlebot popular.com page1" -> "1"))
    assert(LogAnalyzerJob.fMap("f", 0, "d t c http://example.com").toSeq ==
      Seq("c example.com" -> "1"))
  }

  test("log fReduce: deterministic report with pinned tie-breaks") {
    val part = Iterator(
      "ga a.com p1" -> "1", "ga a.com p1" -> "1", "ga b.com p2" -> "1",
      "gb b.com p2" -> "1", "gb c.com" -> "1")
    val out = LogAnalyzerJob.fReduce(part).toSeq
    // urls: a.comp1, b.comp2 → 2; domains: a.com, b.com, c.com → 3
    assert(out.head == "* Unique URLs:    5")
    assert(out(1) == "* Unique Domains: 3")
    // counts: a.com=2, b.com=2, c.com=1 → tie a.com < b.com
    assert(out(2) == "* Top 3 Websites:")
    assert(out.slice(3, 6) == Seq("    - a.com", "    - b.com", "    - c.com"))
    // crawlers: ga=3, gb=2
    assert(out(6) == "* Top 2 Crawlers:")
    assert(out.slice(7, 9) == Seq("    - ga", "    - gb"))
  }

  test("wc end-to-end golden: partition layout + formatting frozen") {
    val input = MrPipeline.lines(spark, Seq(resource("wordcount_fixture.txt")))
    val got = MrPipeline.run(spark, input, WordCountJob)
      .collect().map(r => s"${r.getInt(0)}\t${r.getString(1)}").sorted.toSeq
    val want = scala.io.Source.fromFile(resource("wordcount_golden.txt"))
      .getLines().toSeq
    assert(got == want)
  }

  test("log end-to-end golden: per-reducer report frozen (L10)") {
    val input = MrPipeline.lines(spark, Seq(resource("crawler_logs.txt")))
    val rows = MrPipeline.run(spark, input, LogAnalyzerJob)
      .collect().map(r => (r.getInt(0), r.getString(1)))
    val got = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .flatMap { case (rid, rs) => rs.map { case (_, l) => s"$rid\t$l" } }
    val want = scala.io.Source.fromFile(resource("loganalyzer_golden.txt"))
      .getLines().toSeq
    assert(got == want)
  }

  test("log end-to-end on crawler fixture: deterministic across runs") {
    val input = MrPipeline.lines(spark, Seq(resource("crawler_logs.txt")))
    val a = MrPipeline.run(spark, input, LogAnalyzerJob).collect().toSeq
    val b = MrPipeline.run(spark, input, LogAnalyzerJob).collect().toSeq
    assert(a.nonEmpty && a.toSet == b.toSet)
  }
}
