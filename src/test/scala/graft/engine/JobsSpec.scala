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

  // ---- JobRunner: M8 admission + file selection (cn/mr_actions.go) --------

  // detach per-test catalogs' activity listeners from the shared session
  private val opened = scala.collection.mutable.Buffer.empty[Catalog]
  override protected def withFixture(test: NoArgTest) =
    try super.withFixture(test)
    finally { opened.foreach(_.close()); opened.clear() }

  private def freshRunner(): (JobRunner, Catalog) = {
    val wh = java.nio.file.Files.createTempDirectory("graft_jobs")
    val cat = new Catalog(spark, wh.toString)
    opened += cat
    (new JobRunner(spark, cat), cat)
  }

  private def storeText(cat: Catalog, name: String, text: String): Unit = {
    val f = java.nio.file.Files.createTempFile("graft_job_in", ".txt")
    java.nio.file.Files.writeString(f, text)
    cat.store(f.toString, name)
  }

  test("M8: empty file list defaults to all stored TXT files, BIN excluded") {
    val (runner, cat) = freshRunner()
    storeText(cat, "a.txt", "x y\n")
    storeText(cat, "b.txt", "y z\n")
    val bin = java.nio.file.Files.createTempFile("graft_job_in", ".bin")
    java.nio.file.Files.write(bin, Array[Byte](0, 1, 2, 3))
    cat.store(bin.toString, "blob.bin")
    val rows = runner.run("wc_default", WordCountJob)
      .collect().map(_.getString(1)).sorted
    // words from BOTH txt files, none from the binary blob
    assert(rows.toSeq == Seq(
      "x            ::    1",
      "y            ::    2",
      "z            ::    1"), s"got ${rows.toSeq}")
  }

  test("M8: explicit lists are TXT-filtered too (cn/mr_actions.go:222)") {
    val (runner, cat) = freshRunner()
    storeText(cat, "a.txt", "x y\n")
    val bin = java.nio.file.Files.createTempFile("graft_job_in", ".bin")
    java.nio.file.Files.write(bin, Array[Byte](0, 1, 2, 3))
    cat.store(bin.toString, "blob.bin")
    // the BIN entry passes the existence check but never feeds a mapper
    val rows = runner.run("wc_explicit", WordCountJob, Seq("a.txt", "blob.bin"))
      .collect().map(_.getString(1)).sorted
    assert(rows.toSeq == Seq(
      "x            ::    1",
      "y            ::    1"), s"got ${rows.toSeq}")
    // an explicit list that is ALL binary is a loud error, not an empty job
    val e = intercept[IllegalArgumentException] {
      runner.run("wc_allbin", WordCountJob, Seq("blob.bin"))
    }
    assert(e.getMessage.contains("no TXT files"))
  }

  test("M8: duplicate names in an explicit list collapse to set semantics") {
    val (runner, cat) = freshRunner()
    storeText(cat, "a.txt", "x y\n")
    // filename_map in the reference is a set (cn/mr_actions.go:85): a
    // repeated name must not double the counts
    val rows = runner.run("wc_dup", WordCountJob, Seq("a.txt", "a.txt"))
      .collect().map(_.getString(1)).sorted
    assert(rows.toSeq == Seq(
      "x            ::    1",
      "y            ::    1"), s"got ${rows.toSeq}")
  }

  test("M8: explicit missing files rejected with the full missing list") {
    val (runner, cat) = freshRunner()
    storeText(cat, "a.txt", "x\n")
    val e = intercept[IllegalArgumentException] {
      runner.run("wc_missing", WordCountJob, Seq("a.txt", "nope1", "nope2"))
    }
    assert(e.getMessage.contains("nope1") && e.getMessage.contains("nope2"))
    assert(!e.getMessage.contains("a.txt"))
  }

  test("M8: no TXT input at all is an error, not an empty success") {
    val (runner, cat) = freshRunner()
    val bin = java.nio.file.Files.createTempFile("graft_job_in", ".bin")
    java.nio.file.Files.write(bin, Array[Byte](0, 1, 2))
    cat.store(bin.toString, "blob.bin")
    val e = intercept[IllegalArgumentException] {
      runner.run("wc_empty", WordCountJob)
    }
    assert(e.getMessage.contains("no TXT files"))
  }

  test("M8: BIN chunks never reach fMap on an all-files job (cn/mr_actions.go:222)") {
    // Verdict r9 ask #7 — stronger than the output-based BIN tests
    // above: instrument fMap itself and prove the mapper NEVER SEES a
    // byte of the stored binary. The BIN payload embeds a text
    // sentinel between null bytes (nulls force the BIN sniff; the
    // sentinel would survive a UTF-8 line decode and be recorded if a
    // BIN chunk ever fed a mapper).
    val (runner, cat) = freshRunner()
    storeText(cat, "a.txt", "alpha beta\n")
    storeText(cat, "b.txt", "beta gamma\n")
    val bin = java.nio.file.Files.createTempFile("graft_job_in", ".bin")
    java.nio.file.Files.write(bin,
      Array[Byte](0, 0) ++ "BINSENTINEL".getBytes("UTF-8") ++
        Array[Byte](0, 0))
    cat.store(bin.toString, "blob.bin")
    assert(cat.fileType("blob.bin") == "BIN", "payload must sniff as BIN")
    JobsSpec.seenLines.clear()
    val rows = runner.run("wc_spy", new JobsSpec.RecordingJob)
      .collect().map(_.getString(1)).sorted
    // the job itself ran over both TXT files...
    assert(rows.toSeq == Seq(
      "alpha        ::    1",
      "beta         ::    2",
      "gamma        ::    1"), s"got ${rows.toSeq}")
    // ...and fMap was fed EXACTLY the TXT lines — no BIN chunk, no
    // sentinel, on any mapper invocation
    val seen = JobsSpec.seenLines.toArray(Array.empty[String]).toSeq
    assert(seen.nonEmpty && seen.forall(l =>
      l == "alpha beta" || l == "beta gamma"),
      s"fMap saw unexpected input: ${seen.filterNot(l =>
        l == "alpha beta" || l == "beta gamma")}")
    assert(!seen.exists(_.contains("BINSENTINEL")),
      "a BIN chunk reached fMap")
  }

  test("M8: duplicate RUNNING job name rejected; name frees on completion") {
    val (runner, cat) = freshRunner()
    storeText(cat, "a.txt", "hello world\n")
    JobsSpec.gate = new java.util.concurrent.CountDownLatch(1)
    JobsSpec.started = new java.util.concurrent.CountDownLatch(1)
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val t = new Thread(() =>
      try runner.run("dup_job", new JobsSpec.GatedJob)
      catch { case e: Throwable => err.set(e) })
    t.start()
    assert(JobsSpec.started.await(30, java.util.concurrent.TimeUnit.SECONDS),
      "first job never reached its map phase")
    // while the first run is still inside its map phase: duplicate rejected
    val dup = intercept[IllegalStateException] {
      runner.run("dup_job", WordCountJob)
    }
    assert(dup.getMessage.contains("dup_job"))
    JobsSpec.gate.countDown()
    t.join(60000)
    assert(!t.isAlive && err.get() == null, s"first run failed: ${err.get()}")
    // completed: the name is free again
    val again = runner.run("dup_job", WordCountJob)
    assert(again.count() > 0)
  }

  test("registry: register/submit by name runs through admission") {
    val (runner, cat) = freshRunner()
    storeText(cat, "a.txt", "x y y\n")
    val reg = JobRegistry.withBuiltins(runner)
    assert(reg.names == Seq("log_analyzer", "word_count"))
    // submit by name, reference-REPL style: `mr word_count a.txt`
    val rows = reg.submit("word_count", Seq("a.txt"))
      .collect().map(_.getString(1)).sorted
    assert(rows.toSeq == Seq(
      "x            ::    1",
      "y            ::    2"), s"got ${rows.toSeq}")
    // empty file list defaults to all stored TXT (the admission path's
    // behavior — registration must not bypass it)
    assert(reg.submit("word_count").count() > 0)
  }

  test("registry: unknown name is a loud error naming the known jobs") {
    val (runner, _) = freshRunner()
    val reg = JobRegistry.withBuiltins(runner)
    val e = intercept[NoSuchElementException] { reg.submit("nope") }
    assert(e.getMessage.contains("nope") &&
      e.getMessage.contains("word_count"))
  }

  test("registry: re-register replaces (O_TRUNC semantics); unregister frees") {
    val (runner, cat) = freshRunner()
    storeText(cat, "a.txt", "x\n")
    val reg = new JobRegistry(runner)
    reg.register("j", WordCountJob)
    // overwrite with a job that emits a sentinel — the LATEST wins,
    // like the reference's plugin-file re-upload
    reg.register("j", new graft.engine.MrJob {
      def R = 1
      def fMap(f: String, n: Long, l: String) = Iterator(("sentinel", "1"))
      def fReduce(p: Iterator[(String, String)]) = p.map(_._1).distinct
    })
    val out = reg.submit("j", Seq("a.txt")).collect().map(_.getString(1))
    assert(out.toSeq == Seq("sentinel"))
    assert(reg.unregister("j") && !reg.unregister("j"))
    intercept[NoSuchElementException] { reg.submit("j") }
  }

  test("registry: admission still rejects missing files and dup runs") {
    val (runner, cat) = freshRunner()
    storeText(cat, "a.txt", "x\n")
    val reg = JobRegistry.withBuiltins(runner)
    val e = intercept[IllegalArgumentException] {
      reg.submit("word_count", Seq("a.txt", "ghost.txt"))
    }
    assert(e.getMessage.contains("ghost.txt"))
    // duplicate RUNNING name via the registry: same JobRunner guard
    JobsSpec.gate = new java.util.concurrent.CountDownLatch(1)
    JobsSpec.started = new java.util.concurrent.CountDownLatch(1)
    reg.register("gated", new JobsSpec.GatedJob)
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val t = new Thread(() =>
      try reg.submit("gated", Seq("a.txt"))
      catch { case x: Throwable => err.set(x) })
    t.start()
    assert(JobsSpec.started.await(30, java.util.concurrent.TimeUnit.SECONDS))
    intercept[IllegalStateException] { reg.submit("gated", Seq("a.txt")) }
    JobsSpec.gate.countDown()
    t.join(60000)
    assert(!t.isAlive && err.get() == null, s"gated run failed: ${err.get()}")
  }
}

object JobsSpec {
  // JVM-static latches: reachable from executor threads in local mode
  @volatile var gate: java.util.concurrent.CountDownLatch = _
  @volatile var started: java.util.concurrent.CountDownLatch = _

  // JVM-static recorder for the BIN-exclusion spy (local mode: executor
  // threads share the JVM, so every fMap call lands here)
  val seenLines = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** WordCountJob that records every line handed to fMap. */
  class RecordingJob extends graft.engine.MrJob {
    def R: Int = 2
    def fMap(file: String, lineNo: Long, line: String): Iterator[(String, String)] = {
      seenLines.add(line)
      graft.engine.jobs.WordCountJob.fMap(file, lineNo, line)
    }
    def fReduce(partition: Iterator[(String, String)]): Iterator[String] =
      graft.engine.jobs.WordCountJob.fReduce(partition)
  }

  /** WordCountJob that parks its first map call until released — lets the
    * duplicate-admission test hold a job in the RUNNING state. */
  class GatedJob extends graft.engine.MrJob {
    def R: Int = 2
    def fMap(file: String, lineNo: Long, line: String): Iterator[(String, String)] = {
      started.countDown()
      gate.await(30, java.util.concurrent.TimeUnit.SECONDS)
      graft.engine.jobs.WordCountJob.fMap(file, lineNo, line)
    }
    def fReduce(partition: Iterator[(String, String)]): Iterator[String] =
      graft.engine.jobs.WordCountJob.fReduce(partition)
  }
}
