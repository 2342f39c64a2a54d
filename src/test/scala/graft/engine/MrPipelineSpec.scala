package graft.engine

import graft.SparkSpec
import graft.engine.jobs.WordCountJob

class MrPipelineSpec extends SparkSpec {

  test("FirstBytePartitioner: range, case folding, Go semantics") {
    for (r <- Seq(1, 10, 26); k <- Seq("apple", "Zebra", "0day", "émile", "~", ""))
      assert(FirstBytePartitioner.of(k, r) >= 0 &&
        FirstBytePartitioner.of(k, r) < r, s"key=$k r=$r")
    // int(lower('A')) % 26 == 97 % 26
    assert(FirstBytePartitioner.of("Apple", 26) == 97 % 26)
    assert(FirstBytePartitioner.of("apple", 26) == 97 % 26)
    assert(FirstBytePartitioner.of("zulu", 10) == 122 % 10)
    // reference keys carry Sprintln's newline: empty token ⇒ "\n" ⇒ 10
    assert(FirstBytePartitioner.of("", 26) == 10 % 26)
    // raw first UTF-8 byte; only the 1-byte slice is lowered (Go
    // ToLower(key[0:1]) leaves an invalid lead byte unchanged)
    assert(FirstBytePartitioner.of("émile", 26) == (0xc3 % 26))
    // U+0400 'Ѐ' lowers to U+0450 as a full string (D0→D1) but the Go
    // byte-slice semantics keep the raw D0 lead byte
    assert(FirstBytePartitioner.of("Ѐx", 26) == (0xd0 % 26))
  }

  test("lines(): per-file 0-based line numbers in file order") {
    val ds = MrPipeline.lines(spark, Seq(resource("wordcount_fixture.txt")))
    val rows = ds.collect().sortBy(_.lineNo)
    val raw = scala.io.Source.fromFile(resource("wordcount_fixture.txt"))
      .getLines().toArray
    assert(rows.length == raw.length)
    assert(rows.map(_.lineNo).toSeq == rows.indices.map(_.toLong))
    rows.zip(raw).foreach { case (got, want) => assert(got.line == want) }
  }

  test("shuffle: every key lands in its first-byte partition, sorted") {
    import spark.implicits._
    val input = MrPipeline.lines(spark, Seq(resource("wordcount_fixture.txt")))
    val r = 7
    val parts = MrPipeline.shuffled(MrPipeline.mapped(input, WordCountJob), r)
      .mapPartitionsWithIndex { (pid, it) => Iterator((pid, it.toSeq)) }
      .collect()
    assert(parts.length == r)
    for ((pid, kvs) <- parts) {
      kvs.foreach { case (k, _) =>
        assert(FirstBytePartitioner.of(k, r) == pid, s"key '$k' in partition $pid")
      }
      assert(kvs == kvs.sorted, s"partition $pid not sorted")
    }
  }

  test("pipeline word count == naive single-threaded count") {
    import spark.implicits._
    val input = MrPipeline.lines(spark, Seq(resource("wordcount_fixture.txt")))
    val got = MrPipeline.shuffled(MrPipeline.mapped(input, WordCountJob), WordCountJob.R)
      .mapPartitions(WordCountJob.sumByKey(_))
      .collect().toMap

    val naive = scala.io.Source.fromFile(resource("wordcount_fixture.txt"))
      .getLines()
      .flatMap(l => WordCountJob.fMap("f", 0L, l))
      .toSeq.groupBy(_._1).map { case (k, vs) => k -> vs.size.toLong }
    assert(got == naive)
    assert(got.values.sum ==
      scala.io.Source.fromFile(resource("wordcount_fixture.txt"))
        .getLines().flatMap(_.split("\\s+")).count(_.nonEmpty))
  }

  test("run(): reducer ids cover [0, R) and output is deterministic") {
    val input = MrPipeline.lines(spark, Seq(resource("wordcount_fixture.txt")))
    val df1 = MrPipeline.run(spark, input, WordCountJob).collect().toSeq
    val df2 = MrPipeline.run(spark, input, WordCountJob).collect().toSeq
    assert(df1.toSet == df2.toSet)
    assert(df1.map(_.getInt(0)).forall(r => r >= 0 && r < WordCountJob.R))
  }

  test("non-UTF-8 input bytes survive the full pipeline: stable partitions, multiset preserved") {
    // a file of deliberately invalid UTF-8 (verdict r12 ask #9): lone
    // continuation bytes, never-valid leads, truncated multi-byte
    // sequences — deterministic layout, no generator needed here (the
    // byte-class sweep lives in EngineProps; this drives a REAL file
    // through lines() → map → first-byte shuffle → reduce)
    val bad = java.nio.file.Files.createTempFile("graft_rawbytes", ".txt")
    val lines: Seq[Array[Byte]] = Seq(
      Array(0x80, 0x81, 0xbf),                   // lone continuations
      Array(0xc0, 0xaf),                         // overlong slash
      Array(0xc3),                               // truncated 2-byte lead
      Array(0xe4, 0xb8),                         // truncated 3-byte lead
      Array(0xf0, 0x9f),                         // truncated 4-byte lead
      Array(0xff, 0xfe, 0x20, 0x41),             // never-valid + ascii
      "plain ascii line".getBytes("UTF-8").map(_.toInt),
      Array(0xe4, 0xb8, 0xad)                    // VALID 3-byte CJK
    ).map(_.map(_.toByte))
    val out = java.nio.file.Files.newOutputStream(bad)
    try lines.foreach { l => out.write(l); out.write('\n') }
    finally out.close()

    // identity-ish job: key = the whole decoded line, value = "1";
    // reduce re-emits every (key, count) so nothing can hide in a fold
    object RawJob extends MrJob {
      val R = 7
      def fMap(file: String, lineNo: Long, line: String) =
        Iterator((line, "1"))
      def fReduce(it: Iterator[(String, String)]) =
        it.toSeq.groupBy(_._1).toSeq.sortBy(_._1)
          .iterator.map { case (k, vs) => s"$k ${vs.size}" }
    }
    val input = MrPipeline.lines(spark, Seq(bad.toString))
    val run1 = MrPipeline.run(spark, input, RawJob).collect().toSeq
    val run2 = MrPipeline.run(spark, input, RawJob).collect().toSeq
    // partition stability: byte-identical rows, reducer ids included
    assert(run1.nonEmpty && run1.toSet == run2.toSet)
    // multiset preservation: per-line counts equal the decoded input's
    // (keys may contain spaces — split at the LAST one)
    def parseRow(s: String): (String, Long) = {
      val i = s.lastIndexOf(' ')
      s.substring(0, i) -> s.substring(i + 1).toLong
    }
    val got = run1.map(r => parseRow(r.getString(1))).toMap
    val want = lines
      .map(b => new String(b, java.nio.charset.StandardCharsets.UTF_8))
      .groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    assert(got == want,
      s"multiset diverged: only-got=${got.keySet -- want.keySet} " +
        s"only-want=${want.keySet -- got.keySet}")
    // every reducer id obeys the first-byte rule for its keys
    run1.foreach { r =>
      val key = parseRow(r.getString(1))._1
      assert(r.getInt(0) == FirstBytePartitioner.of(key, RawJob.R))
    }
  }
}
