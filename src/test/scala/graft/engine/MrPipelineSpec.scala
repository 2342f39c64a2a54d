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
}
