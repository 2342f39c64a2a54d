package graft.engine

import java.nio.file.Files

import graft.SparkSpec

class CatalogSpec extends SparkSpec {

  // each test's catalog is detached from the shared session afterwards —
  // an unclosed catalog's activity listener would outlive its test (and
  // every listener fans out on every task end)
  private val opened = scala.collection.mutable.Buffer.empty[Catalog]
  override protected def withFixture(test: NoArgTest) =
    try super.withFixture(test)
    finally { opened.foreach(_.close()); opened.clear() }

  private def freshCatalog(): (Catalog, java.nio.file.Path) = {
    val wh = Files.createTempDirectory("graft_wh")
    val cat = new Catalog(spark, wh.toString)
    opened += cat
    (cat, wh)
  }

  test("store + list + retrieve round-trip") {
    val (cat, _) = freshCatalog()
    val local = Files.createTempFile("graft", ".txt")
    Files.writeString(local, "hello graft\n")
    cat.store(local.toString, "hello.txt")
    assert(cat.list() == Seq("hello.txt"))

    val out = Files.createTempDirectory("graft_out").resolve("back.txt")
    cat.retrieve("hello.txt", out.toString)
    assert(Files.readString(out) == "hello graft\n")
  }

  test("duplicate store rejected (write-once, cn/dfs_actions.go:17-22)") {
    val (cat, _) = freshCatalog()
    val local = Files.createTempFile("graft", ".txt")
    Files.writeString(local, "x")
    cat.store(local.toString, "f.txt")
    intercept[IllegalArgumentException] { cat.store(local.toString, "f.txt") }
  }

  test("retrieve refuses to overwrite local file (cl/dfs_actions.go:305-309)") {
    val (cat, _) = freshCatalog()
    val local = Files.createTempFile("graft", ".txt")
    Files.writeString(local, "x")
    cat.store(local.toString, "f.txt")
    intercept[IllegalArgumentException] { cat.retrieve("f.txt", local.toString) }
  }

  test("delete removes; list sorted; info counts") {
    val (cat, _) = freshCatalog()
    val local = Files.createTempFile("graft", ".txt")
    Files.writeString(local, "abc")
    cat.store(local.toString, "b.txt")
    cat.store(local.toString, "a.txt")
    assert(cat.list() == Seq("a.txt", "b.txt"))
    assert(cat.info()("files") == 2L)
    assert(cat.delete("a.txt"))
    assert(cat.list() == Seq("b.txt"))
    assert(!cat.delete("nope.txt"))
  }

  test("info breaks storage down by type, tables and chunks (S6)") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    val txt = Files.createTempFile("graft", ".txt")
    Files.writeString(txt, "abc")
    val bin = Files.createTempFile("graft", ".bin")
    Files.write(bin, Array[Byte](0, 1, 2, 3, 4))
    cat.store(txt.toString, "a.txt")
    cat.store(bin.toString, "blob.bin")
    cat.storeTable(spark.range(20).select($"id").coalesce(1),
      "tbl", maxRecordsPerFile = 10L)
    val i = cat.info()
    assert(i("files") == 3L)
    assert(i("txt_files") == 1L && i("bin_files") == 1L)
    assert(i("tables") == 1L)
    assert(i("chunks") == 4L, s"1 txt + 1 bin + 2 parquet parts: $i") // 2+2
    assert(i("bytes") > 8L, "chunk bytes include the parquet parts")
  }

  test("flat namespace enforced") {
    val (cat, _) = freshCatalog()
    intercept[IllegalArgumentException] { cat.store("/tmp/x", "sub/dir.txt") }
  }

  test("BIN/TXT sniffing (cl/dfs_actions.go:69-74)") {
    val (cat, _) = freshCatalog()
    val txt = Files.createTempFile("graft", ".txt")
    Files.writeString(txt, "plain utf-8 text\nwith a snowman ☃\n")
    val bin = Files.createTempFile("graft", ".bin")
    Files.write(bin, Array[Byte](0x50, 0x4b, 0x03, 0x04, 0x00, -1, -2))
    val empty = Files.createTempFile("graft", ".e")
    cat.store(txt.toString, "doc.txt")
    cat.store(bin.toString, "blob.bin")
    cat.store(empty.toString, "empty")
    assert(cat.fileType("doc.txt") == "TXT")
    assert(cat.fileType("blob.bin") == "BIN")
    assert(cat.fileType("empty") == "TXT")
    assert(cat.listTxt() == Seq("doc.txt", "empty"))
  }

  test("chunk-size-parameterized store is honored end-to-end") {
    val (cat, _) = freshCatalog()
    val local = Files.createTempFile("graft", ".txt")
    Files.writeString(local, "payload " * 1000)
    cat.store(local.toString, "sized.txt", chunkSizeMb = 1L)
    // content survives the explicit-create path
    val out = Files.createTempDirectory("graft_out").resolve("sized.txt")
    cat.retrieve("sized.txt", out.toString)
    assert(Files.readString(out) == "payload " * 1000)
    intercept[IllegalArgumentException] {
      cat.store(local.toString, "bad.txt", chunkSizeMb = 0L)
    }
  }

  test("storeTable bounds part files via maxRecordsPerFile (S2 chunking)") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    val df = spark.range(100).select($"id").coalesce(1)
    cat.storeTable(df, "tiny_chunks", maxRecordsPerFile = 10L)
    val back = spark.read.parquet(cat.pathOf("tiny_chunks"))
    assert(back.count() == 100L)
    // one writer task, 100 rows, 10 rows/file → 10 part files
    assert(back.inputFiles.length == 10,
      s"expected 10 part files, got ${back.inputFiles.length}")
    intercept[IllegalArgumentException] { cat.storeTable(df, "tiny_chunks") }
  }

  test("verbose list reports per-chunk sizes and block locations (list -v)") {
    import spark.implicits._
    val (cat, _) = freshCatalog()
    val local = Files.createTempFile("graft", ".txt")
    Files.writeString(local, "abc")
    cat.store(local.toString, "raw.txt")
    cat.storeTable(spark.range(20).select($"id").coalesce(1),
      "tbl", maxRecordsPerFile = 10L)
    val v = cat.listVerbose().toMap
    assert(v.keySet == Set("raw.txt", "tbl"))
    val raw = v("raw.txt")
    assert(raw.map(_._1) == Seq("raw.txt") && raw.head._2 == 3L)
    assert(raw.head._3.nonEmpty, "raw file must report block locations")
    val tbl = v("tbl")
    assert(tbl.count(_._1.endsWith(".parquet")) == 2,
      s"expected 2 parquet chunks, got ${tbl.map(_._1)}")
    assert(tbl.forall(_._2 > 0L))
  }

  test("activity metrics count jobs, tasks and busy time (S6)") {
    val (cat, _) = freshCatalog()
    val before = cat.activity()
    assert(before.keySet == Set("requests", "tasks", "busy_ms"))
    // run real work on the catalog's session, then poll: listener
    // delivery is asynchronous
    spark.range(1000000).selectExpr("sum(id * id)").collect()
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    var after = cat.activity()
    while ((after("requests") <= before("requests") ||
        after("tasks") <= before("tasks")) && System.nanoTime() < deadline) {
      Thread.sleep(50)
      after = cat.activity()
    }
    assert(after("requests") > before("requests"), s"jobs: $after")
    assert(after("tasks") > before("tasks"), s"tasks: $after")
    // busy_ms is monotone; a 1M-row agg may still round to 0 ms per
    // task, so only the weaker invariant is pinned
    assert(after("busy_ms") >= before("busy_ms"))
  }

  test("failed store leaves no partial file and frees the name") {
    val (cat, wh) = freshCatalog()
    // a local source path that exists for open() but fails mid-copy is
    // hard to fake portably; instead verify the contract surface: a
    // store that throws BEFORE the rename (missing source) must leave
    // the warehouse clean and a subsequent store of the same name must
    // succeed
    intercept[Exception] {
      cat.store(wh.resolve("does_not_exist.txt").toString, "f.txt")
    }
    assert(cat.list().isEmpty, "failed store must not strand entries")
    assert(cat.info()("files") == 0L)
    val local = Files.createTempFile("graft", ".txt")
    Files.writeString(local, "ok")
    cat.store(local.toString, "f.txt") // name not burned
    assert(cat.list() == Seq("f.txt"))
    // a stranded crash-leftover temp is invisible to the surface
    Files.writeString(
      java.nio.file.Path.of(wh.toString, ".tmp.f.txt.deadbeef"), "junk")
    assert(cat.list() == Seq("f.txt"))
    assert(cat.info()("files") == 1L)
  }

  test("aged stranded staging temps are swept; fresh ones survive") {
    val (cat, wh) = freshCatalog()
    val local = Files.createTempFile("graft", ".txt")
    Files.writeString(local, "x")
    cat.store(local.toString, "f.txt")
    // simulate a crash-stranded temp (invisible, not deletable via the
    // public delete — the reserved prefix is refused there)
    val stale = java.nio.file.Path.of(wh.toString, ".tmp.f.txt.deadbeef")
    Files.writeString(stale, "junk")
    intercept[IllegalArgumentException] { cat.delete(".tmp.f.txt.deadbeef") }
    // fresh temps are an in-flight store's workspace — never swept
    assert(cat.sweepStaging() == 0)
    assert(Files.exists(stale))
    // age it past the threshold → reclaimed
    Files.setLastModifiedTime(stale, java.nio.file.attribute.FileTime
      .fromMillis(System.currentTimeMillis - 7200000L))
    assert(cat.sweepStaging() == 1)
    assert(!Files.exists(stale))
    // store() itself sweeps aged temps for its own name
    Files.writeString(stale, "junk")
    Files.setLastModifiedTime(stale, java.nio.file.attribute.FileTime
      .fromMillis(System.currentTimeMillis - 7200000L))
    cat.delete("f.txt")
    cat.store(local.toString, "f.txt")
    assert(!Files.exists(stale), "store must reclaim its name's aged temps")
  }

  test("publish refuses to replace an existing destination (racing stores)") {
    val (cat, wh) = freshCatalog()
    val a = Files.createTempFile("graft", ".txt")
    Files.writeString(a, "first-writer-wins")
    cat.store(a.toString, "f.txt")
    // a second store of the same name must fail AND leave the first
    // writer's bytes untouched — POSIX rename would silently replace,
    // so the local-fs publish path links instead (fails on EEXIST)
    val b = Files.createTempFile("graft", ".txt")
    Files.writeString(b, "second-writer-must-lose")
    intercept[IllegalArgumentException] { cat.store(b.toString, "f.txt") }
    assert(Files.readString(wh.resolve("f.txt")) == "first-writer-wins")
    assert(cat.list() == Seq("f.txt"), "loser's temp must be cleaned up")
    // the publish primitive itself (what a racer that passed the
    // pre-check would hit): must refuse the occupied name atomically
    // and leave the incumbent's bytes intact
    val tmp = wh.resolve(".tmp.f.txt.racer")
    Files.writeString(tmp, "racer")
    assert(!cat.publishNoReplace(
      new org.apache.hadoop.fs.Path(tmp.toString),
      new org.apache.hadoop.fs.Path(wh.resolve("f.txt").toString)))
    assert(Files.readString(wh.resolve("f.txt")) == "first-writer-wins")
  }

  test("reserved staging prefix rejected as a stored name") {
    val (cat, _) = freshCatalog()
    val local = Files.createTempFile("graft", ".txt")
    Files.writeString(local, "x")
    intercept[IllegalArgumentException] {
      cat.store(local.toString, ".tmp.sneaky")
    }
  }
}
