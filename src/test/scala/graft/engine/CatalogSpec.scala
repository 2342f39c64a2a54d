package graft.engine

import java.nio.file.Files

import graft.SparkSpec

class CatalogSpec extends SparkSpec {

  private def freshCatalog(): (Catalog, java.nio.file.Path) = {
    val wh = Files.createTempDirectory("graft_wh")
    (new Catalog(spark, wh.toString), wh)
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

  test("flat namespace enforced") {
    val (cat, _) = freshCatalog()
    intercept[IllegalArgumentException] { cat.store("/tmp/x", "sub/dir.txt") }
  }
}
