package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persistable ANN index contract: save → load → search is
  * bit-identical to searching the freshly built assignment; the
  * on-disk layout prunes probes to their cells at the scan; and every
  * corruption class (no manifest, version skew, truncated data) fails
  * loudly at load, never at query time. */
class AnnIndexStoreSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_annidx").toString
    AnnIndexStore.save(spark, sf(), d)
    d
  }

  private def queries3 = {
    import spark.implicits._
    graft.Tables.t(spark, sf(), "embeddings")
      .select($"vec_id".as("q_id"),
        $"embedding".cast("array<double>").as("q"))
      .filter($"q_id" % 97 === 0)
  }

  test("manifest records the real geometry") {
    val m = AnnIndexStore.manifest(dir)
    assert(m.version == AnnIndexStore.Version)
    assert(m.dim == 64 && m.n_vectors > 0 && m.k >= 8)
    assert(m.n_vectors == graft.Tables.t(spark, sf(), "embeddings").count())
  }

  test("save -> load -> search equals searching the fresh build") {
    import spark.implicits._
    val loaded = AnnIndexStore.load(spark, dir)
    val fresh = graft.queries.Similarity.ivfCells(spark, sf())
    // the artifact IS the assignment
    assert(loaded.select($"vec_id", $"cell").collect().map(_.toSeq).toSet ==
      fresh.select($"vec_id", $"cell").collect().map(_.toSeq).toSet)
    def run(idx: org.apache.spark.sql.DataFrame): Seq[String] =
      AnnIndexStore.searchTopK(spark, idx, queries3, k = 5)
        .collect().map(_.mkString("|")).sorted.toSeq
    val a = run(loaded)
    val b = run(fresh)
    assert(a.nonEmpty && a == b, "loaded-index search != fresh-index search")
    // rank 1 of a corpus vector must score a rounded cosine of 1.0 —
    // itself, or a 4dp-tied twin with a smaller id (the fixture has
    // vectors whose cosine rounds to 1.0000; ties break by vec_id)
    val self = AnnIndexStore.searchTopK(spark, loaded, queries3, k = 1)
      .select($"q_id", $"sim").collect()
    assert(self.nonEmpty && self.forall(_.getDouble(1) == 1.0),
      "a corpus vector's top-1 must score rounded cosine 1.0")
  }

  test("probing filters prune partitions at the scan") {
    import spark.implicits._
    val cell0 = AnnIndexStore.load(spark, dir)
      .select(min($"cell")).collect()(0).getLong(0)
    val plan = spark.read.parquet(s"$dir/cells")
      .filter($"cell" === cell0)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") &&
      plan.contains("cell"), s"no partition pruning in:\n$plan")
  }

  test("corruption classes fail loudly at load") {
    // not an index dir
    val empty = java.nio.file.Files.createTempDirectory("graft_noidx")
    val e1 = intercept[IllegalStateException] {
      AnnIndexStore.load(spark, empty.toString)
    }
    assert(e1.getMessage.contains("manifest"))
    // version skew
    val skew = java.nio.file.Files.createTempDirectory("graft_skew").toString
    AnnIndexStore.save(spark, sf(), skew)
    val mp = java.nio.file.Paths.get(skew, "manifest.json")
    java.nio.file.Files.writeString(mp,
      java.nio.file.Files.readString(mp)
        .replace("\"version\": 1", "\"version\": 99"))
    val e2 = intercept[IllegalStateException] {
      AnnIndexStore.load(spark, skew)
    }
    assert(e2.getMessage.contains("v99"))
    // truncated cells dir: drop one cell partition
    val trunc = java.nio.file.Files.createTempDirectory("graft_trunc").toString
    AnnIndexStore.save(spark, sf(), trunc)
    val parts = new java.io.File(s"$trunc/cells").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(parts.head)
    val e3 = intercept[IllegalStateException] {
      AnnIndexStore.load(spark, trunc)
    }
    assert(e3.getMessage.contains("manifest says"))
  }
}
