package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** The durable-artifact path of the shared LSH candidate-pair table —
  * the r7 verdict's remaining residue of the r5 durability item after
  * pqIndex gained its storeTable path: with `spark.graft.indexWarehouse`
  * set, the shingle→signature→band-join build runs once, the pair table
  * is written through Catalog.storeTable, and every consumer reads the
  * WRITTEN parquet (localCheckpoint is non-reliable storage; at 100 TB
  * an executor loss mid-pipeline would rebuild the band join, a file
  * read replays). */
class DedupDurableSpec extends SparkSpec {

  private def withWarehouse[A](body: String => A): A = {
    val wh = Files.createTempDirectory("graft_lsh_wh").toString
    spark.conf.set("spark.graft.indexWarehouse", wh)
    try body(wh)
    finally spark.conf.unset("spark.graft.indexWarehouse")
  }

  private def artifactName(d: String): String =
    "lsh_pairs_" + java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString

  test("consumer results are identical through the durable pair table") {
    val q = Dedup.queries("dedup_lsh_pairs")
    val durable = withWarehouse { _ => q(spark, sf()).collect().toSeq }
    val memoed = q(spark, sf()).collect().toSeq
    assert(durable == memoed)
  }

  test("pair table is written once and consumers scan the artifact") {
    withWarehouse { wh =>
      val pairs = Dedup.queries("dedup_lsh_pairs")(spark, sf())
      assert(pairs.count() > 0)
      val dir = new java.io.File(wh, artifactName(sf()))
      assert(dir.isDirectory, "artifact must exist in the warehouse")
      // lineage is rooted at the written parquet, not the band-join build
      val scan = pairs.queryExecution.executedPlan.toString
      assert(scan.contains(artifactName(sf())),
        s"consumer must scan the written artifact:\n$scan")
      // a second consumer (the clustering) reuses the artifact:
      // write-once storeTable would throw on a rebuild
      val parts = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.nonEmpty)
      val mtimes = parts.map(f => f.getName -> f.lastModified).toMap
      assert(Dedup.queries("dedup_lsh_verified")(spark, sf()).count() > 0)
      val after = dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified).toMap
      assert(after == mtimes, "artifact must be reused, not rewritten")
    }
  }

  test("a pre-seeded artifact is read, never rebuilt") {
    val wh = Files.createTempDirectory("graft_lsh_wh2").toString
    val cat = new graft.engine.Catalog(spark, wh)
    try cat.storeTable(
      Dedup.lshPairs(spark, sf()).limit(3), artifactName(sf()))
    finally cat.close()
    spark.conf.set("spark.graft.indexWarehouse", wh)
    try assert(
      Dedup.queries("dedup_lsh_pairs")(spark, sf()).count() == 3)
    finally spark.conf.unset("spark.graft.indexWarehouse")
  }
}
