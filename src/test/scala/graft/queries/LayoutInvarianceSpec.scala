package graft.queries

import java.nio.file.Files

import graft.{SparkEntry, SparkSpec}
import graft.Tables.t

/** Physical-independence contract: a declared query's result may depend
  * only on table CONTENTS — never on file count, row order within
  * files, or the configured shuffle parallelism. On a cluster the same
  * table arrives as thousands of splits in arbitrary order; any query
  * whose answer moves under re-staging would be nondeterministic at
  * scale no matter what the single-file oracle says. */
class LayoutInvarianceSpec extends SparkSpec {

  private val AllTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Every table rewritten as 7 round-robin parquet splits (events
    * becomes micros-typed — Tables.t sniffs that on read). */
  private lazy val staged: String = {
    val dir = Files.createTempDirectory("graft_layout").toString
    AllTables.foreach { tbl =>
      t(spark, sf(), tbl).repartition(7).write.parquet(s"$dir/$tbl.parquet")
    }
    dir
  }

  // hash-heavy / window-heavy / iterative representatives of each family
  private val sweep = Seq("q1_pricing_summary", "q5_nation_revenue",
    "wc_topk", "log_attribution", "log_pagerank", "log_sessions",
    "dedup_minhash_sigs", "dedup_exact", "sim_kmeans", "sim_pq_codes",
    "doc_pack", "doc_shuffle", "doc_mixture", "text_winnow", "text_tfidf")

  test("results are invariant to input file count and row order") {
    sweep.foreach { q =>
      val a = SparkEntry.queries(q)(spark, sf()).collect().map(_.toString).toSeq
      val b = SparkEntry.queries(q)(spark, staged).collect().map(_.toString).toSeq
      assert(a == b, s"$q depends on physical input layout")
    }
  }

  test("results are invariant to shuffle parallelism") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val subset = Seq("doc_shuffle", "log_pagerank", "sim_kmeans")
    try {
      val base = subset.map(q =>
        q -> SparkEntry.queries(q)(spark, sf()).collect().map(_.toString).toSeq)
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      base.foreach { case (q, a) =>
        val b = SparkEntry.queries(q)(spark, sf()).collect().map(_.toString).toSeq
        assert(a == b, s"$q depends on shuffle partition count")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
