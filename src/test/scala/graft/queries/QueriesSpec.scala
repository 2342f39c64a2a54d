package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Sanity over the declared inventory: every query runs at sf0.001,
  * returns rows (unless vacuously empty is expected), is deterministic
  * across runs, and every oracle key has a matching query.
  * Value-level correctness is the DuckDB gate (tools/check.py / driver t2).
  */
class QueriesSpec extends SparkSpec {

  test("every oracle key has a query; names align") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os.diff(qs)}")
  }

  test("entry returns rows (t1 contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all queries run and are deterministic at sf0.001") {
    val mayBeEmpty = Set("dedup_jaccard_pairs", "dedup_lsh_pairs",
      "dedup_embedding_pairs",
      // legitimately empty at sf0.001: no QI class survives all three
      // privacy gates on the tiny fixture (PrivacyReleaseSpec covers
      // the non-empty contract at sf0.01)
      "log_anonymize_release",
      // same fixture-size cause: sub-k pools stay sub-k at sf0.001
      "log_k_widen_release")
    SparkEntry.queries.foreach { case (name, fn) =>
      val a = fn(spark, sf()).collect()
      val b = fn(spark, sf()).collect()
      assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
        s"$name not deterministic")
      if (!mayBeEmpty(name)) assert(a.nonEmpty, s"$name returned 0 rows")
    }
  }

  test("query column names match oracle aliases (spot-check shape)") {
    // The driver sorts columns by name before hashing — a rename on one
    // side is an automatic fail. Guard the aggregate/computed aliases.
    val expect = Map(
      "q1_pricing_summary" -> Seq("l_returnflag", "l_linestatus", "sum_qty",
        "sum_base_price", "sum_disc_price", "count_order"),
      "wc_word_counts" -> Seq("word", "cnt"),
      "sim_cosine_topk" -> Seq("vec_id", "cos_sim"),
      "dedup_minhash_sigs" -> Seq("doc_id", "h1", "h2", "h3", "h4", "h5", "h6"))
    expect.foreach { case (name, cols) =>
      assert(SparkEntry.queries(name)(spark, sf()).schema.fieldNames.toSeq == cols,
        s"$name schema drift")
    }
  }
}
