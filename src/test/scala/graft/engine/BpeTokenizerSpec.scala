package graft.engine

import graft.SparkSpec

/** Invariants of the BPE engine path (the greedy per-word loop the
  * declared `text_bpe_encode_fixture` pins cross-engine): lossless
  * segmentation over every UTF-8 width, hand-verified learning order,
  * monotone compression in the merge count, and the corpus-scale
  * fit-on-sample/apply-distributed lifecycle. */
class BpeTokenizerSpec extends SparkSpec {

  private val words = Seq(
    "lowering", "aaabaaab", "日本語のテキスト", "αβγαβγ",
    "mixé😀😀emoji", "a", "", "😀", "ßß", "ababab")

  test("encode is a lossless segmentation at every merge depth") {
    for (n <- Seq(0, 4, 24)) {
      val ranks = BpeTokenizer
        .learn(words.filter(_.nonEmpty).map((_, 2L)), n).zipWithIndex.toMap
      words.foreach { w =>
        val toks = BpeTokenizer.encode(w, ranks)
        assert(toks.mkString == w, s"lossy segmentation of '$w' at n=$n")
      }
    }
  }

  test("zero merges segments to code points (surrogate pairs are one symbol)") {
    val toks = BpeTokenizer.encode("mixé😀😀emoji", Map.empty)
    assert(toks.length == "mixé😀😀emoji".codePointCount(0, 13))
    assert(toks.count(_ == "😀") == 2)
  }

  test("learn picks the frequency-weighted best pair, ties to the smallest") {
    // vocab: ("aaab", 3) has pairs (a,a)x2, (a,b)x1 -> (a,a)=6, (a,b)=3
    // plus ("ab", 2) -> (a,b)=5. Best: (a,a) at 6. After merging,
    // "aaab" segments to [aa, a, b]: pairs (aa,a)=3, (a,b)=3+2=5.
    val merges = BpeTokenizer.learn(Seq(("aaab", 3L), ("ab", 2L)), 2)
    assert(merges == Vector(("a", "a"), ("a", "b")))
  }

  test("token counts are monotonically non-increasing in merge count") {
    val vocab = words.filter(_.length >= 2).map((_, 1L))
    val counts = Seq(0, 2, 8, 24).map { n =>
      val ranks = BpeTokenizer.learn(vocab, n).zipWithIndex.toMap
      words.map(w => BpeTokenizer.encode(w, ranks).length).sum
    }
    assert(counts == counts.sorted.reverse,
      s"token counts must not grow with merges: $counts")
  }

  test("learn is deterministic and stops when no pair remains") {
    val v = Seq(("ab", 5L), ("cd", 1L))
    val a = BpeTokenizer.learn(v, 10)
    val b = BpeTokenizer.learn(v, 10)
    assert(a == b)
    // 2 two-symbol words support at most 2 merges, then nothing remains
    assert(a.length <= 3)
  }

  test("corpusTokenCounts: fit-on-sample lifecycle holds the accounting laws") {
    import spark.implicits._
    val df = BpeTokenizer.corpusTokenCounts(spark, sf()).cache()
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, c, t) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_cps"),
        r.getAs[Long]("n_tokens"))
      assert(t <= c, "merges can only shrink the token count")
      assert(t >= w, "every word is at least one token")
      assert(r.getAs[Double]("compression") >= 1.0)
    }
    // 0 merges degenerates to the code-point count — the fit must
    // actually compress relative to that floor
    val flat = BpeTokenizer.corpusTokenCounts(spark, sf(), nMerges = 0)
      .agg(org.apache.spark.sql.functions.sum($"n_tokens")).head().getLong(0)
    val fit = df.agg(org.apache.spark.sql.functions.sum($"n_tokens"))
      .head().getLong(0)
    assert(fit < flat, s"32 merges must beat the 0-merge floor ($fit vs $flat)")
    df.unpersist()
  }

  test("BpeStore: save -> load -> encode is bit-equal to the fresh fit") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bpe_store").toString
    val m = BpeStore.save(spark, sf(), dir)
    assert(m.version == BpeStore.Version)
    assert(m.n_merges == 32 && m.sample_top_k == 512)
    assert(!m.fit_stale)
    assert(BpeStore.manifest(spark, dir) == m)

    val ranks = BpeStore.loadRanks(spark, dir)
    val fresh = BpeTokenizer
      .learn(BpeTokenizer.fitVocab(spark, sf(), 512), 32)
      .zipWithIndex.toMap
    assert(ranks == fresh, "stored rank table must round-trip exactly")

    // word-level bit-equality of the encode itself, not just counts
    val sample = BpeTokenizer.fitVocab(spark, sf(), 64).map(_._1)
    sample.foreach { w =>
      assert(BpeTokenizer.encode(w, ranks) == BpeTokenizer.encode(w, fresh),
        s"stored encode diverges on '$w'")
    }

    // the dataframe serving path agrees with the fresh lifecycle
    val stored = BpeStore.encodeStoredCounts(spark, dir, sf())
      .orderBy("source").collect().toSeq
    val freshDf = BpeTokenizer.corpusTokenCounts(spark, sf())
      .orderBy("source").collect().toSeq
    assert(stored == freshDf)
  }

  test("BpeStore: stale flag stays down on the fit corpus, trips on drift") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bpe_store2").toString
    BpeStore.save(spark, sf(), dir)
    val (m1, overlap, nStored) = BpeStore.refreshStaleFlag(spark, dir, sf())
    assert(overlap == nStored, "same corpus must overlap its own fit 100%")
    assert(!m1.fit_stale)
    assert(!BpeStore.manifest(spark, dir).fit_stale)

    // a drifted corpus: documents whose vocabulary is disjoint from
    // the fit sample (fresh synthetic words) — overlap 0 < 80% floor
    val drift = java.nio.file.Files
      .createTempDirectory("graft_bpe_drift").toString
    (0L until 50L).map(i => (i, "src",
        s"zzqx$i zzqy$i zzqz$i zzqw$i zzqv$i"))
      .toDF("doc_id", "source", "text")
      .write.parquet(s"$drift/documents.parquet")
    val (m2, overlap2, _) = BpeStore.refreshStaleFlag(spark, dir, drift)
    assert(overlap2 == 0L)
    assert(m2.fit_stale, "disjoint vocabulary must trip the stale flag")
    assert(BpeStore.manifest(spark, dir).fit_stale,
      "stale flag must persist in the manifest")
  }

  test("BpeStore: manifest fails loudly on absence and version skew") {
    val none = java.nio.file.Files
      .createTempDirectory("graft_bpe_none").toString
    val e1 = intercept[IllegalStateException] {
      BpeStore.manifest(spark, none)
    }
    assert(e1.getMessage.contains("not a tokenizer directory"))

    val skew = java.nio.file.Files
      .createTempDirectory("graft_bpe_skew").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(skew, "manifest.json"),
      """{"version":99,"n_merges":1,"sample_top_k":1,"n_vocab":1,
        |"source":"x","fit_stale":false}""".stripMargin
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val e2 = intercept[IllegalStateException] {
      BpeStore.manifest(spark, skew)
    }
    assert(e2.getMessage.contains("layout v99"))
  }
}
