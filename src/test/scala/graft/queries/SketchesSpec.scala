package graft.queries

import graft.{SparkEntry, SparkSpec}

/** The invariants that make a sketch a sketch — properties the DuckDB
  * hash-compare cannot express (it only proves both engines compute the
  * same numbers, not that the numbers mean anything). */
class SketchesSpec extends SparkSpec {

  test("CountMin never underestimates: est >= exact for every probe") {
    import spark.implicits._
    val rows = SparkEntry.queries("sketch_cms_est")(spark, sf()).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"${r.getString(0)}: est=$est < exact=$exact")
    }
  }

  test("CountMin sketch mass: each hash row sums to the corpus word count") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cms = SparkEntry.queries("sketch_cms")(spark, sf())
    val perRow = cms.groupBy($"h_row")
      .agg(sum($"cnt").as("mass"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(perRow.keySet == Set(0, 1, 2, 3), s"missing hash rows: $perRow")
    // every row hashes every word occurrence exactly once — compare
    // against the independently-computed corpus mass, not just row
    // agreement (a uniform drop/double-count would keep rows equal)
    val corpusWords = graft.Tables.t(spark, sf(), "documents")
      .select(explode(split(lower($"text"), "\\s+")).as("tok"))
      .filter($"tok" =!= "").count()
    assert(perRow.values.toSet == Set(corpusWords),
      s"mass != corpus word count $corpusWords: $perRow")
  }

  test("HLL sketches merge losslessly: shard-wise union == global sketch") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // The property that makes approx-distinct work at 100 TB: build one
    // sketch per shard (map-side, bounded bytes), union the sketches,
    // and get EXACTLY the estimate a single global sketch would give —
    // merge loses nothing, so the topology (tree depth, shard count)
    // never changes the answer.
    val ev = graft.Tables.t(spark, sf(), "events")
    val global = ev.agg(
        hll_sketch_estimate(hll_sketch_agg($"user_id")).as("est"))
      .head().getLong(0)
    val merged = ev
      .withColumn("shard", pmod($"event_id", lit(16)))
      .groupBy($"shard").agg(hll_sketch_agg($"user_id").as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
      .head().getLong(0)
    assert(merged == global,
      s"sketch merge changed the estimate: $merged != $global")
    // and the estimate is an estimate OF the right thing
    val exact = ev.select($"user_id").distinct().count()
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"HLL est=$merged vs exact=$exact drifts >5%")
  }

  test("approx_percentile lands within the GK rank-error bound") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // accuracy=1000 guarantees rank error <= n/1000; assert a relaxed
    // 1% rank window around the true median per group
    val li = graft.Tables.t(spark, sf(), "lineitem")
    val approx = graft.queries.EventsLog.approxQuantiles(spark, sf())
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    approx.foreach { case (flag, ap50) =>
      val g = li.filter($"l_returnflag" === flag)
      val n = g.count().toDouble
      // tie-robust: the returned value occupies the rank interval
      // (count_lt, count_le]; that interval must reach the 1%-widened
      // median band (l_quantity has ~2% of mass per distinct value)
      val lt = g.filter($"l_quantity" < ap50).count().toDouble
      val le = g.filter($"l_quantity" <= ap50).count().toDouble
      assert(lt <= 0.51 * n && le >= 0.49 * n,
        s"$flag: approx p50=$ap50 rank interval (${lt / n}, ${le / n}]")
    }
  }

  test("CountMin merge is lossless: shard-summed cells == single-pass global") {
    // The linearity contract the sketch_cms_merge QUERY demonstrates and
    // the cross-engine hash cannot prove alone: the hash proves both
    // engines merge identically, this proves merging loses NOTHING —
    // the shard-wise build lands on the exact single-pass table, so the
    // per-executor-partials topology never changes a CMS estimate.
    val global = SparkEntry.queries("sketch_cms")(spark, sf())
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val merged = SparkEntry.queries("sketch_cms_merge")(spark, sf())
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(merged == global,
      s"merged CMS != global CMS (| merged\\global |=${(merged.toSet diff global.toSet).size})")
  }

  test("Bloom merge is lossless: shard-ORed bits == single-pass global") {
    val global = SparkEntry.queries("sketch_bloom")(spark, sf())
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val merged = SparkEntry.queries("sketch_bloom_merge")(spark, sf())
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(merged == global, "merged Bloom bits != global Bloom bits")
  }

  test("Bloom filter has no false negatives") {
    val probe = SparkEntry.queries("sketch_bloom_probe")(spark, sf())
      .collect().head
    val (nProbed, nMaybe, nPresent, nFalsePos) =
      (probe.getLong(0), probe.getLong(1), probe.getLong(2), probe.getLong(3))
    assert(nProbed > 0)
    // every present word MUST report maybe=1: maybe-count covers present
    // plus exactly the false positives
    assert(nMaybe == nPresent + nFalsePos,
      s"false negative detected: maybe=$nMaybe present=$nPresent fp=$nFalsePos")
    assert(nMaybe <= nProbed)
  }

  test("histogram quantiles: exact rank replay, error within one bin") {
    import spark.implicits._
    val vals = graft.Tables.t(spark, sf(), "events")
      .select($"value").collect().map(_.getDouble(0)).sorted
    val n = vals.length.toLong
    val rows = SparkEntry.queries("sketch_hist_quantiles")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getBoolean(7)))
    assert(rows.map(_._1).toSeq == Seq(50L, 95L, 99L), "q sweep")
    rows.foreach { case (q, nn, _, lo, hi, est, exactQ, within) =>
      assert(nn == n, s"q=$q: total $nn != $n")
      // the exact order statistic at integer rank ceil(q*n/100)
      val pos = ((n * q + 99) / 100).toInt
      assert(exactQ == vals(pos - 1), s"q=$q: exact rank diverges")
      assert(within, s"q=$q: exact quantile outside the chosen bin")
      // estimate contract: midpoint of the containing bin — error is
      // bounded by the bin width
      assert(est >= lo && est <= hi && math.abs(est - exactQ)
        <= (hi - lo) + 1e-9, s"q=$q: estimate error exceeds bin width")
    }
  }

  test("KMV: h_k replays against a brute-force bottom-k; error in bound") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val r = SparkEntry.queries("sketch_kmv")(spark, sf()).head()
    val (kKept, hK, est, exact) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // brute-force replay: hash every distinct word on the driver and
    // take the 64th smallest distinct hash — an independent route to
    // the same sketch content
    val hashes = graft.Tables.t(spark, sf(), "documents")
      .select(explode(split(lower($"text"), "\\s+")).as("tok"))
      .filter($"tok" =!= "")
      .select(regexp_replace($"tok", "[^a-z0-9]+", "").as("word"))
      .select(expr("cast(conv(substring(md5(cast(word as binary)), 1," +
        " 15), 16, 10) as bigint)").as("h"))
      .distinct().collect().map(_.getLong(0)).sorted
    // the test corpus may hold fewer than k distinct hashes — then the
    // sketch IS the exact distinct set and the estimate is its size
    val kExp = math.min(64, hashes.length)
    assert(kKept == kExp, s"k_kept=$kKept != $kExp")
    assert(hK == hashes(kExp - 1),
      s"h_k=$hK != brute-force ${hashes(kExp - 1)}")
    // replay the estimator in exact BigInt arithmetic (63·2^60
    // overflows Long — same reason the query widens to DECIMAL(38,0))
    val expect =
      if (kExp < 64) kExp.toLong
      else (BigInt(63) * BigInt("1152921504606846976")
        / BigInt(hashes(63))).toLong
    assert(est == expect, s"est=$est mismatches replay $expect")
    // (k-1)/h_k concentration: rse = 1/sqrt(k-1) ≈ 12.6%; 4σ bound
    // (trivially tight when the sketch holds the whole distinct set)
    assert(math.abs(est - exact).toDouble / exact < 0.5,
      s"KMV est=$est vs exact=$exact outside 4σ")
  }

  test("KMV intersect: sketch replays; union-sketch membership is exact") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val r = SparkEntry.queries("sketch_kmv_intersect")(spark, sf()).head()
    val (k, theta, nBoth, unionEst, interEst) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
    val (jEst, jExact) = (r.getDouble(5), r.getDouble(6))
    val sh = graft.queries.Dedup.shingles(spark, sf(), 3)
      .selectExpr("cast(doc_id % 2 as int) as side",
        "cast(conv(substring(md5(cast(shingle as binary)), 1, 15)," +
          " 16, 10) as bigint) as h")
      .distinct().collect().map(x => (x.getInt(0), x.getLong(1)))
    val a = sh.filter(_._1 == 0).map(_._2).toSet
    val b = sh.filter(_._1 == 1).map(_._2).toSet
    val ka = a.toSeq.sorted.take(64).toSet
    val kb = b.toSeq.sorted.take(64).toSet
    val u = (ka ++ kb).toSeq.sorted.take(64)
    assert(k == u.length && theta == u.last, "union sketch diverges")
    // THE property the estimator rests on: for union-sketch elements,
    // per-side SKETCH membership equals per-side SET membership
    u.foreach { h =>
      assert(ka(h) == a(h) && kb(h) == b(h),
        s"sketch membership of $h is not exact")
    }
    assert(nBoth == u.count(h => ka(h) && kb(h)), "n_both diverges")
    val uExp =
      if (u.length < 64) u.length.toLong
      else (BigInt(63) * BigInt("1152921504606846976")
        / BigInt(u.last)).toLong
    assert(unionEst == uExp, s"union_est=$unionEst != replay $uExp")
    assert(interEst ==
      (BigInt(nBoth) * BigInt(uExp) / BigInt(u.length)).toLong,
      "inter_est diverges from J*union floor")
    val jTrue = (a & b).size.toDouble / (a ++ b).size
    assert(jExact ==
      BigDecimal((a & b).size.toDouble / (a ++ b).size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
      "exact_jaccard diverges from set replay")
    // 4σ concentration: sd(J_est) ≈ sqrt(J(1-J)/k) ≤ 0.5/8
    assert(math.abs(jEst - jTrue) < 0.25,
      s"jaccard_est=$jEst vs true=$jTrue outside 4σ")
  }

  test("AMS F2: sketch replays sign-exactly; merge is linear") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val r = SparkEntry.queries("sketch_ams_f2")(spark, sf()).head()
    val (f2Exact, f2Est, relErr, nMismatch) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
    assert(r.getLong(0) == 8L)
    assert(nMismatch == 0L, "shard-merged sketch != direct sketch")
    // driver replay from the exact word counts
    val counts = graft.queries.TextWordCount.docWords(spark, sf())
      .groupBy($"word").agg(count(lit(1)).as("cnt"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(w: String): String =
      md.digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val sketches = (0 until 8).map { rr =>
      counts.map { case (w, c) =>
        (if (hex(w).charAt(rr) <= '7') 1L else -1L) * c
      }.sum
    }
    val squares = sketches.map(s0 => BigInt(s0) * BigInt(s0)).sorted
    assert(f2Est == squares(3).toDouble,
      "f2_est is not the lower median of the 8 replayed squares")
    val exact = counts.map { case (_, c) => BigInt(c) * BigInt(c) }.sum
    assert(f2Exact == exact.toDouble, "f2_exact diverges")
    // AMS concentration is weak at 8 estimators on a 31-word skewed
    // vocab — only pin that the estimate is the right order
    assert(math.abs(relErr) < 0.95, s"rel_err=$relErr implausible")
  }

  test("KMV merge is lossless: shard union reproduces the direct sketch") {
    val r = SparkEntry.queries("sketch_kmv_merge")(spark, sf()).head()
    assert(r.getLong(0) == 4, "expected 4 doc-parity shards")
    assert(r.getLong(2) > 0 && r.getLong(2) <= 64L,
      s"merged k_kept=${r.getLong(2)} out of [1, 64]")
    assert(r.getLong(6) == 1L,
      s"merged h_k=${r.getLong(3)} != direct h_k=${r.getLong(4)}")
  }
}
