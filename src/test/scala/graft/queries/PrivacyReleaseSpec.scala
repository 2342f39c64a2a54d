package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Invariants of log_anonymize_release that the DuckDB hash-compare
  * cannot express: the release must be exactly the set of QI classes
  * that pass ALL THREE privacy gates (k-anonymity, l-diversity,
  * t-closeness) at once, and the suppression accounting must reconcile
  * against the trio's own verdicts.
  */
class PrivacyReleaseSpec extends SparkSpec {

  private def classKey(r: org.apache.spark.sql.Row): (Long, String, Long) =
    (r.getLong(r.fieldIndex("hband")), r.getString(r.fieldIndex("mtype")),
      r.getLong(r.fieldIndex("vband")))

  test("release = classes passing k AND l AND t; accounting reconciles") {
    // sf0.01: at sf0.001 no class survives all three gates (the
    // release is legitimately empty), which would vacuously pass the
    // subset checks — the larger SF keeps the test meaningful
    val d = sf("sf0.01")
    val kRows = SparkEntry.queries("log_k_anonymity")(spark, d).collect()
    val lRows = SparkEntry.queries("log_l_diversity")(spark, d).collect()
    val tRows = SparkEntry.queries("log_t_closeness")(spark, d).collect()
    val rel = SparkEntry.queries("log_anonymize_release")(spark, d).collect()

    val kOk = kRows.filter(r => r.getBoolean(r.fieldIndex("anonymous")))
      .map(classKey).toSet
    val lOk = lRows.filter(r => r.getBoolean(r.fieldIndex("diverse")))
      .map(classKey).toSet
    val tOk = tRows.filter(r => r.getBoolean(r.fieldIndex("close")))
      .map(classKey).toSet
    val allOk = kOk intersect lOk intersect tOk

    assert(rel.nonEmpty, "sf0.01 release expected non-empty")
    val released = rel.map(classKey).toSet
    assert(released == allOk,
      s"release must be exactly the triple-pass classes: " +
        s"extra=${released diff allOk} missing=${allOk diff released}")

    // every released row re-satisfies the three gates from its own
    // columns (not just via the trio join)
    rel.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_users")) >= 5L, s"k violated: $r")
      assert(r.getLong(r.fieldIndex("l_distinct")) >= 3L,
        s"l violated: $r")
      assert(r.getDouble(r.fieldIndex("emd")) <= 0.2 + 1e-9,
        s"t violated: $r")
    }

    // k_min is the weakest released class, constant across rows
    val kmins = rel.map(r => r.getLong(r.fieldIndex("k_min"))).distinct
    assert(kmins.length == 1, "k_min must be release-wide constant")
    assert(kmins.head ==
      rel.map(r => r.getLong(r.fieldIndex("n_users"))).min,
      "k_min != min released class size")

    // per-hband suppression accounting reconciles against the trio:
    // suppressed = classes in log_k_anonymity's lattice that failed
    // any gate, with their user counts
    val allClasses = kRows.map(r =>
      classKey(r) -> r.getLong(r.fieldIndex("n_users"))).toMap

    // release-wide totals state the FULL cut — including bands whose
    // every class failed and therefore carry no per-band row (r14)
    val suppAll = allClasses.filterNot { case (k, _) => allOk(k) }
    rel.foreach { r =>
      assert(r.getLong(r.fieldIndex("supp_classes_total")) ==
        suppAll.size.toLong, "supp_classes_total mismatch")
      assert(r.getLong(r.fieldIndex("supp_users_total")) ==
        suppAll.values.sum, "supp_users_total mismatch")
    }
    val suppByBand = allClasses.filterNot { case (k, _) => allOk(k) }
      .groupBy(_._1._1)
    rel.groupBy(r => r.getLong(r.fieldIndex("hband"))).foreach {
      case (hb, rows) =>
        val expClasses = suppByBand.get(hb).map(_.size).getOrElse(0)
        val expUsers = suppByBand.get(hb).map(_.values.sum).getOrElse(0L)
        rows.foreach { r =>
          assert(r.getLong(r.fieldIndex("supp_classes")) == expClasses,
            s"hband $hb supp_classes mismatch")
          assert(r.getLong(r.fieldIndex("supp_users")) == expUsers,
            s"hband $hb supp_users mismatch")
        }
    }
  }

  test("widen release conserves users and every released row meets k") {
    val d = sf("sf0.01")
    val kRows = SparkEntry.queries("log_k_anonymity")(spark, d).collect()
    val rel = SparkEntry.queries("log_k_widen_release")(spark, d).collect()
    assert(rel.nonEmpty)

    rel.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_users")) >= 5L,
        s"released row below k: $r")
      val lvl = r.getString(r.fieldIndex("level"))
      val vb = r.getLong(r.fieldIndex("vband"))
      assert(if (lvl == "widened") vb == -1L else vb >= 0L,
        s"level/vband mismatch: $r")
    }

    // conservation: full + widened + suppressed == every profiled user
    val total = kRows.map(r => r.getLong(r.fieldIndex("n_users"))).sum
    val released = rel.map(r => r.getLong(r.fieldIndex("n_users"))).sum
    val suppUsers = rel.head.getLong(rel.head.fieldIndex("supp_users"))
    assert(released + suppUsers == total,
      s"users not conserved: $released released + $suppUsers supp != $total")

    // each widened pool is exactly the sub-k mass of its (hband, mtype)
    val subK = kRows.filter(r => !r.getBoolean(r.fieldIndex("anonymous")))
      .groupBy(r => (r.getLong(r.fieldIndex("hband")),
        r.getString(r.fieldIndex("mtype"))))
      .view.mapValues(_.map(_.getLong(3)).sum).toMap
    rel.filter(_.getString(3) == "widened").foreach { r =>
      val key = (r.getLong(r.fieldIndex("hband")),
        r.getString(r.fieldIndex("mtype")))
      assert(subK.get(key).contains(r.getLong(r.fieldIndex("n_users"))),
        s"widened pool mass mismatch at $key")
    }

    // widening must actually recover users relative to pure suppression
    val plainSupp = kRows.filter(r =>
      !r.getBoolean(r.fieldIndex("anonymous")))
      .map(r => r.getLong(r.fieldIndex("n_users"))).sum
    assert(suppUsers < plainSupp,
      "widening recovered no users — operator adds nothing over suppress")
  }

  test("dp release: same classes as widen, k floor holds, noise is bounded and real") {
    val d = sf("sf0.01")
    val widen = SparkEntry.queries("log_k_widen_release")(spark, d)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("hband")),
        r.getString(r.fieldIndex("mtype")),
        r.getLong(r.fieldIndex("vband"))) ->
        r.getLong(r.fieldIndex("n_users"))).toMap
    val dp = SparkEntry.queries("log_dp_release")(spark, d).collect()
    assert(dp.nonEmpty)

    // the DP release publishes exactly the widen release's classes
    val dpKeys = dp.map(r => (r.getLong(r.fieldIndex("hband")),
      r.getString(r.fieldIndex("mtype")),
      r.getLong(r.fieldIndex("vband")))).toSet
    assert(dpKeys == widen.keySet,
      "dp release must perturb the widen release's class set, not its own")

    var anyNoise = false
    dp.foreach { r =>
      val key = (r.getLong(r.fieldIndex("hband")),
        r.getString(r.fieldIndex("mtype")),
        r.getLong(r.fieldIndex("vband")))
      val released = r.getLong(r.fieldIndex("n_released"))
      val truth = widen(key)
      // k floor survives the noise (post-processing clamp)
      assert(released >= 5L, s"noised count below the k floor: $r")
      // noise magnitude is capped at 20 by the mechanism
      assert(math.abs(released - truth) <= 20L,
        s"noise beyond the cap at $key: $truth -> $released")
      if (released != truth) anyNoise = true
      assert(r.getDouble(r.fieldIndex("epsilon")) == 0.6931)
    }
    // the mechanism must actually perturb (P[all-zero noise] over
    // ~19 classes is (1/3)^19 — a regression to zero-noise would be
    // an accounting lie)
    assert(anyNoise, "no class was perturbed — mechanism inert")
  }
}
