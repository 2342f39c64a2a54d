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

  test("dp release: row set is the data-independent public grid; noise bounded and real") {
    // THE structural-leak regression test (ADVICE r15 high): the
    // released row set must be a constant of the release schema, not
    // a function of the data — identical at both fixture sizes
    val fullGrid = (for {
      hb <- 0L to 3L
      mt <- Seq("click", "error", "purchase", "signup", "view")
      vb <- 0L to 4L
    } yield (hb, mt, vb)).toSet
    val bySf = Seq(sf("sf0.001"), sf("sf0.01")).map { d =>
      SparkEntry.queries("log_dp_release")(spark, d).collect()
    }
    bySf.foreach { rows =>
      assert(rows.map(classKey).toSet == fullGrid,
        "released rows must be exactly the 100-cell public lattice")
    }

    val d = sf("sf0.01")
    // true class counts from the k-anonymity audit (every class with
    // >= 1 user appears there); grid cells absent from it hold 0
    val truth = SparkEntry.queries("log_k_anonymity")(spark, d)
      .collect()
      .map(r => classKey(r) -> r.getLong(r.fieldIndex("n_users"))).toMap
    var anyNoise = false
    bySf(1).foreach { r =>
      val released = r.getLong(r.fieldIndex("n_released"))
      val t = truth.getOrElse(classKey(r), 0L)
      // released = max(0, truth + noise) with |noise| <= 20
      assert(released >= 0L && released <= t + 20L &&
        released >= math.max(0L, t - 20L),
        s"noise beyond the cap at ${classKey(r)}: $t -> $released")
      if (released != t) anyNoise = true
      assert(r.getDouble(r.fieldIndex("epsilon")) == 0.6931)
      assert(r.getDouble(r.fieldIndex("delta")) == 6.4e-7)
    }
    // the mechanism must actually perturb (P[all-zero noise] over 100
    // cells is (1/3)^100 — a regression to zero-noise would be an
    // accounting lie)
    assert(anyNoise, "no cell was perturbed — mechanism inert")
  }

  test("user-level hourly dp: contribution caps hold on the query's own frame") {
    val d = sf("sf0.01")
    // the invariant the 6·ln2 epsilon accounting rests on: per
    // (user, hour) at most C = 2, per user at most H = 3 hours, so
    // total per-user contribution <= 6 — asserted on the SAME frame
    // the release aggregates, not a reimplementation
    val contrib = EventsLog.dpUserHourlyContrib(spark, d).collect()
    val perCell = contrib.map(r => r.getLong(r.fieldIndex("kept")))
    assert(perCell.forall(k => k >= 1L && k <= 2L),
      "per-(user,hour) contribution must be clamped to C = 2")
    val byUser = contrib.groupBy(_.getLong(0))
    assert(byUser.forall(_._2.length <= 3),
      "a user may contribute to at most H = 3 hours")
    assert(byUser.forall(_._2.map(r =>
      r.getLong(r.fieldIndex("kept"))).sum <= 6L),
      "total per-user contribution must be <= C·H = 6")
    // the caps must actually bind on this fixture (median 63 active
    // hours per user) — otherwise the test is vacuous
    assert(byUser.exists(_._2.length == 3), "H cap never engaged")

    // both hourly releases cover the SAME public window grid, and the
    // row set is contiguous (noised zeros included, no selection)
    val hours = SparkEntry.queries("log_dp_hourly")(spark, d).collect()
      .map(_.getLong(0))
    val hoursU = SparkEntry.queries("log_dp_hourly_user")(spark, d)
      .collect().map(_.getLong(0))
    assert(hours.toSeq == hoursU.toSeq,
      "event- and user-level hourly releases must share one window grid")
    assert(hours.length ==
      (hours.max - hours.min) / 3600000000L + 1,
      "hourly grid must be contiguous over the collection window")
  }
}
