package graft.queries

import java.nio.file.Files

import graft.{SparkEntry, SparkSpec}

/** Recomposition check for the dedup funnel: `dedup_cascade` must
  * equal the funnel rebuilt IN PLAIN SCALA from the three published
  * stage relations — exact groups from the raw documents, the
  * `dedup_lsh_verified` pair listing, and the `dedup_semantic_verified`
  * pair listing — under the greedy partner-below rule. The DuckDB
  * oracle already pins the cascade end-to-end; this pins the CONTRACT
  * that the cascade removes docs on exactly the relations the
  * stand-alone queries publish (a drift between the factored
  * lshVerified3 and dedup_lsh_verified would break here first). Runs
  * twice: on the fixture corpus (near/semantic stages live there) and
  * on a synthetic dir with INJECTED exact copies (the fixture has no
  * byte-identical texts, so the exact stage + its precedence over the
  * later stages needs its own corpus). */
class CascadeSpec extends SparkSpec {

  /** (per-source want, got) under the greedy partner-below rule. */
  private def recompose(d: String) = {
    val docs = graft.Tables.t(spark, d, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val ver = SparkEntry.queries("dedup_lsh_verified")(spark, d)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val sem = SparkEntry.queries("dedup_semantic_verified")(spark, d)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

    val keep1 = docs.groupBy(_._3).map { case (_, g) => g.map(_._1).min }.toSet
    val surv1 = docs.map(_._1).filter(keep1.contains).toSet
    val rm2 = ver.collect { case (a, b) if surv1(a) && surv1(b) => b }.toSet
    val surv2 = surv1 -- rm2
    val rm3 = sem.collect { case (a, b) if surv2(a) && surv2(b) => b }.toSet

    val want = docs.groupBy(_._2).map { case (src, g) =>
      val ids = g.map(_._1)
      val ex = ids.count(id => !surv1(id))
      val nr = ids.count(rm2)
      val se = ids.count(rm3)
      src -> (ids.size.toLong, ex.toLong, nr.toLong, se.toLong,
        (ids.size - ex - nr - se).toLong)
    }
    val got = SparkEntry.queries("dedup_cascade")(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    (want, got)
  }

  private def assertSame(
      want: Map[String, (Long, Long, Long, Long, Long)],
      got: Map[String, (Long, Long, Long, Long, Long)]): Unit =
    assert(got == want,
      s"funnel mismatch: ${want.keySet.union(got.keySet).toSeq.sorted
          .filter(k => got.get(k) != want.get(k))
          .map(k => s"$k: got=${got.get(k)} want=${want.get(k)}")}")

  test("fixture corpus: cascade == recomposition (near/semantic stages live)") {
    val (want, got) = recompose(sf())
    assertSame(want, got)
    assert(want.values.map(_._3).sum + want.values.map(_._4).sum > 0,
      "no near/semantic removals — vacuous on this corpus")
  }

  test("injected exact copies: cascade == recomposition, exact takes precedence") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_cascade").toString
    val docs = graft.Tables.t(spark, sf(), "documents")
    // give every doc_id % 5 == 4 the text of its % 5 == 3 neighbor:
    // byte-identical pairs one id apart, removed at stage 1 — and any
    // LSH/semantic pair they'd also form must NOT be double-counted
    val donor = docs.filter($"doc_id" % 5 === 3)
      .select(($"doc_id" + 1).as("doc_id"), $"text".as("dup_text"))
    docs.join(donor, Seq("doc_id"), "left")
      .withColumn("text", coalesce($"dup_text", $"text"))
      .drop("dup_text")
      .write.parquet(s"$dir/documents.parquet")
    graft.Tables.t(spark, sf(), "embeddings")
      .write.parquet(s"$dir/embeddings.parquet")
    val (want, got) = recompose(dir)
    assertSame(want, got)
    assert(want.values.map(_._2).sum > 0, "no exact removals — vacuous")
  }
}
