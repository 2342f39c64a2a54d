package graft.queries

import java.nio.file.Files

import graft.{SparkEntry, SparkSpec}

/** Brute-force cross-check of the span-level dedup operator: the
  * declared `doc_dup_spans` (gram-frequency pass + gaps-and-islands
  * window) must agree with a direct per-doc Scala reference — every
  * duplicated position found by substring counting, spans merged by a
  * simple linear scan — on a deterministic pseudo-random corpus built
  * to stress the merge edge cases (adjacent spans, overlapping spans,
  * whole-doc duplication, within-doc repeats, docs under the 8-token
  * floor). The DuckDB oracle already pins the operator at 2 SFs; this
  * pins it against an INDEPENDENT algorithm, not a second declarative
  * engine. */
class DupSpansSpec extends SparkSpec {

  private val G = 8

  /** Deterministic corpus: 60 docs over a 12-word alphabet, lengths
    * 0-40, with every 7th doc an exact copy of its predecessor and
    * every 11th doc containing a repeated in-doc phrase. */
  private def corpus: Seq[(Long, String)] = {
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu")
    var st = 88172645463325252L
    def next(): Long = { st = st * 6364136223846793005L + 1442695040888963407L; st >>> 33 }
    (0L until 60L).map { id =>
      if (id % 7 == 3 && id > 0) (id, null) // placeholder, filled below
      else {
        val n = (next() % 41).toInt
        val base = (0 until n).map(_ => words((next() % words.length).toInt))
        val toks =
          if (id % 11 == 5 && n >= 10) base ++ base.take(10) // in-doc repeat
          else base
        (id, toks.mkString(" "))
      }
    }.foldLeft(Vector.empty[(Long, String)]) { case (acc, (id, tx)) =>
      acc :+ (id, if (tx == null) acc.last._2 else tx) // exact-copy docs
    }
  }

  /** Direct reference: duplicated gram start positions by counting
    * every 8-gram string corpus-wide, islands by linear scan. */
  private def reference(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long, Long)] = {
    def toks(tx: String): Vector[String] =
      tx.toLowerCase.split("\\s+").filter(_.nonEmpty).toVector
    val gramCount = scala.collection.mutable.HashMap.empty[String, Int]
    for ((_, tx) <- docs; ts = toks(tx); if ts.length >= G;
         i <- 0 to ts.length - G)
      gramCount.updateWith(ts.slice(i, i + G).mkString(" "))(
        c => Some(c.getOrElse(0) + 1))
    docs.flatMap { case (id, tx) =>
      val ts = toks(tx)
      if (ts.length < G) None
      else {
        val dupPos = (0 to ts.length - G).filter(i =>
          gramCount(ts.slice(i, i + G).mkString(" ")) > 1).map(_ + 1)
        if (dupPos.isEmpty) None
        else {
          // merge: consecutive duplicated starts p1 < p2 overlap-or-
          // touch iff p2 - p1 <= G
          var spans = Vector.empty[(Int, Int)]
          var start = dupPos.head; var last = dupPos.head
          for (p <- dupPos.tail) {
            if (p - last > G) { spans :+= ((start, last + G - 1)); start = p }
            last = p
          }
          spans :+= ((start, last + G - 1))
          val lens = spans.map { case (a, b) => (b - a + 1).toLong }
          Some(id -> (ts.length.toLong, spans.length.toLong,
            lens.sum, lens.max))
        }
      }
    }.toMap
  }

  test("doc_dup_spans == the brute-force per-doc reference") {
    import spark.implicits._
    val docs = corpus
    val dir = Files.createTempDirectory("graft_dupspans").toString
    // the span frame only reads doc_id/source/text
    docs.toDF("doc_id", "text")
      .withColumn("source", org.apache.spark.sql.functions.lit("t"))
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("doc_dup_spans")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toMap
    val want = reference(docs)
    assert(got == want,
      s"span mismatch: only-spark=${(got.keySet -- want.keySet).toSeq.sorted}"
        + s" only-ref=${(want.keySet -- got.keySet).toSeq.sorted}"
        + s" diff=${got.keySet.intersect(want.keySet).toSeq.sorted
            .filter(k => got(k) != want(k)).take(5)
            .map(k => s"$k: got=${got(k)} want=${want(k)}")}")
    // the fixture must actually exercise the edge cases it claims
    assert(want.nonEmpty && want.values.exists(_._2 >= 2),
      "fixture produced no multi-span doc — strengthen the corpus")
  }
}
