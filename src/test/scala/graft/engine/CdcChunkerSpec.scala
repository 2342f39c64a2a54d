package graft.engine

import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The CDC engine-chunker contract:
  *
  *  1. Md5Cut frame-equals the declarative SQL path (the oracle
  *     contract) on real data at two scale factors — the license for
  *     the declared doc_cdc_* trio to run on the engine path.
  *  2. Md5Cut matches the SQL predicate on adversarial local docs
  *     (empty, shorter than the window, multi-byte UTF-8).
  *  3. PolyCut holds the CDC invariants the rule exists for:
  *     reassembly, determinism, cut locality under edit, and the
  *     ~64-char expected geometry.
  */
class CdcChunkerSpec extends SparkSpec {

  private def sortOf(df: DataFrame): Seq[String] =
    df.orderBy("doc_id", "chash", "clen")
      .collect().map(_.mkString("|")).toSeq

  private def docsAt(dir: String): DataFrame =
    graft.Tables.t(spark, sf(dir), "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .filter(length(col("text")) > 0)

  test("Md5Cut equals the SQL contract path at sf0.001 and sf0.01") {
    for (dir <- Seq("sf0.001", "sf0.01")) {
      val eng = sortOf(CdcChunker.chunks(docsAt(dir), CdcChunker.Md5Cut))
      val sql = sortOf(graft.queries.PipelineOps.cdcChunksSqlPath(
        spark, sf(dir)))
      assert(eng.size == sql.size, s"$dir row count")
      assert(eng == sql, s"$dir chunk frames diverge")
    }
  }

  test("Md5Cut edge cases: empty, sub-window, multi-byte text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", ""), // empty: no chunk
      (2L, "a", "hi"), // shorter than window: one whole-doc chunk
      (3L, "a", "héllo wörld — ünïcode ” text with enough characters" +
        " to cross several windows and maybe a cut or two 0123456789"),
      (4L, "a", "x" * 500) // repetitive ASCII
    ).toDF("doc_id", "source", "text")
    val eng = CdcChunker.chunks(docs, CdcChunker.Md5Cut)
      .orderBy("doc_id", "chash", "clen")
    // the same docs through the declarative predicate
    val sql = {
      import org.apache.spark.sql.expressions.Window
      val d0 = docs.select($"doc_id", $"source", $"text",
        length($"text").cast("long").as("len")).filter($"len" > 0)
      val bpos = d0.filter($"len" >= 8)
        .select($"doc_id", $"text",
          explode(expr("sequence(8, len)")).as("i"))
        .filter(expr(graft.queries.PipelineOps.cdcCutSql("i")))
        .select($"doc_id", $"i")
      val bounds = bpos.union(d0.select($"doc_id", $"len".as("i")))
        .distinct()
      val wd = Window.partitionBy($"doc_id").orderBy($"i")
      bounds
        .withColumn("prev", coalesce(lag($"i", 1).over(wd), lit(0L)))
        .filter($"i" > $"prev")
        .join(d0.select($"doc_id", $"source", $"text"), Seq("doc_id"))
        .select($"doc_id", $"source", ($"i" - $"prev").as("clen"),
          expr("cast(conv(substring(md5(cast(substring(text," +
            " cast(prev + 1 as int), cast(i - prev as int)) as binary))," +
            " 1, 15), 16, 10) as bigint)").as("chash"))
        .orderBy("doc_id", "chash", "clen")
    }
    assert(eng.collect().map(_.mkString("|")).toSeq ==
      sql.collect().map(_.mkString("|")).toSeq)
  }

  test("property: Md5Cut equals the SQL predicate on random multilingual text") {
    import spark.implicits._
    // deterministic pseudo-random docs over a code-point alphabet that
    // exercises every UTF-8 width (1..4 bytes) — the code-point
    // position bookkeeping is exactly what could silently diverge from
    // Spark's substring semantics
    val alphabet: IndexedSeq[String] = (('a' to 'z') ++ ('0' to '9'))
      .map(_.toString) ++ Seq(" ", " ", " ", "é", "ß", "ü", "中", "文",
      "日", "語", "😀", "𝕏", " ", "–")
    val rnd = new scala.util.Random(20260815L)
    val docs = (1L to 40L).map { id =>
      val len = 1 + rnd.nextInt(400)
      val text = Seq.fill(len)(alphabet(rnd.nextInt(alphabet.size)))
        .mkString
      (id, "p", text)
    }
    val df = docs.toDF("doc_id", "source", "text")
    val eng = sortOf(CdcChunker.chunks(df, CdcChunker.Md5Cut))
    val sql = {
      import org.apache.spark.sql.expressions.Window
      val d0 = df.select($"doc_id", $"source", $"text",
        length($"text").cast("long").as("len")).filter($"len" > 0)
      val bpos = d0.filter($"len" >= 8)
        .select($"doc_id", $"text",
          explode(expr("sequence(8, len)")).as("i"))
        .filter(expr(graft.queries.PipelineOps.cdcCutSql("i")))
        .select($"doc_id", $"i")
      val bounds = bpos.union(d0.select($"doc_id", $"len".as("i")))
        .distinct()
      val wd = Window.partitionBy($"doc_id").orderBy($"i")
      sortOf(bounds
        .withColumn("prev", coalesce(lag($"i", 1).over(wd), lit(0L)))
        .filter($"i" > $"prev")
        .join(d0.select($"doc_id", $"source", $"text"), Seq("doc_id"))
        .select($"doc_id", $"source", ($"i" - $"prev").as("clen"),
          expr("cast(conv(substring(md5(cast(substring(text," +
            " cast(prev + 1 as int), cast(i - prev as int)) as binary))," +
            " 1, 15), 16, 10) as bigint)").as("chash")))
    }
    assert(eng.size == sql.size && eng == sql,
      s"random-unicode divergence: engine ${eng.size} vs sql ${sql.size} chunks")
    // and the poly path reassembles the same docs (char counts)
    val poly = CdcChunker.chunks(df, CdcChunker.PolyCut)
      .groupBy("doc_id").agg(sum("clen").as("cl"))
      .join(df.select($"doc_id",
        length($"text").cast("long").as("len")), "doc_id")
      .filter($"cl" =!= $"len").count()
    assert(poly == 0, "PolyCut reassembly broke on multilingual text")
  }

  test("PolyCut invariants: reassembly, determinism, geometry") {
    val docs = docsAt("sf0.001")
    val ch = CdcChunker.chunks(docs, CdcChunker.PolyCut)
    // reassembly: per-doc chunk chars sum to the doc's char count
    val bad = ch.groupBy("doc_id").agg(sum("clen").as("cl"))
      .join(docs.select(col("doc_id"),
        length(col("text")).cast("long").as("len")), "doc_id")
      .filter(col("cl") =!= col("len")).count()
    assert(bad == 0, "chunks must reassemble to the document")
    // determinism: a second run is frame-identical
    assert(sortOf(ch) == sortOf(CdcChunker.chunks(docs, CdcChunker.PolyCut)))
    // geometry: expected ~64-char chunks — mean within a loose band
    val Array(nc, tot) = ch.agg(count(lit(1)), sum("clen"))
      .collect()(0).toSeq.map(_.toString.toDouble).toArray
    val mean = tot / nc
    assert(mean > 16 && mean < 256, s"mean chunk length $mean off-geometry")
  }

  test("PolyCut cut locality: an edit re-chunks only its neighborhood") {
    val md = MessageDigest.getInstance("MD5")
    val rnd = new scala.util.Random(42)
    val base = (1 to 4000).map(_ => ('a' + rnd.nextInt(26)).toChar)
      .mkString
    // flip one char in the middle
    val edited = base.substring(0, 2000) + "Z" + base.substring(2001)
    val a = CdcChunker.chunkOne(md, 1L, "s", base, CdcChunker.PolyCut)
      .map(c => (c.clen, c.chash))
    val bSeq = CdcChunker.chunkOne(md, 1L, "s", edited, CdcChunker.PolyCut)
      .map(c => (c.clen, c.chash))
    // shared prefix + shared suffix must cover all but a bounded
    // middle window — the fixed-window chunker would share NOTHING
    // after the edit point
    val pre = a.zip(bSeq).takeWhile { case (x, y) => x == y }.size
    val post = a.reverse.zip(bSeq.reverse)
      .takeWhile { case (x, y) => x == y }.size
    val disturbedA = a.size - pre - post
    assert(disturbedA <= 4,
      s"edit disturbed $disturbedA chunks (expected a local few)")
    assert(pre > 0 && post > 0)
  }
}
