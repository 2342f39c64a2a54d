package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistable BPE tokenizer artifact (r13 verdict ask #4) — the
  * tokenizer.json step of a real pipeline: [[BpeTokenizer]] learns and
  * applies in-session; a production corpus fits the tokenizer ONCE,
  * persists the merge table + fit vocabulary, and every later job —
  * other sessions, other clusters, the inference side — loads the
  * artifact and encodes identically. Same discipline as
  * [[AnnIndexStore]] (the index-artifact precedent): parquet payloads
  * plus a json4s manifest written through the Hadoop FileSystem API.
  *
  * Layout on disk (v1, [[save]]):
  *  - `<dir>/merges/` — the ranked merge table (rank, left, right);
  *    rank order IS the artifact (greedy encode applies lowest rank
  *    first), so load re-sorts by rank and validates the count;
  *  - `<dir>/vocab/` — the bounded fit sample (word, cnt) the merges
  *    were learned from: persisted so [[refreshStaleFlag]] can measure
  *    corpus drift against what the tokenizer actually saw, the
  *    BPE analog of AnnIndexStore's stored quantizer;
  *  - `<dir>/manifest.json` — version, merge count, fit-sample spec
  *    (sample_top_k, n_vocab), source, fit_stale.
  *
  * Save → load → encode is bit-equal to encoding with the fresh fit
  * (pinned by BpeTokenizerSpec and the declared oracle row
  * `text_bpe_store_roundtrip`): the rank table round-trips exactly —
  * parquet strings are lossless and the rank column restores order.
  *
  * fit_stale (the codebook_stale analog): a tokenizer fit on last
  * year's corpus silently degrades as vocabulary drifts —
  * [[refreshStaleFlag]] recomputes the current top-K sample and flags
  * the artifact when under 80% of the STORED fit words are still in
  * it (integer cross-multiplication, no float threshold). The flag is
  * advisory (encode stays deterministic); the remedy is a re-save,
  * exactly like a stale IVF codebook.
  *
  * Scale shape: save's only collects are the size-capped top-K vocab
  * fit and the ≤ nMerges merge table; load reads the bounded merge
  * parquet; encode is a distributed map with the ranks in the task
  * closure. Nothing here touches corpus-sized driver state.
  */
object BpeStore {

  /** v2 (r15): manifest gains fit_fertility_e4 — the sample-weighted
    * tokens-per-word of the fit vocabulary at save time, e4-quantized
    * (exact integer arithmetic over the bounded sample) — the
    * reference point the fertility-drift monitor compares against. */
  val Version = 2

  final case class Manifest(version: Int, n_merges: Int,
      sample_top_k: Int, n_vocab: Int, source: String,
      fit_stale: Boolean = false, fit_fertility_e4: Long = 0L)

  private implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats

  private def hconf(spark: SparkSession) =
    spark.sessionState.newHadoopConf()

  private def writeManifest(spark: SparkSession, dir: String,
      m: Manifest): Unit = {
    import org.json4s.jackson.Serialization
    val p = new Path(dir, "manifest.json")
    val fs = p.getFileSystem(hconf(spark))
    val out = fs.create(p, true)
    try out.write(Serialization.write(m)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Sample-weighted fertility (BPE tokens per word) of a fit
    * sample encoded with the given ranks, e4-quantized: ONE float op
    * over two exact integer sums, over a sample bounded at
    * sample_top_k rows — driver-side by construction. */
  private def sampleFertilityE4(vocab: Iterable[(String, Long)],
      ranks: Map[(String, String), Int]): Long = {
    var words = 0L; var tokens = 0L
    vocab.foreach { case (w, cnt) =>
      words += cnt
      tokens += cnt * BpeTokenizer.encode(w, ranks).length
    }
    if (words == 0L) 10000L
    else math.round(tokens.toDouble / words * 1e4)
  }

  /** Fit a tokenizer on `srcDir`'s documents (bounded top-K sample)
    * and persist merges + vocab + manifest under `outDir`.
    * `fitSample` short-circuits the corpus fit scan when the caller
    * already holds the top-K sample (it is a deterministic pure
    * function of (srcDir, sampleTopK), so passing it changes nothing
    * but the scan count — the roundtrip row computes it once and
    * shares it with the fresh-encode and staleness sides, r17). */
  def save(spark: SparkSession, srcDir: String, outDir: String,
      nMerges: Int = 32, sampleTopK: Int = 512,
      fitSample: Option[Array[(String, Long)]] = None): Manifest = {
    import spark.implicits._
    val vocab = fitSample
      .getOrElse(BpeTokenizer.fitVocab(spark, srcDir, sampleTopK))
    val merges = BpeTokenizer.learn(vocab, nMerges)
    merges.zipWithIndex
      .map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "left", "right")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$outDir/merges")
    vocab.toSeq.toDF("word", "cnt")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$outDir/vocab")
    val ranks = merges.zipWithIndex.toMap
    val m = Manifest(Version, merges.length, sampleTopK, vocab.length,
      srcDir, fit_fertility_e4 = sampleFertilityE4(vocab, ranks))
    writeManifest(spark, outDir, m)
    m
  }

  /** Parse the manifest, failing loudly on absence or version skew. */
  def manifest(spark: SparkSession, dir: String): Manifest = {
    import org.json4s.jackson.JsonMethods
    val p = new Path(dir, "manifest.json")
    val fs = p.getFileSystem(hconf(spark))
    if (!fs.exists(p))
      throw new IllegalStateException(
        s"no BPE tokenizer manifest at $p — not a tokenizer directory")
    val raw =
      try {
        val in = fs.open(p)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      } catch {
        case e: java.io.IOException => throw new IllegalStateException(
          s"unreadable BPE tokenizer manifest at $p: ${e.getMessage}")
      }
    val m =
      try JsonMethods.parse(raw).extract[Manifest]
      catch {
        case scala.util.control.NonFatal(e) =>
          throw new IllegalStateException(
            s"unreadable BPE tokenizer manifest at $p: ${e.getMessage}")
      }
    if (m.version != Version)
      throw new IllegalStateException(
        s"BPE tokenizer at $dir has layout v${m.version}; " +
          s"this build reads v$Version — re-save the tokenizer")
    m
  }

  /** Load the stored merge table as the encode rank map — a bounded
    * read (≤ n_merges rows), validated against the manifest count so
    * a truncated merges dir fails here, not at encode time. */
  def loadRanks(spark: SparkSession,
      dir: String): Map[(String, String), Int] = {
    import spark.implicits._
    val m = manifest(spark, dir)
    val rows = spark.read.parquet(s"$dir/merges")
      .select($"rank".cast("int"), $"left", $"right")
      .as[(Int, String, String)].collect()
    if (rows.length != m.n_merges)
      throw new IllegalStateException(
        s"BPE merges at $dir hold ${rows.length} rows; " +
          s"manifest says ${m.n_merges}")
    rows.map { case (rk, l, r) => ((l, r), rk) }.toMap
  }

  /** The serving path: per-source token accounting over `srcDir`
    * encoded with the STORED tokenizer — the lifecycle twin of
    * BpeTokenizer.corpusTokenCounts, reading the artifact instead of
    * re-fitting. */
  def encodeStoredCounts(spark: SparkSession, storeDir: String,
      srcDir: String): DataFrame =
    BpeTokenizer.tokenCountsBySource(spark, srcDir,
      loadRanks(spark, storeDir))

  /** Recompute the current top-K fit sample of `srcDir` and flag the
    * artifact stale when fewer than 80% of the STORED fit words are
    * still in it (overlap·5 < n_stored·4, integer arithmetic). Writes
    * the updated manifest; returns (manifest, overlap, n_stored). */
  def refreshStaleFlag(spark: SparkSession, dir: String,
      srcDir: String,
      currentFit: Option[Array[(String, Long)]] = None)
      : (Manifest, Long, Long) = {
    import spark.implicits._
    val m = manifest(spark, dir)
    val stored = spark.read.parquet(s"$dir/vocab")
      .select($"word").as[String].collect().toSet
    // currentFit: same short-circuit contract as save's fitSample —
    // the caller-provided sample must be fitVocab(srcDir, sample_top_k)
    val current = currentFit
      .getOrElse(BpeTokenizer.fitVocab(spark, srcDir, m.sample_top_k))
      .iterator.map(_._1).toSet
    val overlap = stored.count(current).toLong
    val stale = overlap * 5L < stored.size.toLong * 4L
    val m2 = m.copy(fit_stale = stale)
    writeManifest(spark, dir, m2)
    (m2, overlap, stored.size.toLong)
  }

  /** Fertility drift (r15): the stored fit-time sample fertility vs
    * the CURRENT corpus's fit sample encoded with the STORED ranks —
    * the tokens-per-word divergence monitor (a tokenizer fit on last
    * year's text inflates fertility as the vocabulary drifts, which
    * silently shrinks every token-budgeted pack). Returns
    * (fit_e4, current_e4); both sides are sample-weighted integer
    * folds over bounded samples, so on the SAME corpus they are equal
    * by construction — the declared drift row rides that, and the
    * divergent-corpus path is spec-tested (the fit_stale pattern). */
  def fertilityDrift(spark: SparkSession, dir: String,
      srcDir: String): (Long, Long) = {
    val m = manifest(spark, dir)
    val ranks = loadRanks(spark, dir)
    val current = BpeTokenizer.fitVocab(spark, srcDir, m.sample_top_k)
    (m.fit_fertility_e4, sampleFertilityE4(current, ranks))
  }
}
