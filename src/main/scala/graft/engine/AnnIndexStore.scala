package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistable ANN index artifacts — the missing production step
  * between "build an index in-session" (the FrameMemo surface the
  * declared sim_* queries ride) and "serve queries tomorrow": a
  * 100 TB deployment builds the IVF assignment ONCE, writes it as a
  * table, and every later job — other sessions, other clusters —
  * loads and probes it without re-folding the corpus.
  *
  * Layout on disk (v2, `save`):
  *  - `<dir>/cells/` — the two-level IVF assignment
  *    (vec_id, v, cell2, cell) PARTITIONED BY cell: a probe that
  *    filters on its candidate cells prunes to those partitions at
  *    the SCAN (the on-disk analog of the coarse-quantizer bound;
  *    AnnIndexStoreSpec pins `PartitionFilters` in the plan);
  *  - `<dir>/quantizer/` — the codebook as its OWN artifact
  *    (cent_id, c, scell): the serving quantizer no longer has to be
  *    re-derived from corpus rows, so [[append]] can assign new
  *    vectors with the exact build-time quantizer (no re-train) and
  *    [[forget]] can remove any corpus row without perturbing probes;
  *  - `<dir>/manifest.json` — version, vector count, dim, k, quantizer
  *    geometry (kk/kk2), source — proper JSON (escaped, json4s — the
  *    hand-rolled v1 writer corrupted on a srcDir containing `,"}`),
  *    written through the Hadoop FileSystem API so the manifest rides
  *    the same path scheme as the parquet (ADVICE r12).
  *
  * `load` is METADATA-ONLY (ADVICE r12): it validates the manifest and
  * returns the cells frame without running a corpus job; pass
  * `verify = true` for the integrity pass, which sums parquet FOOTER
  * row counts against the manifest (still no data read — a truncated
  * cells dir fails there, not at query time).
  *
  * `searchTopK` is the serving path over a fresh in-session frame;
  * [[searchTopKStored]] serves against the persisted artifact using
  * the STORED quantizer (the only correct quantizer once the index has
  * been appended to). Both replay the same two-level super→group fold
  * via the expressions shared with `Similarity.ivfCellsRaw`, so a
  * stored vector probes exactly the cell it was assigned to. Save →
  * load → search is bit-identical to searching the freshly built
  * index — pinned by spec — because the artifact IS the assignment.
  *
  * Lifecycle at 100 TB:
  *  - [[append]]: daily vector arrivals are assigned with the stored
  *    codebook (a broadcast-join map, no shuffle beyond the write) and
  *    land as delta files inside their cell partitions; search reads
  *    base+delta transparently because both are just rows of the cell.
  *  - [[forget]]: takedown rewrites ONLY the cell partitions that hold
  *    the forgotten ids (read-filter-swap, never a full-corpus
  *    rewrite) and bumps the manifest; a forgotten id is unreachable
  *    by any probe afterwards. If a forgotten id seeded a codebook
  *    entry the manifest is flagged `codebook_stale` — geometry may
  *    degrade until a rebuild, and the codebook still embeds that
  *    vector's coordinates (a strict content takedown then requires
  *    re-saving the index).
  *  - [[compact]]: the daily-append complement — delta files
  *    accumulate one per touched cell per wave; compaction rewrites
  *    only the fragmented cell partitions back to one file each,
  *    search bit-equal before/after.
  *  - [[stats]]: the rebuild/compact trigger — cell-occupancy
  *    imbalance (the persisted-artifact twin of the declared
  *    `sim_cell_balance`), the stale-codebook flag, and the
  *    fragmentation shape feeding [[compact]].
  */
object AnnIndexStore {

  /** Bumped whenever the on-disk layout changes (v2: + quantizer dir,
    * manifest gains kk/kk2/codebook_stale, json4s-rendered). */
  val Version = 2

  final case class Manifest(version: Int, n_vectors: Long, dim: Int,
      k: Long, kk: Long, kk2: Long, source: String,
      codebook_stale: Boolean = false)

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

  /** Build the two-level IVF assignment for `srcDir`'s embeddings and
    * persist it (cells + quantizer + manifest) under `outDir`. Returns
    * the manifest. */
  def save(spark: SparkSession, srcDir: String, outDir: String): Manifest = {
    import spark.implicits._
    val idx = graft.queries.Similarity.ivfCells(spark, srcDir)
    // one task (= one file) per cell: the compaction-clean layout —
    // parquet stays splittable by row group, so a large cell still
    // reads in parallel at scan time, but the file count per
    // partition is deterministic (stats pins frag_files = 1 fresh).
    // The repartition is a deliberate one-shuffle cost at save time
    // (r14): without it each write task sprays a file into every cell
    // it holds rows for — files = tasks x cells, the small-file
    // problem compaction exists to fix, created at birth.
    idx.repartition(col("cell")).write.mode("overwrite")
      .partitionBy("cell").parquet(s"$outDir/cells")
    // one-row build-stats agg (bounded, legitimate collect)
    val st = idx.agg(count(lit(1)),
        max(size($"v")), countDistinct($"cell")).collect()(0)
    val n = st.getLong(0)
    require(n > 0, s"cannot index an empty corpus ($srcDir)")
    val dim = st.getInt(1).toLong
    val k = st.getLong(2)
    val kk = math.max(8L, math.ceil(math.sqrt(n.toDouble)).toLong)
    val kk2 = math.ceil(math.sqrt(kk.toDouble)).toLong
    // the codebook as its own artifact: the kk build centroids with
    // their super-cell — exactly the `groups` input of the build fold
    val supers = idx.filter($"vec_id" < kk2)
      .select($"vec_id".as("s_id"), $"v".as("c"))
      .agg(expr("array_sort(collect_list(named_struct(" +
        "'s_id', s_id, 'c', c)))").as("supers"))
    idx.filter($"vec_id" < kk)
      .crossJoin(broadcast(supers))
      .select($"vec_id".as("cent_id"), $"v".as("c"),
        when($"vec_id" < kk2, $"vec_id")
          .otherwise(graft.queries.Similarity.superOfExpr("v"))
          .as("scell"))
      .coalesce(1) // kk ≈ √n rows — one file keeps the artifact tidy
      .write.mode("overwrite").parquet(s"$outDir/quantizer")
    val m = Manifest(Version, n, dim.toInt, k, kk, kk2, srcDir)
    writeManifest(spark, outDir, m)
    m
  }

  /** Parse the manifest, failing loudly on absence or version skew. */
  def manifest(spark: SparkSession, dir: String): Manifest = {
    import org.json4s.jackson.JsonMethods
    val p = new Path(dir, "manifest.json")
    val fs = p.getFileSystem(hconf(spark))
    if (!fs.exists(p) || fs.getFileStatus(p).isDirectory)
      throw new IllegalStateException(
        s"no ANN index manifest at $p — not an index directory")
    val in = fs.open(p)
    val txt =
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    // version is checked on the raw AST BEFORE the full extraction: a
    // genuine older-layout manifest lacks v2 fields (kk/kk2) and would
    // fail extract[Manifest] first, misreporting a version skew as
    // corruption (review r13)
    val ast =
      try JsonMethods.parse(txt)
      catch { case e: Exception =>
        throw new IllegalStateException(
          s"unreadable ANN index manifest at $p: ${e.getMessage}")
      }
    val ver = (ast \ "version").extractOpt[Int]
    if (!ver.contains(Version))
      throw new IllegalStateException(
        s"ANN index at $dir is layout v${ver.getOrElse("?")}; " +
          s"this build reads v$Version")
    try ast.extract[Manifest]
    catch { case e: Exception =>
      throw new IllegalStateException(
        s"unreadable ANN index manifest at $p: ${e.getMessage}")
    }
  }

  /** Total row count across a parquet dir from FOOTER metadata only —
    * no Spark job, no column data read. Footers open in parallel on
    * the driver (IO-bound; a big index has one file per cell × appends
    * and a sequential walk would serialize the round-trips). */
  /** True when any path component between `p` and `root` (or `p`'s own
    * name) is hidden by Spark's convention (starts with `_` or `.`) —
    * crashed-write leftovers like `_temporary/.../part-*.parquet` that
    * the read path skips must be invisible to the metadata walks too,
    * or a killed append makes [[compact]]/[[stats]]/verify disagree
    * with what load() actually serves (review r14). */
  private def hiddenUnder(root: Path, p: Path): Boolean = {
    var cur = p
    while (cur != null && cur != root) {
      val n = cur.getName
      if (n.startsWith("_") || n.startsWith(".")) return true
      cur = cur.getParent
    }
    false
  }

  private def footerRowCount(spark: SparkSession, path: String): Long = {
    val conf = hconf(spark)
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val files = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.hadoop.fs.LocatedFileStatus]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet") &&
          !hiddenUnder(fs.makeQualified(root), st.getPath))
        files += st
    }
    import scala.collection.parallel.CollectionConverters._
    files.toArray.par // scala-parallel-collections ships with Spark
      .map { st =>
        val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile
            .fromStatus(st, conf))
        try rdr.getRecordCount finally rdr.close()
      }.sum
  }

  /** Load the persisted assignment. Metadata-only by default (manifest
    * presence + version); `verify = true` additionally checks the
    * cells' parquet-footer row count against the manifest — a
    * partially-deleted cells dir fails there, not at query time —
    * still without reading any column data. */
  def load(spark: SparkSession, dir: String,
      verify: Boolean = false): DataFrame = {
    val m = manifest(spark, dir)
    if (verify) {
      val n = footerRowCount(spark, s"$dir/cells")
      if (n != m.n_vectors)
        throw new IllegalStateException(
          s"ANN index at $dir holds $n vectors; manifest says ${m.n_vectors}")
    }
    // partition-column type inference reads `cell=<v>` back as int;
    // restore the build-side long so loaded and fresh frames agree
    spark.read.parquet(s"$dir/cells")
      .withColumn("cell", col("cell").cast("long"))
  }

  /** The persisted codebook (cent_id, c, scell). */
  def quantizer(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/quantizer")

  /** The two broadcastable quantizer frames the probe fold needs —
    * `supers` (one row: the kk2 super-centroids) and `groups` (kk2
    * rows: each super's member centroids) — from a codebook frame
    * (cent_id, c, scell). A super-centroid is exactly a row with
    * scell == cent_id (the build sets scell = vec_id when
    * vec_id < kk2, and every group member's scell is a super id
    * strictly below its own cent_id), so no kk2 scalar is needed —
    * ONE derivation shared by the stored serve path, the fresh serve
    * path, and the streaming serve (AnnIndexServe); review r13
    * collapsed three copies of these fold strings. */
  private[graft] def quantizerFrames(q: DataFrame)
      : (DataFrame, DataFrame) = {
    val s = q.sparkSession
    import s.implicits._
    val supers = q.filter($"scell" === $"cent_id")
      .select($"cent_id".as("s_id"), $"c")
      .agg(expr("array_sort(collect_list(named_struct(" +
        "'s_id', s_id, 'c', c)))").as("supers"))
    val groups = q.groupBy($"scell")
      .agg(expr("array_sort(collect_list(named_struct(" +
        "'cent_id', cent_id, 'c', c)))").as("garr"))
    (supers, groups)
  }

  /** Serve top-`k` neighbors for each row of `queries`
    * (q_id, q: array<double>) against a FRESH in-session index frame:
    * the quantizer is re-derived from the index rows (vec_id < kk,
    * kk = max(8, ceil(sqrt(n))) — the build convention), which is only
    * correct for a never-appended assignment. Deterministic, and
    * identical to [[searchTopKStored]] on a just-saved index. */
  def searchTopK(spark: SparkSession, index: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int = 2): DataFrame = {
    import spark.implicits._
    // the probe REPLAYS the build quantizer — the same two-level
    // super→group fold, via the expressions shared with
    // Similarity.ivfCellsRaw — so a stored vector probes exactly the
    // cell it was assigned to (a flat all-centroid probe is a
    // DIFFERENT quantizer and can miss the stored cell; the first
    // spec run caught q_id 291 at sim 0.27 for that reason).
    val kf = index.agg(greatest(lit(8L),
        ceil(sqrt(count(lit(1)).cast("double"))).cast("long")).as("kk"))
      .select($"kk",
        ceil(sqrt($"kk".cast("double"))).cast("long").as("kk2"))
    // derive the codebook frame (cent_id, c, scell) inline — the same
    // shape save() persists — then share quantizerFrames' fold with
    // the stored and streaming serve paths (review r13: this block
    // previously re-implemented both folds)
    val supers1 = index.crossJoin(broadcast(kf))
      .filter($"vec_id" < $"kk2")
      .select($"vec_id".as("s_id"), $"v".as("c"))
      .agg(expr("array_sort(collect_list(named_struct(" +
        "'s_id', s_id, 'c', c)))").as("supers"))
    val cents = index.crossJoin(broadcast(kf)).filter($"vec_id" < $"kk")
      .crossJoin(broadcast(supers1))
      .select($"vec_id".as("cent_id"), $"v".as("c"),
        when($"vec_id" < $"kk2", $"vec_id")
          .otherwise(graft.queries.Similarity.superOfExpr("v"))
          .as("scell"))
    val (supers, groups) = quantizerFrames(cents)
    searchWith(spark, index, supers, groups, queries, k, nprobe)
  }

  /** Serve against the PERSISTED artifact with its stored quantizer —
    * the correct serving path for an index that has seen [[append]] /
    * [[forget]] (the fresh-path kk would drift with n). */
  def searchTopKStored(spark: SparkSession, dir: String,
      queries: DataFrame, k: Int, nprobe: Int = 2): DataFrame = {
    manifest(spark, dir) // validate layout/version before planning
    val (supers, groups) = quantizerFrames(quantizer(spark, dir))
    searchWith(spark, load(spark, dir), supers, groups, queries, k, nprobe)
  }

  /** The one probe fold both serving paths share: assign each query to
    * its `nprobe` nearest coarse cells (super→group, the build fold),
    * scan only those cells, rank by the house rounded-cosine/
    * ties-by-id rule. */
  private def searchWith(spark: SparkSession, index: DataFrame,
      supers: DataFrame, groups: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // NO broadcast hint on the groups join (the ivfCellsRaw rule): AQE
    // must stay free to switch to a shuffle join when k·dim outgrows
    // the broadcast cap; at bench scale it picks broadcast at runtime
    val probed = queries.crossJoin(broadcast(supers))
      .select($"q_id", $"q",
        graft.queries.Similarity.superOfExpr("q").as("scell"))
      .join(groups, "scell")
      .select($"q_id", $"q", explode(
        graft.queries.Similarity.groupProbeExpr("q", nprobe)).as("cell"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy($"nsim".asc, $"vec_id".asc)
    probed.join(index, "cell")
      .select($"q_id", $"vec_id",
        expr("-round(nanvl(cosine_similarity(q, v), -2D), 4)").as("nsim"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= k)
      .select($"q_id", $"rk".cast("long").as("rank"), $"vec_id",
        (-$"nsim").as("sim"))
  }

  /** Append `newVecs` (vec_id, v: array<double>) to a persisted index
    * WITHOUT re-training: each new vector is assigned with the STORED
    * codebook (the same super→group fold as the build — a broadcast
    * map, no corpus shuffle) and written as delta files inside its
    * cell partition; search reads base+delta transparently. The caller
    * owns vec_id uniqueness (a membership check would be a full
    * anti-join — wrong cost shape for a daily-append path). Returns
    * the bumped manifest. */
  def append(spark: SparkSession, dir: String,
      newVecs: DataFrame): Manifest = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val m = manifest(spark, dir) // m rides into the bumped return value
    val (supers, groups) = quantizerFrames(quantizer(spark, dir))
    val assigned = newVecs
      .select($"vec_id", $"v".cast("array<double>").as("v"))
      .crossJoin(broadcast(supers))
      .select($"vec_id", $"v",
        graft.queries.Similarity.superOfExpr("v").as("scell"))
      .join(groups, "scell")
      .select($"vec_id", $"v",
        graft.queries.Similarity.groupProbeExpr("v", 2).as("cells"))
      .select($"vec_id", $"v",
        expr("cells[0]").as("cell"), expr("get(cells, 1)").as("cell2"))
    assigned.select($"vec_id", $"v", $"cell2", $"cell")
      .repartition(col("cell")) // one delta file per touched cell/wave
      .write.mode("append").partitionBy("cell").parquet(s"$dir/cells")
    // new total from footer metadata — no corpus job, and robust to
    // whatever the delta actually landed
    val n = footerRowCount(spark, s"$dir/cells")
    val m2 = m.copy(n_vectors = n)
    writeManifest(spark, dir, m2)
    m2
  }

  /** Takedown: make every id in `ids` unreachable via search by
    * rewriting ONLY the cell partitions that hold them
    * (read → filter → swap, never a full-corpus rewrite). If a
    * forgotten id seeded a codebook entry, the manifest is flagged
    * `codebook_stale` (probe geometry keeps working but the codebook
    * still embeds that vector — rebuild to scrub it). Returns the
    * bumped manifest. */
  def forget(spark: SparkSession, dir: String, ids: Seq[Long]): Manifest = {
    import spark.implicits._
    require(ids.nonEmpty, "forget needs at least one id")
    val m = manifest(spark, dir)
    val idx = load(spark, dir)
    // takedown lists are small — the affected-cell set is bounded by |ids|
    val hitCells = idx.filter($"vec_id".isin(ids: _*))
      .select($"cell").distinct().as[Long].collect().toIndexedSeq.sorted
    val stale = m.codebook_stale || ids.exists(_ < m.kk)
    if (hitCells.isEmpty) {
      val m2 = m.copy(codebook_stale = stale)
      if (m2 != m) writeManifest(spark, dir, m2)
      return m2
    }
    // rewrite survivors to a sibling tmp dir, then swap partition dirs —
    // never reading and overwriting the same path in one plan
    val tmp = s"$dir/cells_rewrite_tmp"
    val survivors = idx.filter($"cell".isin(hitCells: _*))
      .filter(!$"vec_id".isin(ids: _*))
    survivors.select($"vec_id", $"v", $"cell2", $"cell")
      .repartition(col("cell")) // rewrite defragments the cell too
      .write.mode("overwrite").partitionBy("cell").parquet(tmp)
    val fs = new Path(dir).getFileSystem(hconf(spark))
    hitCells.foreach { c =>
      val dst = new Path(s"$dir/cells/cell=$c")
      val src = new Path(s"$tmp/cell=$c")
      fs.delete(dst, true)
      // a cell whose every row was forgotten has no tmp partition —
      // deleting the old dir IS the rewrite then
      if (fs.exists(src)) fs.rename(src, dst)
    }
    fs.delete(new Path(tmp), true)
    val m2 = m.copy(n_vectors = footerRowCount(spark, s"$dir/cells"),
      codebook_stale = stale)
    writeManifest(spark, dir, m2)
    m2
  }

  /** Parquet file count per cell partition from an FS listing —
    * driver-side and bounded by the cell count (~√n), the same cost
    * class as [[footerRowCount]]. The fragmentation signal: a fresh
    * [[save]] leaves exactly one file per cell; every [[append]] wave
    * adds one delta file to each touched cell. */
  def cellFileCounts(spark: SparkSession, dir: String): Map[Long, Int] = {
    val conf = hconf(spark)
    val root = new Path(s"$dir/cells")
    val fs = root.getFileSystem(conf)
    val counts = scala.collection.mutable.HashMap.empty[Long, Int]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet") &&
          !hiddenUnder(fs.makeQualified(root), st.getPath)) {
        val part = st.getPath.getParent.getName // cell=<v>
        if (part.startsWith("cell=")) {
          val c = part.stripPrefix("cell=").toLong
          counts(c) = counts.getOrElse(c, 0) + 1
        }
      }
    }
    counts.toMap
  }

  /** Defragment cell partitions (r13 verdict ask #5): rewrite the
    * given `cells` — or, by default, every cell holding >= `minFiles`
    * files — back to one file each (read → repartition-by-cell →
    * sibling tmp → swap, the [[forget]] rewrite machinery). Row
    * content is untouched, so search is bit-equal before/after
    * (pinned by spec) and the manifest row count must reconcile —
    * a post-swap footer count that disagrees fails loudly rather
    * than persisting a corrupted index. Cost shape: only fragmented
    * partitions are read and rewritten, never the full index — the
    * daily-compaction complement of the daily [[append]].
    * @return the compacted cell ids (empty = nothing fragmented). */
  def compact(spark: SparkSession, dir: String,
      cells: Seq[Long] = Seq.empty, minFiles: Int = 2): Seq[Long] = {
    import spark.implicits._
    val m = manifest(spark, dir)
    val counts = cellFileCounts(spark, dir)
    val victims =
      (if (cells.nonEmpty) cells.filter(counts.contains)
       else counts.collect { case (c, n) if n >= minFiles => c }.toSeq)
        .sorted
    if (victims.isEmpty) return Seq.empty
    val tmp = s"$dir/cells_compact_tmp"
    load(spark, dir).filter($"cell".isin(victims: _*))
      .select($"vec_id", $"v", $"cell2", $"cell")
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(tmp)
    val fs = new Path(dir).getFileSystem(hconf(spark))
    victims.foreach { c =>
      val dst = new Path(s"$dir/cells/cell=$c")
      val src = new Path(s"$tmp/cell=$c")
      fs.delete(dst, true)
      // the forget() guard: a victim with no committed rows (possible
      // only via crashed-write leftovers) has no tmp partition —
      // deleting the old dir IS the rewrite then
      if (fs.exists(src)) fs.rename(src, dst)
    }
    fs.delete(new Path(tmp), true)
    val n = footerRowCount(spark, s"$dir/cells")
    if (n != m.n_vectors)
      throw new IllegalStateException(
        s"compaction of $dir changed the row count " +
          s"(${m.n_vectors} -> $n) — index corrupted, do not serve")
    victims
  }

  /** Index-health stats — the rebuild/compact trigger: one row with
    * the cell occupancy shape (max/avg imbalance, the persisted twin
    * of the declared `sim_cell_balance`), the stale-codebook flag,
    * and the fragmentation shape (`frag_files` = max parquet files in
    * any cell partition; 1 on a fresh save, +1 per append wave).
    * `rebuild_recommended` when imbalance exceeds `imbalanceBound` or
    * the codebook is stale — the geometry remedies; a fragmented but
    * well-shaped index wants [[compact]] instead
    * (`compact_recommended` when any cell holds >= `fragBound`
    * files). */
  def stats(spark: SparkSession, dir: String,
      imbalanceBound: Double = 4.0, fragBound: Int = 3): DataFrame = {
    import spark.implicits._
    val m = manifest(spark, dir)
    val fc = cellFileCounts(spark, dir)
    val fragFiles = if (fc.isEmpty) 0L else fc.values.max.toLong
    // imbalance = max·n_cells/n_vectors as ONE float op over exact
    // integers (the sim_cell_balance discipline) — dividing by a
    // pre-rounded avg would compound two float roundings
    load(spark, dir).groupBy($"cell").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_cells"), sum($"n").as("n_vectors"),
        max($"n").as("max_cell"))
      .select($"n_cells", $"n_vectors", $"max_cell",
        round($"n_vectors".cast("double") / $"n_cells", 4).as("avg_cell"),
        round(($"max_cell" * $"n_cells").cast("double") / $"n_vectors", 4)
          .as("imbalance"),
        lit(m.codebook_stale).as("codebook_stale"))
      .withColumn("rebuild_recommended",
        $"codebook_stale" || $"imbalance" > imbalanceBound)
      .withColumn("frag_files", lit(fragFiles))
      .withColumn("compact_recommended", lit(fragFiles >= fragBound))
  }
}
