package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistable ANN index artifacts — the missing production step
  * between "build an index in-session" (the FrameMemo surface the
  * declared sim_* queries ride) and "serve queries tomorrow": a
  * 100 TB deployment builds the IVF assignment ONCE, writes it as a
  * table, and every later job — other sessions, other clusters —
  * loads and probes it without re-folding the corpus.
  *
  * Layout on disk (`save`):
  *  - `<dir>/cells/` — the two-level IVF assignment
  *    (vec_id, v, cell, cell2) PARTITIONED BY cell: a probe that
  *    filters on its candidate cells prunes to those partitions at
  *    the SCAN (the on-disk analog of the coarse-quantizer bound;
  *    AnnIndexStoreSpec pins `PartitionFilters` in the plan);
  *  - `<dir>/manifest.json` — version, vector count, dim, k, source —
  *    validated on `load`, so a layout change or a half-written
  *    directory fails loudly instead of serving garbage.
  *
  * `searchTopK` is the serving path: assign each query to its
  * `nprobe` nearest coarse cells (the centroid fold runs over ONE
  * broadcast row, exactly the in-session idiom of
  * `Similarity.ivfCellsRaw`), scan only those cells, rank by the
  * house rounded-cosine/ties-by-id rule. Save → load → search is
  * bit-identical to searching the freshly built index — pinned by
  * spec — because the artifact IS the assignment, not a re-build.
  */
object AnnIndexStore {

  /** Bumped whenever the on-disk layout changes. */
  val Version = 1

  final case class Manifest(version: Int, n_vectors: Long, dim: Int,
      k: Long, source: String)

  private def manifestPath(dir: String) =
    java.nio.file.Paths.get(dir, "manifest.json")

  /** Build the two-level IVF assignment for `srcDir`'s embeddings and
    * persist it under `outDir`. Returns the manifest. */
  def save(spark: SparkSession, srcDir: String, outDir: String): Manifest = {
    import spark.implicits._
    val idx = graft.queries.Similarity.ivfCells(spark, srcDir)
    idx.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$outDir/cells")
    val Array(n, dim, k) = idx.agg(count(lit(1)),
        max(size($"v")), countDistinct($"cell"))
      .collect()(0).toSeq.map(_.toString.toLong).toArray
    val m = Manifest(Version, n, dim.toInt, k, srcDir)
    java.nio.file.Files.writeString(manifestPath(outDir),
      s"""{"version": ${m.version}, "n_vectors": ${m.n_vectors},
         | "dim": ${m.dim}, "k": ${m.k},
         | "source": "${m.source}"}""".stripMargin.replace("\n", ""))
    m
  }

  /** Parse the manifest, failing loudly on absence or version skew. */
  def manifest(dir: String): Manifest = {
    val p = manifestPath(dir)
    if (!java.nio.file.Files.isRegularFile(p))
      throw new IllegalStateException(
        s"no ANN index manifest at $p — not an index directory")
    val txt = java.nio.file.Files.readString(p)
    def f(k: String): String =
      (s""""$k":\\s*"?([^,"}]+)"?""".r).findFirstMatchIn(txt)
        .getOrElse(throw new IllegalStateException(
          s"manifest at $p lacks field '$k'"))
        .group(1)
    val m = Manifest(f("version").toInt, f("n_vectors").toLong,
      f("dim").toInt, f("k").toLong, f("source"))
    if (m.version != Version)
      throw new IllegalStateException(
        s"ANN index at $dir is layout v${m.version}; this build reads v$Version")
    m
  }

  /** Load the persisted assignment (validates the manifest, including
    * a row-count check against it — a partially-deleted cells dir
    * fails here, not at query time). */
  def load(spark: SparkSession, dir: String): DataFrame = {
    val m = manifest(dir)
    // partition-column type inference reads `cell=<v>` back as int;
    // restore the build-side long so loaded and fresh frames agree
    val idx = spark.read.parquet(s"$dir/cells")
      .withColumn("cell", col("cell").cast("long"))
    val n = idx.count()
    if (n != m.n_vectors)
      throw new IllegalStateException(
        s"ANN index at $dir holds $n vectors; manifest says ${m.n_vectors}")
    idx
  }

  /** Serve top-`k` neighbors for each row of `queries`
    * (q_id, q: array<double>) against a loaded index: probe the
    * `nprobe` nearest coarse cells per query, scan only those cells,
    * rank by the house rule (rounded cosine desc, vec_id asc).
    * Deterministic, and identical on a loaded or freshly built index. */
  def searchTopK(spark: SparkSession, index: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int = 2): DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // the probe REPLAYS the build quantizer — the same two-level
    // super→group fold, via the expressions shared with
    // Similarity.ivfCellsRaw — so a stored vector probes exactly the
    // cell it was assigned to (a flat all-centroid probe is a
    // DIFFERENT quantizer and can miss the stored cell; the first
    // spec run caught
    // q_id 291 at sim 0.27 for that reason). supers/groups rebuild
    // from the index itself: centroids are the vectors with
    // vec_id < kk, kk = max(8, ceil(sqrt(n))) as at build time.
    val kf = index.agg(greatest(lit(8L),
        ceil(sqrt(count(lit(1)).cast("double"))).cast("long")).as("kk"))
      .select($"kk",
        ceil(sqrt($"kk".cast("double"))).cast("long").as("kk2"))
    val supers = index.crossJoin(broadcast(kf))
      .filter($"vec_id" < $"kk2")
      .select($"vec_id".as("s_id"), $"v".as("c"))
      .agg(expr("array_sort(collect_list(named_struct(" +
        "'s_id', s_id, 'c', c)))").as("supers"))
    val groups = index.crossJoin(broadcast(kf)).filter($"vec_id" < $"kk")
      .crossJoin(broadcast(supers))
      .select($"vec_id".as("cent_id"), $"v".as("c"),
        when($"vec_id" < $"kk2", $"vec_id")
          .otherwise(graft.queries.Similarity.superOfExpr("v"))
          .as("scell"))
      .groupBy($"scell")
      .agg(expr("array_sort(collect_list(named_struct(" +
        "'cent_id', cent_id, 'c', c)))").as("garr"))
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
}
