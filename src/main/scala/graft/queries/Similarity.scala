package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Similarity search over the `embeddings.embedding` array<float> column
  * (SURVEY.md §2.5): brute-force cosine top-k as the correctness baseline
  * and an IVF-style assignment as the bucketing step of the 100 TB scale
  * path.
  *
  * Numeric parity: both engines fold the dot product over DOUBLE in index
  * order; outputs are rounded (4-6 dp) and ordered with vec_id tie-breaks
  * so last-ulp summation differences cannot change the result set.
  *
  * All expressions are built-in higher-order functions (`zip_with` +
  * `aggregate`), so scan-score-topk stays in one codegen'd stage with
  * `TakeOrderedAndProject` for the top-k; the query/centroid side is a
  * broadcast — the big side never shuffles.
  */
object Similarity {

  /** Sequential-fold cosine as composed higher-order functions — kept as
    * the reference implementation; CosineExprSpec asserts the native
    * expression below is bit-identical. */
  def cosineHof(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)") /
      (sqrt(expr(s"aggregate($a, 0D, (acc, x) -> acc + x * x)")) *
        sqrt(expr(s"aggregate($b, 0D, (acc, x) -> acc + x * x)")))

  /** Native codegen'd Catalyst expression (graft.functions.CosineSimilarity)
    * — same fold order, no materialized product array, inlined into the
    * surrounding whole-stage-codegen span. */
  private def cosine(a: String, b: String): Column =
    expr(s"cosine_similarity($a, $b)")

  private def withCosine(s: SparkSession): Unit =
    graft.functions.GraftFunctions.register(s)

  private val Planes = 4
  private val Dim = 64 // embeddings.embedding is fixed 64-dim (FIXTURES.md)

  /** 4×64 ±1 hyperplane matrix: component (p, i) = +1 iff the first hex
    * digit of md5("p:i") >= 8. One literal-like row, broadcast. */
  private def planesCol: Column = expr(
    s"""transform(sequence(0, ${Planes - 1}), p ->
       |  transform(sequence(0, ${Dim - 1}), i ->
       |    IF(cast(conv(substring(md5(cast(concat(p, ':', i) as binary)), 1, 1),
       |            16, 10) as int) >= 8, 1D, -1D)))""".stripMargin)

  /** 4-bit sign signature of `v` against `planes` — within-row fold. */
  private def sigCol: Column = expr(
    s"""aggregate(transform(sequence(0, ${Planes - 1}), p ->
       |  IF(aggregate(zip_with(v, element_at(planes, p + 1),
       |       (x, s) -> x * s), 0D, (acc, x) -> acc + x) >= 0,
       |     shiftleft(1, p), 0)), 0, (acc, x) -> acc + x)""".stripMargin
    ).cast("long")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-20 neighbors of vec_id = 0.
    "sim_cosine_topk" -> ((s, d) => {
      import s.implicits._
      withCosine(s)
      val emb = t(s, d, "embeddings")
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      val q = emb.filter($"vec_id" === 0).select($"v".as("q"))
      emb.filter($"vec_id" =!= 0)
        .crossJoin(broadcast(q))
        .select($"vec_id", round(cosine("v", "q"), 4).as("cos_sim"))
        .orderBy(desc("cos_sim"), asc("vec_id"))
        .limit(20)
    }),

    // IVF assignment: nearest of 8 "centroids" (vec_id < 8) per vector —
    // broadcast centroids; row_number picks the argmax deterministically.
    "sim_ivf_assign" -> ((s, d) => {
      import s.implicits._
      withCosine(s)
      import org.apache.spark.sql.expressions.Window
      val emb = t(s, d, "embeddings")
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      val cents = emb.filter($"vec_id" < 8)
        .select($"vec_id".as("cent_id"), $"v".as("c"))
      val w = Window.partitionBy($"vec_id").orderBy(desc("sim"), asc("cent_id"))
      emb.crossJoin(broadcast(cents))
        .select($"vec_id", $"cent_id", round(cosine("v", "c"), 4).as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"vec_id", $"cent_id", $"sim")
        .orderBy($"vec_id")
    }),

    // Array-function family over the embedding column: size, head,
    // within-row mean, extrema — all rounded for cross-engine parity.
    "arr_stats" -> ((s, d) => {
      import s.implicits._
      t(s, d, "embeddings")
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        .select($"vec_id",
          size($"v").cast("long").as("dim"),
          round(element_at($"v", 1), 6).as("first_val"),
          round(expr("aggregate(v, 0D, (acc, x) -> acc + x)") / size($"v"), 6)
            .as("mean_val"),
          round(array_max($"v"), 6).as("max_val"),
          round(array_min($"v"), 6).as("min_val"))
        .orderBy($"vec_id")
    }),

    // Embedding-cosine near-dup (§2.5): same-label blocking (at 100 TB
    // the blocking key would be an LSH bucket; the join shape — block
    // equi-join then per-pair score — is identical), pairs with rounded
    // cosine ≥ 0.35.
    "dedup_embedding_pairs" -> ((s, d) => {
      import s.implicits._
      withCosine(s)
      val emb = t(s, d, "embeddings")
        .select($"label", $"vec_id", $"embedding".cast("array<double>").as("v"))
      emb.as("a").join(emb.as("b"),
          $"a.label" === $"b.label" && $"a.vec_id" < $"b.vec_id")
        .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"),
          round(cosine("a.v", "b.v"), 4).as("sim"))
        .filter($"sim" >= 0.35)
        .orderBy($"vec_a", $"vec_b")
    }),

    // Two-stage IVF ANN: assign every vector to its nearest of 8
    // "centroids" (vec_id < 8); probe the query's 2 nearest cells; rank
    // only candidates in probed cells. This is the real IVF shape: at
    // 100 TB the assignment is a pure map over a broadcast codebook and
    // the search touches nprobe/ncells of the data.
    "sim_ivf_topk" -> ((s, d) => {
      import s.implicits._
      withCosine(s)
      import org.apache.spark.sql.expressions.Window
      val emb = t(s, d, "embeddings")
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      val cents = emb.filter($"vec_id" < 8)
        .select($"vec_id".as("cent_id"), $"v".as("c"))
      val w = Window.partitionBy($"vec_id").orderBy(desc("csim"), asc("cent_id"))
      val assign = emb.crossJoin(broadcast(cents))
        .select($"vec_id", $"v", $"cent_id",
          round(cosine("v", "c"), 4).as("csim"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"vec_id", $"v", $"cent_id")
      val probed = emb.filter($"vec_id" === 0).crossJoin(broadcast(cents))
        .select($"cent_id", round(cosine("v", "c"), 4).as("csim"))
        .orderBy(desc("csim"), asc("cent_id")).limit(2)
        .select($"cent_id")
      val q = emb.filter($"vec_id" === 0).select($"v".as("q"))
      assign
        .join(broadcast(probed), "cent_id")
        .filter($"vec_id" =!= 0)
        .crossJoin(broadcast(q))
        .select($"vec_id", round(cosine("v", "q"), 4).as("cos_sim"))
        .orderBy(desc("cos_sim"), asc("vec_id"))
        .limit(10)
    }),

    // Sign-LSH (random hyperplane) signatures: bit p of the 4-bit
    // signature = sign of <v, h_p> where h_p has deterministic ±1
    // components from md5("p:i") — cos-similar vectors agree on most
    // bits. The hyperplane matrix is one 4×64 broadcast row; signatures
    // are a pure within-row fold (zero shuffles), the LSH counterpart of
    // the MinHash map stage. At 100 TB this is the bucketing map before
    // any pairwise work.
    "sim_lsh_sigs" -> ((s, d) => {
      import s.implicits._
      t(s, d, "embeddings")
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        .crossJoin(broadcast(s.range(1).select(planesCol.as("planes"))))
        .select($"vec_id", sigCol.as("sig"))
        .orderBy($"vec_id")
    }),

    // LSH-bucketed ANN: candidates = vectors sharing the query's exact
    // signature bucket; rank only those by true cosine. The scale path:
    // signature equi-match replaces the brute-force scan (sim_cosine_topk
    // stays as the recall baseline), probing ~1/2^bits of the data.
    "sim_lsh_topk" -> ((s, d) => {
      import s.implicits._
      withCosine(s)
      val sigs = t(s, d, "embeddings")
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        .crossJoin(broadcast(s.range(1).select(planesCol.as("planes"))))
        .select($"vec_id", $"v", sigCol.as("sig"))
      val q = sigs.filter($"vec_id" === 0)
        .select($"sig".as("qsig"), $"v".as("q"))
      sigs.filter($"vec_id" =!= 0)
        .join(broadcast(q), $"sig" === $"qsig")
        .select($"vec_id", round(cosine("v", "q"), 4).as("cos_sim"))
        .orderBy(desc("cos_sim"), asc("vec_id"))
        .limit(10)
    }),

    // Multiprobe LSH ANN: probe the query's exact signature bucket PLUS
    // every hamming-1 bucket (flip each of the 4 bits) — the standard
    // recall lever: 5 of 16 buckets (~31% of data) instead of 1, still
    // no pairwise work. The probe list is 5 broadcast rows.
    "sim_lsh_multiprobe" -> ((s, d) => {
      import s.implicits._
      withCosine(s)
      val sigs = t(s, d, "embeddings")
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        .crossJoin(broadcast(s.range(1).select(planesCol.as("planes"))))
        .select($"vec_id", $"v", sigCol.as("sig"))
      val q = sigs.filter($"vec_id" === 0)
        .select($"sig".as("qsig"), $"v".as("q"))
      val probes = q.select(explode(expr(
          "array(qsig, qsig ^ 1, qsig ^ 2, qsig ^ 4, qsig ^ 8)")).as("psig"),
          $"q")
      sigs.filter($"vec_id" =!= 0)
        .join(broadcast(probes), $"sig" === $"psig")
        .select($"vec_id", round(cosine("v", "q"), 4).as("cos_sim"))
        .orderBy(desc("cos_sim"), asc("vec_id"))
        .limit(10)
    }),

    // Int8 quantization (the ANN memory-scale lever: 4× smaller vectors
    // before any index is built): symmetric per-vector scale
    // amax/127, code = floor(x/scale + 0.5) — floor(+0.5) instead of
    // round() because the engines disagree on round-half modes while
    // floor is bit-exact everywhere. Reports per-vector reconstruction
    // error (RMS and max); pure in-row map, no shuffle before the
    // presentation sort. Squares are spelled e*e, not pow(e, 2), to
    // keep the arithmetic bit-identical across engines.
    "sim_quantize_int8" -> ((s, d) => {
      import s.implicits._
      val sc = "(amax / 127.0D)"
      val err = s"(x - floor(x / $sc + 0.5D) * $sc)"
      t(s, d, "embeddings")
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        .withColumn("amax", expr("array_max(transform(v, x -> abs(x)))"))
        .select($"vec_id", size($"v").cast("long").as("n_dims"),
          round($"amax" / 127.0, 6).as("scale"),
          when($"amax" === 0.0, 0.0).otherwise(round(sqrt(
            expr(s"aggregate(transform(v, x -> $err * $err)," +
              " 0D, (a, e) -> a + e)") / size($"v")), 6)).as("rms_err"),
          when($"amax" === 0.0, 0.0).otherwise(round(
            expr(s"array_max(transform(v, x -> abs($err)))"), 6))
            .as("max_err"))
        .orderBy($"vec_id")
    }),

    // Native vector-kernel surface (dot_product / l2_norm codegen'd
    // expressions, injected by GraftExtensions): self-dot and norm per
    // embedding, oracle-checked against explicit fold SQL.
    "arr_vector_funcs" -> ((s, d) => {
      import s.implicits._
      withCosine(s) // registers ALL native fns for non-extension sessions
      t(s, d, "embeddings")
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
        .select($"vec_id",
          round(expr("l2_norm(v)"), 6).as("norm"),
          round(expr("dot_product(v, v)"), 6).as("self_dot"))
        .orderBy($"vec_id")
    }),

    // Per-label mean-vector norm: elementwise sums via posexplode +
    // groupBy(label, dim) — fully distributed, no collect_list state.
    "sim_label_centroids" -> ((s, d) => {
      import s.implicits._
      t(s, d, "embeddings")
        .select($"label", $"vec_id",
          posexplode($"embedding".cast("array<double>")))
        .toDF("label", "vec_id", "i", "a")
        .groupBy($"label", $"i")
        .agg(sum($"a").as("sa"), countDistinct($"vec_id").as("nv"))
        .groupBy($"label")
        .agg(max($"nv").as("n"),
          round(sqrt(sum($"sa" * $"sa")) / max($"nv"), 6).as("mean_norm"))
        .orderBy($"label")
    }))

  val oracle: Map[String, String] = Map(
    "sim_cosine_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |           FROM embeddings WHERE vec_id <> 0),
        |q AS (SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = 0),
        |s AS (
        |  SELECT vec_id,
        |    list_sum(list_transform(list_zip(v, q), x -> x[1] * x[2])) AS dot,
        |    sqrt(list_sum(list_transform(v, x -> x * x))) AS na,
        |    sqrt(list_sum(list_transform(q, x -> x * x))) AS nb
        |  FROM e, q)
        |SELECT vec_id, ROUND(dot / (na * nb), 4) AS cos_sim
        |FROM s ORDER BY cos_sim DESC, vec_id LIMIT 20""".stripMargin,

    "sim_ivf_assign" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cv
        |      FROM embeddings WHERE vec_id < 8),
        |s AS (
        |  SELECT vec_id, cent_id,
        |    ROUND(list_sum(list_transform(list_zip(v, cv), x -> x[1] * x[2])) /
        |      (sqrt(list_sum(list_transform(v, x -> x * x))) *
        |       sqrt(list_sum(list_transform(cv, x -> x * x)))), 4) AS sim
        |  FROM e, c),
        |r AS (SELECT vec_id, cent_id, sim,
        |        ROW_NUMBER() OVER (PARTITION BY vec_id
        |                           ORDER BY sim DESC, cent_id) AS rn
        |      FROM s)
        |SELECT vec_id, cent_id, sim FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    "arr_stats" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  ROUND((embedding::DOUBLE[])[1], 6) AS first_val,
        |  ROUND(list_sum(embedding::DOUBLE[]) / len(embedding), 6) AS mean_val,
        |  ROUND(list_max(embedding::DOUBLE[]), 6) AS max_val,
        |  ROUND(list_min(embedding::DOUBLE[]), 6) AS min_val
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "dedup_embedding_pairs" ->
      """WITH e AS (SELECT label, vec_id, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    ROUND(list_sum(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2])) /
        |      (sqrt(list_sum(list_transform(a.v, x -> x * x))) *
        |       sqrt(list_sum(list_transform(b.v, x -> x * x)))), 4) AS sim
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT vec_a, vec_b, sim FROM p WHERE sim >= 0.35
        |ORDER BY vec_a, vec_b""".stripMargin,

    "sim_ivf_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cv
        |      FROM embeddings WHERE vec_id < 8),
        |sims AS (
        |  SELECT vec_id, cent_id,
        |    ROUND(list_sum(list_transform(list_zip(v, cv), x -> x[1] * x[2])) /
        |      (sqrt(list_sum(list_transform(v, x -> x * x))) *
        |       sqrt(list_sum(list_transform(cv, x -> x * x)))), 4) AS csim
        |  FROM e, c),
        |assign AS (
        |  SELECT vec_id, cent_id FROM (
        |    SELECT vec_id, cent_id,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id
        |                         ORDER BY csim DESC, cent_id) AS rn
        |    FROM sims) WHERE rn = 1),
        |probed AS (
        |  SELECT cent_id FROM sims WHERE vec_id = 0
        |  ORDER BY csim DESC, cent_id LIMIT 2),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |cand AS (
        |  SELECT e.vec_id, e.v FROM e
        |  JOIN assign a ON a.vec_id = e.vec_id
        |  JOIN probed p ON p.cent_id = a.cent_id
        |  WHERE e.vec_id <> 0)
        |SELECT vec_id,
        |  ROUND(list_sum(list_transform(list_zip(v, qv), x -> x[1] * x[2])) /
        |    (sqrt(list_sum(list_transform(v, x -> x * x))) *
        |     sqrt(list_sum(list_transform(qv, x -> x * x)))), 4) AS cos_sim
        |FROM cand, q
        |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,

    "sim_lsh_sigs" ->
      """WITH planes AS (
        |  SELECT p, list(CASE WHEN strpos('0123456789abcdef',
        |      substring(md5(p || ':' || i), 1, 1)) - 1 >= 8
        |      THEN 1.0 ELSE -1.0 END ORDER BY i) AS signs
        |  FROM generate_series(0, 3) t(p), generate_series(0, 63) u(i)
        |  GROUP BY p),
        |dots AS (
        |  SELECT e.vec_id, pl.p,
        |    list_sum(list_transform(list_zip(e.embedding::DOUBLE[], pl.signs),
        |             x -> x[1] * x[2])) AS dot
        |  FROM embeddings e, planes pl)
        |SELECT vec_id,
        |  CAST(SUM(CASE WHEN dot >= 0 THEN (1::BIGINT << p) ELSE 0 END)
        |       AS BIGINT) AS sig
        |FROM dots GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "sim_lsh_topk" ->
      """WITH planes AS (
        |  SELECT p, list(CASE WHEN strpos('0123456789abcdef',
        |      substring(md5(p || ':' || i), 1, 1)) - 1 >= 8
        |      THEN 1.0 ELSE -1.0 END ORDER BY i) AS signs
        |  FROM generate_series(0, 3) t(p), generate_series(0, 63) u(i)
        |  GROUP BY p),
        |dots AS (
        |  SELECT e.vec_id, e.embedding::DOUBLE[] AS v, pl.p,
        |    list_sum(list_transform(list_zip(e.embedding::DOUBLE[], pl.signs),
        |             x -> x[1] * x[2])) AS dot
        |  FROM embeddings e, planes pl),
        |sigs AS (
        |  SELECT vec_id, ANY_VALUE(v) AS v,
        |    CAST(SUM(CASE WHEN dot >= 0 THEN (1::BIGINT << p) ELSE 0 END)
        |         AS BIGINT) AS sig
        |  FROM dots GROUP BY vec_id),
        |q AS (SELECT sig AS qsig, v AS qv FROM sigs WHERE vec_id = 0)
        |SELECT vec_id,
        |  ROUND(list_sum(list_transform(list_zip(v, qv), x -> x[1] * x[2])) /
        |    (sqrt(list_sum(list_transform(v, x -> x * x))) *
        |     sqrt(list_sum(list_transform(qv, x -> x * x)))), 4) AS cos_sim
        |FROM sigs, q
        |WHERE sig = qsig AND vec_id <> 0
        |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,

    "sim_lsh_multiprobe" ->
      """WITH planes AS (
        |  SELECT p, list(CASE WHEN strpos('0123456789abcdef',
        |      substring(md5(p || ':' || i), 1, 1)) - 1 >= 8
        |      THEN 1.0 ELSE -1.0 END ORDER BY i) AS signs
        |  FROM generate_series(0, 3) t(p), generate_series(0, 63) u(i)
        |  GROUP BY p),
        |dots AS (
        |  SELECT e.vec_id, e.embedding::DOUBLE[] AS v, pl.p,
        |    list_sum(list_transform(list_zip(e.embedding::DOUBLE[], pl.signs),
        |             x -> x[1] * x[2])) AS dot
        |  FROM embeddings e, planes pl),
        |sigs AS (
        |  SELECT vec_id, ANY_VALUE(v) AS v,
        |    CAST(SUM(CASE WHEN dot >= 0 THEN (1::BIGINT << p) ELSE 0 END)
        |         AS BIGINT) AS sig
        |  FROM dots GROUP BY vec_id),
        |q AS (SELECT sig AS qsig, v AS qv FROM sigs WHERE vec_id = 0),
        |probes AS (
        |  SELECT qsig AS psig, qv FROM q
        |  UNION ALL SELECT xor(qsig, 1), qv FROM q
        |  UNION ALL SELECT xor(qsig, 2), qv FROM q
        |  UNION ALL SELECT xor(qsig, 4), qv FROM q
        |  UNION ALL SELECT xor(qsig, 8), qv FROM q)
        |SELECT vec_id,
        |  ROUND(list_sum(list_transform(list_zip(v, qv), x -> x[1] * x[2])) /
        |    (sqrt(list_sum(list_transform(v, x -> x * x))) *
        |     sqrt(list_sum(list_transform(qv, x -> x * x)))), 4) AS cos_sim
        |FROM sigs JOIN probes ON sig = psig
        |WHERE vec_id <> 0
        |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,

    "sim_quantize_int8" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    list_max(list_transform(embedding::DOUBLE[], x -> abs(x)))
        |      AS amax
        |  FROM embeddings)
        |SELECT vec_id, CAST(len(v) AS BIGINT) AS n_dims,
        |  ROUND(amax / 127.0, 6) AS scale,
        |  CASE WHEN amax = 0 THEN 0.0 ELSE
        |    ROUND(sqrt(list_sum(list_transform(v, x ->
        |      (x - floor(x / (amax / 127.0) + 0.5) * (amax / 127.0))
        |      * (x - floor(x / (amax / 127.0) + 0.5) * (amax / 127.0))))
        |      / len(v)), 6) END AS rms_err,
        |  CASE WHEN amax = 0 THEN 0.0 ELSE
        |    ROUND(list_max(list_transform(v, x ->
        |      abs(x - floor(x / (amax / 127.0) + 0.5) * (amax / 127.0)))),
        |      6) END AS max_err
        |FROM e ORDER BY vec_id""".stripMargin,

    "arr_vector_funcs" ->
      // mirrors the native expressions' exact null/shape contract:
      // any null element -> NULL (DuckDB list_sum would SKIP nulls),
      // empty array -> 0.0 (DuckDB list_sum would return NULL)
      """WITH e AS (
        |  SELECT vec_id,
        |    CASE WHEN len(list_filter(embedding, x -> x IS NULL)) > 0
        |         THEN NULL
        |         ELSE COALESCE(list_sum(list_transform(embedding::DOUBLE[],
        |                                               x -> x * x)), 0.0)
        |    END AS ss
        |  FROM embeddings)
        |SELECT vec_id, ROUND(sqrt(ss), 6) AS norm, ROUND(ss, 6) AS self_dot
        |FROM e ORDER BY vec_id""".stripMargin,

    "sim_label_centroids" ->
      """WITH ex AS (
        |  SELECT label, vec_id, i, v[i] AS a
        |  FROM (SELECT label, vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |       unnest(generate_series(1, len(v))) AS u(i)),
        |sums AS (
        |  SELECT label, i, SUM(a) AS sa, COUNT(DISTINCT vec_id) AS nv
        |  FROM ex GROUP BY label, i)
        |SELECT label, CAST(MAX(nv) AS BIGINT) AS n,
        |  ROUND(sqrt(SUM(sa * sa)) / MAX(nv), 6) AS mean_norm
        |FROM sums GROUP BY label ORDER BY label""".stripMargin)
}
