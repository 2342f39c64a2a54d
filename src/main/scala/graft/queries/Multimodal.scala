package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Multimodal-column surface (SURVEY.md §2.5): media payloads are opaque
  * `binary` columns with typed metadata. The declared query exercises the
  * binary-column plumbing (byte length, content hash, deterministic format
  * tag) end-to-end under the oracle contract; the decode/feature-extract
  * stage lives in [[graft.multimodal.MediaPipeline]] (stubbed decoder —
  * media codecs are not in this container — with real Spark plumbing,
  * unit-tested).
  */
object Multimodal {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary metadata extraction over a blob column (text bytes stand in
    // for media payloads; the plumbing is payload-agnostic).
    "mm_meta" -> ((s, d) => {
      import s.implicits._
      t(s, d, "documents")
        .select($"doc_id", $"text".cast("binary").as("payload"), $"n_chars")
        .select($"doc_id",
          octet_length($"payload").cast("long").as("n_bytes"),
          md5($"payload").as("content_hash"),
          when($"n_chars" % 3 === 0, "png")
            .when($"n_chars" % 3 === 1, "jpeg")
            .otherwise("webp").as("fake_format"))
        .orderBy($"doc_id")
    }),

    // Partition-shaped batch stats — the shape a decode UDF sees: group
    // payload sizes per source "shard" to validate batch planning.
    "mm_shard_stats" -> ((s, d) => {
      import s.implicits._
      t(s, d, "documents")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(octet_length($"text".cast("binary")).cast("long")).as("total_bytes"),
          max(octet_length($"text".cast("binary")).cast("long")).as("max_bytes"))
        .orderBy($"source")
    }))

  val oracle: Map[String, String] = Map(
    "mm_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_hash,
        |  CASE WHEN n_chars % 3 = 0 THEN 'png'
        |       WHEN n_chars % 3 = 1 THEN 'jpeg'
        |       ELSE 'webp' END AS fake_format
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_shard_stats" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
        |  CAST(MAX(octet_length(CAST(text AS BLOB))) AS BIGINT) AS max_bytes
        |FROM documents GROUP BY source ORDER BY source""".stripMargin)
}
