package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** The word_count plugin family (SURVEY.md §2.3 W1-W5), re-expressed as
  * declarative column expressions over `documents.text`:
  * lowercase (W1, `word_count.go:13`), whitespace tokenize (W2, `:13`),
  * `[^a-z0-9]+` normalize (W3, `:14-17`), explode (W4, `:19-22`),
  * hash group-count (W5, `:26-41`), plus L9-style deterministic top-k.
  *
  * All token pipelines stay inside whole-stage codegen (split /
  * regexp_replace / explode are codegen'd); the group-count is a standard
  * 2-phase HashAggregate — map-side partial then final, which is exactly
  * the reference's mapper-combine + reducer topology at any scale.
  */
object TextWordCount {

  /** Non-empty whitespace tokens of lower(text) — shared first stage. */
  private def tokens(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // NO Layout.fanOut here (r16, measured): the wc/sketch consumers'
    // map work is a plain tokenize — the added exchange cost a flat
    // ~0.1-0.7 s on each of a dozen small consumers (sketch_ams_f2
    // 3.2×, wc_word_counts 2×) and bought nothing
    t(s, d, "documents")
      .select($"doc_id", explode(split(lower($"text"), "\\s+")).as("tok"))
      .filter($"tok" =!= "")
  }

  /** THE word-normalization contract (W1-W3): whitespace tokens of
    * lower(text), stripped to [a-z0-9]; the empty string IS a word (the
    * reference still emits it, word_count.go:19-22). Single definition —
    * every consumer (wc family, sketches) and its SQL twin below must go
    * through here so the contract can never fork. */
  private[queries] def words(s: SparkSession, d: String): DataFrame =
    docWords(s, d).select("word")

  /** [[words]] with the originating doc_id retained — the sharding key
    * for the sketch-merge queries. Same single normalization contract:
    * words() derives from here. */
  private[queries] def docWords(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    tokens(s, d).select($"doc_id",
      regexp_replace($"tok", "[^a-z0-9]+", "").as("word"))
  }

  /** DuckDB twin of [[words]]. */
  private[queries] val wordsSql: String =
    """SELECT regexp_replace(tok, '[^a-z0-9]+', '', 'g') AS word
      |FROM (SELECT unnest(list_filter(
      |        regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS tok
      |      FROM documents)""".stripMargin

  /** DuckDB twin of [[docWords]]. */
  private[queries] val docWordsSql: String =
    """SELECT doc_id, regexp_replace(tok, '[^a-z0-9]+', '', 'g') AS word
      |FROM (SELECT doc_id, unnest(list_filter(
      |        regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS tok
      |      FROM documents)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // W1-W5: full word-count, ordered by word.
    "wc_word_counts" -> ((s, d) => {
      import s.implicits._
      words(s, d)
        .groupBy($"word").agg(count(lit(1)).as("cnt"))
        .orderBy($"word")
    }),

    // W5 + L9: top-k words, tie-break (cnt DESC, word ASC).
    "wc_topk" -> ((s, d) => {
      import s.implicits._
      words(s, d)
        .groupBy($"word").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("word"))
        .limit(20)
    }),

    // Per-document token stats (count + exact distinct).
    "wc_doc_stats" -> ((s, d) => {
      import s.implicits._
      tokens(s, d)
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tokens"), countDistinct($"tok").as("n_distinct"))
        .orderBy($"doc_id")
    }),

    // W6: formatted projection `%-12s :: %4d` (word_count.go:43-45).
    // Oracle-checked: DuckDB printf follows the same C-printf width/
    // left-justify rules as java.util.Formatter for %s/%d, so the lines
    // compare byte-for-byte; exact formatting also golden-tested in
    // JobsSpec.
    "wc_formatted" -> ((s, d) => {
      import s.implicits._
      words(s, d)
        .groupBy($"word").agg(count(lit(1)).as("cnt"))
        .select(format_string("%-12s :: %4d", $"word", $"cnt").as("line"))
        .orderBy($"line")
    }),

    // Word bigrams (adjacent-token 2-grams), top 20.
    "wc_bigrams" -> ((s, d) => {
      import s.implicits._
      t(s, d, "documents")
        .select(expr("filter(split(lower(text), '\\\\s+'), x -> x != '')").as("toks"))
        .filter(size($"toks") >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(toks) - 1)," +
            " i -> element_at(toks, i) || ' ' || element_at(toks, i + 1))")).as("bigram"))
        .groupBy($"bigram").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("bigram"))
        .limit(20)
    }))

  val oracle: Map[String, String] = Map(
    "wc_word_counts" ->
      """WITH tk AS (
        |  SELECT regexp_replace(tok, '[^a-z0-9]+', '', 'g') AS word
        |  FROM (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
        |        FROM documents) WHERE tok <> '')
        |SELECT word, COUNT(*) AS cnt FROM tk GROUP BY word ORDER BY word""".stripMargin,

    "wc_topk" ->
      """WITH tk AS (
        |  SELECT regexp_replace(tok, '[^a-z0-9]+', '', 'g') AS word
        |  FROM (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
        |        FROM documents) WHERE tok <> '')
        |SELECT word, COUNT(*) AS cnt FROM tk GROUP BY word
        |ORDER BY cnt DESC, word LIMIT 20""".stripMargin,

    "wc_doc_stats" ->
      """SELECT doc_id, COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS n_distinct
        |FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
        |      FROM documents) WHERE tok <> ''
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "wc_formatted" ->
      """WITH tk AS (
        |  SELECT regexp_replace(tok, '[^a-z0-9]+', '', 'g') AS word
        |  FROM (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
        |        FROM documents) WHERE tok <> '')
        |SELECT printf('%-12s :: %4d', word, COUNT(*)) AS line
        |FROM tk GROUP BY word ORDER BY line""".stripMargin,

    "wc_bigrams" ->
      """WITH d AS (
        |  SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
        |                     x -> x <> '') AS toks
        |  FROM documents),
        |b AS (
        |  SELECT toks[i] || ' ' || toks[i + 1] AS bigram
        |  FROM d, unnest(generate_series(1, len(toks) - 1)) AS t(i)
        |  WHERE len(toks) >= 2)
        |SELECT bigram, COUNT(*) AS cnt FROM b GROUP BY bigram
        |ORDER BY cnt DESC, bigram LIMIT 20""".stripMargin)
}
