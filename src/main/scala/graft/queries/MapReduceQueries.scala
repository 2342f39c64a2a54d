package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.engine.{MrJob, MrPipeline}
import graft.engine.jobs.{LogAnalyzerJob, WordCountJob}

/** Declared queries that run through the faithful MapReduce engine
  * (SURVEY.md §2.2 M1-M5) end-to-end — flatMap → first-byte partitioner →
  * sort-based shuffle → whole-partition reduce — proving the engine path
  * against the same DuckDB oracle as the declarative variants.
  */
object MapReduceQueries {

  /** word_count through the engine, with a structured reduce that emits
    * "word\tcount" lines (per-key sum over the sorted partition — the
    * streaming adjacent-run form of `word_count.go:26-41`). */
  private object StructuredWordCount extends MrJob {
    val R = 26
    override def fMap(file: String, lineNo: Long, line: String): Iterator[(String, String)] =
      WordCountJob.fMap(file, lineNo, line)
    override def fReduce(partition: Iterator[(String, String)]): Iterator[String] =
      WordCountJob.sumByKey(partition).map { case (k, v) => s"$k\t$v" }
  }

  /** Inverted index through the engine — the third canonical MapReduce
    * job (after the reference's two example plugins): map emits
    * (normalized token, doc id); reduce walks the sorted partition's
    * adjacent runs with O(1) state, emitting per-token posting-list
    * summaries (n_postings, n_docs, min/max doc). Shows the plugin
    * contract generalizes beyond the shipped examples with zero engine
    * changes. */
  private object InvertedIndexJob extends MrJob {
    val R = 26
    override def fMap(file: String, lineNo: Long, line: String): Iterator[(String, String)] =
      WordCountJob.fMap(file, lineNo, line)
        .map { case (tok, _) => (tok, lineNo.toString) }
    override def fReduce(partition: Iterator[(String, String)]): Iterator[String] = {
      val it = partition.buffered
      new Iterator[String] {
        override def hasNext: Boolean = it.hasNext
        override def next(): String = {
          val key = it.head._1
          var n = 0L; var nDocs = 0L
          var minD = Long.MaxValue; var maxD = Long.MinValue; var prev = -1L
          while (it.hasNext && it.head._1 == key) {
            it.next()._2.trim.toLongOption.foreach { d =>
              n += 1
              // the shuffle sorts values lexicographically per key, which
              // is enough for distinct counting: equal doc-id strings are
              // adjacent under ANY total order (min/max don't care)
              if (d != prev) { nDocs += 1; prev = d }
              if (d < minD) minD = d
              if (d > maxD) maxD = d
            }
          }
          // all-unparsable key (impossible from our fMap, but the
          // skip-on-parse-error contract shouldn't leak Long sentinels)
          if (n == 0) s"$key\t0\t0\t0\t0"
          else s"$key\t$n\t$nDocs\t$minD\t$maxD"
        }
      }
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full engine word-count over documents.text; output parsed back to
    // (word, cnt) and globally ordered — oracle-identical to the
    // declarative wc_word_counts.
    "mr_word_count" -> ((s, d) => {
      import s.implicits._
      val input = MrPipeline.tableLines(
        t(s, d, "documents"), "documents", "doc_id", "text")(s)
      MrPipeline.run(s, input, StructuredWordCount)
        .select(
          split($"line", "\t").getItem(0).as("word"),
          split($"line", "\t").getItem(1).cast("long").as("cnt"))
        .orderBy($"word")
    }),

    // Inverted-index posting summaries through the full engine path,
    // parsed back to typed columns and oracle-checked.
    "mr_inverted_index" -> ((s, d) => {
      import s.implicits._
      val input = MrPipeline.tableLines(
        t(s, d, "documents"), "documents", "doc_id", "text")(s)
      MrPipeline.run(s, input, InvertedIndexJob)
        .select(
          split($"line", "\t").getItem(0).as("word"),
          split($"line", "\t").getItem(1).cast("long").as("n_postings"),
          split($"line", "\t").getItem(2).cast("long").as("n_docs"),
          split($"line", "\t").getItem(3).cast("long").as("min_doc"),
          split($"line", "\t").getItem(4).cast("long").as("max_doc"))
        .orderBy($"word")
    }),

    // Faithful log_analyzer report over synthesized crawler-log lines —
    // deterministic per-reducer reports, oracle-checked down to the
    // exact report strings (see the oracle's scaladoc), plus
    // golden-file unit tests.
    "mr_log_report" -> ((s, d) => {
      import s.implicits._
      val lines = t(s, d, "events")
        .select(lit("events").as("file"), $"event_id".cast("long").as("lineNo"),
          concat_ws(" ",
            date_format($"ts", "yyyy-MM-dd"), date_format($"ts", "HH:mm:ss"),
            concat(lit("crawler-"), ($"user_id" % 7).cast("string")),
            when($"user_id" % 7 === 0,
              concat(lit("http://10.0.0."), ($"user_id" % 256).cast("string"),
                lit(":8080/p/"), $"event_id".cast("string")))
              .otherwise(concat(
                lit("https://"), $"event_type", lit(".site"),
                ($"user_id" % 5).cast("string"), lit(".example.com/p/"),
                $"event_id".cast("string")))).as("line"))
        .as[graft.engine.MrLine]
      MrPipeline.run(s, lines, LogAnalyzerJob)
        .withColumn("out_line",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy($"rid").orderBy($"line")))
        .select($"rid", $"out_line", $"line")
        .orderBy($"rid", $"out_line")
    }))

  // mr_log_report IS oracle-checked, report formatting and all: every
  // synthesized key starts with 'c' (crawler-N), so the first-byte
  // partitioner routes ALL keys to rid ascii('c') % 10 = 9 — one real
  // report plus nine empty-partition reports (two zero-count lines
  // each, fReduce runs on every partition). The SQL reproduces the
  // L2-L6 normalization, the three per-key counts, the pinned
  // (count DESC, key ASC) top-k, and the exact report strings.
  val oracle: Map[String, String] = Map(
    "mr_word_count" -> TextWordCount.oracle("wc_word_counts"),

    "mr_inverted_index" ->
      """WITH tk AS (
        |  SELECT doc_id, regexp_replace(tok, '[^a-z0-9]+', '', 'g') AS word
        |  FROM (SELECT doc_id,
        |          unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
        |        FROM documents) WHERE tok <> '')
        |SELECT word, COUNT(*) AS n_postings,
        |  COUNT(DISTINCT doc_id) AS n_docs,
        |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        |FROM tk GROUP BY word ORDER BY word""".stripMargin,

    "mr_log_report" ->
      """WITH raw AS (
        |  SELECT 'crawler-' || (user_id % 7) AS crawler,
        |    CASE WHEN user_id % 7 = 0
        |      THEN '10.0.0.' || (user_id % 256) || ':8080/p/' || event_id
        |      ELSE event_type || '.site' || (user_id % 5) ||
        |           '.example.com/p/' || event_id
        |    END AS noscheme
        |  FROM events),
        |parts AS (
        |  SELECT crawler,
        |    split_part(noscheme, '/', 1) AS domain0,
        |    substr(noscheme, strpos(noscheme, '/') + 1) AS path
        |  FROM raw),
        |norm AS (
        |  SELECT crawler,
        |    CASE WHEN regexp_matches(domain0, '^[0-9]')
        |         THEN regexp_replace(domain0, ':[0-9]*$', '')
        |         ELSE CASE WHEN len(string_split(domain0, '.')) > 2
        |                   THEN regexp_replace(domain0, '^[^.]*\.', '')
        |                   ELSE domain0 END
        |    END AS domain,
        |    path
        |  FROM parts),
        |crawler_counts AS (SELECT crawler, COUNT(*) AS n FROM norm
        |                   GROUP BY crawler),
        |domain_counts AS (SELECT domain, COUNT(*) AS n FROM norm
        |                  GROUP BY domain),
        |uniq AS (SELECT (SELECT COUNT(DISTINCT domain || path) FROM norm)
        |       + (SELECT COUNT(DISTINCT domain) FROM norm) AS u_urls,
        |       (SELECT COUNT(DISTINCT domain) FROM norm) AS u_domains),
        |top_d AS (SELECT domain FROM domain_counts
        |          ORDER BY n DESC, domain LIMIT 10),
        |top_c AS (SELECT crawler FROM crawler_counts
        |          ORDER BY n DESC, crawler LIMIT 5),
        |report9 AS (
        |  SELECT '* Unique URLs:    ' || u_urls AS line FROM uniq
        |  UNION ALL SELECT '* Unique Domains: ' || u_domains FROM uniq
        |  UNION ALL SELECT '* Top ' || (SELECT COUNT(*) FROM top_d)
        |            || ' Websites:'
        |  UNION ALL SELECT '    - ' || domain FROM top_d
        |  UNION ALL SELECT '* Top ' || (SELECT COUNT(*) FROM top_c)
        |            || ' Crawlers:'
        |  UNION ALL SELECT '    - ' || crawler FROM top_c),
        |empties AS (
        |  SELECT rid, l FROM range(9) t(rid),
        |    (VALUES ('* Unique URLs:    0'), ('* Unique Domains: 0')) v(l)),
        |all_lines AS (
        |  SELECT CAST(rid AS INT) AS rid, l AS line FROM empties
        |  UNION ALL SELECT 9, line FROM report9)
        |SELECT rid,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY rid ORDER BY line) AS INT)
        |    AS out_line,
        |  line
        |FROM all_lines ORDER BY rid, out_line""".stripMargin)
}
