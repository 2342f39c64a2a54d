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

    // Faithful log_analyzer report over synthesized crawler-log lines
    // (deterministic per-reducer report; no SQL oracle — rows-only check;
    // covered by golden-file unit tests instead).
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

  // mr_log_report is intentionally absent: report lines are not
  // SQL-expressible; the driver records a rows-only check for it.
  val oracle: Map[String, String] = Map(
    "mr_word_count" -> TextWordCount.oracle("wc_word_counts"))
}
