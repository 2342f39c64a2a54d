package graft.engine

import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapred.{FileSplit, TextInputFormat}
import org.apache.spark.Partitioner
import org.apache.spark.rdd.{HadoopRDD, RDD}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's single-byte shuffle partitioner
  * (`/root/reference/sn/mr_actions.go:226`):
  * `int(strings.ToLower(key[0:1])[0]) % R` — the FIRST BYTE is sliced
  * first, then lowered, so only ASCII 'A'-'Z' fold (a multi-byte UTF-8
  * lead byte is an invalid 1-byte string that Go's ToLower leaves
  * unchanged). Keys in the reference carry `fmt.Sprintln`'s trailing
  * newline, so an empty-token key is the string "\n" → byte 10.
  */
class FirstBytePartitioner(r: Int) extends Partitioner {
  require(r > 0)
  override def numPartitions: Int = r
  override def getPartition(key: Any): Int = key match {
    case (k: String, _) => FirstBytePartitioner.of(k, r) // composite (key, value)
    case k: String      => FirstBytePartitioner.of(k, r)
    case null           => FirstBytePartitioner.of("", r)
    case other          => FirstBytePartitioner.of(other.toString, r)
  }
}

object FirstBytePartitioner {
  def of(key: String, r: Int): Int = {
    val b =
      if (key == null || key.isEmpty) '\n'.toInt // Sprintln newline artifact
      else {
        val first = key.getBytes("UTF-8")(0) & 0xff
        if (first >= 'A' && first <= 'Z') first + 32 else first
      }
    b % r
  }
}

/** The MapReduce dataflow core (SURVEY.md §2.2 M1-M5) on Spark's
  * sort-based shuffle:
  *
  * `lines` (S1) → `flatMap fMap` (M1) →
  * `repartitionAndSortWithinPartitions(FirstBytePartitioner)` (M2+M3;
  * Spark's ExternalSorter does the spill + k-way merge the reference
  * hand-rolls at `sn/mr_actions.go:425-485`) →
  * `mapPartitions fReduce` (M5, whole sorted partition per call).
  *
  * Everything is executor-side and spillable — no driver collects — so
  * the same pipeline shape holds on a 1000-executor cluster.
  */
object MrPipeline {

  /** S1: scan text files line-by-line with (file, lineNo) tagging.
    * Line numbers come from TextInputFormat byte offsets (exact and
    * split-stable, unlike monotonically_increasing_id) ranked per file. */
  def lines(spark: SparkSession, paths: Seq[String]): Dataset[MrLine] = {
    import spark.implicits._
    val rdd = spark.sparkContext
      .hadoopFile(paths.mkString(","), classOf[TextInputFormat],
        classOf[LongWritable], classOf[Text])
      .asInstanceOf[HadoopRDD[LongWritable, Text]]
    // full path, not basename: same-named files in different directories
    // must stay distinct window partitions
    val tagged = rdd.mapPartitionsWithInputSplit { (split, it) =>
      val file = split.asInstanceOf[FileSplit].getPath.toUri.getPath
      it.map { case (off, txt) => (file, off.get(), txt.toString) }
    }
    val w = Window.partitionBy($"file").orderBy($"off")
    tagged.toDF("file", "off", "line")
      .withColumn("lineNo", row_number().over(w).cast("long") - 1)
      .select($"file", $"lineNo", $"line")
      .as[MrLine]
  }

  /** Adapt a columnar table to the line-oriented map input contract. */
  def tableLines(df: DataFrame, file: String, idCol: String, textCol: String)
      (implicit spark: SparkSession): Dataset[MrLine] = {
    import spark.implicits._
    df.select(lit(file).as("file"), col(idCol).cast("long").as("lineNo"),
        col(textCol).as("line"))
      .as[MrLine]
  }

  /** M1: the map phase. */
  def mapped(input: Dataset[MrLine], job: MrJob): RDD[(String, String)] =
    input.rdd.flatMap(l => job.fMap(l.file, l.lineNo, l.line))

  /** M2+M3/M4: first-byte partitioning with a (key, value) sort — one
    * sort-based shuffle, identical topology to the reference's
    * mapper-sort + push-shuffle + reducer k-way merge. */
  def shuffled(kvs: RDD[(String, String)], r: Int): RDD[(String, String)] = {
    implicit val ord: Ordering[(String, String)] =
      Ordering.Tuple2(Ordering.String, Ordering.String)
    kvs.map(kv => (kv, null: Null))
      .repartitionAndSortWithinPartitions(new FirstBytePartitioner(r))
      .map(_._1)
  }

  /** Full pipeline → (reducerId, outputLine) rows, in reducer order. */
  def run(spark: SparkSession, input: Dataset[MrLine], job: MrJob): DataFrame = {
    import spark.implicits._
    shuffled(mapped(input, job), job.R)
      .mapPartitionsWithIndex { (rid, it) => job.fReduce(it).map((rid, _)) }
      .toDF("rid", "line")
  }
}
