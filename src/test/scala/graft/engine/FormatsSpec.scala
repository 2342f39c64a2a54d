package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.Tables.t

/** Source/sink format coverage beyond parquet: CSV and JSON round-trips
  * preserve the data (schemas supplied explicitly on read — schema
  * inference is a scan we would never pay at 100 TB). */
class FormatsSpec extends SparkSpec {

  private lazy val base = {
    import spark.implicits._
    t(spark, sf(), "events")
      .select($"event_id", $"user_id", $"event_type", $"value",
        unix_micros($"ts").as("ts_us"))
  }

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("event_type", StringType), StructField("value", DoubleType),
    StructField("ts_us", LongType)))

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("event_id").collect().toSeq

  test("csv round-trip") {
    val dir = Files.createTempDirectory("graft_csv").resolve("events").toString
    base.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(schema).csv(dir)
    assert(sortedRows(back) == sortedRows(base))
  }

  test("json round-trip") {
    val dir = Files.createTempDirectory("graft_json").resolve("events").toString
    base.write.json(dir)
    val back = spark.read.schema(schema).json(dir)
    assert(sortedRows(back) == sortedRows(base))
  }

  test("orc round-trip") {
    val dir = Files.createTempDirectory("graft_orc").resolve("events").toString
    base.write.orc(dir)
    val back = spark.read.schema(schema).orc(dir)
    assert(sortedRows(back) == sortedRows(base))
  }

  test("hive-style partitioned write is pruned at the scan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_part").resolve("events").toString
    t(spark, sf(), "events")
      .select($"event_id", $"user_id", $"event_type")
      .write.partitionBy("event_type").parquet(dir)
    val one = spark.read.parquet(dir).filter($"event_type" === "click")
    // the partition filter must bind at file listing, not as a data filter
    val scan = one.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    assert(scan.partitionFilters.nonEmpty,
      s"partition pruning did not engage:\n${one.queryExecution.executedPlan}")
    val expect = t(spark, sf(), "events").filter($"event_type" === "click").count()
    assert(one.count() == expect)
  }

  test("predicate pushdown and column pruning reach the parquet scan") {
    import spark.implicits._
    val q = graft.SparkEntry.queries("q6_revenue_delta")(spark, sf())
    q.collect()
    // AQE hides the scan inside leaf QueryStageExec nodes — walk into them
    def findScans(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        findScans(a.executedPlan)
      case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        findScans(qs.plan)
      case other => other.children.flatMap(findScans)
    }
    val scans = findScans(q.queryExecution.executedPlan)
    assert(scans.nonEmpty)
    val s = scans.head
    // all three q6 predicates push to parquet row-group filtering
    assert(s.metadata("PushedFilters").contains("l_discount"),
      s.metadata("PushedFilters"))
    assert(s.metadata("PushedFilters").contains("l_shipdate"))
    assert(s.metadata("PushedFilters").contains("l_quantity"))
    // and the scan schema is pruned to the referenced columns only
    val readCols = s.schema.fieldNames.toSet
    assert(readCols.subsetOf(
      Set("l_extendedprice", "l_discount", "l_shipdate", "l_quantity")),
      s"scan reads more than it needs: $readCols")
  }

  test("malformed records: PERMISSIVE accounts, DROPMALFORMED skips, FAILFAST throws") {
    // the reference's disposition for bad data is per-transfer checksum
    // verify + skip-on-parse-error inside plugins (SURVEY.md §2.2 M10);
    // Spark's source-level contract is the read mode — pin all three so
    // a pipeline can CHOOSE accounting over silent drops at 100 TB
    val dir = Files.createTempDirectory("graft_badjson").toString
    val f = new java.io.PrintWriter(s"$dir/part.json")
    try {
      f.println("""{"event_id": 1, "event_type": "view"}""")
      f.println("""{"event_id": 2, "event_type": oops not json""")
      f.println("""{"event_id": 3, "event_type": "click"}""")
    } finally f.close()
    val s = StructType(Seq(
      StructField("event_id", LongType),
      StructField("event_type", StringType),
      StructField("_corrupt_record", StringType)))

    val permissive = spark.read.schema(s)
      .option("mode", "PERMISSIVE").json(dir).cache()
    try {
      assert(permissive.count() == 3)
      val bad = permissive.filter(col("_corrupt_record").isNotNull).collect()
      assert(bad.length == 1 && bad.head.getString(2).contains("oops"),
        s"corrupt row must surface verbatim, got ${bad.toSeq}")

      val dropped = spark.read.schema(s)
        .option("mode", "DROPMALFORMED").json(dir)
        .select("event_id").collect().map(_.getLong(0)).sorted
      assert(dropped.toSeq == Seq(1L, 3L))

      intercept[org.apache.spark.SparkException] {
        spark.read.schema(s)
          .option("mode", "FAILFAST").json(dir).count()
      }
    } finally permissive.unpersist()
  }

  test("schema evolution: mergeSchema unifies columns appended over time") {
    // long-lived tables accrete columns; old files must read with nulls
    // for columns they predate, new files keep their values, and the
    // partition column survives the merge
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "a")).toDF("id", "v1").write.parquet(s"$dir/p=1")
    Seq((2L, "b", 3.5)).toDF("id", "v1", "v2").write.parquet(s"$dir/p=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.toSet == Set("id", "v1", "v2", "p"))
    val rows = merged.orderBy("id").collect()
    val v2i = merged.schema.fieldIndex("v2")
    assert(rows.length == 2)
    assert(rows.head.isNullAt(v2i), "pre-evolution file must read v2 as null")
    assert(rows(1).getDouble(v2i) == 3.5)
  }
}
