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
}
