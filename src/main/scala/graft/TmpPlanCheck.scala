package graft

import org.apache.spark.sql.SparkSession

// throwaway: executed-plan audit after action (AQE final plan)
object TmpPlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args.tail) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      println(s"========== $n ==========")
      println(plan)
      println(s"[scan-count] $n = " +
        plan.linesIterator.count(_.contains("Scan parquet")))
    }
    spark.stop()
  }
}
