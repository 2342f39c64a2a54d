package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables.t

class CosineExprSpec extends SparkSpec {

  private def emb = t(spark, sf(), "embeddings")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  test("native expression is bit-identical to the HOF composition") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val q = emb.filter($"vec_id" === 0).select($"v".as("q"))
    val both = emb.crossJoin(broadcast(q))
      .select($"vec_id",
        expr("cosine_similarity(v, q)").as("native"),
        graft.queries.Similarity.cosineHof("v", "q").as("hof"))
      .collect()
    assert(both.length == 500)
    both.foreach { r =>
      // exact bit equality — same fold order, no tolerance needed
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"row $r")
    }
  }

  test("null input propagates null; self-similarity is 1.0") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val r = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
      .select(expr("cosine_similarity(a, b)"))
      .collect()
    assert(r.head.isNullAt(0))
    val self = emb.limit(10)
      .select(round(expr("cosine_similarity(v, v)"), 9).as("s"))
      .collect()
    assert(self.forall(_.getDouble(0) == 1.0))
  }

  test("type mismatch is an analysis-time error, not runtime") {
    import spark.implicits._
    GraftFunctions.register(spark)
    intercept[AnalysisException] {
      Seq(("x", "y")).toDF("a", "b")
        .select(expr("cosine_similarity(a, b)")).collect()
    }
  }

  test("dot_product / l2_norm: HOF parity, nulls, length mismatch") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.0, 0.0), Seq(0.0, 0.0))).toDF("a", "b")
    val r = df.selectExpr(
      "dot_product(a, b) AS d",
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x) AS dh",
      "l2_norm(a) AS n",
      "sqrt(aggregate(a, 0D, (acc, x) -> acc + x * x)) AS nh").collect()
    r.foreach { row =>
      assert(row.getDouble(0) == row.getDouble(1))
      assert(row.getDouble(2) == row.getDouble(3))
    }
    // length mismatch and null element → NULL (zip_with/fold contract)
    val edge = spark.sql(
      "SELECT dot_product(array(1D), array(1D, 2D)) AS m, " +
        "dot_product(array(1D, cast(null as double)), array(1D, 2D)) AS nl, " +
        "l2_norm(array(cast(null as double))) AS ln").collect().head
    assert(edge.isNullAt(0) && edge.isNullAt(1) && edge.isNullAt(2))
  }

  test("wrong arity is an error, not silent argument dropping") {
    val e = intercept[Exception] {
      spark.sql("SELECT dot_product(array(1D), array(1D), array(1D))").collect()
    }
    assert(e.getMessage.contains("exactly 2"), e.getMessage)
    val e1 = intercept[Exception] { spark.sql("SELECT l2_norm()").collect() }
    assert(e1.getMessage.contains("exactly 1"), e1.getMessage)
  }

  test("extension-injected: available in a fresh session without register()") {
    // newSession() has a fresh function registry (temp functions from
    // other specs do NOT carry over) but re-applies GraftExtensions —
    // resolving here proves the injectFunction path, not a leftover
    // createOrReplaceTempFunction
    val fresh = spark.newSession()
    val r = fresh.sql(
      "SELECT round(cosine_similarity(array(1D, 0D), array(1D, 0D)), 6) AS c")
      .collect().head.getDouble(0)
    assert(r == 1.0)
  }

  test("participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = emb.crossJoin(broadcast(emb.filter($"vec_id" === 0)
        .select($"v".as("q"))))
      .select(expr("cosine_similarity(v, q)").as("s"))
    df.collect() // finalize the adaptive plan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val fin = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
    // `*(n)` prefixes mark WholeStageCodegen spans (the codegen nodes
    // themselves are hidden inside AQE QueryStageExec leaves); the cosine
    // projection must carry one.
    val line = fin.toString.linesIterator
      .find(_.contains("cosine_similarity")).getOrElse("")
    assert(line.contains("*("), s"cosine projection not codegen'd:\n$fin")
  }
}
