package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session extensions: installs the grouped-top-k rewrite
  * (window+filter → native bounded-heap operator, graft.plans) into the
  * optimizer and planner, and registers the native `cosine_similarity`
  * expression in the function registry — every session (and every
  * `spark.sql` string) gets them, no per-session registration call.
  * Enable with `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.TopKPerKeyRule)
    e.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_similarity"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.CosineSimilarity].getName, "cosine_similarity"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.CosineSimilarity(exprs.head, exprs(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.DotProduct].getName, "dot_product"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.DotProduct(exprs.head, exprs(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("l2_norm"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.L2Norm].getName, "l2_norm"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.L2Norm(exprs.head)))
  }
}
