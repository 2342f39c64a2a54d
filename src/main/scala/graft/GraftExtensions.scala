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

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  /** One injection per function, with an arity check the raw builder
    * lambda would not give (a 3-arg call would otherwise silently bind
    * the first two and DROP the third — wrong results, no error). */
  private def inject(e: SparkSessionExtensions, name: String, clazz: Class[_],
      arity: Int)(builder: Seq[Expression] => Expression): Unit =
    e.injectFunction((FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      (exprs: Seq[Expression]) => {
        if (exprs.length != arity)
          throw new IllegalArgumentException(
            s"$name requires exactly $arity argument(s), got ${exprs.length}")
        builder(exprs)
      }))

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.TopKPerKeyRule)
    e.injectOptimizerRule(_ => graft.plans.ApproxDistinctRule)
    e.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    inject(e, "cosine_similarity", classOf[graft.functions.CosineSimilarity], 2)(
      xs => graft.functions.CosineSimilarity(xs.head, xs(1)))
    inject(e, "dot_product", classOf[graft.functions.DotProduct], 2)(
      xs => graft.functions.DotProduct(xs.head, xs(1)))
    inject(e, "l2_norm", classOf[graft.functions.L2Norm], 1)(
      xs => graft.functions.L2Norm(xs.head))
  }
}
