package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session extensions: installs the grouped-top-k rewrite
  * (window+filter → native bounded-heap operator, graft.plans) into the
  * optimizer and planner. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.TopKPerKeyRule)
    e.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}
