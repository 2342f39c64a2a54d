package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in sketch substitution: when `spark.graft.approxDistinct=true`,
  * every single-column `count(DISTINCT x)` in the session rewrites to a
  * HyperLogLog++ estimate (`approx_count_distinct` semantics, default
  * 5% relative SD) — ANY query, including plain `spark.sql` strings,
  * with no source change.
  *
  * Why this is an optimizer rule and not a helper function: at 100 TB
  * an exact distinct count is a full shuffle of every distinct key
  * (state ∝ cardinality), while the HLL++ aggregate is a fixed-width
  * mergeable buffer (state O(1), map-side partial combine does almost
  * all the work — the same trade the declared sketch family
  * demonstrates data-side). Flipping one session flag converts every
  * dashboard-style distinct in a workload to the sketch plan, and
  * flipping it back restores exactness — the two plans are otherwise
  * identical, so the flag IS the cost/exactness dial.
  *
  * Scope guards: only single-child counts rewrite (multi-column
  * `count(DISTINCT a, b)` has no single-sketch equivalent and stays
  * exact); the FILTER clause and the result attribute id are preserved
  * by `copy`, so downstream references and output names are untouched.
  * Injected via [[graft.GraftExtensions]] into the operator-
  * optimization batch, which runs BEFORE Spark's
  * RewriteDistinctAggregates expands the distinct into Expand+double
  * aggregation — the rewrite sees the logical `Count(DISTINCT)` intact.
  */
object ApproxDistinctRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.approxDistinct", "false").toBoolean)
      plan
    else plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          // Seq(...) not ::-cons: Count.children is an ArraySeq, which
          // the List cons extractor silently fails to match
          case ae @ AggregateExpression(Count(Seq(child)), _, true, _, _) =>
            ae.copy(aggregateFunction = HyperLogLogPlusPlus(child),
              isDistinct = false)
        }
    }
}
