package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, EqualTo, Expression, LessThan, LessThanOrEqual, Literal, RowNumber, SortOrder, UnsafeProjection, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UnaryNode, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Grouped top-k as a first-class operator (SURVEY.md L9/L10: the
  * reference's per-shard top-k reports).
  *
  * Spark expresses "top k rows per key" as
  * `Filter(row_number() OVER (PARTITION BY keys ORDER BY ord) <= k)`,
  * which plans to a full `WindowExec`: every group is fully buffered and
  * sorted before a single row is emitted, then k·groups rows survive the
  * filter. At 100 TB that is a sort of the whole input to keep a sliver.
  *
  * `TopKPerKeyRule` (optimizer rule) recognizes exactly that logical
  * pattern and replaces it with [[TopKPerKeyNode]], which
  * [[TopKPerKeyStrategy]] plans as [[TopKPerKeyExec]]: one shuffle on the
  * keys (same as the window), then a streaming pass holding only a
  * k-bounded binary heap per key — O(keys·k) state instead of a full
  * sort, no second pass. Semantics (including the emitted row-number
  * column and tie behavior under a non-total order) are identical to the
  * window form. The rewrite declines when k > 1024 (heap state could
  * rival the sort) or the pattern deviates in any way.
  */
case class TopKPerKeyNode(
    k: Int,
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    rnAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rnAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rnAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKeyRule extends Rule[LogicalPlan] {

  private val MaxK = 1024

  /** Filter(rn cmp lit, [Project(passthrough)], Window([rn := row_number()
    * OVER (...)], ...)) → TopKPerKeyNode (+ Project back on top). */
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, w).getOrElse(f)
    case f @ Filter(cond, p @ Project(projList, w: Window))
        if projList.forall(_.isInstanceOf[Attribute]) =>
      rewrite(cond, w)
        .map(topk => Project(projList, topk))
        .getOrElse(f)
  }

  private def rewrite(cond: Expression, w: Window): Option[LogicalPlan] = {
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(parts, order, _)), _)) =>
        val rn = a.toAttribute
        limitFromCond(cond, rn).collect {
          case k if k >= 1 && k <= MaxK =>
            TopKPerKeyNode(k, parts, order, rn, w.child)
          }
      case _ => None
    }
  }

  /** `rn <= k` / `rn < k` / `rn = 1` / literal-flipped forms. */
  private def limitFromCond(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(r: Attribute, Literal(k: Int, IntegerType))
        if r.semanticEquals(rn) => Some(k)
      case LessThan(r: Attribute, Literal(k: Int, IntegerType))
        if r.semanticEquals(rn) => Some(k - 1)
      case EqualTo(r: Attribute, Literal(1, IntegerType))
        if r.semanticEquals(rn) => Some(1)
      case EqualTo(Literal(1, IntegerType), r: Attribute)
        if r.semanticEquals(rn) => Some(1)
      case _ => None
    }
}

object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, parts, order, rnAttr, child) =>
      TopKPerKeyExec(k, parts, order, rnAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    k: Int,
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    rnAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rnAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rnAttr)

  // same distribution requirement as the WindowExec it replaces: one
  // shuffle clustering each key's rows together (no ordering required —
  // the heap replaces the sort)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(partitionExprs) :: Nil

  // rows only move within a partition; report the child's partitioning so
  // downstream operators keyed on the same exprs don't re-shuffle
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val partExprs = partitionExprs
    val sortOrder = order
    val kk = k
    val outAttrs = output
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      val ord = GenerateOrdering.generate(sortOrder, childOutput)
      // downstream exchanges/serializers require UnsafeRow — convert the
      // (childRow ++ rn) join through an unsafe projection (like ProjectExec,
      // the buffer is reused; row-at-a-time consumers are fine)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      // per key: binary max-heap of the k best rows (heap top = worst
      // retained row, evicted first)
      val heaps = new java.util.HashMap[InternalRow,
        java.util.PriorityQueue[InternalRow]]()
      val heapOrd: java.util.Comparator[InternalRow] = ord.reversed()
      it.foreach { row =>
        val key = keyProj(row).copy()
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk + 1, heapOrd)
          heaps.put(key, heap)
        }
        if (heap.size() < kk) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { heap =>
        val rows = new Array[InternalRow](heap.size())
        var i = rows.length - 1
        while (i >= 0) { rows(i) = heap.poll(); i -= 1 } // heap drains worst-first
        rows.iterator.zipWithIndex.map { case (r, idx) =>
          outProj(new org.apache.spark.sql.catalyst.expressions.JoinedRow(r,
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              Array[Any](idx + 1)))): InternalRow
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
