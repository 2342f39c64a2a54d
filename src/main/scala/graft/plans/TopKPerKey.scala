package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, EqualTo, Expression, LessThan, LessThanOrEqual, Literal, RowNumber, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UnaryNode, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, IntegerType}

/** Grouped top-k as a first-class operator (SURVEY.md L9/L10: the
  * reference's per-shard top-k reports).
  *
  * Spark expresses "top k rows per key" as
  * `Filter(row_number() OVER (PARTITION BY keys ORDER BY ord) <= k)`,
  * which plans to a full `WindowExec`: a sort on (keys ++ ord), every
  * group fully buffered before a single row is emitted, then k·groups
  * rows survive the filter. At 100 TB that buffers and ranks the whole
  * input to keep a sliver.
  *
  * `TopKPerKeyRule` (optimizer rule) recognizes exactly that logical
  * pattern and replaces it with [[TopKPerKeyNode]], which
  * [[TopKPerKeyStrategy]] plans as [[TopKPerKeyExec]]: the same shuffle
  * on the keys, a grouping sort on the keys ONLY (cheaper comparisons
  * than keys ++ ord, and spillable via Spark's own `SortExec` /
  * `ExternalSorter`), then a single streaming pass holding one k-bounded
  * binary heap at a time — O(k) operator state regardless of key
  * cardinality, no per-group buffering, no rank-then-filter second pass.
  * Semantics (including the emitted row-number column and tie behavior
  * under a non-total order) are identical to the window form.
  *
  * The rewrite declines when:
  *   - `k > 1024` (emitting k·groups rows loses its point; let the sort
  *     do the work),
  *   - the PARTITION BY is empty (global top-N — Spark's own
  *     `LimitPushDownThroughWindow` + `TakeOrderedAndProject` handle it,
  *     and `ClusteredDistribution(Nil)` is rejected by the planner),
  *   - any partition key is Float/Double (WindowExec sees keys through
  *     `NormalizeFloatingNumbers`, so -0.0/0.0 and NaN bit patterns
  *     group together; byte-wise UnsafeRow grouping would split them),
  *   - the pattern deviates in any other way.
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

  /** Grouping below uses byte-wise UnsafeRow equality; Float/Double keys
    * would split -0.0 vs 0.0 (and NaN payloads) into separate groups,
    * unlike the NormalizeFloatingNumbers-wrapped WindowExec. */
  private def hasFloatingKey(e: Expression): Boolean = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    def loop(dt: DataType): Boolean = dt match {
      case FloatType | DoubleType => true
      case s: StructType          => s.fields.exists(f => loop(f.dataType))
      case a: ArrayType           => loop(a.elementType)
      case m: MapType             => loop(m.keyType) || loop(m.valueType)
      case _                      => false
    }
    loop(e.dataType)
  }

  private def rewrite(cond: Expression, w: Window): Option[LogicalPlan] = {
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(parts, order, _)), _))
          if parts.nonEmpty && !parts.exists(hasFloatingKey) =>
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
  // shuffle clustering each key's rows together
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(partitionExprs) :: Nil

  // grouping sort on the keys only (NOT keys ++ order — the heap replaces
  // the order-by part of the sort). Spark satisfies this with a spillable
  // SortExec, which bounds memory; the streaming pass below then holds a
  // single k-row heap at a time instead of one heap per distinct key.
  private val groupingOrder: Seq[SortOrder] =
    partitionExprs.map(SortOrder(_, Ascending))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    groupingOrder :: Nil

  // rows only move within a partition; report the child's partitioning and
  // the grouping order so downstream operators keyed on the same exprs
  // don't re-shuffle or re-sort
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = groupingOrder

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
      val heapOrd: java.util.Comparator[InternalRow] = ord.reversed()
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      val rnRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)

      // input arrives key-clustered AND key-sorted: stream one group at a
      // time through a single binary max-heap of the k best rows (heap top
      // = worst retained row, evicted first). State is O(k) rows total.
      new Iterator[InternalRow] {
        private var lookahead: InternalRow = if (it.hasNext) it.next() else null
        private var pending: Array[InternalRow] = null
        private var pendingIdx = 0
        private val heap =
          new java.util.PriorityQueue[InternalRow](kk + 1, heapOrd)

        override def hasNext: Boolean =
          (pending != null && pendingIdx < pending.length) || lookahead != null

        override def next(): InternalRow = {
          if (pending == null || pendingIdx >= pending.length) advanceGroup()
          val r = pending(pendingIdx)
          rnRow.update(0, pendingIdx + 1)
          pendingIdx += 1
          outProj(joined(r, rnRow))
        }

        private def advanceGroup(): Unit = {
          val groupKey = keyProj(lookahead).copy()
          heap.clear()
          var row = lookahead
          while (row != null && keyProj(row).equals(groupKey)) {
            if (heap.size() < kk) heap.add(row.copy())
            else if (ord.compare(row, heap.peek()) < 0) {
              heap.poll()
              heap.add(row.copy())
            }
            row = if (it.hasNext) it.next() else null
          }
          lookahead = row
          // heap drains worst-first; fill the rank array back-to-front
          val rows = new Array[InternalRow](heap.size())
          var i = rows.length - 1
          while (i >= 0) { rows(i) = heap.poll(); i -= 1 }
          pending = rows
          pendingIdx = 0
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
