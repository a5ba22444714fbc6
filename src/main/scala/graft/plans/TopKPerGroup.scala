package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Native grouped top-k: the deepest extension tier (custom `LogicalPlan` +
  * `Rule[LogicalPlan]` + `Strategy` + `SparkPlan`), replacing the
  * sort-the-whole-partition window plan with a bounded per-group heap.
  *
  * The window form of top-k-per-group (`row_number().over(partitionBy/orderBy)
  * ... filter(rn <= k)`) must SORT every row of every partition before the
  * rank filter throws away all but k per group — at 100 TB that sort (and its
  * spills) dominates, even with Spark's own `WindowGroupLimit` pre-filter
  * (which still sorts what survives). This operator instead keeps a size-k
  * heap per group in a single pass: no sort, no spill machinery, memory
  * bounded by (groups-per-partition × k rows).
  *
  * Opt-in and surgical: the rewrite only fires on the marker alias emitted by
  * [[graft.ops.Relational.topKPerGroupNative]] (never on arbitrary user
  * windows), installed either at runtime ([[GraftPlans.install]]) or via
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  *
  * Semantics contract (same as the window form): the ordering must be total
  * within each group (callers include a unique tie-breaker), else ranks among
  * equal rows are arbitrary on both paths.
  */
object GraftPlans {

  /** Alias marker the rewrite rule keys on. */
  private[graft] val RankMarker = "__graft_topk_rn"

  /** Runtime installation of the rule + strategy (idempotent). */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(RewriteMarkedTopK))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteMarkedTopK
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
  }
}

/** Logical node: top-k rows per `groupExprs` group under `orderExprs`, with
  * the 1-based rank appended as `rankAttr` (same output as the Window node it
  * replaces — downstream attribute references stay valid).
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan
) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Rewrite `Filter(marker <= k, Window(row_number as marker))` into
  * [[TopKPerGroup]]. Fires only on the [[GraftPlans.RankMarker]] alias, only
  * for a single row_number window expression, and only for sane k. Runs in
  * the user-provided optimizer batch (after the built-in batches), so it also
  * strips the `WindowGroupLimit` that Spark's own `InferWindowGroupLimit` may
  * have inserted beneath the window by then.
  */
object RewriteMarkedTopK extends Rule[LogicalPlan] {

  private val MaxK = 1 << 16 // heap memory is groups × k rows — keep k sane

  private def rankLimit(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rank) =>
      Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rank) =>
      Some(k - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
          Window(Seq(alias @ Alias(WindowExpression(RowNumber(), spec), name)),
            parts, order, wchild, _))
        if name == GraftPlans.RankMarker && order.nonEmpty =>
      rankLimit(cond, alias.toAttribute) match {
        case Some(k) if k > 0 && k <= MaxK && spec.partitionSpec == parts && spec.orderSpec == order =>
          // InferWindowGroupLimit may have slipped its pre-filter below the
          // window; the heap subsumes it — plan from its child instead.
          val child = wchild match {
            case wgl: WindowGroupLimit => wgl.child
            case c => c
          }
          TopKPerGroup(parts, order, k, alias.toAttribute, child)
        case _ => f
      }
  }
}

/** Plans [[TopKPerGroup]] as [[TopKPerGroupExec]]. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(groups, order, k, rank, child) =>
      TopKPerGroupExec(groups, order, k, rank, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Physical grouped top-k: requires clustering on the group keys (the planner
  * inserts the one hash exchange), then a single un-sorted pass per partition
  * keeping a size-k max-heap per group; each group's survivors are sorted
  * (k·log k on k rows, not n·log n on all rows) and emitted with their rank.
  *
  * Memory contract: retained state is (groups-per-partition × k) copied rows
  * — bounded by k but NOT by group cardinality. The heap state itself is not
  * spillable (evictions must see every group), so the operator REGISTERS its
  * retained bytes with the task memory manager as it grows: co-resident
  * spillable consumers (sorts, aggregates) shrink around it, and if the
  * request cannot be met the task fails with an explicit message naming the
  * fix (raise shuffle partitions so fewer groups land per task) instead of
  * dying on an opaque executor OOM. The window form trades this for a full
  * partition sort whose spills hide the same pressure — with MANY groups per
  * partition prefer more partitions over either form's worst case.
  */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan
) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val limit = k
    val groups = groupExprs
    val order = orderExprs
    val outAttrs = output
    child.execute().mapPartitions ({ iter =>
      val keyProj = UnsafeProjection.create(groups, childOutput)
      val ord = GenerateOrdering.generate(order, childOutput)
      // max-heap per group: the root is the WORST kept row, evicted when a
      // better one arrives. Keys and rows are copied on insert (Spark reuses
      // row buffers across iterator steps).
      val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      val revOrd: java.util.Comparator[InternalRow] = ord.reversed()
      // account the retained heap bytes with the task memory manager: the
      // state can't spill, but registering it makes spillable co-consumers
      // yield and turns an would-be executor OOM into a diagnosable failure
      val taskCtx = org.apache.spark.TaskContext.get()
      val consumer =
        if (taskCtx == null) null
        else new org.apache.spark.memory.MemoryConsumer(
          org.apache.spark.graft.TaskMemoryBridge.manager(taskCtx),
          org.apache.spark.memory.MemoryMode.ON_HEAP) {
          override def spill(size: Long, trigger: org.apache.spark.memory.MemoryConsumer): Long = 0L
        }
      var acquired = 0L
      var retained = 0L
      if (consumer != null)
        taskCtx.addTaskCompletionListener[Unit] { _ =>
          if (acquired > 0) consumer.freeMemory(acquired)
        }
      def track(row: InternalRow, extra: Long): Unit = {
        retained += extra + (row match {
          case u: UnsafeRow => u.getSizeInBytes.toLong
          case _ => 64L
        })
        if (consumer != null && retained > acquired) {
          val want = math.max(retained - acquired, 1L << 20)
          val got = consumer.acquireMemory(want)
          acquired += got
          if (retained > acquired)
            throw new IllegalStateException(
              s"TopKPerGroupExec retained state (~$retained bytes of group heaps) exceeds " +
                "available execution memory — raise spark.sql.shuffle.partitions so fewer " +
                "groups land in each task, or use the window form which sorts+spills")
        }
      }
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](math.min(limit, 16), revOrd)
          val keyCopy = key.copy()
          heaps.put(keyCopy, heap)
          track(keyCopy, 64L) // map-entry + queue fixed overhead
        }
        if (heap.size() < limit) {
          val c = row.copy(); track(c, 48L); heap.add(c); ()
        } else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll() // replaced row: same k slots, no net growth tracked
          heap.add(row.copy())
          ()
        }
      }
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      heaps.values().iterator().asScala.flatMap { heap =>
        val arr = heap.toArray(new Array[InternalRow](heap.size()))
        java.util.Arrays.sort(arr, ord)
        arr.iterator.zipWithIndex.map { case (r, i) =>
          outProj(new JoinedRow(r, new GenericInternalRow(Array[Any](i + 1)))): InternalRow
        }
      }
    }, preservesPartitioning = true)
  }
}
