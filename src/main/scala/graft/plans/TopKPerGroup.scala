package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BaseOrdering, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.Bridge

/** Whole-operator top-k-per-group (SURVEY.md §2 #22's scale path and the
  * building block behind every "top 3 games / top 10 groups" dashboard
  * query in the reference, plus ANN candidate ranking).
  *
  * Why a custom operator: the composable formulation —
  * `row_number().over(Window.partitionBy(g).orderBy(o)) <= k` — must SORT
  * every group completely (O(n log n) per partition, sort buffers that
  * spill at 100 TB). This operator keeps a bounded k-row heap per group:
  * O(n log k), no sort spill, and the map-side PARTIAL pass cuts shuffle
  * volume to at most k rows per (group, input partition) — the same
  * partial/final contract as hash aggregation.
  *
  * The full custom-operator stack, registered via
  * [[GraftExtensions]] (`injectPlannerStrategy`) and self-registered
  * through `spark.experimental.extraStrategies` by the [[TopKPerGroup]]
  * API: logical node -> strategy -> partial exec -> (Exchange inserted by
  * EnsureRequirements) -> final exec.
  */
case class TopKPerGroupNode(
    k: Int,
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"top-k per group needs k >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

case class TopKPerGroupExec(
    k: Int,
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  /** The final pass needs co-located groups; the partial pass runs
    * anywhere (map-side). EnsureRequirements plants the hash Exchange
    * between the two. */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val groupLocal = groupExprs
    val orderLocal = order
    val attrs = child.output
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(groupLocal, attrs)
      val ord: BaseOrdering = RowOrdering.create(orderLocal, attrs)
      // per group: a bounded heap with the WORST kept row at the head
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) {
          heap.add(row.copy())
        } else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Plans the logical node as partial -> final (exchange in between). */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(k, g, o, child) =>
      val partial = TopKPerGroupExec(k, g, o, partial = true, planLater(child))
      TopKPerGroupExec(k, g, o, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level API. `order` pairs are (column name, descending?). */
object TopKPerGroup {
  def apply(df: DataFrame, groupCols: Seq[String],
      order: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies = TopKStrategy +: spark.experimental.extraStrategies
    }
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute = analyzed.output
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${analyzed.output.map(_.name).mkString(",")}"))
    val sortOrder = order.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    Bridge.ofRows(spark, TopKPerGroupNode(k, groupCols.map(attr), sortOrder, analyzed))
  }
}
