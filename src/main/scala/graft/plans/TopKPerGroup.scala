package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.IntegerType

/** Per-group top-k as a first-class operator (SURVEY §4: custom
  * LogicalPlan + Strategy + SparkPlan, registered via GraftExtensions).
  *
  * The composed alternative — `row_number().over(Window.partitionBy(g)
  * .orderBy(o)) <= k` — must fully sort every partition after the shuffle
  * (O(n log n) CPU, spill-prone at 100 TB). This operator keeps one
  * bounded k-heap per group instead: O(n log k) CPU, O(groups·k) memory,
  * no sort buffer. Ties must be broken by the caller's order columns
  * (append a unique id) — same contract the window form has.
  *
  * Rank semantics = row_number: output is child columns plus `rk` (1..k,
  * ascending by `orderExprs`).
  */
case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    orderExprs: Seq[Expression],
    k: Int,
    child: LogicalPlan,
    rankAttr: AttributeReference = AttributeReference("rk", IntegerType, nullable = false)())
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan = copy(child = c)
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    orderExprs: Seq[Expression],
    k: Int,
    rankAttr: AttributeReference,
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  /** One shuffle on the group keys; every group lands whole in one
    * partition, so a single heap pass per partition is exact. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val out = output
    val gExprs = groupExprs
    val oExprs = orderExprs
    val kk = k
    child.execute().mapPartitions ({ iter =>
      val keyProj = UnsafeProjection.create(gExprs, childOutput)
      val ord = GenerateOrdering.generate(oExprs.map(SortOrder(_, Ascending)), childOutput)
      val outProj = UnsafeProjection.create(out, out)
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      val maxGroups = TopKPerGroup.MaxGroupsPerPartition
      iter.foreach { row =>
        val heap = heaps.getOrElseUpdate(keyProj(row).copy(), {
          if (heaps.size >= maxGroups) throw new IllegalStateException(
            s"TopKPerGroup holds one in-memory heap per group and this " +
              s"partition exceeded $maxGroups groups (no spill path). " +
              "Raise spark.sql.shuffle.partitions so fewer groups land " +
              "per partition, or use a window-sort for ultra-high-cardinality keys.")
          scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
        })
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) { heap.dequeue(); heap.enqueue(row.copy()) }
      }
      val rankRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      heaps.iterator.flatMap { case (_, heap) =>
        val ascending: Seq[InternalRow] = heap.dequeueAll.reverse.toSeq
        ascending.iterator.zipWithIndex.map { case (r, i) =>
          rankRow.update(0, i + 1)
          outProj(joined(r, rankRow))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)
}

object TopKPerGroupStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, o, k, child, rank) =>
      TopKPerGroupExec(g, o, k, rank, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {
  /** Memory contract: the exec keeps one k-row heap per group per
    * partition (no spill). Partitions hitting this many groups fail
    * loudly instead of creeping toward executor OOM: the buffered state
    * is k·maxGroups copied rows plus one heap + map entry per group —
    * ≈ 250 MB at k=10 with 100-byte rows at this cap. */
  val MaxGroupsPerPartition: Int = 250000

  /** DataFrame API: top-k rows per group, ascending by orderCols, with a
    * 1-based `rk` column appended. Columns are referenced by name and
    * bound against the analyzed child up front (a custom node can't lean
    * on the analyzer to resolve Column wrappers). Derived sort keys (e.g.
    * a negation for descending) should be materialized with withColumn
    * first. Requires GraftExtensions on the session (planner strategy).
    *
    * Memory: one in-memory k-heap per distinct group per partition —
    * bounded by [[MaxGroupsPerPartition]] (loud failure, no spill). For
    * group cardinalities beyond that per partition, prefer the window-sort
    * formulation (qWindowTopn) which spills. */
  def apply(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String], k: Int): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    def attr(name: String) = analyzed.output.filter(_.name == name) match {
      case Seq(a) => a
      case Seq() => throw new IllegalArgumentException(
        s"column $name not in ${analyzed.output.map(_.name).mkString(", ")}")
      case many => throw new IllegalArgumentException(
        s"column $name is ambiguous (${many.size} attributes) — alias the " +
          "inputs before TopKPerGroup")
    }
    val node = TopKPerGroupNode(groupCols.map(attr), orderCols.map(attr), k, analyzed)
    Shim.ofRows(df.sparkSession, node)
  }
}
