package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan: per-group top-k as a first-class physical
  * operator (logical node → strategy → two-phase SparkPlan), the shape
  * window-row_number≤k cannot reach: the window sorts every group's full
  * row set and shuffles all rows; this keeps a bounded k-heap per group,
  * runs a PARTIAL pass map-side (≤ k rows per group per partition cross
  * the shuffle) and a FINAL pass after clustering. Registered via
  * SparkSessionExtensions (GraftExtensions) or imperatively
  * (TopKPerGroup.install).
  */
case class TopKPerGroupNode(groupExprs: Seq[Expression], order: Seq[SortOrder],
  k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

case class TopKPerGroupExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
  k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupE = groupExprs
    val orderE = order
    val kk = k
    val childOutput = child.output
    // Memory bound: the partial (map-side) pass holds O(groups-in-flight × k)
    // rows; on a high-cardinality group column that map is unbounded, so the
    // partial pass flushes its heaps downstream whenever the group count hits
    // this threshold (duplicate partial outputs per group are re-merged by
    // the final pass — same contract as hash-aggregate partial fallback).
    // The final pass never flushes early: all rows of a group are co-located
    // there and must produce exactly one top-k per group.
    val flushThreshold = if (partial) TopKPerGroupExec.MaxInFlightGroups else Int.MaxValue
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val rowOrd = RowOrdering.create(orderE, childOutput)
      // PQ max = the WORST row under `order` (order = best-first), so the
      // head to evict on overflow is always the current worst.
      val pqOrd: Ordering[InternalRow] = (a, b) => rowOrd.compare(a, b)
      var heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      def insert(row: InternalRow): Unit = {
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](pqOrd)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (rowOrd.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      def drain(): Iterator[InternalRow] = {
        val full = heaps
        heaps = mutable.LinkedHashMap.empty
        full.iterator.flatMap { case (_, heap) => heap.dequeueAll.reverseIterator }
      }
      new Iterator[InternalRow] {
        private var cur: Iterator[InternalRow] = Iterator.empty
        override def hasNext: Boolean = {
          while (!cur.hasNext && (iter.hasNext || heaps.nonEmpty)) {
            if (!iter.hasNext || heaps.size >= flushThreshold) cur = drain()
            else while (iter.hasNext && heaps.size < flushThreshold) insert(iter.next())
          }
          cur.hasNext
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty iterator")
          cur.next()
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroupExec {
  /** Max distinct groups held in the partial pass before flushing heaps
    * downstream (≈ 64k groups × k rows in flight per task). */
  val MaxInFlightGroups: Int = 1 << 16
}

/** Plans the logical node as partial → (shuffle via required dist) → final. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, o, k, child) =>
      val partial = TopKPerGroupExec(g, o, k, partial = true, planLater(child))
      TopKPerGroupExec(g, o, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {

  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy

  /** DataFrame entry point: rows of the k best per group under
    * (orderCol desc, tie-break asc). */
  def topK(df: DataFrame, groupCols: Seq[String], orderCol: String,
    tieBreak: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name)
        .getOrElse(throw new IllegalArgumentException(s"no column $name"))
    val order = Seq(
      SortOrder(attr(orderCol), org.apache.spark.sql.catalyst.expressions.Descending),
      SortOrder(attr(tieBreak), org.apache.spark.sql.catalyst.expressions.Ascending))
    org.apache.spark.sql.GraftPlanBridge.ofRows(spark,
      TopKPerGroupNode(groupCols.map(attr), order, k, analyzed))
  }
}
