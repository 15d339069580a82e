package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan: the per-group 2-D Pareto front (skyline)
  * as a first-class two-phase physical operator — the shape the
  * window-running-max identity cannot reach when the group column is a
  * low-cardinality enum: a window PARTITION BY o_orderpriority sorts the
  * whole fact table into ~5 partitions, so parallelism is capped at 5
  * whatever the data size (r15 third decade measured q121_skyline 30×
  * on 10× rows for exactly this reason). Here each input partition
  * maintains a bounded per-group STAIRCASE (the running-max identity,
  * applied online), only the ≤front-sized local fronts cross the
  * shuffle, and the final pass merges them with the same code — the
  * TopKPerGroup partial/final contract with a staircase instead of a
  * heap.
  *
  * Semantics (the identity q121's oracle states in SQL): with rows
  * scanned in `order` (total within a group — include a unique
  * tie-break), a row survives iff its `dom` value strictly exceeds the
  * running max of `dom` over all earlier rows of its group. For the
  * classic (price asc, date desc) skyline this keeps exactly the
  * non-dominated rows: cheaper-and-at-least-as-late dominates.
  * Dominated-locally ⇒ dominated-globally (the witness is itself kept
  * or dominated by a kept row, inductively), so
  * skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)) and the
  * partial/final split is exact.
  *
  * Memory bound: a staircase holds only the group's CURRENT front (for
  * exchangeable inputs E|front| = H_n ≈ ln n); like TopKPerGroupExec,
  * the partial pass flushes all staircases downstream when the
  * in-flight group count hits the threshold — duplicates re-merge in
  * the final pass.
  */
case class SkylinePerGroupNode(groupExprs: Seq[Expression], order: Seq[SortOrder],
  dom: Expression, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): SkylinePerGroupNode =
    copy(child = newChild)
}

case class SkylinePerGroupExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
  dom: Expression, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupE = groupExprs
    val orderE = order
    val domE = dom
    val childOutput = child.output
    val flushThreshold =
      if (partial) TopKPerGroupExec.MaxInFlightGroups else Int.MaxValue
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val rowOrd = RowOrdering.create(orderE, childOutput)
      val domBound = BindReferences.bindReference(domE, childOutput)
      // staircase: front rows keyed by scan order, dom values strictly
      // increasing along it (the running-max invariant, maintained online)
      val cmp: java.util.Comparator[InternalRow] = (a, b) => rowOrd.compare(a, b)
      var fronts = mutable.LinkedHashMap
        .empty[UnsafeRow, java.util.TreeMap[InternalRow, Long]]
      def insert(row: InternalRow): Unit = {
        val key = keyProj(row)
        val stair = fronts.get(key) match {
          case Some(s) => s
          case None =>
            val s = new java.util.TreeMap[InternalRow, Long](cmp)
            fronts.put(key.copy(), s)
            s
        }
        val d = domBound.eval(row).asInstanceOf[Number].longValue
        // dominated iff some earlier-in-order kept row has dom ≥ d (the
        // floor carries the max dom among earlier kept rows); an exact
        // order tie reads as its own floor with equal dom — one survives
        val fl = stair.floorEntry(row)
        if (fl == null || fl.getValue < d) {
          // prune the now-dominated contiguous run after this row
          val tail = stair.tailMap(row, false).entrySet().iterator()
          var stop = false
          while (!stop && tail.hasNext) {
            if (tail.next().getValue <= d) tail.remove() else stop = true
          }
          stair.put(row.copy(), d)
        }
      }
      def drain(): Iterator[InternalRow] = {
        val full = fronts
        fronts = mutable.LinkedHashMap.empty
        full.iterator.flatMap { case (_, stair) =>
          import scala.jdk.CollectionConverters._
          stair.keySet().iterator().asScala
        }
      }
      new Iterator[InternalRow] {
        private var cur: Iterator[InternalRow] = Iterator.empty
        override def hasNext: Boolean = {
          while (!cur.hasNext && (iter.hasNext || fronts.nonEmpty)) {
            if (!iter.hasNext || fronts.size >= flushThreshold) cur = drain()
            else while (iter.hasNext && fronts.size < flushThreshold) insert(iter.next())
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

  override protected def withNewChildInternal(newChild: SparkPlan): SkylinePerGroupExec =
    copy(child = newChild)
}

/** Plans the logical node as partial → (shuffle via required dist) → final. */
object SkylinePerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case SkylinePerGroupNode(g, o, d, child) =>
      val partial = SkylinePerGroupExec(g, o, d, partial = true, planLater(child))
      SkylinePerGroupExec(g, o, d, partial = false, partial) :: Nil
    case _ => Nil
  }
}

object SkylinePerGroup {

  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(SkylinePerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ SkylinePerGroupStrategy

  /** DataFrame entry point: the per-group skyline under the given scan
    * order (seq of (column, "asc"|"desc"); make it total with a unique
    * tie-break) and dominance column (int/long/date/timestamp — a row
    * survives iff its dom strictly exceeds every earlier row's).
    */
  def skyline(df: DataFrame, groupCols: Seq[String],
    orderCols: Seq[(String, String)], domCol: String): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name)
        .getOrElse(throw new IllegalArgumentException(s"no column $name"))
    val order = orderCols.map { case (c, dir) =>
      SortOrder(attr(c), if (dir == "desc") Descending else Ascending)
    }
    org.apache.spark.sql.GraftPlanBridge.ofRows(spark,
      SkylinePerGroupNode(groupCols.map(attr), order, attr(domCol), analyzed))
  }
}
