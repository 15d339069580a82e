package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ApproximatePercentile, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Sketch-mode switch (ClickHouse quantile vs quantileExact): when
  * `spark.graft.approxQuantiles=true`, exact sort-based Percentile
  * aggregates are rewritten to the t-digest-style ApproximatePercentile —
  * a whole-plan semantic knob implemented as a Catalyst optimizer rule.
  *
  * Exact percentile holds all values per group; at 100 TB the sketch is
  * the only viable shape, and this rule lets the same query text serve
  * both modes.
  */
object ApproxQuantileRewrite extends Rule[LogicalPlan] {

  val FLAG = "spark.graft.approxQuantiles"

  private def isIntervalType(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt.isInstanceOf[org.apache.spark.sql.types.YearMonthIntervalType] ||
      dt.isInstanceOf[org.apache.spark.sql.types.DayTimeIntervalType] ||
      dt == org.apache.spark.sql.types.CalendarIntervalType

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!SQLConf.get.getConfString(FLAG, "false").toBoolean) plan
    else plan.transformAllExpressions {
      case p: Percentile
          if !isIntervalType(p.child.dataType) &&
            p.frequencyExpression.foldable &&
            String.valueOf(p.frequencyExpression.eval()) == "1" =>
        // Interval-typed children are left exact (Percentile yields the
        // interval type there, and Cast(interval, double) is invalid);
        // numeric children — scalar OR array-percentage form, where
        // Percentile yields Double/Array(Double) — are rewritten.
        // ApproximatePercentile yields its child's type, so cast
        // non-double children to keep the plan's result schema unchanged
        // (post-analysis type drift would be an invalid plan).
        val child =
          if (p.child.dataType == org.apache.spark.sql.types.DoubleType) p.child
          else Cast(p.child, org.apache.spark.sql.types.DoubleType)
        new ApproximatePercentile(child, p.percentageExpression,
          Literal(ApproximatePercentile.DEFAULT_PERCENTILE_ACCURACY))
    }

  /** Imperative install on a live session (extensions config only applies
    * at session construction). Idempotent.
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}
