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

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!SQLConf.get.getConfString(FLAG, "false").toBoolean) plan
    else plan.transformAllExpressions {
      case p: Percentile if p.dataType == org.apache.spark.sql.types.DoubleType &&
          p.frequencyExpression.foldable &&
          String.valueOf(p.frequencyExpression.eval()) == "1" =>
        // Percentile yields DoubleType for numeric children (interval
        // children yield the interval type — those are left exact: casting
        // an interval to double is not a valid cast), but
        // ApproximatePercentile yields its child's type — cast non-double
        // children so the rewrite never changes the plan's result schema
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
