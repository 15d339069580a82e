package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._

/** ClickHouse function names callable from SQL text: registers the
  * dialect's aggregate/scalar names in the session FunctionRegistry so
  * `spark.sql("SELECT countIf(x > 1), argMax(a, b) ...")` runs unchanged.
  * Each name maps onto the native Catalyst expression the Spark planner
  * already optimizes (partial aggregation, codegen) — no UDF layer.
  */
object ClickHouseDialect {

  private def one(args: Seq[Expression]): Expression = args.head

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    // …If combinators
    "countIf" -> (args => Count(CaseWhen(Seq((args.head, Literal(1)))))),
    "sumIf" -> (args => Sum(CaseWhen(Seq((args(1), args.head))))),
    "avgIf" -> (args => Average(CaseWhen(Seq((args(1), args.head))))),
    "minIf" -> (args => Min(CaseWhen(Seq((args(1), args.head))))),
    "maxIf" -> (args => Max(CaseWhen(Seq((args(1), args.head))))),
    // distinct-count family
    "uniq" -> (args => HyperLogLogPlusPlus(one(args))),
    "uniqExact" -> (args => Count(args).toAggregateExpression(isDistinct = true)),
    // quantiles
    "quantileExact" -> (args => new Percentile(args(1), args.head)),
    "medianExact" -> (args => new Percentile(one(args), Literal(0.5d))),
    "quantile" -> (args => new ApproximatePercentile(args(1), args.head)),
    // argMin/argMax
    "argMax" -> (args => MaxBy(args.head, args(1))),
    "argMin" -> (args => MinBy(args.head, args(1))),
    // group arrays
    "groupArray" -> (args => CollectList(one(args))),
    "groupUniqArray" -> (args => CollectSet(one(args))),
    // scalar date helpers
    "toStartOfMonth" -> (args => TruncTimestamp(Literal("month"), one(args))),
    "toStartOfDay" -> (args => TruncTimestamp(Literal("day"), one(args))),
    "toStartOfHour" -> (args => TruncTimestamp(Literal("hour"), one(args))),
    "toYYYYMM" -> (args => DateFormatClass(one(args), Literal("yyyyMM"))),
    // scalar misc
    "modulo" -> (args => Remainder(args.head, args(1))),
    "intDiv" -> (args => IntegralDivide(args.head, args(1))),
    "arrayJoin" -> (args => Explode(one(args))))

  /** Register (or refresh) the dialect names on a live session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      val id = FunctionIdentifier(name)
      if (!reg.functionExists(id))
        reg.registerFunction(id, new ExpressionInfo(getClass.getName, name), builder)
    }
  }

  /** Names exposed by this dialect (for docs/tests). */
  def names: Seq[String] = builders.map(_._1)
}
