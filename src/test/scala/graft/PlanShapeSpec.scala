package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan regressions for the scale-critical operator shapes:
  * these assertions pin the properties that make the plans survive a
  * 100 TB scale-up (scan pruning + filter pushdown, broadcast instead
  * of nested-loop joins, bounded exchange counts), so a refactor that
  * silently loses one fails here rather than in production.
  */
class PlanShapeSpec extends SparkSpec {

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    df.queryExecution.explainString(FormattedMode)
  }

  test("q64_conversion_lag pushes event-type filters into the scans") {
    val plan = planOf("q64_conversion_lag")
    assert(plan.contains("EqualTo(event_type,click)"), plan.take(2000))
    assert(plan.contains("EqualTo(event_type,purchase)"))
    // per-user firsts join via broadcast, not a nested loop
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("SortMergeJoin"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("pipe_quality_classifier is one narrow scan + one aggregation") {
    val plan = planOf("pipe_quality_classifier")
    // scan reads exactly the two needed columns
    assert(plan.contains("ReadSchema: struct<text:string,source:string>"),
      plan.take(2000))
    // one aggregation exchange plus the output-sort exchange — scoring
    // never shuffles document text (formatted plans list each node once
    // in the tree and once in the details; count detail entries)
    val exchanges = "\\(\\d+\\) Exchange".r.findAllMatchIn(plan).size
    assert(exchanges <= 2, s"unexpected exchange count $exchanges:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("pipe_dataset_card joins per-source summaries without nested loops") {
    val plan = planOf("pipe_dataset_card")
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("QUALIFY lowering decorrelates to window + filter, no re-scan loop") {
    sf0001.orders.createOrReplaceTempView("psq_orders")
    val plan = graft.functions.ClickHouseSql.sql(spark, """
      SELECT o_custkey, o_orderkey FROM psq_orders
      QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
        ORDER BY o_totalprice DESC) = 1""")
      .queryExecution.explainString(FormattedMode)
    assert(plan.contains("Window"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
