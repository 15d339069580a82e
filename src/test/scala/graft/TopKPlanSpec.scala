package graft

import graft.plans.{TopKPerGroup, TopKPerGroupExec}
import org.apache.spark.sql.functions._

class TopKPlanSpec extends SparkSpec {

  test("two-phase physical shape: partial exec below the exchange, final above") {
    val df = TopKPerGroup.topK(
      sf0001.part.select(col("p_brand"), col("p_partkey"), col("p_retailprice")),
      Seq("p_brand"), "p_retailprice", "p_partkey", 3)
    df.collect()
    val top = df.queryExecution.executedPlan
    val finalPlan = top match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // AQE hides stage internals from collect(); assert on the rendered plan
    val planStr = finalPlan.toString
    assert(planStr.split("TopKPerGroup ").length - 1 === 2,
      s"expected partial+final TopKPerGroupExec in:\n$planStr")
    assert(planStr.contains(", 3, true") && planStr.contains(", 3, false"),
      s"expected one partial and one final phase in:\n$planStr")
    assert(planStr.contains("Exchange"), "shuffle between the phases")
  }

  test("results equal the window formulation for several k") {
    import org.apache.spark.sql.expressions.Window
    val base = sf0001.orders.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    for (k <- Seq(1, 2, 5)) {
      val custom = TopKPerGroup.topK(base, Seq("o_custkey"), "o_totalprice", "o_orderkey", k)
        .select(col("o_custkey"), col("o_orderkey"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val window = base.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select(col("o_custkey"), col("o_orderkey"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(custom === window, s"k=$k")
    }
  }
}
