package graft

import graft.plans.ApproxQuantileRewrite
import org.apache.spark.sql.functions._

class ApproxQuantileRewriteSpec extends SparkSpec {

  test("flag rewrites exact percentile to the sketch; results stay close") {
    ApproxQuantileRewrite.install(spark)
    // plans are cached per Dataset — build a fresh frame per mode
    def q = sf0001.orders.agg(percentile(col("o_totalprice"), lit(0.5)).as("med"))

    spark.conf.set(ApproxQuantileRewrite.FLAG, "false")
    val exactQ = q
    val exactPlan = exactQ.queryExecution.optimizedPlan.toString
    val exact = exactQ.head().getDouble(0)
    assert(exactPlan.contains("percentile") && !exactPlan.contains("percentile_approx"))

    spark.conf.set(ApproxQuantileRewrite.FLAG, "true")
    try {
      val approxQ = q
      val approxPlan = approxQ.queryExecution.optimizedPlan.toString
      assert(approxPlan.contains("percentile_approx"), s"not rewritten:\n$approxPlan")
      val approx = approxQ.head().getDouble(0)
      assert(math.abs(approx - exact) / exact < 0.05, s"approx $approx vs exact $exact")
    } finally spark.conf.set(ApproxQuantileRewrite.FLAG, "false")
  }

  test("rewrite preserves DoubleType result on integer columns") {
    ApproxQuantileRewrite.install(spark)
    def q = sf0001.orders.agg(percentile(col("o_custkey"), lit(0.5)).as("med"))
    spark.conf.set(ApproxQuantileRewrite.FLAG, "true")
    try {
      val approxQ = q
      val plan = approxQ.queryExecution.optimizedPlan
      assert(plan.toString.contains("percentile_approx"))
      // Percentile on a long column yields DoubleType; the rewrite must not
      // silently change the schema to LongType (ApproximatePercentile
      // returns its child's type).
      assert(approxQ.schema("med").dataType ==
        org.apache.spark.sql.types.DoubleType, approxQ.schema.treeString)
      approxQ.head() // and the plan must actually execute
    } finally spark.conf.set(ApproxQuantileRewrite.FLAG, "false")
  }
}
