package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Accessor for the package-private Dataset factory so graft's custom
  * logical plans (graft.plans.TopKPerGroupNode) can be surfaced as
  * DataFrames. Same pattern as other Spark extension libraries that
  * expose custom plans (a public-API gap acknowledged upstream).
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
