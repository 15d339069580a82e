package graft
import org.apache.spark.sql.SparkSession

/** Dev plan-audit harness: prints anti-pattern flags (cartesian /
  * broadcast-nested-loop) for named registry queries
  * (`runMain graft.Explain name…`). Note: under AQE the pre-execution
  * plan hides codegen markers; the cartesian/BNL flags are the reliable
  * signal here, full plans come from `.explain("formatted")` after an
  * action.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"===== $name")
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
      val plan = df.queryExecution.executedPlan.toString
      println("cartesian=" + plan.contains("CartesianProduct") +
        " bnl=" + plan.contains("BroadcastNestedLoop") +
        " bhj=" + plan.contains("BroadcastHashJoin") +
        " wsc=" + plan.contains("*("))
    }
    spark.stop()
  }
}
