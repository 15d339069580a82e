package graft
import org.apache.spark.sql.SparkSession

/** Dev timing harness: warm-runs then times named registry queries once
  * each (`runMain graft.TimeQ <name> …`, SPARK_GRAFT_SF_DIR selects the
  * scale). Bench.scala remains the contract; this is the quick loop for
  * attributing a single query's cost without the full bench sweep.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm once (index builds), then time
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"TIMEQ $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
