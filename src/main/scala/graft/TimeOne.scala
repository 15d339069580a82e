package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time one registry query with the Bench methodology
  * (noop sink, median of reps) without running the whole bench.
  *
  *   sbt "runMain graft.TimeOne /root/testdata/sf0.1 q75_mad [reps]"
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val (sfDir, name) = (args(0), args(1))
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    // warm the scans so the timing is operator cost
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val times = Seq.fill(reps) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"$name: median ${times.sorted.apply(reps / 2)}%.3f s " +
      s"(runs ${times.map(t => f"$t%.3f").mkString(", ")})")
    spark.stop()
  }
}
