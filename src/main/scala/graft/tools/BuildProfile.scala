package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Dev harness: time individual dedup/ann index builds under a chosen
  * thread count. Usage: runMain graft.tools.BuildProfile [cpus] [sfDir] [step...]
  */
object BuildProfile {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0) else "32"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, sfDir)
    val steps = (graft.dedup.Dedup.buildSteps(t) ++ graft.ann.Ann.buildSteps(t)).toMap
    val wanted = if (args.length > 2) args.drop(2).toSeq else steps.keys.toSeq
    wanted.foreach { name =>
      val t0 = System.nanoTime()
      steps(name)()
      println(f"PROFILE $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
