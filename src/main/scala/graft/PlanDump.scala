package graft

import org.apache.spark.sql.SparkSession

/** EXPLAIN-FORMATTED dump tool behind docs/PLANS.txt: writes the
  * formatted physical plan of each named registry query (comma-
  * separated in args(1)) against args(0)'s tables, appending to
  * args(2). The audit artifact stays reproducible: re-run with the
  * same names instead of hand-pasting explain output.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, names, outPath) = (args(0), args(1).split(",").toSeq, args(2))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      sb.append(s"======== $n ========\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("\n")
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      sb.toString.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    println(s"[plandump] ${names.size} plans -> $outPath")
    spark.stop()
  }
}
