package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Executed-plan dump: runs each named registry query through the noop
  * sink and prints the POST-EXECUTION plan (AQE final — the stage graph
  * that actually ran, with AQEShuffleRead coalescing, runtime join
  * rewrites and reused stages visible, none of which the static
  * `explain` under AQE shows). Usage:
  *   runMain graft.tools.ExecutedPlan <sfDir> <name1,name2,...> [out]
  */
object ExecutedPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val out = if (args.length > 2) Some(args(2)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the write action plans its own QueryExecution, so the final
    // (post-AQE) plan is only reachable through the listener; memoized
    // builds fire intermediate actions first, so keep the LAST captured
    // plan per query (the noop write is always the final action)
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
          plans.add(qe.executedPlan.toString)
        override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
      })
    val sb = new StringBuilder
    names.foreach { n =>
      plans.clear()
      if (n.startsWith("_build_")) {
        // bench build entries: run the thunk and dump EVERY captured
        // plan — a memoized build fires several actions and each one's
        // executed stage graph is part of the build's cost story
        val t = graft.Tables(spark, sfDir)
        val steps = (graft.dedup.Dedup.buildSteps(t) ++
          graft.ann.Ann.buildSteps(t) ++ graft.text.TextOps.buildSteps(t))
          .toMap
        steps(n.stripPrefix("_build_"))()
        org.apache.spark.graft.ListenerBusAccess.waitUntilEmpty(spark.sparkContext)
        Thread.sleep(300)
        sb.append(s"======== $n (executed, all actions) ========\n")
        if (plans.isEmpty) sb.append("(no plan captured)\n")
        var i = 0
        while (!plans.isEmpty) {
          i += 1
          sb.append(s"-------- action $i --------\n")
          sb.append(plans.poll()); sb.append("\n")
        }
      } else {
        val df = SparkEntry.queries(n)(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        // listener events are delivered asynchronously; wait for the bus
        org.apache.spark.graft.ListenerBusAccess.waitUntilEmpty(spark.sparkContext)
        Thread.sleep(300)
        // the noop write is always the final action, so the LAST captured
        // plan is the query's; an empty queue is reported explicitly (a
        // silent empty dump reads like a trivial plan — r16 ADVICE)
        var last = "(no plan captured)"
        while (!plans.isEmpty) last = plans.poll()
        sb.append(s"======== $n (executed) ========\n")
        sb.append(last)
        sb.append("\n")
      }
    }
    out match {
      case Some(p) => java.nio.file.Files.write(java.nio.file.Paths.get(p),
        sb.toString.getBytes("UTF-8"))
      case None => println(sb.toString)
    }
    spark.stop()
  }
}
