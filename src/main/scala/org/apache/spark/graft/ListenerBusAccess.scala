package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Narrow accessor for `SparkContext.listenerBus` (private[spark]) —
  * the public-Spark-extension pattern of placing one file under
  * `org.apache.spark` to reach a test-facing internal. Bench's
  * per-query input/shuffle counters are fed by an async
  * SparkListener; without a drain, a query's last task-end events
  * can land in the NEXT query's delta. `waitUntilEmpty` is exactly
  * the primitive Spark's own test suites use for this.
  */
object ListenerBusAccess {
  /** Block until the listener bus has delivered all posted events, or
    * `timeoutMs` elapses (then proceed — a diag counter may lag one
    * event; never fail the bench over it).
    */
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long = 2000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Throwable => () }
}
