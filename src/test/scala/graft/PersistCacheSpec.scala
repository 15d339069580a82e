package graft

import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** The shared memo registry's contract: one build per (session, key)
  * even under concurrent misses, hits return the same frame, invalidate
  * drops and allows a rebuild.
  */
class PersistCacheSpec extends SparkSpec {

  test("concurrent misses on one key run the build exactly once") {
    val builds = new AtomicInteger(0)
    val key = "spec#concurrent-" + System.nanoTime()
    val futures = (1 to 8).map { _ =>
      Future {
        PersistCache.getOrElseUpdate(spark, key) {
          builds.incrementAndGet()
          Thread.sleep(50) // widen the race window
          spark.range(10).toDF()
        }
      }
    }
    val frames = Await.result(Future.sequence(futures), 30.seconds)
    assert(builds.get() === 1)
    // every caller got the one cached frame
    assert(frames.map(System.identityHashCode).distinct.size === 1)
  }

  test("hits return the cached frame; invalidate forces a rebuild") {
    val builds = new AtomicInteger(0)
    val key = "spec#invalidate-" + System.nanoTime()
    def get() = PersistCache.getOrElseUpdate(spark, key) {
      builds.incrementAndGet()
      spark.range(5).toDF()
    }
    val a = get(); val b = get()
    assert(builds.get() === 1)
    assert(a eq b)
    PersistCache.invalidate(spark)
    get()
    assert(builds.get() === 2)
  }
}
