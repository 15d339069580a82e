package graft

import graft.functions.UniqUpTo
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the bounded-state uniqUpTo aggregator: for any
  * split of any input stream into partitions, reduce+merge must equal
  * min(true distinct, n+1), and no buffer may ever exceed n+1 ids.
  */
class UniqUpToSpec extends AnyFunSuite {

  private def run(n: Int, parts: Seq[Seq[Long]]): (Long, Int) = {
    val agg = UniqUpTo(n)
    val bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
    val maxBuf = bufs.map(_.length).maxOption.getOrElse(0)
    val merged = bufs.foldLeft(agg.zero)(agg.merge)
    (agg.finish(merged), math.max(maxBuf, merged.length))
  }

  test("uniqUpTo equals min(exact distinct, n+1) under arbitrary partitioning") {
    val gen = for {
      n <- Gen.choose(1, 8)
      values <- Gen.listOfN(200, Gen.choose(0L, 30L))
      cuts <- Gen.listOfN(3, Gen.choose(0, 200))
    } yield (n, values, cuts.sorted)
    var seed = Seed(42L)
    (1 to 200).foreach { _ =>
      val (n, values, cuts) = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val bounds = (0 +: cuts :+ values.length).distinct.sorted
      val parts = bounds.sliding(2).map { case Seq(a, b) => values.slice(a, b).map(identity[Long]) }.toSeq
      val (got, maxBuf) = run(n, parts)
      val expect = math.min(values.distinct.length, n + 1).toLong
      assert(got === expect, s"n=$n values=${values.take(20)}...")
      assert(maxBuf <= n + 1, s"state bound violated: $maxBuf > ${n + 1}")
    }
  }

  test("saturated buffers stop growing on further input") {
    val agg = UniqUpTo(3)
    var b = agg.zero
    (0L until 100L).foreach(v => b = agg.reduce(b, v))
    assert(b.length === 4)
    assert(agg.finish(b) === 4L)
  }
}
