package graft.functions

import java.util.Arrays

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** ClickHouse uniqUpTo(N): exact distinct count while the group has at
  * most N distinct values, N+1 as the saturated "more than N" answer.
  *
  * The point of the combinator at scale is the STATE BOUND: the buffer
  * never holds more than N+1 ids, however many rows or distinct values
  * the group really has — once it saturates, inputs are discarded
  * without being stored (unlike count(DISTINCT), whose state grows with
  * true cardinality, or a bitmap, which grows with the id range). Merge
  * is a union re-capped at N+1, so partial aggregation stays map-side
  * combinable and every shuffle row is ≤ N+1 longs.
  *
  * Buffer = a SORTED Array[Long] (kryo round-trips primitive arrays
  * verbatim; binary search keeps per-row work O(log N) for N ids).
  */
case class UniqUpTo(n: Int) extends Aggregator[Long, Array[Long], Long] {
  require(n >= 1, "uniqUpTo needs n >= 1")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], a: Long): Array[Long] = {
    if (b.length > n) return b // saturated at n+1: nothing more to learn
    val i = Arrays.binarySearch(b, a)
    if (i >= 0) b
    else {
      val at = -i - 1
      val out = new Array[Long](b.length + 1)
      System.arraycopy(b, 0, out, 0, at)
      out(at) = a
      System.arraycopy(b, at, out, at + 1, b.length - at)
      out
    }
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var (into, from) = if (b1.length >= b2.length) (b1, b2) else (b2, b1)
    var i = 0
    while (into.length <= n && i < from.length) {
      into = reduce(into, from(i))
      i += 1
    }
    into
  }

  override def finish(b: Array[Long]): Long = math.min(b.length, n + 1).toLong

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
