package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed bitmap-distinct aggregator (ClickHouse groupBitmap): exact
  * distinct count of non-negative integer ids via a dense bitset that
  * merges word-wise OR. Partial-aggregable, so each map task ships one
  * bitmap (id-range/8 bytes) instead of its id multiset — for bounded id
  * domains (users, parts, shards) this is the cheapest exact-distinct
  * shape at scale, and unlike HLL it is exact, unionable, and
  * intersectable.
  *
  * Ids outside [0, maxId] are ignored (counted by no bit) rather than
  * growing the buffer unboundedly — the cap bounds executor memory the
  * same way ClickHouse's groupBitmap bounds its roaring containers.
  */
case class BitmapDistinct(maxId: Long = 1L << 26)
  extends Aggregator[Long, Array[Long], Long] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], id: Long): Array[Long] =
    if (id < 0 || id > maxId) buf
    else {
      val w = (id >> 6).toInt
      val out = if (w < buf.length) buf else java.util.Arrays.copyOf(buf, w + 1)
      out(w) |= 1L << (id & 63)
      out
    }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    var i = 0
    while (i < small.length) { big(i) |= small(i); i += 1 }
    big
  }

  override def finish(buf: Array[Long]): Long = {
    var s = 0L
    var i = 0
    while (i < buf.length) { s += java.lang.Long.bitCount(buf(i)); i += 1 }
    s
  }

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
