package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed bitmap-distinct aggregator (ClickHouse groupBitmap): exact
  * distinct count of non-negative integer ids via a sparse bitmap —
  * a map of 64-bit words keyed by word index (a roaring-bitmap-style
  * two-level scheme with the page level folded into the hash map).
  * Partial-aggregable, so each map task ships one bitmap (distinct-ids/8
  * bytes + key overhead) instead of its id multiset, and per-group
  * memory is bounded by the DISTINCT count alone — independent of id
  * magnitude (the earlier dense Array[Long] buffer allocated id/64 words,
  * so one id near the cap cost ~8 MB per group per partial buffer).
  * Unlike HLL it is exact, unionable, and intersectable.
  *
  * The buffer is a MUTABLE map updated in place (the Aggregator contract
  * permits mutating and returning the buffer): reduce runs once per input
  * row, and an immutable Map would allocate a fresh HAMT path plus boxed
  * key/value on every row. Kryo-encoded — the buffer only serializes at
  * partial-output/shuffle boundaries, not per row.
  *
  * Negative ids throw (matching ClickHouse groupBitmap's unsigned-int
  * domain) — silently dropping them would undercount versus
  * COUNT(DISTINCT) with no signal.
  */
case class BitmapDistinct()
  extends Aggregator[Long, mutable.HashMap[Long, Long], Long] {

  override def zero: mutable.HashMap[Long, Long] = mutable.HashMap.empty

  override def reduce(buf: mutable.HashMap[Long, Long], id: Long): mutable.HashMap[Long, Long] = {
    if (id < 0)
      throw new IllegalArgumentException(
        s"BitmapDistinct: id $id is negative — the bitmap domain is [0, 2^63)")
    val w = id >> 6
    val bit = 1L << (id & 63)
    buf(w) = buf.getOrElse(w, 0L) | bit
    buf
  }

  override def merge(a: mutable.HashMap[Long, Long], b: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    small.foreachEntry { (w, bits) => big(w) = big.getOrElse(w, 0L) | bits }
    big
  }

  override def finish(buf: mutable.HashMap[Long, Long]): Long = {
    var n = 0L
    buf.foreachEntry { (_, bits) => n += java.lang.Long.bitCount(bits) }
    n
  }

  override def bufferEncoder: Encoder[mutable.HashMap[Long, Long]] =
    Encoders.kryo[mutable.HashMap[Long, Long]]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
