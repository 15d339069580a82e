package graft.functions

import com.esotericsoftware.kryo.{Kryo, KryoSerializable}
import com.esotericsoftware.kryo.io.{Input, Output}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Sparse 64-bit-word bitmap over non-negative ids: an open-addressing
  * long→long map (word index → bit word; no boxing, linear probing,
  * power-of-two capacity) with a COMPACT shuffle form — Kryo writes
  * sorted (delta-varint word, fixed bits) pairs via [[KryoSerializable]],
  * ~10 bytes per occupied word, where a Kryo'd `HashMap[Long, Long]`
  * boxes both sides of every entry (~40+ B) on every partial-aggregate
  * shuffle. Word indexes are non-negative (ids ≥ 0), so -1 is a free
  * empty-slot sentinel.
  */
final class LongBitmap extends KryoSerializable with Serializable {
  private var keys = LongBitmap.emptyKeys(16)
  private var vals = new Array[Long](16)
  private var used = 0

  /** Occupied word-entry count (memory tracks DISTINCT ids, not id
    * magnitude).
    */
  def size: Int = used

  private def slot(w: Long): Int = {
    val mask = keys.length - 1
    // Fibonacci hash of the word index, then linear probe
    var i = ((w * 0x9e3779b97f4a7c15L) >>> (64 - Integer
      .numberOfTrailingZeros(keys.length))).toInt & mask
    while (keys(i) != -1L && keys(i) != w) i = (i + 1) & mask
    i
  }

  private def grow(): Unit = {
    val ok = keys; val ov = vals
    keys = LongBitmap.emptyKeys(ok.length * 2)
    vals = new Array[Long](ok.length * 2)
    var i = 0
    while (i < ok.length) {
      if (ok(i) != -1L) { val s = slot(ok(i)); keys(s) = ok(i); vals(s) = ov(i) }
      i += 1
    }
  }

  /** OR `bits` into word `w`. */
  def or(w: Long, bits: Long): Unit = {
    val i = slot(w)
    if (keys(i) == w) vals(i) |= bits
    else {
      keys(i) = w; vals(i) = bits; used += 1
      if (used * 2 > keys.length) grow()
    }
  }

  def add(id: Long): Unit = {
    if (id < 0)
      throw new IllegalArgumentException(
        s"BitmapDistinct: id $id is negative — the bitmap domain is [0, 2^63)")
    or(id >> 6, 1L << (id & 63))
  }

  def orAll(other: LongBitmap): Unit = {
    val ok = other.keys; val ov = other.vals
    var i = 0
    while (i < ok.length) {
      if (ok(i) != -1L) or(ok(i), ov(i))
      i += 1
    }
  }

  def cardinality: Long = {
    var n = 0L
    var i = 0
    while (i < keys.length) {
      if (keys(i) != -1L) n += java.lang.Long.bitCount(vals(i))
      i += 1
    }
    n
  }

  /** Compact shuffle form: entry count, then sorted (word, bits) pairs —
    * words delta-varint-coded (sorted deltas are small), bit words fixed
    * 8 bytes (dense, incompressible).
    */
  override def write(kryo: Kryo, out: Output): Unit = {
    val words = new Array[Long](used)
    var i = 0; var n = 0
    while (i < keys.length) {
      if (keys(i) != -1L) { words(n) = keys(i); n += 1 }
      i += 1
    }
    java.util.Arrays.sort(words)
    out.writeVarInt(used, true)
    var prev = 0L
    i = 0
    while (i < used) {
      out.writeVarLong(words(i) - prev, true)
      out.writeLong(vals(slot(words(i))))
      prev = words(i)
      i += 1
    }
  }

  override def read(kryo: Kryo, in: Input): Unit = {
    val n = in.readVarInt(true)
    var cap = 16
    while (cap < n * 2) cap *= 2
    keys = LongBitmap.emptyKeys(cap)
    vals = new Array[Long](cap)
    used = 0
    var prev = 0L
    var i = 0
    while (i < n) {
      prev += in.readVarLong(true)
      or(prev, in.readLong())
      i += 1
    }
  }
}

object LongBitmap {
  private def emptyKeys(n: Int): Array[Long] = {
    val a = new Array[Long](n)
    java.util.Arrays.fill(a, -1L)
    a
  }

  /** The compact (word, bits) form as a standalone byte array — the
    * -State wire format shipped BETWEEN aggregation levels (Kryo's
    * Output/Input used as plain codecs; `write`/`read` never touch
    * their Kryo parameter).
    */
  def toBytes(bm: LongBitmap): Array[Byte] = {
    val out = new Output(64, -1)
    bm.write(null, out)
    out.toBytes
  }

  def fromBytes(bytes: Array[Byte]): LongBitmap = {
    val bm = new LongBitmap
    bm.read(null, new Input(bytes))
    bm
  }
}

/** Typed bitmap-distinct aggregator (ClickHouse groupBitmap): exact
  * distinct count of non-negative integer ids via [[LongBitmap]] — a
  * sparse word-indexed bitmap (roaring-style two-level scheme with the
  * page level folded into the hash). Partial-aggregable, so each map
  * task ships one bitmap (~10 B per occupied 64-id word on the shuffle)
  * instead of its id multiset, and per-group memory is bounded by the
  * DISTINCT count alone — independent of id magnitude. Unlike HLL it is
  * exact, unionable, and intersectable.
  *
  * The buffer is MUTATED in place (the Aggregator contract permits
  * returning the mutated buffer): reduce runs once per input row and
  * never allocates. Kryo-encoded — the buffer only serializes at
  * partial-output/shuffle boundaries, through LongBitmap's compact
  * KryoSerializable form, never per row.
  *
  * Negative ids throw (matching ClickHouse groupBitmap's unsigned-int
  * domain) — silently dropping them would undercount versus
  * COUNT(DISTINCT) with no signal.
  */
case class BitmapDistinct() extends Aggregator[Long, LongBitmap, Long] {

  override def zero: LongBitmap = new LongBitmap

  override def reduce(buf: LongBitmap, id: Long): LongBitmap = {
    buf.add(id)
    buf
  }

  override def merge(a: LongBitmap, b: LongBitmap): LongBitmap = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    big.orAll(small)
    big
  }

  override def finish(buf: LongBitmap): Long = buf.cardinality

  override def bufferEncoder: Encoder[LongBitmap] = Encoders.kryo[LongBitmap]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** groupBitmapState — the -State half of ClickHouse's combinator pair
  * (reference feeds a ClickHouse table, whose AggregateFunction columns
  * are exactly this shape): aggregates ids to the BITMAP ITSELF in its
  * compact byte form, not to its cardinality, so a SECOND aggregation
  * level can union states without ever re-reading the fact rows. This
  * is the decomposable exact-distinct that makes hierarchy rollups
  * affordable at 100 TB: the fact table is scanned once at the finest
  * grain, every coarser grain merges the ~10 B/word states.
  */
case class BitmapState() extends Aggregator[Long, LongBitmap, Array[Byte]] {

  override def zero: LongBitmap = new LongBitmap

  override def reduce(buf: LongBitmap, id: Long): LongBitmap = {
    buf.add(id)
    buf
  }

  override def merge(a: LongBitmap, b: LongBitmap): LongBitmap = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    big.orAll(small)
    big
  }

  override def finish(buf: LongBitmap): Array[Byte] = LongBitmap.toBytes(buf)

  override def bufferEncoder: Encoder[LongBitmap] = Encoders.kryo[LongBitmap]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** groupBitmapMerge — the -Merge half: ORs serialized [[BitmapState]]
  * outputs and finishes with the exact distinct count. Union of exact
  * sets is exact, so a count derived at ANY rollup level equals the
  * count a fresh scan would have produced — the property the oracle
  * checks level by level.
  */
case class BitmapMergeCount() extends Aggregator[Array[Byte], LongBitmap, Long] {

  override def zero: LongBitmap = new LongBitmap

  override def reduce(buf: LongBitmap, state: Array[Byte]): LongBitmap = {
    buf.orAll(LongBitmap.fromBytes(state))
    buf
  }

  override def merge(a: LongBitmap, b: LongBitmap): LongBitmap = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    big.orAll(small)
    big
  }

  override def finish(buf: LongBitmap): Long = buf.cardinality

  override def bufferEncoder: Encoder[LongBitmap] = Encoders.kryo[LongBitmap]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
