package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse `entropy(x)`: Shannon entropy (bits) of the value
  * distribution — H = log2(N) − Σ c·log2(c) / N over per-distinct-value
  * counts c (the numerically stable integer-count form; see also the
  * two-groupBy re-expression in operators/Stats.q69, which is the scale
  * path when the distinct-value count per group is itself huge).
  *
  * State is a value→count open-ish map keyed by the value's canonical
  * string form (the child is wrapped in a Cast to string at build time,
  * so keys are exact for primitives and strings). The shuffle form is
  * length-prefixed UTF-8 + varint counts — compact and allocation-light,
  * matching the BitmapDistinct precedent rather than Kryo'd boxed maps.
  *
  * Memory is proportional to the DISTINCT value count per group — the
  * same contract as ClickHouse's hashed entropy state; for unbounded
  * cardinality use the two-stage form instead.
  */
case class EntropyAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(
      buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) buf.merge(v.asInstanceOf[UTF8String].toString, 1L, _ + _)
    buf
  }

  override def merge(
      a: java.util.HashMap[String, Long],
      b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    b.forEach((k, c) => a.merge(k, c, _ + _))
    a
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    if (buf.isEmpty) return null
    var n = 0L
    var sumClogC = 0.0
    val it = buf.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      n += c
      sumClogC += c.toDouble * math.log(c.toDouble)
    }
    val log2 = math.log(2.0)
    (math.log(n.toDouble) - sumClogC / n) / log2
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    buf.forEach { (k, c) =>
      val b = k.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[String, Long](Math.max(16, n * 2))
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      m.put(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    m
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "entropy"

  override def withNewMutableAggBufferOffset(newOffset: Int): EntropyAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): EntropyAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): EntropyAgg =
    copy(child = newChild)
}

object EntropyAgg {
  /** Builder for the dialect registry: wraps the argument in a string
    * cast so the buffer key is the value's canonical form regardless of
    * input type.
    */
  def apply(arg: Expression): EntropyAgg =
    new EntropyAgg(Cast(arg, StringType))
}
