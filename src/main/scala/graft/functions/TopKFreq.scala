package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse `topK(k)(x)` / `topKWeighted(k)(x, w)`: the k most frequent
  * values of a group, by the SpaceSaving heavy-hitter sketch (Metwally et
  * al., "Efficient computation of frequent and top-k elements in data
  * streams") — the same algorithm ClickHouse documents for its topK.
  *
  * Per-group memory is bounded by `capacity = max(8·k, 64)` counters
  * regardless of the column's cardinality, so a 100 TB group costs the
  * same state as a 100-row one; the sketch is approximate ONLY when a
  * group's distinct count exceeds the capacity (a displaced newcomer
  * inherits the evicted minimum count — the classic overestimate). Partial
  * aggregation ships one bounded counter table per map task, never the
  * value multiset.
  *
  * Ties (equal counts) break on the value's natural ordering so the
  * result is deterministic and oracle-comparable. The returned array is
  * ordered most-frequent-first, like ClickHouse's.
  */
case class TopKFreq(
    child: Expression,
    kExpr: Expression,
    weight: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[AnyRef, Long]]
  with TernaryLike[Expression] {

  def this(child: Expression, kExpr: Expression) =
    this(child, kExpr, Literal(1L))

  override def prettyName: String = "topK"

  override def first: Expression = child
  override def second: Expression = kExpr
  override def third: Expression = weight

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): TopKFreq =
    copy(child = newFirst, kExpr = newSecond, weight = newThird)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKFreq =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKFreq =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!kExpr.foldable) {
      TypeCheckResult.TypeCheckFailure("topK: k must be a literal")
    } else {
      kExpr.eval() match {
        case n: Number if n.intValue > 0 =>
          // scalar orderable values only: ownKey's defensive copy covers
          // strings; nested types would need a deep copy
          if (child.dataType.isInstanceOf[ArrayType] ||
            child.dataType.isInstanceOf[StructType] ||
            child.dataType.isInstanceOf[MapType] ||
            !RowOrdering.isOrderable(child.dataType))
            TypeCheckResult.TypeCheckFailure(
              s"topK: unsupported value type ${child.dataType.catalogString}")
          else if (!weight.dataType.isInstanceOf[NumericType])
            TypeCheckResult.TypeCheckFailure(
              s"topK: weight must be numeric, got ${weight.dataType.catalogString}")
          else TypeCheckResult.TypeCheckSuccess
        case _ =>
          TypeCheckResult.TypeCheckFailure("topK: k must be a positive integer literal")
      }
    }
  }

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue
  private lazy val capacity: Int = math.max(8 * k, 64)
  private lazy val ord: Ordering[AnyRef] =
    TypeUtils.getInterpretedOrdering(child.dataType).asInstanceOf[Ordering[AnyRef]]

  override def createAggregationBuffer(): mutable.HashMap[AnyRef, Long] =
    mutable.HashMap.empty

  /** Catalyst value out of a (possibly buffer-backed) eval result: strings
    * must be copied, boxed primitives are immutable.
    */
  private def ownKey(v: Any): AnyRef = v match {
    case s: UTF8String => s.clone()
    case x             => x.asInstanceOf[AnyRef]
  }

  private def weightOf(row: InternalRow): Long = weight.eval(row) match {
    case null       => 0L
    case d: Decimal => d.toLong
    case n: Number  => n.longValue()
  }

  private def bump(buf: mutable.HashMap[AnyRef, Long], key: AnyRef, w: Long): Unit =
    buf.get(key) match {
      case Some(c) => buf.update(key, c + w)
      case None if buf.size < capacity => buf.update(key, w)
      case None =>
        // SpaceSaving displacement: the newcomer replaces the current
        // minimum and inherits its count (upper-bound estimate)
        var minK: AnyRef = null
        var minC = Long.MaxValue
        buf.foreach { case (kk, cc) => if (cc < minC) { minC = cc; minK = kk } }
        buf.remove(minK)
        buf.update(key, minC + w)
    }

  override def update(buf: mutable.HashMap[AnyRef, Long],
      row: InternalRow): mutable.HashMap[AnyRef, Long] = {
    val v = child.eval(row)
    if (v != null) {
      val w = weightOf(row)
      if (w != 0L) bump(buf, ownKey(v), w)
    }
    buf
  }

  override def merge(a: mutable.HashMap[AnyRef, Long],
      b: mutable.HashMap[AnyRef, Long]): mutable.HashMap[AnyRef, Long] = {
    b.foreach { case (key, c) =>
      a.get(key) match {
        case Some(c0) => a.update(key, c0 + c)
        case None     => a.update(key, c)
      }
    }
    if (a.size > capacity) {
      // deterministic prune back to the sketch bound: keep the top
      // `capacity` entries by (count desc, value asc)
      val keep = sorted(a).take(capacity)
      a.clear()
      keep.foreach { case (key, c) => a.update(key, c) }
    }
    a
  }

  private def sorted(buf: mutable.HashMap[AnyRef, Long]): Array[(AnyRef, Long)] =
    buf.toArray.sortWith { (x, y) =>
      if (x._2 != y._2) x._2 > y._2 else ord.compare(x._1, y._1) < 0
    }

  override def eval(buf: mutable.HashMap[AnyRef, Long]): Any =
    new GenericArrayData(sorted(buf).take(k).map(_._1))

  private lazy val pairProjection =
    UnsafeProjection.create(Array[DataType](child.dataType, LongType))

  override def serialize(buf: mutable.HashMap[AnyRef, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val scratch = new Array[Byte](4096)
    buf.foreach { case (key, c) =>
      val row = pairProjection(InternalRow(key, c))
      out.writeInt(row.getSizeInBytes)
      row.writeToStream(out, scratch)
    }
    out.writeInt(-1)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[AnyRef, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = mutable.HashMap.empty[AnyRef, Long]
    val row = new UnsafeRow(2)
    var size = in.readInt()
    while (size >= 0) {
      val bs = new Array[Byte](size)
      in.readFully(bs)
      row.pointTo(bs, size)
      // the key points into `bs`, which is freshly allocated per entry —
      // no copy needed
      buf.update(row.get(0, child.dataType).asInstanceOf[AnyRef], row.getLong(1))
      size = in.readInt()
    }
    buf
  }
}
