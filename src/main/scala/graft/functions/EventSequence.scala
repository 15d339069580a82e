package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Growable (timestamp, condition-bitmask) event buffer shared by the
  * sequence aggregates. Timestamps are whatever integer the timestamp
  * child evaluates to (micros for TimestampType); the mask holds one bit
  * per condition column. Merging concatenates; evaluation sorts once.
  * Per-group memory is O(events of that group that match ≥1 condition) —
  * the same bound ClickHouse's windowFunnel/sequenceMatch carry.
  */
final class EventSeqBuffer {
  var ts: Array[Long] = new Array[Long](16)
  var mask: Array[Int] = new Array[Int](16)
  var n: Int = 0

  def add(t: Long, m: Int): Unit = {
    if (n == ts.length) {
      ts = java.util.Arrays.copyOf(ts, n * 2)
      mask = java.util.Arrays.copyOf(mask, n * 2)
    }
    ts(n) = t; mask(n) = m; n += 1
  }

  /** Sort events by (ts, mask) — the deterministic replay order. */
  def sorted(): (Array[Long], Array[Int]) = {
    val order = Array.range(0, n).sortBy(i => (ts(i), mask(i)))
    (order.map(ts(_)), order.map(mask(_)))
  }
}

/** Base of the ClickHouse event-sequence aggregates (`windowFunnel`,
  * `sequenceMatch`, `sequenceCount`): children are a parameter literal,
  * a timestamp column, and K boolean condition columns; the buffer
  * collects (ts, bitmask) per matching event.
  */
abstract class EventSequenceAgg extends TypedImperativeAggregate[EventSeqBuffer] {

  /** Timestamp child. */
  def tsExpr: Expression

  /** Condition children, level order. */
  def conds: Seq[Expression]

  override def nullable: Boolean = false

  protected def tsMicros(row: InternalRow): Option[Long] =
    tsExpr.eval(row) match {
      case null       => None
      case l: Long    => Some(l)
      case i: Integer => Some(i.longValue)
      case other      => Some(other.asInstanceOf[Number].longValue)
    }

  override def createAggregationBuffer(): EventSeqBuffer = new EventSeqBuffer

  override def update(buf: EventSeqBuffer, row: InternalRow): EventSeqBuffer = {
    var m = 0
    var i = 0
    while (i < conds.length) {
      if (conds(i).eval(row) == true) m |= 1 << i
      i += 1
    }
    if (m != 0) tsMicros(row).foreach(t => buf.add(t, m))
    buf
  }

  override def merge(a: EventSeqBuffer, b: EventSeqBuffer): EventSeqBuffer = {
    var i = 0
    while (i < b.n) { a.add(b.ts(i), b.mask(i)); i += 1 }
    a
  }

  override def serialize(buf: EventSeqBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.n)
    var i = 0
    while (i < buf.n) {
      out.writeLong(buf.ts(i)); out.writeInt(buf.mask(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): EventSeqBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new EventSeqBuffer
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.add(in.readLong(), in.readInt()); i += 1 }
    buf
  }

  protected def checkCommon(paramOk: => TypeCheckResult): TypeCheckResult = {
    if (conds.isEmpty || conds.length > 32)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: needs 1..32 condition columns")
    else if (!conds.forall(_.dataType == BooleanType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: conditions must be boolean")
    else tsExpr.dataType match {
      case TimestampType | TimestampNTZType | LongType | IntegerType | DateType =>
        paramOk
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName: timestamp column has unsupported type ${other.catalogString}")
    }
  }
}

/** ClickHouse `windowFunnel(window)(ts, cond1, …, condK)`: the longest
  * prefix of the condition chain completed by some event sequence whose
  * FIRST event anchors a window of `window` seconds (the documented
  * sliding-chain search: a level-l event extends a chain when it lies
  * within the window of that chain's start; a level-1 event re-anchors
  * the chain start). Events replay in (ts, mask) order; a multi-level
  * event row is applied to levels descending so one event never
  * satisfies two consecutive levels.
  */
case class WindowFunnel(
    windowExpr: Expression,
    tsExpr: Expression,
    conds: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends EventSequenceAgg {

  override def prettyName: String = "windowFunnel"
  override def dataType: DataType = IntegerType
  override def children: Seq[Expression] = windowExpr +: tsExpr +: conds

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WindowFunnel =
    copy(windowExpr = newChildren.head, tsExpr = newChildren(1),
      conds = newChildren.drop(2))

  override def withNewMutableAggBufferOffset(o: Int): WindowFunnel =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): WindowFunnel =
    copy(inputAggBufferOffset = o)

  override def checkInputDataTypes(): TypeCheckResult = checkCommon {
    if (!windowExpr.foldable)
      TypeCheckResult.TypeCheckFailure("windowFunnel: window must be a literal")
    else windowExpr.eval() match {
      case n: Number if n.longValue > 0 => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "windowFunnel: window must be a positive number of seconds")
    }
  }

  private lazy val windowMicros: Long = {
    val w = windowExpr.eval().asInstanceOf[Number].longValue
    tsExpr.dataType match {
      case TimestampType | TimestampNTZType => w * 1000000L
      case _                                => w
    }
  }

  override def eval(buf: EventSeqBuffer): Any = {
    val k = conds.length
    val (ts, mask) = buf.sorted()
    val unset = Long.MinValue
    val times = Array.fill[Long](k + 1)(unset)
    var best = 0
    var i = 0
    while (i < buf.n && best < k) {
      val t = ts(i)
      val m = mask(i)
      var l = k
      while (l >= 2) {
        if ((m & (1 << (l - 1))) != 0 && times(l - 1) != unset &&
          t - times(l - 1) <= windowMicros) {
          times(l) = times(l - 1)
          if (l > best) best = l
        }
        l -= 1
      }
      if ((m & 1) != 0) {
        times(1) = t
        if (best < 1) best = 1
      }
      i += 1
    }
    best
  }
}

/** ClickHouse `sequenceMatch('(?1)(?2)…')(ts, cond1, …)` /
  * `sequenceCount`: does the (ts-ordered) event stream contain the
  * pattern's condition chain as a subsequence (other events may
  * interleave — exactly the semantics of a `(?N)`-only pattern, with
  * `.*` between groups redundant and accepted). `sequenceCount` counts
  * non-overlapping matches greedily, left to right. Time-constrained
  * groups (`(?t<n)`) are rejected loudly rather than mis-evaluated.
  */
case class SequenceMatchAgg(
    patternExpr: Expression,
    tsExpr: Expression,
    conds: Seq[Expression],
    counting: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends EventSequenceAgg {

  override def prettyName: String =
    if (counting) "sequenceCount" else "sequenceMatch"
  override def dataType: DataType = if (counting) LongType else BooleanType
  override def children: Seq[Expression] = patternExpr +: tsExpr +: conds

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SequenceMatchAgg =
    copy(patternExpr = newChildren.head, tsExpr = newChildren(1),
      conds = newChildren.drop(2))

  override def withNewMutableAggBufferOffset(o: Int): SequenceMatchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SequenceMatchAgg =
    copy(inputAggBufferOffset = o)

  /** `(?1)(?2)…` possibly with `.*` separators → 1-based chain. */
  private lazy val chain: Array[Int] = {
    val p = patternExpr.eval() match {
      case null => throw new IllegalArgumentException(
        s"$prettyName: pattern must be a string literal")
      case s    => s.toString
    }
    val groups = """\(\?(\d+)\)|\.\*""".r.findAllMatchIn(p).toVector
    val covered = groups.map(_.matched.length).sum
    if (covered != p.replaceAll("\\s", "").length || groups.isEmpty)
      throw new IllegalArgumentException(
        s"$prettyName: unsupported pattern '$p' — only (?N) groups and .* " +
          "separators are supported (no (?t…) time constraints)")
    groups.flatMap(m => Option(m.group(1)).map(_.toInt)).toArray
  }

  override def checkInputDataTypes(): TypeCheckResult = checkCommon {
    if (!patternExpr.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: pattern must be a literal")
    else if (chain.exists(c => c < 1 || c > conds.length))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: pattern references a condition out of range 1..${conds.length}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def eval(buf: EventSeqBuffer): Any = {
    val (_, mask) = buf.sorted()
    var matches = 0L
    var pos = 0
    var i = 0
    while (i < buf.n) {
      if ((mask(i) & (1 << (chain(pos) - 1))) != 0) {
        pos += 1
        if (pos == chain.length) {
          matches += 1
          if (!counting) return true
          pos = 0
        }
      }
      i += 1
    }
    if (counting) matches else false
  }
}
