package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Nineteenth dialect batch — pure kernels: subsequence probes,
  * char-n-gram signature hashes, vector normalization (the UTF8 edit
  * distances reuse Spark's code-point-aware Levenshtein builtin —
  * no second DP lives here). Same contract as batches 1–5: exact,
  * allocation-light, divergences documented in MIGRATION.md. The
  * n-gram signature family follows the wordShingleSimHash convention —
  * CH's hash constants are internal, so the CONTRACT matches (same
  * shape, same invariances) while the bit values are this engine's
  * portable-hash stream.
  */
object ChScalarKernels6 {

  /** hasSubsequence: 1 if every byte of `needle` appears in `hay` in
    * order (not necessarily contiguously), else 0 — CH's byte
    * semantics; the UTF8 variants walk code points instead.
    */
  def hasSubsequence(hay: UTF8String, needle: UTF8String): Int = {
    val h = hay.getBytes; val n = needle.getBytes
    var i = 0; var j = 0
    while (i < h.length && j < n.length) {
      if (h(i) == n(j)) j += 1
      i += 1
    }
    if (j == n.length) 1 else 0
  }

  private def codePoints(s: UTF8String): Array[Int] = {
    val str = s.toString
    val out = new Array[Int](str.codePointCount(0, str.length))
    var i = 0; var k = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      out(k) = cp; k += 1
      i += Character.charCount(cp)
    }
    out
  }

  def hasSubsequenceUTF8(hay: UTF8String, needle: UTF8String): Int = {
    val h = codePoints(hay); val n = codePoints(needle)
    var i = 0; var j = 0
    while (i < h.length && j < n.length) {
      if (h(i) == n(j)) j += 1
      i += 1
    }
    if (j == n.length) 1 else 0
  }

  def hasSubsequenceCI(hay: UTF8String, needle: UTF8String): Int =
    hasSubsequence(hay.toLowerCase, needle.toLowerCase)

  def hasSubsequenceCIUTF8(hay: UTF8String, needle: UTF8String): Int =
    hasSubsequenceUTF8(hay.toLowerCase, needle.toLowerCase)

  /** Per-3-gram portable hashes over the string's bytes (one hash per
    * byte-trigram position; strings shorter than 3 bytes hash their
    * whole content once so the signature is never empty).
    */
  private def gram3Hashes(s: UTF8String): Array[Long] = {
    val b = s.getBytes
    if (b.length == 0) return Array(PortableHash.seeded(7L, 0))
    if (b.length < 3)
      return Array(SignatureKernels.polyRange(b, 0, b.length, 7L))
    val out = new Array[Long](b.length - 2)
    var i = 0
    while (i + 3 <= b.length) {
      out(i) = SignatureKernels.polyRange(b, i, i + 3, 7L)
      i += 1
    }
    out
  }

  /** ngramSimHash: 64-bit simhash over byte 3-grams — per bit, the
    * majority vote of the gram hashes' seeded bit stream (the
    * wordShingleSimHash contract at character granularity: transposed
    * word order changes word-shingle sets wholesale but leaves most
    * char-3-grams intact, so the two catch orthogonal perturbations).
    */
  def ngramSimHash(s: UTF8String): Long = {
    val hs = gram3Hashes(s)
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      var votes = 0
      var i = 0
      while (i < hs.length) {
        if (((PortableHash.seeded(hs(i), bit) >> 15) & 1L) == 1L) votes += 1
        i += 1
      }
      if (2 * votes >= hs.length) sig |= (1L << bit)
      bit += 1
    }
    sig
  }

  def ngramSimHashCI(s: UTF8String): Long = ngramSimHash(s.toLowerCase)

  /** ngramMinHash: (min, max) of the byte-3-gram portable hashes — the
    * CH tuple contract (two order statistics of the same stream; equal
    * tuples ⇒ likely-similar strings, the cheap pre-filter the full
    * minhash family refines).
    */
  def ngramMinHash(s: UTF8String): InternalRow = {
    val hs = gram3Hashes(s)
    var mn = Long.MaxValue; var mx = Long.MinValue
    var i = 0
    while (i < hs.length) {
      if (hs(i) < mn) mn = hs(i)
      if (hs(i) > mx) mx = hs(i)
      i += 1
    }
    InternalRow(mn, mx)
  }

  def ngramMinHashCI(s: UTF8String): InternalRow = ngramMinHash(s.toLowerCase)

  /** L1/L2/Linf vector normalization: value / norm in one pass; a zero
    * vector (norm 0) returns itself unchanged — CH propagates
    * nan/inf there, a silent poison downstream dot products; the
    * divergence is documented in MIGRATION.md. A NULL element nulls
    * the whole result (getDouble on a null slot would read 0.0 and
    * return a confident unit vector over fabricated data — the r15
    * review's catch; CH errors there).
    */
  def normalizeArr(arr: ArrayData, mode: Int): ArrayData = {
    val n = arr.numElements()
    val v = new Array[Double](n)
    var i = 0
    var norm = 0.0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      v(i) = arr.getDouble(i)
      mode match {
        case 1 => norm += math.abs(v(i))
        case 2 => norm += v(i) * v(i)
        case _ => norm = math.max(norm, math.abs(v(i)))
      }
      i += 1
    }
    if (mode == 2) norm = math.sqrt(norm)
    if (norm != 0.0) {
      i = 0
      while (i < n) { v(i) /= norm; i += 1 }
    }
    new GenericArrayData(v)
  }
}

/** Two-string kernels of the nineteenth batch. */
case class ChStringPair6Expr(left: Expression, right: Expression, fn: String)
  extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    fn match {
      case "hassubsequence" => ChScalarKernels6.hasSubsequence(x, y)
      case "hassubsequenceutf8" => ChScalarKernels6.hasSubsequenceUTF8(x, y)
      case "hassubsequenceci" => ChScalarKernels6.hasSubsequenceCI(x, y)
      case "hassubsequenceciutf8" => ChScalarKernels6.hasSubsequenceCIUTF8(x, y)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = fn match {
      case "hassubsequence" => "hasSubsequence"
      case "hassubsequenceutf8" => "hasSubsequenceUTF8"
      case "hassubsequenceci" => "hasSubsequenceCI"
      case "hassubsequenceciutf8" => "hasSubsequenceCIUTF8"
    }
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ChScalarKernels6.$m($a, $b)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
    : ChStringPair6Expr = copy(left = l, right = r)
}

/** One-string kernels of the nineteenth batch. */
case class ChUnaryKernel6Expr(child: Expression, fn: String)
  extends UnaryExpression {
  override def dataType: DataType = fn match {
    case "ngramsimhash" | "ngramsimhashci" => LongType
    case "ngramminhash" | "ngramminhashci" => StructType(Seq(
      StructField("_1", LongType, nullable = false),
      StructField("_2", LongType, nullable = false)))
    case _ => throw new IllegalArgumentException(s"unknown kernel $fn")
  }
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    fn match {
      case "ngramsimhash" => ChScalarKernels6.ngramSimHash(s)
      case "ngramsimhashci" => ChScalarKernels6.ngramSimHashCI(s)
      case "ngramminhash" => ChScalarKernels6.ngramMinHash(s)
      case "ngramminhashci" => ChScalarKernels6.ngramMinHashCI(s)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = fn match {
      case "ngramsimhash" => "ngramSimHash"
      case "ngramsimhashci" => "ngramSimHashCI"
      case "ngramminhash" => "ngramMinHash"
      case "ngramminhashci" => "ngramMinHashCI"
    }
    defineCodeGen(ctx, ev, a => s"graft.functions.ChScalarKernels6.$m($a)")
  }
  override protected def withNewChildInternal(c: Expression)
    : ChUnaryKernel6Expr = copy(child = c)
}

/** L1Normalize / L2Normalize / LinfNormalize over a double array. */
case class ChNormalizeExpr(child: Expression, mode: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  // a null ELEMENT nulls the result even when the array itself is
  // non-nullable, so nullability can't mirror the child's
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ChScalarKernels6.normalizeArr(v.asInstanceOf[ArrayData], mode)
  // nullSafeCodeGen, not defineCodeGen: normalizeArr returns null for a
  // null ELEMENT, and defineCodeGen would leave ev.isNull=false with a
  // null ArrayData — an NPE in the UnsafeRow writer under whole-stage
  // codegen (the interpreted path was correct, masking it; r15 ADVICE)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = graft.functions.ChScalarKernels6.normalizeArr($a, $mode);
         if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildInternal(c: Expression)
    : ChNormalizeExpr = copy(child = c)
}
