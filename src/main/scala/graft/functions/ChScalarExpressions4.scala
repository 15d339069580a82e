package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure kernels for the fifteenth FnProbe batch: human-readable size
  * parsing, UTF-8 validation, bit-level string slicing, little-endian
  * reinterpret casts, array Levenshtein, seeded deterministic array
  * shuffling/sampling, asymmetric n-gram search, and point-in-polygon
  * (ray casting — the standard even-odd rule). Static methods so the
  * expression wrappers stay inside whole-stage codegen via a single
  * call where the argument types allow; struct/array-generic wrappers
  * follow the ChMultiSearchExpr3 CodegenFallback precedent (row-narrow
  * dialect surface, never a fact-scan hot path).
  */
object ChScalarKernels4 {

  // ---- parseReadableSize (CH 24.x): number + unit, ceil to bytes ----
  private val units: Map[String, Double] = {
    val dec = Seq("B", "KB", "MB", "GB", "TB", "PB", "EB").zipWithIndex
      .map { case (u, i) => u -> math.pow(1000, i) }
    val bin = Seq("KiB", "MiB", "GiB", "TiB", "PiB", "EiB").zipWithIndex
      .map { case (u, i) => u -> math.pow(1024, i + 1) }
    (dec ++ bin).toMap
  }

  /** Bytes for "1.5 MiB"-style text (CH parseReadableSize: ceil of the
    * product; throws on malformed — the OrNull/OrZero wrappers catch).
    */
  def parseReadableSize(s: UTF8String): Long = {
    val txt = s.toString.trim
    val cut = txt.indexWhere(c => !(c.isDigit || c == '.' || c == '-'))
    require(cut > 0, s"parseReadableSize: no numeric prefix in '$txt'")
    val num = txt.substring(0, cut).toDouble
    val unit = txt.substring(cut).trim
    val mult = units.getOrElse(unit,
      throw new IllegalArgumentException(
        s"parseReadableSize: unknown unit '$unit'"))
    require(num >= 0, s"parseReadableSize: negative size '$txt'")
    math.ceil(num * mult).toLong
  }

  /** RFC 3629 byte-level validation: multi-byte sequence shapes,
    * continuation bytes, no overlongs/surrogates/五-byte forms.
    */
  def isValidUtf8(s: UTF8String): Boolean = {
    val b = s.getBytes
    var i = 0
    while (i < b.length) {
      val c = b(i) & 0xff
      val n =
        if (c < 0x80) 0
        else if (c >= 0xc2 && c <= 0xdf) 1
        else if (c >= 0xe0 && c <= 0xef) 2
        else if (c >= 0xf0 && c <= 0xf4) 3
        else return false
      if (i + n >= b.length) return false
      var j = 1
      while (j <= n) {
        val cc = b(i + j) & 0xff
        if (cc < 0x80 || cc > 0xbf) return false
        // overlong / surrogate / past-U+10FFFF guards on the first
        // continuation byte (the standard table)
        if (j == 1) {
          if (c == 0xe0 && cc < 0xa0) return false
          if (c == 0xed && cc > 0x9f) return false
          if (c == 0xf0 && cc < 0x90) return false
          if (c == 0xf4 && cc > 0x8f) return false
        }
        j += 1
      }
      i += n + 1
    }
    true
  }

  /** CH bitSlice(s, offset[, length]): bit-level substring, 1-based bit
    * offset, result zero-padded to a whole byte at the tail.
    */
  def bitSlice(s: UTF8String, offset0: Int, length0: Int): UTF8String = {
    val bytes = s.getBytes
    val totalBits = bytes.length * 8
    // CH semantics: negative offset counts from the end; offset 1-based
    val start =
      if (offset0 > 0) offset0 - 1
      else if (offset0 < 0) math.max(0, totalBits + offset0)
      else 0
    val len = math.max(0, math.min(length0, totalBits - start))
    val out = new Array[Byte]((len + 7) / 8)
    var i = 0
    while (i < len) {
      val bitPos = start + i
      val bit = (bytes(bitPos / 8) >> (7 - bitPos % 8)) & 1
      if (bit != 0) out(i / 8) = (out(i / 8) | (1 << (7 - i % 8))).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** reinterpretAsUInt8/16/32/64: little-endian read of the string's
    * first N bytes (missing bytes read as 0) — CH's byte reinterpret.
    * UInt64 values past 2^63 wrap into Spark's signed Long (documented).
    */
  def reinterpretAsUInt(s: UTF8String, nBytes: Int): Long = {
    val b = s.getBytes
    var v = 0L
    var i = math.min(nBytes, b.length) - 1
    while (i >= 0) { v = (v << 8) | (b(i) & 0xffL); i -= 1 }
    v
  }

  /** reinterpretAsString(n): the integer's little-endian bytes with
    * trailing zero bytes trimmed (CH's contract).
    */
  def reinterpretAsString(v: Long): UTF8String = {
    val b = new Array[Byte](8)
    var i = 0
    var x = v
    while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
    var n = 8
    while (n > 0 && b(n - 1) == 0) n -= 1
    UTF8String.fromBytes(java.util.Arrays.copyOf(b, n))
  }

  /** Levenshtein over two element sequences (ArrayData after a cast to
    * string elements — equality is element equality whatever the
    * original type rendered as).
    */
  def arrayLevenshtein(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements(); val m = b.numElements()
    if (n == 0) return m.toLong
    if (m == 0) return n.toLong
    def at(arr: ArrayData, i: Int): UTF8String =
      if (arr.isNullAt(i)) null else arr.getUTF8String(i)
    var prev = Array.tabulate(m + 1)(_.toLong)
    val cur = new Array[Long](m + 1)
    var i = 1
    while (i <= n) {
      cur(0) = i.toLong
      val ai = at(a, i - 1)
      var j = 1
      while (j <= m) {
        val bj = at(b, j - 1)
        val eq = (ai == null && bj == null) || (ai != null && ai.equals(bj))
        val sub = prev(j - 1) + (if (eq) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
        j += 1
      }
      val t = prev; prev = cur.clone(); val _ = t
      i += 1
    }
    prev(m)
  }

  /** Asymmetric 4-gram search (CH ngramSearch): the share of the
    * NEEDLE's grams present in the haystack — 1.0 = fully contained.
    * Same gram rule as ngramDistance (strings under 4 chars are one
    * gram).
    */
  def ngramSearch(hay: UTF8String, needle: UTF8String): Double = {
    def grams(s: String): Seq[String] =
      if (s.length < 4) Seq(s)
      else (0 to s.length - 4).map(i => s.substring(i, i + 4))
    val n = grams(needle.toString)
    val hc = scala.collection.mutable.Map.empty[String, Int]
    grams(hay.toString).foreach(g => hc(g) = hc.getOrElse(g, 0) + 1)
    var found = 0
    n.foreach { g =>
      val c = hc.getOrElse(g, 0)
      if (c > 0) { found += 1; hc(g) = c - 1 }
    }
    found.toDouble / n.size
  }

  /** SplitMix64 — the published Steele/Lea/Flood mixer: a stable,
    * JVM-version-independent PRNG for the seeded shuffle.
    */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic Fisher–Yates permutation of [0, n) keyed on `seed`
    * (SplitMix64 stream) — the index plan for arrayShuffle /
    * arrayRandomSample.
    */
  def shuffledIndices(n: Int, seed: Long): Array[Int] = {
    val idx = Array.tabulate(n)(identity)
    var state = seed
    var i = n - 1
    while (i > 0) {
      state = mix(state)
      val j = ((state >>> 1) % (i + 1)).toInt
      val t = idx(i); idx(i) = idx(j); idx(j) = t
      i -= 1
    }
    idx
  }

  // ---- sixteenth batch ------------------------------------------------
  /** MACNumToString: low 6 bytes rendered big-endian colon-hex. */
  def macNumToString(v: Long): UTF8String = {
    val sb = new StringBuilder(17)
    var i = 5
    while (i >= 0) {
      sb.append(f"${(v >>> (i * 8)) & 0xff}%02X")
      if (i > 0) sb.append(':')
      i -= 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** MACStringToNum: colon-hex (6 two-digit groups) → UInt48 in a Long;
    * THROWS on a malformed address like CH — the OrNull/OrZero behavior
    * lives in [[ChMacStringToNumExpr]]'s mode, never here, so bad
    * addresses can't silently alias to 00:00:00:00:00:00.
    */
  def macStringToNum(s: UTF8String): Long = {
    val txt = s.toString
    val parts = txt.split(":", -1)
    require(parts.length == 6, s"macStringToNum: malformed MAC '$txt'")
    var v = 0L
    var i = 0
    while (i < 6) {
      val p = parts(i)
      // two hex DIGITS exactly — parseInt would admit '+5'/'-1' groups
      require(p.length == 2 && Character.digit(p.charAt(0), 16) >= 0 &&
        Character.digit(p.charAt(1), 16) >= 0,
        s"macStringToNum: malformed MAC '$txt'")
      v = (v << 8) | Integer.parseInt(p, 16)
      i += 1
    }
    v
  }

  /** bfloat16 rounding: truncate the float mantissa to 8 bits (CH's
    * toBFloat16 — truncation, not round-to-nearest).
    */
  def toBFloat16(v: Double): Double = {
    val bits = java.lang.Float.floatToRawIntBits(v.toFloat)
    java.lang.Float.intBitsToFloat(bits & 0xffff0000).toDouble
  }

  /** UUID text → its 16 big-endian bytes (CH UUIDStringToNum variant 1). */
  def uuidStringToNum(s: UTF8String): Array[Byte] = {
    val u = java.util.UUID.fromString(s.toString)
    val b = java.nio.ByteBuffer.allocate(16)
    b.putLong(u.getMostSignificantBits)
    b.putLong(u.getLeastSignificantBits)
    b.array()
  }

  /** 16 big-endian bytes → canonical UUID text. */
  def uuidNumToString(bytes: Array[Byte]): UTF8String = {
    require(bytes.length == 16,
      s"UUIDNumToString expects 16 bytes, got ${bytes.length}")
    val b = java.nio.ByteBuffer.wrap(bytes)
    UTF8String.fromString(new java.util.UUID(b.getLong, b.getLong).toString)
  }

  private val Crockford = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"

  /** ULID: 48-bit millisecond timestamp + 80 random bits, Crockford
    * base32, 26 chars (the published ULID spec).
    */
  def ulid(): UTF8String = {
    val ts = System.currentTimeMillis()
    val r = java.util.concurrent.ThreadLocalRandom.current()
    val hi = r.nextLong(); val lo = r.nextLong()
    val out = new Array[Char](26)
    var i = 0
    // 10 chars of timestamp (48 bits, 5 bits each, left-padded)
    while (i < 10) {
      out(9 - i) = Crockford(((ts >>> (i * 5)) & 31).toInt)
      i += 1
    }
    // 16 chars of randomness from the 80 low bits of (hi, lo)
    var j = 0
    while (j < 16) {
      val bitPos = j * 5
      val bits =
        if (bitPos < 60) (lo >>> bitPos) & 31
        else ((lo >>> 60) | (hi << 4)) >>> (bitPos - 60) & 31
      out(25 - j) = Crockford(bits.toInt)
      j += 1
    }
    UTF8String.fromString(new String(out))
  }

  /** Even-odd-rule point-in-polygon (ray casting, boundary counted in
    * via the on-segment check CH also applies).
    */
  def pointInPolygon(px: Double, py: Double, xs: Array[Double],
    ys: Array[Double]): Boolean = {
    val n = xs.length
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val (xi, yi) = (xs(i), ys(i))
      val (xj, yj) = (xs(j), ys(j))
      // on-edge: collinear and within the segment's bounding box
      val cross = (px - xi) * (yj - yi) - (py - yi) * (xj - xi)
      if (cross == 0.0 &&
        px >= math.min(xi, xj) && px <= math.max(xi, xj) &&
        py >= math.min(yi, yj) && py <= math.max(yi, yj)) return true
      if ((yi > py) != (yj > py) &&
        px < (xj - xi) * (py - yi) / (yj - yi) + xi) inside = !inside
      j = i
      i += 1
    }
    inside
  }
}

/** parseReadableSize / OrNull / OrZero — mode decides the malformed-
  * input behavior (throw / null / 0), like the to*OrNull cast family.
  */
case class ChParseReadableSizeExpr(child: Expression, mode: String)
  extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable || mode == "null"
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    try ChScalarKernels4.parseReadableSize(v.asInstanceOf[UTF8String])
    catch {
      case e: Exception => mode match {
        case "null" => null
        case "zero" => 0L
        case _ => throw e
      }
    }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => mode match {
      case "null" =>
        s"""try { ${ev.value} = graft.functions.ChScalarKernels4.parseReadableSize($a); }
           catch (Exception e) { ${ev.isNull} = true; }"""
      case "zero" =>
        s"""try { ${ev.value} = graft.functions.ChScalarKernels4.parseReadableSize($a); }
           catch (Exception e) { ${ev.value} = 0L; }"""
      case _ =>
        s"${ev.value} = graft.functions.ChScalarKernels4.parseReadableSize($a);"
    })
  override protected def withNewChildInternal(c: Expression)
    : ChParseReadableSizeExpr = copy(child = c)
}

/** MACStringToNum / OrNull / OrZero — mode decides the malformed-input
  * behavior (throw / null / 0), the parseReadableSize routing; the base
  * name throws like CH instead of aliasing bad input to MAC zero.
  */
case class ChMacStringToNumExpr(child: Expression, mode: String)
  extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable || mode == "null"
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    try ChScalarKernels4.macStringToNum(v.asInstanceOf[UTF8String])
    catch {
      case e: Exception => mode match {
        case "null" => null
        case "zero" => 0L
        case _ => throw e
      }
    }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => mode match {
      case "null" =>
        s"""try { ${ev.value} = graft.functions.ChScalarKernels4.macStringToNum($a); }
           catch (Exception e) { ${ev.isNull} = true; }"""
      case "zero" =>
        s"""try { ${ev.value} = graft.functions.ChScalarKernels4.macStringToNum($a); }
           catch (Exception e) { ${ev.value} = 0L; }"""
      case _ =>
        s"${ev.value} = graft.functions.ChScalarKernels4.macStringToNum($a);"
    })
  override protected def withNewChildInternal(c: Expression)
    : ChMacStringToNumExpr = copy(child = c)
}

/** isValidUTF8(s) — byte-level RFC 3629 validation. */
case class ChIsValidUtf8Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ChScalarKernels4.isValidUtf8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.ChScalarKernels4.isValidUtf8($a)")
  override protected def withNewChildInternal(c: Expression): ChIsValidUtf8Expr =
    copy(child = c)
}

/** bitSlice(s, offset, length) — bit-level substring. */
case class ChBitSliceExpr(first: Expression, second: Expression,
  third: Expression) extends TernaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(s: Any, o: Any, l: Any): Any =
    ChScalarKernels4.bitSlice(s.asInstanceOf[UTF8String],
      o.asInstanceOf[Int], l.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, o, l) =>
      s"graft.functions.ChScalarKernels4.bitSlice($s, $o, $l)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
    t: Expression): ChBitSliceExpr = copy(first = f, second = s, third = t)
}

/** reinterpretAsUInt8/16/32/64 — little-endian byte reads. */
case class ChReinterpretUIntExpr(child: Expression, nBytes: Int)
  extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ChScalarKernels4.reinterpretAsUInt(v.asInstanceOf[UTF8String], nBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.ChScalarKernels4.reinterpretAsUInt($a, $nBytes)")
  override protected def withNewChildInternal(c: Expression)
    : ChReinterpretUIntExpr = copy(child = c)
}

/** reinterpretAsString(n) — little-endian bytes, trailing zeros cut. */
case class ChReinterpretStringExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ChScalarKernels4.reinterpretAsString(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.ChScalarKernels4.reinterpretAsString($a)")
  override protected def withNewChildInternal(c: Expression)
    : ChReinterpretStringExpr = copy(child = c)
}

/** arrayLevenshteinDistance(a, b) — inputs pre-cast to string arrays by
  * the builder (element equality is type-erased equality; CH compares
  * native elements — value-equal for the integer/string corpus cases).
  */
case class ChArrayLevenshteinExpr(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ChScalarKernels4.arrayLevenshtein(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
    : ChArrayLevenshteinExpr = copy(left = l, right = r)
}

/** ngramSearch(haystack, needle) — asymmetric 4-gram containment. */
case class ChNgramSearchExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ChScalarKernels4.ngramSearch(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ChScalarKernels4.ngramSearch($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
    : ChNgramSearchExpr = copy(left = l, right = r)
}

/** arrayShuffle(arr, seed) / arrayRandomSample(arr, k, seed) — the
  * seeded DETERMINISTIC forms (SplitMix64 Fisher–Yates; CH's own seeded
  * PRNG differs, so permutation VALUES diverge — a documented
  * MIGRATION.md note; the unseeded CH forms throw with this recipe).
  * `k < 0` means the full permutation (shuffle); otherwise the first k
  * of it (sample without replacement, CH's contract).
  */
case class ChArrayShuffleExpr(left: Expression, right: Expression, k: Int)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = left.dataType
  override def nullIntolerant: Boolean = true
  private lazy val elemType = left.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(
      s"arrayShuffle expects an array, got ${other.sql}")
  }
  override protected def nullSafeEval(a: Any, s: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val idx = ChScalarKernels4.shuffledIndices(n, s.asInstanceOf[Long])
    val take = if (k < 0) n else math.min(k, n)
    val out = new Array[Any](take)
    var i = 0
    while (i < take) { out(i) = arr.get(idx(i), elemType); i += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
    : ChArrayShuffleExpr = copy(left = l, right = r)
}

/** Thin unary kernels of the sixteenth batch — name selects the
  * static method; all primitive-friendly, codegen'd via one call.
  */
case class ChUnaryKernel4Expr(child: Expression, fn: String)
  extends UnaryExpression {
  override def dataType: DataType = fn match {
    case "macnumtostring" | "uuidnumtostring" => StringType
    case "tobfloat16" => DoubleType
    case "uuidstringtonum" => BinaryType
    case _ => throw new IllegalArgumentException(s"unknown kernel $fn")
  }
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any = fn match {
    case "macnumtostring" =>
      ChScalarKernels4.macNumToString(v.asInstanceOf[Long])
    case "tobfloat16" => ChScalarKernels4.toBFloat16(v.asInstanceOf[Double])
    case "uuidstringtonum" =>
      ChScalarKernels4.uuidStringToNum(v.asInstanceOf[UTF8String])
    case "uuidnumtostring" =>
      ChScalarKernels4.uuidNumToString(v.asInstanceOf[Array[Byte]])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = fn match {
      case "macnumtostring" => "macNumToString"
      case "tobfloat16" => "toBFloat16"
      case "uuidstringtonum" => "uuidStringToNum"
      case "uuidnumtostring" => "uuidNumToString"
    }
    defineCodeGen(ctx, ev, a => s"graft.functions.ChScalarKernels4.$m($a)")
  }
  override protected def withNewChildInternal(c: Expression)
    : ChUnaryKernel4Expr = copy(child = c)
}

/** generateULID() — the published ULID spec (48-bit ms timestamp +
  * 80 random bits, Crockford base32); nondeterministic like Uuid().
  */
case class ChUlidExpr() extends org.apache.spark.sql.catalyst.expressions.LeafExpression
  with org.apache.spark.sql.catalyst.expressions.Nondeterministic
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override protected def initializeInternal(partitionIndex: Int): Unit = ()
  override protected def evalInternal(input: InternalRow): Any =
    ChScalarKernels4.ulid()
}

/** pointInPolygon((x, y), [(x, y), …]) — even-odd ray casting; builder
  * casts both sides to double structs so the kernel reads ordinals.
  */
case class ChPointInPolygonExpr(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(p: Any, poly: Any): Any = {
    val pt = p.asInstanceOf[InternalRow]
    val arr = poly.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val xs = new Array[Double](n)
    val ys = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      xs(i) = row.getDouble(0); ys(i) = row.getDouble(1)
      i += 1
    }
    ChScalarKernels4.pointInPolygon(pt.getDouble(0), pt.getDouble(1), xs, ys)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
    : ChPointInPolygonExpr = copy(left = l, right = r)
}
