package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure kernels for the thirteenth FnProbe batch: base58, Morton /
  * Hilbert space-filling curves, IDNA/punycode, fuzzy-string distances,
  * jump consistent hashing, xxHash32 and MurmurHash3 x64_128 (both
  * standard PUBLIC specifications, seed 0 like CH), URL port, decimal
  * formatting, and the array long tail (cumsum-nonnegative,
  * enumerate-uniq, hasSubstr, LpNorm). Static methods so the expression
  * wrappers stay inside whole-stage codegen via a single call.
  */
object ChScalarKernels3 {

  // ---- base58 (the Bitcoin alphabet — CH uses the same) -------------
  private val B58 = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
  private val B58Inv: Array[Int] = {
    val a = Array.fill(128)(-1)
    B58.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  def base58Encode(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var zeros = 0
    while (zeros < bytes.length && bytes(zeros) == 0) zeros += 1
    var num = new java.math.BigInteger(1, bytes)
    val fiftyEight = java.math.BigInteger.valueOf(58)
    val sb = new java.lang.StringBuilder
    while (num.signum() > 0) {
      val qr = num.divideAndRemainder(fiftyEight)
      sb.append(B58.charAt(qr(1).intValue()))
      num = qr(0)
    }
    var i = 0
    while (i < zeros) { sb.append('1'); i += 1 }
    UTF8String.fromString(sb.reverse.toString)
  }

  def base58Decode(s: UTF8String): UTF8String = {
    val str = s.toString
    var num = java.math.BigInteger.ZERO
    val fiftyEight = java.math.BigInteger.valueOf(58)
    for (c <- str) {
      val i = if (c < 128) B58Inv(c.toInt) else -1
      require(i >= 0, s"base58Decode: invalid base58 character '$c'")
      num = num.multiply(fiftyEight).add(java.math.BigInteger.valueOf(i))
    }
    var zeros = 0
    while (zeros < str.length && str.charAt(zeros) == '1') zeros += 1
    val body =
      if (num.signum() == 0) Array.empty[Byte]
      else {
        val raw = num.toByteArray
        if (raw(0) == 0) java.util.Arrays.copyOfRange(raw, 1, raw.length)
        else raw
      }
    UTF8String.fromBytes(Array.fill[Byte](zeros)(0) ++ body)
  }

  // ---- Morton (Z-order) 2-D curve ------------------------------------
  // First argument rides the EVEN bit positions (bit 0), second the odd
  // ones — coordinates up to 32 bits each interleave into one Long.
  private def spread(v0: Long): Long = {
    var v = v0 & 0xffffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }
  private def unspread(v0: Long): Long = {
    var v = v0 & 0x5555555555555555L
    v = (v | (v >> 1)) & 0x3333333333333333L
    v = (v | (v >> 2)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v >> 4)) & 0x00ff00ff00ff00ffL
    v = (v | (v >> 8)) & 0x0000ffff0000ffffL
    v = (v | (v >> 16)) & 0x00000000ffffffffL
    v
  }
  def mortonEncode(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)
  def mortonDecodeX(z: Long): Long = unspread(z)
  def mortonDecodeY(z: Long): Long = unspread(z >> 1)

  // ---- Hilbert 2-D curve (standard xy2d/d2xy mapping, 32-bit coords) -
  // The classic quadrant-rotation algorithm (public; e.g. Hamilton's
  // tech report / the Wikipedia form). Encode and decode are exact
  // inverses by construction (property-spec'd); orientation conventions
  // vary between implementations — MIGRATION.md notes the caveat.
  def hilbertEncode(x0: Long, y0: Long): Long = {
    var x = x0 & 0xffffffffL
    var y = y0 & 0xffffffffL
    var d = 0L
    var s = 1L << 31
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
  def hilbertDecodeX(d: Long): Long = hilbertDecode(d)._1
  def hilbertDecodeY(d: Long): Long = hilbertDecode(d)._2
  def hilbertDecode(d0: Long): (Long, Long) = {
    var x = 0L; var y = 0L
    var t = d0
    var s = 1L
    while (s < (1L << 32) && s > 0) {
      // UNSIGNED bit extraction: d wraps past 2^63 (negative Long) for
      // coords >= 2^31, where signed `/ 2` and `/ 4` truncate toward
      // zero and extract the wrong bits — >>> keeps decode the exact
      // inverse of encode over the full 32-bit coordinate domain
      val rx = 1L & (t >>> 1)
      val ry = 1L & (t ^ rx)
      // rotate back
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t >>>= 2
      s <<= 1
    }
    (x, y)
  }

  // ---- IDNA / punycode (java.net.IDN — the JDK's RFC 3490 codec) -----
  def idnaEncode(s: UTF8String): UTF8String =
    UTF8String.fromString(java.net.IDN.toASCII(s.toString))
  def idnaDecode(s: UTF8String): UTF8String =
    UTF8String.fromString(java.net.IDN.toUnicode(s.toString))
  /** Single-label punycode via the IDNA codec: the xn-- ACE prefix is
    * stripped (pure-ASCII labels take RFC 3492's trailing '-' form).
    */
  def punycodeEncode(s: UTF8String): UTF8String = {
    val ace = java.net.IDN.toASCII(s.toString)
    UTF8String.fromString(
      if (ace.startsWith("xn--")) ace.substring(4) else ace + "-")
  }
  def punycodeDecode(s: UTF8String): UTF8String = {
    val str = s.toString
    // RFC 3492: everything before the LAST '-' is literal basic code
    // points; an empty extension means the label was pure ASCII
    val cut = str.lastIndexOf('-')
    if (cut >= 0 && cut == str.length - 1)
      UTF8String.fromString(str.substring(0, cut))
    else
      UTF8String.fromString(java.net.IDN.toUnicode("xn--" + str))
  }

  // ---- fuzzy-string long tail ----------------------------------------
  /** Damerau–Levenshtein in the optimal-string-alignment form (the
    * common DP with adjacent transpositions; MIGRATION.md notes the
    * restricted-vs-unrestricted divergence corner).
    */
  def damerauLevenshtein(a0: UTF8String, b0: UTF8String): Int = {
    val a = a0.toString
    val b = b0.toString
    val n = a.length; val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    val d = Array.ofDim[Int](n + 1, m + 1)
    for (i <- 0 to n) d(i)(0) = i
    for (j <- 0 to m) d(0)(j) = j
    for (i <- 1 to n; j <- 1 to m) {
      val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
      var v = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + cost)
      if (i > 1 && j > 1 && a.charAt(i - 1) == b.charAt(j - 2) &&
        a.charAt(i - 2) == b.charAt(j - 1))
        v = math.min(v, d(i - 2)(j - 2) + 1)
      d(i)(j) = v
    }
    d(n)(m)
  }

  /** Jaccard similarity of the two strings' BYTE sets (CH's
    * stringJaccardIndex contract).
    */
  def stringJaccard(a: UTF8String, b: UTF8String): Double = {
    val sa = new java.util.BitSet(256)
    val sb = new java.util.BitSet(256)
    a.getBytes.foreach(x => sa.set(x & 0xff))
    b.getBytes.foreach(x => sb.set(x & 0xff))
    val union = new java.util.BitSet(256)
    union.or(sa); union.or(sb)
    if (union.cardinality() == 0) return 0.0
    val inter = new java.util.BitSet(256)
    inter.or(sa); inter.and(sb)
    inter.cardinality().toDouble / union.cardinality().toDouble
  }

  /** Byte-wise Hamming distance; length difference counts entirely. */
  def byteHamming(a: UTF8String, b: UTF8String): Int = {
    val ba = a.getBytes; val bb = b.getBytes
    val common = math.min(ba.length, bb.length)
    var d = math.abs(ba.length - bb.length)
    var i = 0
    while (i < common) { if (ba(i) != bb(i)) d += 1; i += 1 }
    d
  }

  /** Lamping–Veach jump consistent hash — the published algorithm
    * verbatim ("A Fast, Minimal Memory, Consistent Hash Algorithm",
    * arXiv:1406.2294), which is also what CH implements.
    */
  def jumpConsistentHash(key0: Long, buckets: Int): Int = {
    var key = key0
    var b = -1L
    var j = 0L
    while (j < buckets) {
      b = j
      key = key * 2862933555777941757L + 1
      j = ((b + 1) * (2147483648.0 / (((key >>> 33) + 1).toDouble))).toLong
    }
    b.toInt
  }

  // ---- xxHash32 (public specification, seed 0 like CH) ---------------
  private val X32P1 = 0x9E3779B1
  private val X32P2 = 0x85EBCA77
  private val X32P3 = 0xC2B2AE3D
  private val X32P4 = 0x27D4EB2F
  private val X32P5 = 0x165667B1
  private def rotl32(x: Int, r: Int): Int = (x << r) | (x >>> (32 - r))
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  def xxHash32(s: UTF8String): Long = {
    val input = s.getBytes
    val len = input.length
    val seed = 0
    var i = 0
    var h: Int = 0
    if (len >= 16) {
      var v1 = seed + X32P1 + X32P2
      var v2 = seed + X32P2
      var v3 = seed
      var v4 = seed - X32P1
      while (i <= len - 16) {
        v1 = rotl32(v1 + le32(input, i) * X32P2, 13) * X32P1
        v2 = rotl32(v2 + le32(input, i + 4) * X32P2, 13) * X32P1
        v3 = rotl32(v3 + le32(input, i + 8) * X32P2, 13) * X32P1
        v4 = rotl32(v4 + le32(input, i + 12) * X32P2, 13) * X32P1
        i += 16
      }
      h = rotl32(v1, 1) + rotl32(v2, 7) + rotl32(v3, 12) + rotl32(v4, 18)
    } else h = seed + X32P5
    h += len
    while (i <= len - 4) {
      h = rotl32(h + le32(input, i) * X32P3, 17) * X32P4
      i += 4
    }
    while (i < len) {
      h = rotl32(h + (input(i) & 0xff) * X32P5, 11) * X32P1
      i += 1
    }
    h ^= h >>> 15; h *= X32P2; h ^= h >>> 13; h *= X32P3; h ^= h >>> 16
    h.toLong & 0xffffffffL
  }

  // ---- MurmurHash3 x64_128 (Appleby's public spec, seed 0 like CH) ---
  private def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33; k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33; k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }
  private def le64(b: Array[Byte], i: Int): Long = {
    var v = 0L
    var j = 7
    while (j >= 0) { v = (v << 8) | (b(i + j) & 0xffL); j -= 1 }
    v
  }
  private def rotl64(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))

  /** 16-byte digest as lowercase hex (h1 then h2, little-endian bytes —
    * the memory layout CH's FixedString(16) result carries).
    */
  def murmur3_128(s: UTF8String): UTF8String = {
    val data = s.getBytes
    val len = data.length
    val c1 = 0x87c37b91114253d5L
    val c2 = 0x4cf5ad432745937fL
    var h1 = 0L; var h2 = 0L
    val nblocks = len / 16
    var i = 0
    while (i < nblocks) {
      var k1 = le64(data, i * 16)
      var k2 = le64(data, i * 16 + 8)
      k1 *= c1; k1 = rotl64(k1, 31); k1 *= c2; h1 ^= k1
      h1 = rotl64(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= c2; k2 = rotl64(k2, 33); k2 *= c1; h2 ^= k2
      h2 = rotl64(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }
    val tail = nblocks * 16
    var k1 = 0L; var k2 = 0L
    val rem = len & 15
    var j = rem
    while (j > 8) {
      j -= 1
      k2 ^= (data(tail + j) & 0xffL) << ((j - 8) * 8)
    }
    if (rem > 8) { k2 *= c2; k2 = rotl64(k2, 33); k2 *= c1; h2 ^= k2 }
    j = math.min(rem, 8)
    while (j > 0) {
      j -= 1
      k1 ^= (data(tail + j) & 0xffL) << (j * 8)
    }
    if (rem > 0) { k1 *= c1; k1 = rotl64(k1, 31); k1 *= c2; h1 ^= k1 }
    h1 ^= len.toLong; h2 ^= len.toLong
    h1 += h2; h2 += h1
    h1 = fmix64(h1); h2 = fmix64(h2)
    h1 += h2; h2 += h1
    val out = new java.lang.StringBuilder(32)
    def hexLe(v: Long): Unit = {
      var b = 0
      while (b < 8) {
        out.append(f"${(v >>> (b * 8)) & 0xffL}%02x")
        b += 1
      }
    }
    hexLe(h1); hexLe(h2)
    UTF8String.fromString(out.toString)
  }

  // ---- URL port -------------------------------------------------------
  private val PortRe =
    java.util.regex.Pattern.compile(
      "^(?:[A-Za-z][A-Za-z0-9+.-]*://)?(?:[^/@?#]*@)?[^/:?#]*:(\\d{1,5})(?:[/?#]|$)")
  def urlPort(s: UTF8String, default: Int): Int = {
    val m = PortRe.matcher(s.toString)
    if (m.find()) m.group(1).toInt else default
  }

  // ---- numeric formatting ---------------------------------------------
  def toDecimalString(v: Double, scale: Int): UTF8String = {
    require(scale >= 0 && scale <= 77, "toDecimalString: scale in [0, 77]")
    UTF8String.fromString(new java.math.BigDecimal(v)
      .setScale(scale, java.math.RoundingMode.HALF_UP).toPlainString)
  }

  private val decUnits = Array("B", "KB", "MB", "GB", "TB", "PB", "EB")
  /** formatReadableDecimalSize: base-1000 units, two decimals. */
  def readableDecimalSize(v: Double): UTF8String = {
    var x = math.abs(v)
    var u = 0
    while (x >= 1000.0 && u < decUnits.length - 1) { x /= 1000.0; u += 1 }
    val sign = if (v < 0) "-" else ""
    UTF8String.fromString(f"$sign${x}%.2f ${decUnits(u)}".replace(',', '.'))
  }

  // ---- great-circle central angle (degrees; the 6371 km sphere) ------
  def greatCircleAngle(lon1: Double, lat1: Double,
    lon2: Double, lat2: Double): Double = {
    val la1 = math.toRadians(lat1); val la2 = math.toRadians(lat2)
    val dLat = la2 - la1
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.sin(dLat / 2) * math.sin(dLat / 2) +
      math.cos(la1) * math.cos(la2) * math.sin(dLon / 2) * math.sin(dLon / 2)
    math.toDegrees(2 * math.asin(math.min(1.0, math.sqrt(a))))
  }

  // ---- exact integer math long tail -----------------------------------
  def intExp10(n: Int): Long = {
    require(n >= 0 && n <= 18, "intExp10: exponent in [0, 18]")
    var r = 1L; var i = 0
    while (i < n) { r *= 10L; i += 1 }
    r
  }

  // ---- unbin ----------------------------------------------------------
  def unbin(s: UTF8String): UTF8String = {
    val str = s.toString
    val padded = "0" * ((8 - str.length % 8) % 8) + str
    val out = new Array[Byte](padded.length / 8)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(padded.substring(i * 8, i * 8 + 8), 2).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** Two-long kernels of the thirteenth batch (Morton/Hilbert encode). */
case class ChCurveExpr(left: Expression, right: Expression, fn: String)
  extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any = fn match {
    case "morton" => ChScalarKernels3.mortonEncode(
      a.asInstanceOf[Long], b.asInstanceOf[Long])
    case _ => ChScalarKernels3.hilbertEncode(
      a.asInstanceOf[Long], b.asInstanceOf[Long])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (fn == "morton") "mortonEncode" else "hilbertEncode"
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ChScalarKernels3.$m($a, $b)")
  }
  override protected def withNewChildrenInternal(
    l: Expression, r: Expression): ChCurveExpr = copy(left = l, right = r)
}

/** Curve decode → (x, y) struct (CodegenFallback — returns a row). */
case class ChCurveDecodeExpr(child: Expression, fn: String)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("x", LongType, nullable = false),
    StructField("y", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val z = v.asInstanceOf[Long]
    val (x, y) =
      if (fn == "morton")
        (ChScalarKernels3.mortonDecodeX(z), ChScalarKernels3.mortonDecodeY(z))
      else ChScalarKernels3.hilbertDecode(z)
    InternalRow(x, y)
  }
  override protected def withNewChildInternal(c: Expression): ChCurveDecodeExpr =
    copy(child = c)
}

/** One-string kernels of the thirteenth batch (mode-dispatched). */
case class ChStringKernelExpr3(child: Expression, fn: String)
  extends UnaryExpression {
  override def dataType: DataType = fn match {
    case "xxHash32" => LongType
    case _ => StringType
  }
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    fn match {
      case "base58Encode" => ChScalarKernels3.base58Encode(s)
      case "base58Decode" => ChScalarKernels3.base58Decode(s)
      case "idnaEncode" => ChScalarKernels3.idnaEncode(s)
      case "idnaDecode" => ChScalarKernels3.idnaDecode(s)
      case "punycodeEncode" => ChScalarKernels3.punycodeEncode(s)
      case "punycodeDecode" => ChScalarKernels3.punycodeDecode(s)
      case "murmur3_128" => ChScalarKernels3.murmur3_128(s)
      case "unbin" => ChScalarKernels3.unbin(s)
      case _ => ChScalarKernels3.xxHash32(s)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.ChScalarKernels3.$fn($v)")
  override protected def withNewChildInternal(c: Expression): ChStringKernelExpr3 =
    copy(child = c)
}

/** Two-string kernels of the thirteenth batch. */
case class ChStringPairExpr3(left: Expression, right: Expression, fn: String)
  extends BinaryExpression {
  override def dataType: DataType = fn match {
    case "stringJaccard" => DoubleType
    case _ => IntegerType
  }
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    fn match {
      case "damerauLevenshtein" => ChScalarKernels3.damerauLevenshtein(x, y)
      case "stringJaccard" => ChScalarKernels3.stringJaccard(x, y)
      case _ => ChScalarKernels3.byteHamming(x, y)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ChScalarKernels3.$fn($a, $b)")
  override protected def withNewChildrenInternal(
    l: Expression, r: Expression): ChStringPairExpr3 = copy(left = l, right = r)
}

/** jumpConsistentHash(key, buckets) → Int32 (the paper's signature). */
case class ChJumpHashExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ChScalarKernels3.jumpConsistentHash(a.asInstanceOf[Long],
      b.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ChScalarKernels3.jumpConsistentHash($a, $b)")
  override protected def withNewChildrenInternal(
    l: Expression, r: Expression): ChJumpHashExpr = copy(left = l, right = r)
}

/** Array long tail: arrayCumSumNonNegative / arrayEnumerateUniq /
  * hasSubstr / LpNorm — row-local scans over one array (CodegenFallback;
  * never hot-path aggregation kernels).
  */
case class ChArrayKernelExpr3(children: Seq[Expression], fn: String)
  extends Expression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType
  override def dataType: DataType = fn match {
    case "cumsumnn" => children.head.dataType
    case "enumuniq" => ArrayType(LongType, containsNull = false)
    case "hassubstr" => BooleanType
    case _ => DoubleType // lpnorm
  }
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) return null
    fn match {
      case "cumsumnn" =>
        val et = elemType(children.head)
        val arr = vs.head.asInstanceOf[ArrayData]
        et match {
          case DoubleType =>
            var run = 0.0
            new GenericArrayData(arr.toDoubleArray().map { x =>
              run = math.max(run + x, 0.0); run
            })
          case FloatType =>
            var run = 0.0
            new GenericArrayData(arr.toFloatArray().map { x =>
              run = math.max(run + x, 0.0); run.toFloat
            })
          case dt: DecimalType =>
            var run = java.math.BigDecimal.ZERO
            val xs = (0 until arr.numElements()).map { i =>
              val x = arr.getDecimal(i, dt.precision, dt.scale)
                .toJavaBigDecimal
              run = run.add(x).max(java.math.BigDecimal.ZERO)
              Decimal(run, dt.precision, dt.scale): Any
            }
            new GenericArrayData(xs.toArray)
          case LongType | IntegerType | ShortType | ByteType =>
            var run = 0L
            val xs = (0 until arr.numElements()).map { i =>
              val x = et match {
                case LongType => arr.getLong(i)
                case IntegerType => arr.getInt(i).toLong
                case ShortType => arr.getShort(i).toLong
                case _ => arr.getByte(i).toLong
              }
              run = math.max(run + x, 0L)
              // box per branch: a bare numeric match would HARMONIZE
              // the branch types to Long and corrupt non-Long arrays
              val out: Any = et match {
                case LongType => java.lang.Long.valueOf(run)
                case IntegerType => java.lang.Integer.valueOf(run.toInt)
                case ShortType => java.lang.Short.valueOf(run.toShort)
                case _ => java.lang.Byte.valueOf(run.toByte)
              }
              out
            }
            new GenericArrayData(xs.toArray)
          case other => throw new IllegalArgumentException(
            s"arrayCumSumNonNegative: non-numeric element ${other.sql}")
        }
      case "enumuniq" =>
        val et = elemType(children.head)
        val arr = vs.head.asInstanceOf[ArrayData].toObjectArray(et)
        val seen = scala.collection.mutable.HashMap.empty[Any, Long]
        new GenericArrayData(arr.map { x =>
          val n = seen.getOrElse(x, 0L) + 1
          seen(x) = n
          n
        })
      case "hassubstr" =>
        val et = elemType(children.head)
        val a = vs.head.asInstanceOf[ArrayData].toObjectArray(et)
        val b = vs(1).asInstanceOf[ArrayData]
          .toObjectArray(elemType(children(1)))
        if (b.isEmpty) true
        else (0 to a.length - b.length).exists { off =>
          var i = 0
          var ok = true
          while (ok && i < b.length) { ok = a(off + i) == b(i); i += 1 }
          ok
        }
      case _ => // lpnorm
        val et = elemType(children.head)
        val xs = vs.head.asInstanceOf[ArrayData].toObjectArray(et).map {
          case d: java.lang.Double => d.doubleValue()
          case f: java.lang.Float => f.doubleValue()
          case l: java.lang.Long => l.doubleValue()
          case i: java.lang.Integer => i.doubleValue()
          case s: java.lang.Short => s.doubleValue()
          case b: java.lang.Byte => b.doubleValue()
          case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
          case other => throw new IllegalArgumentException(
            s"LpNorm: non-numeric element $other")
        }
        val p = vs(1) match {
          case d: Double => d
          case l: Long => l.toDouble
          case i: Int => i.toDouble
          case x: org.apache.spark.sql.types.Decimal => x.toDouble
          case other => throw new IllegalArgumentException(
            s"LpNorm: non-numeric p $other")
        }
        require(p > 0, "LpNorm: p must be positive")
        math.pow(xs.map(x => math.pow(math.abs(x), p)).sum, 1.0 / p)
    }
  }
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): ChArrayKernelExpr3 =
    copy(children = newChildren)
}

/** multiSearchFirstPosition / multiSearchAllPositions / hasToken over
  * (haystack, needles) — byte-position semantics like CH (1-based, 0 =
  * not found): positions count UTF-8 BYTES, not chars, so a non-ASCII
  * haystack prefix shifts them exactly as ClickHouse reports.
  */
case class ChMultiSearchExpr3(left: Expression, right: Expression, fn: String)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = fn match {
    case "allpositions" => ArrayType(LongType, containsNull = false)
    case "hastoken" => BooleanType
    case _ => LongType
  }
  override def nullIntolerant: Boolean = true
  // 1-based UTF-8 byte position of needle in hay (0 = absent): a plain
  // byte-array scan — valid UTF-8 never matches a needle mid-codepoint,
  // so byte search and codepoint search agree on WHICH occurrence is
  // first, while the byte offset matches CH's position() arithmetic
  private def pos(hay: Array[Byte], needle: Array[Byte]): Long = {
    if (needle.length == 0) return 1L
    var i = 0
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return (i + 1).toLong
      i += 1
    }
    0L
  }
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    fn match {
      case "hastoken" =>
        val hay = a.asInstanceOf[UTF8String].toString
        val tok = b.asInstanceOf[UTF8String].toString
        val re = java.util.regex.Pattern.compile(
          "(?<![A-Za-z0-9_])" + java.util.regex.Pattern.quote(tok) +
            "(?![A-Za-z0-9_])")
        re.matcher(hay).find()
      case "allpositions" =>
        val hay = a.asInstanceOf[UTF8String].getBytes
        val needles = b.asInstanceOf[ArrayData]
        new GenericArrayData((0 until needles.numElements()).map(i =>
          pos(hay, needles.getUTF8String(i).getBytes)).toArray)
      case _ => // firstposition: smallest found position, 0 if none
        val hay = a.asInstanceOf[UTF8String].getBytes
        val needles = b.asInstanceOf[ArrayData]
        val found = (0 until needles.numElements())
          .map(i => pos(hay, needles.getUTF8String(i).getBytes))
          .filter(_ > 0)
        if (found.isEmpty) 0L else found.min
    }
  }
  override protected def withNewChildrenInternal(
    l: Expression, r: Expression): ChMultiSearchExpr3 = copy(left = l, right = r)
}

/** port(url[, default]): authority port or the default (0). */
case class ChUrlPortExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ChScalarKernels3.urlPort(a.asInstanceOf[UTF8String], b.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ChScalarKernels3.urlPort($a, $b)")
  override protected def withNewChildrenInternal(
    l: Expression, r: Expression): ChUrlPortExpr = copy(left = l, right = r)
}

/** toDecimalString(x, scale) — fixed-scale decimal rendering. */
case class ChToDecimalStringExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ChScalarKernels3.toDecimalString(a.asInstanceOf[Double],
      b.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ChScalarKernels3.toDecimalString($a, $b)")
  override protected def withNewChildrenInternal(
    l: Expression, r: Expression): ChToDecimalStringExpr =
    copy(left = l, right = r)
}

/** intExp10(n) → exact 10^n as Long (a Double pow loses exactness past
  * 1e15; n in [0, 18]).
  */
case class ChIntExp10Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ChScalarKernels3.intExp10(v.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.ChScalarKernels3.intExp10($v)")
  override protected def withNewChildInternal(c: Expression): ChIntExp10Expr =
    copy(child = c)
}

/** greatCircleAngle(lon1, lat1, lon2, lat2) → degrees. */
case class ChGreatCircleAngleExpr(children: Seq[Expression])
  extends Expression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(children.length == 4, "greatCircleAngle(lon1, lat1, lon2, lat2)")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else {
      def d(x: Any): Double = x match {
        case v: Double => v
        case v: Float => v.toDouble
        case v: Long => v.toDouble
        case v: Int => v.toDouble
        case v: org.apache.spark.sql.types.Decimal => v.toDouble
        case other => throw new IllegalArgumentException(
          s"greatCircleAngle expects numeric arguments, got $other")
      }
      ChScalarKernels3.greatCircleAngle(d(vs(0)), d(vs(1)), d(vs(2)), d(vs(3)))
    }
  }
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): ChGreatCircleAngleExpr =
    copy(children = newChildren)
}
