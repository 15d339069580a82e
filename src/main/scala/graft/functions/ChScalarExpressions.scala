package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure kernels for the CH scalar long tail the tenth FnProbe batch
  * surfaced — formatting, fuzzy-string, IP validation, Unicode
  * normalization. Static methods so the expressions below stay inside
  * whole-stage codegen via a single call.
  *
  * Reference semantics: ClickHouse's public docs for
  * formatReadable* / bar / jaroWinklerSimilarity / regexpQuoteMeta /
  * isIPv4String / isIPv6String (all standard public algorithms).
  */
object ChScalarKernels {

  private val sizeUnits =
    Array("B", "KiB", "MiB", "GiB", "TiB", "PiB", "EiB", "ZiB", "YiB")

  /** formatReadableSize: binary units, two decimals ("1.00 MiB"). */
  def readableSize(v: Double): UTF8String = {
    var x = math.abs(v)
    var u = 0
    while (x >= 1024.0 && u < sizeUnits.length - 1) { x /= 1024.0; u += 1 }
    val sign = if (v < 0) "-" else ""
    UTF8String.fromString(
      f"$sign${x}%.2f ${sizeUnits(u)}".replace(',', '.'))
  }

  private val qtyUnits =
    Array("", " thousand", " million", " billion", " trillion", " quadrillion")

  /** formatReadableQuantity: decimal units, two decimals ("1.23 million"). */
  def readableQuantity(v: Double): UTF8String = {
    var x = math.abs(v)
    var u = 0
    while (x >= 1000.0 && u < qtyUnits.length - 1) { x /= 1000.0; u += 1 }
    val sign = if (v < 0) "-" else ""
    UTF8String.fromString(
      s"$sign${f"${x}%.2f".replace(',', '.')}${qtyUnits(u)}")
  }

  /** formatReadableTimeDelta: "1 hour, 1 minute, 1 second" (CH's
    * largest-unit-first comma list; years=365d, months=30.5d like CH).
    */
  def readableTimeDelta(v: Double): UTF8String = {
    var rest = math.abs(v).toLong
    val units = Seq(
      ("year", 31536000L), ("month", 2635200L), ("day", 86400L),
      ("hour", 3600L), ("minute", 60L), ("second", 1L))
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, sec) <- units) {
      val n = rest / sec
      if (n > 0 || (sec == 1L && parts.isEmpty)) {
        parts += s"$n $name" + (if (n == 1) "" else "s")
        rest -= n * sec
      }
    }
    val sign = if (v < 0) "-" else ""
    UTF8String.fromString(sign + parts.mkString(", "))
  }

  /** bar(x, min, max, width): Unicode block bar with 1/8-char
    * resolution, CH's visual profile aggregate companion.
    */
  def bar(x: Double, lo: Double, hi: Double, width: Double): UTF8String = {
    if (hi <= lo || width <= 0) return UTF8String.fromString("")
    val frac = math.max(0.0, math.min(1.0, (x - lo) / (hi - lo)))
    val eighths = math.round(frac * width * 8).toInt
    val full = eighths / 8
    val part = eighths % 8
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < full) { sb.append('█'); i += 1 }
    if (part > 0) sb.append((0x2590 - part).toChar) // ▏..▉ are U+2589-258F
    UTF8String.fromString(sb.toString)
  }

  /** Jaro similarity in [0,1] — the standard matching/transposition
    * formula.
    */
  def jaro(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val window = math.max(0, math.max(a.length, b.length) / 2 - 1)
    val aM = new Array[Boolean](a.length)
    val bM = new Array[Boolean](b.length)
    var matches = 0
    for (i <- a.indices) {
      val from = math.max(0, i - window)
      val to = math.min(b.length - 1, i + window)
      var j = from
      var found = false
      while (j <= to && !found) {
        if (!bM(j) && a.charAt(i) == b.charAt(j)) {
          aM(i) = true; bM(j) = true; matches += 1; found = true
        }
        j += 1
      }
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    for (i <- a.indices if aM(i)) {
      while (!bM(k)) k += 1
      if (a.charAt(i) != b.charAt(k)) t += 1
      k += 1
    }
    val m = matches.toDouble
    (m / a.length + m / b.length + (m - t / 2.0) / m) / 3.0
  }

  /** Jaro-Winkler: Jaro boosted by the common prefix (≤4, p=0.1). */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val (a, b) = (ua.toString, ub.toString)
    val j = jaro(a, b)
    var prefix = 0
    while (prefix < math.min(4, math.min(a.length, b.length)) &&
      a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    j + prefix * 0.1 * (1.0 - j)
  }

  def jaroOnly(ua: UTF8String, ub: UTF8String): Double =
    jaro(ua.toString, ub.toString)

  /** regexpQuoteMeta: backslash-escape CH's metacharacter set. */
  def regexpQuoteMeta(s: UTF8String): UTF8String = {
    val str = s.toString
    val special = "\\|()^$.[]?*+{:-"
    val sb = new java.lang.StringBuilder(str.length + 8)
    str.foreach { c =>
      if (special.indexOf(c) >= 0) sb.append('\\')
      sb.append(c)
    }
    UTF8String.fromString(sb.toString)
  }

  /** normalizeUTF8NFC/NFD/NFKC/NFKD via java.text.Normalizer. */
  def normalizeUtf8(s: UTF8String, form: String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.valueOf(form)))

  /** toValidUTF8: replace unpaired surrogates with U+FFFD (JVM strings
    * are otherwise valid Unicode by construction).
    */
  def toValidUtf8(s: UTF8String): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (Character.isHighSurrogate(c)) {
        if (i + 1 < str.length && Character.isLowSurrogate(str.charAt(i + 1))) {
          sb.append(c).append(str.charAt(i + 1)); i += 1
        } else sb.append('�')
      } else if (Character.isLowSurrogate(c)) sb.append('�')
      else sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Strict dotted-quad IPv4 check (0-255 per octet, no leading-zero
    * requirement relaxations beyond CH's).
    */
  def isIPv4(s: UTF8String): Boolean = {
    val parts = s.toString.split("\\.", -1)
    parts.length == 4 && parts.forall { p =>
      p.nonEmpty && p.length <= 3 && p.forall(_.isDigit) && p.toInt <= 255
    }
  }

  /** IPv6 validator: full and `::`-compressed forms, optional trailing
    * dotted-quad (IPv4-mapped). No DNS, pure string parsing.
    */
  def isIPv6(s: UTF8String): Boolean = {
    val str = s.toString
    if (str.isEmpty) return false
    val dc = str.indexOf("::")
    if (dc >= 0 && str.indexOf("::", dc + 1) >= 0) return false // one :: max
    // v4Allowed: an embedded dotted quad is legal ONLY as the final group
    // of the WHOLE address — the left side of a `::` is never final, so
    // '1.2.3.4::' must be rejected, not canonicalized
    def groups(part: String, v4Allowed: Boolean): Option[Int] = {
      if (part.isEmpty) return Some(0)
      val gs = part.split(":", -1)
      var n = 0
      for ((g, i) <- gs.zipWithIndex) {
        val lastAndV4 = i == gs.length - 1 && g.contains('.')
        if (lastAndV4) {
          if (!v4Allowed || !isIPv4(UTF8String.fromString(g))) return None
          n += 2
        } else {
          if (g.isEmpty || g.length > 4 ||
            !g.forall(c => Character.digit(c, 16) >= 0)) return None
          n += 1
        }
      }
      Some(n)
    }
    if (dc < 0) groups(str, v4Allowed = true).contains(8)
    else {
      val (l, r) = (str.substring(0, dc), str.substring(dc + 2))
      (groups(l, v4Allowed = false), groups(r, v4Allowed = true)) match {
        case (Some(a), Some(b)) => a + b <= 7 // :: covers ≥1 group
        case _ => false
      }
    }
  }
}

/** formatReadableSize/Quantity/TimeDelta — mode-dispatched at plan time. */
case class ChReadableExpr(child: Expression, mode: String)
  extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any = mode match {
    case "size" => ChScalarKernels.readableSize(v.asInstanceOf[Double])
    case "quantity" => ChScalarKernels.readableQuantity(v.asInstanceOf[Double])
    case "decsize" =>
      ChScalarKernels3.readableDecimalSize(v.asInstanceOf[Double])
    case _ => ChScalarKernels.readableTimeDelta(v.asInstanceOf[Double])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val call = mode match {
      case "size" => "graft.functions.ChScalarKernels.readableSize"
      case "quantity" => "graft.functions.ChScalarKernels.readableQuantity"
      case "decsize" => "graft.functions.ChScalarKernels3.readableDecimalSize"
      case _ => "graft.functions.ChScalarKernels.readableTimeDelta"
    }
    defineCodeGen(ctx, ev, v => s"$call($v)")
  }
  override protected def withNewChildInternal(c: Expression): ChReadableExpr =
    copy(child = c)
}

/** bar(x, min, max, width) → STRING (4-ary: CodegenFallback like the
  * dialect's other n-ary display helpers — never a hot-path function).
  */
case class ChBarExpr(children: Seq[Expression]) extends Expression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(children.length == 4, "bar(x, min, max, width)")
  override def dataType: DataType = StringType
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else {
      def d(a: Any): Double = a match {
        case x: Double => x
        case x: Float => x.toDouble
        case x: Long => x.toDouble
        case x: Int => x.toDouble
        case x: Short => x.toDouble
        case x: Byte => x.toDouble
        case x: org.apache.spark.sql.types.Decimal => x.toDouble
        case other => throw new IllegalArgumentException(
          s"bar expects numeric arguments, got $other")
      }
      ChScalarKernels.bar(d(vs(0)), d(vs(1)), d(vs(2)), d(vs(3)))
    }
  }
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): ChBarExpr = copy(children = newChildren)
}

/** jaroSimilarity / jaroWinklerSimilarity(a, b) → DOUBLE. */
case class ChJaroWinklerExpr(left: Expression, right: Expression,
  winkler: Boolean) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  private def fn: String = if (winkler) "jaroWinkler" else "jaroOnly"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (winkler) ChScalarKernels.jaroWinkler(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])
    else ChScalarKernels.jaroOnly(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ChScalarKernels.$fn($a, $b)")
  override protected def withNewChildrenInternal(l: Expression,
    r: Expression): ChJaroWinklerExpr = copy(left = l, right = r)
}

/** One-arg string kernels sharing a shape: regexpQuoteMeta,
  * toValidUTF8, isIPv4String, isIPv6String.
  */
case class ChStringKernelExpr(child: Expression, fn: String)
  extends UnaryExpression {
  override def dataType: DataType = fn match {
    case "isIPv4" | "isIPv6" => BooleanType
    case _ => StringType
  }
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any = fn match {
    case "regexpQuoteMeta" =>
      ChScalarKernels.regexpQuoteMeta(v.asInstanceOf[UTF8String])
    case "toValidUtf8" =>
      ChScalarKernels.toValidUtf8(v.asInstanceOf[UTF8String])
    case "isIPv4" => ChScalarKernels.isIPv4(v.asInstanceOf[UTF8String])
    case _ => ChScalarKernels.isIPv6(v.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.ChScalarKernels.$fn($v)")
  override protected def withNewChildInternal(c: Expression): ChStringKernelExpr =
    copy(child = c)
}

/** normalizeUTF8NFC/NFD/NFKC/NFKD(s). */
case class ChNormalizeUtf8Expr(child: Expression, form: String)
  extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ChScalarKernels.normalizeUtf8(v.asInstanceOf[UTF8String], form)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"""graft.functions.ChScalarKernels.normalizeUtf8($v, "$form")""")
  override protected def withNewChildInternal(c: Expression): ChNormalizeUtf8Expr =
    copy(child = c)
}

/** lgamma/tgamma via commons-math3 (on Spark's classpath). */
case class ChGammaExpr(child: Expression, log: Boolean)
  extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[Double]
    if (log) org.apache.commons.math3.special.Gamma.logGamma(x)
    else org.apache.commons.math3.special.Gamma.gamma(x)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      if (log) s"org.apache.commons.math3.special.Gamma.logGamma($v)"
      else s"org.apache.commons.math3.special.Gamma.gamma($v)")
  override protected def withNewChildInternal(c: Expression): ChGammaExpr =
    copy(child = c)
}

/** tupleHammingDistance(t1, t2) → INT: count of positions where the
  * structs differ (null vs null counts as equal, null vs value as
  * different — CH compares stored values).
  */
case class ChTupleHammingExpr(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  private lazy val fields: Seq[DataType] = left.dataType match {
    case StructType(fs) => fs.map(_.dataType).toSeq
    case other => throw new IllegalArgumentException(
      s"tupleHammingDistance expects tuples, got ${other.sql}")
  }
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (ra, rb) = (a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])
    var d = 0
    for ((dt, i) <- fields.zipWithIndex) {
      val (va, vb) = (ra.get(i, dt), rb.get(i, dt))
      val same = if (va == null || vb == null) va == vb else va == vb
      if (!same) d += 1
    }
    d
  }
  override protected def withNewChildrenInternal(l: Expression,
    r: Expression): ChTupleHammingExpr = copy(left = l, right = r)
}

/** toTypeName(x) → the CH spelling of the argument's RESOLVED Spark
  * type — a plan-time constant (foldable), like CH's.
  */
case class ChTypeNameExpr(child: Expression) extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def foldable: Boolean = true
  private def chName(dt: DataType): String = dt match {
    case ByteType => "Int8"
    case ShortType => "Int16"
    case IntegerType => "Int32"
    case LongType => "Int64"
    case FloatType => "Float32"
    case DoubleType => "Float64"
    case StringType => "String"
    case BinaryType => "String"
    case BooleanType => "Bool"
    case DateType => "Date"
    case TimestampType => "DateTime"
    case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
    case ArrayType(t, _) => s"Array(${chName(t)})"
    case MapType(k, v, _) => s"Map(${chName(k)}, ${chName(v)})"
    case StructType(fs) => s"Tuple(${fs.map(f => chName(f.dataType)).mkString(", ")})"
    case other => other.sql
  }
  private lazy val name: UTF8String = {
    val base = chName(child.dataType)
    UTF8String.fromString(
      if (child.nullable && !child.dataType.isInstanceOf[ArrayType] &&
        !child.dataType.isInstanceOf[MapType] &&
        !child.dataType.isInstanceOf[StructType]) s"Nullable($base)" else base)
  }
  override def eval(input: InternalRow): Any = name
  override protected def withNewChildInternal(c: Expression): ChTypeNameExpr =
    copy(child = c)
}

/** Second kernel block — the eleventh FnProbe batch: URL hierarchies,
  * IPv6 canonicalization, CIDR membership, form-encoding, n-gram
  * distance (public algorithms throughout).
  */
object ChScalarKernels2 {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  /** CH URLHierarchy: the URL cut after every path/query boundary. */
  def urlHierarchy(u: UTF8String): GenericArrayData = {
    val s = u.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val proto = s.indexOf("//")
    val hostStart = if (proto >= 0) proto + 2 else 0
    var i = hostStart
    var n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '/' || c == '?') {
        out += UTF8String.fromString(s.substring(0, i + 1))
        if (c == '?') { i = n } // query ends the hierarchy walk
      }
      i += 1
    }
    if (out.isEmpty || out.last.toString.length < s.length)
      out += u
    new GenericArrayData(out.toArray[Any])
  }

  /** CH URLPathHierarchy: same walk, path-relative (host dropped). */
  def urlPathHierarchy(u: UTF8String): GenericArrayData = {
    val s = u.toString
    val proto = s.indexOf("//")
    val pathStart = s.indexOf('/', if (proto >= 0) proto + 2 else 0)
    if (pathStart < 0) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = pathStart + 1
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '/' || c == '?')
        out += UTF8String.fromString(s.substring(pathStart, i + 1))
      i += 1
    }
    if (out.isEmpty || out.last.toString.length < n - pathStart)
      out += UTF8String.fromString(s.substring(pathStart))
    new GenericArrayData(out.toArray[Any])
  }

  def encodeForm(s: UTF8String): UTF8String = UTF8String.fromString(
    java.net.URLEncoder.encode(s.toString, "UTF-8"))

  def decodeForm(s: UTF8String): UTF8String = UTF8String.fromString(
    java.net.URLDecoder.decode(s.toString, "UTF-8"))

  /** Parse a textual IPv6 (full / ::-compressed / v4-mapped) to its 8
    * 16-bit groups, or null when invalid.
    */
  private[functions] def parse6(str: String): Array[Int] = {
    if (!ChScalarKernels.isIPv6(UTF8String.fromString(str))) return null
    def side(part: String): Array[Int] = {
      if (part.isEmpty) return Array.empty
      part.split(":", -1).flatMap { g =>
        if (g.contains('.')) {
          val o = g.split("\\.").map(_.toInt)
          Array((o(0) << 8) | o(1), (o(2) << 8) | o(3))
        } else Array(Integer.parseInt(g, 16))
      }
    }
    val dc = str.indexOf("::")
    if (dc < 0) side(str)
    else {
      val l = side(str.substring(0, dc))
      val r = side(str.substring(dc + 2))
      l ++ Array.fill(8 - l.length - r.length)(0) ++ r
    }
  }

  /** RFC 5952 canonical form: lowercase hex, longest zero run (≥2)
    * compressed, leftmost on ties.
    */
  def canonIPv6(s: UTF8String): UTF8String = {
    val g = parse6(s.toString)
    require(g != null, s"toIPv6: not an IPv6 address: $s")
    var bestStart = -1; var bestLen = 0
    var i = 0
    while (i < 8) {
      if (g(i) == 0) {
        var j = i
        while (j < 8 && g(j) == 0) j += 1
        if (j - i > bestLen) { bestStart = i; bestLen = j - i }
        i = j
      } else i += 1
    }
    val sb = new java.lang.StringBuilder
    if (bestLen >= 2) {
      for (k <- 0 until bestStart) {
        if (k > 0) sb.append(':')
        sb.append(Integer.toHexString(g(k)))
      }
      sb.append("::")
      for (k <- (bestStart + bestLen) until 8) {
        if (k > bestStart + bestLen) sb.append(':')
        sb.append(Integer.toHexString(g(k)))
      }
    } else {
      for (k <- 0 until 8) {
        if (k > 0) sb.append(':')
        sb.append(Integer.toHexString(g(k)))
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** isIPAddressInRange('addr', 'cidr/p') — v4 and v6, prefix compare
    * on the byte level (no DNS, pure parsing); false on any parse
    * failure (CH throws on malformed CIDR; a total predicate is the
    * safer surface for WHERE clauses — documented).
    */
  def ipInRange(addr: UTF8String, cidr: UTF8String): Boolean = {
    val c = cidr.toString
    val cut = c.lastIndexOf('/')
    if (cut < 0) return false
    val net = c.substring(0, cut)
    val bits = try c.substring(cut + 1).toInt catch { case _: Exception => return false }
    def v4bytes(s: String): Array[Int] =
      if (ChScalarKernels.isIPv4(UTF8String.fromString(s)))
        s.split("\\.").map(_.toInt)
      else null
    val (a, b, width) = {
      val a4 = v4bytes(addr.toString); val n4 = v4bytes(net)
      if (a4 != null && n4 != null) (a4, n4, 32)
      else {
        val a6 = parse6(addr.toString); val n6 = parse6(net)
        if (a6 == null || n6 == null) return false
        (a6.flatMap(g => Array(g >> 8, g & 255)),
          n6.flatMap(g => Array(g >> 8, g & 255)), 128)
      }
    }
    if (bits < 0 || bits > width) return false
    var k = 0
    var ok = true
    while (k * 8 < bits && ok) {
      val rem = bits - k * 8
      val mask = if (rem >= 8) 255 else (256 - (1 << (8 - rem))) & 255
      if ((a(k) & mask) != (b(k) & mask)) ok = false
      k += 1
    }
    ok
  }

  /** CH ngramDistance: 1 − 2·|common 4-grams| / (|A| + |B|) over
    * character 4-gram multisets (Sørensen–Dice complement; strings
    * shorter than 4 compare as single grams).
    */
  def ngramDistance(ua: UTF8String, ub: UTF8String): Double = {
    def grams(s: String): Seq[String] =
      if (s.length < 4) Seq(s) else (0 to s.length - 4).map(i => s.substring(i, i + 4))
    val (a, b) = (grams(ua.toString), grams(ub.toString))
    val bc = scala.collection.mutable.Map.empty[String, Int]
    b.foreach(g => bc(g) = bc.getOrElse(g, 0) + 1)
    var common = 0
    a.foreach { g =>
      val n = bc.getOrElse(g, 0)
      if (n > 0) { common += 1; bc(g) = n - 1 }
    }
    1.0 - 2.0 * common / (a.size + b.size)
  }

  private val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private[functions] def nodeAtPath(json: String,
    path: Seq[String]): com.fasterxml.jackson.databind.JsonNode =
    nodeAt(json, path)

  private def nodeAt(json: String,
    path: Seq[String]): com.fasterxml.jackson.databind.JsonNode = {
    var n = try jsonMapper.readTree(json) catch { case _: Exception => null }
    path.foreach { k => if (n != null) n = n.get(k) }
    n
  }

  /** CH JSONType: the node's CH type name, '' when absent/invalid. */
  def jsonType(json: UTF8String, path: Array[UTF8String]): UTF8String = {
    val n = nodeAt(json.toString, path.map(_.toString).toSeq)
    UTF8String.fromString(
      if (n == null) ""
      else if (n.isObject) "Object"
      else if (n.isArray) "Array"
      else if (n.isTextual) "String"
      else if (n.isBoolean) "Bool"
      else if (n.isNull) "Null"
      else if (n.isIntegralNumber) "Int64"
      else "Double")
  }

  /** CH JSONExtractArrayRaw: raw JSON text of each array element. */
  def jsonArrayRaw(json: UTF8String,
    path: Array[UTF8String]): GenericArrayData = {
    val n = nodeAt(json.toString, path.map(_.toString).toSeq)
    if (n == null || !n.isArray) new GenericArrayData(Array.empty[Any])
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      val it = n.elements()
      while (it.hasNext) out += UTF8String.fromString(it.next().toString)
      new GenericArrayData(out.toArray)
    }
  }

  /** CH JSONArrayLength: element count, null when not an array. */
  def jsonArrayLength(json: UTF8String, path: Array[UTF8String]): Any = {
    val n = nodeAt(json.toString, path.map(_.toString).toSeq)
    if (n == null || !n.isArray) null else n.size().toLong
  }

}

/** n-ary JSON introspection over jackson (on Spark's classpath):
  * mode = type | arrayraw | arraylength; children = json [, path keys].
  */
case class ChJsonExpr(children: Seq[Expression], mode: String)
  extends Expression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = mode match {
    case "type" => StringType
    case "arrayraw" => ArrayType(StringType)
    case _ => LongType
  }
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.head == null) return null
    val json = vs.head.asInstanceOf[UTF8String]
    val path = vs.tail.map(v =>
      if (v == null) return null else v.asInstanceOf[UTF8String]).toArray
    mode match {
      case "type" => ChScalarKernels2.jsonType(json, path)
      case "arrayraw" => ChScalarKernels2.jsonArrayRaw(json, path)
      case _ => ChScalarKernels2.jsonArrayLength(json, path)
    }
  }
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): ChJsonExpr = copy(children = newChildren)
}

/** erf/erfc via commons-math3 (Spark's own classpath). */
case class ChErfExpr(child: Expression, complement: Boolean)
  extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[Double]
    if (complement) org.apache.commons.math3.special.Erf.erfc(x)
    else org.apache.commons.math3.special.Erf.erf(x)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      if (complement) s"org.apache.commons.math3.special.Erf.erfc($v)"
      else s"org.apache.commons.math3.special.Erf.erf($v)")
  override protected def withNewChildInternal(c: Expression): ChErfExpr =
    copy(child = c)
}

/** divideDecimal(a, b, result_scale) with ClickHouse semantics: the
  * quotient is TRUNCATED toward zero at the result scale. Spark's
  * decimal-to-decimal cast rounds HALF_UP at the target scale, so
  * routing through Cast(Divide(..)) diverges on boundary values
  * (divideDecimal(2, 3, 0) → 0 in CH, 1 via the rounding cast). Division
  * by zero yields null (Spark's non-ANSI Divide convention — the engine
  * convention everywhere else in this dialect). Never hot-path (a
  * dialect-probe function), so CodegenFallback.
  */
case class ChDecimalTruncDivExpr(left: Expression, right: Expression,
  scale: Int) extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType =
    org.apache.spark.sql.types.DecimalType(38, scale)
  override def nullIntolerant: Boolean = true
  // division by zero yields null whatever the children's nullability
  override def nullable: Boolean = true
  private def jbd(v: Any): java.math.BigDecimal = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
    case l: Long => java.math.BigDecimal.valueOf(l)
    case i: Int => java.math.BigDecimal.valueOf(i.toLong)
    case s: Short => java.math.BigDecimal.valueOf(s.toLong)
    case b: Byte => java.math.BigDecimal.valueOf(b.toLong)
    case d: Double => new java.math.BigDecimal(d.toString)
    case f: Float => new java.math.BigDecimal(f.toString)
    case other => throw new IllegalArgumentException(
      s"divideDecimal expects numeric arguments, got $other")
  }
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val y = jbd(b)
    if (y.signum == 0) null
    else org.apache.spark.sql.types.Decimal(
      jbd(a).divide(y, scale, java.math.RoundingMode.DOWN), 38, scale)
  }
  override protected def withNewChildrenInternal(
    l: Expression, r: Expression): ChDecimalTruncDivExpr =
    copy(left = l, right = r)
}

/** Element-wise tuple arithmetic (tuplePlus/Minus/Negate and the
  * by-number forms) — arity is resolution-time, so eval walks the
  * struct fields; numeric fields computed in their own type (integral
  * fields in exact Long arithmetic — see combine).
  *
  * CodegenFallback BY DECISION, not leftover: the per-field type
  * dispatch (Decimal/Long/Double arms × 4 ops × N fields) would need
  * per-field generated branches for a struct-valued expression that
  * only ever runs row-narrow (CH tuples are hand-built coordinate/pair
  * values, never fact-table columns), and the fallback sits INSIDE the
  * enclosing WholeStageCodegen span (Spark wraps it in-place — the
  * span does not split). Interpreter cost is bounded by tuple width;
  * the hot paths (fact scans, joins, aggregations) never see it.
  */
case class ChTupleArithExpr(left: Expression, right: Option[Expression],
  op: String) extends Expression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def children: Seq[Expression] = left +: right.toSeq
  // result fields are nullable: div/intdiv/mod null a field on a zero
  // divisor even when the input tuple's fields are non-nullable literals
  override def dataType: DataType = left.dataType match {
    case StructType(fs) => StructType(fs.map(_.copy(nullable = true)))
    case other => other
  }
  override def nullable: Boolean = children.exists(_.nullable)
  private lazy val fields: Seq[DataType] = left.dataType match {
    case StructType(fs) => fs.map(_.dataType).toSeq
    case other => throw new IllegalArgumentException(
      s"tuple arithmetic expects a tuple, got ${other.sql}")
  }
  // the RIGHT tuple's fields must be read with ITS OWN field types —
  // an UnsafeRow read with the left's types reinterprets raw bytes
  // (tupleDivide(int64_tuple, float64_tuple) produced silent garbage;
  // r14 ADVICE). Non-struct right (the by-number scalar) never lands
  // on this path. Field-count mismatch throws a teaching message
  // instead of an index error.
  private lazy val rightFields: Seq[DataType] = right.map(_.dataType) match {
    case Some(StructType(fs)) =>
      require(fs.length == fields.length,
        s"tuple arithmetic: arity mismatch ${fields.length} vs ${fs.length}")
      fs.map(_.dataType).toSeq
    case _ => fields
  }
  private def toDoubleNum(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case l: Long => l.toDouble
    case x: Int => x.toDouble
    case s: Short => s.toDouble
    case b: Byte => b.toDouble
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case x: java.lang.Number => x.doubleValue()
    case other => throw new IllegalArgumentException(
      s"tuple arithmetic: non-numeric operand $other")
  }
  private def isIntegralNum(v: Any): Boolean = v match {
    case _: Long | _: Int | _: Short | _: Byte => true
    case _ => false
  }
  private def toLongNum(v: Any): Long = v match {
    case l: Long => l
    case x: Int => x.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case other => throw new IllegalArgumentException(
      s"tuple arithmetic: non-integral operand $other")
  }
  private def jbdNum(v: Any): java.math.BigDecimal = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
    case l: Long => java.math.BigDecimal.valueOf(l)
    case i: Int => java.math.BigDecimal.valueOf(i.toLong)
    case s: Short => java.math.BigDecimal.valueOf(s.toLong)
    case b: Byte => java.math.BigDecimal.valueOf(b.toLong)
    case d: Double => new java.math.BigDecimal(d.toString)
    case f: Float => new java.math.BigDecimal(f.toString)
    case other => throw new IllegalArgumentException(
      s"tuple arithmetic: non-numeric operand $other")
  }
  // Integral fields (Int64 tuples are the ClickHouse norm) combine in
  // EXACT Long arithmetic — a Double round-trip silently loses precision
  // above 2^53 where CH does exact integer math. Decimal fields combine
  // in exact BigDecimal. Double is used only for fractional FP field
  // types, or when the by-number scalar itself is fractional (the result
  // field type stays the tuple's own — CH widens to Float64 there; a
  // documented MIGRATION.md divergence).
  private def combine(dt: DataType, a: Any, b: Any): Any = dt match {
    case dtd: org.apache.spark.sql.types.DecimalType =>
      val x = jbdNum(a)
      val n = if (b == null) java.math.BigDecimal.ZERO else jbdNum(b)
      val y = op match {
        case "plus" => x.add(n)
        case "minus" => x.subtract(n)
        case "mulnum" | "mul" => x.multiply(n)
        // decimal div truncates toward zero at the field's own scale
        // (the ChDecimalTruncDivExpr rule); intdiv keeps the integral
        // quotient; zero divisor → null field
        case "div" =>
          if (n.signum == 0) return null
          x.divide(n, dtd.scale, java.math.RoundingMode.DOWN)
        case "intdiv" =>
          if (n.signum == 0) return null
          x.divideToIntegralValue(n)
        case "mod" =>
          if (n.signum == 0) return null
          x.remainder(n)
        case _ => x.negate()
      }
      org.apache.spark.sql.types.Decimal(y, dtd.precision, dtd.scale)
    case LongType | IntegerType | ShortType | ByteType
        if b == null || isIntegralNum(b) =>
      val x = toLongNum(a)
      val n = if (b == null) 0L else toLongNum(b)
      val y = op match {
        case "plus" => x + n
        case "minus" => x - n
        case "mulnum" | "mul" => x * n
        // field types stay the tuple's own (the mulnum rule): integral
        // fields divide EXACTLY — tupleDivide ≡ tupleIntDiv there, where
        // CH widens to Float64 (MIGRATION note); zero divisor → null
        // (the engine's non-ANSI Divide convention)
        case "div" | "intdiv" => if (n == 0L) return null else x / n
        case "mod" => if (n == 0L) return null else x % n
        case _ => -x
      }
      dt match {
        case LongType => y
        case IntegerType => y.toInt
        case ShortType => y.toShort
        case ByteType => y.toByte
        case _ => y
      }
    case DoubleType | FloatType | LongType | IntegerType | ShortType |
        ByteType =>
      val x = toDoubleNum(a)
      val n = if (b == null) 0.0 else toDoubleNum(b)
      val y = op match {
        case "plus" => x + n
        case "minus" => x - n
        case "mulnum" | "mul" => x * n
        case "div" => if (n == 0.0) return null else x / n
        // trunc toward zero, matching the exact Long path above and the
        // engine's scalar intDiv (IntegralDivide): tupleIntDiv((-7.0),
        // (2.0)) = -3.0, same sign convention as ((-7),(2)) = -3. A
        // floor here would silently diverge on negative quotients
        // (r14 ADVICE). Branchy trunc, not .toLong, so magnitudes past
        // 2^63 don't clamp.
        case "intdiv" =>
          if (n == 0.0) return null
          else { val q = x / n; if (q < 0) math.ceil(q) else math.floor(q) }
        case "mod" => if (n == 0.0) return null else x % n
        case _ => -x
      }
      dt match {
        case DoubleType => y
        case FloatType => y.toFloat
        case LongType => y.toLong
        case IntegerType => y.toInt
        case ShortType => y.toShort
        case ByteType => y.toByte
        case _ => y
      }
    case other => throw new IllegalArgumentException(
      s"tuple arithmetic: non-numeric field ${other.sql}")
  }
  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val ra = a.asInstanceOf[InternalRow]
    val rb = right.map(_.eval(input))
    if (right.nonEmpty && rb.get == null) return null
    val out = new Array[Any](fields.length)
    for ((dt, i) <- fields.zipWithIndex) {
      val b: Any = (op, rb) match {
        case ("mulnum", Some(n)) => n match {
          case _: Double | _: Long | _: Int | _: Float | _: Short | _: Byte => n
          case d: org.apache.spark.sql.types.Decimal =>
            // a whole decimal scalar stays on the exact Long path
            val bd = d.toJavaBigDecimal.stripTrailingZeros()
            if (bd.scale <= 0 && bd.precision - bd.scale <= 19)
              try bd.longValueExact() catch {
                case _: ArithmeticException => d.toDouble
              }
            else d.toDouble
          case x: java.lang.Number => x.doubleValue()
          case other => throw new IllegalArgumentException(
            s"tuple-by-number: non-numeric scalar $other")
        }
        case (_, Some(row: InternalRow)) =>
          row.get(i, rightFields(i)) match {
            case v @ (_: Double | _: Float | _: Long | _: Int | _: Short |
                _: Byte | _: org.apache.spark.sql.types.Decimal) => v
            case _ => null
          }
        case _ => null
      }
      out(i) = combine(dt, ra.get(i, dt), b)
    }
    InternalRow(out: _*)
  }
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): ChTupleArithExpr =
    copy(left = newChildren.head,
      right = if (newChildren.length > 1) Some(newChildren(1)) else None)
}

/** One-arg kernels of the eleventh batch (mode-dispatched). */
case class ChStringKernelExpr2(child: Expression, fn: String)
  extends UnaryExpression {
  override def dataType: DataType = fn match {
    case "urlHierarchy" | "urlPathHierarchy" => ArrayType(StringType)
    case _ => StringType
  }
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any = fn match {
    case "encodeForm" => ChScalarKernels2.encodeForm(v.asInstanceOf[UTF8String])
    case "decodeForm" => ChScalarKernels2.decodeForm(v.asInstanceOf[UTF8String])
    case "urlHierarchy" =>
      ChScalarKernels2.urlHierarchy(v.asInstanceOf[UTF8String])
    case "urlPathHierarchy" =>
      ChScalarKernels2.urlPathHierarchy(v.asInstanceOf[UTF8String])
    case _ => ChScalarKernels2.canonIPv6(v.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.ChScalarKernels2.$fn($v)")
  override protected def withNewChildInternal(c: Expression): ChStringKernelExpr2 =
    copy(child = c)
}

/** isIPAddressInRange(addr, cidr) → BOOLEAN, v4 + v6. */
case class ChIpInRangeExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ChScalarKernels2.ipInRange(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ChScalarKernels2.ipInRange($a, $b)")
  override protected def withNewChildrenInternal(l: Expression,
    r: Expression): ChIpInRangeExpr = copy(left = l, right = r)
}

/** ngramDistance(a, b) → DOUBLE (4-gram Sørensen–Dice complement). */
case class ChNgramDistanceExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ChScalarKernels2.ngramDistance(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ChScalarKernels2.ngramDistance($a, $b)")
  override protected def withNewChildrenInternal(l: Expression,
    r: Expression): ChNgramDistanceExpr = copy(left = l, right = r)
}

/** Standard geohash (public algorithm): alternating lon/lat bisection
  * bits, base32 alphabet; decode returns the cell center.
  */
object GeohashKernel {
  private val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  def encode(lon: Double, lat: Double, precision: Int): UTF8String = {
    val p = math.max(1, math.min(12, precision))
    var (lonLo, lonHi, latLo, latHi) = (-180.0, 180.0, -90.0, 90.0)
    val sb = new java.lang.StringBuilder(p)
    var bit = 0
    var ch = 0
    var even = true
    while (sb.length < p) {
      if (even) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
        else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
        else { ch = ch << 1; latHi = mid }
      }
      even = !even
      bit += 1
      if (bit == 5) { sb.append(alphabet.charAt(ch)); bit = 0; ch = 0 }
    }
    UTF8String.fromString(sb.toString)
  }

  /** (lon, lat) center of the cell. */
  def decode(h: UTF8String): InternalRow = {
    var (lonLo, lonHi, latLo, latHi) = (-180.0, 180.0, -90.0, 90.0)
    var even = true
    h.toString.foreach { c =>
      val v = alphabet.indexOf(c.toLower)
      require(v >= 0, s"geohashDecode: invalid character '$c'")
      var m = 16
      while (m > 0) {
        if (even) {
          val mid = (lonLo + lonHi) / 2
          if ((v & m) != 0) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if ((v & m) != 0) latLo = mid else latHi = mid
        }
        even = !even
        m >>= 1
      }
    }
    InternalRow((lonLo + lonHi) / 2, (latLo + latHi) / 2)
  }
}

/** geohashEncode(lon, lat, precision) → STRING. */
case class GeohashEncodeExpr(children: Seq[Expression]) extends Expression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(children.length == 3, "geohashEncode(lon, lat, precision)")
  override def dataType: DataType = StringType
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else {
      def d(a: Any): Double = a match {
        case x: Double => x
        case x: Float => x.toDouble
        case x: Long => x.toDouble
        case x: Int => x.toDouble
        case x: org.apache.spark.sql.types.Decimal => x.toDouble
        case other => throw new IllegalArgumentException(
          s"geohashEncode expects numeric coordinates, got $other")
      }
      val p = vs(2) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => d(other).toInt
      }
      GeohashKernel.encode(d(vs(0)), d(vs(1)), p)
    }
  }
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): GeohashEncodeExpr =
    copy(children = newChildren)
}

/** geohashDecode(h) → STRUCT<longitude: DOUBLE, latitude: DOUBLE>. */
case class GeohashDecodeExpr(child: Expression) extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("longitude", DoubleType, nullable = false),
    StructField("latitude", DoubleType, nullable = false)))
  override protected def nullSafeEval(v: Any): Any =
    GeohashKernel.decode(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): GeohashDecodeExpr =
    copy(child = c)
}
