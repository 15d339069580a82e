package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Seventeenth dialect batch — pure kernels. Same contract as batches
  * 1–4: exact, allocation-light, no Spark types in signatures beyond
  * UTF8String/ArrayData, every divergence documented in MIGRATION.md.
  */
object ChScalarKernels5 {

  /** CH initcap: the first character of each WORD upper-cased, the
    * rest lower — words are maximal ALPHANUMERIC runs (CH semantics),
    * not whitespace-delimited tokens (Spark's initcap), so
    * 'foo-bar' → 'Foo-Bar' here where Spark yields 'Foo-bar'.
    */
  def initcapCh(s: UTF8String): UTF8String = {
    val str = s.toString
    val out = new java.lang.StringBuilder(str.length)
    var prevAlnum = false
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      val alnum = Character.isLetterOrDigit(c)
      out.append(
        if (!alnum) c
        else if (prevAlnum) Character.toLowerCase(c)
        else Character.toUpperCase(c))
      prevAlnum = alnum
      i += 1
    }
    UTF8String.fromString(out.toString)
  }

  private val B32 = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"

  /** RFC 4648 base32 with padding (CH base32Encode). */
  def base32Encode(s: UTF8String): UTF8String = {
    val in = s.getBytes
    val out = new java.lang.StringBuilder((in.length + 4) / 5 * 8)
    var i = 0
    while (i < in.length) {
      val chunk = math.min(5, in.length - i)
      var acc = 0L
      var j = 0
      while (j < 5) {
        acc = (acc << 8) | (if (j < chunk) in(i + j) & 0xffL else 0L)
        j += 1
      }
      val symbols = chunk match {
        case 1 => 2; case 2 => 4; case 3 => 5; case 4 => 7; case _ => 8
      }
      var k = 0
      while (k < 8) {
        out.append(
          if (k < symbols) B32.charAt(((acc >>> (35 - 5 * k)) & 31).toInt)
          else '=')
        k += 1
      }
      i += 5
    }
    UTF8String.fromString(out.toString)
  }

  /** RFC 4648 base32 decode; THROWS on a malformed input (bad char,
    * bad length, bad padding) — the OrNull behavior is the builder's
    * try* registration, never a silent empty result.
    */
  def base32Decode(s: UTF8String): Array[Byte] = {
    val str = s.toString
    require(str.length % 8 == 0, s"base32Decode: length not a multiple of 8: '$str'")
    val out = new java.io.ByteArrayOutputStream(str.length / 8 * 5)
    var i = 0
    while (i < str.length) {
      var acc = 0L
      var pad = 0
      var j = 0
      while (j < 8) {
        val c = str.charAt(i + j)
        if (c == '=') { pad += 1; acc <<= 5 }
        else {
          require(pad == 0, s"base32Decode: symbol after padding in '$str'")
          val v = B32.indexOf(Character.toUpperCase(c))
          require(v >= 0, s"base32Decode: invalid symbol '$c'")
          acc = (acc << 5) | v
        }
        j += 1
      }
      val nBytes = pad match {
        case 0 => 5; case 1 => 4; case 3 => 3; case 4 => 2; case 6 => 1
        case p => throw new IllegalArgumentException(
          s"base32Decode: invalid padding length $p in '$str'")
      }
      var k = 0
      while (k < nBytes) { out.write(((acc >>> (32 - 8 * k)) & 0xff).toInt); k += 1 }
      i += 8
    }
    out.toByteArray
  }

  /** Count of distinct byte values in the string (CH stringBytesUniq). */
  def stringBytesUniq(s: UTF8String): Long = {
    val seen = new Array[Boolean](256)
    val b = s.getBytes
    var i = 0
    var n = 0L
    while (i < b.length) {
      val v = b(i) & 0xff
      if (!seen(v)) { seen(v) = true; n += 1 }
      i += 1
    }
    n
  }

  /** Shannon entropy (bits) of the byte distribution (CH
    * stringBytesEntropy); 0 for empty input.
    */
  def stringBytesEntropy(s: UTF8String): Double = {
    val b = s.getBytes
    if (b.isEmpty) return 0.0
    val freq = new Array[Int](256)
    var i = 0
    while (i < b.length) { freq(b(i) & 0xff) += 1; i += 1 }
    var h = 0.0
    val n = b.length.toDouble
    var v = 0
    while (v < 256) {
      if (freq(v) > 0) { val p = freq(v) / n; h -= p * (math.log(p) / math.log(2.0)) }
      v += 1
    }
    h
  }

  /** CH pointInEllipses(x, y, x0, y0, a0, b0, …): true when the point
    * lies inside (or on) ANY of the axis-aligned ellipses.
    */
  def pointInEllipses(x: Double, y: Double, params: Array[Double]): Boolean = {
    var i = 0
    while (i < params.length) {
      val (cx, cy, a, b) = (params(i), params(i + 1), params(i + 2), params(i + 3))
      val dx = (x - cx) / a
      val dy = (y - cy) / b
      if (dx * dx + dy * dy <= 1.0) return true
      i += 4
    }
    false
  }

  private val Crockford = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"

  /** ULID text → its embedded millisecond timestamp as epoch MICROS
    * (the TimestampType payload); throws on a malformed ULID.
    */
  def ulidToMicros(s: UTF8String): Long = {
    val str = s.toString
    require(str.length == 26, s"ULIDStringToDateTime: need 26 chars, got '$str'")
    var ms = 0L
    var i = 0
    while (i < 10) {
      val v = Crockford.indexOf(Character.toUpperCase(str.charAt(i)))
      require(v >= 0, s"ULIDStringToDateTime: invalid symbol '${str.charAt(i)}'")
      ms = (ms << 5) | v
      i += 1
    }
    ms * 1000L
  }

  /** UUIDv7 (RFC 9562): 48-bit ms timestamp, version 7, variant 10,
    * 74 random bits. Nondeterministic like generateULID.
    */
  def uuidV7(): UTF8String = {
    val r = java.util.concurrent.ThreadLocalRandom.current()
    val ts = System.currentTimeMillis()
    val hi = (ts << 16) | 0x7000L | (r.nextLong() & 0x0fffL)
    val lo = (r.nextLong() & 0x3fffffffffffffffL) | 0x8000000000000000L
    UTF8String.fromString(new java.util.UUID(hi, lo).toString)
  }

  /** CH arrayNormalizedGini(predicted, label) → (giniPredicted,
    * giniMax, normalized): Gini coefficient of the label mass in
    * descending-prediction order, its maximum (labels self-sorted),
    * and the ratio. Ties in `predicted` break by position (stable
    * sort), matching a deterministic single-node evaluation.
    */
  def arrayNormalizedGini(pred: Array[Double], label: Array[Double])
    : Array[Double] = {
    require(pred.length == label.length,
      "arrayNormalizedGini: arrays must have equal length")
    val n = pred.length
    if (n == 0) return Array(0.0, 0.0, 0.0)
    def gini(order: Array[Int]): Double = {
      val total = label.sum
      if (total == 0.0) return 0.0
      var cum = 0.0
      var area = 0.0
      var i = 0
      while (i < n) {
        cum += label(order(i))
        area += cum / total
        i += 1
      }
      // normalized area between the curve and the diagonal
      (area - (n + 1) / 2.0) / n * 2.0
    }
    val byPred = Array.range(0, n).sortBy(i => (-pred(i), i))
    val byLabel = Array.range(0, n).sortBy(i => (-label(i), i))
    val g = gini(byPred)
    val gMax = gini(byLabel)
    Array(g, gMax, if (gMax == 0.0) 0.0 else g / gMax)
  }

  /** IPv6 CIDR → (lower, upper) canonical bounds (CH IPv6CIDRToRange). */
  def ipv6CidrToRange(addr: UTF8String, prefix: Int): Array[UTF8String] = {
    val g = ChScalarKernels2.parse6(addr.toString)
    require(g != null, s"IPv6CIDRToRange: not an IPv6 address: $addr")
    require(prefix >= 0 && prefix <= 128,
      s"IPv6CIDRToRange: prefix out of range: $prefix")
    val lo = new Array[Int](8)
    val hi = new Array[Int](8)
    var i = 0
    while (i < 8) {
      val bits = math.max(0, math.min(16, prefix - 16 * i))
      val mask = if (bits == 0) 0 else (0xffff << (16 - bits)) & 0xffff
      lo(i) = g(i) & mask
      hi(i) = (g(i) & mask) | (~mask & 0xffff)
      i += 1
    }
    def fmt(groups: Array[Int]): UTF8String = ChScalarKernels2.canonIPv6(
      UTF8String.fromString(groups.map(Integer.toHexString).mkString(":")))
    Array(fmt(lo), fmt(hi))
  }

  /** JSONExtractKeysAndValues(json, keys…, 'String'): top-level (or
    * path-descended) object's (key, value) pairs with values read as
    * strings (scalars unquoted, nested nodes as raw JSON).
    */
  def jsonKeysAndValuesString(json: UTF8String,
    path: Array[UTF8String]): GenericArrayData = {
    val n = ChScalarKernels2.nodeAtPath(json.toString, path.map(_.toString).toSeq)
    if (n == null || !n.isObject) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val it = n.fields()
    while (it.hasNext) {
      val e = it.next()
      val v = if (e.getValue.isValueNode) e.getValue.asText()
        else e.getValue.toString
      out += InternalRow(UTF8String.fromString(e.getKey),
        UTF8String.fromString(v))
    }
    new GenericArrayData(out.toArray)
  }

  // ---- eighteenth batch ----------------------------------------------

  /** CH parseTimeDelta: readable duration → seconds (Float64). Tokens
    * are number+unit with space/'+'/','/';' separators; units follow
    * CH's table (years/months/weeks/days/hours/minutes/seconds/
    * milliseconds/microseconds/nanoseconds, full or short spellings;
    * year = 365 d and month = 30.5 d per CH's calendar conventions).
    * Throws on malformed input.
    */
  def parseTimeDelta(s: UTF8String): Double = {
    val txt = s.toString.trim.toLowerCase(java.util.Locale.ROOT)
    require(txt.nonEmpty, "parseTimeDelta: empty input")
    val m = java.util.regex.Pattern
      .compile("([0-9]*\\.?[0-9]+)\\s*([a-z]+)").matcher(txt)
    var total = 0.0
    var matchedTo = 0
    var any = false
    while (m.find()) {
      // only separators may sit between tokens
      val gap = txt.substring(matchedTo, m.start())
      require(gap.forall(c => " \t+,;".indexOf(c) >= 0),
        s"parseTimeDelta: unparsable segment '$gap' in '$txt'")
      val num = m.group(1).toDouble
      val mult = m.group(2) match {
        // CH's calendar conventions: year = 365 d, month = 30.5 d
        // (r14 ADVICE parity gap — these threw before)
        case "y" | "yr" | "yrs" | "year" | "years" => 31536000.0
        case "mo" | "month" | "months" => 2635200.0
        case "w" | "week" | "weeks" => 604800.0
        case "d" | "day" | "days" => 86400.0
        case "h" | "hr" | "hrs" | "hour" | "hours" => 3600.0
        case "m" | "min" | "mins" | "minute" | "minutes" => 60.0
        case "s" | "sec" | "secs" | "second" | "seconds" => 1.0
        case "ms" | "millisecond" | "milliseconds" => 0.001
        case "us" | "microsecond" | "microseconds" => 1e-6
        case "ns" | "nanosecond" | "nanoseconds" => 1e-9
        case u => throw new IllegalArgumentException(
          s"parseTimeDelta: unknown unit '$u' in '$txt'")
      }
      total += num * mult
      any = true
      matchedTo = m.end()
    }
    require(any && txt.substring(matchedTo)
      .forall(c => " \t+,;".indexOf(c) >= 0),
      s"parseTimeDelta: unparsable input '$txt'")
    total
  }

  /** UUIDv7 text → its embedded millisecond timestamp as epoch MICROS;
    * throws unless the value parses and carries version 7.
    */
  def uuidV7ToMicros(s: UTF8String): Long = {
    val u = java.util.UUID.fromString(s.toString)
    require(u.version() == 7,
      s"UUIDv7ToDateTime: not a v7 UUID (version ${u.version()}): $s")
    (u.getMostSignificantBits >>> 16) * 1000L
  }

  /** CH extractKeyValuePairs, default dials: ':' key-value delimiter,
    * space/','/';' pair delimiters, first occurrence of a key wins.
    */
  def extractKeyValuePairs(s: UTF8String)
    : org.apache.spark.sql.catalyst.util.ArrayBasedMapData = {
    val keys = scala.collection.mutable.ArrayBuffer.empty[Any]
    val vals = scala.collection.mutable.ArrayBuffer.empty[Any]
    val seen = scala.collection.mutable.HashSet.empty[String]
    s.toString.split("[ ,;]+").foreach { tok =>
      val cut = tok.indexOf(':')
      if (cut > 0 && cut < tok.length - 1) {
        val k = tok.substring(0, cut)
        if (seen.add(k)) {
          keys += UTF8String.fromString(k)
          vals += UTF8String.fromString(tok.substring(cut + 1))
        }
      }
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new GenericArrayData(keys.toArray),
      new GenericArrayData(vals.toArray))
  }

  // ---- original Porter stemmer (Porter 1980; public algorithm) ------
  // CH's stem('en', w) runs Snowball english (Porter2); this is the
  // ORIGINAL Porter — stems differ on a documented minority of words
  // (MIGRATION.md). Lowercase ASCII in/out; non-alpha input passes
  // through untouched.

  private def isCons(w: java.lang.StringBuilder, i: Int): Boolean =
    w.charAt(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => i == 0 || !isCons(w, i - 1)
      case _ => true
    }

  /** Porter's m: number of VC sequences in w[0..end]. */
  private def measure(w: java.lang.StringBuilder, end: Int): Int = {
    var m = 0
    var i = 0
    while (i <= end && isCons(w, i)) i += 1
    while (i <= end) {
      while (i <= end && !isCons(w, i)) i += 1
      if (i <= end) {
        m += 1
        while (i <= end && isCons(w, i)) i += 1
      }
    }
    m
  }

  private def hasVowel(w: java.lang.StringBuilder, end: Int): Boolean = {
    var i = 0
    while (i <= end) { if (!isCons(w, i)) return true; i += 1 }
    false
  }

  private def endsWith(w: java.lang.StringBuilder, suf: String): Boolean = {
    val n = w.length
    n >= suf.length && w.substring(n - suf.length) == suf
  }

  /** cvc at the end, final c not w/x/y (Porter's *o condition). */
  private def cvcEnd(w: java.lang.StringBuilder): Boolean = {
    val n = w.length
    if (n < 3) return false
    val c = w.charAt(n - 1)
    isCons(w, n - 3) && !isCons(w, n - 2) && isCons(w, n - 1) &&
      c != 'w' && c != 'x' && c != 'y'
  }

  private def doubleCons(w: java.lang.StringBuilder): Boolean = {
    val n = w.length
    n >= 2 && w.charAt(n - 1) == w.charAt(n - 2) && isCons(w, n - 1)
  }

  def porterStem(word: UTF8String): UTF8String = {
    val in = word.toString
    if (in.length <= 2 || !in.forall(c => c >= 'a' && c <= 'z'))
      return word
    val w = new java.lang.StringBuilder(in)
    def mStem(suf: String): Int = measure(w, w.length - suf.length - 1)
    def replace(suf: String, to: String): Unit =
      w.replace(w.length - suf.length, w.length, to)
    // step 1a
    if (endsWith(w, "sses")) replace("sses", "ss")
    else if (endsWith(w, "ies")) replace("ies", "i")
    else if (!endsWith(w, "ss") && endsWith(w, "s")) replace("s", "")
    // step 1b
    var cleanup = false
    if (endsWith(w, "eed")) {
      if (mStem("eed") > 0) replace("eed", "ee")
    } else if (endsWith(w, "ed") && hasVowel(w, w.length - 3)) {
      replace("ed", ""); cleanup = true
    } else if (endsWith(w, "ing") && w.length > 3 &&
      hasVowel(w, w.length - 4)) {
      replace("ing", ""); cleanup = true
    }
    if (cleanup) {
      if (endsWith(w, "at") || endsWith(w, "bl") || endsWith(w, "iz"))
        w.append('e')
      else if (doubleCons(w) && !"lsz".contains(w.charAt(w.length - 1)))
        w.deleteCharAt(w.length - 1)
      else if (measure(w, w.length - 1) == 1 && cvcEnd(w))
        w.append('e')
    }
    // step 1c
    if (endsWith(w, "y") && hasVowel(w, w.length - 2))
      w.setCharAt(w.length - 1, 'i')
    // step 2 (m > 0)
    val step2 = Seq("ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
      "anci" -> "ance", "izer" -> "ize", "abli" -> "able", "alli" -> "al",
      "entli" -> "ent", "eli" -> "e", "ousli" -> "ous", "ization" -> "ize",
      "ation" -> "ate", "ator" -> "ate", "alism" -> "al", "iveness" -> "ive",
      "fulness" -> "ful", "ousness" -> "ous", "aliti" -> "al",
      "iviti" -> "ive", "biliti" -> "ble")
    step2.find { case (suf, _) => endsWith(w, suf) }.foreach {
      case (suf, to) => if (mStem(suf) > 0) replace(suf, to)
    }
    // step 3 (m > 0)
    val step3 = Seq("icate" -> "ic", "ative" -> "", "alize" -> "al",
      "iciti" -> "ic", "ical" -> "ic", "ful" -> "", "ness" -> "")
    step3.find { case (suf, _) => endsWith(w, suf) }.foreach {
      case (suf, to) => if (mStem(suf) > 0) replace(suf, to)
    }
    // step 4 (m > 1); "ion" needs preceding s/t
    val step4 = Seq("al", "ance", "ence", "er", "ic", "able", "ible",
      "ant", "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
      "ous", "ive", "ize")
    step4.find(endsWith(w, _)).foreach { suf =>
      val ok = suf != "ion" || {
        val p = w.length - 4
        p >= 0 && (w.charAt(p) == 's' || w.charAt(p) == 't')
      }
      if (ok && mStem(suf) > 1) replace(suf, "")
    }
    // step 5a
    if (endsWith(w, "e")) {
      val m = mStem("e")
      if (m > 1 || (m == 1 && {
        w.deleteCharAt(w.length - 1)
        val keep = cvcEnd(w)
        w.append('e')
        !keep
      })) w.deleteCharAt(w.length - 1)
    }
    // step 5b
    if (measure(w, w.length - 1) > 1 && doubleCons(w) &&
      w.charAt(w.length - 1) == 'l')
      w.deleteCharAt(w.length - 1)
    UTF8String.fromString(w.toString)
  }
}

/** Thin unary kernels of the seventeenth batch. */
case class ChUnaryKernel5Expr(child: Expression, fn: String)
  extends UnaryExpression {
  override def dataType: DataType = fn match {
    case "initcapch" | "base32encode" | "porterstem" => StringType
    case "base32decode" => BinaryType
    case "stringbytesuniq" => LongType
    case "stringbytesentropy" | "parsetimedelta" => DoubleType
    case "ulidtomicros" | "uuidv7tomicros" => TimestampType
    case "extractkvp" => MapType(StringType, StringType)
    case _ => throw new IllegalArgumentException(s"unknown kernel $fn")
  }
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any = fn match {
    case "initcapch" => ChScalarKernels5.initcapCh(v.asInstanceOf[UTF8String])
    case "base32encode" =>
      ChScalarKernels5.base32Encode(v.asInstanceOf[UTF8String])
    case "base32decode" =>
      ChScalarKernels5.base32Decode(v.asInstanceOf[UTF8String])
    case "porterstem" => ChScalarKernels5.porterStem(v.asInstanceOf[UTF8String])
    case "stringbytesuniq" =>
      ChScalarKernels5.stringBytesUniq(v.asInstanceOf[UTF8String])
    case "stringbytesentropy" =>
      ChScalarKernels5.stringBytesEntropy(v.asInstanceOf[UTF8String])
    case "ulidtomicros" =>
      ChScalarKernels5.ulidToMicros(v.asInstanceOf[UTF8String])
    case "parsetimedelta" =>
      ChScalarKernels5.parseTimeDelta(v.asInstanceOf[UTF8String])
    case "uuidv7tomicros" =>
      ChScalarKernels5.uuidV7ToMicros(v.asInstanceOf[UTF8String])
    case "extractkvp" =>
      ChScalarKernels5.extractKeyValuePairs(v.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = fn match {
      case "initcapch" => "initcapCh"
      case "base32encode" => "base32Encode"
      case "base32decode" => "base32Decode"
      case "porterstem" => "porterStem"
      case "stringbytesuniq" => "stringBytesUniq"
      case "stringbytesentropy" => "stringBytesEntropy"
      case "ulidtomicros" => "ulidToMicros"
      case "parsetimedelta" => "parseTimeDelta"
      case "uuidv7tomicros" => "uuidV7ToMicros"
      case "extractkvp" => "extractKeyValuePairs"
    }
    defineCodeGen(ctx, ev, a => s"graft.functions.ChScalarKernels5.$m($a)")
  }
  override protected def withNewChildInternal(c: Expression)
    : ChUnaryKernel5Expr = copy(child = c)
}

/** Catch-to-null wrapper: the generic try* builder (tryBase32Decode,
  * tryIdnaEncode) over any throwing kernel expression. CodegenFallback
  * by design — a dialect-probe surface, never the hot path.
  */
case class ChTryOrNullExpr(child: Expression) extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any =
    try child.eval(input) catch { case _: Exception => null }
  override protected def withNewChildInternal(c: Expression)
    : ChTryOrNullExpr = copy(child = c)
}

/** pointInEllipses((x, y), x0, y0, a0, b0, …) — variadic ellipse list;
  * children are pre-cast doubles (builder does the casting).
  */
case class ChPointInEllipsesExpr(children: Seq[Expression])
  extends Expression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) return null
    val ds = vs.map(_.asInstanceOf[Double]).toArray
    ChScalarKernels5.pointInEllipses(ds(0), ds(1), ds.drop(2))
  }
  override protected def withNewChildrenInternal(
    cs: IndexedSeq[Expression]): ChPointInEllipsesExpr = copy(children = cs)
}

/** generateUUIDv7() — RFC 9562 v7; nondeterministic like generateULID. */
case class ChUuidV7Expr()
  extends org.apache.spark.sql.catalyst.expressions.LeafExpression
  with org.apache.spark.sql.catalyst.expressions.Nondeterministic
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override protected def initializeInternal(partitionIndex: Int): Unit = ()
  override protected def evalInternal(input: InternalRow): Any =
    ChScalarKernels5.uuidV7()
}

/** arrayNormalizedGini(pred, label) → named tuple of 3 doubles. */
case class ChNormalizedGiniExpr(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("_1", DoubleType), StructField("_2", DoubleType),
    StructField("_3", DoubleType)))
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    def ds(v: Any): Array[Double] = {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      arr.toDoubleArray()
    }
    val g = ChScalarKernels5.arrayNormalizedGini(ds(a), ds(b))
    InternalRow(g(0), g(1), g(2))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
    : ChNormalizedGiniExpr = copy(left = l, right = r)
}

/** IPv6CIDRToRange(addr, prefix) → named tuple (lower, upper). */
case class ChIpv6CidrRangeExpr(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("_1", StringType), StructField("_2", StringType)))
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, p: Any): Any = {
    val r = ChScalarKernels5.ipv6CidrToRange(
      a.asInstanceOf[UTF8String], p.asInstanceOf[Int])
    InternalRow(r(0), r(1))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
    : ChIpv6CidrRangeExpr = copy(left = l, right = r)
}

/** JSONExtractKeysAndValues(json, keys…, 'String') — the String form;
  * children = json [, path keys] (the type literal is consumed by the
  * builder).
  */
case class ChJsonKeysValuesExpr(children: Seq[Expression])
  extends Expression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("_1", StringType), StructField("_2", StringType))))
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.head == null) return null
    val path = vs.tail.map(v =>
      if (v == null) return null else v.asInstanceOf[UTF8String]).toArray
    ChScalarKernels5.jsonKeysAndValuesString(
      vs.head.asInstanceOf[UTF8String], path)
  }
  override protected def withNewChildrenInternal(
    cs: IndexedSeq[Expression]): ChJsonKeysValuesExpr = copy(children = cs)
}
