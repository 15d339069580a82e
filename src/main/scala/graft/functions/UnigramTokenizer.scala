package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM tokenizer kernels (the SentencePiece family next to
  * TextOps' BPE): Viterbi segmentation of one word under quantized
  * integer log-scores.
  *
  * The whole design is EXACT-integer so a DuckDB oracle can replay it
  * bit for bit: a piece's score is `length(bin(count))` (the quantized
  * log2 the engines agree on digit-for-digit — no FP log anywhere), the
  * per-piece LM penalty is the corpus-level `length(bin(total))`, and
  * Viterbi maximizes Σ(score − penalty) with the deterministic
  * tie-break (max score, then fewest pieces, then longest last piece) —
  * the same total order the oracle's integer candidate key encodes, so
  * both engines pick identical segmentations even among likelihood
  * ties. Positions are CODE POINTS (Spark `length`/`substring` and
  * DuckDB `LEN`/`SUBSTR` semantics), not UTF-16 units.
  */
object UnigramKernels {

  /** Max piece length — the seed lattice enumerates substrings up to
    * this many code points (SentencePiece's max_sentencepiece_length
    * dial; 4 keeps the seed table corpus-bounded and the DP frame
    * constant-width in the SQL oracle).
    */
  val MaxPiece = 4

  /** Viterbi-segment `word` under `score` (piece → quantized log-score)
    * with per-piece penalty `l2c`; returns the '|'-prefixed piece list
    * ("|un|ig|ram"), or "" if no segmentation exists under the given
    * vocabulary (cannot happen when all single code points are scored).
    */
  def viterbiSeg(word: String,
    score: java.util.HashMap[String, java.lang.Integer],
    l2c: Int): String = {
    if (word.isEmpty) return ""
    // code-point offsets so piece extraction matches SQL substring
    val nUtf16 = word.length
    val n = word.codePointCount(0, nUtf16)
    val off = new Array[Int](n + 1)
    var oi = 0
    var pos = 0
    while (pos < nUtf16) {
      off(oi) = pos
      pos += Character.charCount(word.codePointAt(pos))
      oi += 1
    }
    off(n) = nUtf16
    val NEG = Int.MinValue / 4
    val best = Array.fill(n + 1)(NEG)
    val kArr = new Array[Int](n + 1)
    val lenArr = new Array[Int](n + 1) // chosen last-piece length (backtrack)
    best(0) = 0
    var i = 1
    while (i <= n) {
      var m = 1
      while (m <= MaxPiece && m <= i) {
        if (best(i - m) > NEG) {
          val sc = score.get(word.substring(off(i - m), off(i)))
          if (sc ne null) {
            val v = best(i - m) + sc.intValue() - l2c
            val k = kArr(i - m) + 1
            // max score, then min k, then max m — the oracle's key order
            val take =
              if (best(i) == NEG) true
              else if (v != best(i)) v > best(i)
              else if (k != kArr(i)) k < kArr(i)
              else m > lenArr(i)
            if (take) { best(i) = v; kArr(i) = k; lenArr(i) = m }
          }
        }
        m += 1
      }
      i += 1
    }
    if (best(n) == NEG) return ""
    // backtrack; pieces emitted left to right
    val lens = new Array[Int](kArr(n))
    var at = n
    var j = kArr(n) - 1
    while (at > 0) { lens(j) = lenArr(at); at -= lenArr(at); j -= 1 }
    val sb = new StringBuilder(nUtf16 + kArr(n))
    var p = 0
    var li = 0
    while (li < lens.length) {
      sb.append('|').append(word.substring(off(p), off(p + lens(li))))
      p += lens(li)
      li += 1
    }
    sb.toString
  }
}

/** graft_unigram_seg(word, pieces, scores, l2c) → the '|'-prefixed
  * Viterbi piece list. The vocabulary rides in as two FOLDABLE array
  * literals (pieces + their quantized log-scores) so one registered
  * function serves any trained model; the lookup map is built once per
  * plan instance. CodegenFallback by design: the expression runs over
  * the DISTINCT-WORD vocabulary only (thousands of rows at any corpus
  * size — the corpus itself never meets this expression), so
  * interpreted eval is off the hot path, and the DP's data-dependent
  * loop has no profitable codegen form.
  */
case class UnigramSegExpr(word: Expression, pieces: Expression,
  scores: Expression, l2c: Expression)
  extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(word, pieces, scores, l2c)
  override def dataType: DataType = StringType
  override def nullable: Boolean = word.nullable

  override def checkInputDataTypes()
    : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = word.dataType == StringType &&
      pieces.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
      scores.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
      l2c.dataType == IntegerType && pieces.foldable && scores.foldable &&
      l2c.foldable
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "graft_unigram_seg(word STRING, pieces ARRAY<STRING> literal, " +
        "scores ARRAY<INT> literal, l2c INT literal)")
  }

  // vocabulary map built once per plan instance from the foldable args
  @transient private lazy val vocabMap
    : java.util.HashMap[String, java.lang.Integer] = {
    val ps = pieces.eval(null).asInstanceOf[ArrayData]
    val ss = scores.eval(null).asInstanceOf[ArrayData]
    require(ps.numElements() == ss.numElements(),
      "graft_unigram_seg: pieces and scores must align")
    val m = new java.util.HashMap[String, java.lang.Integer](
      ps.numElements() * 2)
    var i = 0
    while (i < ps.numElements()) {
      m.put(ps.getUTF8String(i).toString, Integer.valueOf(ss.getInt(i)))
      i += 1
    }
    m
  }
  @transient private lazy val l2cVal: Int =
    l2c.eval(null).asInstanceOf[Int]

  override def eval(
    input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val w = word.eval(input)
    if (w == null) null
    else UTF8String.fromString(UnigramKernels.viterbiSeg(
      w.asInstanceOf[UTF8String].toString, vocabMap, l2cVal))
  }

  override protected def withNewChildrenInternal(
    cs: IndexedSeq[Expression]): UnigramSegExpr =
    copy(word = cs(0), pieces = cs(1), scores = cs(2), l2c = cs(3))
}
