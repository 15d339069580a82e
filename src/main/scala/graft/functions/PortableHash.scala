package graft.functions

/** The portable hash family behind every near-dup / ANN signature.
  *
  * Requirement: the DuckDB correctness oracle must reproduce signatures
  * bit-for-bit, so all hashing is 31-bit arithmetic over the Mersenne
  * prime P = 2^31-1 — every intermediate stays below 2^62, which both
  * Spark longs and DuckDB's overflow-checked BIGINT evaluate exactly.
  *
  *   - word/shingle base hash: polynomial fold  h = (31·h + byte) mod P
  *     seeded at 7 (shingles fold their tokens joined by a single space,
  *     so signatures are whitespace-layout invariant)
  *   - seeded variants:  h_j(x) = (a_j·x + b_j) mod P  with LCG-derived
  *     coefficient tables (classic multiplicative universal hashing)
  *   - simhash bit j of a word = parity of h_j(wordHash)
  *   - hyperplane signs for embedding LSH: ±1 from the same family,
  *     materialized as literal tables (they are model constants)
  *
  * The SQL-fragment builders below emit the exact same arithmetic for
  * DuckDB (ASCII text: JVM UTF-8 bytes == SQL code points; the test
  * corpus is ASCII and non-ASCII inputs merely fall outside oracle
  * coverage, not correctness).
  */
object PortableHash {

  /** Mersenne prime 2^31 - 1. */
  val P = 2147483647L

  /** Fingerprint modulus (text_fingerprint contract). */
  val FpM = 1000000007L

  private def lcg(i: Long): Long = (1103515245L * i + 12345L) % P

  private val MaxCoef = 128
  private val A: Array[Long] =
    Array.tabulate(MaxCoef) { j => val v = lcg(2L * j + 1); if (v == 0L) 1L else v }
  private val B: Array[Long] = Array.tabulate(MaxCoef)(j => lcg(2L * j + 2))

  def coefA(j: Int): Long = A(j)
  def coefB(j: Int): Long = B(j)

  /** h_j(x) = (a_j·x + b_j) mod P for x in [0, P). */
  def seeded(x: Long, j: Int): Long = (A(j) * x + B(j)) % P

  /** ±1 hyperplane sign table (planes × dims) for random-hyperplane LSH. */
  def planeSigns(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (p, d) =>
      if ((seeded(lcg(1000L + d), 64 + p) & 1L) == 1L) 1.0 else -1.0
    }

  // ---- DuckDB SQL fragments ----------------------------------------------

  /** SQL literal list of coefficient table a (1-indexed in SQL: a[j+1]). */
  def coefASql(n: Int): String = (0 until n).map(A).mkString("[", ", ", "]")
  def coefBSql(n: Int): String = (0 until n).map(B).mkString("[", ", ", "]")

  /** Portable word hash of a VARCHAR expression (polynomial byte fold). */
  def wordHashSql(w: String): String =
    s"list_reduce(list_prepend(7::BIGINT, " +
      s"list_transform(string_split($w, ''), c -> ascii(c)::BIGINT)), " +
      s"(a, x) -> (a * 31 + x) % $P)"

  /** Portable ~61-bit hash of a VARCHAR expression: the 31/P fold paired
    * with an independent 131-mod-FpM fold, combined as h1·FpM + h2. A
    * single 31-bit fold collides at ~10⁶ distinct keys (birthday bound) —
    * too narrow for corpus-wide window/shingle keys — while the pair is
    * safe to ~10⁹ and every intermediate stays below 2^62, exact in both
    * Spark longs and DuckDB's overflow-checked BIGINT.
    */
  def wideHashSql(w: String): String = {
    val h2 = s"list_reduce(list_prepend(7::BIGINT, " +
      s"list_transform(string_split($w, ''), c -> ascii(c)::BIGINT)), " +
      s"(a, x) -> (a * 131 + x) % $FpM)"
    s"(${wordHashSql(w)} * $FpM + $h2)"
  }

  /** SQL literal for one plane's ±1 sign vector. */
  def signsSql(signs: Array[Double]): String =
    signs.map(s => if (s > 0) "1.0" else "-1.0").mkString("[", ", ", "]::DOUBLE[]")
}
