package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Shared random-hyperplane LSH machinery for embedding operators
  * (ann_lsh, dedup_embedding): one literal ±1 sign table from the
  * portable family, the projection/bucket Column builders, and their
  * exact DuckDB SQL mirrors. Keeping a single definition guarantees the
  * Spark plans and oracle SQL of every consumer stay in lockstep.
  */
object VectorLsh {

  val NPlanes = 8
  val MaxPlanes = 20
  val Dim = 64

  /** Literal ±1 hyperplane table — a model constant mirrored into SQL.
    * Sized to MaxPlanes; the first NPlanes rows are the legacy 8-plane
    * table (planeSigns is per-(plane, dim) deterministic).
    */
  val signs: Array[Array[Double]] = PortableHash.planeSigns(MaxPlanes, Dim)

  /** Corpus-size-derived plane count: enough planes that the EXPECTED
    * bucket holds ≤ ~16 vectors (2^np ≥ corpus/16), clamped to
    * [NPlanes, MaxPlanes]. A bucket self-join is O(per-bucket²) and the
    * TOTAL candidate count is n²/buckets, so the key space must grow
    * with the corpus as soon as occupancy passes the target — the r13
    * /1000 target left buckets FIXED at 256 through the whole
    * 4k–256k range and the r14 second-decade measurement caught the
    * quadratic ramp it implies (dedup_embedding 0.32 → 20.8 s on a 10×
    * corpus, 65.9× — candidates n²/256). /16 starts growing the key
    * space right above the driver SFs (n ≤ 4000 keeps np = 8, so every
    * driver-SF hash is unchanged) and holds total candidates ≈ 8·n at
    * any scale. Exact 1.0-cosine clones collide under ANY plane count;
    * near-threshold recall trades down as planes grow — the documented
    * LSH dial, with multiprobe as the recall lever. Integer-exact
    * bit-length arithmetic so the DuckDB mirror (planesForSql) can
    * never drift on an FP log boundary: np = bitlength(ceil(n/16) - 1).
    */
  def planesFor(corpusSize: Long): Int = {
    val m = (corpusSize + 15) / 16
    val bits = if (m <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1)
    math.min(MaxPlanes, math.max(NPlanes, bits))
  }

  /** SQL mirror of planesFor over a COUNT(*) expression. */
  def planesForSql(countExpr: String): String =
    s"LEAST($MaxPlanes, GREATEST($NPlanes, CASE WHEN (($countExpr) + 15) // 16 <= 1 " +
      s"THEN 0 ELSE LENGTH(BIN((($countExpr) + 15) // 16 - 1)) END))"

  def proj(p: Int, vec: Column): Column =
    aggregate(
      zip_with(vec, typedlit(signs(p).toSeq), (x, s) => x.cast(DoubleType) * s),
      lit(0.0), (acc, v) => acc + v)

  /** Bucket: sign bit per hyperplane, nPlanes of them (default: the
    * fixed 8-plane key ann_lsh uses — its bucket map is broadcast-side
    * only, so its key space need not scale with the corpus).
    */
  def bucket(vec: Column, nPlanes: Int = NPlanes): Column =
    (0 until nPlanes).map { p =>
      when(proj(p, vec) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  def projSql(p: Int, vecExpr: String): String =
    s"LIST_SUM(LIST_TRANSFORM(LIST_ZIP($vecExpr, ${PortableHash.signsSql(signs(p))}), " +
      "pr -> CAST(pr[1] AS DOUBLE) * pr[2]))"

  def bucketSql(vecExpr: String): String =
    (0 until NPlanes).map { p =>
      s"CASE WHEN ${projSql(p, vecExpr)} > 0 THEN ${1L << p} ELSE 0 END"
    }.mkString("(", " + ", ")")

  /** Dynamic-width SQL bucket: all MaxPlanes projections, masked to the
    * first `npExpr` planes (a scalar subquery over the corpus count) —
    * the mirror of bucket(vec, planesFor(n)).
    */
  def bucketSqlDynamic(vecExpr: String, npExpr: String): String =
    (0 until MaxPlanes).map { p =>
      s"CASE WHEN $p < ($npExpr) AND ${projSql(p, vecExpr)} > 0 THEN ${1L << p} ELSE 0 END"
    }.mkString("(", " + ", ")")

  /** Double-space cosine of two list expressions, rounded to 6 — the SQL
    * mirror of the zip_with/aggregate fold every embedding op uses. */
  def cosSql(a: String, b: String): String =
    s"""ROUND(
          LIST_SUM(LIST_TRANSFORM(LIST_ZIP($a, $b),
            pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE))) /
          (SQRT(LIST_SUM(LIST_TRANSFORM($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
           SQRT(LIST_SUM(LIST_TRANSFORM($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
          6)"""
}
