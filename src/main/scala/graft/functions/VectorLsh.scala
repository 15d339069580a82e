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
  val Dim = 64

  /** Literal ±1 hyperplane table — a model constant mirrored into SQL. */
  val signs: Array[Array[Double]] = PortableHash.planeSigns(NPlanes, Dim)

  def proj(p: Int, vec: Column): Column =
    aggregate(
      zip_with(vec, typedlit(signs(p).toSeq), (x, s) => x.cast(DoubleType) * s),
      lit(0.0), (acc, v) => acc + v)

  /** 8-bit bucket: sign bit per hyperplane. */
  def bucket(vec: Column): Column =
    (0 until NPlanes).map { p =>
      when(proj(p, vec) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  def projSql(p: Int, vecExpr: String): String =
    s"LIST_SUM(LIST_TRANSFORM(LIST_ZIP($vecExpr, ${PortableHash.signsSql(signs(p))}), " +
      "pr -> CAST(pr[1] AS DOUBLE) * pr[2]))"

  def bucketSql(vecExpr: String): String =
    (0 until NPlanes).map { p =>
      s"CASE WHEN ${projSql(p, vecExpr)} > 0 THEN ${1L << p} ELSE 0 END"
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
