package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every registered operator (SURVEY.md §2). */
  def registry: Seq[Q] =
    graft.operators.Olap.all ++
      graft.operators.Grouping.all ++
      graft.operators.Sets.all ++
      graft.operators.AggExt.all ++
      graft.operators.Temporal.all ++
      graft.operators.Strings.all ++
      graft.operators.Shapes.all ++
      graft.operators.WindowExt.all ++
      graft.operators.Scale.all ++
      graft.operators.Behavior.all ++
      graft.operators.Asof.all ++
      graft.operators.MergeTree.all ++
      graft.operators.Stats.all ++
      graft.operators.Series.all ++
      graft.operators.Geo.all ++
      graft.sbom.Sbom.all ++
      graft.text.TextOps.all ++
      graft.text.CurationOps.all ++
      graft.dedup.Dedup.all ++
      graft.ann.Ann.all ++
      graft.multimodal.Multimodal.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.operators.Olap.q01.build(Tables(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { q =>
      q.name -> ((s: SparkSession, dir: String) => q.build(Tables(s, dir)))
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
