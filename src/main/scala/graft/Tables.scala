package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed accessors for the driver-generated test tables (TESTDATA.md).
  *
  * At 100 TB these are parquet scans with pushdown + pruning; nothing
  * here materializes or caches — each accessor returns a lazy plan.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def events: DataFrame     = t("events")
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

/** One registered operator: a DataFrame builder + optional DuckDB oracle SQL.
  * Column names/aliases MUST match between the two (driver hash-compares by
  * sorted column name).
  */
final case class Q(name: String, oracle: Option[String])(val build: Tables => DataFrame)
