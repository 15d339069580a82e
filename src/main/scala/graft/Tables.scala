package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed accessors for the driver-generated test tables (TESTDATA.md).
  *
  * At 100 TB these are parquet scans with pushdown + pruning; nothing
  * here materializes or caches — each accessor returns a lazy plan.
  */
final case class Tables(spark: SparkSession, dir: String) {
  // every operator may reach the graft_* kernel functions; registration
  // is idempotent and cheap, and running it here means no Q builder can
  // forget it
  graft.functions.GraftFunctions.register(spark)

  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts has shipped as either TIMESTAMP(NANOS) parquet — which Spark
    * only reads as a nanos-epoch LONG (spark.sql.legacy.parquet.nanosAsLong)
    * — or plain TIMESTAMP(MICROS), which lands as TIMESTAMP_NTZ. Normalize
    * both to the session TimestampType (floor-truncated micros, matching
    * DuckDB's TIMESTAMP_NS→TIMESTAMP cast; the session is pinned UTC so the
    * NTZ→LTZ cast is numerically the identity).
    */
  def events: DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

/** One registered operator: a DataFrame builder + optional DuckDB oracle SQL.
  * Column names/aliases MUST match between the two (driver hash-compares by
  * sorted column name).
  */
final case class Q(name: String, oracle: Option[String])(val build: Tables => DataFrame)
