package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** AS-OF join — ClickHouse `ASOF JOIN` (and the kdb/pandas merge_asof
  * shape): for each left row, the single right row with the greatest
  * timestamp ≤ the left timestamp, per key.
  *
  * Spark has no native asof join. The scalable formulation used here is
  * union + window (not a range join): tag both sides, sort once within
  * each key partition by (ts, right-before-left), and carry the most
  * recent right row forward with last_value(ignoreNulls) — O(n log n)
  * in the partition, one shuffle, no range-predicate row explosion.
  */
object Asof {

  /** joinAsof: left enriched with the latest right row at or before its
    * timestamp.
    *
    * @param left      left side
    * @param right     right side
    * @param key       equi-join key column name (same name both sides)
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param rightVals right columns to carry (renamed as given)
    */
  def joinAsof(left: DataFrame, right: DataFrame, key: String,
    leftTs: String, rightTs: String, rightVals: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val leftTagged = left.withColumn("_ts", col(leftTs)).withColumn("_side", lit(1))
      .withColumns(rightVals.map(v => v -> lit(null).cast(right.schema(v).dataType)).toMap)
    val rightTagged = right.select(
      (Seq(col(key), col(rightTs).as("_ts"), lit(0).as("_side")) ++
        rightVals.map(col)): _*)
    val unioned = leftTagged.select(
      (Seq(col(key), col("_ts"), col("_side")) ++
        left.columns.filterNot(c => c == key).map(col) ++ rightVals.map(col)): _*)
      .unionByName(rightTagged, allowMissingColumns = true)
    // right rows (side 0) sort before left rows (side 1) at equal ts →
    // a right row at exactly the left ts is visible to it (ASOF <=)
    val w = Window.partitionBy(col(key)).orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(unioned) { (df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1).drop("_side", "_ts")
  }

  // q49 — asof join: each purchase event picks up the same user's most
  // recent click at or before it. Oracle: DuckDB's native ASOF JOIN.
  val q49 = Q(
    "q49_asof_join",
    Some("""
      WITH purchases AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS p_ts, value
        FROM events WHERE event_type = 'purchase'),
      clicks AS (
        SELECT user_id, event_id AS click_id, CAST(ts AS TIMESTAMP) AS c_ts
        FROM events WHERE event_type = 'click')
      SELECT p.user_id, p.event_id, c.click_id,
             CAST(DATE_DIFF('second', c.c_ts, p.p_ts) AS BIGINT) AS lag_sec
      FROM purchases p
      ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND p.p_ts >= c.c_ts
      ORDER BY p.user_id, p.event_id
    """)
  ) { t =>
    val purchases = t.events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val clicks = t.events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
    joinAsof(purchases, clicks, key = "user_id",
      leftTs = "ts", rightTs = "c_ts", rightVals = Seq("click_id", "c_ts"))
      .select(col("user_id"), col("event_id"), col("click_id"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("c_ts")))
          .cast(LongType).as("lag_sec"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val all: Seq[Q] = Seq(q49)
}
