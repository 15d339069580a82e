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

  /** Bucketed interval join: equi-join on (key, coarse time bucket) with
    * the exact range predicate applied after. Each left row probes the
    * buckets its window can overlap, so join work scales with real
    * overlaps instead of |left|×|right| per key — the viable shape for
    * range joins over 100 TB of events. `windowSec` must be ≤ bucketSec
    * so a window spans at most 2 buckets.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, leftKey: String,
    rightKey: String, leftTs: String, rightTs: String, windowSec: Long,
    bucketSec: Long): DataFrame = {
    require(windowSec <= bucketSec, "window must fit within one bucket span")
    val l = left
      .withColumn("_lb", floor(unix_timestamp(col(leftTs)) / bucketSec))
      .withColumn("_probe", explode(array(col("_lb"), col("_lb") + 1)))
    val r = right
      .withColumn("_rb", floor(unix_timestamp(col(rightTs)) / bucketSec))
    // strict lower bound at full timestamp precision; upper bound on
    // whole-second floors (oracle-reproducible on both engines)
    l.join(r, col(leftKey) === col(rightKey) && col("_probe") === col("_rb"))
      .filter(col(rightTs) > col(leftTs) &&
        unix_timestamp(col(rightTs)) <= unix_timestamp(col(leftTs)) + windowSec)
      .drop("_lb", "_probe", "_rb")
  }

  // q50 — interval join via bucketing: views following a click of the same
  // user within 30 minutes. Oracle is the naive range join — bucketing
  // must be invisible in the result.
  val q50 = Q(
    "q50_interval_join",
    Some("""
      WITH clicks AS (
        SELECT user_id, event_id AS click_id, CAST(ts AS TIMESTAMP) AS c_ts
        FROM events WHERE event_type = 'click'),
      views AS (
        SELECT user_id AS v_user, event_id AS view_id, CAST(ts AS TIMESTAMP) AS v_ts
        FROM events WHERE event_type = 'view')
      SELECT c.user_id, c.click_id, v.view_id,
             CAST(DATE_DIFF('second', c.c_ts, v.v_ts) AS BIGINT) AS gap_sec
      FROM clicks c
      JOIN views v ON c.user_id = v.v_user
        AND v.v_ts > c.c_ts
        AND CAST(FLOOR(EPOCH(v.v_ts)) AS BIGINT) <= CAST(FLOOR(EPOCH(c.c_ts)) AS BIGINT) + 1800
      ORDER BY c.user_id, c.click_id, v.view_id
    """)
  ) { t =>
    val clicks = t.events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
    val views = t.events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
    intervalJoin(clicks, views,
      leftKey = "user_id", rightKey = "v_user", leftTs = "c_ts", rightTs = "v_ts",
      windowSec = 1800, bucketSec = 1800)
      .select(col("user_id"), col("click_id"), col("view_id"),
        (unix_timestamp(col("v_ts")) - unix_timestamp(col("c_ts")))
          .cast(LongType).as("gap_sec"))
      .orderBy(col("user_id"), col("click_id"), col("view_id"))
  }

  val all: Seq[Q] = Seq(q49, q50)
}
