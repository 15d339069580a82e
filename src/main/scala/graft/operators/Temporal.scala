package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Date/time operator family: truncation, part extraction, self-joins over
  * time, gap-based sessionization (ClickHouse toStartOf*, neighbor(),
  * windowFunnel-adjacent shapes).
  */
object Temporal {

  // q22 — toStartOfMonth-style truncation + aggregate per month.
  val q22 = Q(
    "q22_date_trunc",
    Some("""
      SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY 1
      ORDER BY month
    """)
  ) { t =>
    t.orders
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("total"))
      .orderBy(col("month"))
  }

  // q23 — date part extraction: year / quarter / month / day-of-week.
  // ISO DOW for cross-engine parity (DuckDB dayofweek is 0=Sunday,
  // Spark dayofweek is 1=Sunday; isodow/ISO is Monday=1 in both).
  val q23 = Q(
    "q23_date_parts",
    Some("""
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
             CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS q,
             CAST(EXTRACT(isodow FROM o_orderdate) AS BIGINT) AS dow,
             COUNT(*) AS n
      FROM orders
      GROUP BY 1, 2, 3
      ORDER BY y, q, dow
    """)
  ) { t =>
    t.orders
      .groupBy(
        year(col("o_orderdate")).cast(LongType).as("y"),
        quarter(col("o_orderdate")).cast(LongType).as("q"),
        weekday(col("o_orderdate")).cast(LongType).+(1).as("dow"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("y"), col("q"), col("dow"))
  }

  // q32 — self-join: consecutive orders of the same customer within 30 days
  // (pairs). Equi-join on custkey keeps it a hash join; the range predicate
  // is applied post-join. At scale the custkey shuffle partitions both sides
  // identically — no cartesian.
  val q32 = Q(
    "q32_self_join",
    Some("""
      SELECT a.o_custkey, a.o_orderkey AS first_order, b.o_orderkey AS next_order,
             CAST(DATE_DIFF('day', a.o_orderdate, b.o_orderdate) AS BIGINT) AS gap_days
      FROM orders a
      JOIN orders b
        ON a.o_custkey = b.o_custkey
       AND b.o_orderdate > a.o_orderdate
       AND DATE_DIFF('day', a.o_orderdate, b.o_orderdate) <= 30
      ORDER BY a.o_custkey, first_order, next_order
    """)
  ) { t =>
    val a = t.orders.select(col("o_custkey"), col("o_orderkey").as("first_order"),
      col("o_orderdate").as("d1"))
    val b = t.orders.select(col("o_custkey").as("ck2"), col("o_orderkey").as("next_order"),
      col("o_orderdate").as("d2"))
    a.join(b, col("o_custkey") === col("ck2") && col("d2") > col("d1") &&
        datediff(col("d2"), col("d1")) <= 30)
      .select(col("o_custkey"), col("first_order"), col("next_order"),
        datediff(col("d2"), col("d1")).cast(LongType).as("gap_days"))
      .orderBy(col("o_custkey"), col("first_order"), col("next_order"))
  }

  // q34 — gap-based sessionization in pure SQL shape: a session starts when
  // the gap to the previous event of the same user exceeds 30 minutes;
  // session id = running count of session-starts. Two stacked windows over
  // the same (user_id, ts) partitioning → single shuffle, single sort.
  val q34 = Q(
    "q34_sessionize",
    Some("""
      WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
        FROM events
      ),
      flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                      OR DATE_DIFF('second', LAG(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS is_start
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ),
      sessions AS (
        SELECT user_id, ts, event_id,
               CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM flagged
      )
      SELECT user_id, session_id, COUNT(*) AS n_events,
             CAST(DATE_DIFF('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_sec
      FROM sessions
      GROUP BY user_id, session_id
      ORDER BY user_id, session_id
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("ts"), 1).over(w)
    t.events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("is_start",
        when(prev.isNull || unix_timestamp(col("ts")) - unix_timestamp(prev) > 1800, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("is_start")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
          .cast(LongType).as("duration_sec"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val all: Seq[Q] = Seq(q22, q23, q32, q34)
}
