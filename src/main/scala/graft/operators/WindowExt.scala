package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Extended window/sampling operators (SURVEY.md §2a addendum):
  * deterministic systematic sampling, first/last/nth_value frames, ntile
  * bucketing, RANGE-frame windows.
  */
object WindowExt {

  // q39 — deterministic systematic sample (every 10th key) + stats. At
  // scale this is a pure map-side filter (no shuffle before the agg) —
  // unlike TABLESAMPLE it is reproducible across engines and runs.
  val q39 = Q(
    "q39_sample",
    Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      WHERE o_orderkey % 10 = 0
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus
    """)
  ) { t =>
    t.orders
      .filter(col("o_orderkey") % 10 === 0)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  // q40 — first_value / last_value / nth_value over a full-partition frame.
  val q40 = Q(
    "q40_first_last",
    Some("""
      SELECT o_custkey, o_orderkey,
             FIRST_VALUE(o_orderkey) OVER w AS first_order,
             LAST_VALUE(o_orderkey)  OVER w AS last_order,
             NTH_VALUE(o_orderkey, 2) OVER w AS second_order
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t.orders
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_order"),
        last(col("o_orderkey")).over(w).as("last_order"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  // q41 — ntile quartiles over a global ordering. ntile is semantically
  // global, but the single-partition window form stops scaling as soon
  // as the ordered relation does — so the bucket is computed CLOSED-FORM
  // from the scale-safe global rank (plans.GlobalRank: range partition +
  // per-partition prefix-sum offsets) and the total count: NTILE(k)
  // gives the first (n % k) buckets ceil(n/k) rows and the rest
  // floor(n/k), so quartile = f(rn, n) with pure integer arithmetic —
  // identical output to the window form at any scale.
  val q41 = Q(
    "q41_ntile",
    Some("""
      SELECT quartile, COUNT(*) AS n,
             MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi
      FROM (
        SELECT c_acctbal,
               CAST(NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile
        FROM customer)
      GROUP BY quartile
      ORDER BY quartile
    """)
  ) { t =>
    val ranked = graft.plans.GlobalRank.withRowNumber(
      t.customer.select(col("c_acctbal"), col("c_custkey")),
      Seq(col("c_acctbal"), col("c_custkey")), 32, "rn", Some("n_total"))
    ranked
      .withColumn("quartile", expr("""
        CAST(CASE
          WHEN rn <= (n_total % 4) * (n_total DIV 4 + 1)
            THEN (rn - 1) DIV (n_total DIV 4 + 1) + 1
          ELSE (n_total % 4)
            + (rn - (n_total % 4) * (n_total DIV 4 + 1) - 1) DIV (n_total DIV 4) + 1
        END AS BIGINT)"""))
      .groupBy(col("quartile"))
      .agg(count(lit(1)).as("n"), min(col("c_acctbal")).as("lo"), max(col("c_acctbal")).as("hi"))
      .orderBy(col("quartile"))
  }

  // q42 — RANGE-frame window: per user, events within the trailing 300-
  // second value range (event-time neighborhood aggregation).
  val q42 = Q(
    "q42_range_frame",
    Some("""
      SELECT user_id, event_id,
             COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_s
                            RANGE BETWEEN 300 PRECEDING AND CURRENT ROW) AS n_trailing_5min
      FROM (SELECT user_id, event_id,
                   CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_s
            FROM events)
      ORDER BY user_id, event_id
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("epoch_s"))
      .rangeBetween(-300, Window.currentRow)
    t.events
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("epoch_s"))
      .select(col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("n_trailing_5min"))
      .orderBy(col("user_id"), col("event_id"))
  }

  // q53 — relative-rank windows: percent_rank / cume_dist per group.
  val q53 = Q(
    "q53_window_pct",
    Some("""
      SELECT o_custkey, o_orderkey,
             ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
             ROUND(CUME_DIST() OVER w, 6) AS cume
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_custkey, o_orderkey
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"), col("o_orderkey"))
    t.orders
      .select(col("o_custkey"), col("o_orderkey"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  // q54 — null semantics: NULLIF / COALESCE / null-safe equality over a
  // column with injected nulls (null-safe eq = Spark <=>, DuckDB
  // IS NOT DISTINCT FROM).
  val q54 = Q(
    "q54_null_safe",
    Some("""
      WITH c AS (
        SELECT c_custkey,
               NULLIF(c_mktsegment, 'MACHINERY') AS seg,
               CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_acctbal END AS bal
        FROM customer)
      SELECT
        COUNT(CASE WHEN seg IS NULL THEN 1 END) AS n_nulled_seg,
        COUNT(CASE WHEN bal IS NOT DISTINCT FROM NULL THEN 1 END) AS n_null_bal,
        CAST(SUM(CAST(COALESCE(bal, 0) AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
        COUNT(CASE WHEN seg IS NOT DISTINCT FROM 'BUILDING' THEN 1 END) AS n_building
      FROM c
    """)
  ) { t =>
    t.customer
      .select(col("c_custkey"),
        nullif(col("c_mktsegment"), lit("MACHINERY")).as("seg"),
        when(col("c_custkey") % 5 === 0, lit(null)).otherwise(col("c_acctbal")).as("bal"))
      .agg(
        count(when(col("seg").isNull, 1)).as("n_nulled_seg"),
        count(when(col("bal") <=> lit(null), 1)).as("n_null_bal"),
        sum(coalesce(col("bal"), lit(0)).cast(DecimalType(18, 2))).cast(DoubleType).as("total_bal"),
        count(when(col("seg") <=> "BUILDING", 1)).as("n_building"))
  }

  val all: Seq[Q] = Seq(q39, q40, q41, q42, q53, q54)
}
