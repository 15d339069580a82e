package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Grouping-family operators: distinct aggregates, conditional aggregates
  * (ClickHouse *If combinators), bucketing, HAVING, ROLLUP/CUBE/GROUPING SETS.
  *
  * Scale notes: multi-distinct uses Spark's Expand-based rewrite (one shuffle,
  * no per-key set materialization on the driver); rollup/cube expand rows
  * map-side then aggregate partially — both are linear, single-shuffle plans.
  */
object Grouping {

  // q11 — multiple COUNT(DISTINCT) per group.
  val q11 = Q(
    "q11_distinct_agg",
    Some("""
      SELECT l_returnflag,
             COUNT(DISTINCT l_suppkey) AS n_supps,
             COUNT(DISTINCT l_partkey) AS n_parts,
             COUNT(*) AS n_rows
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """)
  ) { t =>
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_rows")
      )
      .orderBy(col("l_returnflag"))
  }

  // q12 — ClickHouse countIf/sumIf/avgIf combinators as conditional aggs.
  val q12 = Q(
    "q12_conditional_agg",
    Some("""
      SELECT o_orderpriority,
             COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
             COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
             CAST(SUM(CASE WHEN o_totalprice > 250000 THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS big_total,
             COUNT(*) AS n
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """)
  ) { t =>
    t.orders
      .groupBy(col("o_orderpriority"))
      .agg(
        count(when(col("o_orderstatus") === "F", 1)).as("n_finished"),
        count(when(col("o_orderstatus") === "O", 1)).as("n_open"),
        sum(when(col("o_totalprice") > 250000, col("o_totalprice").cast(DecimalType(18, 2)))
          .otherwise(lit(0).cast(DecimalType(18, 2)))).cast(DoubleType).as("big_total"),
        count(lit(1)).as("n")
      )
      .orderBy(col("o_orderpriority"))
  }

  // q13 — multi-branch CASE bucketing + aggregate over buckets.
  val q13 = Q(
    "q13_case_bucket",
    Some("""
      SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                  WHEN c_acctbal < 3000 THEN 'low'
                  WHEN c_acctbal < 7000 THEN 'mid'
                  ELSE 'high' END AS bal_bucket,
             COUNT(*) AS n_customers,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      FROM customer
      GROUP BY 1
      ORDER BY bal_bucket
    """)
  ) { t =>
    t.customer
      .groupBy(
        when(col("c_acctbal") < 0, "negative")
          .when(col("c_acctbal") < 3000, "low")
          .when(col("c_acctbal") < 7000, "mid")
          .otherwise("high").as("bal_bucket"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast(DecimalType(18, 2))).cast(DoubleType).as("total_bal")
      )
      .orderBy(col("bal_bucket"))
  }

  // q14 — HAVING (post-aggregation filter).
  val q14 = Q(
    "q14_having",
    Some("""
      SELECT o_custkey, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY o_custkey
      HAVING COUNT(*) >= 15
      ORDER BY o_custkey
    """)
  ) { t =>
    t.orders
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("total")
      )
      .filter(col("n_orders") >= 15)
      .orderBy(col("o_custkey"))
  }

  // q15 — ROLLUP with explicit NULLS FIRST ordering for cross-engine parity.
  val q15 = Q(
    "q15_rollup",
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty, COUNT(*) AS n
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """)
  ) { t =>
    t.lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).cast(DoubleType).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  // q16 — CUBE.
  val q16 = Q(
    "q16_cube",
    Some("""
      SELECT o_orderstatus, o_orderpriority,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total, COUNT(*) AS n
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """)
  ) { t =>
    t.orders
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("total"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
  }

  // q17 — GROUPING SETS + grouping() level marker.
  val q17 = Q(
    "q17_grouping_sets",
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
             CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
             COUNT(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """)
  ) { t =>
    t.lineitem
      .createOrReplaceTempView("graft_q17_lineitem")
    t.spark.sql("""
      SELECT l_returnflag, l_linestatus,
             CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
             CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
             COUNT(*) AS n
      FROM graft_q17_lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
    """)
  }

  // q80 — ROLLUP with GROUPING() level labels: subtotal rows carry an
  // explicit level tag, so a NULL grouping key is distinguishable from a
  // genuinely-NULL data value (the ambiguity every rollup consumer hits).
  // Same plan as q15 — labels are free post-aggregation expressions.
  val q80 = Q(
    "q80_rollup_labeled",
    Some("""
      SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'total'
                  WHEN GROUPING(l_linestatus) = 1 THEN 'flag'
                  ELSE 'leaf' END AS lvl,
             COALESCE(l_returnflag, '*') AS flag,
             COALESCE(l_linestatus, '*') AS status,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS volume
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY lvl, flag, status
    """)
  ) { t =>
    t.lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("volume"),
        grouping(col("l_returnflag")).as("__g1"),
        grouping(col("l_linestatus")).as("__g2"))
      .select(
        when(col("__g1") === 1, "total")
          .when(col("__g2") === 1, "flag")
          .otherwise("leaf").as("lvl"),
        coalesce(col("l_returnflag"), lit("*")).as("flag"),
        coalesce(col("l_linestatus"), lit("*")).as("status"),
        col("n"), col("volume"))
      .orderBy(col("lvl"), col("flag"), col("status"))
  }

  // q123_share_of_total — ratio-to-report: each priority's share of its
  // month's revenue (the % column every finance pivot carries). Two
  // partial-aggregable levels — (month, priority) then month — joined
  // back broadcast (the month relation is dimension-sized), share in
  // exact basis points from DECIMAL cents; no window over the facts.
  val q123 = Q(
    "q123_share_of_total",
    Some("""
      WITH mp AS (
        SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
               o_orderpriority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
        FROM orders GROUP BY month, o_orderpriority),
      m AS (SELECT month, CAST(SUM(cents) AS BIGINT) AS total FROM mp GROUP BY month)
      SELECT mp.month, mp.o_orderpriority, mp.cents,
             CAST(mp.cents * 10000 // m.total AS BIGINT) AS share_bp
      FROM mp JOIN m ON m.month = mp.month
      ORDER BY mp.month, mp.o_orderpriority
    """)
  ) { t =>
    val mp = t.orders
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"),
        col("o_orderpriority"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast(LongType).as("cents"))
    val m = mp.groupBy(col("month")).agg(sum(col("cents")).cast(LongType).as("total"))
    mp.join(broadcast(m), "month")
      .select(col("month"), col("o_orderpriority"), col("cents"),
        expr("cents * 10000 div total").cast(LongType).as("share_bp"))
      .orderBy(col("month"), col("o_orderpriority"))
  }

  // q125_mode — the statistical mode per group with a DETERMINISTIC
  // tie-break (most frequent quantity per return flag; ties → smallest
  // value): two partial-aggregable levels — value counts, then a
  // min_by over (−count, value) — no window, no sort of the facts.
  // ClickHouse serves this as topK(1)(x) (approximate) or
  // arrayElement(topKExact…); this is the exact form.
  val q125 = Q(
    "q125_mode",
    Some("""
      WITH c AS (
        SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q, COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag, q),
      m AS (
        SELECT l_returnflag, q AS mode_qty, n AS mode_n FROM (
          SELECT l_returnflag, q, n,
                 ROW_NUMBER() OVER (PARTITION BY l_returnflag
                   ORDER BY n DESC, q) AS rn
          FROM c) WHERE rn = 1)
      SELECT l_returnflag, CAST(mode_qty AS BIGINT) AS mode_qty,
             CAST(mode_n AS BIGINT) AS mode_n
      FROM m ORDER BY l_returnflag
    """)
  ) { t =>
    t.lineitem
      .groupBy(col("l_returnflag"), col("l_quantity").cast(LongType).as("q"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("l_returnflag"))
      .agg(
        min_by(col("q"), struct(-col("n"), col("q"))).cast(LongType).as("mode_qty"),
        max(col("n")).cast(LongType).as("mode_n"))
      .orderBy(col("l_returnflag"))
  }

  val all: Seq[Q] = Seq(q11, q12, q13, q14, q15, q16, q17, q80, q123, q125)
}
