package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Extended aggregate surface: argMax/argMin, exact quantiles, histograms,
  * HLL approximate distinct, statistical moments — the ClickHouse aggregate
  * function families (argMax, quantileExact, histogram, uniq, corr/stddev).
  */
object AggExt {

  // q20 — argMax/argMin per group with a deterministic struct tie-break
  // (ClickHouse argMax(o_orderkey, o_totalprice)). max_by over a struct key
  // is a single partial-aggregable function — no window, no extra shuffle.
  val q20 = Q(
    "q20_argmax",
    Some("""
      SELECT o_custkey,
             MAX(CASE WHEN rn_max = 1 THEN o_orderkey END) AS best_order,
             MAX(CASE WHEN rn_min = 1 THEN o_orderkey END) AS worst_order,
             MAX(o_totalprice) AS best_price
      FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn_max,
               ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn_min
        FROM orders
      )
      GROUP BY o_custkey
      ORDER BY o_custkey
    """)
  ) { t =>
    t.orders
      .groupBy(col("o_custkey"))
      .agg(
        max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("best_order"),
        min_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("worst_order"),
        max(col("o_totalprice")).as("best_price")
      )
      .orderBy(col("o_custkey"))
  }

  // q21 — exact quantiles (ClickHouse quantileExact / median). Spark's
  // `percentile` is the exact sort-based aggregate; interpolation formula
  // matches DuckDB's quantile_cont.
  val q21 = Q(
    "q21_quantiles",
    Some("""
      SELECT l_returnflag,
             ROUND(MEDIAN(l_extendedprice) + 0.000001, 2) AS p50,
             ROUND(QUANTILE_CONT(l_extendedprice, 0.9) + 0.000001, 2) AS p90,
             ROUND(QUANTILE_CONT(l_extendedprice, 0.99) + 0.000001, 2) AS p99,
             MIN(l_extendedprice) AS lo,
             MAX(l_extendedprice) AS hi
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """)
  ) { t =>
    // One percentile aggregate for all three points — a single sort of
    // each group's values instead of three. The +1e-6 epsilon before
    // rounding moves interpolated midpoints of 2-decimal prices off the
    // exact ROUND half-boundary (x.xx5), where a 1-ulp difference between
    // the engines' interpolation arithmetic would otherwise flip the cent.
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_extendedprice"), array(lit(0.5), lit(0.9), lit(0.99))).as("ps"),
        min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi")
      )
      .select(col("l_returnflag"),
        round(col("ps").getItem(0) + 0.000001, 2).as("p50"),
        round(col("ps").getItem(1) + 0.000001, 2).as("p90"),
        round(col("ps").getItem(2) + 0.000001, 2).as("p99"),
        col("lo"), col("hi"))
      .orderBy(col("l_returnflag"))
  }

  // q36 — fixed-width histogram over events.value (width 50): bucket =
  // floor(value/50). Pure map-side bucketing + one aggregation shuffle.
  val q36 = Q(
    "q36_histogram",
    Some("""
      SELECT CAST(FLOOR(value / 50) AS BIGINT) AS bucket,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM events
      GROUP BY 1
      ORDER BY bucket
    """)
  ) { t =>
    t.events
      .groupBy(floor(col("value") / 50).cast(LongType).as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total")
      )
      .orderBy(col("bucket"))
  }

  // q37 — HLL++ approximate distinct (ClickHouse uniq). No exact oracle:
  // HLL estimates differ per implementation; driver records rows-only. The
  // ScalaTest spec checks the estimate against the exact count within 5%.
  val q37 = Q("q37_approx_distinct", None) { t =>
    t.events
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        count(lit(1)).as("n_events")
      )
      .orderBy(col("event_type"))
  }

  // q38 — statistical moments: corr, stddev, variance. These are FP
  // order-dependent in any engine, so outputs are rounded to 6 significant
  // stable decimals; inputs at this magnitude make that deterministic.
  val q38 = Q(
    "q38_corr_stats",
    Some("""
      SELECT l_returnflag,
             ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qty_price,
             ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_qty,
             ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
             COUNT(*) AS n
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """)
  ) { t =>
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        count(lit(1)).as("n")
      )
      .orderBy(col("l_returnflag"))
  }

  val all: Seq[Q] = Seq(q20, q21, q36, q37, q38)
}
