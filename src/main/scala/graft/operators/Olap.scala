package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Core OLAP operator surface (SURVEY.md §2a).
  *
  * Cross-engine determinism rules (SURVEY.md §5): money/fractional sums go
  * through an exact DECIMAL cast (order-independent in Spark AND DuckDB),
  * then back to DOUBLE for a stable output schema; averages are computed as
  * exact-decimal-sum / exact-count in double space (deterministic); every
  * result has a total ORDER BY with a unique tie-break.
  */
object Olap {

  /** Exact 2-decimal cast: makes FP sums order-independent. */
  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  /** Exact sum of a 2-decimal quantity, surfaced as double. */
  private def moneySum(c: Column): Column = sum(dec2(c)).cast(DoubleType)
  /** Deterministic 4-decimal average: exact decimal sum / count. */
  private def avg4(c: Column, cnt: Column): Column =
    round(sum(dec2(c)).cast(DoubleType) / cnt, 4)

  // --------------------------------------------------------------------------
  // q01 — TPC-H Q1 shape: scan → filter → groupBy multi-aggregate.
  // Scale: partial aggregation (map-side combine) over 2-key groups; the
  // shuffle moves only |groups| rows per partition.
  val q01 = Q(
    "q01_pricing_summary",
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4))) AS DOUBLE) AS sum_disc_price,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(26,6))) AS DOUBLE) AS sum_charge,
             ROUND(SUM(l_quantity) / COUNT(*), 4) AS avg_qty,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_price,
             ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """)
  ) { t =>
    val cnt = count(lit(1))
    t.lineitem
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast(DoubleType).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(DecimalType(22, 4)))
          .cast(DoubleType).as("sum_disc_price"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
          .cast(DecimalType(26, 6))).cast(DoubleType).as("sum_charge"),
        round(sum(col("l_quantity")) / cnt, 4).as("avg_qty"),
        avg4(col("l_extendedprice"), cnt).as("avg_price"),
        avg4(col("l_discount"), cnt).as("avg_disc"),
        cnt.as("count_order")
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  // q02 — global top-N with deterministic tie-break. Spark plans this as
  // TakeOrderedAndProject: per-partition top-N then a single small merge —
  // no full sort of the fact table at scale.
  val q02 = Q(
    "q02_topn",
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 20
    """)
  ) { t =>
    t.orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  // q03 — TPC-H Q3 shape: selective dim filter, fact-fact shuffle join, agg,
  // top-N. customer is small → broadcast; orders⋈lineitem shuffles on the
  // join key (AQE coalesces post-shuffle partitions at runtime).
  val q03 = Q(
    "q03_join_agg",
    Some("""
      SELECT o.o_orderkey,
             CAST(o.o_orderdate AS DATE) AS order_date,
             CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(22,4))) AS DOUBLE) AS revenue
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
      GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
      ORDER BY revenue DESC, o_orderkey
      LIMIT 10
    """)
  ) { t =>
    t.customer.filter(col("c_mktsegment") === "BUILDING")
      .hint("broadcast")
      .join(t.orders, col("c_custkey") === col("o_custkey"))
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate").cast("date").as("order_date"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(DecimalType(22, 4)))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  // q04 — star join: region→nation→customer→orders→lineitem. All dims
  // broadcast; the single shuffle is orders⋈lineitem.
  val q04 = Q(
    "q04_star_join",
    Some("""
      SELECT r.r_name, n.n_name,
             CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(22,4))) AS DOUBLE) AS revenue,
             COUNT(*) AS n_items
      FROM region r
      JOIN nation n ON n.n_regionkey = r.r_regionkey
      JOIN customer c ON c.c_nationkey = n.n_nationkey
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY r.r_name, n.n_name
      ORDER BY r.r_name, n.n_name
    """)
  ) { t =>
    broadcast(t.region)
      .join(broadcast(t.nation), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(t.customer), col("c_nationkey") === col("n_nationkey"))
      .join(t.orders, col("o_custkey") === col("c_custkey"))
      .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(DecimalType(22, 4)))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items")
      )
      .orderBy(col("r_name"), col("n_name"))
  }

  // q05 — LEFT SEMI join (EXISTS). Spark keeps it a semi-join — no
  // duplication of the left side, build side is the filtered orders.
  val q05 = Q(
    "q05_semi_join",
    Some("""
      SELECT c_custkey, c_name
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 490000)
      ORDER BY c_custkey
    """)
  ) { t =>
    t.customer
      .join(t.orders.filter(col("o_totalprice") > 490000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  // q06 — LEFT ANTI join (NOT EXISTS): customers with no large order.
  val q06 = Q(
    "q06_anti_join",
    Some("""
      SELECT c_custkey, c_name, c_acctbal
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 490000)
      ORDER BY c_custkey
    """)
  ) { t =>
    t.customer
      .join(t.orders.filter(col("o_totalprice") > 490000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  // q07 — LEFT OUTER join + null-tolerant aggregates.
  val q07 = Q(
    "q07_outer_join",
    Some("""
      SELECT c.c_custkey,
             COUNT(o.o_orderkey) AS n_orders,
             CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
      ORDER BY c.c_custkey
    """)
  ) { t =>
    t.customer
      .join(t.orders, col("o_custkey") === col("c_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(dec2(col("o_totalprice"))), lit(0)).cast(DoubleType).as("total_spent")
      )
      .orderBy(col("c_custkey"))
  }

  // q08 — ranking window functions, deterministic intra-partition order.
  // Partitioned by a high-cardinality key → parallel at scale.
  val q08 = Q(
    "q08_window_rank",
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
             RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk,
             DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS drk
      FROM orders
      ORDER BY o_custkey, rn
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t.orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast(LongType).as("rn"),
        rank().over(w).cast(LongType).as("rk"),
        dense_rank().over(w).cast(LongType).as("drk"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  // q09 — running total + sliding 3-row moving average per customer.
  val q09 = Q(
    "q09_window_running",
    Some("""
      SELECT o_custkey, o_orderkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
                   / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
      FROM orders
      ORDER BY o_custkey, o_orderkey
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    val order = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val wAll  = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val w3    = order.rowsBetween(-2, Window.currentRow)
    t.orders
      .select(
        col("o_custkey"), col("o_orderkey"),
        sum(dec2(col("o_totalprice"))).over(wAll).cast(DoubleType).as("running_total"),
        round(sum(dec2(col("o_totalprice"))).over(w3).cast(DoubleType) /
          count(lit(1)).over(w3), 4).as("moving_avg3")
      )
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  // q10 — lag/lead: per-customer inter-order gap in days and next price.
  val q10 = Q(
    "q10_lag_lead",
    Some("""
      SELECT o_custkey, o_orderkey,
             CAST(DATE_DIFF('day',
               LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               o_orderdate) AS BIGINT) AS days_since_prev,
             LEAD(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
      FROM orders
      ORDER BY o_custkey, o_orderkey
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    t.orders
      .select(
        col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)).cast(LongType)
          .as("days_since_prev"),
        lead(col("o_totalprice"), 1).over(w).as("next_price")
      )
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  // q170 — month-over-month rank movers ("who jumped the leaderboard"):
  // per (month, customer) revenue in exact cents, customers RANKED
  // within their month — via GroupedPrefix's staged sort, so the
  // per-month ranking never funnels the customer universe into a
  // |months|-partition window (the scale-killer ROW_NUMBER form) —
  // then consecutive months joined per customer on the (custkey,
  // month) equi-key and the top 10 rank improvements cut with a
  // TakeOrdered heap. Ties are impossible by construction: the rank
  // key is the unique (−cents, custkey) tuple.
  val q170 = Q(
    "q170_rank_delta",
    Some("""
      WITH mc AS (
        SELECT o_custkey,
               EXTRACT(YEAR FROM o_orderdate) * 100
                 + EXTRACT(MONTH FROM o_orderdate) AS ym,
               SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                 AS cents
        FROM orders GROUP BY 1, 2),
      r AS (
        SELECT o_custkey, ym, cents,
               ROW_NUMBER() OVER (PARTITION BY ym
                                  ORDER BY cents DESC, o_custkey) AS rnk
        FROM mc),
      mv AS (
        SELECT b.ym, b.o_custkey, b.rnk, a.rnk AS prev_rnk,
               a.rnk - b.rnk AS delta
        FROM r a JOIN r b
          ON b.o_custkey = a.o_custkey
         AND b.ym = CASE WHEN a.ym % 100 = 12 THEN a.ym + 89
                         ELSE a.ym + 1 END)
      SELECT CAST(ym AS BIGINT) AS ym, CAST(o_custkey AS BIGINT) AS o_custkey,
             CAST(rnk AS BIGINT) AS rnk, CAST(prev_rnk AS BIGINT) AS prev_rnk,
             CAST(delta AS BIGINT) AS delta
      FROM mv
      ORDER BY delta DESC, ym, o_custkey
      LIMIT 10
    """)
  ) { t =>
    import graft.plans.GroupedPrefix
    val mc = t.orders
      .groupBy(col("o_custkey"),
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).as("ym"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))
        .multiply(lit(100)).cast(LongType)).cast(LongType).as("cents"))
    val r = GroupedPrefix.withRank(mc, Seq("ym"),
      struct((-col("cents")).as("nc"), col("o_custkey")), "rnk")
    val a = r.select(col("o_custkey").as("ck_a"), col("ym").as("ym_a"),
      col("rnk").as("prev_rnk"))
    val b = r.select(col("o_custkey"), col("ym"), col("rnk"))
    val mv = a.join(b,
      col("ym") === when(col("ym_a") % 100 === 12, col("ym_a") + 89)
        .otherwise(col("ym_a") + 1) &&
        col("ck_a") === col("o_custkey"))
      .select(col("ym"), col("o_custkey"), col("rnk"), col("prev_rnk"),
        (col("prev_rnk") - col("rnk")).as("delta"))
    mv.select(col("ym").cast(LongType).as("ym"),
      col("o_custkey").cast(LongType).as("o_custkey"),
      col("rnk").cast(LongType).as("rnk"),
      col("prev_rnk").cast(LongType).as("prev_rnk"),
      col("delta").cast(LongType).as("delta"))
      .orderBy(col("delta").desc, col("ym"), col("o_custkey"))
      .limit(10)
  }

  // q174 — leaderboard stability between consecutive months ("did the
  // top-10 drift?"): per month the top-10 parts by exact-cents revenue
  // (TopKPerGroup's bounded heaps — never a |months|-partition window
  // over the part universe), consecutive-month top lists joined on the
  // (partkey, month) equi-key, and the drift read out as average
  // overlap at depth 10 — the prefix-overlap family RBO extrapolates
  // (Webber et al. 2010; ann_rbo applies the p-weighted form to ANN
  // rankings — THIS op is the time-drift readout over revenue
  // leaderboards, month-pair skeleton included), kept EXACT: a shared
  // part first visible at
  // depth m = max(rank_a, rank_b) contributes Σ_{i=m..10} (1000 div i)
  // milli-points (floored per-depth weights, so both engines sum the
  // same integers; ao_milli = that sum div 10 — identical lists read
  // 998, the flooring loss of Σ_i i·(1000 div i) = 9988, NOT 1000:
  // treat 998 as the no-drift ceiling).
  // Zero-overlap month pairs still emit a row (skeleton left join).
  // Scale: one map-side-combinable fact aggregation, k-bounded heaps,
  // then month-dimension-sized joins — no stage touches the fact table
  // twice.
  val q174 = Q(
    "q174_rank_overlap",
    Some("""
      WITH mp AS (
        SELECT EXTRACT(YEAR FROM l_shipdate) * 100
                 + EXTRACT(MONTH FROM l_shipdate) AS ym,
               l_partkey,
               SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                 AS cents
        FROM lineitem GROUP BY 1, 2),
      r AS (
        SELECT ym, l_partkey,
               ROW_NUMBER() OVER (PARTITION BY ym
                                  ORDER BY cents DESC, l_partkey) AS rnk
        FROM mp),
      t10 AS (SELECT * FROM r WHERE rnk <= 10),
      mon AS (SELECT DISTINCT ym FROM t10),
      pairsk AS (
        SELECT a.ym AS ym_prev, b.ym AS ym
        FROM mon a JOIN mon b
          ON b.ym = CASE WHEN a.ym % 100 = 12 THEN a.ym + 89
                         ELSE a.ym + 1 END),
      mt AS (
        SELECT a.ym AS ym_prev, b.ym AS ym,
               GREATEST(a.rnk, b.rnk) AS m
        FROM t10 a JOIN t10 b
          ON a.l_partkey = b.l_partkey
         AND b.ym = CASE WHEN a.ym % 100 = 12 THEN a.ym + 89
                         ELSE a.ym + 1 END),
      ag AS (
        SELECT ym_prev, ym, COUNT(*) AS ov10,
               SUM(CASE m WHEN 1 THEN 2927 WHEN 2 THEN 1927
                          WHEN 3 THEN 1427 WHEN 4 THEN 1094
                          WHEN 5 THEN 844 WHEN 6 THEN 644
                          WHEN 7 THEN 478 WHEN 8 THEN 336
                          WHEN 9 THEN 211 ELSE 100 END) AS ao_sum
        FROM mt GROUP BY 1, 2)
      SELECT CAST(p.ym_prev AS BIGINT) AS ym_prev,
             CAST(p.ym AS BIGINT) AS ym,
             CAST(COALESCE(ag.ov10, 0) AS BIGINT) AS ov10,
             CAST(COALESCE(ag.ao_sum, 0) // 10 AS BIGINT) AS ao_milli
      FROM pairsk p LEFT JOIN ag
        ON ag.ym_prev = p.ym_prev AND ag.ym = p.ym
      ORDER BY ym
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    def nextYm(ym: Column): Column =
      when(ym % 100 === 12, ym + 89).otherwise(ym + 1)
    val mp = t.lineitem
      .groupBy((year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).as("ym"),
        col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2))
        .multiply(lit(100)).cast(LongType)).cast(LongType).as("cents"))
    // rank AFTER the bounded-heap cut: the window sees <= 10 rows/month
    val w = Window.partitionBy(col("ym"))
      .orderBy(col("cents").desc, col("l_partkey"))
    val t10 = graft.plans.TopKPerGroup
      .topK(mp, Seq("ym"), "cents", "l_partkey", 10)
      .withColumn("rnk", row_number().over(w))
    // suffix sums of the floored per-depth weights 1000 div i, i=1..10
    val coef = Seq(2927, 1927, 1427, 1094, 844, 644, 478, 336, 211, 100)
    val mon = t10.select(col("ym")).distinct()
    val skel = mon.select(col("ym").as("ym_prev"))
      .join(mon, col("ym") === nextYm(col("ym_prev")))
    val a = t10.select(col("ym").as("ym_a"), col("l_partkey"),
      col("rnk").as("rnk_a"))
    val b = t10.select(col("ym").as("ym_b"), col("l_partkey").as("pk_b"),
      col("rnk").as("rnk_b"))
    val ag = a.join(b,
        col("pk_b") === col("l_partkey") && col("ym_b") === nextYm(col("ym_a")))
      .select(col("ym_a").as("ym_prev"), col("ym_b").as("ym"),
        element_at(array(coef.map(lit): _*),
          greatest(col("rnk_a"), col("rnk_b")).cast("int")).as("c"))
      .groupBy(col("ym_prev"), col("ym"))
      .agg(count(lit(1)).as("ov10"), sum(col("c")).as("ao_sum"))
    skel.join(ag, Seq("ym_prev", "ym"), "left")
      .select(col("ym_prev").cast(LongType).as("ym_prev"),
        col("ym").cast(LongType).as("ym"),
        coalesce(col("ov10"), lit(0L)).cast(LongType).as("ov10"),
        expr("coalesce(ao_sum, 0L) div 10").cast(LongType).as("ao_milli"))
      .orderBy(col("ym"))
  }

  val all: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q170, q174)
}
