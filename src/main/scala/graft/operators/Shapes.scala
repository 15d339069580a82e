package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Query-shape operators: pivot/cross-tab, scalar subqueries, CTE chains,
  * top-k per group.
  */
object Shapes {

  // q29 — pivot (cross-tab): lineitem counts + exact sums per
  // linestatus × returnflag. Spark pivot with explicit values keeps the
  // plan a single aggregation (no extra pass to discover pivot values).
  val q29 = Q(
    "q29_pivot",
    Some("""
      SELECT l_linestatus,
             COUNT(CASE WHEN l_returnflag = 'A' THEN 1 END) AS n_a,
             COUNT(CASE WHEN l_returnflag = 'N' THEN 1 END) AS n_n,
             COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_r,
             CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS qty_a,
             CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS qty_n,
             CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS qty_r
      FROM lineitem
      GROUP BY l_linestatus
      ORDER BY l_linestatus
    """)
  ) { t =>
    t.lineitem
      .groupBy(col("l_linestatus"))
      .agg(
        count(when(col("l_returnflag") === "A", 1)).as("n_a"),
        count(when(col("l_returnflag") === "N", 1)).as("n_n"),
        count(when(col("l_returnflag") === "R", 1)).as("n_r"),
        coalesce(sum(when(col("l_returnflag") === "A", col("l_quantity").cast(DecimalType(18, 2)))), lit(0))
          .cast(DoubleType).as("qty_a"),
        coalesce(sum(when(col("l_returnflag") === "N", col("l_quantity").cast(DecimalType(18, 2)))), lit(0))
          .cast(DoubleType).as("qty_n"),
        coalesce(sum(when(col("l_returnflag") === "R", col("l_quantity").cast(DecimalType(18, 2)))), lit(0))
          .cast(DoubleType).as("qty_r"))
      .orderBy(col("l_linestatus"))
  }

  // q30 — scalar subquery as filter threshold. The scalar aggregate is a
  // one-row broadcast, never a shuffle of the fact side. Deterministic
  // threshold via exact decimal sum / count (not FP avg).
  val q30 = Q(
    "q30_scalar_subquery",
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      WHERE o_totalprice > 1.8 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM orders)
      ORDER BY o_orderkey
    """)
  ) { t =>
    val thresh = t.orders.agg(
      (sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType) / count(lit(1)))
        .as("avg_price"))
    t.orders
      .join(broadcast(thresh))
      .filter(col("o_totalprice") > lit(1.8) * col("avg_price"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  // q31 — multi-CTE pipeline: monthly revenue → month-over-month delta →
  // filter growth months. Exercises chained reuse of derived frames.
  val q31 = Q(
    "q31_cte_chain",
    Some("""
      WITH monthly AS (
        SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY 1
      ),
      deltas AS (
        SELECT month, revenue,
               revenue - LAG(revenue) OVER (ORDER BY month) AS delta
        FROM monthly
      )
      SELECT month, revenue, delta
      FROM deltas
      WHERE delta > 0
      ORDER BY month
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    val monthly = t.orders
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("revenue"))
    val w = Window.orderBy(col("month"))
    monthly
      .withColumn("delta", col("revenue") - lag(col("revenue"), 1).over(w))
      .filter(col("delta") > 0)
      .orderBy(col("month"))
  }

  // q35 — top-k per group (ClickHouse LIMIT BY): top 3 parts per brand by
  // retail price. Window + filter: one shuffle on the group key; no global
  // sort of the full table.
  val q35 = Q(
    "q35_topk_per_group",
    Some("""
      SELECT p_brand, p_partkey, p_retailprice, CAST(rn AS BIGINT) AS rn
      FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
        FROM part
      )
      WHERE rn <= 3
      ORDER BY p_brand, rn
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc, col("p_partkey"))
    t.part
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        row_number().over(w).cast(LongType).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("p_brand"), col("rn"))
  }

  val all: Seq[Q] = Seq(q29, q30, q31, q35)
}
