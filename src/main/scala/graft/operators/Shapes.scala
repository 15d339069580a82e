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

  // q121_skyline — the Pareto front (skyline operator): orders no other
  // order dominates on (cheaper price, more recent date) within their
  // priority class — the classic multi-objective shortlist. The naive
  // formulation is a quadratic dominance self-join; the scalable
  // identity is the sorted running-max scan: by (price asc, date desc),
  // a row is on the front iff its date strictly exceeds every earlier
  // row's — cheaper-and-later dominates, equal-price-earlier-date rows
  // are dominated, never front-mates. The oracle states that identity
  // as one window; the engine runs it TWO-PHASE on the
  // SkylinePerGroup physical plan (r15 third decade: the window form
  // partitions the fact table by o_orderpriority — an enum with ~5
  // values — capping parallelism at 5 and measuring 30× on 10× rows):
  // each input partition maintains the per-group staircase online, only
  // the ≤front-sized local fronts cross the shuffle, the final pass
  // merges — exact, since skyline(A∪B) = skyline(skyline(A)∪skyline(B)).
  val q121 = Q(
    "q121_skyline",
    Some("""
      WITH scanned AS (
        SELECT o_orderpriority, o_orderkey, o_totalprice, o_orderdate,
               MAX(o_orderdate) OVER (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderdate DESC, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_prev
        FROM orders)
      SELECT o_orderpriority,
             COUNT(*) AS front_size,
             CAST(MIN(o_orderkey) AS BIGINT) AS first_key,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS front_price_cents
      FROM scanned
      WHERE best_prev IS NULL OR o_orderdate > best_prev
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """)
  ) { t =>
    val front = graft.plans.SkylinePerGroup.skyline(
      t.orders.select(col("o_orderpriority"), col("o_orderkey"),
        col("o_totalprice"), col("o_orderdate")),
      Seq("o_orderpriority"),
      Seq(("o_totalprice", "asc"), ("o_orderdate", "desc"), ("o_orderkey", "asc")),
      "o_orderdate")
    front
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("front_size"),
        min(col("o_orderkey")).cast(LongType).as("first_key"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast(LongType).as("front_price_cents"))
      .orderBy(col("o_orderpriority"))
  }

  // q122_streaks — longest run of CONSECUTIVE active days per user
  // (gaps-and-islands over the activity calendar): the engagement
  // metric behind every "7-day streak" badge. Distinct (user, day)
  // first (partial-aggregable), then the island id is day − dense
  // position (constant within a consecutive run) — one user-keyed
  // window, no self-join — and the rollup reports the streak-length
  // histogram plus how many users ever hit a 3-day streak.
  val q122 = Q(
    "q122_streaks",
    Some("""
      WITH act AS (
        SELECT DISTINCT user_id,
               CAST(CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE)
                    - DATE '1970-01-01' AS BIGINT) AS d
        FROM events),
      runs AS (
        SELECT user_id, d,
               d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
        FROM act),
      streaks AS (
        SELECT user_id, COUNT(*) AS len
        FROM runs GROUP BY user_id, grp),
      best AS (SELECT user_id, MAX(len) AS best_streak FROM streaks GROUP BY user_id)
      SELECT CAST(best_streak AS BIGINT) AS best_streak,
             COUNT(*) AS n_users
      FROM best
      GROUP BY best_streak
      ORDER BY best_streak
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    t.events
      .select(col("user_id"),
        datediff(date_trunc("day", col("ts")).cast("date"), lit("1970-01-01"))
          .cast(LongType).as("d"))
      .distinct()
      .withColumn("grp", col("d") - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(max(col("len")).as("best_streak"))
      .groupBy(col("best_streak"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("best_streak"))
  }

  val all: Seq[Q] = Seq(q29, q30, q31, q35, q121, q122)
}
