package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Statistical / interval aggregates (SURVEY.md §2a addendum, round 6):
  * the ClickHouse analytics-statistics family — maxIntersections,
  * intervalLengthSum, simpleLinearRegression, welch/student t-tests,
  * entropy, deltaSum, rankCorr — re-expressed as declarative Spark
  * plans (windows + composed aggregate partials), each with a DuckDB
  * oracle.
  *
  * Scale notes: every aggregate here is partial-aggregable
  * (map-side combine), and every ordered pass (sweeps, islands, lags,
  * ranks, midranks) rides plans.GroupedPrefix — range-partitioned
  * slices + per-slice partials + broadcast prefix offsets — so a
  * 3-value enum group key (the sf tables' o_orderstatus /
  * l_returnflag) never collapses the fact table into 3 sorted
  * partitions: parallelism is numPartitions × |groups| at any scale.
  */
object Stats {

  /** Deterministic synthetic interval for an order: open for
    * `o_orderkey % 20 + 1` days from `o_orderdate` (the sf tables carry
    * no close date; the hash-spread length exercises overlap logic).
    */
  private val closeTs =
    expr("timestampadd(DAY, CAST(o_orderkey % 20 + 1 AS INT), o_orderdate)")

  // q65 — ClickHouse maxIntersections/maxIntersectionsPosition: the
  // maximum number of simultaneously-open intervals per group, and the
  // earliest instant it is reached. Classic sweep: explode each interval
  // to (+1 at start, -1 at end) deltas, running-sum ordered by
  // (point, delta) — ends sort before starts at the same instant
  // (half-open intervals), so the max is tie-order-independent (within a
  // tied (p, delta) block all deltas share a sign, so the running values
  // form the same multiset whatever the intra-tie order). The running
  // sum is GroupedPrefix two-pass (slice sums → broadcast offsets +
  // slice-local windows), and the peak readout is ONE aggregation via a
  // lexicographic struct-max (max open_now, then min p) — no
  // whole-group max window anywhere.
  val q65 = Q(
    "q65_max_intersections",
    Some("""
      WITH pts AS (
        SELECT o_orderstatus, o_orderdate AS p, 1 AS delta
        FROM orders
        UNION ALL
        SELECT o_orderstatus,
               o_orderdate + INTERVAL (CAST(o_orderkey % 20 + 1 AS INT)) DAY AS p,
               -1 AS delta
        FROM orders
      ), sweep AS (
        SELECT o_orderstatus, p,
               SUM(delta) OVER (PARTITION BY o_orderstatus ORDER BY p, delta
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open_now
        FROM pts
      )
      SELECT o_orderstatus,
             CAST(MAX(open_now) AS BIGINT) AS max_open,
             MIN(CASE WHEN open_now = mx THEN p END) AS first_peak
      FROM (SELECT *, MAX(open_now) OVER (PARTITION BY o_orderstatus) AS mx FROM sweep)
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    import graft.plans.GroupedPrefix
    val base = t.orders.select(col("o_orderstatus"), col("o_orderdate"), closeTs.as("close_ts"))
    val pts = base.select(col("o_orderstatus"), col("o_orderdate").as("p"), lit(1).as("delta"))
      .unionAll(base.select(col("o_orderstatus"), col("close_ts").as("p"), lit(-1).as("delta")))
    val staged = GroupedPrefix.stage(pts,
      Seq(col("o_orderstatus"), col("p"), col("delta")))
    val run = GroupedPrefix.withOffsets(staged, Seq("o_orderstatus"),
      Seq(sum(col("delta")).as("__d"))) { (slices, wPrev) =>
      slices.select(col("o_orderstatus"), col(GroupedPrefix.PID),
        coalesce(sum(col("__d")).over(wPrev), lit(0L)).as("__off"))
    }
      .withColumn("open_now", col("__off") + sum(col("delta")).over(
        GroupedPrefix.localWindow(Seq("o_orderstatus"), Seq(col("p"), col("delta")))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    run.groupBy(col("o_orderstatus"))
      .agg(
        max(col("open_now")).as("max_open"),
        // argmax: max open_now, earliest p among its peaks — the struct
        // MIN of (−open_now, p) picks the max count, then the min p
        min(struct((lit(0L) - col("open_now")).as("no"), col("p").as("p")))
          .getField("p").as("first_peak"))
      .orderBy(col("o_orderstatus"))
  }

  // q66 — ClickHouse intervalLengthSum: total length of the UNION of the
  // group's intervals (overlaps counted once). Islands technique: order
  // by start, carry the running max end over strictly-preceding rows; a
  // row whose start exceeds that max opens a new island. The running
  // max is GroupedPrefix two-pass (per-slice max ends → broadcast prefix
  // maxes + slice-local windows), and the readout TELESCOPES: each row
  // contributes max(0, e − max(s, prev_max)) days, which sums to
  // exactly Σ(island_end − island_start), and n_islands = Σ opens — so
  // no global island ids, no second ordered pass, one aggregation. No
  // self-join, no quadratic overlap check, no enum-keyed fact window.
  val q66 = Q(
    "q66_interval_union_len",
    Some("""
      WITH iv AS (
        SELECT o_orderstatus, o_orderdate AS s,
               o_orderdate + INTERVAL (CAST(o_orderkey % 20 + 1 AS INT)) DAY AS e,
               o_orderkey
        FROM orders
      ), marked AS (
        SELECT o_orderstatus, s, e, o_orderkey,
               CASE WHEN s > MAX(e) OVER (PARTITION BY o_orderstatus ORDER BY s, e, o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    OR MAX(e) OVER (PARTITION BY o_orderstatus ORDER BY s, e, o_orderkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                    THEN 1 ELSE 0 END AS opens
        FROM iv
      ), islanded AS (
        SELECT o_orderstatus, s, e,
               SUM(opens) OVER (PARTITION BY o_orderstatus ORDER BY s, e, o_orderkey
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM marked
      ), islands AS (
        SELECT o_orderstatus, island, MIN(s) AS is_s, MAX(e) AS is_e
        FROM islanded GROUP BY o_orderstatus, island
      )
      SELECT o_orderstatus,
             COUNT(*) AS n_islands,
             CAST(SUM(DATE_DIFF('day', is_s, is_e)) AS BIGINT) AS covered_days
      FROM islands
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    import graft.plans.GroupedPrefix
    val iv = t.orders.select(col("o_orderstatus"), col("o_orderdate").as("s"),
      closeTs.as("e"), col("o_orderkey"))
    val staged = GroupedPrefix.stage(iv,
      Seq(col("o_orderstatus"), col("s"), col("e"), col("o_orderkey")))
    val wLocPrev = GroupedPrefix.localWindow(Seq("o_orderstatus"),
      Seq(col("s"), col("e"), col("o_orderkey")))
      .rowsBetween(Window.unboundedPreceding, -1)
    val marked = GroupedPrefix.withOffsets(staged, Seq("o_orderstatus"),
      Seq(max(col("e")).as("__e"))) { (slices, wPrev) =>
      slices.select(col("o_orderstatus"), col(GroupedPrefix.PID),
        max(col("__e")).over(wPrev).as("__pmax"))
    }
      // greatest() skips nulls: local prev-max for the slice's first row
      // is null, the group's first slice has a null broadcast max
      .withColumn("prev_max_e",
        greatest(max(col("e")).over(wLocPrev), col("__pmax")))
      .withColumn("opens",
        when(col("prev_max_e").isNull || col("s") > col("prev_max_e"), 1).otherwise(0))
      .withColumn("contrib",
        when(col("prev_max_e").isNull || col("e") > col("prev_max_e"),
          datediff(col("e"),
            when(col("opens") === 1, col("s")).otherwise(col("prev_max_e"))))
          .otherwise(0))
    marked
      .groupBy(col("o_orderstatus"))
      .agg(
        sum(col("opens")).cast(LongType).as("n_islands"),
        sum(col("contrib")).cast(LongType).as("covered_days"))
      .orderBy(col("o_orderstatus"))
  }

  // q67 — ClickHouse simpleLinearRegression(x, y) → (slope, intercept):
  // least squares from the covariance/variance partials, so the whole
  // thing is one map-side-combinable aggregate pass (no second scan for
  // the means). Oracle = DuckDB's native REGR_SLOPE/REGR_INTERCEPT.
  val q67 = Q(
    "q67_linreg",
    Some("""
      SELECT l_returnflag,
             ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) AS slope,
             ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 4) AS intercept,
             COUNT(*) AS n
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """)
  ) { t =>
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        round(covar_pop(col("l_quantity"), col("l_extendedprice")) /
          var_pop(col("l_quantity")), 4).as("slope"),
        round(avg(col("l_extendedprice")) -
          covar_pop(col("l_quantity"), col("l_extendedprice")) /
            var_pop(col("l_quantity")) * avg(col("l_quantity")), 4).as("intercept"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  // q68 — ClickHouse studentTTest/welchTTest(value, sample_index): the
  // two-sample t statistics, composed entirely from conditional
  // aggregate partials (one scan, map-side combine) — the same
  // avg/var/count-If decomposition the dialect's SQL-text names use.
  // Sample 0 = 'O' (open) orders, sample 1 = 'F' (filled).
  val q68 = Q(
    "q68_ttest",
    Some("""
      WITH s AS (
        SELECT AVG(o_totalprice)      FILTER (WHERE o_orderstatus = 'O') AS m0,
               AVG(o_totalprice)      FILTER (WHERE o_orderstatus = 'F') AS m1,
               VAR_SAMP(o_totalprice) FILTER (WHERE o_orderstatus = 'O') AS v0,
               VAR_SAMP(o_totalprice) FILTER (WHERE o_orderstatus = 'F') AS v1,
               COUNT(*)               FILTER (WHERE o_orderstatus = 'O') AS n0,
               COUNT(*)               FILTER (WHERE o_orderstatus = 'F') AS n1
        FROM orders
      )
      SELECT n0, n1,
             ROUND((m0 - m1) / SQRT(v0/n0 + v1/n1), 4) AS welch_t,
             ROUND((m0 - m1) / SQRT(((n0-1)*v0 + (n1-1)*v1) / (n0+n1-2) * (1.0/n0 + 1.0/n1)), 4)
               AS student_t
      FROM s
    """)
  ) { t =>
    val o = when(col("o_orderstatus") === "O", col("o_totalprice"))
    val f = when(col("o_orderstatus") === "F", col("o_totalprice"))
    t.orders
      .agg(
        avg(o).as("m0"), avg(f).as("m1"),
        var_samp(o).as("v0"), var_samp(f).as("v1"),
        count(o).as("n0"), count(f).as("n1"))
      .select(col("n0"), col("n1"),
        round((col("m0") - col("m1")) /
          sqrt(col("v0") / col("n0") + col("v1") / col("n1")), 4).as("welch_t"),
        round((col("m0") - col("m1")) /
          sqrt(((col("n0") - 1) * col("v0") + (col("n1") - 1) * col("v1")) /
            (col("n0") + col("n1") - 2) * (lit(1.0) / col("n0") + lit(1.0) / col("n1"))), 4)
          .as("student_t"))
  }

  // q69 — ClickHouse entropy(x): Shannon entropy (bits) of the user
  // distribution within each event type. The scale path is two partial-
  // aggregable groupBys (value-counts, then the entropy fold) using the
  // numerically-stable form H = log2(N) − Σ c·log2(c) / N over integer
  // counts — no per-group collect, no hashmap state. (The dialect's
  // SQL-callable `entropy` name is the single-aggregate analog.)
  val q69 = Q(
    "q69_entropy",
    Some("""
      WITH c AS (
        SELECT event_type, user_id, COUNT(*) AS cnt
        FROM events GROUP BY event_type, user_id
      )
      SELECT event_type,
             COUNT(*) AS n_users,
             CAST(SUM(cnt) AS BIGINT) AS n_events,
             ROUND(LOG2(SUM(cnt)) - SUM(cnt * LOG2(cnt)) / SUM(cnt), 4) AS entropy_bits
      FROM c
      GROUP BY event_type
      ORDER BY event_type
    """)
  ) { t =>
    t.events
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("cnt")).cast(LongType).as("n_events"),
        round(log2(sum(col("cnt"))) -
          sum(col("cnt") * log2(col("cnt"))) / sum(col("cnt")), 4).as("entropy_bits"))
      .orderBy(col("event_type"))
  }

  // q70 — ClickHouse deltaSum(x): sum of the positive steps of a series.
  // CH's aggregate is insertion-order-dependent; this is the
  // deterministic re-expression — an explicit (date, key) ordering with
  // the per-step deltas summed exactly in DECIMAL so the result is
  // engine-portable. The lag is GroupedPrefix two-pass: slice-local
  // lag() plus a boundary patch — each slice's LAST (date, key, value)
  // is a per-slice struct-max partial, prefix-maxed over earlier slices
  // and broadcast back, so the first row of every slice sees its true
  // predecessor without the whole group ever sharing one partition.
  val q70 = Q(
    "q70_delta_sum",
    Some("""
      WITH d AS (
        SELECT o_orderpriority,
               o_totalprice - LAG(o_totalprice) OVER
                 (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey) AS step
        FROM orders
      )
      SELECT o_orderpriority,
             CAST(SUM(CAST(CASE WHEN step > 0 THEN step ELSE 0 END AS DECIMAL(18,2)))
                  AS DOUBLE) AS delta_sum,
             COUNT(*) AS n
      FROM d
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """)
  ) { t =>
    import graft.plans.GroupedPrefix
    val staged = GroupedPrefix.stage(
      t.orders.select(col("o_orderpriority"), col("o_orderdate"),
        col("o_orderkey"), col("o_totalprice")),
      Seq(col("o_orderpriority"), col("o_orderdate"), col("o_orderkey")))
    val wLoc = GroupedPrefix.localWindow(Seq("o_orderpriority"),
      Seq(col("o_orderdate"), col("o_orderkey")))
    GroupedPrefix.withOffsets(staged, Seq("o_orderpriority"),
      Seq(max(struct(col("o_orderdate").as("d"), col("o_orderkey").as("k"),
        col("o_totalprice").as("v"))).as("__last"))) { (slices, wPrev) =>
      slices.select(col("o_orderpriority"), col(GroupedPrefix.PID),
        max(col("__last")).over(wPrev).getField("v").as("__prev"))
    }
      // first row of a slice: its predecessor is the previous slice's
      // last value; first row of the group: both null → step null
      .withColumn("step", col("o_totalprice") -
        coalesce(lag(col("o_totalprice"), 1).over(wLoc), col("__prev")))
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("step") > 0, col("step")).otherwise(lit(0))
          .cast(DecimalType(18, 2))).cast(DoubleType).as("delta_sum"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  // q71 — ClickHouse rankCorr(x, y): Spearman rank correlation = Pearson
  // corr of the two rank sequences. RANK() (not row_number) makes ties
  // deterministic without a tiebreak column; the corr partials then
  // combine map-side. Each rank pass is GroupedPrefix.withRank: ranges
  // stage on (group, value) WITHOUT a tie-break so tied values share a
  // slice, the global rank = BIGINT count of earlier slices' rows +
  // slice-local rank — which also removes Spark rank()'s 32-bit wrap
  // past ~2.1B rows per group (the offset is LongType end-to-end).
  // Two staged passes because the two orderings are genuinely
  // different sorts; each is numPartitions-parallel.
  val q71 = Q(
    "q71_rank_corr",
    Some("""
      WITH r AS (
        SELECT l_returnflag,
               RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rx,
               RANK() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS ry
        FROM lineitem
      )
      SELECT l_returnflag, ROUND(CORR(rx, ry), 4) AS spearman, COUNT(*) AS n
      FROM r
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """)
  ) { t =>
    import graft.plans.GroupedPrefix
    val base = t.lineitem.select(col("l_returnflag"), col("l_quantity"),
      col("l_extendedprice"))
    val rx = GroupedPrefix.withRank(base, Seq("l_returnflag"),
      col("l_quantity"), "rx")
    val rxy = GroupedPrefix.withRank(rx, Seq("l_returnflag"),
      col("l_extendedprice"), "ry")
    rxy
      .groupBy(col("l_returnflag"))
      .agg(round(corr(col("rx"), col("ry")), 4).as("spearman"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  // q72 — ClickHouse cramersV / contingency / theilsU (a, b): the
  // categorical-association family from ONE contingency table
  // (order status × priority). Cell counts are a partial-aggregable
  // groupBy; row/col margins come from windows over the tiny cells
  // relation (≤ R×C rows regardless of input size — the 100 TB shape is
  // unchanged); chi² and the entropy sums fold to one row. TheilsU is
  // the asymmetric variant U(priority | status), from the same counts
  // via H(a) − H(a|b).
  val q72 = Q(
    "q72_cramers_v",
    Some("""
      WITH cells AS (
        SELECT o_orderstatus AS b, o_orderpriority AS a, COUNT(*) AS o
        FROM orders GROUP BY 1, 2
      ), m AS (
        SELECT a, b, o,
               SUM(o) OVER (PARTITION BY a) AS ra,
               SUM(o) OVER (PARTITION BY b) AS cb,
               SUM(o) OVER () AS n
        FROM cells
      ), agg AS (
        SELECT MAX(n) AS n,
               COUNT(DISTINCT a) AS nr, COUNT(DISTINCT b) AS nc,
               SUM((o - ra*cb/CAST(n AS DOUBLE))*(o - ra*cb/CAST(n AS DOUBLE))
                   / (ra*cb/CAST(n AS DOUBLE))) AS chi2,
               SUM(o * LOG2(o)) AS sab
        FROM m
      ), margins AS (
        SELECT (SELECT SUM(x * LOG2(x)) FROM (SELECT SUM(o) AS x FROM cells GROUP BY a)) AS sa,
               (SELECT SUM(x * LOG2(x)) FROM (SELECT SUM(o) AS x FROM cells GROUP BY b)) AS sb
      )
      SELECT CAST(n AS BIGINT) AS n,
             ROUND(SQRT(chi2 / (n * (LEAST(nr, nc) - 1))), 4) AS cramers_v,
             ROUND(SQRT(chi2 / (chi2 + n)), 4) AS contingency_c,
             ROUND(((LOG2(n) - sa/n) - (sb - sab)/n) / (LOG2(n) - sa/n), 4) AS theils_u
      FROM agg, margins
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    val cells = t.orders
      .groupBy(col("o_orderstatus").as("b"), col("o_orderpriority").as("a"))
      .agg(count(lit(1)).as("o"))
    val m = cells
      .withColumn("ra", sum(col("o")).over(Window.partitionBy(col("a"))))
      .withColumn("cb", sum(col("o")).over(Window.partitionBy(col("b"))))
      .withColumn("n", sum(col("o")).over(Window.partitionBy()))
    // expected counts stay in floating point from the first multiply:
    // ra*cb as a Long product wraps silently (ANSI off) near ~3B total
    // rows while DuckDB errors loudly — double(ra)·double(cb) is exact
    // whenever the long product would have been (< 2^53) and safe past it
    val e = col("ra").cast(DoubleType) * col("cb").cast(DoubleType) /
      col("n").cast(DoubleType)
    m.agg(
        max(col("n")).as("n"),
        countDistinct(col("a")).as("nr"),
        countDistinct(col("b")).as("nc"),
        sum((col("o") - e) * (col("o") - e) / e).as("chi2"),
        sum(col("o") * log2(col("o"))).as("sab"))
      .crossJoin(
        cells.groupBy(col("a")).agg(sum(col("o")).as("x"))
          .agg(sum(col("x") * log2(col("x"))).as("sa")))
      .crossJoin(
        cells.groupBy(col("b")).agg(sum(col("o")).as("x"))
          .agg(sum(col("x") * log2(col("x"))).as("sb")))
      .select(
        col("n").cast(LongType).as("n"),
        round(sqrt(col("chi2") / (col("n") * (least(col("nr"), col("nc")) - 1))), 4)
          .as("cramers_v"),
        round(sqrt(col("chi2") / (col("chi2") + col("n"))), 4).as("contingency_c"),
        round(((log2(col("n")) - col("sa") / col("n")) -
          (col("sb") - col("sab")) / col("n")) /
          (log2(col("n")) - col("sa") / col("n")), 4).as("theils_u"))
  }

  // q73 — ClickHouse mannWhitneyUTest(value, sample_index): the rank-sum
  // U statistic per group, pooling both samples ('O' vs 'F' orders),
  // with midranks for ties (the min-rank-plus-(ties−1)/2 form —
  // deterministic in both engines, no row_number tie-break needed). U
  // and the rank sums are exact multiples of 0.5, so the double sums
  // are exact; only the normal-approximation z is rounded. The Spark
  // midrank is built from window COUNTs, not rank(): Spark's rank()
  // returns 32-bit ints that wrap silently past ~2.1B rows per group
  // while the oracle's RANK is BIGINT — counts are LongType end-to-end,
  // and count≤(v) − (ties−1)/2 ≡ rank(v) + (ties−1)/2.
  val q73 = Q(
    "q73_mann_whitney",
    Some("""
      WITH pool AS (
        SELECT o_orderpriority, o_totalprice AS v,
               CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS s
        FROM orders WHERE o_orderstatus IN ('O', 'F')
      ), ranked AS (
        SELECT o_orderpriority, s,
               RANK() OVER (PARTITION BY o_orderpriority ORDER BY v)
                 + (COUNT(*) OVER (PARTITION BY o_orderpriority, v) - 1) / 2.0 AS midrank
        FROM pool
      )
      SELECT o_orderpriority,
             CAST(SUM(s) AS BIGINT) AS n1,
             CAST(SUM(1 - s) AS BIGINT) AS n0,
             SUM(CASE WHEN s = 1 THEN midrank ELSE 0 END)
               - SUM(s) * (SUM(s) + 1) / 2.0 AS u1,
             ROUND((SUM(CASE WHEN s = 1 THEN midrank ELSE 0 END)
                      - SUM(s) * (SUM(s) + 1) / 2.0
                      - SUM(s) * SUM(1 - s) / 2.0)
                   / SQRT(SUM(s) * SUM(1 - s) * (COUNT(*) + 1) / 12.0), 4) AS z
      FROM ranked
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    import graft.plans.GroupedPrefix
    val pool = t.orders
      .filter(col("o_orderstatus").isin("O", "F"))
      .select(col("o_orderpriority"), col("o_totalprice").as("v"),
        when(col("o_orderstatus") === "O", 1).otherwise(0).as("s"))
    // stage on (group, v) with NO tie-break: the range partitioner sends
    // equal keys to one slice, so within-slice RANGE counts and tie
    // counts are globally correct once offset by earlier slices' rows
    val staged = GroupedPrefix.stage(pool,
      Seq(col("o_orderpriority"), col("v")))
    val cntLE = count(lit(1)).over(
      GroupedPrefix.localWindow(Seq("o_orderpriority"), Seq(col("v")))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow))
    // the tie window adds v to the local partition key — same clustering
    // (hash on (group, pid) satisfies it), so no extra exchange
    val ties = count(lit(1)).over(Window.partitionBy(
      col("o_orderpriority"), col(GroupedPrefix.PID), col("v")))
    val ranked = GroupedPrefix.withOffsets(staged, Seq("o_orderpriority"),
      Seq(count(lit(1)).as("__c"))) { (slices, wPrev) =>
      slices.select(col("o_orderpriority"), col(GroupedPrefix.PID),
        coalesce(sum(col("__c")).over(wPrev), lit(0L)).as("__off"))
    }
      .withColumn("midrank", col("__off") + cntLE - (ties - 1) / 2.0)
    val r1 = sum(when(col("s") === 1, col("midrank")).otherwise(0.0))
    val n1 = sum(col("s"))
    val n0 = sum(lit(1) - col("s"))
    val u1 = r1 - n1 * (n1 + 1) / 2.0
    ranked
      .groupBy(col("o_orderpriority"))
      .agg(
        n1.cast(LongType).as("n1"),
        n0.cast(LongType).as("n0"),
        u1.as("u1"),
        round((u1 - n1 * n0 / 2.0) /
          sqrt(n1 * n0 * (count(lit(1)) + 1) / 12.0), 4).as("z"))
      .orderBy(col("o_orderpriority"))
  }

  // q74 — ClickHouse skewPop/kurtPop(x): population skewness and excess
  // kurtosis from raw power sums. l_quantity is integral (1..50), so the
  // four power sums are EXACT BIGINTs in both engines — summation order
  // cannot drift them — and only the final closed-form division is
  // rounded. One scan, fully map-side-combinable.
  val q74 = Q(
    "q74_skew_kurt",
    Some("""
      WITH p AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(CAST(l_quantity AS BIGINT)) AS s1,
               SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s2,
               SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                   * CAST(l_quantity AS BIGINT)) AS s3,
               SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                   * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s4
        FROM lineitem GROUP BY l_returnflag
      )
      SELECT l_returnflag, n,
             ROUND((CAST(s3 AS DOUBLE)/n - 3.0*(CAST(s1 AS DOUBLE)/n)*(CAST(s2 AS DOUBLE)/n)
                    + 2.0*POWER(CAST(s1 AS DOUBLE)/n, 3))
                   / POWER(CAST(s2 AS DOUBLE)/n - POWER(CAST(s1 AS DOUBLE)/n, 2), 1.5), 4)
               AS skew_pop,
             ROUND((CAST(s4 AS DOUBLE)/n - 4.0*(CAST(s1 AS DOUBLE)/n)*(CAST(s3 AS DOUBLE)/n)
                    + 6.0*POWER(CAST(s1 AS DOUBLE)/n, 2)*(CAST(s2 AS DOUBLE)/n)
                    - 3.0*POWER(CAST(s1 AS DOUBLE)/n, 4))
                   / POWER(CAST(s2 AS DOUBLE)/n - POWER(CAST(s1 AS DOUBLE)/n, 2), 2) - 3.0, 4)
               AS kurt_excess
      FROM p
      ORDER BY l_returnflag
    """)
  ) { t =>
    val q = col("l_quantity").cast(LongType)
    val p = t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(q).as("s1"), sum(q * q).as("s2"),
        sum(q * q * q).as("s3"), sum(q * q * q * q).as("s4"))
    val n = col("n"); val m1 = col("s1").cast(DoubleType) / n
    val m2 = col("s2").cast(DoubleType) / n
    val m3 = col("s3").cast(DoubleType) / n
    val m4 = col("s4").cast(DoubleType) / n
    val v = m2 - m1 * m1
    p.select(col("l_returnflag"), n,
        round((m3 - lit(3.0) * m1 * m2 + lit(2.0) * pow(m1, 3)) / pow(v, 1.5), 4)
          .as("skew_pop"),
        round((m4 - lit(4.0) * m1 * m3 + lit(6.0) * pow(m1, 2) * m2 -
          lit(3.0) * pow(m1, 4)) / pow(v, 2) - lit(3.0), 4).as("kurt_excess"))
      .orderBy(col("l_returnflag"))
  }

  // q75 — ClickHouse medianExact + the MAD robust-dispersion recipe:
  // median absolute deviation = median(|x − median(x)|). Two exact
  // rank-selection passes on GroupedPrefix.exactQuantile (range-
  // partitioned sort + covering-slice positional pick — never
  // percentile()'s per-group value→count map, whose merge concentrates
  // distinct-value-sized state on one reducer per enum group); the
  // per-group medians are a tiny relation broadcast back onto the fact
  // scan for the deviation pass.
  val q75 = Q(
    "q75_mad",
    Some("""
      WITH med AS (
        SELECT l_returnflag, MEDIAN(l_extendedprice) AS m
        FROM lineitem GROUP BY l_returnflag
      )
      SELECT l.l_returnflag,
             ROUND(MAX(med.m) + 0.000001, 2) AS median_price,
             ROUND(MEDIAN(ABS(l.l_extendedprice - med.m)) + 0.000001, 2) AS mad,
             COUNT(*) AS n
      FROM lineitem l JOIN med ON l.l_returnflag = med.l_returnflag
      GROUP BY l.l_returnflag
      ORDER BY l.l_returnflag
    """)
  ) { t =>
    // Exact medians via GroupedPrefix rank selection, NOT percentile():
    // percentile's aggregation state is a value→count map per group —
    // with 3 enum groups over high-cardinality prices the merge
    // concentrates a distinct-value-sized map on one reducer per group,
    // a memory funnel at scale. Rank selection takes one parallel
    // range-partitioned sort per pass and reduces through ordinary
    // conditional maxes; the interpolation formula is percentile's own,
    // so values are bit-identical.
    import graft.plans.GroupedPrefix
    val base = t.lineitem.select(col("l_returnflag"),
      col("l_extendedprice").as("x"))
    val med = GroupedPrefix.exactQuantile(base, Seq("l_returnflag"),
      col("x"), 0.5, "m") // (l_returnflag, m, m_n)
    val dev = base.join(broadcast(med), Seq("l_returnflag"))
      .select(col("l_returnflag"),
        abs(col("x").cast(DoubleType) - col("m")).as("d"))
    val mad = GroupedPrefix.exactQuantile(dev, Seq("l_returnflag"),
      col("d"), 0.5, "mad0")
    // +1e-6 before rounding: moves interpolated midpoints of 2-decimal
    // prices off the x.xx5 ROUND half-boundary (same trick as q21)
    med.join(broadcast(mad), Seq("l_returnflag"))
      .select(col("l_returnflag"),
        round(col("m") + 0.000001, 2).as("median_price"),
        round(col("mad0") + 0.000001, 2).as("mad"),
        col("m_n").as("n"))
      .orderBy(col("l_returnflag"))
  }

  // q92 — Theil–Sen robust trend (median of all pairwise slopes): the
  // outlier-resistant alternative to q67's least-squares line, run per
  // event type over the DAILY-aggregated series. The design point: the
  // quadratic pair stage is days², not events² — the fact table
  // contributes one aggregation shuffle and the O(span²) slope relation
  // is dimension-sized (≤ ~11k pairs per type at a 150-day span), keyed
  // by type, window-ranked per type. Slopes are IEEE doubles of integer
  // cents (identical division on both engines) ordered with a (d1, d2)
  // tie-break, so the lower-median PICK is deterministic and the oracle
  // reproduces the exact chosen pair (reported as num/den integers
  // alongside the rounded slope).
  val q92 = Q(
    "q92_theil_sen",
    Some("""
      WITH daily AS (
        SELECT event_type,
               CAST(CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE)
                    - DATE '1970-01-01' AS BIGINT) AS d,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS v
        FROM events GROUP BY event_type, d),
      pairs AS (
        SELECT a.event_type, a.d AS d1, b.d AS d2, a.v AS v1, b.v AS v2,
               CAST(b.v - a.v AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS slope
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND b.d > a.d),
      ranked AS (
        SELECT event_type, slope, v2 - v1 AS num, d2 - d1 AS den,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY slope, d1, d2) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM pairs)
      SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
             CAST(num AS BIGINT) AS med_num, CAST(den AS BIGINT) AS med_den,
             ROUND(slope, 4) AS slope_cents_per_day
      FROM ranked WHERE rn = (n + 1) // 2
      ORDER BY event_type
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    val daily = t.events
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast(LongType).as("d"))
      .agg((sum(col("value").cast(DecimalType(18, 2))) * 100)
        .cast(LongType).as("v"))
    val a = daily.select(col("event_type"), col("d").as("d1"), col("v").as("v1"))
    val b = daily.select(col("event_type").as("et2"), col("d").as("d2"), col("v").as("v2"))
    val pairs = a.join(b, col("event_type") === col("et2") && col("d2") > col("d1"))
      .select(col("event_type"), col("d1"), col("d2"), col("v1"), col("v2"),
        ((col("v2") - col("v1")).cast(DoubleType) /
          (col("d2") - col("d1")).cast(DoubleType)).as("slope"))
    val w = Window.partitionBy(col("event_type"))
    val ranked = pairs
      .withColumn("rn", row_number().over(w.orderBy(col("slope"), col("d1"), col("d2"))))
      .withColumn("n", count(lit(1)).over(w))
    ranked.filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("event_type"), col("n").cast(LongType).as("n_pairs"),
        (col("v2") - col("v1")).cast(LongType).as("med_num"),
        (col("d2") - col("d1")).cast(LongType).as("med_den"),
        round(col("slope"), 4).as("slope_cents_per_day"))
      .orderBy(col("event_type"))
  }

  // q99_anova — ClickHouse analysisOfVariance (one-way ANOVA): is the
  // mean o_totalprice the same across order priorities? F and η² from
  // the textbook decomposition SSB/SSW, computed from per-group EXACT
  // partials (n, Σcents as BIGINT, Σcents² as DECIMAL(38,0) — the power
  // sums every engine's -State combinator ships): one map-side-combining
  // aggregation over the facts, then all floating point happens on the
  // 5-row group relation with one rounding at the end (the q67/q68/q72
  // precedent: FP sums over a handful of group terms, exact integer
  // inputs). k−1 and N−k are exact BIGINTs.
  val q99 = Q(
    "q99_anova",
    Some("""
      WITH g AS (
        SELECT o_orderpriority AS grp,
               COUNT(*) AS n,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS s,
               SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                        AS DECIMAL(38,0))
                   * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS q
        FROM orders GROUP BY o_orderpriority),
      tot AS (
        SELECT COUNT(*) AS k,
               CAST(SUM(n) AS BIGINT) AS nn,
               CAST(SUM(s) AS BIGINT) AS t,
               CAST(SUM(q) AS DOUBLE) AS qtot,
               SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) AS ssb_raw
        FROM g)
      SELECT CAST(k AS BIGINT) AS n_groups,
             nn AS n_rows,
             ROUND(((ssb_raw - CAST(t AS DOUBLE) * CAST(t AS DOUBLE) / nn)
                    / (k - 1))
                   / ((qtot - ssb_raw) / (nn - k)), 6) AS f_stat,
             ROUND((ssb_raw - CAST(t AS DOUBLE) * CAST(t AS DOUBLE) / nn)
                   / (qtot - CAST(t AS DOUBLE) * CAST(t AS DOUBLE) / nn),
                   6) AS eta_sq
      FROM tot
    """)
  ) { t =>
    val cents = col("o_totalprice").cast(DecimalType(18, 2))
      .multiply(lit(100)).cast(LongType)
    val g = t.orders
      .groupBy(col("o_orderpriority").as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(cents).cast(LongType).as("s"),
        sum(cents.cast(DecimalType(38, 0)) * cents).as("q"))
    g.agg(
      count(lit(1)).as("k"),
      sum(col("n")).cast(LongType).as("nn"),
      sum(col("s")).cast(LongType).as("t"),
      sum(col("q")).cast(DoubleType).as("qtot"),
      sum(col("s").cast(DoubleType) * col("s").cast(DoubleType) / col("n"))
        .as("ssb_raw"))
      .select(
        col("k").cast(LongType).as("n_groups"),
        col("nn").as("n_rows"),
        round(((col("ssb_raw")
          - col("t").cast(DoubleType) * col("t").cast(DoubleType) / col("nn"))
          / (col("k") - 1))
          / ((col("qtot") - col("ssb_raw")) / (col("nn") - col("k"))), 6)
          .as("f_stat"),
        round((col("ssb_raw")
          - col("t").cast(DoubleType) * col("t").cast(DoubleType) / col("nn"))
          / (col("qtot")
            - col("t").cast(DoubleType) * col("t").cast(DoubleType) / col("nn")), 6)
          .as("eta_sq"))
  }

  // q111_min_sample_size — ClickHouse minSampleSizeConversion: the A/B
  // power calculator, fed by the table instead of a constant — for each
  // event_type, measure the baseline conversion (distinct converting
  // users over all users, an exact integer ratio) and answer "how many
  // users per arm to detect a 10% relative DROP at α=0.05, 80%
  // power?". The z constants are fixed; the formula is one double
  // expression evaluated in the same operation order on both engines
  // over exact integer inputs, rounded once. One distinct-pair
  // aggregation + a 1-row broadcast of the denominator.
  val q111 = Q(
    "q111_min_sample_size",
    Some("""
      WITH conv AS (
        SELECT event_type, COUNT(DISTINCT user_id) AS u
        FROM events GROUP BY event_type),
      tot AS (SELECT COUNT(DISTINCT user_id) AS n FROM events),
      p AS (
        SELECT c.event_type,
               CAST(c.u AS DOUBLE) / t.n AS p1,
               CAST(c.u AS DOUBLE) / t.n * 0.9 AS p2,
               c.u, t.n
        FROM conv c CROSS JOIN tot t)
      SELECT event_type,
             CAST(u * 10000 // n AS BIGINT) AS conversion_bp,
             ROUND(
               POWER(1.959964 * SQRT(2 * ((p1 + p2) / 2) * (1 - (p1 + p2) / 2))
                     + 0.841621 * SQRT(p1 * (1 - p1) + p2 * (1 - p2)), 2)
               / ((p2 - p1) * (p2 - p1)), 4) AS n_per_arm
      FROM p
      ORDER BY event_type
    """)
  ) { t =>
    val conv = t.events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"))
    val tot = t.events.agg(countDistinct(col("user_id")).as("n"))
    conv.crossJoin(broadcast(tot))
      .withColumn("p1", col("u").cast(DoubleType) / col("n"))
      .withColumn("p2", col("u").cast(DoubleType) / col("n") * 0.9)
      .select(col("event_type"),
        expr("u * 10000 div n").cast(LongType).as("conversion_bp"),
        round(
          pow(lit(1.959964) * sqrt(lit(2) * ((col("p1") + col("p2")) / 2)
            * (lit(1) - (col("p1") + col("p2")) / 2))
            + lit(0.841621) * sqrt(col("p1") * (lit(1) - col("p1"))
              + col("p2") * (lit(1) - col("p2"))), 2)
          / ((col("p2") - col("p1")) * (col("p2") - col("p1"))), 4)
          .as("n_per_arm"))
      .orderBy(col("event_type"))
  }

  // q112_auc — ClickHouse arrayAUC: the ROC area under the curve of a
  // score predicting a binary label, computed EXACTLY via the
  // rank-sum identity AUC = (Σ ranks⁺ − P(P+1)/2) / (P·N) with midrank
  // tie handling — the q73 construction reused: doubled midranks are
  // integers built from window COUNTs (BIGINT-safe, no rank()), so
  // 2·Σranks⁺ is exact and AUC lands in basis points by integer
  // division. Here: does `value` predict a purchase event? One
  // ordered-rank window over the facts (2 window passes) + one
  // aggregation; every intermediate is a BIGINT.
  val q112 = Q(
    "q112_auc",
    Some("""
      WITH scored AS (
        SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS s,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
        FROM events),
      ranked AS (
        SELECT s, label,
               -- doubled midrank 2·mid = 2·below + tied + 1, built from a
               -- RANGE (peer-inclusive) cumulative count so every tied row
               -- sees the same below+tied total: 2·(≤s) − tied + 1
               2 * COUNT(*) OVER (ORDER BY s
                     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - COUNT(*) OVER (PARTITION BY s) + 1 AS r2
        FROM scored),
      agg AS (
        SELECT CAST(SUM(CASE WHEN label = 1 THEN r2 ELSE 0 END) AS BIGINT) AS r2pos,
               CAST(SUM(label) AS BIGINT) AS p,
               CAST(COUNT(*) - SUM(label) AS BIGINT) AS n
        FROM ranked)
      SELECT p AS n_pos, n AS n_neg,
             CAST((r2pos - p * (p + 1)) * 10000 // (2 * p * n) AS BIGINT) AS auc_bp
      FROM agg
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    import graft.plans.GroupedPrefix
    val scored = t.events.select(
      col("value").cast(DecimalType(18, 2)).multiply(lit(100))
        .cast(LongType).as("s"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("label"))
    // GroupedPrefix with an EMPTY group: range-partition on s alone
    // (ties colocate), local RANGE counts per slice, offsets from the
    // ≤ numPartitions slice counts — the global rank without the
    // single-partition ORDER BY s window
    val staged = GroupedPrefix.stage(scored, Seq(col("s")))
    val cntLE = count(lit(1)).over(
      GroupedPrefix.localWindow(Nil, Seq(col("s")))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow))
    val ties = count(lit(1)).over(
      Window.partitionBy(col(GroupedPrefix.PID), col("s")))
    val ranked = GroupedPrefix.withOffsets(staged, Nil,
      Seq(count(lit(1)).as("__c"))) { (slices, wPrev) =>
      slices.select(col(GroupedPrefix.PID),
        coalesce(sum(col("__c")).over(wPrev), lit(0L)).as("__off"))
    }
      .withColumn("r2",
        lit(2) * (col("__off") + cntLE) - ties + 1)
    ranked
      .agg(
        sum(when(col("label") === 1, col("r2")).otherwise(0L))
          .cast(LongType).as("r2pos"),
        sum(col("label")).cast(LongType).as("p"),
        (count(lit(1)) - sum(col("label"))).cast(LongType).as("n"))
      .select(col("p").as("n_pos"), col("n").as("n_neg"),
        expr("(r2pos - p * (p + 1)) * 10000 div (2 * p * n)")
          .cast(LongType).as("auc_bp"))
  }

  // q113_corr_matrix — ClickHouse corrMatrix over the lineitem measures:
  // every pairwise Pearson correlation of (quantity, extendedprice,
  // discount, tax) from ONE map-side-combining scan (corr partials per
  // pair), emitted as the tidy (x, y, corr) long form a heatmap reads.
  // Cross-engine determinism the q38 way: both engines aggregate the
  // same doubles and round once.
  val q113 = Q(
    "q113_corr_matrix",
    Some {
      val ms = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val pairs = for (i <- ms.indices; j <- ms.indices if i < j) yield (ms(i), ms(j))
      pairs.map { case (a, b) =>
        s"SELECT '$a' AS x, '$b' AS y, ROUND(CORR($a, $b), 4) AS corr FROM lineitem"
      }.mkString("", "\n      UNION ALL ", "\n      ORDER BY x, y")
    }
  ) { t =>
    val ms = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val pairs = for (i <- ms.indices; j <- ms.indices if i < j) yield (ms(i), ms(j))
    val aggs = pairs.map { case (a, b) => round(corr(col(a), col(b)), 4).as(s"$a|$b") }
    val wide = t.lineitem.agg(aggs.head, aggs.tail: _*)
    // one scan computes all partials; explode the 1-row wide result into
    // the tidy long form
    val cols = pairs.map { case (a, b) =>
      struct(lit(a).as("x"), lit(b).as("y"), col(s"`$a|$b`").as("corr"))
    }
    wide.select(explode(array(cols: _*)).as("e"))
      .select(col("e.x").as("x"), col("e.y").as("y"), col("e.corr").as("corr"))
      .orderBy(col("x"), col("y"))
  }

  // q124_gini — the Gini coefficient / Lorenz readout per group
  // (revenue-concentration inequality: "do 20% of orders carry 80% of
  // revenue?"). Exact via the rank identity G = (2·Σ i·xᵢ)/(n·Σx) −
  // (n+1)/n over values sorted ascending: ranks are GroupedPrefix
  // row numbers (slice-local row_number + BIGINT prefix offsets — ties
  // get distinct ranks, which the identity tolerates because equal
  // values commute in Σ i·xᵢ... they do NOT in general, so the sort
  // carries the o_orderkey tie-break and BOTH engines use the identical
  // total order), every numerator an exact BIGINT of cents, one double
  // division rounded once. Top-decile share rides the same cumulative
  // machinery in integer bp.
  val q124 = Q(
    "q124_gini",
    Some("""
      WITH v AS (
        SELECT o_orderpriority AS g,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey) AS i,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders)
      SELECT g,
             CAST(MAX(n) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS total_cents,
             ROUND(2.0 * SUM(i * x) / (MAX(n) * CAST(SUM(x) AS DOUBLE))
                   - (MAX(n) + 1.0) / MAX(n), 6) AS gini,
             CAST(SUM(CASE WHEN i * 10 > n * 9 THEN x ELSE 0 END) * 10000
                  // SUM(x) AS BIGINT) AS top_decile_bp
      FROM v
      GROUP BY g
      ORDER BY g
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    import graft.plans.GroupedPrefix
    val staged = GroupedPrefix.stage(
      t.orders.select(col("o_orderpriority").as("g"),
        col("o_totalprice").cast(DecimalType(18, 2)).multiply(lit(100))
          .cast(LongType).as("x"),
        col("o_totalprice"), col("o_orderkey")),
      Seq(col("g"), col("o_totalprice"), col("o_orderkey")))
    // ranks AND group sizes from the same per-slice count partials: the
    // exclusive prefix is the rank offset, the group-window total is n
    val v = GroupedPrefix.withOffsets(staged, Seq("g"),
      Seq(count(lit(1)).as("__c"))) { (slices, wPrev) =>
      slices.select(col("g"), col(GroupedPrefix.PID),
        coalesce(sum(col("__c")).over(wPrev), lit(0L)).as("__off"),
        sum(col("__c")).over(wPrev.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)).as("n"))
    }
      .withColumn("i", col("__off") + row_number().over(
        GroupedPrefix.localWindow(Seq("g"),
          Seq(col("o_totalprice"), col("o_orderkey")))))
    v.groupBy(col("g"))
      .agg(
        max(col("n")).cast(LongType).as("n"),
        sum(col("x")).cast(LongType).as("total_cents"),
        round(lit(2.0) * sum(col("i") * col("x"))
          / (max(col("n")) * sum(col("x")).cast(DoubleType))
          - (max(col("n")) + lit(1.0)) / max(col("n")), 6).as("gini"),
        expr("sum(CASE WHEN i * 10 > n * 9 THEN x ELSE 0 END) * 10000 div sum(x)")
          .cast(LongType).as("top_decile_bp"))
      .orderBy(col("g"))
  }

  // q126_benford — Benford's-law first-digit audit of order totals (the
  // classic fabricated-data screen): observed first-digit counts vs the
  // log10(1+1/d) expectation, deviation in basis points. The first
  // digit comes from a GENERATED integer CASE ladder over magnitude
  // ranges — log10+floor would hinge on libm ulp agreement between
  // engines at exact powers of ten; the ladder is pure BIGINT
  // comparison, immune by construction. Expected shares are fixed
  // literals; one map-side-combinable aggregation.
  val q126 = Q(
    "q126_benford",
    Some {
      // digit(x) for x in [1, 10^15): generated range ladder
      val ladder = (1 to 15).map { k =>
        val lo = math.pow(10, k - 1).toLong
        val hi = math.pow(10, k).toLong
        s"WHEN x < $hi THEN x // $lo"
      }.mkString("CASE ", " ", " ELSE 1 END")
      val expected = (1 to 9)
        .map(d => f"WHEN ${d} THEN ${math.log10(1.0 + 1.0 / d)}%.10f")
        .mkString("CASE digit ", " ", " ELSE 0.0 END")
      s"""
      WITH v AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
        FROM orders WHERE o_totalprice > 0),
      d AS (SELECT $ladder AS digit FROM v),
      c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
      t AS (SELECT SUM(n) AS total FROM c)
      SELECT CAST(c.digit AS BIGINT) AS digit,
             CAST(c.n AS BIGINT) AS n,
             CAST(c.n * 10000 // t.total AS BIGINT) AS observed_bp,
             CAST(FLOOR(10000 * ($expected)) AS BIGINT) AS benford_bp
      FROM c CROSS JOIN t
      ORDER BY digit
      """
    }
  ) { t =>
    val x = col("o_totalprice").cast(DecimalType(18, 2)).multiply(lit(100))
      .cast(LongType)
    val digit = (1 to 15).foldRight(lit(1L): Column) { (k, els) =>
      val lo = math.pow(10, k - 1).toLong
      val hi = math.pow(10, k).toLong
      when(col("x") < hi, expr(s"x div $lo")).otherwise(els)
    }
    val expected = (1 to 9).foldRight(lit(0.0): Column) { (d, els) =>
      when(col("digit") === d, lit(math.log10(1.0 + 1.0 / d))).otherwise(els)
    }
    val c = t.orders.filter(col("o_totalprice") > 0)
      .select(x.as("x"))
      .withColumn("digit", digit)
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
    val tot = c.agg(sum(col("n")).as("total"))
    c.crossJoin(broadcast(tot))
      .select(col("digit").cast(LongType).as("digit"),
        col("n").cast(LongType).as("n"),
        expr("n * 10000 div total").cast(LongType).as("observed_bp"),
        floor(lit(10000) * expected).cast(LongType).as("benford_bp"))
      .orderBy(col("digit"))
  }

  // q127_zscore_outliers — per-group 3σ outlier census with the
  // comparison MULTIPLIED THROUGH to exact integers: with μ = S/n and
  // population σ² = (n·Q − S²)/n², |x−μ| > 3σ clears of division to
  // (n·x − S)² > 9·(n·Q − S²) — both sides DECIMAL(38,0) products
  // of exact cent sums, so the flag can never flip on an FP boundary
  // the way a double z-score comparison can (the subtle cross-engine
  // bug this operator exists to demonstrate killing). Two passes: exact
  // (n, S, Q) per group, broadcast back, one counting scan.
  val q127 = Q(
    "q127_zscore_outliers",
    Some("""
      WITH v AS (
        SELECT o_orderpriority AS g,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
        FROM orders),
      m AS (
        SELECT g, COUNT(*) AS n,
               CAST(SUM(x) AS DECIMAL(38,0)) AS s,
               SUM(CAST(x AS DECIMAL(38,0)) * x) AS q
        FROM v GROUP BY g)
      SELECT v.g,
             CAST(m.n AS BIGINT) AS n,
             COUNT(CASE WHEN (m.n * CAST(v.x AS DECIMAL(38,0)) - m.s)
                             * (m.n * CAST(v.x AS DECIMAL(38,0)) - m.s)
                           > 9 * (m.n * m.q - m.s * m.s)
                        THEN 1 END) AS n_outliers
      FROM v JOIN m ON m.g = v.g
      GROUP BY v.g, m.n
      ORDER BY v.g
    """)
  ) { t =>
    import org.apache.spark.sql.types.DecimalType
    val v = t.orders.select(col("o_orderpriority").as("g"),
      col("o_totalprice").cast(DecimalType(18, 2)).multiply(lit(100))
        .cast(LongType).as("x"))
    val m = v.groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).cast(DecimalType(38, 0)).as("s"),
        sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("q"))
    v.join(broadcast(m), "g")
      .select(col("g"), col("n"),
        ((col("n") * col("x").cast(DecimalType(38, 0)) - col("s"))
          * (col("n") * col("x").cast(DecimalType(38, 0)) - col("s")))
          .as("lhs"),
        (lit(9) * (col("n") * col("q") - col("s") * col("s"))).as("rhs"))
      .groupBy(col("g"), col("n"))
      .agg(count(when(col("lhs") > col("rhs"), 1)).as("n_outliers"))
      .select(col("g"), col("n").cast(LongType).as("n"), col("n_outliers"))
      .orderBy(col("g"))
  }

  // q130_ks_test — two-sample Kolmogorov–Smirnov over the same pair of
  // samples as q68's t-tests (open 'O' vs finished 'F' order prices; CH
  // kolmogorovSmirnovTest): D = sup_v |F0(v) − F1(v)|. Entirely EXACT
  // integer arithmetic: at every pooled sample point v the scaled ECDF
  // gap is |c0(v)·n1 − c1(v)·n0| where c_i(v) = #{x ∈ sample i : x ≤ v}
  // — a BIGINT, so D is reported as the integer numerator d_num over
  // n0·n1 plus the e6 fixed-point d_e6 = d_num·10⁶ div (n0·n1); no FP
  // anywhere, and the argmax point carries a lexicographic struct-max
  // tie-break (smallest v attaining the max), the q65 recipe.
  //
  // Scale shape: the cumulative counts are a GLOBAL ordered sweep — the
  // q112_auc recipe: GroupedPrefix with an EMPTY group range-partitions
  // on the value alone (ties colocate by the RangePartitioner), local
  // RANGE windows per slice, broadcast per-slice offsets; parallelism is
  // numShufflePartitions at any corpus size, never a single sorted
  // partition. Totals ride a 1-row broadcast frame. The BIGINT products
  // c·n hold to ~3×10⁹ rows per sample; past that, lift the two products
  // to DECIMAL(38,0) (d_e6 itself is bounded by 10⁶ at any scale).
  val q130 = Q(
    "q130_ks_test",
    Some("""
      WITH s AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS g
        FROM orders WHERE o_orderstatus IN ('O', 'F')),
      tot AS (
        SELECT CAST(SUM(1 - g) AS BIGINT) AS n0, CAST(SUM(g) AS BIGINT) AS n1
        FROM s),
      c AS (
        SELECT v,
               SUM(1 - g) OVER (ORDER BY v
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c0,
               SUM(g) OVER (ORDER BY v
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1
        FROM s),
      d AS (
        SELECT CAST(ABS(c0 * tot.n1 - c1 * tot.n0) AS BIGINT) AS dn, v
        FROM c, tot),
      m AS (SELECT MAX(dn) AS d_num FROM d),
      at AS (SELECT MIN(d.v) AS ks_at_cents FROM d, m WHERE d.dn = m.d_num)
      SELECT tot.n0, tot.n1, m.d_num,
             m.d_num * 1000000 // (tot.n0 * tot.n1) AS d_e6,
             at.ks_at_cents
      FROM tot, m, at
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    import graft.plans.GroupedPrefix
    val s = t.orders.filter(col("o_orderstatus").isin("O", "F")).select(
      col("o_totalprice").cast(DecimalType(18, 2)).multiply(lit(100))
        .cast(LongType).as("v"),
      when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("g"))
    val staged = GroupedPrefix.stage(s, Seq(col("v")))
    val le = GroupedPrefix.localWindow(Nil, Seq(col("v")))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val c0LE = sum(lit(1L) - col("g")).over(le)
    val c1LE = sum(col("g")).over(le)
    val cum = GroupedPrefix.withOffsets(staged, Nil,
      Seq(sum(lit(1L) - col("g")).as("__c0"), sum(col("g")).as("__c1"))) {
      (slices, wPrev) =>
        slices.select(col(GroupedPrefix.PID),
          coalesce(sum(col("__c0")).over(wPrev), lit(0L)).as("__off0"),
          coalesce(sum(col("__c1")).over(wPrev), lit(0L)).as("__off1"))
    }
      .withColumn("c0", col("__off0") + c0LE)
      .withColumn("c1", col("__off1") + c1LE)
    val tot = s.agg(sum(lit(1L) - col("g")).cast(LongType).as("n0"),
      sum(col("g")).cast(LongType).as("n1"))
    cum.crossJoin(broadcast(tot))
      .select(col("n0"), col("n1"),
        abs(col("c0") * col("n1") - col("c1") * col("n0")).as("dn"),
        col("v"))
      // ONE aggregation: lexicographic struct-max carries (max gap,
      // then smallest attaining value) across the shuffle as partials
      .agg(max(col("n0")).as("n0"), max(col("n1")).as("n1"),
        max(struct(col("dn"), (-col("v")).as("nv"))).as("m"))
      .select(col("n0"), col("n1"), col("m.dn").as("d_num"),
        expr("m.dn * 1000000 div (n0 * n1)").cast(LongType).as("d_e6"),
        (-col("m.nv")).cast(LongType).as("ks_at_cents"))
  }

  // q131_info_value — ClickHouse categoricalInformationValue: per-category
  // weight-of-evidence and information-value contribution of
  // o_orderpriority for the binary outcome "order finished" ('F').
  // WoE_c = ln((good_c·B)/(bad_c·G)) and ivc = (good_c/G − bad_c/B)·WoE_c
  // — the logs force DOUBLE, reviewed onto the lint exemption with the
  // oracle sharing the exact term order: both engines compute
  // ln(double(good·B)/double(bad·G)) from EXACT integer products
  // (< 2⁵³, hence exactly representable), then one ROUND. The sf tables'
  // categories all carry both outcomes; zero cells would need the usual
  // ±0.5 adjustment, asserted away here (a NULL woe would hash-diverge
  // loudly, not silently).
  //
  // Scale shape: one map-side-combinable groupBy to the 5-row cells
  // relation; totals are a 1-row broadcast cross join — nothing
  // corpus-sized crosses a window.
  val q131 = Q(
    "q131_info_value",
    Some("""
      WITH cells AS (
        SELECT o_orderpriority AS priority,
               CAST(COUNT(CASE WHEN o_orderstatus <> 'F' THEN 1 END) AS BIGINT) AS good,
               CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS bad
        FROM orders GROUP BY 1),
      tot AS (
        SELECT CAST(SUM(good) AS BIGINT) AS g_tot, CAST(SUM(bad) AS BIGINT) AS b_tot
        FROM cells)
      SELECT priority, good, bad,
             ROUND(LN(CAST(good * b_tot AS DOUBLE) / CAST(bad * g_tot AS DOUBLE)), 4)
               AS woe_r4,
             ROUND((CAST(good AS DOUBLE) / g_tot - CAST(bad AS DOUBLE) / b_tot)
                   * LN(CAST(good * b_tot AS DOUBLE) / CAST(bad * g_tot AS DOUBLE)), 4)
               AS ivc_r4
      FROM cells, tot
      ORDER BY priority
    """)
  ) { t =>
    val cells = t.orders
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(
        count(when(col("o_orderstatus") =!= "F", 1)).as("good"),
        count(when(col("o_orderstatus") === "F", 1)).as("bad"))
    val tot = cells.agg(sum(col("good")).cast(LongType).as("g_tot"),
      sum(col("bad")).cast(LongType).as("b_tot"))
    val woe = log((col("good") * col("b_tot")).cast(DoubleType) /
      (col("bad") * col("g_tot")).cast(DoubleType))
    cells.crossJoin(broadcast(tot))
      .select(col("priority"), col("good"), col("bad"),
        round(woe, 4).as("woe_r4"),
        round((col("good").cast(DoubleType) / col("g_tot") -
          col("bad").cast(DoubleType) / col("b_tot")) * woe, 4).as("ivc_r4"))
      .orderBy(col("priority"))
  }

  // q134_tukey — Tukey-fence outlier census per order status (CH
  // seriesOutliersDetectTukey semantics on the static distribution):
  // mild outliers outside [Q1 − 1.5·IQR, Q3 + 1.5·IQR], extreme outside
  // the 3·IQR fences. The quartiles interpolate at frac ∈ {0, .25, .5,
  // .75} over integer cents, so every quantile is an exact multiple of
  // ¼ cent — 4·Q is an exact BIGINT in both engines (all interpolation
  // terms < 2⁵³ and dyadic, so DuckDB's lo+(hi−lo)·frac and Spark's
  // (ceil−pos)·lo+(pos−floor)·hi round identically: they don't round at
  // all). Every fence comparison is then cleared of FP entirely by
  // scaling ×8: 8x < 2·q1x4 − 3·iqrx4 etc. — outlier flags can never
  // flip on an ulp boundary.
  //
  // Scale shape: quartiles ride ONE GroupedPrefix staged sort (q21's
  // recipe — never percentile()'s per-group value map); the fences
  // broadcast back onto the fact scan and the census is one
  // map-side-combinable aggregation.
  val q134 = Q(
    "q134_tukey",
    Some("""
      WITH v AS (
        SELECT o_orderstatus AS g,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
        FROM orders),
      q AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(ROUND(QUANTILE_CONT(x, 0.25) * 4) AS BIGINT) AS q1_x4,
               CAST(ROUND(QUANTILE_CONT(x, 0.75) * 4) AS BIGINT) AS q3_x4
        FROM v GROUP BY g)
      SELECT q.g AS o_orderstatus, q.n, q.q1_x4, q.q3_x4,
             q.q3_x4 - q.q1_x4 AS iqr_x4,
             CAST(SUM(CASE WHEN 8*v.x < 2*q.q1_x4 - 3*(q.q3_x4 - q.q1_x4)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_mild_lo,
             CAST(SUM(CASE WHEN 8*v.x > 2*q.q3_x4 + 3*(q.q3_x4 - q.q1_x4)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_mild_hi,
             CAST(SUM(CASE WHEN 8*v.x < 2*q.q1_x4 - 6*(q.q3_x4 - q.q1_x4)
                             OR 8*v.x > 2*q.q3_x4 + 6*(q.q3_x4 - q.q1_x4)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
      FROM v JOIN q ON v.g = q.g
      GROUP BY 1, 2, 3, 4, 5
      ORDER BY o_orderstatus
    """)
  ) { t =>
    import graft.plans.GroupedPrefix
    val v = t.orders.select(col("o_orderstatus").as("g"),
      col("o_totalprice").cast(DecimalType(18, 2)).multiply(lit(100))
        .cast(LongType).as("x"))
    val ps = GroupedPrefix.exactQuantiles(v, Seq("g"), col("x"),
      Seq(0.25, 0.75), "ps")
    val fences = ps.select(col("g"), col("ps_n").as("n"),
      round(col("ps").getItem(0) * 4).cast(LongType).as("q1_x4"),
      round(col("ps").getItem(1) * 4).cast(LongType).as("q3_x4"))
    val iqr = col("q3_x4") - col("q1_x4")
    val x8 = col("x") * 8
    v.join(broadcast(fences), Seq("g"))
      .groupBy(col("g"))
      .agg(max(col("n")).as("n"),
        max(col("q1_x4")).as("q1_x4"), max(col("q3_x4")).as("q3_x4"),
        max(iqr).as("iqr_x4"),
        sum(when(x8 < col("q1_x4") * 2 - iqr * 3, 1L).otherwise(0L))
          .cast(LongType).as("n_mild_lo"),
        sum(when(x8 > col("q3_x4") * 2 + iqr * 3, 1L).otherwise(0L))
          .cast(LongType).as("n_mild_hi"),
        sum(when(x8 < col("q1_x4") * 2 - iqr * 6 ||
                 x8 > col("q3_x4") * 2 + iqr * 6, 1L).otherwise(0L))
          .cast(LongType).as("n_extreme"))
      .select(col("g").as("o_orderstatus"), col("n"), col("q1_x4"),
        col("q3_x4"), col("iqr_x4"), col("n_mild_lo"), col("n_mild_hi"),
        col("n_extreme"))
      .orderBy(col("o_orderstatus"))
  }

  // q136_kendall — Kendall rank correlation between the daily revenue
  // and daily order-count series per order status (CH rankCorr's
  // non-parametric sibling; q71 is Spearman). Counted EXACTLY over
  // explicit pairs: nc concordant, nd discordant, ties_x / ties_y
  // (pairs tied in that coordinate), all BIGINT, and tau-a in e6
  // fixed-point computed sign-split — |nc−nd|·10⁶ div n_pairs, then the
  // sign — because Spark `div` truncates toward zero while DuckDB `//`
  // floors, and the two agree only on non-negative operands.
  //
  // Scale shape: one map-side-combinable groupBy collapses the fact
  // table to the (status, day) relation, which is CALENDAR-bounded
  // (|statuses|·|days| rows at any corpus size — more data widens the
  // days' contents, not the relation). The pair join is that
  // dimension-sized relation against a broadcast of itself on
  // (g, d1 < d2) — O(days²) pairs independent of corpus scale, never a
  // fact-table self-join.
  val q136 = Q(
    "q136_kendall",
    Some("""
      WITH daily AS (
        SELECT o_orderstatus AS g, CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS x,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM orders GROUP BY 1, 2),
      days AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_days FROM daily GROUP BY g),
      p AS (
        SELECT a.g,
               CASE WHEN (a.x < b.x AND a.y < b.y) OR (a.x > b.x AND a.y > b.y)
                    THEN 1 ELSE 0 END AS c,
               CASE WHEN (a.x < b.x AND a.y > b.y) OR (a.x > b.x AND a.y < b.y)
                    THEN 1 ELSE 0 END AS dc,
               CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
               CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
        FROM daily a JOIN daily b ON a.g = b.g AND a.d < b.d),
      agg AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(c) AS BIGINT) AS nc, CAST(SUM(dc) AS BIGINT) AS nd,
               CAST(SUM(tx) AS BIGINT) AS ties_x, CAST(SUM(ty) AS BIGINT) AS ties_y
        FROM p GROUP BY g)
      SELECT agg.g AS o_orderstatus, days.n_days, agg.n_pairs, agg.nc, agg.nd,
             agg.ties_x, agg.ties_y,
             CASE WHEN agg.nc >= agg.nd
                  THEN (agg.nc - agg.nd) * 1000000 // agg.n_pairs
                  ELSE -((agg.nd - agg.nc) * 1000000 // agg.n_pairs)
             END AS tau_a_e6
      FROM agg JOIN days ON agg.g = days.g
      ORDER BY o_orderstatus
    """)
  ) { t =>
    val daily = t.orders
      .groupBy(col("o_orderstatus").as("g"), to_date(col("o_orderdate")).as("d"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)).multiply(lit(100)))
        .cast(LongType).as("x"),
        count(lit(1)).as("y"))
    val nDays = daily.groupBy(col("g")).agg(count(lit(1)).as("n_days"))
    val a = daily.select(col("g"), col("d").as("d1"), col("x").as("x1"),
      col("y").as("y1"))
    val b = daily.select(col("g").as("g2"), col("d").as("d2"),
      col("x").as("x2"), col("y").as("y2"))
    val conc = (col("x1") < col("x2") && col("y1") < col("y2")) ||
      (col("x1") > col("x2") && col("y1") > col("y2"))
    val disc = (col("x1") < col("x2") && col("y1") > col("y2")) ||
      (col("x1") > col("x2") && col("y1") < col("y2"))
    val agg = a.join(broadcast(b),
      col("g") === col("g2") && col("d1") < col("d2"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(conc, 1L).otherwise(0L)).cast(LongType).as("nc"),
        sum(when(disc, 1L).otherwise(0L)).cast(LongType).as("nd"),
        sum(when(col("x1") === col("x2"), 1L).otherwise(0L))
          .cast(LongType).as("ties_x"),
        sum(when(col("y1") === col("y2"), 1L).otherwise(0L))
          .cast(LongType).as("ties_y"))
    agg.join(broadcast(nDays), Seq("g"))
      .select(col("g").as("o_orderstatus"), col("n_days"), col("n_pairs"),
        col("nc"), col("nd"), col("ties_x"), col("ties_y"),
        when(col("nc") >= col("nd"),
          expr("(nc - nd) * 1000000 div n_pairs"))
          .otherwise(-expr("(nd - nc) * 1000000 div n_pairs"))
          .cast(LongType).as("tau_a_e6"))
      .orderBy(col("o_orderstatus"))
  }

  // q137_runs_test — Wald–Wolfowitz runs test on the daily revenue
  // series per order status: classify each observed day above/below the
  // series median (median-ties dropped, the standard treatment), count
  // the runs R in date order, and report the expected-runs value as the
  // EXACT rational mu_num/mu_den = (n + 2ab)/n — no FP anywhere. The
  // median itself is made exact by doubling: at frac 0.5 over integer
  // cents 2·median = lo + hi, a BIGINT in both engines (dyadic
  // interpolation — no rounding ever happens).
  //
  // Scale shape: the fact table collapses to the calendar-bounded daily
  // relation first (map-side combinable); the median rides the same
  // GroupedPrefix covering-slice selection as q21/q75/q134 (no
  // per-group value map), and only the dimension-sized daily relation
  // crosses the 3-value-status lag window — the documented
  // dimension-sized exception, same as the q133/q135 series windows.
  val q137 = Q(
    "q137_runs_test",
    Some("""
      WITH daily AS (
        SELECT o_orderstatus AS g, CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS x
        FROM orders GROUP BY 1, 2),
      med AS (
        SELECT g, CAST(ROUND(2 * QUANTILE_CONT(x, 0.5)) AS BIGINT) AS med2
        FROM daily GROUP BY g),
      s AS (
        SELECT daily.g, daily.d,
               CASE WHEN 2 * daily.x > med.med2 THEN 1 ELSE -1 END AS sgn,
               CASE WHEN 2 * daily.x = med.med2 THEN 1 ELSE 0 END AS tie
        FROM daily JOIN med ON daily.g = med.g),
      runs AS (
        SELECT g,
               CASE WHEN sgn <> LAG(sgn) OVER (PARTITION BY g ORDER BY d)
                    THEN 1 ELSE 0 END AS flip, sgn
        FROM s WHERE tie = 0),
      r AS (
        SELECT g, CAST(SUM(flip) + 1 AS BIGINT) AS r_runs,
               CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
               CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_below
        FROM runs GROUP BY g),
      ties AS (
        SELECT g, CAST(SUM(tie) AS BIGINT) AS n_ties FROM s GROUP BY g)
      SELECT r.g AS o_orderstatus, r.n_above, r.n_below, ties.n_ties, r.r_runs,
             r.n_above + r.n_below + 2 * r.n_above * r.n_below AS mu_num,
             r.n_above + r.n_below AS mu_den
      FROM r JOIN ties ON r.g = ties.g
      ORDER BY o_orderstatus
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    import graft.plans.GroupedPrefix
    val daily = t.orders
      .groupBy(col("o_orderstatus").as("g"), to_date(col("o_orderdate")).as("d"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)).multiply(lit(100)))
        .cast(LongType).as("x"))
    val med = GroupedPrefix.exactQuantiles(daily, Seq("g"), col("x"),
      Seq(0.5), "m")
      .select(col("g"),
        round(col("m").getItem(0) * 2).cast(LongType).as("med2"))
    val s = daily.join(broadcast(med), Seq("g"))
      .select(col("g"), col("d"),
        when(col("x") * 2 > col("med2"), 1L).otherwise(-1L).as("sgn"),
        when(col("x") * 2 === col("med2"), 1L).otherwise(0L).as("tie"))
    val byDay = Window.partitionBy(col("g")).orderBy(col("d"))
    val r = s.where(col("tie") === 0)
      .withColumn("flip",
        when(col("sgn") =!= lag(col("sgn"), 1).over(byDay), 1L).otherwise(0L))
      .groupBy(col("g"))
      .agg((sum(col("flip")) + 1).cast(LongType).as("r_runs"),
        sum(when(col("sgn") === 1, 1L).otherwise(0L))
          .cast(LongType).as("n_above"),
        sum(when(col("sgn") === -1, 1L).otherwise(0L))
          .cast(LongType).as("n_below"))
    val ties = s.groupBy(col("g"))
      .agg(sum(col("tie")).cast(LongType).as("n_ties"))
    r.join(broadcast(ties), Seq("g"))
      .select(col("g").as("o_orderstatus"), col("n_above"), col("n_below"),
        col("n_ties"), col("r_runs"),
        (col("n_above") + col("n_below") +
          col("n_above") * col("n_below") * 2).as("mu_num"),
        (col("n_above") + col("n_below")).as("mu_den"))
      .orderBy(col("o_orderstatus"))
  }

  // q138_chi2_gof — chi-square goodness-of-fit of the order-arrival
  // weekday distribution against uniform, per order status. Kept EXACT
  // by clearing denominators: with E = n/7 each cell contributes
  // (O − n/7)²/(n/7) = (7O − n)²/(7n), so chi2 = chi2_num/chi2_den with
  // chi2_num = Σ_w (7·O_w − n)² and chi2_den = 7n — both BIGINT — plus
  // the e6 fixed-point chi2_e6 (numerators non-negative, so Spark div
  // and DuckDB // agree). The cell grid is DENSIFIED to all 7 weekdays
  // per status (an absent weekday must contribute n², not vanish).
  // The worst cell is a lexicographic struct-max: largest |7O − n|,
  // smallest weekday on ties — the q65 recipe. BIGINT bound: each term
  // is < (7n)², safe to ~4×10⁸ rows per status; past that lift the
  // squares to DECIMAL(38,0).
  //
  // Scale shape: one map-side-combinable groupBy to the ≤ |status|·7
  // cells relation; the weekday grid comes from exploding a 7-element
  // literal against the 3-row status relation; totals broadcast.
  val q138 = Q(
    "q138_chi2_gof",
    Some("""
      WITH cells0 AS (
        SELECT o_orderstatus AS g, CAST(ISODOW(CAST(o_orderdate AS DATE)) AS BIGINT) AS w,
               CAST(COUNT(*) AS BIGINT) AS o
        FROM orders GROUP BY 1, 2),
      grid AS (
        SELECT sg.g, CAST(wd.w AS BIGINT) AS w
        FROM (SELECT DISTINCT g FROM cells0) sg,
             (SELECT UNNEST(GENERATE_SERIES(1, 7)) AS w) wd),
      cells AS (
        SELECT grid.g, grid.w, COALESCE(cells0.o, 0) AS o
        FROM grid LEFT JOIN cells0 ON grid.g = cells0.g AND grid.w = cells0.w),
      tot AS (SELECT g, CAST(SUM(o) AS BIGINT) AS n FROM cells GROUP BY g),
      dev AS (
        SELECT cells.g, cells.w, tot.n,
               7 * cells.o - tot.n AS d
        FROM cells JOIN tot ON cells.g = tot.g),
      agg AS (
        SELECT g, MAX(n) AS n, CAST(SUM(d * d) AS BIGINT) AS chi2_num,
               CAST(MAX(ABS(d)) AS BIGINT) AS worst_dev
        FROM dev GROUP BY g),
      at AS (
        SELECT dev.g, MIN(dev.w) AS worst_weekday
        FROM dev JOIN agg ON dev.g = agg.g AND ABS(dev.d) = agg.worst_dev
        GROUP BY dev.g)
      SELECT agg.g AS o_orderstatus, agg.n, CAST(6 AS BIGINT) AS dof,
             agg.chi2_num, CAST(7 * agg.n AS BIGINT) AS chi2_den,
             agg.chi2_num * 1000000 // (7 * agg.n) AS chi2_e6,
             at.worst_weekday, agg.worst_dev
      FROM agg JOIN at ON agg.g = at.g
      ORDER BY o_orderstatus
    """)
  ) { t =>
    val cells0 = t.orders
      .groupBy(col("o_orderstatus").as("g"),
        (expr("weekday(CAST(o_orderdate AS DATE))") + 1)
          .cast(LongType).as("w"))
      .agg(count(lit(1)).as("o"))
    val grid = cells0.select(col("g")).distinct()
      .select(col("g"),
        explode(array((1L to 7L).map(lit): _*)).as("w"))
    val cells = grid.join(cells0, Seq("g", "w"), "left")
      .select(col("g"), col("w"), coalesce(col("o"), lit(0L)).as("o"))
    val tot = cells.groupBy(col("g")).agg(sum(col("o")).cast(LongType).as("n"))
    cells.join(broadcast(tot), Seq("g"))
      .select(col("g"), col("w"), col("n"),
        (col("o") * 7 - col("n")).as("d"))
      .groupBy(col("g"))
      .agg(max(col("n")).as("n"),
        sum(col("d") * col("d")).cast(LongType).as("chi2_num"),
        (max(col("n")) * 7).cast(LongType).as("chi2_den"),
        max(struct(abs(col("d")).as("ad"), (-col("w")).as("nw"))).as("worst"))
      .select(col("g").as("o_orderstatus"), col("n"), lit(6L).as("dof"),
        col("chi2_num"), col("chi2_den"),
        expr("chi2_num * 1000000 div chi2_den").cast(LongType).as("chi2_e6"),
        (-col("worst.nw")).cast(LongType).as("worst_weekday"),
        col("worst.ad").cast(LongType).as("worst_dev"))
      .orderBy(col("o_orderstatus"))
  }

  // q139_dispersion — Poisson index of dispersion (variance-to-mean
  // ratio) of the daily order-arrival counts per status: D = s²/x̄ > 1
  // flags over-dispersed (bursty) arrivals, the classic check before
  // modeling an event stream as Poisson. EXACT rational with the
  // denominators cleared: s² = (nQ − S²)/(n(n−1)) and x̄ = S/n give
  // D = (nQ − S²)/((n−1)·S) — numerator non-negative by Cauchy-Schwarz,
  // so the e6 fixed point is floor/truncate-agnostic. BIGINT bound:
  // nQ ~ |days|·(events/day)², safe to ~10⁸ events/day; past that lift
  // the two products to DECIMAL(38,0).
  //
  // Scale shape: one map-side-combinable groupBy collapses the fact
  // table to the calendar-bounded daily relation; the readout is a
  // second map-side aggregate over it. No window, no join.
  val q139 = Q(
    "q139_dispersion",
    Some("""
      WITH daily AS (
        SELECT o_orderstatus AS g, CAST(o_orderdate AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM orders GROUP BY 1, 2)
      SELECT g AS o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(c) AS BIGINT) AS n_events,
             CAST(COUNT(*) * SUM(c * c) - SUM(c) * SUM(c) AS BIGINT)
               AS disp_num,
             CAST((COUNT(*) - 1) * SUM(c) AS BIGINT) AS disp_den,
             CAST((COUNT(*) * SUM(c * c) - SUM(c) * SUM(c)) * 1000000
                  // ((COUNT(*) - 1) * SUM(c)) AS BIGINT) AS disp_e6
      FROM daily GROUP BY g
      ORDER BY o_orderstatus
    """)
  ) { t =>
    val daily = t.orders
      .groupBy(col("o_orderstatus").as("g"), to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("c"))
    daily.groupBy(col("g"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("c")).cast(LongType).as("n_events"),
        sum(col("c") * col("c")).cast(LongType).as("__q"))
      .select(col("g").as("o_orderstatus"), col("n_days"), col("n_events"),
        (col("n_days") * col("__q") - col("n_events") * col("n_events"))
          .cast(LongType).as("disp_num"),
        ((col("n_days") - 1) * col("n_events")).cast(LongType).as("disp_den"))
      .withColumn("disp_e6",
        expr("disp_num * 1000000 div disp_den").cast(LongType))
      .orderBy(col("o_orderstatus"))
  }

  // q140 — ClickHouse meanZTest(pop_var_x, pop_var_y, conf)(sample,
  // index): two-sample z test with KNOWN population variances ('O' vs
  // 'F' order totals; σ = 120000.00 both arms, conf = 0.95). Unlike
  // q68's t-tests (sample variances through var_samp), every aggregate
  // here is EXACT — integer cents sums and counts — and z / the CI
  // bounds are single scalar expressions over those four exact values,
  // so both engines compute identical doubles with no
  // aggregation-order dependence (the q131/q133 reviewed-DOUBLE class).
  // Scale: one map-side-combinable aggregation over the scan.
  val q140 = Q(
    "q140_meanztest",
    Some("""
      WITH s AS (
        SELECT CAST(SUM(CASE WHEN o_orderstatus = 'O'
                 THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) END) AS BIGINT) AS s0,
               CAST(SUM(CASE WHEN o_orderstatus = 'F'
                 THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) END) AS BIGINT) AS s1,
               COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n0,
               COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n1
        FROM orders)
      SELECT n0, n1,
             ROUND((CAST(s0 AS DOUBLE) / (100.0 * n0) - CAST(s1 AS DOUBLE) / (100.0 * n1))
               / SQRT(120000.0 * 120000.0 / n0 + 120000.0 * 120000.0 / n1), 4) AS z,
             ROUND((CAST(s0 AS DOUBLE) / (100.0 * n0) - CAST(s1 AS DOUBLE) / (100.0 * n1))
               - 1.96 * SQRT(120000.0 * 120000.0 / n0 + 120000.0 * 120000.0 / n1), 2) AS ci_low,
             ROUND((CAST(s0 AS DOUBLE) / (100.0 * n0) - CAST(s1 AS DOUBLE) / (100.0 * n1))
               + 1.96 * SQRT(120000.0 * 120000.0 / n0 + 120000.0 * 120000.0 / n1), 2) AS ci_high
      FROM s
    """)
  ) { t =>
    val cents = col("o_totalprice").cast(DecimalType(18, 2))
      .multiply(lit(100)).cast(LongType)
    val s = t.orders.agg(
      sum(when(col("o_orderstatus") === "O", cents)).cast(LongType).as("s0"),
      sum(when(col("o_orderstatus") === "F", cents)).cast(LongType).as("s1"),
      count(when(col("o_orderstatus") === "O", 1)).as("n0"),
      count(when(col("o_orderstatus") === "F", 1)).as("n1"))
    val delta = col("s0").cast(DoubleType) / (lit(100.0) * col("n0")) -
      col("s1").cast(DoubleType) / (lit(100.0) * col("n1"))
    val se = sqrt(lit(120000.0) * lit(120000.0) / col("n0") +
      lit(120000.0) * lit(120000.0) / col("n1"))
    s.select(col("n0"), col("n1"),
      round(delta / se, 4).as("z"),
      round(delta - lit(1.96) * se, 2).as("ci_low"),
      round(delta + lit(1.96) * se, 2).as("ci_high"))
  }

  // q141 — ClickHouse quantileExactLow / quantileExactHigh /
  // quantileExact(Nearest): the three exact order-statistic selection
  // rules at the quartiles, per l_returnflag over l_extendedprice
  // cents — all BIGINT, no interpolation anywhere. With n rows and
  // level q = k/4, the 1-based selected positions are
  //   low:     floor((n−1)·q) + 1
  //   high:    ceil((n−1)·q) + 1  =  ((n−1)·k + 3) div 4 + 1
  //   nearest: floor((n−1)·q + ½) + 1  =  ((n−1)·k·2 + 4) div 8 + 1
  // (operands nonnegative, so div/`//` agree). Selection rides ONE
  // GroupedPrefix rank pass (range-partitioned staged sort — never a
  // |groups|-partition window): the value at position p is
  // max(c | rank(c) ≤ p) since ties share their min rank, so all nine
  // readouts fold into one map-side-combinable aggregation over the
  // ranked relation, with per-group counts broadcast back.
  val q141 = Q(
    "q141_quantile_exact",
    Some("""
      WITH v AS (
        SELECT l_returnflag,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        FROM lineitem),
      r AS (
        SELECT l_returnflag, c,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY c) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM v)
      SELECT l_returnflag, CAST(MIN(n) AS BIGINT) AS n,
             CAST(MAX(CASE WHEN rn <= (n-1)*1 // 4 + 1 THEN c END) AS BIGINT) AS p25_low,
             CAST(MAX(CASE WHEN rn <= ((n-1)*1 + 3) // 4 + 1 THEN c END) AS BIGINT) AS p25_high,
             CAST(MAX(CASE WHEN rn <= ((n-1)*2 + 4) // 8 + 1 THEN c END) AS BIGINT) AS p25_near,
             CAST(MAX(CASE WHEN rn <= (n-1)*2 // 4 + 1 THEN c END) AS BIGINT) AS p50_low,
             CAST(MAX(CASE WHEN rn <= ((n-1)*2 + 3) // 4 + 1 THEN c END) AS BIGINT) AS p50_high,
             CAST(MAX(CASE WHEN rn <= ((n-1)*4 + 4) // 8 + 1 THEN c END) AS BIGINT) AS p50_near,
             CAST(MAX(CASE WHEN rn <= (n-1)*3 // 4 + 1 THEN c END) AS BIGINT) AS p75_low,
             CAST(MAX(CASE WHEN rn <= ((n-1)*3 + 3) // 4 + 1 THEN c END) AS BIGINT) AS p75_high,
             CAST(MAX(CASE WHEN rn <= ((n-1)*6 + 4) // 8 + 1 THEN c END) AS BIGINT) AS p75_near
      FROM r
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """)
  ) { t =>
    import graft.plans.GroupedPrefix
    val base = t.lineitem.select(col("l_returnflag"),
      col("l_extendedprice").cast(DecimalType(18, 2))
        .multiply(lit(100)).cast(LongType).as("c"))
    val ranked = GroupedPrefix.withRank(base, Seq("l_returnflag"), col("c"), "rn")
    val counts = base.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    def at(posExpr: String, out: String): Column =
      max(when(expr(s"rn <= $posExpr"), col("c"))).cast(LongType).as(out)
    ranked.join(broadcast(counts), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(min(col("n")).cast(LongType).as("n"),
        at("(n-1)*1 div 4 + 1", "p25_low"),
        at("((n-1)*1 + 3) div 4 + 1", "p25_high"),
        at("((n-1)*2 + 4) div 8 + 1", "p25_near"),
        at("(n-1)*2 div 4 + 1", "p50_low"),
        at("((n-1)*2 + 3) div 4 + 1", "p50_high"),
        at("((n-1)*4 + 4) div 8 + 1", "p50_near"),
        at("(n-1)*3 div 4 + 1", "p75_low"),
        at("((n-1)*3 + 3) div 4 + 1", "p75_high"),
        at("((n-1)*6 + 4) div 8 + 1", "p75_near"))
      .orderBy(col("l_returnflag"))
  }

  // q142 — top-share concentration (the Lorenz-curve readout next to
  // q124's Gini: "what share of revenue do the top 1% / 10% of
  // customers hold"): per-customer revenue in exact cents, globally
  // ranked desc with a unique (−cents, custkey) tuple so rank =
  // row_number deterministically, top-k cut at k = ceil(n/100) and
  // ceil(n/10), shares in exact basis points. The global rank rides the
  // q112 GroupedPrefix sweep (range-partitioned staged sort + slice
  // offsets — never a single-partition ORDER BY window); n and the
  // total broadcast back from a one-row aggregate.
  val q142 = Q(
    "q142_pareto_share",
    Some("""
      WITH c AS (
        SELECT o_custkey,
               SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents
        FROM orders GROUP BY o_custkey),
      r AS (
        SELECT cents,
               ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey) AS rn,
               COUNT(*) OVER () AS n,
               SUM(cents) OVER () AS tot
        FROM c)
      SELECT CAST(MIN(n) AS BIGINT) AS n_customers,
             CAST(MIN(tot) AS BIGINT) AS total_cents,
             CAST(SUM(CASE WHEN rn <= (n + 99) // 100 THEN cents END)
               * 10000 // MIN(tot) AS BIGINT) AS top1_share_bp,
             CAST(SUM(CASE WHEN rn <= (n + 9) // 10 THEN cents END)
               * 10000 // MIN(tot) AS BIGINT) AS top10_share_bp
      FROM r
    """)
  ) { t =>
    import graft.plans.GroupedPrefix
    val c = t.orders
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))
        .multiply(lit(100)).cast(LongType)).cast(LongType).as("cents"))
    val ranked = GroupedPrefix.withRank(c, Nil,
      struct((-col("cents")).as("nc"), col("o_custkey")), "rn")
    val tot = c.agg(count(lit(1)).as("n"), sum(col("cents")).as("tot"))
    ranked.crossJoin(broadcast(tot))
      .agg(
        min(col("n")).cast(LongType).as("n_customers"),
        min(col("tot")).cast(LongType).as("total_cents"),
        sum(when(expr("rn <= (n + 99) div 100"), col("cents"))).as("__s1"),
        sum(when(expr("rn <= (n + 9) div 10"), col("cents"))).as("__s10"))
      .select(col("n_customers"), col("total_cents"),
        // total cents reach ~1e17–1e18 at the 100 TB target, so the
        // ×10000 numerator wraps BIGINT — widen to DECIMAL(38,0)
        // first (the text_burstiness convention); DuckDB's SUM runs
        // in HUGEINT so the oracle never wrapped
        expr("CAST(__s1 AS DECIMAL(38,0)) * 10000 div total_cents")
          .cast(LongType).as("top1_share_bp"),
        expr("CAST(__s10 AS DECIMAL(38,0)) * 10000 div total_cents")
          .cast(LongType).as("top10_share_bp"))
  }

  // q144 — ClickHouse cramersVBiasCorrected(a, b): the Bergsma (2013)
  // bias-corrected Cramér's V over the same status × priority
  // contingency table as q72 — φ²_bc = max(0, φ² − (r−1)(c−1)/(n−1)),
  // r_bc = r − (r−1)²/(n−1), V_bc = √(φ²_bc / min(r_bc−1, c_bc−1)).
  // Everything downstream of the exact integer cell counts is scalar
  // arithmetic over one row (the q72/q140 reviewed-DOUBLE class; both
  // engines share the term order verbatim). Same scale shape as q72:
  // one map-side groupBy to ≤ r·c cells, windows only over that tiny
  // relation.
  val q144 = Q(
    "q144_cramers_bc",
    Some("""
      WITH cells AS (
        SELECT o_orderstatus AS b, o_orderpriority AS a, COUNT(*) AS o
        FROM orders GROUP BY 1, 2
      ), m AS (
        SELECT a, b, o,
               SUM(o) OVER (PARTITION BY a) AS ra,
               SUM(o) OVER (PARTITION BY b) AS cb,
               SUM(o) OVER () AS n
        FROM cells
      ), agg AS (
        SELECT MAX(n) AS n,
               COUNT(DISTINCT a) AS nr, COUNT(DISTINCT b) AS nc,
               SUM((o - ra*cb/CAST(n AS DOUBLE))*(o - ra*cb/CAST(n AS DOUBLE))
                   / (ra*cb/CAST(n AS DOUBLE))) AS chi2
        FROM m
      )
      SELECT CAST(n AS BIGINT) AS n,
             CAST(nr AS BIGINT) AS r, CAST(nc AS BIGINT) AS c,
             ROUND(SQRT(
               GREATEST(0.0, chi2/n - (nr-1.0)*(nc-1.0)/(n-1.0))
               / (LEAST(nr - (nr-1.0)*(nr-1.0)/(n-1.0),
                        nc - (nc-1.0)*(nc-1.0)/(n-1.0)) - 1.0)), 4)
               AS cramers_v_bc
      FROM agg
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    val cells = t.orders
      .groupBy(col("o_orderstatus").as("b"), col("o_orderpriority").as("a"))
      .agg(count(lit(1)).as("o"))
    val m = cells
      .withColumn("ra", sum(col("o")).over(Window.partitionBy(col("a"))))
      .withColumn("cb", sum(col("o")).over(Window.partitionBy(col("b"))))
      .withColumn("n", sum(col("o")).over(Window.partitionBy()))
    val e = col("ra").cast(DoubleType) * col("cb").cast(DoubleType) /
      col("n").cast(DoubleType)
    m.agg(
        max(col("n")).as("n"),
        countDistinct(col("a")).as("nr"),
        countDistinct(col("b")).as("nc"),
        sum((col("o") - e) * (col("o") - e) / e).as("chi2"))
      .select(
        col("n").cast(LongType).as("n"),
        col("nr").cast(LongType).as("r"),
        col("nc").cast(LongType).as("c"),
        round(sqrt(
          greatest(lit(0.0),
            col("chi2") / col("n") -
              (col("nr") - lit(1.0)) * (col("nc") - lit(1.0)) / (col("n") - lit(1.0))) /
          (least(
            col("nr") - (col("nr") - lit(1.0)) * (col("nr") - lit(1.0)) / (col("n") - lit(1.0)),
            col("nc") - (col("nc") - lit(1.0)) * (col("nc") - lit(1.0)) / (col("n") - lit(1.0)))
            - lit(1.0))), 4).as("cramers_v_bc"))
  }

  // q145 — Herfindahl–Hirschman concentration index of supplier revenue
  // within each nation (the q124/q142 concentration family's third
  // member — HHI is the antitrust-standard readout). The metric is
  // defined on FLOORED basis-point shares (share_bp = cents×10000 div
  // total), so every term is exact integer arithmetic in BOTH engines —
  // no squared-cents DECIMAL(38) blowup (cents² × 1e8 passes 10³⁸ at
  // the 100 TB target; bp² ≤ 1e8 never does). Shape: one fact-table
  // aggregation to supplier grain, then nation totals broadcast back —
  // the second and third aggregates run on the supplier-sized relation.
  val q145 = Q(
    "q145_herfindahl",
    Some("""
      WITH sup AS (
        SELECT l_suppkey,
               SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS c
        FROM lineitem GROUP BY l_suppkey),
      nat AS (
        SELECT n.n_name, sup.c,
               SUM(sup.c) OVER (PARTITION BY n.n_name) AS tot
        FROM sup
        JOIN supplier s ON s.s_suppkey = sup.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey)
      SELECT n_name,
             CAST(COUNT(*) AS BIGINT) AS n_suppliers,
             CAST(MAX(tot) AS BIGINT) AS total_cents,
             CAST(SUM((c * 10000 // tot) * (c * 10000 // tot)) AS BIGINT) AS hhi_e8
      FROM nat
      GROUP BY n_name
      ORDER BY n_name
    """)
  ) { t =>
    val sup = t.lineitem
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2))
        .multiply(lit(100)).cast(LongType)).as("c"))
    // the supplier-grain relation feeds BOTH the nation totals and the
    // share pass — pin it so the fact-table aggregation (the one heavy
    // shuffle) runs once, not once per consumer (it is supplier-
    // dimension-sized, so the pinned blocks are bytes, not data);
    // Pin.pinned keeps lineage so an executor loss recomputes instead of
    // killing the job (the localCheckpoint trade — see Pin's doc)
    val named = graft.plans.Pin.pinned(sup
      .join(broadcast(t.supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey")))
    val tots = named.groupBy(col("n_name")).agg(sum(col("c")).as("tot"))
    named.join(broadcast(tots), "n_name")
      // widen before ×10000: cents reach ~1e16 at 100 TB and the bp
      // numerator would wrap BIGINT (the q142 convention)
      .withColumn("bp", expr("CAST(c AS DECIMAL(38,0)) * 10000 div tot"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        max(col("tot")).cast(LongType).as("total_cents"),
        sum(col("bp") * col("bp")).cast(LongType).as("hhi_e8"))
      .orderBy(col("n_name"))
  }

  // q146 — Kruskal–Wallis H test (the k-group generalization of q73's
  // Mann–Whitney): does order priority shift the totalprice
  // distribution, tested within each order status. Midranks ride q73's
  // GroupedPrefix machinery verbatim (range counts + tie windows, no
  // global sort); H and its tie-corrected form are closed-form over
  // per-(status, priority) rank sums — identical term ORDER on both
  // engines, and the tie correction's cubes are pure IEEE
  // multiplication (t·t·t as DOUBLE, never pow/log — N³ would wrap
  // BIGINT at ~2M rows, a 100 TB certainty).
  val q146 = Q(
    "q146_kruskal_wallis",
    Some("""
      WITH pool AS (
        SELECT o_orderstatus AS st, o_orderpriority AS g, o_totalprice AS v
        FROM orders),
      ranked AS (
        SELECT st, g,
               RANK() OVER (PARTITION BY st ORDER BY v)
                 + (COUNT(*) OVER (PARTITION BY st, v) - 1) / 2.0 AS midrank
        FROM pool),
      grp AS (
        SELECT st, g, SUM(midrank) AS r, COUNT(*) AS n
        FROM ranked GROUP BY st, g),
      ties AS (
        SELECT st, SUM(CAST(t AS DOUBLE) * t * t - t) AS tsum
        FROM (SELECT st, v, COUNT(*) AS t FROM pool GROUP BY st, v)
        GROUP BY st),
      hs AS (
        SELECT grp.st,
               CAST(SUM(n) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS k,
               12.0 * SUM(r * r / n) / (SUM(n) * (SUM(n) + 1.0))
                 - 3.0 * (SUM(n) + 1.0) AS h,
               MAX(ties.tsum) AS tsum
        FROM grp JOIN ties ON ties.st = grp.st
        GROUP BY grp.st)
      SELECT st, n, k,
             ROUND(h, 6) AS h,
             ROUND(h / (1.0 - tsum /
               (CAST(n AS DOUBLE) * n * n - n)), 6) AS h_corr
      FROM hs
      ORDER BY st
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    import graft.plans.GroupedPrefix
    val pool = t.orders.select(col("o_orderstatus").as("st"),
      col("o_orderpriority").as("g"), col("o_totalprice").as("v"))
    val staged = GroupedPrefix.stage(pool, Seq(col("st"), col("v")))
    val cntLE = count(lit(1)).over(
      GroupedPrefix.localWindow(Seq("st"), Seq(col("v")))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow))
    val tiesW = count(lit(1)).over(Window.partitionBy(
      col("st"), col(GroupedPrefix.PID), col("v")))
    val ranked = GroupedPrefix.withOffsets(staged, Seq("st"),
      Seq(count(lit(1)).as("__c"))) { (slices, wPrev) =>
      slices.select(col("st"), col(GroupedPrefix.PID),
        coalesce(sum(col("__c")).over(wPrev), lit(0L)).as("__off"))
    }
      .withColumn("midrank", col("__off") + cntLE - (tiesW - lit(1)) / 2.0)
    val grp = ranked.groupBy(col("st"), col("g"))
      .agg(sum(col("midrank")).as("r"), count(lit(1)).as("n"))
    val ties = pool.groupBy(col("st"), col("v")).agg(count(lit(1)).as("t"))
      .groupBy(col("st"))
      .agg(sum(col("t").cast(DoubleType) * col("t") * col("t") - col("t"))
        .as("tsum"))
    grp.join(broadcast(ties), "st")
      .groupBy(col("st"))
      .agg(
        sum(col("n")).cast(LongType).as("n"),
        count(lit(1)).cast(LongType).as("k"),
        (lit(12.0) * sum(col("r") * col("r") / col("n"))
          / (sum(col("n")) * (sum(col("n")) + lit(1.0)))
          - lit(3.0) * (sum(col("n")) + lit(1.0))).as("__h"),
        max(col("tsum")).as("__tsum"))
      .select(col("st"), col("n"), col("k"),
        round(col("__h"), 6).as("h"),
        round(col("__h") / (lit(1.0) - col("__tsum") /
          (col("n").cast(DoubleType) * col("n") * col("n") - col("n"))), 6)
          .as("h_corr"))
      .orderBy(col("st"))
  }

  // q148 — winsorized mean (the robust-mean cleaner next to q75's MAD):
  // clamp each group's cents at its P05/P95 LOWER order statistics
  // (q141's exact rank-cut machinery), then average the clamped values
  // — all BIGINT, the mean floored (div). Two passes: ranks + bounds on
  // the grouped relation, bounds broadcast back over the base.
  val q148 = Q(
    "q148_winsorize",
    Some("""
      WITH v AS (
        SELECT l_returnflag AS g,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        FROM lineitem),
      r AS (
        SELECT g, c,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY c) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS n
        FROM v),
      bounds AS (
        SELECT g,
               MAX(CASE WHEN rn <= (n-1)*5 // 100 + 1 THEN c END) AS lo,
               MAX(CASE WHEN rn <= (n-1)*95 // 100 + 1 THEN c END) AS hi
        FROM r GROUP BY g)
      SELECT v.g,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MAX(bounds.lo) AS BIGINT) AS lo_cents,
             CAST(MAX(bounds.hi) AS BIGINT) AS hi_cents,
             CAST(SUM(CASE WHEN c < lo THEN lo WHEN c > hi THEN hi ELSE c END)
               // COUNT(*) AS BIGINT) AS winsor_mean_cents,
             CAST(COUNT(CASE WHEN c < lo OR c > hi THEN 1 END) AS BIGINT) AS n_clamped
      FROM v JOIN bounds ON bounds.g = v.g
      GROUP BY v.g
      ORDER BY v.g
    """)
  ) { t =>
    import graft.plans.GroupedPrefix
    val base = t.lineitem.select(col("l_returnflag").as("g"),
      col("l_extendedprice").cast(DecimalType(18, 2))
        .multiply(lit(100)).cast(LongType).as("c"))
    val ranked = GroupedPrefix.withRank(base, Seq("g"), col("c"), "rn")
    val counts = base.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val bounds = ranked.join(broadcast(counts), "g")
      .groupBy(col("g"))
      .agg(max(when(expr("rn <= (n-1)*5 div 100 + 1"), col("c"))).as("lo"),
        max(when(expr("rn <= (n-1)*95 div 100 + 1"), col("c"))).as("hi"))
    base.join(broadcast(bounds), "g")
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        max(col("lo")).cast(LongType).as("lo_cents"),
        max(col("hi")).cast(LongType).as("hi_cents"),
        sum(when(col("c") < col("lo"), col("lo"))
          .when(col("c") > col("hi"), col("hi"))
          .otherwise(col("c"))).as("__s"),
        count(when(col("c") < col("lo") || col("c") > col("hi"), 1))
          .cast(LongType).as("n_clamped"))
      .select(col("g"), col("n"), col("lo_cents"), col("hi_cents"),
        expr("__s div n").cast(LongType).as("winsor_mean_cents"),
        col("n_clamped"))
      .orderBy(col("g"))
  }

  // q150 — the Lorenz curve itself, as the ten decile points q124's
  // gini integrates: cumulative revenue share (exact basis points) held
  // by the bottom d×10% of customers, globally ranked. Rides q142's
  // machinery — GroupedPrefix global rank with a unique (cents,
  // custkey) tie-break, n/total broadcast from a one-row aggregate, ten
  // conditional sums in ONE pass (never ten scans), DECIMAL(38,0)
  // widening before the ×10000.
  val q150 = Q(
    "q150_lorenz",
    Some {
      val cols = (1 to 10).map(d =>
        s"""CAST(SUM(CASE WHEN rn <= n * $d // 10 THEN c END)
            * 10000 // MIN(tot) AS BIGINT) AS cum_bp_$d""").mkString(",\n             ")
      s"""
      WITH cust AS (
        SELECT o_custkey,
               SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS c
        FROM orders GROUP BY o_custkey),
      r AS (
        SELECT c,
               ROW_NUMBER() OVER (ORDER BY c, o_custkey) AS rn,
               COUNT(*) OVER () AS n,
               SUM(c) OVER () AS tot
        FROM cust)
      SELECT CAST(MIN(n) AS BIGINT) AS n_customers,
             CAST(MIN(tot) AS BIGINT) AS total_cents,
             $cols
      FROM r
      """
    }
  ) { t =>
    import graft.plans.GroupedPrefix
    val cust = t.orders.groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))
        .multiply(lit(100)).cast(LongType)).cast(LongType).as("c"))
    val ranked = GroupedPrefix.withRank(cust, Nil,
      struct(col("c"), col("o_custkey")), "rn")
    val tot = cust.agg(count(lit(1)).as("n"), sum(col("c")).as("tot"))
    val cuts = (1 to 10).map(d =>
      expr(s"CAST(SUM(CASE WHEN rn <= n * $d div 10 THEN c END) AS DECIMAL(38,0))" +
        s" * 10000 div MIN(tot)").cast(LongType).as(s"cum_bp_$d"))
    val aggs = Seq(min(col("n")).cast(LongType).as("n_customers"),
      min(col("tot")).cast(LongType).as("total_cents")) ++ cuts
    ranked.crossJoin(broadcast(tot))
      .agg(aggs.head, aggs.tail: _*)
  }

  // q151 — RFM segmentation (the classic CRM cell assignment: Recency /
  // Frequency / Monetary quartile scores per customer, 1..4 each).
  // Quartile thresholds are the LOWER order statistics via q141's exact
  // rank cuts — NOT ntile, whose tie placement is engine-specific —
  // and the bucket is 1 + (v>t25) + (v>t50) + (v>t75), tie-stable on
  // both engines. Facts pay one customer-grain aggregation; the three
  // rank passes and the 64-cell rollup run on the customer-sized
  // relation.
  val q151 = Q(
    "q151_rfm",
    Some("""
      WITH ref AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS r0 FROM orders),
      cust AS (
        SELECT o_custkey,
               CAST((SELECT r0 FROM ref) - MAX(CAST(o_orderdate AS DATE)) AS BIGINT) AS r,
               COUNT(*) AS f,
               SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS m
        FROM orders GROUP BY o_custkey),
      rr AS (SELECT r AS v, ROW_NUMBER() OVER (ORDER BY r) AS rn, COUNT(*) OVER () AS n FROM cust),
      fr AS (SELECT f AS v, ROW_NUMBER() OVER (ORDER BY f) AS rn, COUNT(*) OVER () AS n FROM cust),
      mr AS (SELECT m AS v, ROW_NUMBER() OVER (ORDER BY m) AS rn, COUNT(*) OVER () AS n FROM cust),
      th AS (
        SELECT
          (SELECT MAX(CASE WHEN rn <= (n-1)*25 // 100 + 1 THEN v END) FROM rr) AS r25,
          (SELECT MAX(CASE WHEN rn <= (n-1)*50 // 100 + 1 THEN v END) FROM rr) AS r50,
          (SELECT MAX(CASE WHEN rn <= (n-1)*75 // 100 + 1 THEN v END) FROM rr) AS r75,
          (SELECT MAX(CASE WHEN rn <= (n-1)*25 // 100 + 1 THEN v END) FROM fr) AS f25,
          (SELECT MAX(CASE WHEN rn <= (n-1)*50 // 100 + 1 THEN v END) FROM fr) AS f50,
          (SELECT MAX(CASE WHEN rn <= (n-1)*75 // 100 + 1 THEN v END) FROM fr) AS f75,
          (SELECT MAX(CASE WHEN rn <= (n-1)*25 // 100 + 1 THEN v END) FROM mr) AS m25,
          (SELECT MAX(CASE WHEN rn <= (n-1)*50 // 100 + 1 THEN v END) FROM mr) AS m50,
          (SELECT MAX(CASE WHEN rn <= (n-1)*75 // 100 + 1 THEN v END) FROM mr) AS m75)
      SELECT
        CAST(1 + CAST(r > r25 AS INT) + CAST(r > r50 AS INT)
           + CAST(r > r75 AS INT) AS BIGINT) AS r_score,
        CAST(1 + CAST(f > f25 AS INT) + CAST(f > f50 AS INT)
           + CAST(f > f75 AS INT) AS BIGINT) AS f_score,
        CAST(1 + CAST(m > m25 AS INT) + CAST(m > m50 AS INT)
           + CAST(m > m75 AS INT) AS BIGINT) AS m_score,
        CAST(COUNT(*) AS BIGINT) AS n_customers,
        CAST(SUM(m) AS BIGINT) AS total_cents
      FROM cust, th
      GROUP BY 1, 2, 3
      ORDER BY 1, 2, 3
    """)
  ) { t =>
    import graft.plans.GroupedPrefix
    val ref = t.orders.agg(max(to_date(col("o_orderdate"))).as("r0"))
    val cust = graft.plans.Pin.pinned(t.orders.crossJoin(broadcast(ref))
      .groupBy(col("o_custkey"))
      .agg(
        // recency = days from the LAST order to the reference date
        min(datediff(col("r0"), to_date(col("o_orderdate"))))
          .cast(LongType).as("r"),
        count(lit(1)).as("f"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))
          .multiply(lit(100)).cast(LongType)).as("m")))
      // four consumers (three rank passes + the scoring pass) — pin the
      // customer-grain relation so the fact aggregation runs ONCE (the
      // plan otherwise re-scans orders per consumer; no ReusedExchange);
      // lineage kept so executor loss recomputes (Pin's doc)
    // ONE GroupedPrefix rank pass for all three metrics (r14, the r13
    // verdict's q151 watch item): the customer relation melts to long
    // form (metric, v) and the staged sort range-partitions on
    // (metric, v) — three independent n-row sorts with three sampling/
    // pin/broadcast-offset overheads become one 3n-row pass with one,
    // and the fixed costs were the dominant term (3.0 s → ~1.8 s
    // local sf0.1, oracle-identical at all three SFs). Quartile
    // selection then folds per metric and
    // pivots to the same nine-column broadcast frame as before —
    // hashes unchanged.
    val melted = cust.select(explode(array(
      struct(lit("r").as("metric"), col("r").as("v")),
      struct(lit("f").as("metric"), col("f").as("v")),
      struct(lit("m").as("metric"), col("m").as("v")))).as("e"))
      .select(col("e.metric").as("metric"), col("e.v").as("v"))
    val ranked = GroupedPrefix.withRank(melted, Seq("metric"), col("v"), "rn")
    val n1 = cust.agg(count(lit(1)).as("n"))
    val thLong = ranked.crossJoin(broadcast(n1))
      .groupBy(col("metric"))
      .agg(
        max(when(expr("rn <= (n-1)*25 div 100 + 1"), col("v"))).as("p25"),
        max(when(expr("rn <= (n-1)*50 div 100 + 1"), col("v"))).as("p50"),
        max(when(expr("rn <= (n-1)*75 div 100 + 1"), col("v"))).as("p75"))
    val thCols = for (m <- Seq("r", "f", "m"); p <- Seq("25", "50", "75"))
      yield max(when(col("metric") === m, col(s"p$p"))).as(s"$m$p")
    val th = thLong.groupBy().agg(thCols.head, thCols.tail: _*)
    cust.crossJoin(broadcast(th))
      .select(
        (lit(1) + (col("r") > col("r25")).cast("int")
          + (col("r") > col("r50")).cast("int")
          + (col("r") > col("r75")).cast("int")).cast(LongType).as("r_score"),
        (lit(1) + (col("f") > col("f25")).cast("int")
          + (col("f") > col("f50")).cast("int")
          + (col("f") > col("f75")).cast("int")).cast(LongType).as("f_score"),
        (lit(1) + (col("m") > col("m25")).cast("int")
          + (col("m") > col("m50")).cast("int")
          + (col("m") > col("m75")).cast("int")).cast(LongType).as("m_score"),
        col("m"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("m")).cast(LongType).as("total_cents"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  // q153 — ABC (Pareto) classification of parts by revenue: class A
  // while the running revenue share ≤ 80%, B to 95%, C beyond — the
  // inventory-management readout next to q150's Lorenz deciles. Exact
  // integer boundary tests (cw·100 ≤ tw·80, never a ratio), revenue
  // ranked desc with a part-key tie-break, cumulative weights on the
  // q86 GroupedPrefix pattern (slice-local running sums + broadcast
  // prefix offsets — no global window). Products DECIMAL(38,0)-widened
  // (cw·100 passes BIGINT at the 100 TB target).
  val q153 = Q(
    "q153_abc",
    Some("""
      WITH bypart AS (
        SELECT l_partkey,
               SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS c
        FROM lineitem GROUP BY l_partkey),
      cum AS (
        SELECT c,
               SUM(c) OVER (ORDER BY c DESC, l_partkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
               SUM(c) OVER () AS tw
        FROM bypart),
      classed AS (
        SELECT c, tw,
               CASE WHEN cw * 100 <= tw * 80 THEN 'A'
                    WHEN cw * 100 <= tw * 95 THEN 'B'
                    ELSE 'C' END AS cls
        FROM cum)
      SELECT cls,
             CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(SUM(c) AS BIGINT) AS revenue_cents,
             CAST(SUM(c) * 10000 // MAX(tw) AS BIGINT) AS share_bp
      FROM classed
      GROUP BY cls
      ORDER BY cls
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    import graft.plans.GroupedPrefix
    val byPart = t.lineitem
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2))
        .multiply(lit(100)).cast(LongType)).as("c"))
      .withColumn("negc", -col("c"))
    val staged = GroupedPrefix.stage(byPart,
      Seq(col("negc"), col("l_partkey")))
    val cum = GroupedPrefix.withOffsets(staged, Nil,
      Seq(sum(col("c")).as("__w"))) { (slices, wPrev) =>
      slices.select(col(GroupedPrefix.PID),
        coalesce(sum(col("__w")).over(wPrev), lit(0L)).as("__off"),
        sum(col("__w")).over(wPrev.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)).as("tw"))
    }
      .withColumn("cw", col("__off") + sum(col("c")).over(
        GroupedPrefix.localWindow(Nil, Seq(col("negc"), col("l_partkey")))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum
      .withColumn("cls",
        when(expr("CAST(cw AS DECIMAL(38,0)) * 100 <= CAST(tw AS DECIMAL(38,0)) * 80"), "A")
          .when(expr("CAST(cw AS DECIMAL(38,0)) * 100 <= CAST(tw AS DECIMAL(38,0)) * 95"), "B")
          .otherwise("C"))
      .groupBy(col("cls"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("c")).cast(LongType).as("revenue_cents"),
        expr("CAST(SUM(c) AS DECIMAL(38,0)) * 10000 div MAX(tw)")
          .cast(LongType).as("share_bp"))
      .orderBy(col("cls"))
  }

  // q155 — market-basket pair analysis (association rules over order
  // contents: which parts co-occur beyond chance): support = co-order
  // count, lift = n_ab·N / (n_a·n_b) in exact e4. Scale shape: ONE
  // shuffle to order grain, pairs generated ROW-LOCALLY from each
  // order's ≤7-item part set (bounded quadratic — order size is a
  // schema constant, not a corpus variable), global top-20 via a
  // TakeOrdered 20-row heap, and the part-frequency joins run on the
  // 20 SURVIVORS against a broadcast — never on the pair relation.
  val q155 = Q(
    "q155_basket_lift",
    Some("""
      WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      nord AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM items),
      pf AS (SELECT l_partkey, COUNT(*) AS np FROM items GROUP BY l_partkey),
      pairs AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n_ab
        FROM items a JOIN items b
          ON b.l_orderkey = a.l_orderkey AND b.l_partkey > a.l_partkey
        GROUP BY a.l_partkey, b.l_partkey),
      top AS (
        SELECT pa, pb, n_ab,
               ROW_NUMBER() OVER (ORDER BY n_ab DESC, pa, pb) AS rn
        FROM pairs)
      SELECT CAST(pa AS BIGINT) AS pa, CAST(pb AS BIGINT) AS pb,
             CAST(n_ab AS BIGINT) AS support,
             CAST(fa.np AS BIGINT) AS n_a, CAST(fb.np AS BIGINT) AS n_b,
             CAST(n_ab * (SELECT n FROM nord) * 10000
                  // (fa.np * fb.np) AS BIGINT) AS lift_e4
      FROM top JOIN pf fa ON fa.l_partkey = top.pa
               JOIN pf fb ON fb.l_partkey = top.pb
      WHERE rn <= 20
      ORDER BY support DESC, pa, pb
    """)
  ) { t =>
    val items = t.lineitem.select(col("l_orderkey"), col("l_partkey")).distinct()
    val nord = items.agg(countDistinct(col("l_orderkey")).as("n"))
    val pf = items.groupBy(col("l_partkey")).agg(count(lit(1)).as("np"))
    // row-local pair generation from each order's sorted part set
    val pairs = items
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + 2, size(col("ps"))),
          y => struct(x.as("pa"), y.as("pb")))))).as("e"))
      .groupBy(col("e.pa").as("pa"), col("e.pb").as("pb"))
      .agg(count(lit(1)).as("n_ab"))
    val top = pairs
      .orderBy(col("n_ab").desc, col("pa"), col("pb"))
      .limit(20)
    // part frequencies for the 20 survivors only: the 20-row side is
    // the BROADCAST side against the part-grain relation (broadcasting
    // pf itself would ship the whole part dimension)
    val fa = pf.join(broadcast(top.select(col("pa")).distinct()),
      pf("l_partkey") === col("pa")).select(col("pa"), col("np").as("n_a"))
    val fb = pf.join(broadcast(top.select(col("pb")).distinct()),
      pf("l_partkey") === col("pb")).select(col("pb"), col("np").as("n_b"))
    top
      .join(broadcast(fa), "pa")
      .join(broadcast(fb), "pb")
      .crossJoin(broadcast(nord))
      .select(col("pa").cast(LongType), col("pb").cast(LongType),
        col("n_ab").cast(LongType).as("support"),
        col("n_a").cast(LongType), col("n_b").cast(LongType),
        expr("CAST(n_ab AS DECIMAL(38,0)) * n * 10000 div (n_a * n_b)")
          .cast(LongType).as("lift_e4"))
      .orderBy(col("support").desc, col("pa"), col("pb"))
  }

  // q159 — Jarque–Bera normality test per order priority over exact
  // order cents: JB = n/6·(S² + K²/4) from the population skewness and
  // excess kurtosis, all four raw moments accumulated EXACTLY as
  // DECIMAL(38,0) sums of cents (one map-side-combinable pass — the q74
  // shape on a 100 TB-safe widening: cents⁴ ≈ 1e31/row would wrap
  // BIGINT at any scale; 38 digits hold ~1e7 more rows than the target).
  // The double conversion happens once per GROUP (5 rows), identical
  // expression trees on both engines; the 5% verdict compares the
  // ROUNDED statistic so FP noise in the 13th digit cannot flip it.
  val q159 = Q(
    "q159_jarque_bera",
    Some("""
      WITH h AS (
        SELECT o_orderpriority,
               CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS HUGEINT) AS c
        FROM orders),
      p AS (
        SELECT o_orderpriority, COUNT(*) AS n,
               SUM(c) AS s1, SUM(c*c) AS s2,
               SUM(c*c*c) AS s3, SUM(c*c*c*c) AS s4
        FROM h GROUP BY o_orderpriority),
      m AS (
        SELECT o_orderpriority, n,
               CAST(s1 AS DOUBLE)/n AS m1, CAST(s2 AS DOUBLE)/n AS m2,
               CAST(s3 AS DOUBLE)/n AS m3, CAST(s4 AS DOUBLE)/n AS m4
        FROM p),
      sk AS (
        SELECT o_orderpriority, n,
               (m3 - 3.0*m1*m2 + 2.0*POWER(m1,3)) / POWER(m2 - m1*m1, 1.5) AS s,
               (m4 - 4.0*m1*m3 + 6.0*POWER(m1,2)*m2 - 3.0*POWER(m1,4))
                 / POWER(m2 - m1*m1, 2) - 3.0 AS k
        FROM m)
      SELECT o_orderpriority, n,
             ROUND(n/6.0 * (s*s + k*k/4.0), 4) AS jb,
             CAST(CASE WHEN ROUND(n/6.0 * (s*s + k*k/4.0), 4) > 5.9915
                  THEN 1 ELSE 0 END AS BIGINT) AS reject_5pct
      FROM sk
      ORDER BY o_orderpriority
    """)
  ) { t =>
    val c = col("o_totalprice").cast(DecimalType(18, 2))
      .multiply(lit(100)).cast(LongType).cast(DecimalType(19, 0))
    val p = t.orders
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(c.cast(DecimalType(38, 0))).as("s1"),
        sum((c * c).cast(DecimalType(38, 0))).as("s2"),
        sum((c * c * c).cast(DecimalType(38, 0))).as("s3"),
        sum((c * c * c * c).cast(DecimalType(38, 0))).as("s4"))
    val n = col("n")
    val m1 = col("s1").cast(DoubleType) / n
    val m2 = col("s2").cast(DoubleType) / n
    val m3 = col("s3").cast(DoubleType) / n
    val m4 = col("s4").cast(DoubleType) / n
    val v = m2 - m1 * m1
    val s = (m3 - lit(3.0) * m1 * m2 + lit(2.0) * pow(m1, 3)) / pow(v, 1.5)
    val k = (m4 - lit(4.0) * m1 * m3 + lit(6.0) * pow(m1, 2) * m2 -
      lit(3.0) * pow(m1, 4)) / pow(v, 2) - lit(3.0)
    val jb = round(n / lit(6.0) * (s * s + k * k / lit(4.0)), 4)
    p.select(col("o_orderpriority"), n, jb.as("jb"),
        when(jb > 5.9915, 1L).otherwise(0L).as("reject_5pct"))
      .orderBy(col("o_orderpriority"))
  }

  // q160 — standardized effect size for q68's two-group comparison:
  // Cohen's d on the pooled SD, the small-sample Hedges' g correction
  // g = d·(1 − 3/(4N−9)), and Glass's Δ (control-group SD only — the
  // robust choice when variances differ, which q68's welch_t already
  // suggests here) — the readout a test report pairs with the t
  // statistic (t says "significant", d says "how big"). One
  // map-side-combinable aggregation (the q68 partials verbatim), scalar
  // algebra on 6 numbers after; term order shared verbatim with the
  // oracle.
  val q160 = Q(
    "q160_effect_size",
    Some("""
      WITH s AS (
        SELECT AVG(o_totalprice)      FILTER (WHERE o_orderstatus = 'O') AS m0,
               AVG(o_totalprice)      FILTER (WHERE o_orderstatus = 'F') AS m1,
               VAR_SAMP(o_totalprice) FILTER (WHERE o_orderstatus = 'O') AS v0,
               VAR_SAMP(o_totalprice) FILTER (WHERE o_orderstatus = 'F') AS v1,
               COUNT(*)               FILTER (WHERE o_orderstatus = 'O') AS n0,
               COUNT(*)               FILTER (WHERE o_orderstatus = 'F') AS n1
        FROM orders)
      SELECT n0, n1,
             ROUND((m0 - m1) / SQRT(((n0-1)*v0 + (n1-1)*v1) / (n0+n1-2)), 4)
               AS cohens_d,
             ROUND((m0 - m1) / SQRT(((n0-1)*v0 + (n1-1)*v1) / (n0+n1-2))
                   * (1.0 - 3.0/(4.0*(n0+n1) - 9.0)), 4) AS hedges_g,
             ROUND((m0 - m1) / SQRT(v0), 4) AS glass_delta
      FROM s
    """)
  ) { t =>
    val o = when(col("o_orderstatus") === "O", col("o_totalprice"))
    val f = when(col("o_orderstatus") === "F", col("o_totalprice"))
    val s = t.orders.agg(
      avg(o).as("m0"), avg(f).as("m1"),
      var_samp(o).as("v0"), var_samp(f).as("v1"),
      count(o).as("n0"), count(f).as("n1"))
    val pooled = sqrt(((col("n0") - 1) * col("v0") + (col("n1") - 1) * col("v1")) /
      (col("n0") + col("n1") - 2))
    val d = (col("m0") - col("m1")) / pooled
    s.select(col("n0"), col("n1"),
      round(d, 4).as("cohens_d"),
      round(d * (lit(1.0) - lit(3.0) / (lit(4.0) * (col("n0") + col("n1")) - lit(9.0))), 4)
        .as("hedges_g"),
      round((col("m0") - col("m1")) / sqrt(col("v0")), 4).as("glass_delta"))
  }

  // q165 — odds ratio with its 95% Wald CI for the 2×2 contingency of
  // urgent priority × open status: OR = n11·n00 / (n10·n01), CI from
  // exp(ln OR ± 1.96·√(Σ 1/cell)) — the epidemiology/AB-test readout
  // next to q72's symmetric association measures. One
  // map-side-combinable conditional-count pass over the fact table;
  // scalar algebra on four exact counts after (the q140 z-class: no
  // aggregation-order dependence, term order shared verbatim, one
  // ROUND each).
  val q165 = Q(
    "q165_odds_ratio",
    Some("""
      WITH f AS (
        SELECT o_orderpriority = '1-URGENT' AS p, o_orderstatus = 'O' AS s
        FROM orders),
      cells AS (
        SELECT COUNT(CASE WHEN p AND s THEN 1 END) AS n11,
               COUNT(CASE WHEN p AND NOT s THEN 1 END) AS n10,
               COUNT(CASE WHEN NOT p AND s THEN 1 END) AS n01,
               COUNT(CASE WHEN NOT p AND NOT s THEN 1 END) AS n00
        FROM f)
      SELECT n11, n10, n01, n00,
             ROUND(CAST(n11 AS DOUBLE) * n00 / (CAST(n10 AS DOUBLE) * n01), 4)
               AS odds_ratio,
             ROUND(EXP(LN(CAST(n11 AS DOUBLE) * n00 / (CAST(n10 AS DOUBLE) * n01))
                   - 1.96 * SQRT(1.0/n11 + 1.0/n10 + 1.0/n01 + 1.0/n00)), 4)
               AS ci_lo,
             ROUND(EXP(LN(CAST(n11 AS DOUBLE) * n00 / (CAST(n10 AS DOUBLE) * n01))
                   + 1.96 * SQRT(1.0/n11 + 1.0/n10 + 1.0/n01 + 1.0/n00)), 4)
               AS ci_hi
      FROM cells
    """)
  ) { t =>
    val p = col("o_orderpriority") === "1-URGENT"
    val s = col("o_orderstatus") === "O"
    val cells = t.orders.agg(
      count(when(p && s, 1)).as("n11"),
      count(when(p && !s, 1)).as("n10"),
      count(when(!p && s, 1)).as("n01"),
      count(when(!p && !s, 1)).as("n00"))
    val or = col("n11").cast(DoubleType) * col("n00") /
      (col("n10").cast(DoubleType) * col("n01"))
    val half = lit(1.96) * sqrt(lit(1.0) / col("n11") + lit(1.0) / col("n10") +
      lit(1.0) / col("n01") + lit(1.0) / col("n00"))
    cells.select(col("n11"), col("n10"), col("n01"), col("n00"),
      round(or, 4).as("odds_ratio"),
      round(exp(log(or) - half), 4).as("ci_lo"),
      round(exp(log(or) + half), 4).as("ci_hi"))
  }

  // q169 — Mann–Kendall trend test per order status, the SIGNIFICANCE
  // readout beside q92's Theil–Sen slope (slope says how steep; MK says
  // whether a monotone trend exists at all): S = Σ_{i<j} sign(x_j−x_i)
  // over day pairs — the SAME days²-bounded quadratic as q92, never
  // events² — with the exact tie-corrected variance
  // 18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5), the continuity-
  // corrected z = (S ∓ 1)/√(Var), and the 5%-level verdict. S, n and
  // var18 are exact BIGINTs; z shares the identical double term order
  // in both engines (reviewed q68/q140 class) and the verdict compares
  // the ROUNDED z so the label can never flip on an ulp.
  val q169 = Q(
    "q169_mk_trend",
    Some("""
      WITH daily AS (
        SELECT o_orderstatus AS g, CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS x
        FROM orders GROUP BY 1, 2),
      pairs AS (
        SELECT a.g,
               SUM(CASE WHEN b.x > a.x THEN 1
                        WHEN b.x < a.x THEN -1 ELSE 0 END) AS s
        FROM daily a JOIN daily b ON b.g = a.g AND b.d > a.d
        GROUP BY a.g),
      nn AS (SELECT g, COUNT(*) AS n FROM daily GROUP BY g),
      ties AS (
        SELECT g, SUM(t * (t - 1) * (2 * t + 5)) AS tt
        FROM (SELECT g, x, COUNT(*) AS t FROM daily
              GROUP BY g, x HAVING COUNT(*) > 1)
        GROUP BY g),
      stat AS (
        SELECT nn.g, nn.n, p.s,
               nn.n * (nn.n - 1) * (2 * nn.n + 5) - COALESCE(t.tt, 0) AS var18
        FROM nn JOIN pairs p ON p.g = nn.g LEFT JOIN ties t ON t.g = nn.g),
      z AS (
        SELECT g, n, s, var18,
               ROUND((s - (CASE WHEN s > 0 THEN 1 WHEN s < 0 THEN -1
                                ELSE 0 END)) / SQRT(var18 / 18.0), 4) AS z_r4
        FROM stat)
      SELECT g AS o_orderstatus, CAST(n AS BIGINT) AS n_days,
             CAST(s AS BIGINT) AS s_stat, CAST(var18 AS BIGINT) AS var18,
             z_r4,
             CASE WHEN z_r4 > 1.96 THEN 'increasing'
                  WHEN z_r4 < -1.96 THEN 'decreasing'
                  ELSE 'none' END AS trend
      FROM z
      ORDER BY o_orderstatus
    """)
  ) { t =>
    val daily = t.orders
      .groupBy(col("o_orderstatus").as("g"), to_date(col("o_orderdate")).as("d"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)).multiply(lit(100)))
        .cast(LongType).as("x"))
    val a = daily.select(col("g"), col("d").as("da"), col("x").as("xa"))
    val b = daily.select(col("g"), col("d").as("db"), col("x").as("xb"))
    val pairs = a.join(b, Seq("g")).filter(col("db") > col("da"))
      .groupBy(col("g"))
      .agg(sum(when(col("xb") > col("xa"), 1L)
        .when(col("xb") < col("xa"), -1L).otherwise(0L)).as("s"))
    val nn = daily.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val ties = daily.groupBy(col("g"), col("x")).agg(count(lit(1)).as("t"))
      .filter(col("t") > 1)
      .groupBy(col("g"))
      .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tt"))
    nn.join(pairs, "g").join(ties, Seq("g"), "left")
      .select(col("g"), col("n"), col("s"),
        expr("n * (n - 1) * (2 * n + 5) - COALESCE(tt, 0)").as("var18"))
      .select(col("g"), col("n"), col("s"), col("var18"),
        expr("ROUND((s - (CASE WHEN s > 0 THEN 1 WHEN s < 0 THEN -1 " +
          "ELSE 0 END)) / SQRT(var18 / 18.0), 4)").as("z_r4"))
      .select(col("g").as("o_orderstatus"),
        col("n").cast(LongType).as("n_days"),
        col("s").cast(LongType).as("s_stat"),
        col("var18").cast(LongType).as("var18"),
        col("z_r4"),
        when(col("z_r4") > 1.96, "increasing")
          .when(col("z_r4") < -1.96, "decreasing")
          .otherwise("none").as("trend"))
      .orderBy(col("o_orderstatus"))
  }

  // q173 — the approximate-quantile surface WITH its error contract
  // measured in-plan: per return flag, the mergeable-sketch median
  // (Spark approx_percentile / GK, accuracy 10000 — what replaces
  // q141's exact rank selection when even one group's sort no longer
  // pays) next to the exact nearest-rank median, plus the sketch
  // answer's MEASURED rank error and the bound the GK contract
  // promises: ⌈n/accuracy⌉ ranks around the sketch's own target p·n,
  // plus 1 because OUR target is the nearest-rank position
  // (((n−1)·4+4) div 8 + 1 = ⌊n/2⌋+1 — the upper median for even n),
  // up to one rank away from p·n. Rank, not
  // value: GK bounds the returned element's position, never its
  // magnitude, so that is the honest pin. No value oracle exists for
  // a sketch (the q37 pattern) — the driver records rows-only; the
  // spec pins within_bound=true everywhere and accuracy monotonicity.
  // Scale shape: the sketch is one map-side-combinable aggregation;
  // the exact median rides q141's GroupedPrefix rank pass (no
  // per-group value buffers); the rank audit joins the ≤|flags|-row
  // sketch result BROADCAST back onto the cents relation for one more
  // map-side count — three skew-free passes over the facts.
  val q173 = Q("q173_approx_quantile", None) { t =>
    import graft.plans.GroupedPrefix
    val base = t.lineitem.select(col("l_returnflag"),
      col("l_extendedprice").cast(DecimalType(18, 2))
        .multiply(lit(100)).cast(LongType).as("c"))
    val ranked = GroupedPrefix.withRank(base, Seq("l_returnflag"), col("c"), "rn")
    val counts = base.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    // nearest-rank p50 position: ((n−1)·4 + 4) div 8 + 1 (q141's ladder)
    val exact = ranked.join(broadcast(counts), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(min(col("n")).as("n"),
        max(when(expr("rn <= ((n-1)*4 + 4) div 8 + 1"), col("c")))
          .cast(LongType).as("exact_p50"))
    val approx = base.groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("c"), lit(0.5), lit(10000))
        .cast(LongType).as("approx_p50"))
    // rank audit: the sketch value's occupied rank interval in the
    // actual multiset is [rank_lo + 1, rank_hi]
    val audit = base.join(broadcast(approx), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(count(when(col("c") < col("approx_p50"), 1)).as("rank_lo"),
        count(when(col("c") <= col("approx_p50"), 1)).as("rank_hi"))
    exact.join(broadcast(approx), "l_returnflag")
      .join(broadcast(audit), "l_returnflag")
      .withColumn("target_rank", expr("((n-1)*4 + 4) div 8 + 1"))
      .select(col("l_returnflag"), col("n").cast(LongType).as("n"),
        col("exact_p50"), col("approx_p50"),
        col("target_rank").cast(LongType).as("target_rank"),
        greatest(lit(0L), col("rank_lo") + 1 - col("target_rank"),
          col("target_rank") - col("rank_hi"))
          .cast(LongType).as("rank_err"),
        expr("(n + 9999) div 10000 + 1").cast(LongType).as("rank_bound"))
      .withColumn("within_bound", col("rank_err") <= col("rank_bound"))
      .orderBy(col("l_returnflag"))
  }

  val all: Seq[Q] = Seq(q65, q66, q67, q68, q69, q70, q71, q72, q73, q74, q75,
    q92, q99, q111, q112, q113, q124, q126, q127, q130, q131, q134, q136,
    q137, q138, q139, q140, q141, q142, q144, q145, q146, q148, q150, q151,
    q153, q155, q159, q160, q165, q169, q173)
}
