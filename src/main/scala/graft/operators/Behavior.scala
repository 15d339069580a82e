package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Behavioral analytics — the ClickHouse windowFunnel/retention family.
  *
  * Timestamp comparisons in the oracles always go through
  * CAST(ts AS TIMESTAMP) (micro truncation) so DuckDB's nanosecond reads
  * compare identically to Spark's microsecond timestamps.
  */
object Behavior {

  // q46 — IN / NOT IN subqueries (null-free subquery side).
  val q46 = Q(
    "q46_in_subquery",
    Some("""
      SELECT o_orderkey, o_custkey
      FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49)
      ORDER BY o_orderkey
    """)
  ) { t =>
    val rich = t.customer.filter(col("c_acctbal") > 9000).select(col("c_custkey"))
    val bigLines = t.lineitem.filter(col("l_quantity") >= 49).select(col("l_orderkey"))
    t.orders
      .join(rich, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(bigLines, col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select(col("o_orderkey"), col("o_custkey"))
      .orderBy(col("o_orderkey"))
  }

  // q47 — event funnel (ClickHouse windowFunnel analog, min-time strict
  // ordering): click → view → purchase, each step strictly after the
  // previous AND within 1 hour of it (the windowFunnel sliding
  // constraint); level distribution across users. Three bounded
  // aggregations (each a groupBy over the filtered event stream) — no
  // per-user state.
  val q47 = Q(
    "q47_funnel",
    Some("""
      WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      s1 AS (SELECT user_id, MIN(ts) AS t1 FROM e WHERE event_type = 'click' GROUP BY user_id),
      s2 AS (SELECT e.user_id, MIN(e.ts) AS t2
             FROM e JOIN s1 ON e.user_id = s1.user_id
             WHERE e.event_type = 'view' AND e.ts > s1.t1
               AND e.ts <= s1.t1 + INTERVAL 1 HOUR GROUP BY e.user_id),
      s3 AS (SELECT e.user_id, MIN(e.ts) AS t3
             FROM e JOIN s2 ON e.user_id = s2.user_id
             WHERE e.event_type = 'purchase' AND e.ts > s2.t2
               AND e.ts <= s2.t2 + INTERVAL 1 HOUR GROUP BY e.user_id),
      levels AS (
        SELECT u.user_id,
               CASE WHEN s3.user_id IS NOT NULL THEN 3
                    WHEN s2.user_id IS NOT NULL THEN 2
                    WHEN s1.user_id IS NOT NULL THEN 1
                    ELSE 0 END AS funnel_level
        FROM (SELECT DISTINCT user_id FROM e) u
        LEFT JOIN s1 ON u.user_id = s1.user_id
        LEFT JOIN s2 ON u.user_id = s2.user_id
        LEFT JOIN s3 ON u.user_id = s3.user_id)
      SELECT funnel_level, COUNT(*) AS n_users
      FROM levels
      GROUP BY funnel_level
      ORDER BY funnel_level
    """)
  ) { t =>
    val e = t.events.select(col("user_id"), col("event_type"), col("ts"))
    val s1 = e.filter(col("event_type") === "click")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = e.join(s1, "user_id")
      .filter(col("event_type") === "view" && col("ts") > col("t1") &&
        col("ts") <= col("t1") + expr("INTERVAL 1 HOUR"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = e.join(s2, "user_id")
      .filter(col("event_type") === "purchase" && col("ts") > col("t2") &&
        col("ts") <= col("t2") + expr("INTERVAL 1 HOUR"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val users = e.select(col("user_id")).distinct()
    users
      .join(s1.select(col("user_id"), lit(1).as("l1")), Seq("user_id"), "left")
      .join(s2.select(col("user_id"), lit(1).as("l2")), Seq("user_id"), "left")
      .join(s3.select(col("user_id"), lit(1).as("l3")), Seq("user_id"), "left")
      .select(
        when(col("l3").isNotNull, 3).when(col("l2").isNotNull, 2)
          .when(col("l1").isNotNull, 1).otherwise(0).as("funnel_level"))
      .groupBy(col("funnel_level"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("funnel_level"))
  }

  // q48 — day-over-day retention (ClickHouse retention analog): of the
  // users active on day d, how many were also active on d+1. Distinct
  // (user, day) pairs then a lead window per user — single shuffle.
  val q48 = Q(
    "q48_retention",
    Some("""
      WITH activity AS (
        SELECT DISTINCT user_id,
               CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
        FROM events),
      flagged AS (
        SELECT user_id, day,
               LEAD(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day
        FROM activity)
      SELECT day,
             COUNT(*) AS active_users,
             COUNT(CASE WHEN next_day = day + 1 THEN 1 END) AS retained_next_day
      FROM flagged
      GROUP BY day
      ORDER BY day
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    t.events
      .select(col("user_id"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .distinct()
      .withColumn("next_day", lead(col("day"), 1).over(w))
      .groupBy(col("day"))
      .agg(
        count(lit(1)).as("active_users"),
        count(when(col("next_day") === date_add(col("day"), 1), 1))
          .as("retained_next_day"))
      .orderBy(col("day"))
  }

  // q52 — sequence matching (ClickHouse sequenceMatch): serialize each
  // user's event-type initials in time order, regex-match patterns over
  // the sequence string. One groupBy with an ordered string aggregation;
  // the regex runs per user, not per event.
  val q52 = Q(
    "q52_sequence_match",
    Some("""
      WITH seqs AS (
        SELECT user_id,
               STRING_AGG(SUBSTR(event_type, 1, 1), ''
                          ORDER BY CAST(ts AS TIMESTAMP), event_id) AS seq
        FROM events
        GROUP BY user_id)
      SELECT
        COUNT(CASE WHEN REGEXP_MATCHES(seq, 'c.*v.*p') THEN 1 END) AS n_click_view_purchase,
        COUNT(CASE WHEN REGEXP_MATCHES(seq, 's.*p') THEN 1 END) AS n_signup_then_purchase,
        COUNT(CASE WHEN REGEXP_MATCHES(seq, 'e') THEN 1 END) AS n_any_error,
        COUNT(*) AS n_users
      FROM seqs
    """)
  ) { t =>
    val seq = array_join(
      transform(
        array_sort(collect_list(struct(col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("c")))),
        x => x.getField("c")), "")
    t.events
      .groupBy(col("user_id"))
      .agg(seq.as("seq"))
      .agg(
        count(when(col("seq").rlike("c.*v.*p"), 1)).as("n_click_view_purchase"),
        count(when(col("seq").rlike("s.*p"), 1)).as("n_signup_then_purchase"),
        count(when(col("seq").rlike("e"), 1)).as("n_any_error"),
        count(lit(1)).as("n_users"))
  }

  // q58 — STRICT-ORDER funnel (ClickHouse windowFunnel strict_order
  // mode): unlike q47, where any events may sit between the steps, a
  // step only counts if it follows the previous step IMMEDIATELY in the
  // user's event sequence — any intervening event of another type breaks
  // the chain. Implemented over the per-user ordered event-code string
  // (one character per event, ordered by micro-truncated ts with
  // event_id tie-break): strict level k = the code string contains the
  // k-step prefix as an ADJACENT substring. One aggregation shuffle.
  val q58 = Q(
    "q58_funnel_strict",
    Some("""
      WITH seqs AS (
        SELECT user_id,
               STRING_AGG(SUBSTR(event_type, 1, 1), ''
                 ORDER BY CAST(ts AS TIMESTAMP), event_id) AS s
        FROM events
        GROUP BY user_id)
      SELECT CASE WHEN s LIKE '%cvp%' THEN 3
                  WHEN s LIKE '%cv%' THEN 2
                  WHEN s LIKE '%c%' THEN 1
                  ELSE 0 END AS strict_level,
             COUNT(*) AS n_users
      FROM seqs
      GROUP BY 1
      ORDER BY strict_level
    """)
  ) { t =>
    val seqs = t.events
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("code")))).as("evs"))
      .select(concat_ws("", transform(col("evs"), e => e.getField("code"))).as("s"))
    seqs
      .select(
        when(col("s").contains("cvp"), 3)
          .when(col("s").contains("cv"), 2)
          .when(col("s").contains("c"), 1)
          .otherwise(0).as("strict_level"))
      .groupBy(col("strict_level"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("strict_level"))
  }

  // q63 — cohort retention matrix (the weekly triangle every product
  // analytics tool renders): users grouped by first-activity week, each
  // cohort's active count at week offsets 0, 1, 2, …. Two hash-keyed
  // aggregations (distinct activity, per-user cohort) + one join on
  // user_id — the cohort table is |users| rows, so at 100 TB the join is
  // a shuffle on user_id with map-side-combined distincts, no window
  // over the full event stream. Week truncation is Monday-start in both
  // engines; offsets are exact integer day arithmetic / 7.
  val q63 = Q(
    "q63_cohorts",
    Some("""
      WITH act AS (
        SELECT DISTINCT user_id,
               CAST(DATE_TRUNC('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
        FROM events),
      coh AS (SELECT user_id, MIN(wk) AS cohort FROM act GROUP BY user_id)
      SELECT c.cohort,
             CAST((a.wk - c.cohort) // 7 AS BIGINT) AS week_offset,
             COUNT(*) AS n_active
      FROM act a JOIN coh c ON c.user_id = a.user_id
      GROUP BY c.cohort, week_offset
      ORDER BY c.cohort, week_offset
    """)
  ) { t =>
    val act = t.events
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("wk"))
      .distinct()
    val coh = act.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
    act.join(coh, "user_id")
      .select(col("cohort"),
        expr("datediff(wk, cohort) div 7").cast(LongType).as("week_offset"))
      .groupBy(col("cohort"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy(col("cohort"), col("week_offset"))
  }

  // q64 — conversion-lag distribution (time-to-convert, the companion
  // metric to the funnel's conversion rate): for each user, the delay
  // from their FIRST click to their first purchase after it, rolled up
  // by first-click day — conversions, exact total lag, and exact
  // p50/p90 lag quantiles. Two per-user min-aggregations + a join on
  // user_id; the percentile runs over |converting users per day| values,
  // so at 100 TB it is a bounded per-day sort after hash-keyed aggs, no
  // window over the raw event stream. Lag is integer seconds (both
  // engines floor positive epochs), and the quantile interpolation
  // follows the q21 epsilon+round contract.
  val q64 = Q(
    "q64_conversion_lag",
    Some("""
      WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      fc AS (SELECT user_id, MIN(ts) AS t_click FROM e
             WHERE event_type = 'click' GROUP BY user_id),
      fp AS (SELECT e.user_id, MIN(e.ts) AS t_conv
             FROM e JOIN fc ON e.user_id = fc.user_id
             WHERE e.event_type = 'purchase' AND e.ts > fc.t_click
             GROUP BY e.user_id),
      lags AS (
        SELECT CAST(DATE_TRUNC('day', fc.t_click) AS DATE) AS day,
               CAST(EPOCH_US(fp.t_conv) // 1000000 - EPOCH_US(fc.t_click) // 1000000 AS BIGINT) AS lag_s
        FROM fc JOIN fp ON fc.user_id = fp.user_id)
      SELECT day,
             COUNT(*) AS conversions,
             CAST(SUM(lag_s) AS BIGINT) AS sum_lag_s,
             ROUND(MEDIAN(lag_s) + 0.000001, 1) AS p50_lag_s,
             ROUND(QUANTILE_CONT(lag_s, 0.9) + 0.000001, 1) AS p90_lag_s
      FROM lags
      GROUP BY day
      ORDER BY day
    """)
  ) { t =>
    val e = t.events.select(col("user_id"), col("event_type"), col("ts"))
    val fc = e.filter(col("event_type") === "click")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val fp = e.join(fc, "user_id")
      .filter(col("event_type") === "purchase" && col("ts") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_conv"))
    fc.join(fp, "user_id")
      .select(
        date_trunc("day", col("t_click")).cast("date").as("day"),
        (unix_timestamp(col("t_conv")) - unix_timestamp(col("t_click")))
          .cast(LongType).as("lag_s"))
      .groupBy(col("day"))
      .agg(
        count(lit(1)).as("conversions"),
        sum(col("lag_s")).as("sum_lag_s"),
        // percentile() here is domain-bounded: lag_s is INTEGER seconds
        // within the retention window, so the per-group value→count
        // state is capped by the value domain (the q100 histogram
        // argument) — unlike unbounded price domains (q21/q75, which
        // ride GroupedPrefix.exactQuantiles instead)
        percentile(col("lag_s"), array(lit(0.5), lit(0.9))).as("ps"))
      .select(col("day"), col("conversions"), col("sum_lag_s"),
        round(col("ps").getItem(0) + 0.000001, 1).as("p50_lag_s"),
        round(col("ps").getItem(1) + 0.000001, 1).as("p90_lag_s"))
      .orderBy(col("day"))
  }

  // q89 — sequenceNextNode (ClickHouse's path-analysis aggregate): what
  // happens RIGHT AFTER each user's first signup — the distribution of
  // next events, '_none' for users whose signup is their last event.
  // Two keyed aggregations (first-signup anchor = |users| rows joined
  // back hash-keyed; next-event min over the strictly-later slice) —
  // user-parallel, no global window, so the path report costs the same
  // two shuffles at any fact volume. Ordering is (ts, event_id), the
  // engine's deterministic event tie-break.
  val q89 = Q(
    "q89_next_node",
    Some("""
      WITH ev AS (
        SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
        FROM events),
      s AS (
        SELECT user_id, ts AS sts, event_id AS sid FROM (
          SELECT user_id, ts, event_id,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM ev WHERE event_type = 'signup') WHERE rn = 1),
      nx AS (
        SELECT e.user_id, e.event_type,
               ROW_NUMBER() OVER (PARTITION BY e.user_id
                                  ORDER BY e.ts, e.event_id) AS rn
        FROM ev e JOIN s ON s.user_id = e.user_id
        WHERE e.ts > s.sts OR (e.ts = s.sts AND e.event_id > s.sid))
      SELECT COALESCE(n.event_type, '_none') AS next_type,
             CAST(COUNT(*) AS BIGINT) AS n_users
      FROM s LEFT JOIN (SELECT user_id, event_type FROM nx WHERE rn = 1) n
        USING (user_id)
      GROUP BY next_type ORDER BY next_type
    """)
  ) { t =>
    val ev = t.events.select(col("user_id"), col("event_type"), col("ts"),
      col("event_id"))
    val firstSignup = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(struct(col("ts"), col("event_id"))).as("s"))
      .select(col("user_id"), col("s.ts").as("sts"), col("s.event_id").as("sid"))
    val next = ev.join(firstSignup, "user_id")
      .filter(col("ts") > col("sts") ||
        (col("ts") === col("sts") && col("event_id") > col("sid")))
      .groupBy(col("user_id"))
      .agg(min(struct(col("ts"), col("event_id"), col("event_type"))).as("nx"))
      .select(col("user_id"), col("nx.event_type").as("next_type"))
    firstSignup.join(next, Seq("user_id"), "left")
      .select(coalesce(col("next_type"), lit("_none")).as("next_type"))
      .groupBy(col("next_type"))
      .agg(count(lit(1)).cast(LongType).as("n_users"))
      .orderBy(col("next_type"))
  }

  // q102_type_overlap — pairwise audience overlap matrix (the ClickHouse
  // arrayIntersect/uniqExact segmentation readout): for every pair of
  // event types, how many users do both, with the Jaccard in basis
  // points. The facts collapse to distinct (type, user) FIRST (a
  // partial-aggregable dedup), then the pair stage self-joins keyed on
  // user_id — high-cardinality, scales with the data — with fan-out
  // bounded by types-per-user², never corpus². Sizes broadcast back onto
  // the tiny pair matrix; the division is BIGINT-exact (div) on both
  // engines.
  val q102 = Q(
    "q102_type_overlap",
    Some("""
      WITH s AS (SELECT DISTINCT event_type, user_id FROM events),
      sizes AS (SELECT event_type, COUNT(*) AS n FROM s GROUP BY event_type),
      pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS n_both
        FROM s a JOIN s b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY type_a, type_b)
      SELECT p.type_a, p.type_b,
             CAST(sa.n AS BIGINT) AS n_a,
             CAST(sb.n AS BIGINT) AS n_b,
             CAST(p.n_both AS BIGINT) AS n_both,
             CAST(10000 * p.n_both // (sa.n + sb.n - p.n_both) AS BIGINT) AS jaccard_bp
      FROM pairs p
      JOIN sizes sa ON sa.event_type = p.type_a
      JOIN sizes sb ON sb.event_type = p.type_b
      ORDER BY p.type_a, p.type_b
    """)
  ) { t =>
    val s = t.events.select(col("event_type"), col("user_id")).distinct()
    val sizes = s.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val pairs = s.as("a")
      .join(s.as("b"),
        col("a.user_id") === col("b.user_id")
          && col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(sizes.select(col("event_type").as("type_a"), col("n").as("n_a"))), "type_a")
      .join(broadcast(sizes.select(col("event_type").as("type_b"), col("n").as("n_b"))), "type_b")
      .select(col("type_a"), col("type_b"),
        col("n_a").cast(LongType).as("n_a"),
        col("n_b").cast(LongType).as("n_b"),
        col("n_both").cast(LongType).as("n_both"),
        expr("10000 * n_both div (n_a + n_b - n_both)").cast(LongType).as("jaccard_bp"))
      .orderBy(col("type_a"), col("type_b"))
  }

  // q104_retention_flags — the ClickHouse retention() aggregate, anchored
  // in time: per user, did a purchase / an error happen STRICTLY AFTER
  // the user's first signup? (ClickHouse's retention() checks bare
  // condition co-occurrence; anchoring at the first cond1 event is the
  // form every real cohort readout wants, and q48/q63 already cover the
  // calendar variants.) The first-signup anchor is a per-user window MIN
  // (no ordering — a per-partition aggregate over the high-cardinality
  // user key), then one groupBy(user) collapses the flags and one
  // dimension-sized rollup per signup-day cohort reports retention in
  // exact basis points.
  val q104 = Q(
    "q104_retention_flags",
    Some("""
      WITH anchored AS (
        SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               MIN(CASE WHEN event_type = 'signup'
                        THEN epoch_us(CAST(ts AS TIMESTAMP)) END)
                 OVER (PARTITION BY user_id) AS s0
        FROM events),
      per_user AS (
        SELECT user_id, MIN(s0) AS s0,
               MAX(CASE WHEN event_type = 'purchase' AND us > s0 THEN 1 ELSE 0 END) AS f_purchase,
               MAX(CASE WHEN event_type = 'error' AND us > s0 THEN 1 ELSE 0 END) AS f_error
        FROM anchored
        WHERE s0 IS NOT NULL
        GROUP BY user_id)
      SELECT CAST(DATE_TRUNC('day', make_timestamp(s0)) AS DATE) AS cohort_day,
             COUNT(*) AS n_signup_users,
             CAST(SUM(f_purchase) AS BIGINT) AS n_purchase_after,
             CAST(SUM(f_error) AS BIGINT) AS n_error_after,
             CAST(10000 * SUM(f_purchase) // COUNT(*) AS BIGINT) AS purchase_bp
      FROM per_user
      GROUP BY cohort_day
      ORDER BY cohort_day
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    val wu = Window.partitionBy(col("user_id"))
    val anchored = t.events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .withColumn("s0",
        min(when(col("event_type") === "signup", col("us"))).over(wu))
      .filter(col("s0").isNotNull)
    val perUser = anchored
      .groupBy(col("user_id"))
      .agg(min(col("s0")).as("s0"),
        max(when(col("event_type") === "purchase" && col("us") > col("s0"), 1)
          .otherwise(0)).as("f_purchase"),
        max(when(col("event_type") === "error" && col("us") > col("s0"), 1)
          .otherwise(0)).as("f_error"))
    perUser
      .groupBy(to_date(timestamp_micros(col("s0"))).as("cohort_day"))
      .agg(count(lit(1)).as("n_signup_users"),
        sum(col("f_purchase")).cast(LongType).as("n_purchase_after"),
        sum(col("f_error")).cast(LongType).as("n_error_after"))
      .select(col("cohort_day"), col("n_signup_users"),
        col("n_purchase_after"), col("n_error_after"),
        expr("10000 * n_purchase_after div n_signup_users")
          .cast(LongType).as("purchase_bp"))
      .orderBy(col("cohort_day"))
  }

  // q116_funnel_modes — ClickHouse windowFunnel's MODE MATRIX in one
  // relation: the same click→view→purchase funnel evaluated under
  // `ordered` (steps in order, anything between — q47's base
  // semantics), `strict_order` (steps adjacent — q58's), and
  // `strict_dedup` (a repeat of an already-matched step breaks the
  // chain) side by side, per level — the comparison a funnel author
  // reads to pick a mode, and the reason the modes exist at all
  // (levels can only shrink: ordered ⊇ strict_dedup ⊇ strict_order —
  // spec-pinned). One per-user ordered code string (the funnel-family
  // bound), three regex ladders over it, one unpivot + aggregation.
  val q116 = Q(
    "q116_funnel_modes",
    Some("""
      WITH seqs AS (
        SELECT user_id,
               STRING_AGG(SUBSTR(event_type, 1, 1), ''
                 ORDER BY CAST(ts AS TIMESTAMP), event_id) AS s
        FROM events GROUP BY user_id),
      levels AS (
        SELECT user_id,
               CASE WHEN REGEXP_MATCHES(s, 'c.*v.*p') THEN 3
                    WHEN REGEXP_MATCHES(s, 'c.*v') THEN 2
                    WHEN REGEXP_MATCHES(s, 'c') THEN 1 ELSE 0 END AS ordered_lvl,
               CASE WHEN s LIKE '%cvp%' THEN 3
                    WHEN s LIKE '%cv%' THEN 2
                    WHEN s LIKE '%c%' THEN 1 ELSE 0 END AS strict_order_lvl,
               CASE WHEN REGEXP_MATCHES(s, 'c[^c]*v[^cv]*p') THEN 3
                    WHEN REGEXP_MATCHES(s, 'c[^c]*v') THEN 2
                    WHEN REGEXP_MATCHES(s, 'c') THEN 1 ELSE 0 END AS strict_dedup_lvl
        FROM seqs),
      modes AS (
        SELECT 'ordered' AS mode, ordered_lvl AS level FROM levels
        UNION ALL SELECT 'strict_dedup', strict_dedup_lvl FROM levels
        UNION ALL SELECT 'strict_order', strict_order_lvl FROM levels)
      SELECT mode, CAST(level AS BIGINT) AS level, COUNT(*) AS n_users
      FROM modes
      GROUP BY mode, level
      ORDER BY mode, level
    """)
  ) { t =>
    val seqs = t.events
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("code")))).as("evs"))
      .select(concat_ws("", transform(col("evs"), e => e.getField("code"))).as("s"))
    def ladder(p3: Column => Column, p2: Column => Column, p1: Column => Column): Column =
      when(p3(col("s")), 3L).when(p2(col("s")), 2L).when(p1(col("s")), 1L).otherwise(0L)
    val levels = seqs.select(
      ladder(_.rlike("c.*v.*p"), _.rlike("c.*v"), _.rlike("c")).as("ordered_lvl"),
      ladder(_.contains("cvp"), _.contains("cv"), _.contains("c")).as("strict_order_lvl"),
      ladder(_.rlike("c[^c]*v[^cv]*p"), _.rlike("c[^c]*v"), _.rlike("c"))
        .as("strict_dedup_lvl"))
    val modes = Seq(
      ("ordered", "ordered_lvl"),
      ("strict_dedup", "strict_dedup_lvl"),
      ("strict_order", "strict_order_lvl")).map { case (m, c) =>
      levels.select(lit(m).as("mode"), col(c).as("level"))
    }.reduce(_ unionByName _)
    modes.groupBy(col("mode"), col("level"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("mode"), col("level"))
  }

  // q157 — the cohort LTV triangle (q63's revenue sibling, the growth
  // team's core artifact: cumulative revenue per acquisition cohort by
  // months-since-acquisition): cohort = customer's first order month,
  // age in calendar months (y·12+m arithmetic, exact), per-cell
  // revenue and the running LTV per customer in floored cents. The
  // facts pay one custkey-join (the natural co-key) + one (cohort,
  // age) aggregation; the cumulative window runs over the
  // months²/2-bounded triangle, never the facts.
  val q157 = Q(
    "q157_cohort_ltv",
    Some("""
      WITH o AS (
        SELECT o_custkey,
               EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) * 12
                 + EXTRACT(MONTH FROM CAST(o_orderdate AS DATE)) AS ym,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        FROM orders),
      coh AS (SELECT o_custkey, MIN(ym) AS cym FROM o GROUP BY o_custkey),
      size_ AS (SELECT cym, COUNT(*) AS n_customers FROM coh GROUP BY cym),
      cell AS (
        SELECT coh.cym, o.ym - coh.cym AS age, SUM(o.c) AS rev
        FROM o JOIN coh ON coh.o_custkey = o.o_custkey
        GROUP BY coh.cym, age),
      tri AS (
        SELECT cym, age, rev,
               SUM(rev) OVER (PARTITION BY cym ORDER BY age
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM cell)
      SELECT CAST(t.cym AS BIGINT) AS cohort_ym,
             CAST(t.age AS BIGINT) AS age_months,
             CAST(s.n_customers AS BIGINT) AS n_customers,
             CAST(t.rev AS BIGINT) AS rev_cents,
             CAST(t.cum AS BIGINT) AS cum_rev_cents,
             CAST(t.cum // s.n_customers AS BIGINT) AS ltv_cents
      FROM tri t JOIN size_ s ON s.cym = t.cym
      ORDER BY cohort_ym, age_months
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    val o = t.orders.select(col("o_custkey"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast(LongType).as("ym"),
      col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))
        .multiply(lit(100)).cast(LongType).as("c"))
    val coh = o.groupBy(col("o_custkey")).agg(min(col("ym")).as("cym"))
    val sizes = coh.groupBy(col("cym")).agg(count(lit(1)).as("n_customers"))
    val cell = o.join(coh, "o_custkey")
      .groupBy(col("cym"), (col("ym") - col("cym")).as("age"))
      .agg(sum(col("c")).as("rev"))
    val w = Window.partitionBy(col("cym")).orderBy(col("age"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cell
      .withColumn("cum", sum(col("rev")).over(w))
      .join(broadcast(sizes), "cym")
      .select(col("cym").cast(LongType).as("cohort_ym"),
        col("age").cast(LongType).as("age_months"),
        col("n_customers").cast(LongType).as("n_customers"),
        col("rev").cast(LongType).as("rev_cents"),
        col("cum").cast(LongType).as("cum_rev_cents"),
        expr("cum div n_customers").cast(LongType).as("ltv_cents"))
      .orderBy(col("cohort_ym"), col("age_months"))
  }

  // q158 — new vs returning (the other growth-dashboard staple): per
  // order month, orders / distinct customers / revenue split by
  // whether the month is the customer's FIRST. The customer-grain
  // first-month relation joins back on the natural custkey co-key;
  // everything downstream is one month-sized aggregation.
  val q158 = Q(
    "q158_new_vs_returning",
    Some("""
      WITH o AS (
        SELECT o_custkey,
               EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) * 12
                 + EXTRACT(MONTH FROM CAST(o_orderdate AS DATE)) AS ym,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        FROM orders),
      first_ AS (SELECT o_custkey, MIN(ym) AS fym FROM o GROUP BY o_custkey)
      SELECT CAST(o.ym AS BIGINT) AS ym,
             CASE WHEN o.ym = f.fym THEN 'new' ELSE 'returning' END AS kind,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
             CAST(SUM(o.c) AS BIGINT) AS rev_cents
      FROM o JOIN first_ f ON f.o_custkey = o.o_custkey
      GROUP BY o.ym, kind
      ORDER BY ym, kind
    """)
  ) { t =>
    val o = t.orders.select(col("o_custkey"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast(LongType).as("ym"),
      col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))
        .multiply(lit(100)).cast(LongType).as("c"))
    val first = o.groupBy(col("o_custkey")).agg(min(col("ym")).as("fym"))
    o.join(first, "o_custkey")
      .withColumn("kind",
        when(col("ym") === col("fym"), "new").otherwise("returning"))
      .groupBy(col("ym"), col("kind"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        sum(col("c")).cast(LongType).as("rev_cents"))
      .select(col("ym").cast(LongType).as("ym"), col("kind"),
        col("n_orders"), col("n_customers"), col("rev_cents"))
      .orderBy(col("ym"), col("kind"))
  }

  // q162 — month-over-month customer churn (the inverse readout of
  // q48's retention): per month, customers who ordered this month but
  // not the next, exact basis points. The (custkey, month) grain
  // deduplicates FIRST (one fact aggregation), then the month-shift
  // pass is a LEFT self-join on the natural (custkey, ym+1) co-key —
  // an equi-join Spark co-partitions on custkey-family keys, never a
  // window over the raw order stream. The last month has no "next" to
  // churn into and is excluded on both engines.
  val q162 = Q(
    "q162_churn",
    Some("""
      WITH a AS (
        SELECT DISTINCT o_custkey,
               EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) * 12
                 + EXTRACT(MONTH FROM CAST(o_orderdate AS DATE)) AS ym
        FROM orders),
      mx AS (SELECT MAX(ym) AS m FROM a),
      r AS (
        SELECT a.ym, COUNT(*) AS active, COUNT(n.o_custkey) AS retained
        FROM a LEFT JOIN a n
          ON n.o_custkey = a.o_custkey AND n.ym = a.ym + 1
        GROUP BY a.ym)
      SELECT CAST(ym AS BIGINT) AS ym,
             CAST(active AS BIGINT) AS active,
             CAST(active - retained AS BIGINT) AS churned,
             CAST((active - retained) * 10000 // active AS BIGINT) AS churn_bp
      FROM r WHERE ym < (SELECT m FROM mx)
      ORDER BY ym
    """)
  ) { t =>
    val a = t.orders.select(col("o_custkey"),
        (year(to_date(col("o_orderdate"))) * 12 +
          month(to_date(col("o_orderdate")))).as("ym"))
      .distinct()
    val next = a.select(col("o_custkey"), (col("ym") - 1).as("ym"),
      lit(1).as("has_next"))
    val mx = a.agg(max(col("ym")).as("m"))
    a.join(next, Seq("o_custkey", "ym"), "left")
      .groupBy(col("ym"))
      .agg(count(lit(1)).as("active"), count(col("has_next")).as("retained"))
      .crossJoin(broadcast(mx))
      .filter(col("ym") < col("m"))
      .select(col("ym").cast(LongType).as("ym"),
        col("active").cast(LongType).as("active"),
        (col("active") - col("retained")).cast(LongType).as("churned"),
        expr("(active - retained) * 10000 div active")
          .cast(LongType).as("churn_bp"))
      .orderBy(col("ym"))
  }

  // q163 — power-user concentration: per event type, the share of all
  // events generated by the TOP DECILE most-active users (the "10% of
  // users are 90% of traffic" dashboard number), exact basis points.
  // Per-user counts are one fact aggregation; the decile cut is a
  // GroupedPrefix rank over the (count, user_id) struct — unique keys,
  // so rank ≡ row_number and the ROW_NUMBER oracle reproduces the
  // exact cut — and the per-type totals come from a tiny groupBy
  // broadcast back, never a window over the user-grain relation keyed
  // by the 3-value type enum.
  val q163 = Q(
    "q163_power_users",
    Some("""
      WITH cnt AS (
        SELECT event_type, user_id, COUNT(*) AS c
        FROM events GROUP BY event_type, user_id),
      rk AS (
        SELECT event_type, user_id, c,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY c, user_id) AS rn
        FROM cnt),
      tot AS (
        SELECT event_type, COUNT(*) AS nu, SUM(c) AS ne
        FROM cnt GROUP BY event_type)
      SELECT r.event_type,
             CAST(t.nu AS BIGINT) AS n_users,
             CAST((t.nu + 9) // 10 AS BIGINT) AS top_users,
             CAST(t.ne AS BIGINT) AS n_events,
             CAST(SUM(CASE WHEN r.rn > t.nu - (t.nu + 9) // 10
                  THEN r.c ELSE 0 END) AS BIGINT) AS top_events,
             CAST(SUM(CASE WHEN r.rn > t.nu - (t.nu + 9) // 10
                  THEN r.c ELSE 0 END) * 10000 // t.ne AS BIGINT) AS share_bp
      FROM rk r JOIN tot t ON t.event_type = r.event_type
      GROUP BY r.event_type, t.nu, t.ne
      ORDER BY r.event_type
    """)
  ) { t =>
    import graft.plans.GroupedPrefix
    val cnt = t.events.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("c"))
    val rk = GroupedPrefix.withRank(cnt, Seq("event_type"),
      struct(col("c"), col("user_id")), "rn")
    val tot = cnt.groupBy(col("event_type"))
      .agg(count(lit(1)).as("nu"), sum(col("c")).as("ne"))
    // integer div, not Column./ (which widens to DOUBLE)
    val isTop = col("rn") > col("nu") - expr("(nu + 9) div 10")
    rk.join(broadcast(tot), "event_type")
      .groupBy(col("event_type"), col("nu"), col("ne"))
      .agg(sum(when(isTop, col("c")).otherwise(0L)).as("top_events"))
      .select(col("event_type"),
        col("nu").cast(LongType).as("n_users"),
        expr("(nu + 9) div 10").cast(LongType).as("top_users"),
        col("ne").cast(LongType).as("n_events"),
        col("top_events").cast(LongType).as("top_events"),
        expr("top_events * 10000 div ne").cast(LongType).as("share_bp"))
      .orderBy(col("event_type"))
  }

  // q166 — growth accounting: the month-over-month revenue delta
  // DECOMPOSED into new + expansion − contraction − churned (the
  // SaaS-dashboard identity: net change = Σ components, checked
  // exactly here because everything is integer cents). Customer-month
  // revenue is ONE fact aggregation; the decomposition is a FULL OUTER
  // self-join on the natural (custkey, ym+1) co-key — month-pair
  // classification is row-local after the join, and the readout is a
  // month-sized aggregation. The first month has no predecessor and is
  // excluded (its entire revenue would read "new").
  val q166 = Q(
    "q166_growth_accounting",
    Some("""
      WITH cm AS (
        SELECT o_custkey,
               EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) * 12
                 + EXTRACT(MONTH FROM CAST(o_orderdate AS DATE)) AS ym,
               SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS c
        FROM orders GROUP BY 1, 2),
      lim AS (SELECT MIN(ym) AS lo, MAX(ym) AS hi FROM cm),
      pairs AS (
        SELECT COALESCE(cur.ym, prv.ym + 1) AS ym,
               COALESCE(cur.c, 0) AS cc, COALESCE(prv.c, 0) AS pc
        FROM cm cur FULL OUTER JOIN cm prv
          ON prv.o_custkey = cur.o_custkey AND prv.ym = cur.ym - 1)
      SELECT CAST(ym AS BIGINT) AS ym,
             CAST(SUM(CASE WHEN pc = 0 THEN cc ELSE 0 END) AS BIGINT) AS new_cents,
             CAST(SUM(CASE WHEN pc > 0 AND cc > pc THEN cc - pc ELSE 0 END)
               AS BIGINT) AS expansion_cents,
             CAST(SUM(CASE WHEN pc > 0 AND cc > 0 AND cc < pc THEN pc - cc
               ELSE 0 END) AS BIGINT) AS contraction_cents,
             CAST(SUM(CASE WHEN cc = 0 THEN pc ELSE 0 END) AS BIGINT) AS churned_cents,
             CAST(SUM(cc) - SUM(pc) AS BIGINT) AS net_cents
      FROM pairs, lim
      WHERE ym > lim.lo AND ym <= lim.hi
      GROUP BY ym
      ORDER BY ym
    """)
  ) { t =>
    val cm = t.orders
      .groupBy(col("o_custkey"),
        (year(to_date(col("o_orderdate"))) * 12 +
          month(to_date(col("o_orderdate")))).as("ym"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))
        .multiply(lit(100)).cast(LongType)).as("c"))
    val lim = cm.agg(min(col("ym")).as("lo"), max(col("ym")).as("hi"))
    val cur = cm.select(col("o_custkey"), col("ym"), col("c").as("cc"))
    val prv = cm.select(col("o_custkey"), (col("ym") + 1).as("ym"),
      col("c").as("pc"))
    cur.join(prv, Seq("o_custkey", "ym"), "full_outer")
      .select(col("ym"), coalesce(col("cc"), lit(0L)).as("cc"),
        coalesce(col("pc"), lit(0L)).as("pc"))
      .crossJoin(broadcast(lim))
      .filter(col("ym") > col("lo") && col("ym") <= col("hi"))
      .groupBy(col("ym"))
      .agg(
        sum(when(col("pc") === 0, col("cc")).otherwise(0L)).as("new_cents"),
        sum(when(col("pc") > 0 && col("cc") > col("pc"),
          col("cc") - col("pc")).otherwise(0L)).as("expansion_cents"),
        sum(when(col("pc") > 0 && col("cc") > 0 && col("cc") < col("pc"),
          col("pc") - col("cc")).otherwise(0L)).as("contraction_cents"),
        sum(when(col("cc") === 0, col("pc")).otherwise(0L)).as("churned_cents"),
        (sum(col("cc")) - sum(col("pc"))).as("net_cents"))
      .select(col("ym").cast(LongType).as("ym"),
        col("new_cents").cast(LongType).as("new_cents"),
        col("expansion_cents").cast(LongType).as("expansion_cents"),
        col("contraction_cents").cast(LongType).as("contraction_cents"),
        col("churned_cents").cast(LongType).as("churned_cents"),
        col("net_cents").cast(LongType).as("net_cents"))
      .orderBy(col("ym"))
  }

  // q167 — decile lift table, the model-eval readout every targeting /
  // quality-classifier pipeline ends on ("rank users by spend score:
  // how concentrated are the purchasers in the top deciles?"): users
  // ranked by total event value in exact cents (unique (cents,
  // user_id) tiebreak so rank is deterministic in both engines),
  // decile = (rn−1)·10/n + 1 — the RANK-based equal split, computed
  // from GroupedPrefix's staged global rank, never an NTILE window
  // over the user universe — then per decile the responder count,
  // response rate in exact bp, and lift vs the overall rate in exact
  // ppm (DECIMAL(38) products: n_resp × n_users × 10⁶ wraps a Long at
  // the 100 TB user count). Totals broadcast from a one-row aggregate.
  val q167 = Q(
    "q167_decile_lift",
    Some("""
      WITH u AS (
        SELECT user_id,
               SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS resp
        FROM events GROUP BY user_id),
      r AS (
        SELECT user_id, cents, resp,
               ROW_NUMBER() OVER (ORDER BY cents, user_id) AS rn,
               COUNT(*) OVER () AS n
        FROM u),
      tot AS (SELECT COUNT(*) AS nu, SUM(resp) AS nr FROM u),
      d AS (SELECT (rn - 1) * 10 // n + 1 AS decile, resp FROM r)
      SELECT CAST(decile AS BIGINT) AS decile,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(resp) AS BIGINT) AS n_resp,
             CAST(SUM(resp) * 10000 // COUNT(*) AS BIGINT) AS resp_bp,
             CAST(CAST(SUM(resp) AS HUGEINT) * nu * 1000000
               // (CAST(COUNT(*) AS HUGEINT) * nr) AS BIGINT) AS lift_ppm
      FROM d, tot
      GROUP BY decile, nu, nr
      ORDER BY decile
    """)
  ) { t =>
    import graft.plans.GroupedPrefix
    val u = t.events.groupBy(col("user_id"))
      .agg(sum(col("value").cast(DecimalType(18, 2))
        .multiply(lit(100)).cast(LongType)).cast(LongType).as("cents"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("resp"))
    val ranked = GroupedPrefix.withRank(u, Nil,
      struct(col("cents"), col("user_id")), "rn")
    val tot = u.agg(count(lit(1)).as("nu"), sum(col("resp")).as("nr"))
    ranked.crossJoin(broadcast(tot))
      .select(expr("(rn - 1) * 10 div nu + 1").as("decile"),
        col("resp"), col("nu"), col("nr"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("nud"), sum(col("resp")).as("nrd"),
        min(col("nu")).as("nu"), min(col("nr")).as("nr"))
      .select(col("decile").cast(LongType).as("decile"),
        col("nud").cast(LongType).as("n_users"),
        col("nrd").cast(LongType).as("n_resp"),
        expr("nrd * 10000 div nud").cast(LongType).as("resp_bp"),
        expr("CAST(nrd AS DECIMAL(38,0)) * nu * 1000000 " +
          "div (CAST(nud AS DECIMAL(38,0)) * nr)")
          .cast(LongType).as("lift_ppm"))
      .orderBy(col("decile"))
  }

  // q176 — last-touch attribution (the marketing readout ClickHouse
  // serves with ASOF JOIN + windowFunnel-adjacent credit rules; reference
  // feeds this exact table shape, entrypoint.sh:220-229): every purchase
  // is credited to the same user's most recent marketing touch
  // (click/view/signup) at or before it, but only when the touch is
  // within the 24 h lookback — otherwise the purchase is 'direct'. The
  // asof resolution rides Asof.joinAsof's union+window form (one shuffle
  // on user_id — a high-cardinality key, so parallelism scales with
  // users, never with the channel enum), the credit report is a
  // channel-sized aggregate, and revenue stays in exact cents with the
  // bp share computed by integer division against a broadcast 1-row
  // total. At 100 TB nothing here materializes per-pair state: the
  // window carries exactly one (type, ts) pair per row.
  val q176 = Q(
    "q176_attribution",
    Some("""
      WITH purchases AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS p_ts,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'),
      touches AS (
        SELECT user_id, event_type AS t_type, CAST(ts AS TIMESTAMP) AS t_ts
        FROM events WHERE event_type IN ('click', 'view', 'signup')),
      attributed AS (
        SELECT p.event_id, p.cents,
               CASE WHEN t.t_ts IS NOT NULL
                      AND CAST(FLOOR(EPOCH(p.p_ts)) AS BIGINT)
                          - CAST(FLOOR(EPOCH(t.t_ts)) AS BIGINT) <= 86400
                    THEN t.t_type ELSE 'direct' END AS channel
        FROM purchases p
        ASOF LEFT JOIN touches t
          ON p.user_id = t.user_id AND p.p_ts >= t.t_ts),
      tot AS (SELECT COUNT(*) AS np FROM attributed)
      SELECT channel,
             CAST(COUNT(*) AS BIGINT) AS n_purchases,
             CAST(SUM(cents) AS BIGINT) AS revenue_cents,
             CAST(COUNT(*) * 10000 // np AS BIGINT) AS share_bp
      FROM attributed, tot
      GROUP BY channel, np
      ORDER BY channel
    """)
  ) { t =>
    val purchases = t.events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("value").cast(DecimalType(18, 2)).multiply(lit(100))
          .cast(LongType).as("cents"))
    val touches = t.events
      .filter(col("event_type").isin("click", "view", "signup"))
      .select(col("user_id"), col("event_type").as("t_type"),
        col("ts").as("t_ts"))
    val attributed = Asof.joinAsof(purchases, touches, key = "user_id",
      leftTs = "ts", rightTs = "t_ts", rightVals = Seq("t_type", "t_ts"))
      .select(col("event_id"), col("cents"),
        when(col("t_ts").isNotNull &&
          unix_timestamp(col("ts")) - unix_timestamp(col("t_ts")) <= 86400,
          col("t_type")).otherwise(lit("direct")).as("channel"))
    val tot = attributed.agg(count(lit(1)).as("np"))
    attributed
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("cents")).cast(LongType).as("revenue_cents"))
      .crossJoin(broadcast(tot))
      .select(col("channel"),
        col("n_purchases").cast(LongType).as("n_purchases"),
        col("revenue_cents"),
        expr("n_purchases * 10000 div np").cast(LongType).as("share_bp"))
      .orderBy(col("channel"))
  }

  // q177 — session path analysis (the ClickHouse "what do users DO"
  // readout next to sequenceMatch/next_node: top entry paths): events
  // sessionize per user under the q34 30-minute-gap discipline, each
  // session contributes its first-3 event types as an ordered 'a>b>c'
  // path, and the report is the top-15 paths by session count. Both
  // windows partition on user_id (sessionize) and (user_id, session_id)
  // (the prefix rank) — high-cardinality keys whose partitions shrink
  // as data grows, never an enum; the per-session state is the BOUNDED
  // 3-element prefix (sort_array over ≤3 structs), and the final cut is
  // TakeOrdered's heap, not a global sort of the path universe.
  val q177 = Q(
    "q177_event_paths",
    Some("""
      WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
        FROM events),
      flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN LAG(ts) OVER w IS NULL
                      OR DATE_DIFF('second', LAG(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS is_start
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sessions AS (
        SELECT user_id, event_type, ts, event_id,
               SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged),
      ranked AS (
        SELECT user_id, session_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                                  ORDER BY ts, event_id) AS rn
        FROM sessions),
      paths AS (
        SELECT user_id, session_id,
               array_to_string(LIST(event_type ORDER BY rn), '>') AS path
        FROM ranked WHERE rn <= 3
        GROUP BY user_id, session_id)
      SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
      FROM paths
      GROUP BY path
      ORDER BY n_sessions DESC, path
      LIMIT 15
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("ts"), 1).over(w)
    val sessions = t.events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("is_start",
        when(prev.isNull || unix_timestamp(col("ts")) - unix_timestamp(prev) > 1800, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("is_start")).over(wRun))
    val wSess = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts"), col("event_id"))
    sessions
      .withColumn("rn", row_number().over(wSess))
      .filter(col("rn") <= 3)
      .groupBy(col("user_id"), col("session_id"))
      .agg(sort_array(collect_list(struct(col("rn"), col("event_type")))).as("p3"))
      .select(concat_ws(">",
        transform(col("p3"), e => e.getField("event_type"))).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).cast(LongType).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(15)
  }

  // q179 — multi-touch (linear) attribution, q176's split-credit
  // sibling: every touch in a purchase's 24 h lookback shares the
  // purchase's 1000 milli-credits equally, with integer exactness kept
  // by giving each touch 1000 div k and the remainder 1000 mod k to the
  // LATEST touch (deterministic — (user, ts) is unique); untouched
  // purchases credit 'direct' whole. The pair resolution is the
  // bucketed interval join (Asof.intervalJoin: equi-join on
  // (user, day-bucket) probing 2 buckets — work scales with real
  // overlaps, never |purchases|×|touches| per user), the per-purchase
  // k/latest come from one window over event_id (high-cardinality —
  // partitions SHRINK as data grows), and the invariant
  // Σ credit_milli = 1000 × purchases is spec-pinned. The oracle
  // replays the NAIVE range join — bucketing must be invisible.
  val q179 = Q(
    "q179_attribution_linear",
    Some("""
      WITH purchases AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS p_ts
        FROM events WHERE event_type = 'purchase'),
      touches AS (
        SELECT user_id, event_type AS t_type, CAST(ts AS TIMESTAMP) AS t_ts
        FROM events WHERE event_type IN ('click', 'view', 'signup')),
      pairs AS (
        SELECT p.event_id, t.t_type, t.t_ts
        FROM purchases p
        JOIN touches t ON p.user_id = t.user_id
          AND t.t_ts < p.p_ts
          AND CAST(FLOOR(EPOCH(p.p_ts)) AS BIGINT)
              <= CAST(FLOOR(EPOCH(t.t_ts)) AS BIGINT) + 86400),
      k AS (
        SELECT event_id, COUNT(*) AS k, MAX(t_ts) AS last_ts
        FROM pairs GROUP BY event_id),
      credit AS (
        SELECT pr.t_type AS channel,
               1000 // k.k + CASE WHEN pr.t_ts = k.last_ts
                                  THEN 1000 % k.k ELSE 0 END AS m
        FROM pairs pr JOIN k ON pr.event_id = k.event_id),
      direct AS (
        SELECT 'direct' AS channel, 1000 AS m
        FROM purchases p
        WHERE NOT EXISTS (SELECT 1 FROM pairs WHERE pairs.event_id = p.event_id))
      SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(m) AS BIGINT) AS credit_milli
      FROM (SELECT * FROM credit UNION ALL SELECT * FROM direct)
      GROUP BY channel
      ORDER BY channel
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    val purchases = t.events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id"),
        col("ts").as("p_ts"))
    val touches = t.events
      .filter(col("event_type").isin("click", "view", "signup"))
      .select(col("user_id"), col("event_type").as("t_type"),
        col("ts").as("t_ts"))
    val pairs = Asof.intervalJoin(touches, purchases,
      leftKey = "user_id", rightKey = "p_user",
      leftTs = "t_ts", rightTs = "p_ts",
      windowSec = 86400, bucketSec = 86400)
      .select(col("event_id"), col("t_type"), col("t_ts"))
    val wK = Window.partitionBy(col("event_id"))
    val credit = pairs
      .withColumn("k", count(lit(1)).over(wK))
      .withColumn("last_ts", max(col("t_ts")).over(wK))
      .select(col("t_type").as("channel"),
        (expr("1000 div k") +
          when(col("t_ts") === col("last_ts"), expr("1000 % k"))
            .otherwise(lit(0L))).as("m"))
    val direct = purchases
      .join(pairs.select(col("event_id")).distinct(), Seq("event_id"),
        "left_anti")
      .select(lit("direct").as("channel"), lit(1000L).as("m"))
    credit.unionByName(direct)
      .groupBy(col("channel"))
      .agg(count(lit(1)).cast(LongType).as("n_rows"),
        sum(col("m")).cast(LongType).as("credit_milli"))
      .orderBy(col("channel"))
  }

  // q180 — behavioral flow transitions (the Sankey-diagram feed next to
  // q89's single next-node and q177's path strings): per session (q34's
  // 30-min-gap discipline) the first 4 steps contribute their adjacent
  // (step, from, to) transitions, counted across sessions. One
  // user-keyed window chain builds session ids, ranks, and the lead
  // type — all partitioned on user_id/(user_id, session_id), never an
  // enum — and the report is |steps|×|types|² bounded (dimension-sized),
  // so the aggregation output is tiny whatever the fact volume.
  val q180 = Q(
    "q180_flow_transitions",
    Some("""
      WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
        FROM events),
      flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN LAG(ts) OVER w IS NULL
                      OR DATE_DIFF('second', LAG(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS is_start
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sessions AS (
        SELECT user_id, event_type, ts, event_id,
               SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged),
      stepped AS (
        SELECT event_type AS src,
               LEAD(event_type) OVER ws AS dst,
               ROW_NUMBER() OVER ws AS step
        FROM sessions
        WINDOW ws AS (PARTITION BY user_id, session_id ORDER BY ts, event_id))
      SELECT CAST(step AS BIGINT) AS step, src, dst,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM stepped
      WHERE step <= 3 AND dst IS NOT NULL
      GROUP BY step, src, dst
      ORDER BY step, src, dst
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("ts"), 1).over(w)
    val sessions = t.events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("is_start",
        when(prev.isNull || unix_timestamp(col("ts")) - unix_timestamp(prev) > 1800, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("is_start")).over(wRun))
    val wSess = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts"), col("event_id"))
    sessions
      .withColumn("step", row_number().over(wSess))
      .withColumn("dst", lead(col("event_type"), 1).over(wSess))
      .filter(col("step") <= 3 && col("dst").isNotNull)
      .groupBy(col("step").cast(LongType).as("step"),
        col("event_type").as("src"), col("dst"))
      .agg(count(lit(1)).cast(LongType).as("n"))
      .orderBy(col("step"), col("src"), col("dst"))
  }

  val all: Seq[Q] = Seq(q46, q47, q48, q52, q58, q63, q64, q89, q102, q104,
    q116, q157, q158, q162, q163, q166, q167, q176, q177, q179, q180)
}
