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

  // q77 — calendar gap fill: daily order counts/revenue per priority with
  // missing days emitted as zero rows (the dashboard-series contract CH
  // serves with ORDER BY ... WITH FILL). The dense frame is
  // |priorities| × |days| — bounded by the DIMENSIONS (date span × a
  // low-cardinality attribute), independent of fact volume, so at 100 TB
  // the fact table only feeds one (priority, day) aggregation; the
  // calendar × priority scaffold is broadcast onto that small aggregate.
  val q77 = Q(
    "q77_gap_fill",
    Some("""
      WITH daily AS (
        SELECT o_orderpriority AS priority, o_orderdate AS day,
               COUNT(*) AS n, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1, 2),
      bounds AS (SELECT MIN(o_orderdate) AS lo, MAX(o_orderdate) AS hi FROM orders),
      cal AS (
        SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
        FROM bounds),
      dims AS (SELECT DISTINCT o_orderpriority AS priority FROM orders)
      SELECT d.priority, c.day,
             COALESCE(x.n, 0) AS n,
             CAST(COALESCE(x.rev, 0) AS DOUBLE) AS rev
      FROM cal c CROSS JOIN dims d
      LEFT JOIN daily x ON x.priority = d.priority AND x.day = c.day
      ORDER BY d.priority, c.day
    """)
  ) { t =>
    val daily = t.orders
      .groupBy(col("o_orderpriority").as("priority"), col("o_orderdate").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))
    val cal = t.orders
      .agg(min(col("o_orderdate")).as("lo"), max(col("o_orderdate")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
    val dims = t.orders.select(col("o_orderpriority").as("priority")).distinct()
    cal.crossJoin(broadcast(dims))
      .join(daily, Seq("priority", "day"), "left")
      .select(col("priority"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("rev"), lit(BigDecimal(0)).cast(DecimalType(18, 2)))
          .cast(DoubleType).as("rev"))
      .orderBy(col("priority"), col("day"))
  }

  // q78 — sliding 7-day distinct users per day, EXACT and shuffle-bounded:
  // each distinct (day, user) pair contributes itself to its 7 trailing
  // target days (a map-side ×7 explode of the already-distinct pairs),
  // then one (day, user) distinct-count. No window sort anywhere, and the
  // explode factor is the window length — the standard exact alternative
  // to the unbounded per-day self-join. At 100 TB the distinct pair set is
  // what shuffles, not the event stream.
  val q78 = Q(
    "q78_sliding_distinct",
    Some("""
      WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM du),
      contrib AS (
        SELECT day + CAST(k AS INTEGER) AS day, user_id
        FROM du, UNNEST(RANGE(0, 7)) AS t(k))
      SELECT c.day, COUNT(DISTINCT c.user_id) AS users_7d
      FROM contrib c, bounds b
      WHERE c.day BETWEEN b.lo AND b.hi
      GROUP BY c.day
      ORDER BY day
    """)
  ) { t =>
    val du = t.events
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val bounds = du.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    du.select(explode(sequence(lit(0), lit(6))).as("k"), col("day"), col("user_id"))
      .select(date_add(col("day"), col("k")).as("day"), col("user_id"))
      .crossJoin(broadcast(bounds))
      .filter(col("day").between(col("lo"), col("hi")))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("users_7d"))
      .orderBy(col("day"))
  }

  // q79 — telemetry debounce: an event is suppressed when the SAME
  // (user, type) fired within the previous 60 s. One keyed window
  // (partition count grows with users × types — never a global sort),
  // LAG against the raw predecessor, then a per-type survivor rollup.
  val q79 = Q(
    "q79_event_dedup",
    Some("""
      WITH flagged AS (
        SELECT event_type,
               CASE WHEN LAG(ts) OVER w IS NULL
                      OR DATE_DIFF('second', LAG(ts) OVER w, ts) > 60
                    THEN 1 ELSE 0 END AS keep
        FROM events
        WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id))
      SELECT event_type, COUNT(*) AS n_total,
             CAST(SUM(keep) AS BIGINT) AS n_kept,
             CAST(COUNT(*) - SUM(keep) AS BIGINT) AS n_dropped
      FROM flagged
      GROUP BY event_type
      ORDER BY event_type
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val prev = lag(col("ts"), 1).over(w)
    t.events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("keep",
        when(prev.isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(prev) > 60, 1L)
          .otherwise(0L))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_total"),
        sum(col("keep")).cast(LongType).as("n_kept"),
        (count(lit(1)) - sum(col("keep"))).cast(LongType).as("n_dropped"))
      .orderBy(col("event_type"))
  }

  // q91 — ORDER BY ... WITH FILL INTERPOLATE as an operator: the sparse
  // per-type daily series of high-value event sums, densified over each
  // type's own [min_day, max_day] span with LINEAR interpolation between
  // the surrounding present days (the CH INTERPOLATE clause; q77 is the
  // constant-fill sibling). The dense frame is generated from a
  // |types|-row bounds aggregate — its size is span × types, a function
  // of the DIMENSIONS — and the neighbor lookup is two ignore-nulls
  // window passes over that dimension-sized frame, partitioned by type.
  // Interpolation uses the lerp form (vp·(dn−d) + vn·(d−dp)) / (dn−dp):
  // the numerator stays nonnegative, so truncating and flooring integer
  // division agree and both engines produce identical cents.
  val q91 = Q(
    "q91_interpolate",
    Some("""
      WITH e AS (
        SELECT event_type,
               CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE)
                 - DATE '1970-01-01' AS d, value
        FROM events WHERE value >= 250),
      daily AS (
        SELECT event_type, CAST(d AS BIGINT) AS d,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS v
        FROM e GROUP BY event_type, d),
      bounds AS (SELECT event_type, MIN(d) AS d0, MAX(d) AS d1
                 FROM daily GROUP BY event_type),
      cal AS (SELECT b.event_type, CAST(t.i AS BIGINT) AS d
              FROM bounds b, UNNEST(RANGE(b.d0, b.d1 + 1)) AS t(i)),
      j AS (SELECT c.event_type, c.d, daily.v
            FROM cal c LEFT JOIN daily
              ON daily.event_type = c.event_type AND daily.d = c.d),
      nb AS (
        SELECT event_type, d, v,
          LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
          LAST_VALUE(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
            OVER (PARTITION BY event_type ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
          FIRST_VALUE(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY d
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
          FIRST_VALUE(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
            OVER (PARTITION BY event_type ORDER BY d
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
        FROM j)
      SELECT event_type, d,
        CAST(CASE WHEN v IS NOT NULL THEN v
             ELSE (pv * (nd - d) + nv * (d - pd)) // (nd - pd)
             END AS BIGINT) AS value_cents,
        CAST(CASE WHEN v IS NOT NULL THEN 0 ELSE 1 END AS BIGINT) AS filled
      FROM nb ORDER BY event_type, d
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    val daily = t.events.filter(col("value") >= 250)
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast(LongType).as("d"),
        col("value"))
      .groupBy(col("event_type"), col("d"))
      .agg((sum(col("value").cast(DecimalType(18, 2))) * 100)
        .cast(LongType).as("v"))
    val cal = daily.groupBy(col("event_type"))
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(col("event_type"), explode(sequence(col("d0"), col("d1"))).as("d"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val wp = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    cal.join(daily, Seq("event_type", "d"), "left")
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wp))
      .withColumn("pd", last(when(col("v").isNotNull, col("d")), ignoreNulls = true).over(wp))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wn))
      .withColumn("nd", first(when(col("v").isNotNull, col("d")), ignoreNulls = true).over(wn))
      .select(col("event_type"), col("d"),
        when(col("v").isNotNull, col("v"))
          .otherwise(expr("(pv * (nd - d) + nv * (d - pd)) div (nd - pd)"))
          .cast(LongType).as("value_cents"),
        when(col("v").isNotNull, 0L).otherwise(1L).as("filled"))
      .orderBy(col("event_type"), col("d"))
  }

  // q119_heatmap — the (day-of-week × hour) activity matrix every ops
  // dashboard renders: exact counts per cell, dense — the 7×24 scaffold
  // cross-joins two tiny ranges so silent hours surface as explicit
  // zeros — serialized one row per ISO weekday with the 24 hourly
  // counts as the portable CSV vector. Facts pay one two-key
  // aggregation (map-side combinable); weekday numbering pinned to
  // ISO (1=Mon) on both engines.
  val q119 = Q(
    "q119_heatmap",
    Some("""
      WITH cells AS (
        SELECT ISODOW(CAST(ts AS TIMESTAMP)) AS dow,
               HOUR(CAST(ts AS TIMESTAMP)) AS hr,
               COUNT(*) AS n
        FROM events GROUP BY dow, hr),
      scaffold AS (
        SELECT d.dow, h.hr
        FROM UNNEST(RANGE(1, 8)) AS d(dow), UNNEST(RANGE(0, 24)) AS h(hr)),
      dense AS (
        SELECT s.dow, s.hr, COALESCE(c.n, 0) AS n
        FROM scaffold s LEFT JOIN cells c ON c.dow = s.dow AND c.hr = s.hr)
      SELECT CAST(dow AS BIGINT) AS dow,
             array_to_string(LIST(n::VARCHAR ORDER BY hr), ',') AS hourly,
             CAST(SUM(n) AS BIGINT) AS day_total
      FROM dense
      GROUP BY dow
      ORDER BY dow
    """)
  ) { t =>
    val cells = t.events
      .groupBy((weekday(col("ts")) + 1).cast(LongType).as("dow"),
        hour(col("ts")).cast(LongType).as("hr"))
      .agg(count(lit(1)).as("n"))
    val scaffold = t.spark.range(1, 8).select(col("id").as("dow"))
      .crossJoin(t.spark.range(0, 24).select(col("id").as("hr")))
    scaffold
      .join(cells, Seq("dow", "hr"), "left")
      .select(col("dow"), col("hr"), coalesce(col("n"), lit(0L)).as("n"))
      .groupBy(col("dow"))
      .agg(
        concat_ws(",", transform(sort_array(collect_list(struct(col("hr"), col("n")))),
          e => e.getField("n").cast("string"))).as("hourly"),
        sum(col("n")).cast(LongType).as("day_total"))
      .orderBy(col("dow"))
  }

  // q120_session_stats — the rollup READ off q34's sessionization: how
  // long are sessions, how deep, and how many bounce. Same two stacked
  // user-keyed windows build the session relation (|sessions| rows —
  // orders of magnitude smaller than events); the distribution stats
  // then run over that aggregated relation with q21's exact-percentile
  // convention (epsilon + round to step over engine ulp differences at
  // interpolation midpoints). One row out.
  val q120 = Q(
    "q120_session_stats",
    Some("""
      WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
      flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                      OR DATE_DIFF('second', LAG(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS is_start
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sessions AS (
        SELECT user_id,
               CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid,
               ts
        FROM flagged),
      per_session AS (
        SELECT user_id, sid, COUNT(*) AS n_events,
               CAST(DATE_DIFF('second', MIN(ts), MAX(ts)) AS BIGINT) AS dur
        FROM sessions GROUP BY user_id, sid)
      SELECT COUNT(*) AS n_sessions,
             CAST(SUM(n_events) AS BIGINT) AS n_events,
             COUNT(CASE WHEN n_events = 1 THEN 1 END) AS n_bounce,
             ROUND(MEDIAN(dur) + 0.000001, 2) AS p50_duration_sec,
             ROUND(QUANTILE_CONT(dur, 0.9) + 0.000001, 2) AS p90_duration_sec,
             CAST(MAX(dur) AS BIGINT) AS max_duration_sec
      FROM per_session
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("ts"), 1).over(w)
    val perSession = t.events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("is_start",
        when(prev.isNull || unix_timestamp(col("ts")) - unix_timestamp(prev) > 1800, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("is_start")).over(wRun))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"),
        (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
          .cast(LongType).as("dur"))
    perSession.agg(
      count(lit(1)).as("n_sessions"),
      sum(col("n_events")).cast(LongType).as("n_events"),
      count(when(col("n_events") === 1, 1)).as("n_bounce"),
      // domain-bounded percentile: dur is INTEGER seconds capped by
      // session length, so the value→count state is small (see q21/q75
      // for the unbounded-domain alternative on GroupedPrefix)
      percentile(col("dur"), array(lit(0.5), lit(0.9))).as("ps"),
      max(col("dur")).cast(LongType).as("max_duration_sec"))
      .select(col("n_sessions"), col("n_events"), col("n_bounce"),
        round(col("ps").getItem(0) + 0.000001, 2).as("p50_duration_sec"),
        round(col("ps").getItem(1) + 0.000001, 2).as("p90_duration_sec"),
        col("max_duration_sec"))
  }

  // q164 — DAU/MAU stickiness per month: mean daily active users over
  // monthly active users, the engagement ratio every growth dashboard
  // tracks, in exact basis points (Σ daily-distinct × 10000 div
  // (observed_days × monthly-distinct)). Two distinct-aggregations at
  // (month, day) and month grain — both partial-aggregable, both keyed
  // by calendar units so cardinality is bounded by time, not traffic;
  // ts goes through CAST(ts AS TIMESTAMP) (micro truncation) before the
  // day is taken, the §5 nanosecond rule.
  val q164 = Q(
    "q164_stickiness",
    Some("""
      WITH e AS (
        SELECT user_id,
               EXTRACT(YEAR FROM CAST(ts AS TIMESTAMP)) * 12
                 + EXTRACT(MONTH FROM CAST(ts AS TIMESTAMP)) AS ym,
               CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
        FROM events),
      dau AS (SELECT ym, d, COUNT(DISTINCT user_id) AS du FROM e GROUP BY ym, d),
      mau AS (SELECT ym, COUNT(DISTINCT user_id) AS mu FROM e GROUP BY ym),
      ds AS (SELECT ym, SUM(du) AS dau_sum, COUNT(*) AS n_days FROM dau GROUP BY ym)
      SELECT CAST(ds.ym AS BIGINT) AS ym,
             CAST(n_days AS BIGINT) AS n_days,
             CAST(dau_sum AS BIGINT) AS dau_sum,
             CAST(mu AS BIGINT) AS mau,
             CAST(dau_sum * 10000 // (n_days * mu) AS BIGINT) AS stickiness_bp
      FROM ds JOIN mau ON mau.ym = ds.ym
      ORDER BY ym
    """)
  ) { t =>
    val e = t.events.select(col("user_id"),
      (year(col("ts")) * 12 + month(col("ts"))).as("ym"),
      to_date(col("ts")).as("d"))
    val dau = e.groupBy(col("ym"), col("d"))
      .agg(countDistinct(col("user_id")).as("du"))
    val mau = e.groupBy(col("ym"))
      .agg(countDistinct(col("user_id")).as("mu"))
    dau.groupBy(col("ym"))
      .agg(sum(col("du")).as("dau_sum"), count(lit(1)).as("n_days"))
      .join(mau, "ym")
      .select(col("ym").cast(LongType).as("ym"),
        col("n_days").cast(LongType).as("n_days"),
        col("dau_sum").cast(LongType).as("dau_sum"),
        col("mu").cast(LongType).as("mau"),
        expr("dau_sum * 10000 div (n_days * mu)")
          .cast(LongType).as("stickiness_bp"))
      .orderBy(col("ym"))
  }

  val all: Seq[Q] = Seq(q22, q23, q32, q34, q77, q78, q79, q91, q119, q120,
    q164)
}
