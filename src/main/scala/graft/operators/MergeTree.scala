package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** ClickHouse MergeTree-family table semantics as relational plans: what
  * a ReplacingMergeTree / CollapsingMergeTree table returns under
  * `SELECT ... FINAL`, computed over the events stream. ClickHouse folds
  * these rules into background merges; Spark expresses the same
  * end-state declaratively — one window or aggregation per table, which
  * is also the 100 TB shape (state per sort key, never a full-table
  * collapse on the driver).
  *
  * events.ts carries nanosecond precision and Spark truncates to micros,
  * so version comparisons use a (ts, event_id) tuple and outputs carry
  * event_id checksums, never raw timestamps.
  */
object MergeTree {

  // q59_replacing — ReplacingMergeTree(ver) FINAL: one surviving row per
  // sort key (user_id, event_type), the one with the highest version
  // (latest ts, event_id tie-break). The upsert-table semantic: a stream
  // of state updates reads as current state. One window shuffle on the
  // sort key; survivors aggregate per event_type to keep output bounded.
  val replacing = Q(
    "q59_replacing",
    Some("""
      WITH ranked AS (
        SELECT event_type, user_id, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        FROM events),
      final AS (SELECT * FROM ranked WHERE rn = 1)
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(event_id) AS BIGINT) AS id_checksum,
             CAST(SUM(CAST(value AS DECIMAL(18, 2))) AS DOUBLE) AS total_value
      FROM final
      GROUP BY event_type
      ORDER BY event_type
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    t.events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("event_id")).cast(LongType).as("id_checksum"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total_value"))
      .orderBy(col("event_type"))
  }

  // q60_collapsing — CollapsingMergeTree(sign) FINAL: +1 rows insert
  // state, -1 rows cancel it; a key survives iff its sign sum is
  // positive, and the surviving state is the latest +1 row. Signs derive
  // deterministically from event_id (every third event cancels), so both
  // engines build the identical signed stream. One aggregation on the
  // sort key (sign sum + argmax in the same pass — no second scan), then
  // a bounded per-type rollup.
  val collapsing = Q(
    "q60_collapsing",
    Some("""
      WITH signed AS (
        SELECT user_id, event_type, event_id, value,
               CASE WHEN event_id % 3 = 0 THEN -1 ELSE 1 END AS sign,
               ts
        FROM events),
      sign_sums AS (
        SELECT user_id, event_type, SUM(sign) AS sign_sum
        FROM signed
        GROUP BY user_id, event_type),
      last_plus AS (
        SELECT user_id, event_type, event_id AS last_plus_id, value AS last_plus_value
        FROM (SELECT user_id, event_type, event_id, value,
                     ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                        ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
              FROM signed WHERE sign = 1)
        WHERE rn = 1),
      final AS (
        SELECT s.user_id, s.event_type, p.last_plus_id, p.last_plus_value
        FROM sign_sums s
        JOIN last_plus p ON s.user_id = p.user_id AND s.event_type = p.event_type
        WHERE s.sign_sum > 0)
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(last_plus_id) AS BIGINT) AS id_checksum,
             CAST(SUM(CAST(last_plus_value AS DECIMAL(18, 2))) AS DOUBLE) AS total_value
      FROM final
      GROUP BY event_type
      ORDER BY event_type
    """)
  ) { t =>
    val signed = t.events.select(
      col("user_id"), col("event_type"), col("event_id"), col("value"), col("ts"),
      when(col("event_id") % 3 === 0, -1).otherwise(1).as("sign"))
    signed
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        sum(col("sign")).as("sign_sum"),
        max_by(when(col("sign") === 1, col("event_id")),
          when(col("sign") === 1, struct(col("ts"), col("event_id")))).as("last_plus_id"),
        max_by(when(col("sign") === 1, col("value")),
          when(col("sign") === 1, struct(col("ts"), col("event_id")))).as("last_plus_value"))
      .filter(col("sign_sum") > 0 && col("last_plus_id").isNotNull)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("last_plus_id")).cast(LongType).as("id_checksum"),
        sum(col("last_plus_value").cast(DecimalType(18, 2))).cast(DoubleType).as("total_value"))
      .orderBy(col("event_type"))
  }

  // q61_agg_state — AggregatingMergeTree / -State+-Merge combinators: a
  // materialized view stores REAGGREGATABLE partial states per fine key
  // (day × type), and readers -Merge them up to any coarser grouping
  // without touching raw rows. The states here are (count, sum, min,
  // max) structs — count/sum merge by +, min/max by min/max — exactly
  // the algebraic-state discipline that makes pre-aggregation correct.
  // At 100 TB this is THE pattern: the daily state table is |days ×
  // types| rows; every rollup reads it, never the events table. Sums
  // run in DECIMAL so the two-level and one-level paths agree exactly.
  val aggState = Q(
    "q61_agg_state",
    Some("""
      WITH states AS (
        SELECT DATE_TRUNC('day', ts) AS day, event_type,
               COUNT(*) AS cnt_state,
               SUM(CAST(value AS DECIMAL(18, 2))) AS sum_state,
               MIN(CAST(value AS DECIMAL(18, 2))) AS min_state,
               MAX(CAST(value AS DECIMAL(18, 2))) AS max_state
        FROM events
        GROUP BY 1, 2),
      merged AS (
        SELECT event_type,
               SUM(cnt_state) AS n,
               SUM(sum_state) AS total,
               MIN(min_state) AS vmin,
               MAX(max_state) AS vmax,
               COUNT(*) AS n_states
        FROM states
        GROUP BY event_type)
      SELECT event_type,
             CAST(n AS BIGINT) AS n,
             CAST(total AS DOUBLE) AS total,
             CAST(vmin AS DOUBLE) AS vmin,
             CAST(vmax AS DOUBLE) AS vmax,
             CAST(n_states AS BIGINT) AS n_states
      FROM merged
      ORDER BY event_type
    """)
  ) { t =>
    val states = t.events
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(
        count(lit(1)).as("cnt_state"),
        sum(col("value").cast(DecimalType(18, 2))).as("sum_state"),
        min(col("value").cast(DecimalType(18, 2))).as("min_state"),
        max(col("value").cast(DecimalType(18, 2))).as("max_state"))
    states
      .groupBy(col("event_type"))
      .agg(
        sum(col("cnt_state")).cast(LongType).as("n"),
        sum(col("sum_state")).cast(DoubleType).as("total"),
        min(col("min_state")).cast(DoubleType).as("vmin"),
        max(col("max_state")).cast(DoubleType).as("vmax"),
        count(lit(1)).as("n_states"))
      .orderBy(col("event_type"))
  }

  // q62_summing — SummingMergeTree FINAL: rows sharing a sort key merge
  // by SUMMING the numeric measures (value) and keeping the count — the
  // pre-aggregated counter-table read (ClickHouse's cheapest
  // materialized-rollup engine). Distinct from q61's -State pattern:
  // summing collapses to ONE row per sort key with plain sums, no
  // reaggregatable min/max states. One aggregation on the sort key,
  // then a bounded per-type rollup proving the collapsed table still
  // answers the original queries.
  val summing = Q(
    "q62_summing",
    Some("""
      WITH collapsed AS (
        SELECT user_id, event_type,
               SUM(CAST(value AS DECIMAL(18, 2))) AS value_sum,
               COUNT(*) AS n_merged
        FROM events
        GROUP BY user_id, event_type)
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(n_merged) AS BIGINT) AS n_source_rows,
             CAST(SUM(value_sum) AS DOUBLE) AS total_value,
             CAST(MAX(n_merged) AS BIGINT) AS max_merged
      FROM collapsed
      GROUP BY event_type
      ORDER BY event_type
    """)
  ) { t =>
    t.events
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        sum(col("value").cast(DecimalType(18, 2))).as("value_sum"),
        count(lit(1)).as("n_merged"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("n_merged")).cast(LongType).as("n_source_rows"),
        sum(col("value_sum")).cast(DoubleType).as("total_value"),
        max(col("n_merged")).cast(LongType).as("max_merged"))
      .orderBy(col("event_type"))
  }

  // q82_versioned_collapsing — VersionedCollapsingMergeTree(sign, version)
  // FINAL: unlike plain Collapsing (q60), where a -1 cancels the LATEST
  // +1 and out-of-order inserts corrupt state, a -1 cancels exactly the
  // +1 carrying the SAME version — safe under arbitrary arrival order.
  // The writer protocol is replayed from events: each event is a state
  // update for its (user_id, event_type) key, written as cancel-previous
  // (-1, k-1) + insert-new (+1, k), k = the per-key update sequence. The
  // FINAL read is then pure aggregation: group rows by (key, version),
  // a zero sign-sum is a cancelled pair, the surviving +1 with the max
  // version is current state. Both the per-key sequencing window and the
  // cancellation groupBy partition on the high-cardinality key — state
  // per sort key, no global ordering anywhere, the same shape ClickHouse
  // merges rely on at 100 TB.
  val versioned = Q(
    "q82_versioned_collapsing",
    Some("""
      WITH seqd AS (
        SELECT user_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY CAST(ts AS TIMESTAMP), event_id) AS k
        FROM events),
      writes AS (
        SELECT user_id, event_type, 1 AS sign, k AS version, value FROM seqd
        UNION ALL
        SELECT user_id, event_type, -1 AS sign, k - 1 AS version, value
        FROM seqd WHERE k > 1),
      grp AS (
        SELECT user_id, event_type, version,
               SUM(sign) AS ssum, COUNT(*) AS cnt,
               MAX(CASE WHEN sign = 1 THEN value END) AS plus_value
        FROM writes
        GROUP BY user_id, event_type, version),
      finals AS (
        SELECT user_id, event_type,
               MAX_BY(plus_value, version) AS final_value
        FROM grp WHERE ssum = 1
        GROUP BY user_id, event_type),
      per_key AS (
        SELECT user_id, event_type,
               SUM(cnt) AS writes,
               SUM(CASE WHEN ssum = 0 AND cnt = 2 THEN 1 ELSE 0 END) AS cancelled
        FROM grp
        GROUP BY user_id, event_type)
      SELECT p.event_type,
             CAST(SUM(p.writes) AS BIGINT) AS n_writes,
             CAST(SUM(p.cancelled) AS BIGINT) AS n_cancelled_pairs,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(CAST(f.final_value AS DECIMAL(18, 2))) AS DOUBLE)
               AS total_final_value
      FROM per_key p
      LEFT JOIN finals f USING (user_id, event_type)
      GROUP BY p.event_type
      ORDER BY p.event_type
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val seqd = t.events
      .select(col("user_id"), col("event_type"), col("value"), col("ts"),
        col("event_id"))
      .withColumn("k", row_number().over(w).cast(LongType))
    val writes = seqd
      .select(col("user_id"), col("event_type"), lit(1L).as("sign"),
        col("k").as("version"), col("value"))
      .unionAll(seqd.filter(col("k") > 1L)
        .select(col("user_id"), col("event_type"), lit(-1L).as("sign"),
          (col("k") - 1L).as("version"), col("value")))
    val grp = writes
      .groupBy(col("user_id"), col("event_type"), col("version"))
      .agg(sum(col("sign")).as("ssum"), count(lit(1)).as("cnt"),
        max(when(col("sign") === 1L, col("value"))).as("plus_value"))
    val finals = grp.filter(col("ssum") === 1L)
      .groupBy(col("user_id"), col("event_type"))
      .agg(max_by(col("plus_value"), col("version")).as("final_value"))
    val perKey = grp
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("cnt")).as("writes"),
        sum(when(col("ssum") === 0L && col("cnt") === 2L, 1L).otherwise(0L))
          .as("cancelled"))
      .join(finals, Seq("user_id", "event_type"), "left")
    perKey
      .groupBy(col("event_type"))
      .agg(
        sum(col("writes")).cast(LongType).as("n_writes"),
        sum(col("cancelled")).cast(LongType).as("n_cancelled_pairs"),
        count(lit(1)).as("n_keys"),
        sum(col("final_value").cast(DecimalType(18, 2))).cast(DoubleType)
          .as("total_final_value"))
      .orderBy(col("event_type"))
  }

  // q84_ttl_expiry — MergeTree TTL semantics, both policies at once:
  // `TTL ts + INTERVAL 14 DAY DELETE` drops expired detail rows, and
  // `TTL … GROUP BY day, type SET value = sum(value)` (the downsampling
  // variant) collapses them into per-day aggregates instead — old data
  // gets coarser, not gone. The reference clock is the table's own
  // max(ts) (deterministic; production would use now()). The report per
  // type shows what each policy retains: live detail rows + value, and
  // the expired mass as (rollup rows, preserved value) — rollup value
  // must equal expired value exactly, which the DECIMAL sums prove. One
  // scan: the 1-row max-day aggregate broadcasts back (scalar subquery),
  // then conditional aggregation — at 100 TB TTL is a partition-drop /
  // partition-rewrite decided by exactly these per-granule day extents.
  val ttlExpiry = Q(
    "q84_ttl_expiry",
    Some("""
      WITH d AS (
        SELECT event_type, value,
               CAST(DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS TIMESTAMP)) AS BIGINT) AS d
        FROM events),
      cut AS (SELECT MAX(d) - 14 AS cutoff FROM d)
      SELECT event_type,
             CAST(COUNT(CASE WHEN d.d > cut.cutoff THEN 1 END) AS BIGINT) AS n_live,
             CAST(COUNT(CASE WHEN d.d <= cut.cutoff THEN 1 END) AS BIGINT) AS n_expired,
             CAST(COUNT(DISTINCT CASE WHEN d.d <= cut.cutoff THEN d.d END) AS BIGINT)
               AS n_rollup_rows,
             CAST(SUM(CASE WHEN d.d > cut.cutoff
                           THEN CAST(value AS DECIMAL(18, 2)) ELSE 0 END) AS DOUBLE)
               AS live_value,
             CAST(SUM(CASE WHEN d.d <= cut.cutoff
                           THEN CAST(value AS DECIMAL(18, 2)) ELSE 0 END) AS DOUBLE)
               AS rollup_value
      FROM d, cut
      GROUP BY event_type
      ORDER BY event_type
    """)
  ) { t =>
    val d = t.events.select(col("event_type"), col("value"),
      datediff(to_date(col("ts")), lit("1970-01-01")).cast(LongType).as("d"))
    val cut = d.agg((max(col("d")) - 14L).as("cutoff"))
    val expired = col("d") <= col("cutoff")
    d.crossJoin(broadcast(cut))
      .groupBy(col("event_type"))
      .agg(
        count(when(!expired, lit(1))).as("n_live"),
        count(when(expired, lit(1))).as("n_expired"),
        countDistinct(when(expired, col("d"))).as("n_rollup_rows"),
        sum(when(!expired, col("value").cast(DecimalType(18, 2)))
          .otherwise(lit(0).cast(DecimalType(18, 2)))).cast(DoubleType)
          .as("live_value"),
        sum(when(expired, col("value").cast(DecimalType(18, 2)))
          .otherwise(lit(0).cast(DecimalType(18, 2)))).cast(DoubleType)
          .as("rollup_value"))
      .orderBy(col("event_type"))
  }

  val all: Seq[Q] = Seq(replacing, collapsing, aggState, summing, versioned,
    ttlExpiry)
}
