package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Scale-mechanics operators: skew-salted joins, heavy hitters (ClickHouse
  * topK), and a bucketed co-located join utility.
  */
object Scale {

  /** Salted inner equi-join for skewed keys: replicate each right-side row
    * `salt` times, scatter left rows uniformly across the salt space, join
    * on (key, salt). Semantically identical to `left.join(right, key)`
    * when `right` has unique keys; turns one hot-key partition into `salt`
    * even partitions. (AQE skew-join handles most cases at runtime; this
    * is the explicit variant for planners that must not rely on it.)
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft.join(saltedRight, Seq(key, "_salt")).drop("_salt")
  }

  // q43 — heavy hitters (ClickHouse topK/topKWeighted, exact form): the
  // most frequent part keys in lineitem with deterministic tie-break.
  // Two-level aggregation: partial counts map-side, then a global top-N
  // via TakeOrderedAndProject — the exact-at-any-scale shape.
  val q43 = Q(
    "q43_topk_values",
    Some("""
      SELECT l_partkey, COUNT(*) AS freq,
             CAST(SUM(l_quantity) AS DOUBLE) AS total_qty
      FROM lineitem
      GROUP BY l_partkey
      ORDER BY freq DESC, l_partkey
      LIMIT 25
    """)
  ) { t =>
    t.lineitem
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("freq"), sum(col("l_quantity")).cast(DoubleType).as("total_qty"))
      .orderBy(col("freq").desc, col("l_partkey"))
      .limit(25)
  }

  // q57 — weighted heavy hitters (ClickHouse topKWeighted, exact form):
  // parts ranked by total shipped quantity rather than row frequency.
  // Weight sums go through DECIMAL (order-independent) before the DOUBLE
  // cast; the ranking weight is the exact decimal so ties cut
  // deterministically. Same two-level shape as q43: partial map-side
  // aggregation, then TakeOrderedAndProject for the global top-N.
  val q57 = Q(
    "q57_topk_weighted",
    Some("""
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(22,2))) AS DOUBLE) AS weight,
             COUNT(*) AS freq
      FROM lineitem
      GROUP BY l_partkey
      ORDER BY SUM(CAST(l_quantity AS DECIMAL(22,2))) DESC, l_partkey
      LIMIT 25
    """)
  ) { t =>
    t.lineitem
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity").cast(DecimalType(22, 2))).as("w_dec"),
        count(lit(1)).as("freq"))
      .orderBy(col("w_dec").desc, col("l_partkey"))
      .limit(25)
      .select(col("l_partkey"), col("w_dec").cast(DoubleType).as("weight"), col("freq"))
  }

  // q44 — salted-join equivalence surface: revenue per order priority via
  // the salted join of orders against lineitem aggregates. The oracle is
  // the plain join — proving the salt transform is semantics-preserving.
  val q44 = Q(
    "q44_salted_join",
    Some("""
      SELECT o_orderpriority,
             CAST(SUM(CAST(l_rev AS DECIMAL(22,4))) AS DOUBLE) AS revenue,
             COUNT(*) AS n_orders
      FROM orders
      JOIN (SELECT l_orderkey,
                   SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4))) AS l_rev
            FROM lineitem GROUP BY l_orderkey) l
        ON o_orderkey = l_orderkey
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """)
  ) { t =>
    val perOrder = t.lineitem
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(22, 4))).as("l_rev"))
    saltedJoin(perOrder, t.orders.select(col("o_orderkey"), col("o_orderpriority")),
      "o_orderkey", salt = 8)
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(col("l_rev").cast(DecimalType(22, 4))).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  // q45 — per-group top-k via the typed bounded-buffer Aggregator
  // (graft.functions.TopKAggregator): partial-aggregable, shuffles ≤ k
  // pairs per group per map task instead of window-sorting every group.
  // Oracle is the window formulation — results must be identical.
  val q45 = Q(
    "q45_topk_agg",
    Some("""
      SELECT o_custkey, o_orderkey, CAST(rn AS BIGINT) AS rnk
      FROM (
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
      WHERE rn <= 3
      ORDER BY o_custkey, rnk
    """)
  ) { t =>
    val topk = udaf(graft.functions.TopKAggregator(3))
    t.orders
      .groupBy(col("o_custkey"))
      .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_custkey"), posexplode(col("top")))
      .select(col("o_custkey"), col("col").getField("_2").as("o_orderkey"),
        (col("pos") + 1).cast(LongType).as("rnk"))
      .orderBy(col("o_custkey"), col("rnk"))
  }

  // q51 — per-group top-k through the full custom-plan ladder: logical
  // TopKPerGroupNode → TopKPerGroupStrategy → two-phase TopKPerGroupExec
  // (partial k-heaps map-side, ≤ k rows/group/partition over the shuffle,
  // final k-heaps after clustering). Oracle: the window formulation.
  val q51 = Q(
    "q51_topk_plan",
    Some("""
      SELECT p_brand, p_partkey, p_retailprice
      FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               ROW_NUMBER() OVER (PARTITION BY p_brand
                                  ORDER BY p_retailprice DESC, p_partkey) AS rn
        FROM part)
      WHERE rn <= 3
      ORDER BY p_brand, p_retailprice DESC, p_partkey
    """)
  ) { t =>
    graft.plans.TopKPerGroup.topK(
        t.part.select(col("p_brand"), col("p_partkey"), col("p_retailprice")),
        groupCols = Seq("p_brand"), orderCol = "p_retailprice",
        tieBreak = "p_partkey", k = 3)
      .orderBy(col("p_brand"), col("p_retailprice").desc, col("p_partkey"))
  }

  /** 16-bit Morton spread: interleave zeros between the low 16 bits so two
    * spread values OR into a Z-order key. Pure integer bit arithmetic —
    * exactly mirrored in the DuckDB oracle.
    */
  private def mortonSpread(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
  }

  private def mortonSpreadSql(e: String): String = {
    var s = s"($e & 65535)"
    s = s"((($s | ($s << 8)) & 16711935))"
    s = s"((($s | ($s << 4)) & 252645135))"
    s = s"((($s | ($s << 2)) & 858993459))"
    s"((($s | ($s << 1)) & 1431655765))"
  }

  // q76 — Z-order (Morton) write layout: the multi-dimensional clustering
  // a 100 TB table needs for data skipping on BOTH (user, day) predicates
  // at once. Rows sort by the interleaved-bit key and pack into
  // fixed-size shards; the report is each shard's extent in both
  // dimensions — the min/max ranges a parquet writer would put in
  // footer statistics, i.e. exactly what a scan prunes on. Narrow
  // per-dimension extents across shards = effective skipping. The oracle
  // replays the identical bit arithmetic.
  //
  // Scale-safe global rank (no single-partition ROW_NUMBER over the fact
  // table): plans.GlobalRank — range-partition + in-partition sort +
  // per-partition prefix-sum offsets, the pipe_shard_plan technique
  // applied to the write path.
  val q76 = Q(
    "q76_zorder_layout",
    Some {
      val zx = mortonSpreadSql("(user_id & 65535)")
      val zy = mortonSpreadSql(
        "(CAST(DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS TIMESTAMP)) AS BIGINT) & 65535)")
      s"""
      WITH keyed AS (
        SELECT user_id,
               CAST(DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS TIMESTAMP)) AS BIGINT) AS d,
               ($zx | ($zy << 1)) AS zkey,
               event_id
        FROM events
      ), sharded AS (
        SELECT user_id, d,
               (ROW_NUMBER() OVER (ORDER BY zkey, event_id) - 1) // 10000 AS shard
        FROM keyed
      )
      SELECT CAST(shard AS BIGINT) AS shard,
             COUNT(*) AS n,
             CAST(MIN(user_id) AS BIGINT) AS u_lo,
             CAST(MAX(user_id) AS BIGINT) AS u_hi,
             CAST(MIN(d) AS BIGINT) AS d_lo,
             CAST(MAX(d) AS BIGINT) AS d_hi
      FROM sharded
      GROUP BY shard
      ORDER BY shard
      """
    }
  ) { t =>
    val keyed = t.events.select(
      col("user_id"),
      datediff(to_date(col("ts")), lit("1970-01-01")).cast(LongType).as("d"),
      col("event_id"))
      .withColumn("zkey",
        mortonSpread(col("user_id"))
          .bitwiseOR(shiftleft(mortonSpread(col("d")), 1)))
    graft.plans.GlobalRank
      .withRowNumber(keyed, Seq(col("zkey"), col("event_id")), 32, "rn")
      .withColumn("shard", expr("CAST((rn - 1) DIV 10000 AS BIGINT)"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n"),
        min(col("user_id")).cast(LongType).as("u_lo"),
        max(col("user_id")).cast(LongType).as("u_hi"),
        min(col("d")).cast(LongType).as("d_lo"),
        max(col("d")).cast(LongType).as("d_hi"))
      .orderBy(col("shard"))
  }

  // q81_key_sample — ClickHouse `SAMPLE BY intHash(key)` analog plus its
  // accuracy audit: a deterministic 1-in-8 slice of the USER key space
  // (not of rows — every sampled user keeps ALL their events, so
  // per-user sequences like funnels/sessions stay intact inside the
  // sample, which per-row sampling like q39 destroys). The sample
  // predicate is a pure function of user_id, so at 100 TB it pushes to
  // the scan and — on a table physically SAMPLE-BY-clustered like
  // ClickHouse's — prunes 7/8 of granules before reading them. The audit
  // half scans once and reports ×8-scaled estimates against truth per
  // event_type (events and distinct users), in integer basis points:
  // the evidence a team needs before trusting sampled dashboards.
  val q81 = {
    val (a0, b0, p) = (graft.functions.PortableHash.coefA(0),
      graft.functions.PortableHash.coefB(0), graft.functions.PortableHash.P)
    val sampledSql = s"(($a0 * user_id + $b0) % $p) % 8 = 0"
    Q(
      "q81_key_sample",
      Some(s"""
        WITH g AS (
          SELECT event_type,
                 COUNT(*) AS actual_events,
                 COUNT(DISTINCT user_id) AS actual_users,
                 COUNT(CASE WHEN $sampledSql THEN 1 END) AS sample_events,
                 COUNT(DISTINCT CASE WHEN $sampledSql THEN user_id END) AS sample_users
          FROM events
          GROUP BY event_type)
        SELECT event_type,
               CAST(sample_events AS BIGINT) AS sample_events,
               CAST(sample_users AS BIGINT) AS sample_users,
               CAST(sample_events * 8 AS BIGINT) AS est_events,
               CAST(actual_events AS BIGINT) AS actual_events,
               CAST(ABS(sample_events * 8 - actual_events) * 10000 // actual_events
                    AS BIGINT) AS err_bp
        FROM g
        ORDER BY event_type
      """)
    ) { t =>
      val sampled = expr(s"(($a0 * user_id + $b0) % $p) % 8 = 0")
      t.events
        .groupBy(col("event_type"))
        .agg(
          count(when(sampled, lit(1))).as("sample_events"),
          countDistinct(when(sampled, col("user_id"))).as("sample_users"),
          count(lit(1)).as("actual_events"),
          countDistinct(col("user_id")).as("actual_users"))
        .select(col("event_type"),
          col("sample_events"), col("sample_users"),
          (col("sample_events") * 8).as("est_events"),
          col("actual_events"),
          expr("abs(sample_events * 8 - actual_events) * 10000 div actual_events")
            .as("err_bp"))
        .orderBy(col("event_type"))
    }
  }

  // q83_skip_index — the data-skipping audit that justifies q76's z-order
  // layout: lay events into 1000-row granules in Morton (user, day) order,
  // collect each granule's minmax extents (exactly the per-granule
  // metadata a MergeTree skip index / parquet row-group footer stores),
  // then evaluate a two-dimensional predicate (user_id 32..47 AND day
  // 2024-01-08..2024-01-15) against the extents alone. `can_skip` = the
  // extent test proves the granule empty of matches; `n_match` = the true
  // match count, so the report itself verifies the pruning is sound
  // (skip ⇒ 0 matches) and measures its power (fraction of granules
  // skipped). On a linear time-ordered layout the user dimension prunes
  // nothing; interleaving makes BOTH predicates prune — the reason a
  // 100 TB table pays the one-time z-order write. Granule ranks come from
  // plans.GlobalRank (range partition + prefix-sum offsets), not a
  // single-partition window.
  val q83 = Q(
    "q83_skip_index",
    Some {
      val zx = mortonSpreadSql("(user_id & 65535)")
      val zy = mortonSpreadSql(
        "(CAST(DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS TIMESTAMP)) AS BIGINT) & 65535)")
      s"""
      WITH keyed AS (
        SELECT user_id,
               CAST(DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS TIMESTAMP)) AS BIGINT) AS d,
               ($zx | ($zy << 1)) AS zkey,
               event_id
        FROM events
      ), sharded AS (
        SELECT user_id, d,
               (ROW_NUMBER() OVER (ORDER BY zkey, event_id) - 1) // 1000 AS granule
        FROM keyed
      ), ext AS (
        SELECT granule, COUNT(*) AS n,
               MIN(user_id) AS u_lo, MAX(user_id) AS u_hi,
               MIN(d) AS d_lo, MAX(d) AS d_hi,
               COUNT(CASE WHEN user_id BETWEEN 32 AND 47
                           AND d BETWEEN 19730 AND 19737 THEN 1 END) AS n_match
        FROM sharded GROUP BY granule)
      SELECT CAST(granule AS BIGINT) AS granule,
             CAST(n AS BIGINT) AS n,
             CAST(u_lo AS BIGINT) AS u_lo, CAST(u_hi AS BIGINT) AS u_hi,
             CAST(d_lo AS BIGINT) AS d_lo, CAST(d_hi AS BIGINT) AS d_hi,
             CAST(CASE WHEN u_hi < 32 OR u_lo > 47 OR d_hi < 19730 OR d_lo > 19737
                       THEN 1 ELSE 0 END AS BIGINT) AS can_skip,
             CAST(n_match AS BIGINT) AS n_match
      FROM ext
      ORDER BY granule
      """
    }
  ) { t =>
    val keyed = t.events.select(
      col("user_id"),
      datediff(to_date(col("ts")), lit("1970-01-01")).cast(LongType).as("d"),
      col("event_id"))
      .withColumn("zkey",
        mortonSpread(col("user_id"))
          .bitwiseOR(shiftleft(mortonSpread(col("d")), 1)))
    val inPred = col("user_id").between(32, 47) && col("d").between(19730L, 19737L)
    graft.plans.GlobalRank
      .withRowNumber(keyed, Seq(col("zkey"), col("event_id")), 32, "rn")
      .withColumn("granule", expr("CAST((rn - 1) DIV 1000 AS BIGINT)"))
      .groupBy(col("granule"))
      .agg(
        count(lit(1)).as("n"),
        min(col("user_id")).cast(LongType).as("u_lo"),
        max(col("user_id")).cast(LongType).as("u_hi"),
        min(col("d")).cast(LongType).as("d_lo"),
        max(col("d")).cast(LongType).as("d_hi"),
        count(when(inPred, lit(1))).as("n_match"))
      .select(col("granule"), col("n"), col("u_lo"), col("u_hi"),
        col("d_lo"), col("d_hi"),
        when(col("u_hi") < 32 || col("u_lo") > 47 ||
          col("d_hi") < 19730L || col("d_lo") > 19737L, 1L).otherwise(0L)
          .as("can_skip"),
        col("n_match"))
      .orderBy(col("granule"))
  }

  // q85_projection_audit — ClickHouse "projections" decided with data:
  // the same fact table stored in three physical orders (day-sorted,
  // user-sorted, z-order) and, for each of three predicates (day range,
  // user range, both), how many 1000-row granules and rows each layout
  // actually has to read, judged ONLY by per-granule minmax extents —
  // the exact information a projection/materialized-ordering optimizer
  // has at plan time. rows_matched is layout-invariant (a built-in
  // consistency check); rows_scanned is the winner's evidence: each
  // single-dimension sort dominates its own predicate and collapses on
  // the other, z-order is the compromise that prunes on both. This is
  // the 100 TB decision report for "which second sort order is worth
  // storing" — granule ranks from plans.GlobalRank, never a
  // single-partition window, ×3 layouts = 3 range shuffles of a
  // 3-column projection of the facts.
  val q85 = Q(
    "q85_projection_audit",
    Some {
      val zx = mortonSpreadSql("(user_id & 65535)")
      val zy = mortonSpreadSql("(d & 65535)")
      val layouts = Seq(
        "day_sorted" -> "d", "user_sorted" -> "user_id",
        "zorder" -> s"($zx | ($zy << 1))")
      val perLayout = layouts.map { case (name, ord) =>
        s"""${name}_sh AS (
        SELECT user_id, d,
               (ROW_NUMBER() OVER (ORDER BY $ord, event_id) - 1) // 1000 AS granule
        FROM keyed),
      ${name}_ext AS (
        SELECT granule, COUNT(*) AS n,
               MIN(user_id) AS u_lo, MAX(user_id) AS u_hi,
               MIN(d) AS d_lo, MAX(d) AS d_hi,
               COUNT(CASE WHEN d BETWEEN 19730 AND 19737 THEN 1 END) AS m_day,
               COUNT(CASE WHEN user_id BETWEEN 32 AND 47 THEN 1 END) AS m_user,
               COUNT(CASE WHEN d BETWEEN 19730 AND 19737
                           AND user_id BETWEEN 32 AND 47 THEN 1 END) AS m_both
        FROM ${name}_sh GROUP BY granule)"""
      }.mkString(",\n      ")
      val preds = Seq(
        ("p_day", "d_hi >= 19730 AND d_lo <= 19737", "m_day"),
        ("p_user", "u_hi >= 32 AND u_lo <= 47", "m_user"),
        ("p_both", "d_hi >= 19730 AND d_lo <= 19737 AND u_hi >= 32 AND u_lo <= 47",
          "m_both"))
      val branches = layouts.flatMap { case (name, _) =>
        preds.map { case (pname, hit, m) =>
          s"""SELECT '$name' AS layout, '$pname' AS predicate,
               CAST(COUNT(*) AS BIGINT) AS granules_total,
               CAST(COUNT(CASE WHEN $hit THEN 1 END) AS BIGINT) AS granules_scanned,
               CAST(COALESCE(SUM(CASE WHEN $hit THEN n ELSE 0 END), 0) AS BIGINT) AS rows_scanned,
               CAST(COALESCE(SUM($m), 0) AS BIGINT) AS rows_matched
          FROM ${name}_ext"""
        }
      }.mkString("\n      UNION ALL\n      ")
      s"""
      WITH keyed AS (
        SELECT user_id,
               CAST(DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS TIMESTAMP)) AS BIGINT) AS d,
               event_id
        FROM events),
      $perLayout
      $branches
      ORDER BY layout, predicate
      """
    }
  ) { t =>
    val keyed = t.events.select(
      col("user_id"),
      datediff(to_date(col("ts")), lit("1970-01-01")).cast(LongType).as("d"),
      col("event_id"))
    val pDay = col("d").between(19730L, 19737L)
    val pUser = col("user_id").between(32L, 47L)
    val hitDay = col("d_hi") >= 19730L && col("d_lo") <= 19737L
    val hitUser = col("u_hi") >= 32L && col("u_lo") <= 47L
    def audit(layout: String, sortKey: Column): DataFrame = {
      val ext = graft.plans.GlobalRank
        .withRowNumber(keyed, Seq(sortKey, col("event_id")), 32, "rn")
        .withColumn("granule", expr("(rn - 1) DIV 1000"))
        .groupBy(col("granule"))
        .agg(count(lit(1)).as("n"),
          min(col("user_id")).cast(LongType).as("u_lo"),
          max(col("user_id")).cast(LongType).as("u_hi"),
          min(col("d")).as("d_lo"), max(col("d")).as("d_hi"),
          count(when(pDay, lit(1))).as("m_day"),
          count(when(pUser, lit(1))).as("m_user"),
          count(when(pDay && pUser, lit(1))).as("m_both"))
      val one = ext.agg(
        count(lit(1)).as("g_total"),
        count(when(hitDay, lit(1))).as("gs_day"),
        sum(when(hitDay, col("n")).otherwise(0L)).as("rs_day"),
        sum(col("m_day")).as("rm_day"),
        count(when(hitUser, lit(1))).as("gs_user"),
        sum(when(hitUser, col("n")).otherwise(0L)).as("rs_user"),
        sum(col("m_user")).as("rm_user"),
        count(when(hitDay && hitUser, lit(1))).as("gs_both"),
        sum(when(hitDay && hitUser, col("n")).otherwise(0L)).as("rs_both"),
        sum(col("m_both")).as("rm_both"))
      Seq(("p_day", "gs_day", "rs_day", "rm_day"),
        ("p_user", "gs_user", "rs_user", "rm_user"),
        ("p_both", "gs_both", "rs_both", "rm_both")).map { case (p, gs, rs, rm) =>
        one.select(lit(layout).as("layout"), lit(p).as("predicate"),
          col("g_total").cast(LongType).as("granules_total"),
          col(gs).cast(LongType).as("granules_scanned"),
          coalesce(col(rs), lit(0L)).cast(LongType).as("rows_scanned"),
          coalesce(col(rm), lit(0L)).cast(LongType).as("rows_matched"))
      }.reduce(_ unionAll _)
    }
    val zkey = mortonSpread(col("user_id"))
      .bitwiseOR(shiftleft(mortonSpread(col("d")), 1))
    audit("day_sorted", col("d"))
      .unionAll(audit("user_sorted", col("user_id")))
      .unionAll(audit("zorder", zkey))
      .orderBy(col("layout"), col("predicate"))
  }

  /** Delete a STALE warehouse directory a DEAD session left for `name`
    * (live catalog entries are never touched) — the same rerun-stability
    * rule the CH dialect's CREATE paths apply.
    */
  private def clearStale(spark: org.apache.spark.sql.SparkSession,
    name: String): Unit =
    if (!spark.catalog.tableExists(name))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name))

  /** Fact-size-derived bucket count: the smallest power of two with an
    * expected per-bucket population ≤ ~2M fact rows (a few hundred MB
    * of parquet — one healthy scan task), clamped [8, 4096]; the same
    * integer bit-length arithmetic as Ann.cellsFor, so no FP log
    * boundary to drift on. At sf0.1 this is 8 (the previously
    * hard-coded demo constant); at 100 TB it grows with the data so a
    * bucket never outgrows an executor.
    */
  private[graft] def bucketsFor(n: Long): Int = {
    val m = (n + 1999999) / 2000000
    val bits = if (m <= 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1)
    math.min(4096L, math.max(8L, 1L << bits)).toInt
  }

  /** Session-memoized BUCKETED copies of lineitem and orders,
    * co-bucketed and sorted on the order key — Spark's co-located-join
    * layout: both sides pre-hash into matching buckets at WRITE time,
    * so an equi-join on the bucket key needs NO exchange at read time.
    * At 100 TB this is the difference between re-shuffling the fact
    * table on every join and never shuffling it; the write cost
    * amortizes across every downstream join on the key.
    *
    * LAYOUT CONTRACT: the bucket count must match on both sides or the
    * join degrades to a shuffled one — both writes here derive it from
    * the same fact count, and a production layout must version the
    * count alongside the tables (see docs/MIGRATION.md §bucketing).
    */
  private def bucketedPair(t: Tables): (DataFrame, DataFrame) = synchronized {
    val spark = t.spark
    val tag = java.lang.Long.toHexString(
      t.dir.hashCode.toLong & 0xffffffffL)
    val ln = s"graft_bkt_lineitem_$tag"
    val on = s"graft_bkt_orders_$tag"
    // bucket count of an already-written side, from catalog metadata —
    // if one table survives from a prior session (data grew, or a crash
    // landed between the two writes), deriving a FRESH count from the
    // current fact size could mismatch it and the no-exchange join would
    // silently degrade to a shuffle; the survivor's count wins
    def existingBuckets(name: String): Option[Int] =
      if (!spark.catalog.tableExists(name)) None
      else spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(name))
        .bucketSpec.map(_.numBuckets)
    if (!spark.catalog.tableExists(ln) || !spark.catalog.tableExists(on)) {
      // one count drives BOTH sides (the contract above); parquet
      // row-group metadata makes the fresh-count pass footer-only
      val nBuckets = existingBuckets(ln).orElse(existingBuckets(on))
        .getOrElse(bucketsFor(t.lineitem.count()))
      if (!spark.catalog.tableExists(ln)) {
        clearStale(spark, ln)
        t.lineitem
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
          .write.bucketBy(nBuckets, "l_orderkey").sortBy("l_orderkey")
          .format("parquet").saveAsTable(ln)
      }
      if (!spark.catalog.tableExists(on)) {
        clearStale(spark, on)
        t.orders.select(col("o_orderkey"), col("o_orderstatus"))
          .write.bucketBy(nBuckets, "o_orderkey").sortBy("o_orderkey")
          .format("parquet").saveAsTable(on)
      }
    }
    (spark.table(ln), spark.table(on))
  }

  // q143 — the bucketed co-located join (SURVEY §4's stated layout
  // lever, exercised end to end): lineitem ⋈ orders on the order key
  // over the 8-bucket sorted tables — the MERGE hint keeps the join
  // sort-merge (a broadcast would also skip the shuffle but would not
  // prove the layout), and the bucketed scans feed it with ZERO
  // exchange on either side (PlanShapeSpec pins ≤ 2 exchanges total:
  // the aggregation and the output sort — the join itself moves no
  // rows). Values are the q03 revenue arithmetic, oracle-checked from
  // the raw tables.
  val q143 = Q(
    "q143_bucketed_join",
    Some("""
      SELECT o.o_orderstatus,
             COUNT(*) AS n_items,
             CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
               AS DECIMAL(22,4))) AS DOUBLE) AS revenue
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderstatus
      ORDER BY o.o_orderstatus
    """)
  ) { t =>
    val (l, o) = bucketedPair(t)
    l.hint("merge").join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(22, 4))).cast(DoubleType).as("revenue"))
      .orderBy(col("o_orderstatus"))
  }

  val all: Seq[Q] = Seq(q43, q44, q45, q51, q57, q76, q81, q83, q85, q143)
}
