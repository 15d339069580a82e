package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
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
    // All three points from ONE GroupedPrefix staged sort (covering-
    // slice rank selection, bit-identical to percentile()'s
    // interpolation) — never percentile()'s per-group value→count map,
    // whose merge concentrates distinct-PRICE-sized state on one
    // reducer per enum group (the 100 TB cliff; integer-domain
    // quantiles like q100/q64 keep the histogram form because their
    // state is bounded by the value domain, prices are not). The +1e-6
    // epsilon before rounding moves interpolated midpoints of 2-decimal
    // prices off the exact ROUND half-boundary (x.xx5), where a 1-ulp
    // difference between the engines' interpolation arithmetic would
    // otherwise flip the cent.
    import graft.plans.GroupedPrefix
    val ps = GroupedPrefix.exactQuantiles(
      t.lineitem.select(col("l_returnflag"), col("l_extendedprice")),
      Seq("l_returnflag"), col("l_extendedprice"),
      Seq(0.5, 0.9, 0.99), "ps")
    val mm = t.lineitem.groupBy(col("l_returnflag"))
      .agg(min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
    ps.join(broadcast(mm), Seq("l_returnflag"))
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

  // q55 — exact bitmap distinct (ClickHouse groupBitmap): the typed
  // BitmapDistinct Aggregator ships one sparse bitmap per map task instead
  // of the id multiset — exact (unlike q37's HLL) and partial-aggregable.
  // The oracle is plain COUNT(DISTINCT): the aggregator must reproduce it
  // bit-for-bit.
  val q55 = Q(
    "q55_bitmap_distinct",
    Some("""
      SELECT event_type,
             COUNT(DISTINCT user_id) AS bitmap_users,
             COUNT(*) AS n_events
      FROM events
      GROUP BY event_type
      ORDER BY event_type
    """)
  ) { t =>
    val bitmap = udaf(graft.functions.BitmapDistinct())
    t.events
      .groupBy(col("event_type"))
      .agg(bitmap(col("user_id")).as("bitmap_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))
  }

  // q56 — sumMap (ClickHouse sumMap/maxMap family): per event_type, sum
  // `value` and count occurrences for every distinct props key, emitting
  // the per-key map as sorted parallel CSV strings (map columns don't
  // hash portably across engines; the serialized form does). Two partial
  // aggregations — key-level then group-level — both map-side combining.
  val q56 = Q(
    "q56_summap",
    Some("""
      WITH kv0 AS (
        SELECT event_type,
               TRY_CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k,
               value
        FROM events),
      kv AS (SELECT * FROM kv0 WHERE k IS NOT NULL),
      per_key AS (
        SELECT event_type, k,
               CAST(SUM(CAST(value AS DECIMAL(38,2))) AS DECIMAL(38,2)) AS s,
               COUNT(*) AS c
        FROM kv
        GROUP BY event_type, k)
      SELECT event_type,
             array_to_string(LIST(k::VARCHAR ORDER BY k), ',') AS map_keys,
             array_to_string(LIST(s::VARCHAR ORDER BY k), ',') AS map_sums,
             array_to_string(LIST(c::VARCHAR ORDER BY k), ',') AS map_counts
      FROM per_key
      GROUP BY event_type
      ORDER BY event_type
    """)
  ) { t =>
    val perKey = t.events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"),
        col("value"))
      // null keys sort NULLS FIRST in sort_array but NULLS LAST in the
      // oracle's ORDER BY — exclude them so serialization order agrees
      .filter(col("k").isNotNull)
      .groupBy(col("event_type"), col("k"))
      .agg(sum(col("value").cast(DecimalType(38, 2))).cast(DecimalType(38, 2)).as("s"),
        count(lit(1)).as("c"))
    perKey
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("k"), col("s"), col("c")))).as("m"))
      .select(col("event_type"),
        concat_ws(",", transform(col("m"), e => e.getField("k").cast("string"))).as("map_keys"),
        concat_ws(",", transform(col("m"), e => e.getField("s").cast("string"))).as("map_sums"),
        concat_ws(",", transform(col("m"), e => e.getField("c").cast("string"))).as("map_counts"))
      .orderBy(col("event_type"))
  }

  // q86_weighted_quantile — ClickHouse quantileExactWeighted(level)(x, w):
  // the exact quantile of a VALUE distribution where each row carries a
  // repeat count — the shape of pre-aggregated histograms and sampled
  // tables, where plain quantileExact over rows is simply wrong. The
  // selected value is the smallest x whose cumulative weight reaches
  // level · total (ClickHouse's accumulate-and-pass rule), computed
  // exactly: weights collapse to one row per distinct value first (a
  // partial-aggregable groupBy — the window then runs over |distinct
  // values| rows, not raw rows), cumulative sums are BIGINT, and the
  // two thresholds compare as cum·100 ≥ level·total with no division.
  // The picked values pass through untouched (no FP arithmetic to
  // drift). At 100 TB the per-group distinct-value relation is the
  // histogram a storage layer already maintains.
  val q86 = Q(
    "q86_weighted_quantile",
    Some("""
      WITH byval AS (
        SELECT l_returnflag AS flag, l_extendedprice AS x,
               SUM(CAST(l_quantity AS BIGINT)) AS w
        FROM lineitem
        GROUP BY l_returnflag, l_extendedprice),
      cum AS (
        SELECT flag, x, w,
               SUM(w) OVER (PARTITION BY flag ORDER BY x
                            ROWS UNBOUNDED PRECEDING) AS cw,
               SUM(w) OVER (PARTITION BY flag) AS tw
        FROM byval)
      SELECT flag,
             MIN(CASE WHEN cw * 100 >= 50 * tw THEN x END) AS wq50,
             MIN(CASE WHEN cw * 100 >= 90 * tw THEN x END) AS wq90,
             CAST(MAX(tw) AS BIGINT) AS total_weight
      FROM cum
      GROUP BY flag
      ORDER BY flag
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    import graft.plans.GroupedPrefix
    val byval = t.lineitem
      .groupBy(col("l_returnflag").as("flag"), col("l_extendedprice").as("x"))
      .agg(sum(col("l_quantity").cast(LongType)).as("w"))
    // the histogram is fact-sized when the value is near-unique (prices
    // are), so the cumulative weights ride GroupedPrefix: slice-local
    // running sums + broadcast prefix offsets; group totals come from
    // the same per-slice partials via a whole-group window over the
    // tiny slices relation — no flag-keyed window over the histogram
    val staged = GroupedPrefix.stage(byval, Seq(col("flag"), col("x")))
    val cum = GroupedPrefix.withOffsets(staged, Seq("flag"),
      Seq(sum(col("w")).as("__w"))) { (slices, wPrev) =>
      slices.select(col("flag"), col(GroupedPrefix.PID),
        coalesce(sum(col("__w")).over(wPrev), lit(0L)).as("__off"),
        sum(col("__w")).over(wPrev.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)).as("tw"))
    }
      .withColumn("cw", col("__off") + sum(col("w")).over(
        GroupedPrefix.localWindow(Seq("flag"), Seq(col("x")))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum
      .groupBy(col("flag"))
      .agg(
        min(when(col("cw") * 100 >= col("tw") * 50, col("x"))).as("wq50"),
        min(when(col("cw") * 100 >= col("tw") * 90, col("x"))).as("wq90"),
        max(col("tw")).cast(LongType).as("total_weight"))
      .orderBy(col("flag"))
  }

  // q88 — KMV (k-minimum-values) distinct sketch, the ClickHouse
  // uniqTheta analog and the deterministic counterpart to q37's HLL:
  // keep the k=64 smallest values of a universal hash of the key; the
  // estimator (k-1)·P / h_k inverts the uniform spacing of order
  // statistics. Everything is 31-bit integer arithmetic (PortableHash
  // family), so unlike HLL the estimate is bit-reproducible in DuckDB
  // and gets a FULL exact oracle — including the merge path: the `_all`
  // row is the union of the per-group sketches (k smallest of the merged
  // hash stream), the same one-pass combine a 1000-executor rollup ships.
  // Scale: per group only k 8-byte values survive the map side (the
  // TopKPerGroup partial heap), so the shuffle is |groups|·k rows no
  // matter the fact volume; the exact COUNT(DISTINCT) alongside is the
  // verification column, not the serving path.
  val q88 = Q(
    "q88_kmv_distinct",
    Some {
      val (p, k) = (graft.functions.PortableHash.P, 64)
      val (a, b) = (graft.functions.PortableHash.coefA(9),
        graft.functions.PortableHash.coefB(9))
      s"""
      WITH h AS (
        SELECT DISTINCT o_orderpriority AS g,
               ($a * (o_custkey % $p) + $b) % $p AS hv
        FROM orders),
      u AS (SELECT g, hv FROM h UNION SELECT '_all', hv FROM h),
      ranked AS (
        SELECT g, hv, ROW_NUMBER() OVER (PARTITION BY g ORDER BY hv) AS rn
        FROM u),
      sk AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n_kept, MAX(hv) AS hk
        FROM ranked WHERE rn <= $k GROUP BY g),
      ex AS (
        SELECT o_orderpriority AS g, COUNT(DISTINCT o_custkey) AS exact
        FROM orders GROUP BY g
        UNION ALL SELECT '_all', COUNT(DISTINCT o_custkey) FROM orders),
      est AS (
        SELECT s.g, e.exact,
               CASE WHEN s.n_kept < $k THEN s.n_kept
                    ELSE ($k::BIGINT - 1) * $p::BIGINT // s.hk END AS kmv
        FROM sk s JOIN ex e ON e.g = s.g)
      SELECT g, CAST(exact AS BIGINT) AS exact_distinct,
             CAST(kmv AS BIGINT) AS kmv_estimate,
             CAST(ABS(kmv - exact) * 10000 // exact AS BIGINT) AS err_bp
      FROM est ORDER BY g
    """
    }
  ) { t =>
    val p = graft.functions.PortableHash.P
    val k = 64
    val hv = (lit(graft.functions.PortableHash.coefA(9)) * (col("o_custkey") % p)
      + graft.functions.PortableHash.coefB(9)) % p
    val h = t.orders.select(col("o_orderpriority").as("g"), hv.as("hv")).distinct()
    val u = h.unionAll(h.select(lit("_all").as("g"), col("hv"))).distinct()
    // k smallest hashes per group: two-phase TopKPerGroup on the negated
    // hash (partial k-heaps map-side; ≤ k rows per group cross the wire)
    val kept = graft.plans.TopKPerGroup.topK(
      u.withColumn("negh", -col("hv")), Seq("g"), "negh", "hv", k)
    val sk = kept.groupBy(col("g"))
      .agg(count(lit(1)).cast(LongType).as("n_kept"), max(col("hv")).as("hk"))
    val ex = t.orders.groupBy(col("o_orderpriority").as("g"))
      .agg(countDistinct(col("o_custkey")).as("exact"))
      .unionAll(t.orders.agg(countDistinct(col("o_custkey")).as("exact"))
        .select(lit("_all").as("g"), col("exact")))
    val kmv = when(col("n_kept") < k, col("n_kept"))
      .otherwise(expr(s"(${k - 1} * ${p}L) div hk"))
    sk.join(ex, "g")
      .withColumn("kmv", kmv)
      .select(col("g"), col("exact").cast(LongType).as("exact_distinct"),
        col("kmv").cast(LongType).as("kmv_estimate"),
        expr("abs(kmv - exact) * 10000 div exact").cast(LongType).as("err_bp"))
      .orderBy(col("g"))
  }

  // q175_join_estimate — join-size estimation by coordinated universe
  // sampling, the planner's pre-join cardinality probe (the literature's
  // "universe sampling" / join-synopsis estimator — sample the KEY
  // universe, not rows, so matching tuples survive on BOTH sides):
  // every side keeps exactly the keys whose universal hash lands below
  // P/16, the sampled per-key frequencies join, and |A ⋈ B| ≈ 16 ·
  // Σ f_A(k)·f_B(k) over the sampled keys. Row-level Bernoulli sampling
  // CANNOT do this (independent row samples intersect with probability
  // rate², collapsing the match signal); hashing the key coordinates
  // the two samples for free, with no exchange between sides. All
  // arithmetic is the 31-bit PortableHash family, so DuckDB reproduces
  // the estimate bit-for-bit and the oracle checks estimator AND truth.
  // Probed on three joins with different key anatomies: PK–FK dense
  // (orders⋈customer), PK–FK fan-out (lineitem⋈orders), and the
  // skew-prone part key (lineitem⋈part). Scale: the serving path is two
  // map-side-filtered scans (15/16 of rows never reach the aggregation)
  // into a sampled-key-sized shuffle — the estimate costs O(n/16) scan
  // and O(|sampled keys|) state where running the join costs the full
  // shuffle; the exact column is verification, not the serving path.
  val q175 = Q(
    "q175_join_estimate",
    Some {
      val p = graft.functions.PortableHash.P
      val (a, b) = (graft.functions.PortableHash.coefA(11),
        graft.functions.PortableHash.coefB(11))
      val theta = p / 16L
      def side(tbl: String, key: String, c: String, sampled: Boolean) =
        s"SELECT $key AS k, COUNT(*) AS $c FROM $tbl " +
          (if (sampled) s"WHERE ($a * ($key % $p) + $b) % $p < $theta " else "") +
          s"GROUP BY $key"
      def one(nm: String, ta: String, ka: String, tb: String, kb: String) =
        s"""
        SELECT '$nm' AS join_name,
               (SELECT COALESCE(SUM(ca * cb), 0)
                FROM (${side(ta, ka, "ca", false)}) x
                JOIN (${side(tb, kb, "cb", false)}) y USING (k)) AS exact_rows,
               16 * (SELECT COALESCE(SUM(ca * cb), 0)
                     FROM (${side(ta, ka, "ca", true)}) x
                     JOIN (${side(tb, kb, "cb", true)}) y USING (k)) AS est_rows"""
      s"""
      WITH raw AS (${one("customer_orders", "orders", "o_custkey", "customer", "c_custkey")}
      UNION ALL ${one("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey")}
      UNION ALL ${one("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey")})
      SELECT join_name, CAST(exact_rows AS BIGINT) AS exact_rows,
             CAST(est_rows AS BIGINT) AS est_rows,
             CAST(ABS(est_rows - exact_rows) * 10000 // exact_rows AS BIGINT) AS err_bp
      FROM raw ORDER BY join_name
    """
    }
  ) { t =>
    val p = graft.functions.PortableHash.P
    val (a, b) = (graft.functions.PortableHash.coefA(11),
      graft.functions.PortableHash.coefB(11))
    val theta = p / 16L
    def cnts(df: DataFrame, key: String, c: String, sampled: Boolean): DataFrame = {
      val k = col(key).cast(LongType)
      val base = if (sampled) df.filter((lit(a) * (k % p) + lit(b)) % p < theta) else df
      base.select(k.as("k")).groupBy(col("k")).agg(count(lit(1)).as(c))
    }
    def one(nm: String, ta: DataFrame, ka: String, tb: DataFrame, kb: String): DataFrame = {
      val ex = cnts(ta, ka, "ca", sampled = false)
        .join(cnts(tb, kb, "cb", sampled = false), "k")
        .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("exact_rows"))
      val sm = cnts(ta, ka, "ca", sampled = true)
        .join(cnts(tb, kb, "cb", sampled = true), "k")
        .agg((coalesce(sum(col("ca") * col("cb")), lit(0L)) * 16L).as("est_rows"))
      ex.crossJoin(sm).select(
        lit(nm).as("join_name"),
        col("exact_rows").cast(LongType).as("exact_rows"),
        col("est_rows").cast(LongType).as("est_rows"),
        expr("abs(est_rows - exact_rows) * 10000 div exact_rows")
          .cast(LongType).as("err_bp"))
    }
    one("customer_orders", t.orders, "o_custkey", t.customer, "c_custkey")
      .unionAll(one("lineitem_orders", t.lineitem, "l_orderkey", t.orders, "o_orderkey"))
      .unionAll(one("lineitem_part", t.lineitem, "l_partkey", t.part, "p_partkey"))
      .orderBy(col("join_name"))
  }

  // q98_uniq_upto — ClickHouse uniqUpTo(N): exact distinct count while a
  // group stays ≤ N distinct values, saturating at N+1 ("more than N").
  // The value of the combinator is its STATE BOUND — the typed
  // Aggregator (functions/UniqUpTo.scala) never buffers more than N+1
  // ids per group regardless of true cardinality, so partial-aggregate
  // shuffle rows are ≤ N+1 longs where count(DISTINCT)'s state grows
  // with the data. Run per (event_type, day) with N=50 (some day-cells
  // saturate, some don't — both paths exercised), rolled up per type.
  // The oracle is the saturation law itself: LEAST(exact distinct, N+1).
  val q98 = Q(
    "q98_uniq_upto",
    Some("""
      WITH per_day AS (
        SELECT event_type, DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS day,
               LEAST(COUNT(DISTINCT user_id), 51) AS u
        FROM events GROUP BY event_type, day)
      SELECT event_type,
             COUNT(*) AS n_days,
             CAST(SUM(u) AS BIGINT) AS sum_capped_users,
             CAST(MAX(u) AS BIGINT) AS max_capped_users,
             COUNT(CASE WHEN u = 51 THEN 1 END) AS n_saturated_days
      FROM per_day
      GROUP BY event_type
      ORDER BY event_type
    """)
  ) { t =>
    val uniqUpTo = udaf(graft.functions.UniqUpTo(50))
    t.events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(uniqUpTo(col("user_id")).as("u"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("u")).cast(LongType).as("sum_capped_users"),
        max(col("u")).cast(LongType).as("max_capped_users"),
        count(when(col("u") === 51, 1)).as("n_saturated_days"))
      .orderBy(col("event_type"))
  }

  // q100_quantiles_multi — ClickHouse quantilesExact(0.25, 0.5, 0.75,
  // 0.9): the multi-level array form of the exact quantile, all levels
  // answered from ONE pass over the per-distinct-value histogram (the
  // q86 accumulate-and-pass rule, unweighted): the facts collapse to ≤
  // |distinct values| rows per group first (partial-aggregable), the
  // cumulative window runs over that dimension-sized relation, and each
  // level is a conditional MIN over the same cumsum — adding a level
  // costs one column, not one pass. BIGINT threshold compares
  // (cum·100 ≥ level·total), picked values pass through untouched.
  val q100 = Q(
    "q100_quantiles_multi",
    Some("""
      WITH byval AS (
        SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS x,
               COUNT(*) AS w
        FROM lineitem GROUP BY flag, x),
      cum AS (
        SELECT flag, x, w,
               SUM(w) OVER (PARTITION BY flag ORDER BY x
                            ROWS UNBOUNDED PRECEDING) AS cw,
               SUM(w) OVER (PARTITION BY flag) AS tw
        FROM byval)
      SELECT flag,
             MIN(CASE WHEN cw * 100 >= 25 * tw THEN x END) AS q25,
             MIN(CASE WHEN cw * 100 >= 50 * tw THEN x END) AS q50,
             MIN(CASE WHEN cw * 100 >= 75 * tw THEN x END) AS q75,
             MIN(CASE WHEN cw * 100 >= 90 * tw THEN x END) AS q90,
             CAST(MAX(tw) AS BIGINT) AS n_rows
      FROM cum
      GROUP BY flag
      ORDER BY flag
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    val byval = t.lineitem
      .groupBy(col("l_returnflag").as("flag"),
        col("l_quantity").cast(LongType).as("x"))
      .agg(count(lit(1)).as("w"))
    val wf = Window.partitionBy(col("flag"))
    val cum = byval
      .withColumn("cw", sum(col("w")).over(wf.orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tw", sum(col("w")).over(wf))
    def pick(level: Int): Column =
      min(when(col("cw") * 100 >= col("tw") * level, col("x"))).as(s"q$level")
    cum.groupBy(col("flag"))
      .agg(pick(25), pick(50), pick(75), pick(90),
        max(col("tw")).cast(LongType).as("n_rows"))
      .orderBy(col("flag"))
  }

  // q114_group_sample — ClickHouse groupArraySample(k), deterministically:
  // a uniform-without-replacement sample per group via hash-rank order
  // statistics — rank every member by a universal hash of its id, keep
  // the k smallest (the KMV trick pointed at sampling instead of
  // cardinality). Exactly reproducible across engines AND across
  // partitionings (a real reservoir depends on arrival order; the hash
  // rank is a pure function of the data), ≤ k rows per group cross the
  // shuffle through the two-phase TopKPerGroup plan, serialized sorted.
  val q114 = Q(
    "q114_group_sample",
    Some {
      val p = graft.functions.PortableHash.P
      val (a, b) = (graft.functions.PortableHash.coefA(11),
        graft.functions.PortableHash.coefB(11))
      s"""
      WITH h AS (
        SELECT o_orderpriority AS g, o_orderkey,
               ($a * (o_orderkey % $p) + $b) % $p AS hv
        FROM orders),
      ranked AS (
        SELECT g, o_orderkey, hv,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY hv, o_orderkey) AS rn
        FROM h)
      SELECT g,
             array_to_string(LIST(o_orderkey::VARCHAR ORDER BY o_orderkey), ',')
               AS sample_keys,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM ranked WHERE rn <= 3
      GROUP BY g
      ORDER BY g
    """
    }
  ) { t =>
    val p = graft.functions.PortableHash.P
    val hv = (lit(graft.functions.PortableHash.coefA(11)) * (col("o_orderkey") % p)
      + graft.functions.PortableHash.coefB(11)) % p
    val h = t.orders.select(col("o_orderpriority").as("g"), col("o_orderkey"),
      hv.as("hv"))
    graft.plans.TopKPerGroup.topK(
      h.withColumn("negh", -col("hv")), Seq("g"), "negh", "o_orderkey", 3)
      .groupBy(col("g"))
      .agg(
        concat_ws(",", transform(sort_array(collect_list(col("o_orderkey"))),
          x => x.cast("string"))).as("sample_keys"),
        count(lit(1)).cast(LongType).as("k"))
      .orderBy(col("g"))
  }

  // q115_avg_weighted — ClickHouse avgWeighted(x, w): the
  // weight-carrying mean, exact: numerator Σ w·x as DECIMAL cents
  // (order-independent), denominator Σ w as BIGINT, one double division
  // rounded once. Also emits both exact sums — the re-aggregatable
  // -State pair a rollup ships.
  val q115 = Q(
    "q115_avg_weighted",
    Some("""
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_w,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_wx,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                            * CAST(l_quantity AS BIGINT)) AS DOUBLE)
                   / SUM(CAST(l_quantity AS BIGINT)), 4) AS avg_weighted
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """)
  ) { t =>
    val wx = sum(col("l_extendedprice").cast(DecimalType(18, 2))
      * col("l_quantity").cast(LongType))
    val w = sum(col("l_quantity").cast(LongType))
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        w.cast(LongType).as("sum_w"),
        wx.cast(DoubleType).as("sum_wx"),
        round(wx.cast(DoubleType) / w, 4).as("avg_weighted"))
      .orderBy(col("l_returnflag"))
  }

  // q117_bit_agg — ClickHouse groupBitAnd/groupBitOr/groupBitXor: the
  // bitwise fold aggregates (capability masks, feature flags, parity
  // checks). All three are commutative+associative on the low 16 bits
  // of the order key, hence map-side combinable; Spark lacks bit_and/
  // bit_or aggregates as builtins in this form, so AND folds via
  // 2^16−1 − OR of complements (De Morgan over the fixed mask) and XOR
  // via parity (odd popcount per bit ≡ sum of bits mod 2) — every step
  // integer-exact on both engines.
  val q117 = Q(
    "q117_bit_agg",
    Some("""
      WITH b AS (
        SELECT o_orderpriority AS g, o_orderkey % 65536 AS v
        FROM orders)
      SELECT g,
             CAST(BIT_AND(v) AS BIGINT) AS all_bits,
             CAST(BIT_OR(v) AS BIGINT) AS any_bits,
             CAST(BIT_XOR(v) AS BIGINT) AS parity_bits,
             COUNT(*) AS n
      FROM b
      GROUP BY g
      ORDER BY g
    """)
  ) { t =>
    val b = t.orders.select(col("o_orderpriority").as("g"),
      (col("o_orderkey") % 65536).as("v"))
    // per-bit parity and conjunction from 16 positional sums — one
    // map-side-combinable aggregation computes all three folds
    val bitSums = (0 until 16).map(i =>
      sum(shiftright(col("v"), i).bitwiseAND(1)).as(s"s$i"))
    val agg = b.groupBy(col("g"))
      .agg(bitSums.head, (bitSums.tail :+ count(lit(1)).as("n")): _*)
    val andBits = (0 until 16).map(i =>
      when(col(s"s$i") === col("n"), 1L << i).otherwise(0L)).reduce(_ + _)
    val orBits = (0 until 16).map(i =>
      when(col(s"s$i") > 0, 1L << i).otherwise(0L)).reduce(_ + _)
    val xorBits = (0 until 16).map(i =>
      when(col(s"s$i") % 2 === 1, 1L << i).otherwise(0L)).reduce(_ + _)
    agg.select(col("g"),
      andBits.cast(LongType).as("all_bits"),
      orBits.cast(LongType).as("any_bits"),
      xorBits.cast(LongType).as("parity_bits"),
      col("n"))
      .orderBy(col("g"))
  }

  // q118_map_algebra — ClickHouse mapAdd/mapSubtract: element-wise map
  // arithmetic, here as the week-over-week DELTA of the per-props-key
  // counter maps (the readout a metrics pipeline computes between two
  // sumMap states). Two key-level partial aggregates full-outer-join on
  // (group, key) — absent keys are implicit zeros on either side, which
  // is exactly mapAdd's semantics — then the portable sorted-CSV
  // serialization. No window, no explode beyond the JSON key pull.
  val q118 = Q(
    "q118_map_algebra",
    Some("""
      WITH kv AS (
        SELECT event_type,
               CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE)
                 < DATE '2024-01-16' AS first_half,
               TRY_CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k
        FROM events),
      w1 AS (SELECT event_type, k, COUNT(*) AS c FROM kv
             WHERE k IS NOT NULL AND first_half GROUP BY event_type, k),
      w2 AS (SELECT event_type, k, COUNT(*) AS c FROM kv
             WHERE k IS NOT NULL AND NOT first_half GROUP BY event_type, k),
      merged AS (
        SELECT COALESCE(w1.event_type, w2.event_type) AS event_type,
               COALESCE(w1.k, w2.k) AS k,
               COALESCE(w2.c, 0) - COALESCE(w1.c, 0) AS delta,
               COALESCE(w2.c, 0) + COALESCE(w1.c, 0) AS total
        FROM w1 FULL OUTER JOIN w2
          ON w1.event_type = w2.event_type AND w1.k = w2.k)
      SELECT event_type,
             array_to_string(LIST(k::VARCHAR ORDER BY k), ',') AS map_keys,
             array_to_string(LIST(delta::VARCHAR ORDER BY k), ',') AS map_delta,
             array_to_string(LIST(total::VARCHAR ORDER BY k), ',') AS map_total
      FROM merged
      GROUP BY event_type
      ORDER BY event_type
    """)
  ) { t =>
    val kv = t.events.select(col("event_type"),
      (date_trunc("day", col("ts")).cast("date") < lit("2024-01-16")).as("first_half"),
      get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .filter(col("k").isNotNull)
    def half(cond: Column, tag: String): DataFrame = kv.filter(cond)
      .groupBy(col("event_type").as(s"et_$tag"), col("k").as(s"k_$tag"))
      .agg(count(lit(1)).as(s"c_$tag"))
    val w1 = half(col("first_half"), "a")
    val w2 = half(!col("first_half"), "b")
    w1.join(w2, col("et_a") === col("et_b") && col("k_a") === col("k_b"),
      "full_outer")
      .select(
        coalesce(col("et_a"), col("et_b")).as("event_type"),
        coalesce(col("k_a"), col("k_b")).as("k"),
        (coalesce(col("c_b"), lit(0L)) - coalesce(col("c_a"), lit(0L))).as("delta"),
        (coalesce(col("c_b"), lit(0L)) + coalesce(col("c_a"), lit(0L))).as("total"))
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("k"), col("delta"), col("total")))).as("m"))
      .select(col("event_type"),
        concat_ws(",", transform(col("m"), e => e.getField("k").cast("string"))).as("map_keys"),
        concat_ws(",", transform(col("m"), e => e.getField("delta").cast("string"))).as("map_delta"),
        concat_ws(",", transform(col("m"), e => e.getField("total").cast("string"))).as("map_total"))
      .orderBy(col("event_type"))
  }

  // q178 — reaggregatable distinct across a hierarchy (ClickHouse
  // groupBitmapState/groupBitmapMerge over a rollup; the
  // AggregatingMergeTree discipline of q61 applied to the one aggregate
  // that is NOT algebraic): distinct ordering customers per
  // (region, order month), rolled up to per-region and grand totals by
  // MERGING the month-level bitmap states — the fact table is scanned
  // exactly once, at the finest grain; the two coarser grains move only
  // |regions|×|months| compact bitmaps (~10 B per 64-id word). This is
  // the 100-TB shape for COUNT(DISTINCT) under ROLLUP: Spark's native
  // rollup re-expands every fact row once per grouping set and
  // re-deduplicates each level from raw rows, where the state form pays
  // the fact scan once and unions sets upward (exactness is closed
  // under union — the oracle recounts every level from scratch).
  // Subtotal rows label as (r_name='ALL', ym=0), which collide with no
  // real region/month.
  val q178 = Q(
    "q178_bitmap_rollup",
    Some("""
      WITH base AS (
        SELECT r.r_name,
               CAST(YEAR(o.o_orderdate) * 100 + MONTH(o.o_orderdate) AS BIGINT) AS ym,
               o.o_custkey
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey)
      SELECT r_name, ym, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust
      FROM base GROUP BY r_name, ym
      UNION ALL
      SELECT r_name, CAST(0 AS BIGINT) AS ym,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust
      FROM base GROUP BY r_name
      UNION ALL
      SELECT 'ALL' AS r_name, CAST(0 AS BIGINT) AS ym,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust
      FROM base
      ORDER BY r_name, ym
    """)
  ) { t =>
    val state = udaf(graft.functions.BitmapState())
    val merge = udaf(graft.functions.BitmapMergeCount())
    val base = t.orders
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"),
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .cast(LongType).as("ym"),
        col("o_custkey"))
    // the ONE fact-grain aggregation. Every level below consumes this
    // IDENTICAL subtree — same grouping, same columns — so the planner's
    // exchange-reuse (AQE shuffle-stage reuse) runs the fact scan and
    // its partial aggregation once; the per-level finals re-read the
    // reused shuffle output (|regions|×|months| bitmaps), not the facts.
    val states = base.groupBy(col("r_name"), col("ym"))
      .agg(state(col("o_custkey")).as("bm"))
    val fine = states.groupBy(col("r_name"), col("ym"))
      .agg(merge(col("bm")).as("n_cust"))
    val byRegion = states.groupBy(col("r_name"))
      .agg(merge(col("bm")).as("n_cust"))
      .select(col("r_name"), lit(0L).as("ym"), col("n_cust"))
    val grand = states.agg(merge(col("bm")).as("n_cust"))
      .select(lit("ALL").as("r_name"), lit(0L).as("ym"), col("n_cust"))
    fine.unionByName(byRegion)
      .unionByName(grand)
      .orderBy(col("r_name"), col("ym"))
  }

  val all: Seq[Q] = Seq(q20, q21, q36, q37, q38, q55, q56, q86, q88, q98, q100,
    q114, q115, q117, q118, q175, q178)
}
