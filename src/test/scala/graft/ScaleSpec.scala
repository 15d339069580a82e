package graft

import graft.operators.Scale
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

class ScaleSpec extends SparkSpec {

  test("salted join is semantics-identical to the plain join") {
    val t = sf0001
    val plain = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = Scale.saltedJoin(
        t.orders.withColumnRenamed("o_custkey", "c_custkey"),
        t.customer, "c_custkey", salt = 16)
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted === plain)
  }

  test("bucketed tables join without a shuffle exchange") {
    val t = sf0001
    spark.sql("DROP TABLE IF EXISTS graft_orders_b")
    spark.sql("DROP TABLE IF EXISTS graft_customer_b")
    // a previous JVM's in-memory catalog leaves orphan warehouse dirs that
    // DROP TABLE (fresh catalog) doesn't know about — remove them physically
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    Seq("graft_orders_b", "graft_customer_b").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(d)
      }
    }
    t.orders.write.mode("overwrite")
      .bucketBy(4, "o_custkey").sortBy("o_custkey").saveAsTable("graft_orders_b")
    t.customer.write.mode("overwrite")
      .bucketBy(4, "c_custkey").sortBy("c_custkey").saveAsTable("graft_customer_b")
    val joined = spark.table("graft_orders_b")
      .join(spark.table("graft_customer_b"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    // disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      joined.collect()
      val plan = joined.queryExecution.executedPlan
      val exchanges = plan.collectWithSubqueries { case e: ShuffleExchangeLike => e }
      // the only allowed exchange is the post-aggregation one (on the group
      // key), never on the join keys: bucketing co-locates the join.
      assert(exchanges.size <= 1, s"expected bucketed join without join-side shuffles:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("BitmapDistinct aggregator: exact, merge-order-free, sparse, loud") {
    val agg = graft.functions.BitmapDistinct()
    // reduce + merge across simulated partitions == distinct count
    val ids = Seq(1L, 5L, 64L, 64L, 65L, 127L, 128L, 999L, 5L, 0L)
    val parts = ids.grouped(3).map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
    val merged = parts.reduce(agg.merge)
    assert(agg.finish(merged) === ids.distinct.size)
    // sparse buffer: memory tracks distinct count, not id magnitude —
    // one id near 2^62 costs one map entry, not 2^56 dense words
    val huge = agg.reduce(agg.zero, (1L << 62) + 42L)
    assert(huge.size === 1 && agg.finish(huge) === 1)
    // negative ids fail loudly instead of silently undercounting
    intercept[IllegalArgumentException](agg.reduce(agg.zero, -1L))
  }

  test("bitmap shuffle form is compact (~10 B/word) and round-trips exactly") {
    val agg = graft.functions.BitmapDistinct()
    val rnd = new scala.util.Random(7)
    val ids = Array.fill(10000)(math.abs(rnd.nextLong()) % 1000000000L)
    val buf = ids.foldLeft(agg.zero)(agg.reduce)
    val ser = new org.apache.spark.serializer.KryoSerializer(
      new org.apache.spark.SparkConf()).newInstance()
    val bytes = ser.serialize(buf)
    // sorted delta-varint word + 8 B bits per entry; a boxed-HashMap
    // encoding of the same buffer is 40+ B per entry
    assert(bytes.limit() <= buf.size * 16 + 64,
      s"${bytes.limit()} bytes for ${buf.size} occupied words")
    val back = ser.deserialize[graft.functions.LongBitmap](bytes)
    assert(back.cardinality === ids.distinct.length)
    assert(agg.finish(agg.merge(back, buf)) === ids.distinct.length)
  }

  test("q55 bitmap distinct equals exact count distinct per group") {
    val rows = graft.operators.AggExt.q55.build(sf0001).collect()
    val exact = sf0001.events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) === exact(r.getString(0))))
  }

  test("bitmap -State/-Merge pair: states round-trip and merge to the exact union") {
    val st = graft.functions.BitmapState()
    val mg = graft.functions.BitmapMergeCount()
    val rnd = new scala.util.Random(11)
    val groups = Seq.fill(6)(Array.fill(500)(math.abs(rnd.nextLong()) % 100000L))
    // -State per group, -Merge across: exact distinct of the union
    val states = groups.map(_.foldLeft(st.zero)(st.reduce)).map(st.finish)
    val merged = states.foldLeft(mg.zero)(mg.reduce)
    assert(mg.finish(merged) === groups.flatten.distinct.length)
    // a single-group state re-counts to the group's own distinct
    groups.zip(states).foreach { case (g, s) =>
      assert(mg.finish(mg.reduce(mg.zero, s)) === g.distinct.length)
    }
    // the byte form is the compact wire encoding, not Java serialization
    val one = st.finish(groups.head.foldLeft(st.zero)(st.reduce))
    val words = graft.functions.LongBitmap.fromBytes(one).size
    assert(one.length <= words * 16 + 16, s"${one.length} B for $words words")
  }

  test("q178_bitmap_rollup runs the fact-grain aggregation once (reused exchange)") {
    val df = SparkEntry.queries("q178_bitmap_rollup")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    // the coarser levels must consume the SAME shuffle stage the finest
    // grain produced — two ReusedExchange nodes (per-region + grand),
    // zero extra fact scans at runtime
    val plan = df.queryExecution.executedPlan.toString
    val reused = "ReusedExchange".r.findAllIn(plan).size
    assert(reused >= 2, s"expected level-2/3 to reuse the state exchange:\n${plan.take(3000)}")
    // internal consistency: the grand total equals the merged regions'
    // union cardinality bound (≤ sum, ≥ max) and the labeled rows exist
    val grand = rows.filter(r => r.getString(0) == "ALL").map(_.getLong(2))
    val regions = rows.filter(r => r.getString(0) != "ALL" && r.getLong(1) == 0L)
      .map(_.getLong(2))
    assert(grand.length === 1 && regions.nonEmpty)
    assert(grand.head <= regions.sum && grand.head >= regions.max)
  }

  test("q179_attribution_linear conserves credit exactly: 1000 milli per purchase") {
    val rows = graft.operators.Behavior.q179.build(sf0001).collect()
    val totalMilli = rows.map(_.getLong(2)).sum
    val purchases = sf0001.events
      .filter(col("event_type") === "purchase").count()
    // equal split + deterministic remainder must re-sum to the whole:
    // any rounding leak (credit created or destroyed) breaks equality
    assert(totalMilli === purchases * 1000L)
    assert(rows.map(_.getString(0)).contains("direct"))
  }

  test("q56 sumMap serializes aligned per-key maps") {
    val rows = graft.operators.AggExt.q56.build(sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val keys = r.getString(1).split(",")
      assert(keys.length === r.getString(2).split(",").length)
      assert(keys.length === r.getString(3).split(",").length)
      assert(keys.map(_.toLong).toSeq === keys.map(_.toLong).sorted.toSeq)
    }
  }

  test("bucketsFor scales the co-location layout with the fact size") {
    import graft.operators.Scale.bucketsFor
    // sf0.1 territory: the floor — matches the r10 layout (hash-stable)
    assert(bucketsFor(0L) === 8)
    assert(bucketsFor(600000L) === 8)
    assert(bucketsFor(16000000L) === 8)
    // growth: smallest power of two with ≤ ~2M rows per bucket
    assert(bucketsFor(17000000L) === 16)
    assert(bucketsFor(100000000L) === 64)
    // 100 TB territory clamps rather than exploding the file count
    assert(bucketsFor(600000000000L) === 4096)
    // powers of two only (bucket pruning + AQE-friendly)
    (1 to 40).foreach { i =>
      val b = bucketsFor(1L << i)
      assert((b & (b - 1)) === 0, s"not a power of two: $b")
    }
  }

  test("z-order layout actually clusters: shard extents beat the global extent") {
    val rows = graft.operators.Scale.q76.build(Tables(spark, "/root/testdata/sf0.01")).collect()
    assert(rows.nonEmpty)
    val totalN = rows.map(_.getAs[Long]("n")).sum
    val uGlobal = rows.map(_.getAs[Long]("u_hi")).max -
      rows.map(_.getAs[Long]("u_lo")).min
    val dGlobal = rows.map(_.getAs[Long]("d_hi")).max -
      rows.map(_.getAs[Long]("d_lo")).min
    // every full shard holds exactly the shard budget; the tail holds the rest
    assert(rows.init.forall(_.getAs[Long]("n") === 10000L) || rows.length == 1)
    assert(totalN === Tables(spark, "/root/testdata/sf0.01").events.count())
    // clustering claim: the AVERAGE shard covers a strictly smaller
    // rectangle than the global (user × day) extent — on a Z-order curve
    // both dimensions shrink together; a date-only sort would leave the
    // user extent global in every shard
    if (rows.length >= 4 && uGlobal > 0 && dGlobal > 0) {
      val avgU = rows.map(r => r.getAs[Long]("u_hi") - r.getAs[Long]("u_lo"))
        .sum.toDouble / rows.length
      val avgD = rows.map(r => r.getAs[Long]("d_hi") - r.getAs[Long]("d_lo"))
        .sum.toDouble / rows.length
      val areaRatio = (avgU / uGlobal) * (avgD / dGlobal)
      assert(areaRatio < 0.5,
        s"avg shard covers ${areaRatio * 100}%% of the global rectangle — not clustered")
    }
  }

  test("q81 keyed sample: consistent per-user slices and sane ×8 estimates") {
    val t = Tables(spark, "/root/testdata/sf0.01")
    val rows = Scale.q81.build(t).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val sampleEvents = r.getAs[Long]("sample_events")
      val actual = r.getAs[Long]("actual_events")
      assert(sampleEvents > 0 && sampleEvents < actual)
      assert(r.getAs[Long]("est_events") === sampleEvents * 8)
      // a 1-in-8 hash slice of 150 users should estimate within ~50%
      assert(r.getAs[Long]("err_bp") <= 5000, s"err_bp ${r.getAs[Long]("err_bp")}")
    }
    // keyed (not row) sampling: the same users are in-sample for every type,
    // so the distinct-user slice is consistent across groups
    val su = rows.map(_.getAs[Long]("sample_users"))
    assert(su.max - su.min <= 4, s"per-type sampled-user counts drifted: ${su.toSeq}")
  }

  test("q83 skip-index audit: pruning is sound and the z-layout prunes") {
    val rows = Scale.q83.build(Tables(spark, "/root/testdata/sf0.01")).collect()
    assert(rows.length >= 8)
    rows.foreach { r =>
      if (r.getAs[Long]("can_skip") === 1L)
        assert(r.getAs[Long]("n_match") === 0L,
          s"granule ${r.getAs[Long]("granule")} skipped but has matches")
      assert(r.getAs[Long]("u_lo") <= r.getAs[Long]("u_hi"))
      assert(r.getAs[Long]("d_lo") <= r.getAs[Long]("d_hi"))
    }
    val skipped = rows.count(_.getAs[Long]("can_skip") === 1L)
    assert(skipped > 0, "z-ordered granule extents pruned nothing")
  }

  test("q85 projection audit: each layout wins its own predicate, matches agree") {
    val rows = Scale.q85.build(Tables(spark, "/root/testdata/sf0.01")).collect()
    assert(rows.length === 9)
    def get(layout: String, pred: String) =
      rows.find(r => r.getString(0) == layout && r.getString(1) == pred).get
    // rows_matched is layout-invariant; scans always cover the matches
    Seq("p_day", "p_user", "p_both").foreach { p =>
      val ms = Seq("day_sorted", "user_sorted", "zorder")
        .map(l => get(l, p).getAs[Long]("rows_matched"))
      assert(ms.distinct.length === 1, s"$p matched drifted across layouts: $ms")
      rows.filter(_.getString(1) == p).foreach { r =>
        assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("rows_matched"))
        assert(r.getAs[Long]("granules_scanned") <= r.getAs[Long]("granules_total"))
      }
    }
    // a sort order prunes its own dimension better than the other one's
    assert(get("day_sorted", "p_day").getAs[Long]("rows_scanned") <
      get("user_sorted", "p_day").getAs[Long]("rows_scanned"))
    assert(get("user_sorted", "p_user").getAs[Long]("rows_scanned") <
      get("day_sorted", "p_user").getAs[Long]("rows_scanned"))
    // z-order prunes on BOTH single dimensions and is never worse than
    // the day sort on the combined predicate
    assert(get("zorder", "p_day").getAs[Long]("granules_scanned") <
      get("zorder", "p_day").getAs[Long]("granules_total"))
    assert(get("zorder", "p_user").getAs[Long]("granules_scanned") <
      get("zorder", "p_user").getAs[Long]("granules_total"))
    assert(get("zorder", "p_both").getAs[Long]("rows_scanned") <=
      get("day_sorted", "p_both").getAs[Long]("rows_scanned"))
  }

  test("q87 grid join finds exactly the cross-join's within-radius pairs") {
    val t = sf001
    // naive oracle: full cross join with the same hashed coordinates and
    // the same integer distance cut — the 3x3 neighbor replication must
    // lose nothing (|dx|<=R implies adjacent cell) and add nothing (the
    // d2 post-filter)
    val naive = t.spark.sql(
      s"""WITH c AS (SELECT c_custkey, c_nationkey,
              (c_custkey * 2654435761) % 2147483648 % 100000 AS x,
              (c_custkey * 1885706077) % 2147483648 % 100000 AS y
            FROM parquet.`${t.dir}/customer.parquet`),
          s AS (SELECT s_suppkey,
              (s_suppkey * 3266489917) % 2147483648 % 100000 AS x,
              (s_suppkey * 2971215073) % 2147483648 % 100000 AS y
            FROM parquet.`${t.dir}/supplier.parquet`)
          SELECT c.c_custkey, s.s_suppkey
          FROM c CROSS JOIN s
          WHERE (c.x-s.x)*(c.x-s.x) + (c.y-s.y)*(c.y-s.y) <= 4000000""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val grid = graft.operators.Geo.q87.build(t)
    val nPairs = grid.agg(sum(col("n_pairs"))).collect()(0).getLong(0)
    assert(nPairs === naive.size.toLong,
      s"grid join pair count $nPairs != naive ${naive.size}")
    assert(naive.nonEmpty, "fixture must produce at least one match")
  }
}
