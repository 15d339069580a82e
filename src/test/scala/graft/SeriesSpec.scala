package graft

import graft.operators.Series
import org.apache.spark.sql.functions._

/** Invariant specs for the time-series aggregate family (q93–q96).
  * The DuckDB oracle proves value equality at the gate; these pin the
  * semantic invariants that survive refactors (EMA weight algebra,
  * bounding-ratio endpoints, map serialization, greedy-count bounds).
  */
class SeriesSpec extends SparkSpec {

  test("ema: first event of a user has ema = its own cents; ema bounded by 255·max cents") {
    // A frame of n rows weights Σ 2^i, i<n → max total weight 255; the
    // smoothed stream can therefore never exceed 255 × the max raw value.
    val maxCents = sf0001.events
      .select((col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .agg(max(col("c"))).collect().head.getLong(0)
    val rows = Series.q93.build(sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_ema") <= 255L * maxCents)
      assert(r.getAs[Long]("min_ema") >= 0L)
      assert(r.getAs[Long]("n") > 0L)
    }
  }

  test("ema: totals conserve — n sums to event count") {
    val n = Series.q93.build(sf0001).agg(sum(col("n"))).collect().head.getLong(0)
    assert(n === sf0001.events.count())
  }

  test("bounding ratio: endpoints come from the true min/max (ts, event_id) rows") {
    val out = Series.q94.build(sf0001).collect()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    val firsts = sf0001.events
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("first_cents") === firsts(r.getAs[String]("event_type")))
    }
  }

  test("minmax map: per-key mins ≤ maxs, keys strictly ascending") {
    Series.q95.build(sf0001).collect().foreach { r =>
      val keys = r.getAs[String]("map_keys").split(",").map(_.toLong)
      val lo = r.getAs[String]("map_mins").split(",").map(_.toLong)
      val hi = r.getAs[String]("map_maxs").split(",").map(_.toLong)
      assert(keys.length === lo.length && lo.length === hi.length)
      assert(keys.sliding(2).forall(p => p.length < 2 || p(0) < p(1)))
      lo.zip(hi).foreach { case (l, h) => assert(l <= h) }
    }
  }

  test("sequence count: greedy pairs ≤ min(anchor, close) event totals; users_with_cp ≤ n_users") {
    val r = Series.q96.build(sf0001).collect().head
    val byType = sf0001.events.groupBy(col("event_type")).count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    val cp = r.getAs[Long]("click_purchase_pairs")
    val se = r.getAs[Long]("signup_error_pairs")
    assert(cp <= math.min(byType.getOrElse("click", 0L), byType.getOrElse("purchase", 0L)))
    assert(se <= math.min(byType.getOrElse("signup", 0L), byType.getOrElse("error", 0L)))
    assert(r.getAs[Long]("users_with_cp") <= r.getAs[Long]("n_users"))
  }

  test("sequence count: fold matches a driver-side greedy replay at sf0.001") {
    // Independent reimplementation: greedy armed scan over each user's
    // (ts, event_id)-ordered initials, summed — must equal the operator.
    val seqs = sf0001.events
      .select(col("user_id"), col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("c"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (_, rows) =>
        rows.sortBy(r => (r.getTimestamp(1).getTime, r.getTimestamp(1).getNanos, r.getLong(2)))
          .map(_.getString(3)).mkString
      }
    def greedy(seq: String, a: Char, b: Char): Long = {
      var armed = false; var n = 0L
      seq.foreach { ch =>
        if (ch == a) armed = true
        else if (ch == b && armed) { n += 1; armed = false }
      }
      n
    }
    val expected = seqs.map(greedy(_, 'c', 'p')).sum
    val got = Series.q96.build(sf0001).collect().head.getAs[Long]("click_purchase_pairs")
    assert(got === expected)
  }

  test("lttb: 8 picks per type, endpoints exact, days strictly ascending") {
    val out = Series.q97.build(sf0001).collect()
      .groupBy(_.getAs[String]("event_type"))
    val daily = sf0001.events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .count()
      .groupBy(col("event_type"))
      .agg(min(datediff(col("day"), lit("1970-01-01"))).as("lo"),
        max(datediff(col("day"), lit("1970-01-01"))).as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2), r.getLong(3))).toMap
    out.foreach { case (et, rows) =>
      val (lo, hi, n) = daily(et)
      if (n >= 8) {
        assert(rows.length === 8, s"$et: expected 8 picks")
        val days = rows.sortBy(_.getAs[Long]("pick")).map(_.getAs[Long]("day_num"))
        assert(days.head === lo.toLong, s"$et: first pick must be the first day")
        assert(days.last === hi.toLong, s"$et: last pick must be the last day")
        assert(days.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
          s"$et: picked days must ascend")
      }
    }
  }

  test("moving median: bounded by the frame extremes, one row per (type, day)") {
    val rows = Series.q103.build(sf0001).collect()
    val daily = sf0001.events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long").as("v"))
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => r.getDate(1).toLocalDate.toEpochDay -> r.getLong(2)).sortBy(_._1))
      .toMap
    assert(rows.length === daily.valuesIterator.map(_.length).sum)
    rows.foreach { r =>
      val et = r.getAs[String]("event_type"); val d = r.getAs[Long]("d")
      val series = daily(et)
      val frame = series.filter(p => p._1 <= d && p._1 > d - 7).map(_._2)
      val med = r.getAs[Double]("med7")
      assert(med >= frame.min.toDouble && med <= frame.max.toDouble)
      // exact replay of the (lo+hi)/2 rule
      val s = frame.sorted
      val expect = (s((s.length - 1) / 2) + s(s.length / 2)) / 2.0
      assert(med === expect, s"$et d=$d: $med vs $expect")
    }
  }

  test("type overlap: intersection bounded by both set sizes; full matrix emitted") {
    val rows = graft.operators.Behavior.q102.build(sf0001).collect()
    val types = sf0001.events.select(col("event_type")).distinct().count().toInt
    assert(rows.length === types * (types - 1) / 2)
    rows.foreach { r =>
      val (na, nb, both) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_both"))
      assert(both <= math.min(na, nb))
      val j = r.getAs[Long]("jaccard_bp")
      assert(j >= 0L && j <= 10000L)
    }
  }

  test("retention flags: retained never exceeds cohort size; bp consistent") {
    graft.operators.Behavior.q104.build(sf0001).collect().foreach { r =>
      val n = r.getAs[Long]("n_signup_users")
      val p = r.getAs[Long]("n_purchase_after")
      assert(p <= n && r.getAs[Long]("n_error_after") <= n)
      assert(r.getAs[Long]("purchase_bp") === 10000L * p / n)
    }
  }

  test("sparkbar: one glyph per day, extremes map to the lowest and highest block") {
    val glyphs = "▁▂▃▄▅▆▇█"
    Series.q105.build(sf0001).collect().foreach { r =>
      val bar = r.getAs[String]("bar")
      assert(bar.length === r.getAs[Long]("n_days").toInt)
      assert(bar.forall(glyphs.contains(_)), s"unexpected glyph in $bar")
      // the min and max day must render the first and last block level
      assert(bar.contains('▁') && bar.contains('█'))
    }
  }

  test("event gaps: n_gaps = events - 1 per type; mean between min and max gap") {
    val byType = sf0001.events.groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Series.q106.build(sf0001).collect().foreach { r =>
      val et = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n_gaps") === byType(et) - 1)
      val mean = r.getAs[Long]("mean_gap_us")
      assert(mean >= 0L && mean <= r.getAs[Long]("max_gap_us"))
      assert(r.getAs[Long]("n_alerts") <= r.getAs[Long]("n_gaps"))
    }
  }

  test("resample: fixed 6-bucket scaffold, zeros explicit, mass conserved") {
    val rows = Series.q109.build(sf0001).collect()
    val totalByType = sf0001.events.groupBy(col("event_type"))
      .agg((sum(col("value").cast("decimal(18,2)")) * 100).cast("long").as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      assert(r.getAs[String]("buckets") === "0,1,2,3,4,5")
      val sums = r.getAs[String]("sum_cents").split(",").map(_.toLong)
      assert(sums.length === 6)
      assert(sums.sum === totalByType(et), s"$et: resample buckets must conserve mass")
    }
  }

  test("nonneg derivative: positive mass bounded by total absolute movement") {
    Series.q110.build(sf0001).collect().foreach { r =>
      assert(r.getAs[Long]("sum_pos_cents") >= 0L)
      assert(r.getAs[Double]("max_rate_cents_per_s") >= 0.0)
      assert(r.getAs[Long]("n_samples") > 0L)
    }
  }

  test("funnel modes: per-mode users conserve; levels only shrink with strictness") {
    val rows = graft.operators.Behavior.q116.build(sf0001).collect()
    val users = sf0001.events.select(col("user_id")).distinct().count()
    val byMode = rows.groupBy(_.getAs[String]("mode"))
    assert(byMode.keySet === Set("ordered", "strict_dedup", "strict_order"))
    byMode.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("n_users")).sum === users)
    }
    // mean attained level: ordered ≥ strict_dedup ≥ strict_order
    def mass(m: String): Long = byMode(m)
      .map(r => r.getAs[Long]("level") * r.getAs[Long]("n_users")).sum
    assert(mass("ordered") >= mass("strict_dedup"))
    assert(mass("strict_dedup") >= mass("strict_order"))
  }

  test("group sample: 3 keys per group, all real members") {
    val keys = sf0001.orders.select(col("o_orderkey")).collect()
      .map(_.getLong(0)).toSet
    graft.operators.AggExt.q114.build(sf0001).collect().foreach { r =>
      val ids = r.getAs[String]("sample_keys").split(",").map(_.toLong)
      assert(ids.length === r.getAs[Long]("k").toInt && ids.length <= 3)
      ids.foreach(id => assert(keys.contains(id)))
    }
  }

  test("avg weighted: equals exact sums ratio") {
    graft.operators.AggExt.q115.build(sf0001).collect().foreach { r =>
      val expect = BigDecimal(r.getAs[Double]("sum_wx") / r.getAs[Long]("sum_w"))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("avg_weighted") - expect) < 1e-9)
    }
  }

  test("bit agg: AND ⊆ XOR-support ⊆ OR as bit sets") {
    graft.operators.AggExt.q117.build(sf0001).collect().foreach { r =>
      val andB = r.getAs[Long]("all_bits")
      val orB = r.getAs[Long]("any_bits")
      val xorB = r.getAs[Long]("parity_bits")
      assert((andB & orB) === andB, "AND bits must be a subset of OR bits")
      assert((xorB & orB) === xorB, "XOR bits must be a subset of OR bits")
      assert(orB < 65536L && andB >= 0L)
    }
  }

  test("map algebra: delta + totals consistent with the raw per-key counts") {
    graft.operators.AggExt.q118.build(sf0001).collect().foreach { r =>
      val deltas = r.getAs[String]("map_delta").split(",").map(_.toLong)
      val totals = r.getAs[String]("map_total").split(",").map(_.toLong)
      deltas.zip(totals).foreach { case (d, t) =>
        assert(math.abs(d) <= t, "a delta cannot exceed the combined mass")
        assert((t + d) % 2 === 0, "t+d = 2·second-half count must be even")
      }
    }
  }

  test("heatmap: 7 dense rows of 24 cells; grand total = event count") {
    val rows = graft.operators.Temporal.q119.build(sf0001).collect()
    assert(rows.length === 7)
    assert(rows.map(_.getAs[Long]("day_total")).sum === sf0001.events.count())
    rows.foreach { r =>
      val cells = r.getAs[String]("hourly").split(",")
      assert(cells.length === 24)
      assert(cells.map(_.toLong).sum === r.getAs[Long]("day_total"))
    }
  }

  test("session stats: totals tie to the q34 session relation") {
    val sessions = graft.operators.Temporal.q34.build(sf0001).collect()
    val r = graft.operators.Temporal.q120.build(sf0001).collect().head
    assert(r.getAs[Long]("n_sessions") === sessions.length.toLong)
    assert(r.getAs[Long]("n_events") === sessions.map(_.getAs[Long]("n_events")).sum)
    assert(r.getAs[Long]("n_bounce") ===
      sessions.count(_.getAs[Long]("n_events") == 1L).toLong)
    assert(r.getAs[Long]("max_duration_sec") ===
      sessions.map(_.getAs[Long]("duration_sec")).max)
  }

  test("skyline: a driver-side quadratic dominance check agrees at sf0.001") {
    val rows = sf0001.orders.select(col("o_orderpriority"),
      col("o_totalprice"), unix_micros(col("o_orderdate").cast("timestamp")).as("dt"),
      col("o_orderkey")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    val expect = rows.groupBy(_._1).view.mapValues { os =>
      os.count { a =>
        !os.exists(b => (b._4 != a._4) &&
          ((b._2 < a._2 && b._3 >= a._3) || (b._2 <= a._2 && b._3 > a._3)))
      }.toLong
    }.toMap
    val got = graft.operators.Shapes.q121.build(sf0001).collect()
      .map(r => r.getAs[String]("o_orderpriority") -> r.getAs[Long]("front_size")).toMap
    assert(got === expect, s"$got vs $expect")
  }

  test("streaks: histogram masses = users; best streak bounded by 30 days") {
    val rows = graft.operators.Shapes.q122.build(sf0001).collect()
    val users = sf0001.events.select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum === users)
    rows.foreach(r => assert(r.getAs[Long]("best_streak") >= 1L
      && r.getAs[Long]("best_streak") <= 31L))
  }

  test("share of total: shares per month sum to ~10000 bp") {
    val rows = graft.operators.Grouping.q123.build(sf0001).collect()
      .groupBy(_.getAs[java.sql.Date]("month").toString)
    rows.foreach { case (m, rs) =>
      val s = rs.map(_.getAs[Long]("share_bp")).sum
      // integer floor division loses at most (k-1) bp for k priorities
      assert(s <= 10000L && s >= 10000L - rs.length + 1, s"$m: $s")
    }
  }

  test("seasonal: exact rational weekday indices match a driver-side replay") {
    val rows = graft.operators.Series.q135.build(sf0001).collect()
      .map(r => (r.getAs[String]("o_orderstatus"), r.getAs[Long]("weekday")) -> r)
      .toMap
    val daily = sf0001.orders
      .groupBy(col("o_orderstatus"), to_date(col("o_orderdate")).as("d"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)") * 100)).cast("long").as("x"))
      .collect().map(r => (r.getString(0), r.getAs[java.sql.Date](1), r.getLong(2)))
    daily.groupBy(_._1).foreach { case (g, ds) =>
      val s = ds.sortBy(_._2.toLocalDate.toEpochDay)
      val expect = scala.collection.mutable.Map.empty[Long, (Long, Long)]
      for (i <- 3 until s.length - 3) {
        val t7 = (i - 3 to i + 3).map(j => s(j)._3).sum
        val det7 = 7 * s(i)._3 - t7
        val wd = s(i)._2.toLocalDate.getDayOfWeek.getValue.toLong // ISO 1..7
        val (num, cnt) = expect.getOrElse(wd, (0L, 0L))
        expect(wd) = (num + det7, cnt + 1)
      }
      expect.foreach { case (wd, (num, cnt)) =>
        val r = rows((g, wd))
        assert(r.getAs[Long]("seasonal_num") === num, s"$g/$wd")
        assert(r.getAs[Long]("seasonal_den") === 7 * cnt)
        assert(r.getAs[Long]("n_days") === cnt)
      }
    }
  }

  test("stl_decompose: observed = trend + seasonal + residual EXACTLY, and the seasonal columns ARE q135's indices") {
    val rows = graft.operators.Series.q172.build(sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val x = r.getAs[Long]("x_cents")
      val t7 = r.getAs[Long]("trend_num")
      val sn = r.getAs[Long]("seasonal_num")
      val sd = r.getAs[Long]("seasonal_den")
      val rn = r.getAs[Long]("resid_num")
      val rd = r.getAs[Long]("resid_den")
      assert(r.getAs[Long]("trend_den") === 7L)
      assert(sd % 7 === 0L && rd === 7 * sd)
      // the rational identity x = t7/7 + sn/sd + rn/rd, cross-multiplied
      // onto the common denominator rd = 49·n_w — exact, no FP
      val nw = sd / 7
      assert(x * rd === t7 * 7 * nw + 7 * sn + rn,
        s"identity broke at ${r.getAs[java.sql.Date]("d")}")
    }
    // the per-day seasonal columns must BE q135's per-weekday indices
    val q135 = graft.operators.Series.q135.build(sf0001).collect()
      .map(r => (r.getAs[String]("o_orderstatus"), r.getAs[Long]("weekday")) ->
        (r.getAs[Long]("seasonal_num"), r.getAs[Long]("seasonal_den"))).toMap
    rows.foreach { r =>
      val wd = r.getAs[java.sql.Date]("d").toLocalDate.getDayOfWeek.getValue.toLong
      val (n135, d135) = q135((r.getAs[String]("o_orderstatus"), wd))
      assert(r.getAs[Long]("seasonal_num") === n135 &&
        r.getAs[Long]("seasonal_den") === d135)
    }
  }
}
