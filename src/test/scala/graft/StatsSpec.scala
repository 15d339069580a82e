package graft

import graft.operators.Stats
import org.apache.spark.sql.functions._

/** Invariant specs for the statistical/interval aggregates (q63–q69).
  * The DuckDB oracle proves value equality; these pin the semantic
  * invariants that survive refactors (peak counts, union bounds,
  * regression identities, entropy range).
  */
class StatsSpec extends SparkSpec {

  test("max_intersections: peak is ≥ 1 and ≤ group row count; first_peak is a real boundary") {
    val rows = Stats.q65.build(sf0001).collect()
    assert(rows.nonEmpty)
    val counts = sf0001.orders.groupBy(col("o_orderstatus")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val mx = r.getAs[Long]("max_open")
      assert(mx >= 1L && mx <= counts(r.getAs[String]("o_orderstatus")))
      assert(r.getAs[Any]("first_peak") != null)
    }
  }

  test("interval union: covered_days ≤ sum of interval lengths, ≥ longest interval") {
    val union = Stats.q66.build(sf0001).collect()
      .map(r => r.getAs[String]("o_orderstatus") ->
        (r.getAs[Long]("n_islands"), r.getAs[Long]("covered_days"))).toMap
    val per = sf0001.orders
      .select(col("o_orderstatus"), expr("CAST(o_orderkey % 20 + 1 AS LONG)").as("len"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("len")).as("total"), max(col("len")).as("longest"))
      .collect()
    per.foreach { r =>
      val (nIslands, covered) = union(r.getAs[String]("o_orderstatus"))
      assert(covered <= r.getAs[Long]("total"))
      assert(covered >= r.getAs[Long]("longest"))
      assert(nIslands >= 1L)
    }
  }

  test("linreg: slope/intercept reproduce the group mean point (ȳ = k·x̄ + b)") {
    val lr = Stats.q67.build(sf0001).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("slope"), r.getAs[Double]("intercept"))).toMap
    val means = sf0001.lineitem.groupBy(col("l_returnflag"))
      .agg(avg(col("l_quantity")).as("mx"), avg(col("l_extendedprice")).as("my"))
      .collect()
    means.foreach { r =>
      val (k, b) = lr(r.getAs[String]("l_returnflag"))
      val predicted = k * r.getAs[Double]("mx") + b
      // slope/intercept are rounded to 4dp, so the identity holds loosely
      assert(math.abs(predicted - r.getAs[Double]("my")) < 1.0,
        s"mean point off regression line: $predicted vs ${r.getAs[Double]("my")}")
    }
  }

  test("t-test: welch and student agree in sign; both finite") {
    val r = Stats.q68.build(sf0001).collect().head
    val (w, s) = (r.getAs[Double]("welch_t"), r.getAs[Double]("student_t"))
    assert(!w.isNaN && !w.isInfinite && !s.isNaN && !s.isInfinite)
    assert(math.signum(w) === math.signum(s))
  }

  test("entropy: within [0, log2(n_users)]; uniform-ish event stream is high-entropy") {
    Stats.q69.build(sf0001).collect().foreach { r =>
      val h = r.getAs[Double]("entropy_bits")
      val n = r.getAs[Long]("n_users")
      assert(h >= 0.0 && h <= math.log(n.toDouble) / math.log(2.0) + 1e-9)
    }
  }

  test("deltaSum: non-negative, and zero for a monotonically decreasing series") {
    Stats.q70.build(sf0001).collect().foreach { r =>
      assert(r.getAs[Double]("delta_sum") >= 0.0)
    }
    // planted series: strictly decreasing → deltaSum must be 0
    import spark.implicits._
    val planted = Seq(("p", 3.0, 1L), ("p", 2.0, 2L), ("p", 1.0, 3L))
      .toDF("g", "v", "k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("g")).orderBy(col("k"))
    val ds = planted
      .withColumn("step", col("v") - lag(col("v"), 1).over(w))
      .agg(sum(when(col("step") > 0, col("step")).otherwise(lit(0.0))).as("d"))
      .collect().head.getAs[Double]("d")
    assert(ds === 0.0)
  }

  test("rankCorr: in [-1, 1]; perfectly monotone pair gives 1.0") {
    Stats.q71.build(sf0001).collect().foreach { r =>
      val rho = r.getAs[Double]("spearman")
      assert(rho >= -1.0 && rho <= 1.0)
    }
    import spark.implicits._
    val mono = (1 to 50).map(i => (i.toDouble, (i * i).toDouble)).toDF("x", "y")
    import org.apache.spark.sql.expressions.Window
    val rho = mono.select(
      rank().over(Window.orderBy(col("x"))).as("rx"),
      rank().over(Window.orderBy(col("y"))).as("ry"))
      .agg(corr(col("rx"), col("ry")).as("c")).collect().head.getAs[Double]("c")
    assert(math.abs(rho - 1.0) < 1e-9)
  }

  test("cramersV/contingency/theilsU all land in [0, 1]") {
    val r = Stats.q72.build(sf0001).collect().head
    Seq("cramers_v", "contingency_c", "theils_u").foreach { c =>
      val v = r.getAs[Double](c)
      assert(v >= 0.0 && v <= 1.0, s"$c = $v out of [0,1]")
    }
    assert(r.getAs[Long]("n") === sf0001.orders.count())
  }

  test("mann-whitney: U within [0, n0*n1]; rank sums consistent") {
    Stats.q73.build(sf0001).collect().foreach { r =>
      val u = r.getAs[Double]("u1")
      val bound = r.getAs[Long]("n0").toDouble * r.getAs[Long]("n1")
      assert(u >= 0.0 && u <= bound, s"U=$u outside [0, $bound]")
    }
  }

  test("skew/kurt: symmetric uniform-ish quantity is near-flat; kurtosis of uniform < 0") {
    Stats.q74.build(sf0001).collect().foreach { r =>
      // quantities are ~uniform 1..50: skew near 0, excess kurtosis ≈ -1.2
      assert(math.abs(r.getAs[Double]("skew_pop")) < 0.5)
      val k = r.getAs[Double]("kurt_excess")
      assert(k < 0.0 && k > -2.0)
    }
  }

  test("MAD: non-negative and no larger than the value range") {
    Stats.q75.build(sf0001).collect().foreach { r =>
      val mad = r.getAs[Double]("mad")
      assert(mad >= 0.0)
      assert(mad <= r.getAs[Double]("median_price"))
    }
  }

  test("Theil-Sen: picked pair reproduces the slope; pair count = C(days,2)") {
    val rows = Stats.q92.build(sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, num, den, slope) = (r.getAs[Long]("n_pairs"), r.getAs[Long]("med_num"),
        r.getAs[Long]("med_den"), r.getAs[Double]("slope_cents_per_day"))
      assert(den > 0L, "pairs are strictly forward in time")
      // the reported slope IS the chosen pair's ratio
      assert(math.abs(slope - math.round(num.toDouble / den * 10000) / 10000.0) < 1e-9)
      // n = C(days, 2) for that type's series
      val days = (1 + math.sqrt(1 + 8.0 * n)) / 2
      assert(math.abs(days - math.round(days)) < 1e-9, s"n_pairs $n not triangular")
    }
  }

  test("anova: F >= 0, eta_sq in [0,1], group/row counts exact") {
    val r = Stats.q99.build(sf0001).collect().head
    assert(r.getAs[Long]("n_groups") ===
      sf0001.orders.select(col("o_orderpriority")).distinct().count())
    assert(r.getAs[Long]("n_rows") === sf0001.orders.count())
    assert(r.getAs[Double]("f_stat") >= 0.0)
    val eta = r.getAs[Double]("eta_sq")
    assert(eta >= 0.0 && eta <= 1.0, s"eta_sq out of range: $eta")
  }

  test("quantiles_multi: levels are monotone and within the data range") {
    val bounds = sf0001.lineitem
      .agg(min(col("l_quantity")).as("lo"), max(col("l_quantity")).as("hi"))
      .collect().head
    val (lo, hi) = (bounds.getDouble(0).toLong, bounds.getDouble(1).toLong)
    graft.operators.AggExt.q100.build(sf0001).collect().foreach { r =>
      val qs = Seq("q25", "q50", "q75", "q90").map(r.getAs[Long](_))
      assert(qs.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
        s"quantile levels must be monotone: $qs")
      assert(qs.head >= lo && qs.last <= hi)
    }
  }

  test("geohash: cells are 4 base32 chars; occupancy sums bounded by customer count") {
    val rows = graft.operators.Geo.q101.build(sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz".toSet
    val nCust = sf0001.customer.count()
    rows.foreach { r =>
      val cell = r.getAs[String]("cell")
      assert(cell.length === 4 && cell.forall(alphabet.contains), s"bad cell $cell")
      assert(r.getAs[Long]("n_customers") >= 1L)
      assert(r.getAs[Long]("n_nations") <= 25L)
    }
    assert(rows.map(_.getAs[Long]("n_customers")).sum <= nCust)
  }

  test("ip funcs: every rendered dotted quad round-trips to its number") {
    graft.operators.Strings.q108.build(sf0001).collect().foreach { r =>
      assert(r.getAs[Long]("n_roundtrip_ok") === r.getAs[Long]("n_users"),
        s"roundtrip failure in ${r.getAs[String]("subnet")}")
    }
  }

  test("url funcs: 12 (sub, tld) cells, users conserved per cell") {
    val rows = graft.operators.Strings.q107.build(sf0001).collect()
    assert(rows.length === 12)
    rows.foreach { r =>
      assert(r.getAs[String]("domain").startsWith("sub"))
      assert(Set("com", "org", "io", "dev").contains(r.getAs[String]("tld")))
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_hits"))
    }
  }

  test("min sample size: smaller baselines need more samples; all positive") {
    val rows = graft.operators.Stats.q111.build(sf0001).collect()
      .map(r => (r.getAs[Long]("conversion_bp"), r.getAs[Double]("n_per_arm")))
    rows.foreach { case (bp, n) =>
      assert(bp > 0L && bp <= 10000L)
      assert(n > 0.0)
    }
  }

  test("auc: in [0, 10000] bp; driver-side exact replay agrees") {
    val r = graft.operators.Stats.q112.build(sf0001).collect().head
    val auc = r.getAs[Long]("auc_bp")
    assert(auc >= 0L && auc <= 10000L)
    // independent replay: probability a random positive outranks a random
    // negative (ties count half) — computed directly from the data
    val rows = sf0001.events.select(
      (col("value").cast("decimal(18,2)") * 100).cast("long").as("s"),
      when(col("event_type") === "purchase", 1).otherwise(0).as("l")).collect()
    val pos = rows.filter(_.getInt(1) == 1).map(_.getLong(0))
    val neg = rows.filter(_.getInt(1) == 0).map(_.getLong(0))
    var num = BigInt(0)
    val negSorted = neg.sorted
    pos.foreach { p =>
      // 2·(#neg < p) + (#neg == p)
      val below = negSorted.count(_ < p)
      val tied = negSorted.count(_ == p)
      num += 2 * below + tied
    }
    val expect = (num * 10000 / (BigInt(2) * pos.length * neg.length)).toLong
    assert(auc === expect, s"$auc vs $expect")
  }

  test("corr matrix: 6 pairs, all within [-1, 1]") {
    val rows = graft.operators.Stats.q113.build(sf0001).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      val c = r.getAs[Double]("corr")
      assert(c >= -1.0001 && c <= 1.0001)
    }
  }

  test("gini: in [0,1); driver-side exact replay agrees") {
    val rows = graft.operators.Stats.q124.build(sf0001).collect()
    val data = sf0001.orders.select(col("o_orderpriority"),
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("x"),
      col("o_totalprice"), col("o_orderkey")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    rows.foreach { r =>
      val g = r.getAs[String]("g")
      val xs = data.filter(_._1 == g).sortBy(t => (t._3, t._4)).map(_._2)
      val n = xs.length.toLong
      val sum = xs.map(BigInt(_)).sum
      val iSum = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      val expect = BigDecimal(2.0 * iSum.toDouble / (n * sum.toDouble) - (n + 1.0) / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("gini") - expect) < 1e-6, s"$g")
      assert(r.getAs[Double]("gini") >= 0.0 && r.getAs[Double]("gini") < 1.0)
      assert(r.getAs[Long]("top_decile_bp") >= 1000L,
        "top decile cannot hold less than 10% of mass")
    }
  }

  test("benford: observed shares sum to ~10000 bp; digits in 1..9") {
    val rows = graft.operators.Stats.q126.build(sf0001).collect()
    rows.foreach { r =>
      val d = r.getAs[Long]("digit")
      assert(d >= 1L && d <= 9L)
      assert(r.getAs[Long]("benford_bp") > 0L)
    }
    val s = rows.map(_.getAs[Long]("observed_bp")).sum
    assert(s <= 10000L && s >= 10000L - 9L)
    assert(rows.map(_.getAs[Long]("n")).sum === sf0001.orders.count())
  }

  test("zscore outliers: exact integer flags match a driver-side replay") {
    val rows = graft.operators.Stats.q127.build(sf0001).collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Long]("n_outliers")).toMap
    val data = sf0001.orders.select(col("o_orderpriority"),
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("x"))
      .collect().map(r => (r.getString(0), BigInt(r.getLong(1))))
    data.groupBy(_._1).foreach { case (g, xs) =>
      val n = BigInt(xs.length); val s = xs.map(_._2).sum
      val q = xs.map(t => t._2 * t._2).sum
      val rhs = 9 * (n * q - s * s)
      val expect = xs.count { case (_, x) =>
        val lhs = (n * x - s) * (n * x - s); lhs > rhs
      }.toLong
      assert(rows(g) === expect, s"$g: ${rows(g)} vs $expect")
    }
  }

  test("tukey: fences and censuses match an exact driver-side replay") {
    val rows = graft.operators.Stats.q134.build(sf0001).collect()
      .map(r => r.getAs[String]("o_orderstatus") -> r).toMap
    val data = sf0001.orders.select(col("o_orderstatus"),
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    data.groupBy(_._1).foreach { case (g, xs) =>
      val v = xs.map(_._2).sorted
      val n = v.length
      // quantile ×4 exactly: pos = (n−1)·q, q ∈ {¼, ¾} → 4·pos integer
      def q4(num: Long): Long = { // num = 4·pos = (n−1)·num4 with num4 ∈ {1,3}
        val lo = (num / 4).toInt; val frac = num % 4
        if (frac == 0) 4 * v(lo) else (4 - frac) * v(lo) + frac * v(lo + 1)
      }
      val q1x4 = q4((n - 1).toLong * 1); val q3x4 = q4((n - 1).toLong * 3)
      val iqr = q3x4 - q1x4
      val r = rows(g)
      assert(r.getAs[Long]("q1_x4") === q1x4)
      assert(r.getAs[Long]("q3_x4") === q3x4)
      assert(r.getAs[Long]("n_mild_lo") ===
        v.count(x => 8 * x < 2 * q1x4 - 3 * iqr).toLong)
      assert(r.getAs[Long]("n_mild_hi") ===
        v.count(x => 8 * x > 2 * q3x4 + 3 * iqr).toLong)
      assert(r.getAs[Long]("n_extreme") === v.count(x =>
        8 * x < 2 * q1x4 - 6 * iqr || 8 * x > 2 * q3x4 + 6 * iqr).toLong)
    }
  }
}
