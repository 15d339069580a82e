package graft

import org.apache.spark.sql.functions._

/** Accuracy envelope of the sketch-mode quantiles (ApproxQuantileRewrite
  * flips exact Percentile to ApproximatePercentile at 100 TB): the
  * approximation must track the exact answer across columns, quantile
  * points, and accuracy settings.
  */
class QuantileAccuracySpec extends SparkSpec {

  private def relErr(approx: Double, exact: Double): Double =
    if (exact == 0.0) math.abs(approx) else math.abs(approx - exact) / math.abs(exact)

  test("default-accuracy sketch tracks exact within 5% across columns and quantile points") {
    val cases = Seq(
      ("o_totalprice", sf0001.orders),
      ("l_extendedprice", sf0001.lineitem),
      ("l_quantity", sf0001.lineitem))
    for ((c, df) <- cases; p <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val row = df.agg(
        percentile(col(c), lit(p)).as("exact"),
        percentile_approx(col(c), lit(p), lit(10000)).cast("double").as("approx")).head()
      val (exact, approx) = (row.getDouble(0), row.getDouble(1))
      assert(relErr(approx, exact) < 0.05, s"$c p=$p approx=$approx exact=$exact")
    }
  }

  test("coarse sketches degrade gracefully and refine monotonically in accuracy") {
    val exact = sf0001.lineitem.agg(percentile(col("l_extendedprice"), lit(0.5)))
      .head().getDouble(0)
    val errs = Seq(50, 1000, 10000).map { acc =>
      val a = sf0001.lineitem
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(acc)).cast("double"))
        .head().getDouble(0)
      acc -> relErr(a, exact)
    }.toMap
    assert(errs(50) < 0.25, s"accuracy=50 err=${errs(50)}")
    assert(errs(1000) < 0.05, s"accuracy=1000 err=${errs(1000)}")
    assert(errs(10000) < 0.01, s"accuracy=10000 err=${errs(10000)}")
  }

  test("grouped sketch quantiles stay within bound per group") {
    val joined = sf0001.orders
      .agg(
        percentile(col("o_totalprice"), lit(0.5)).as("exact"),
        percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).cast("double").as("approx"))
    val groups = sf0001.orders.groupBy(col("o_orderstatus"))
      .agg(
        percentile(col("o_totalprice"), lit(0.9)).as("exact"),
        percentile_approx(col("o_totalprice"), lit(0.9), lit(10000)).cast("double").as("approx"))
      .collect()
    assert(groups.nonEmpty)
    groups.foreach { r =>
      assert(relErr(r.getDouble(2), r.getDouble(1)) < 0.05, r.toString)
    }
    joined.head() // whole-table variant also executes
  }

  test("q86 weighted quantile equals the weight-expanded multiset percentile") {
    import org.apache.spark.sql.functions._
    val t = sf0001
    val got = graft.operators.AggExt.q86.build(t).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val raw = t.lineitem.select(col("l_returnflag"), col("l_extendedprice"),
      col("l_quantity").cast("long")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    raw.groupBy(_._1).foreach { case (flag, rows) =>
      val sorted = rows.sortBy(_._2)
      val tw = sorted.map(_._3).sum
      def pick(levelPct: Long): Double = {
        var cw = 0L
        sorted.find { case (_, _, w) => cw += w; cw * 100 >= levelPct * tw }.get._2
      }
      assert(got(flag)._1 === pick(50), s"$flag wq50")
      assert(got(flag)._2 === pick(90), s"$flag wq90")
    }
  }

  test("q173: the sketch median honors its rank-error contract and the exact lane is exact") {
    val rows = graft.operators.Stats.q173.build(sf0001).collect()
    assert(rows.nonEmpty)
    // replay the exact nearest-rank median + the audit per group
    val cents = sf0001.lineitem
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val vs = cents.filter(_._1 == flag).map(_._2).sorted
      val n = vs.length.toLong
      assert(r.getAs[Long]("n") === n)
      val target = ((n - 1) * 4 + 4) / 8 + 1
      assert(r.getAs[Long]("target_rank") === target)
      assert(r.getAs[Long]("exact_p50") === vs((target - 1).toInt),
        s"$flag exact lane diverged from the sorted multiset")
      // the measured rank error re-derives from the raw multiset
      val a = r.getAs[Long]("approx_p50")
      val lo = vs.count(_ < a).toLong
      val hi = vs.count(_ <= a).toLong
      val err = math.max(0L, math.max(lo + 1 - target, target - hi))
      assert(r.getAs[Long]("rank_err") === err)
      assert(r.getAs[Long]("rank_bound") === (n + 9999) / 10000 + 1)
      // the contract itself — the GK promise the operator publishes
      assert(r.getAs[Boolean]("within_bound"), s"$flag err=$err")
    }
  }
}
