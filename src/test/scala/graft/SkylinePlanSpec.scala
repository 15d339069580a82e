package graft

import graft.plans.SkylinePerGroup
import org.apache.spark.sql.functions._

class SkylinePlanSpec extends SparkSpec {

  test("two-phase physical shape: partial exec below the exchange, final above") {
    val df = SkylinePerGroup.skyline(
      sf0001.orders.select(col("o_orderpriority"), col("o_orderkey"),
        col("o_totalprice"), col("o_orderdate")),
      Seq("o_orderpriority"),
      Seq(("o_totalprice", "asc"), ("o_orderdate", "desc"), ("o_orderkey", "asc")),
      "o_orderdate")
    df.collect()
    val top = df.queryExecution.executedPlan
    val finalPlan = top match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val planStr = finalPlan.toString
    assert(planStr.split("SkylinePerGroup ").length - 1 === 2,
      s"expected partial+final SkylinePerGroupExec in:\n$planStr")
    assert(planStr.contains(", true") && planStr.contains(", false"),
      s"expected one partial and one final phase in:\n$planStr")
    assert(planStr.contains("Exchange"), "shuffle between the phases")
  }

  test("results equal the window running-max formulation") {
    import org.apache.spark.sql.expressions.Window
    val base = sf0001.orders.select(col("o_orderpriority"), col("o_orderkey"),
      col("o_totalprice"), col("o_orderdate"))
    val custom = SkylinePerGroup.skyline(base, Seq("o_orderpriority"),
      Seq(("o_totalprice", "asc"), ("o_orderdate", "desc"), ("o_orderkey", "asc")),
      "o_orderdate")
      .select(col("o_orderpriority"), col("o_orderkey"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderdate").desc, col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val window = base
      .withColumn("best_prev", max(col("o_orderdate")).over(w))
      .filter(col("best_prev").isNull || col("o_orderdate") > col("best_prev"))
      .select(col("o_orderpriority"), col("o_orderkey"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(custom === window)
    assert(custom.nonEmpty)
  }

  test("merge exactness across many partitions: matches a brute-force dominance check") {
    // Random 2-D points over a deliberately HIGH partition count so the
    // final merge sees many overlapping local fronts; dominance replayed
    // quadratically per group on the driver (deterministic LCG data).
    import spark.implicits._
    val pts = (0 until 5000).map { i =>
      val g = i % 3
      val price = ((i.toLong * 48271 + 11) % 997).toDouble
      val date = ((i.toLong * 16807 + 7) % 911)
      (g.toLong, i.toLong, price, date)
    }
    val df = pts.toDF("g", "id", "price", "d").repartition(17)
    val got = SkylinePerGroup.skyline(df, Seq("g"),
      Seq(("price", "asc"), ("d", "desc"), ("id", "asc")), "d")
      .select(col("g"), col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: the sorted running-max identity per group
    // .toSeq before flatMap: flatMapping a Map of (g → rows) into (g, id)
    // tuples would rebuild a MAP and collapse all ids per group
    val expect = pts.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
      val sorted = rows.sortBy(p => (p._3, -p._4, p._2))
      var best = Long.MinValue
      sorted.flatMap { p =>
        if (p._4 > best) { best = p._4; Some((g, p._2)) } else None
      }
    }.toSet
    assert(got === expect)
  }

  test("partial-flush path: >64k in-flight groups in one task still yields the exact front") {
    // 70k distinct groups through a SINGLE input partition trips the
    // MaxInFlightGroups flush: the partial pass emits several staircase
    // batches per group and the final pass must re-merge them (same
    // contract as TopKPerGroupExec's heap flush).
    import spark.implicits._
    val n = 70000
    val rows = (0 until n).flatMap { g =>
      // per group: (price, d) = (1, 5) survives, (2, 9) survives,
      // (3, 7) dominated by (2, 9)
      Seq((g.toLong, g.toLong * 10 + 1, 1.0, 5L),
        (g.toLong, g.toLong * 10 + 2, 2.0, 9L),
        (g.toLong, g.toLong * 10 + 3, 3.0, 7L))
    }
    val df = rows.toDF("g", "id", "price", "d").coalesce(1)
    val got = SkylinePerGroup.skyline(df, Seq("g"),
      Seq(("price", "asc"), ("d", "desc"), ("id", "asc")), "d")
      .collect()
      .map(r => (r.getAs[Long]("g"), r.getAs[Long]("id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(got.size === n, s"expected $n groups, got ${got.size}")
    (0 until n by 7001).foreach { g =>
      assert(got(g.toLong) === Seq(g.toLong * 10 + 1, g.toLong * 10 + 2),
        s"group $g wrong: ${got(g.toLong)}")
    }
    assert(got.valuesIterator.forall(_.length == 2))
  }
}
