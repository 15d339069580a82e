package graft

import graft.functions.ClickHouseDialect
import org.apache.spark.sql.functions._

/** ClickHouse SQL text running unchanged on graft sessions. */
class ClickHouseDialectSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    ClickHouseDialect.register(spark)
    sf0001.orders.createOrReplaceTempView("orders_v")
  }

  test("countIf/sumIf/argMax/quantileExact from SQL text") {
    val r = spark.sql("""
      SELECT countIf(o_orderstatus = 'F') AS nf,
             sumIf(o_totalprice, o_totalprice > 400000) AS big,
             argMax(o_orderkey, o_totalprice) AS best,
             quantileExact(0.5, o_totalprice) AS med,
             uniqExact(o_custkey) AS uc
      FROM orders_v
    """).head()
    val exp = sf0001.orders.agg(
      count(when(col("o_orderstatus") === "F", 1)),
      sum(when(col("o_totalprice") > 400000, col("o_totalprice"))),
      max_by(col("o_orderkey"), col("o_totalprice")),
      percentile(col("o_totalprice"), lit(0.5)),
      countDistinct(col("o_custkey"))).head()
    assert(r.getLong(0) === exp.getLong(0))
    // double sums are partition-order dependent — relative tolerance
    assert(math.abs(r.getDouble(1) - exp.getDouble(1)) / exp.getDouble(1) < 1e-12)
    assert(r.getLong(2) === exp.getLong(2))
    assert(r.getDouble(3) === exp.getDouble(3))
    assert(r.getLong(4) === exp.getLong(4))
  }

  test("uniq approximates, groupArray collects, toStartOfMonth truncates") {
    val r = spark.sql("""
      SELECT uniq(o_custkey) AS u,
             size(groupArray(o_orderkey)) AS n,
             toStartOfMonth(MIN(o_orderdate)) AS m
      FROM orders_v
    """).head()
    val exact = sf0001.orders.select(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(math.abs(r.getLong(0) - exact).toDouble / exact < 0.05)
    assert(r.getInt(1).toLong === sf0001.orders.count())
    assert(r.getTimestamp(2).toString.endsWith("-01 00:00:00.0"))
  }

  test("arrayJoin explodes in SQL") {
    val n = spark.sql("SELECT arrayJoin(array(1, 2, 3)) AS x").count()
    assert(n === 3)
  }
}
