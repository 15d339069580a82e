package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Set operators: UNION ALL / UNION DISTINCT / INTERSECT / EXCEPT. */
object Sets {

  // q18 — UNION ALL + UNION (dedup) over two slices, then aggregate.
  // The distinct union is a hash-aggregate on the union keys — one shuffle.
  val q18 = Q(
    "q18_union",
    Some("""
      WITH hi AS (SELECT o_custkey AS k, 'hi' AS tag FROM orders WHERE o_totalprice > 400000),
           ur AS (SELECT o_custkey AS k, 'urgent' AS tag FROM orders WHERE o_orderpriority = '1-URGENT')
      SELECT k, tag, COUNT(*) AS n
      FROM (SELECT * FROM hi UNION ALL SELECT * FROM ur)
      GROUP BY k, tag
      ORDER BY k, tag
    """)
  ) { t =>
    val hi = t.orders.filter(col("o_totalprice") > 400000)
      .select(col("o_custkey").as("k"), lit("hi").as("tag"))
    val ur = t.orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("k"), lit("urgent").as("tag"))
    hi.unionAll(ur)
      .groupBy(col("k"), col("tag"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("k"), col("tag"))
  }

  // q19 — INTERSECT and EXCEPT between customer key-sets, tagged and unioned.
  val q19 = Q(
    "q19_intersect_except",
    Some("""
      WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
           o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
      SELECT 'both' AS side, o_custkey FROM (SELECT o_custkey FROM f INTERSECT SELECT o_custkey FROM o)
      UNION ALL
      SELECT 'f_only' AS side, o_custkey FROM (SELECT o_custkey FROM f EXCEPT SELECT o_custkey FROM o)
      ORDER BY side, o_custkey
    """)
  ) { t =>
    val f = t.orders.filter(col("o_orderstatus") === "F").select(col("o_custkey")).distinct()
    val o = t.orders.filter(col("o_orderstatus") === "O").select(col("o_custkey")).distinct()
    f.intersect(o).select(lit("both").as("side"), col("o_custkey"))
      .unionAll(f.except(o).select(lit("f_only").as("side"), col("o_custkey")))
      .orderBy(col("side"), col("o_custkey"))
  }

  val all: Seq[Q] = Seq(q18, q19)
}
