package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Spatial operators (SURVEY.md §2a extension): distance-bounded spatial
  * joins via grid-cell bucketing — the ClickHouse geo-surface analog
  * (pointInPolygon / greatCircleDistance neighborhoods) expressed as a
  * Spark-first equi-join.
  *
  * The naive "every point within radius R of every other point" is a
  * cross join. The scalable shape buckets both relations into R-sized
  * grid cells and replicates the SMALLER side to its 3×3 neighbor cells,
  * turning the range predicate into an equi-join on the cell id plus a
  * cheap post-filter: every true match is within one cell of its partner
  * (|dx| ≤ R ⇒ adjacent cell), so recall is exact, and the join fans out
  * at most 9× the small side. At 100 TB both sides shuffle hash-keyed by
  * cell; per-task work is bounded by cell occupancy (cell size = R keeps
  * the probe neighborhood constant), and a skewed cell is AQE's skew-join
  * case, not a plan change. Coordinates here are synthesized from the
  * keys with decorrelated multiplicative hashes (the tables carry no geo
  * columns) and all arithmetic is integer-exact, so the DuckDB oracle
  * reproduces every distance bit-for-bit.
  */
object Geo {

  private val World = 100000L // coordinate space per axis
  private val R = 2000L       // match radius = grid cell size
  private val R2 = R * R

  private def coord(key: String, mult: Long) =
    (col(key) * mult) % 2147483648L % World

  // q87_grid_join — "suppliers within R of each customer", grid-bucketed:
  // supplier side (the small one) replicated to 9 neighbor cells, customer
  // side probes its own cell only; exact integer d² filter; per-nation
  // match report.
  val q87 = Q(
    "q87_grid_join",
    Some(s"""
      WITH c AS (
        SELECT c_custkey, c_nationkey,
               (c_custkey * 2654435761) % 2147483648 % $World AS x,
               (c_custkey * 1885706077) % 2147483648 % $World AS y
        FROM customer),
      s AS (
        SELECT s_suppkey,
               (s_suppkey * 3266489917) % 2147483648 % $World AS x,
               (s_suppkey * 2971215073) % 2147483648 % $World AS y
        FROM supplier),
      sc AS (
        SELECT s.s_suppkey, s.x, s.y,
               (s.x // $R) + dx AS cx, (s.y // $R) + dy AS cy
        FROM s, UNNEST([-1, 0, 1]) AS t1(dx), UNNEST([-1, 0, 1]) AS t2(dy)),
      pairs AS (
        SELECT c.c_custkey, c.c_nationkey, sc.s_suppkey,
               (c.x - sc.x) * (c.x - sc.x) + (c.y - sc.y) * (c.y - sc.y) AS d2
        FROM c JOIN sc ON (c.x // $R) = sc.cx AND (c.y // $R) = sc.cy
        WHERE (c.x - sc.x) * (c.x - sc.x) + (c.y - sc.y) * (c.y - sc.y) <= $R2)
      SELECT n.n_name,
             CAST(COUNT(DISTINCT p.c_custkey) AS BIGINT) AS n_matched_customers,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(MIN(p.d2) AS BIGINT) AS min_d2
      FROM pairs p JOIN nation n ON n.n_nationkey = p.c_nationkey
      GROUP BY n.n_name ORDER BY n.n_name
    """)
  ) { t =>
    val c = t.customer.select(
      col("c_custkey"), col("c_nationkey"),
      coord("c_custkey", 2654435761L).as("x"),
      coord("c_custkey", 1885706077L).as("y"))
    val s = t.supplier.select(
      col("s_suppkey"),
      coord("s_suppkey", 3266489917L).as("x"),
      coord("s_suppkey", 2971215073L).as("y"))
    val offs = array(lit(-1L), lit(0L), lit(1L))
    // supplier → 9 neighbor cells; at this scale the replicated side is
    // broadcast; on two large relations the same plan shuffles by (cx,cy)
    val sc = s
      .withColumn("dx", explode(offs))
      .withColumn("dy", explode(offs))
      .select(col("s_suppkey"), col("x").as("sx"), col("y").as("sy"),
        (expr(s"x div $R") + col("dx")).as("cx"),
        (expr(s"y div $R") + col("dy")).as("cy"))
    val dx = col("x") - col("sx")
    val dy = col("y") - col("sy")
    val pairs = c
      .join(broadcast(sc),
        expr(s"x div $R") === col("cx") && expr(s"y div $R") === col("cy"))
      .withColumn("d2", dx * dx + dy * dy)
      .filter(col("d2") <= R2)
    pairs
      .join(broadcast(t.nation), col("n_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        countDistinct(col("c_custkey")).cast(LongType).as("n_matched_customers"),
        count(lit(1)).cast(LongType).as("n_pairs"),
        min(col("d2")).cast(LongType).as("min_d2"))
      .orderBy(col("n_name"))
  }

  // q101_geohash — ClickHouse geohashEncode as a data-skipping key:
  // interleave 10-bit (lat, lon) into a 20-bit Morton code (lon on odd
  // bits, lat on even — the geohash bit order), render 4 base32
  // characters, and report occupancy per cell. The encode is a pure
  // per-row bit expression GENERATED once and emitted to both engines
  // (no UDF — it stays inside whole-stage codegen, and the oracle runs
  // the same generated arithmetic), exactly how a write path would
  // compute a geo clustering key at 100 TB. The rollup is one
  // aggregation; top cells via TakeOrdered on the aggregated relation.
  private val GeohashAlphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  // Σ_i lon_bit_i·2^(2i+1) + lat_bit_i·2^(2i), emitted per dialect
  private def mortonSql(lat: String, lon: String, shift: (String, Int) => String): String =
    (0 until 10).map { i =>
      s"(${shift(lon, i)} & 1) * ${1L << (2 * i + 1)} + (${shift(lat, i)} & 1) * ${1L << (2 * i)}"
    }.mkString(" + ")

  val q101 = Q(
    "q101_geohash",
    Some {
      val m = mortonSql("lat", "lon", (c, i) => s"($c >> $i)")
      val chars = (0 to 3)
        .map(j => s"SUBSTR('$GeohashAlphabet', CAST((g >> ${5 * (3 - j)}) & 31 AS INTEGER) + 1, 1)")
        .mkString(" || ")
      s"""
      WITH pts AS (
        SELECT c_custkey, c_nationkey,
               (c_custkey * 2654435761) % 2147483648 % 1024 AS lat,
               (c_custkey * 1885706077) % 2147483648 % 1024 AS lon
        FROM customer),
      coded AS (SELECT c_custkey, c_nationkey, $m AS g FROM pts),
      cells AS (SELECT $chars AS cell, c_custkey, c_nationkey FROM coded)
      SELECT cell,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations
      FROM cells
      GROUP BY cell
      ORDER BY n_customers DESC, cell
      LIMIT 10
    """
    }
  ) { t =>
    val pts = t.customer.select(
      col("c_custkey"), col("c_nationkey"),
      ((col("c_custkey") * 2654435761L) % 2147483648L % 1024).as("lat"),
      ((col("c_custkey") * 1885706077L) % 2147483648L % 1024).as("lon"))
    val morton = (0 until 10).map { i =>
      shiftright(col("lon"), i).bitwiseAND(1) * (1L << (2 * i + 1)) +
        shiftright(col("lat"), i).bitwiseAND(1) * (1L << (2 * i))
    }.reduce(_ + _)
    val coded = pts.withColumn("g", morton)
    val cell = concat((0 to 3).map(j =>
      lit(GeohashAlphabet)
        .substr(shiftright(col("g"), 5 * (3 - j)).bitwiseAND(31).cast("int") + 1,
          lit(1))): _*)
    coded.withColumn("cell", cell)
      .groupBy(col("cell"))
      .agg(count(lit(1)).cast(LongType).as("n_customers"),
        countDistinct(col("c_nationkey")).cast(LongType).as("n_nations"))
      .orderBy(col("n_customers").desc, col("cell"))
      .limit(10)
  }

  val all: Seq[Q] = Seq(q87, q101)
}
