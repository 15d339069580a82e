package graft

import graft.functions.ClickHouseSql
import org.apache.spark.sql.functions._

/** MergeTree projections through the CH dialect: ADD / MATERIALIZE /
  * CLEAR / DROP PROJECTION, the read-side rewrite
  * (optimize_use_projections), INSERT partial maintenance, rebuild on
  * table-rewriting verbs, and rename/drop following.
  */
class ProjectionSpec extends SparkSpec {

  private def dropAnyType(name: String): Unit = {
    if (spark.catalog.tableExists(name)) {
      val isView = spark.catalog.getTable(name).tableType == "VIEW"
      spark.sql(s"DROP ${if (isView) "VIEW" else "TABLE"} $name")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), name))
  }

  /** Fresh base table: events collapsed to integer cents (exact
    * comparisons everywhere).
    */
  private def freshBase(name: String): Unit = {
    Seq(name, name + "__proj_p_agg", name + "__proj_p_ord",
      name + "__dropped", name + "__dropped__proj_p_agg",
      name + "_renamed", name + "_renamed__proj_p_agg")
      .foreach(dropAnyType)
    ClickHouseSql.sql(spark, s"DROP TABLE IF EXISTS $name SYNC")
    sf0001.events.select(col("event_type"), col("user_id"),
      col("value").cast("decimal(18,2)").multiply(lit(100))
        .cast("bigint").as("vc"))
      .write.saveAsTable(name)
  }

  private def ch(s: String) = ClickHouseSql.sql(spark, s)

  test("aggregate projection: rewrite only after MATERIALIZE, exact answers") {
    freshBase("prj_ev")
    ch("""ALTER TABLE prj_ev ADD PROJECTION p_agg
          (SELECT event_type, user_id, sum(vc), count(), min(vc), max(vc)
           GROUP BY event_type, user_id)""")
    val q = """SELECT event_type, sum(vc) AS total, count() AS n
               FROM prj_ev GROUP BY event_type ORDER BY event_type"""
    // declared but unmaterialized: never used
    assert(ClickHouseSql.rewriteWithProjection(spark, q).isEmpty)
    ch("ALTER TABLE prj_ev MATERIALIZE PROJECTION p_agg")
    val rw = ClickHouseSql.rewriteWithProjection(spark, q)
    assert(rw.exists(_.contains("prj_ev__proj_p_agg")), rw.toString)
    val got = ch(q).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exp = spark.table("prj_ev").groupBy(col("event_type"))
      .agg(sum(col("vc")), count(lit(1))).orderBy(col("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got === exp)
  }

  test("projection covers GROUP BY subsets, WHERE on dims, min/max combine") {
    val q = """SELECT user_id, min(vc) AS lo, max(vc) AS hi
               FROM prj_ev WHERE user_id <= 10
               GROUP BY user_id ORDER BY user_id"""
    assert(ClickHouseSql.rewriteWithProjection(spark, q)
      .exists(_.contains("__proj_p_agg")))
    val got = ch(q).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exp = spark.table("prj_ev").filter(col("user_id") <= 10)
      .groupBy(col("user_id")).agg(min(col("vc")), max(col("vc")))
      .orderBy(col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got === exp)
  }

  test("ORDER BY ... LIMIT tails carry through the projection rewrite") {
    val q = """SELECT event_type, sum(vc) AS total
               FROM prj_ev GROUP BY event_type
               ORDER BY total DESC, event_type LIMIT 2"""
    assert(ClickHouseSql.rewriteWithProjection(spark, q)
      .exists(_.contains("__proj_p_agg")))
    val got = ch(q).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exp = spark.table("prj_ev").groupBy(col("event_type"))
      .agg(sum(col("vc")).as("total"))
      .orderBy(col("total").desc, col("event_type")).limit(2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === exp)
  }

  test("SET optimize_use_projections toggles the rewrite; EXPLAIN SYNTAX shows it") {
    val q = """SELECT event_type, sum(vc) AS total
               FROM prj_ev GROUP BY event_type"""
    assert(ClickHouseSql.rewriteWithProjection(spark, q).isDefined)
    ch("SET optimize_use_projections = 0")
    assert(ClickHouseSql.rewriteWithProjection(spark, q).isEmpty)
    ch("SET optimize_use_projections = 1")
    assert(ClickHouseSql.rewriteWithProjection(spark, q).isDefined)
    // EXPLAIN SYNTAX prints the dialect-rewritten text — with the
    // projection on, the store name is visible in it (CH's EXPLAIN
    // SYNTAX shows the optimized query the same way)
    val syn = ch(s"EXPLAIN SYNTAX $q").collect().map(_.getString(0)).mkString("\n")
    assert(syn.contains("prj_ev__proj_p_agg"), syn)
    val plan = ch(s"EXPLAIN $q").collect().map(_.getString(0)).mkString("\n")
    assert(plan.contains("Physical Plan"), plan.take(300))
    intercept[IllegalArgumentException] { ch(s"EXPLAIN PIPELINE $q") }
    intercept[IllegalArgumentException] { ch("SET join_algorithm = 'hash'") }
  }

  test("queries the projection cannot cover run against the base table") {
    // vc is not a dim: grouping by it must not rewrite
    assert(ClickHouseSql.rewriteWithProjection(spark,
      "SELECT vc, count() FROM prj_ev GROUP BY vc").isEmpty)
    // avg is not a stored partial
    assert(ClickHouseSql.rewriteWithProjection(spark,
      "SELECT event_type, avg(vc) FROM prj_ev GROUP BY event_type").isEmpty)
    // WHERE touching a non-dim column must not rewrite
    assert(ClickHouseSql.rewriteWithProjection(spark,
      """SELECT event_type, sum(vc) FROM prj_ev WHERE vc > 0
         GROUP BY event_type""").isEmpty)
    // joins never rewrite
    assert(ClickHouseSql.rewriteWithProjection(spark,
      """SELECT a.event_type, sum(a.vc) FROM prj_ev a
         JOIN prj_ev b ON a.user_id = b.user_id
         GROUP BY a.event_type""").isEmpty)
  }

  test("INSERT appends a partial part; answers stay exact without rebuild") {
    val before = spark.table("prj_ev__proj_p_agg").count()
    ch("""INSERT INTO prj_ev VALUES
          ('click', 1, 12345), ('click', 1, 55), ('purchase', 9999, 777)""")
    // the store grew by appended partials — it was NOT rewritten
    assert(spark.table("prj_ev__proj_p_agg").count() > before)
    val q = """SELECT event_type, sum(vc) AS total, count() AS n
               FROM prj_ev GROUP BY event_type ORDER BY event_type"""
    val got = ch(q).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exp = spark.table("prj_ev").groupBy(col("event_type"))
      .agg(sum(col("vc")), count(lit(1))).orderBy(col("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got === exp)
  }

  test("mutations rebuild the projection store (CH merge recalculation)") {
    ch("ALTER TABLE prj_ev DELETE WHERE user_id = 1")
    val q = """SELECT event_type, sum(vc) AS total, count() AS n
               FROM prj_ev GROUP BY event_type ORDER BY event_type"""
    val got = ch(q).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exp = spark.table("prj_ev").groupBy(col("event_type"))
      .agg(sum(col("vc")), count(lit(1))).orderBy(col("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got === exp)
    assert(spark.table("prj_ev").filter(col("user_id") === 1).isEmpty)
  }

  test("RENAME carries the projection; CLEAR parks it; DROP removes it") {
    ch("RENAME TABLE prj_ev TO prj_ev_renamed")
    val q = """SELECT event_type, sum(vc) AS total
               FROM prj_ev_renamed GROUP BY event_type"""
    assert(ClickHouseSql.rewriteWithProjection(spark, q)
      .exists(_.contains("prj_ev_renamed__proj_p_agg")))
    ch("RENAME TABLE prj_ev_renamed TO prj_ev")
    ch("ALTER TABLE prj_ev CLEAR PROJECTION p_agg")
    val q2 = q.replace("prj_ev_renamed", "prj_ev")
    assert(ClickHouseSql.rewriteWithProjection(spark, q2).isEmpty)
    ch("ALTER TABLE prj_ev MATERIALIZE PROJECTION p_agg")
    assert(ClickHouseSql.rewriteWithProjection(spark, q2).isDefined)
    ch("ALTER TABLE prj_ev DROP PROJECTION p_agg")
    assert(ClickHouseSql.rewriteWithProjection(spark, q2).isEmpty)
    assert(!spark.catalog.tableExists("prj_ev__proj_p_agg"))
    // idempotent guards
    ch("ALTER TABLE prj_ev DROP PROJECTION IF EXISTS p_agg")
    intercept[IllegalArgumentException] {
      ch("ALTER TABLE prj_ev DROP PROJECTION p_agg")
    }
  }

  test("sort projection: SELECT * filtered on the leading key reads the sorted copy") {
    ch("ALTER TABLE prj_ev ADD PROJECTION p_ord (SELECT * ORDER BY user_id, vc)")
    ch("ALTER TABLE prj_ev MATERIALIZE PROJECTION p_ord")
    val q = "SELECT * FROM prj_ev WHERE user_id = 7"
    assert(ClickHouseSql.rewriteWithProjection(spark, q)
      .exists(_.contains("prj_ev__proj_p_ord")))
    val got = ch(q).orderBy(col("event_type"), col("vc"))
      .collect().map(_.toSeq)
    val exp = spark.table("prj_ev").filter(col("user_id") === 7)
      .orderBy(col("event_type"), col("vc")).collect().map(_.toSeq)
    assert(got === exp)
    // a filter that never touches the sort key stays on the base table
    assert(ClickHouseSql.rewriteWithProjection(spark,
      "SELECT * FROM prj_ev WHERE event_type = 'click'").isEmpty)
    ch("ALTER TABLE prj_ev DROP PROJECTION p_ord")
  }

  test("projection on a PARTITION BY table: rewrite, INSERT maintenance") {
    Seq("prj_part", "prj_part__parts", "prj_part__proj_pp").foreach(dropAnyType)
    ch("DROP TABLE IF EXISTS prj_part SYNC")
    ch("""CREATE TABLE prj_part (d Date, event_type String, vc Int64)
          ENGINE = MergeTree PARTITION BY toYYYYMM(d) ORDER BY (event_type)""")
    ch("""INSERT INTO prj_part VALUES
          ('2024-01-05', 'click', 10), ('2024-01-06', 'click', 5),
          ('2024-02-01', 'view', 7)""")
    ch("ALTER TABLE prj_part ADD PROJECTION pp (SELECT event_type, sum(vc), count() GROUP BY event_type)")
    ch("ALTER TABLE prj_part MATERIALIZE PROJECTION pp")
    ch("INSERT INTO prj_part VALUES ('2024-02-09', 'view', 100)")
    val q = """SELECT event_type, sum(vc) AS total, count() AS n
               FROM prj_part GROUP BY event_type ORDER BY event_type"""
    assert(ClickHouseSql.rewriteWithProjection(spark, q)
      .exists(_.contains("prj_part__proj_pp")))
    val got = ch(q).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(("click", 15L, 2L), ("view", 107L, 2L)))
    ch("DROP TABLE prj_part SYNC")
  }

  test("partition verbs rebuild live projections (DROP / ATTACH FROM)") {
    Seq("prj_pv", "prj_pv__parts", "prj_pv__proj_pv",
      "prj_pv2", "prj_pv2__parts").foreach(dropAnyType)
    ch("DROP TABLE IF EXISTS prj_pv SYNC")
    ch("DROP TABLE IF EXISTS prj_pv2 SYNC")
    ch("""CREATE TABLE prj_pv (d Date, event_type String, vc Int64)
          ENGINE = MergeTree PARTITION BY toYYYYMM(d) ORDER BY (event_type)""")
    ch("""INSERT INTO prj_pv VALUES
          ('2024-01-05', 'click', 10), ('2024-01-06', 'click', 5),
          ('2024-02-01', 'click', 7)""")
    ch("ALTER TABLE prj_pv ADD PROJECTION pv (SELECT event_type, sum(vc) GROUP BY event_type)")
    ch("ALTER TABLE prj_pv MATERIALIZE PROJECTION pv")
    val q = "SELECT event_type, sum(vc) AS s FROM prj_pv GROUP BY event_type"
    assert(ch(q).head().getLong(1) === 22L)
    // DROP PARTITION's NATIVE (metadata) path must not leave the
    // projection store answering with the dropped partition's rows
    ch("ALTER TABLE prj_pv DROP PARTITION 202401")
    assert(ClickHouseSql.rewriteWithProjection(spark, q)
      .exists(_.contains("prj_pv__proj_pv")))
    assert(ch(q).collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("click", 7L)))
    // ATTACH … FROM appends parts outside the INSERT hook — the
    // covered answer must include them
    ch("""CREATE TABLE prj_pv2 (d Date, event_type String, vc Int64)
          ENGINE = MergeTree PARTITION BY toYYYYMM(d) ORDER BY (event_type)""")
    ch("INSERT INTO prj_pv2 VALUES ('2024-03-01', 'click', 100)")
    ch("ALTER TABLE prj_pv ATTACH PARTITION 202403 FROM prj_pv2")
    assert(ch(q).collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("click", 107L)))
    ch("DROP TABLE prj_pv SYNC")
    ch("DROP TABLE prj_pv2 SYNC")
  }

  test("EXPLAIN never mutates: non-SELECT bodies are rejected up front") {
    freshBase("prj_expl")
    val n0 = spark.table("prj_expl").count()
    val e = intercept[IllegalArgumentException] {
      ch("EXPLAIN INSERT INTO prj_expl VALUES ('click', 1, 10)")
    }
    assert(e.getMessage.contains("never mutate"), e.getMessage)
    intercept[IllegalArgumentException] {
      ch("EXPLAIN AST TRUNCATE TABLE prj_expl")
    }
    assert(spark.table("prj_expl").count() === n0,
      "EXPLAIN of a DML verb must not execute it")
    // WITH bodies stay explainable
    assert(ch("EXPLAIN WITH x AS (SELECT 1 AS a) SELECT a FROM x").count() > 0)
  }

  test("SUM over DECIMAL keeps its result type through the projection rewrite") {
    Seq("prj_dec", "prj_dec__proj_pd").foreach(dropAnyType)
    ch("DROP TABLE IF EXISTS prj_dec SYNC")
    ch("""CREATE TABLE prj_dec (event_type String, dv Decimal(18,2))
          ENGINE = MergeTree ORDER BY (event_type)""")
    ch("INSERT INTO prj_dec VALUES ('click', 1.25), ('click', 2.50), ('view', 3.00)")
    ch("ALTER TABLE prj_dec ADD PROJECTION pd (SELECT event_type, sum(dv) GROUP BY event_type)")
    ch("ALTER TABLE prj_dec MATERIALIZE PROJECTION pd")
    val q = "SELECT event_type, sum(dv) AS s FROM prj_dec GROUP BY event_type ORDER BY event_type"
    assert(ClickHouseSql.rewriteWithProjection(spark, q)
      .exists(_.contains("prj_dec__proj_pd")))
    val covered = ch(q)
    ch("SET optimize_use_projections = 0")
    val base = try ch(q) finally ch("SET optimize_use_projections = 1")
    // the same query's schema must not depend on whether a projection
    // matched: the store holds sum-widened DECIMAL(p+10,s) partials and
    // a bare re-SUM would widen again to p+20
    assert(covered.schema("s").dataType === base.schema("s").dataType,
      s"covered=${covered.schema("s").dataType} base=${base.schema("s").dataType}")
    assert(covered.collect().map(r => (r.getString(0), r.getDecimal(1).toPlainString)).toSeq
      === base.collect().map(r => (r.getString(0), r.getDecimal(1).toPlainString)).toSeq)
    ch("DROP TABLE prj_dec SYNC")
  }

  test("CREATE TABLE a AS b clones structure, registries, and projections — not data") {
    Seq("prj_clone_src", "prj_clone_dst", "prj_clone_src__proj_pc",
      "prj_clone_dst__proj_pc").foreach(dropAnyType)
    ch("DROP TABLE IF EXISTS prj_clone_src SYNC")
    ch("DROP TABLE IF EXISTS prj_clone_dst SYNC")
    ch("""CREATE TABLE prj_clone_src (user_id UInt64, event_type String, vc Int64,
          PROJECTION pc (SELECT event_type, sum(vc) GROUP BY event_type))
          ENGINE = MergeTree ORDER BY (user_id)""")
    ch("INSERT INTO prj_clone_src VALUES (1, 'click', 10)")
    ch("CREATE TABLE prj_clone_dst AS prj_clone_src")
    // structure + registries carried, data NOT
    assert(spark.table("prj_clone_dst").columns.toSeq ===
      Seq("user_id", "event_type", "vc"))
    assert(spark.table("prj_clone_dst").isEmpty)
    val show = ch("SHOW CREATE TABLE prj_clone_dst").head().getString(0)
    assert(show.contains("PROJECTION pc"), show)
    assert(show.contains("ORDER BY (user_id)"), show)
    // the cloned projection activates independently of the source's
    ch("INSERT INTO prj_clone_dst VALUES (2, 'view', 7)")
    ch("ALTER TABLE prj_clone_dst MATERIALIZE PROJECTION pc")
    val q = "SELECT event_type, sum(vc) AS s FROM prj_clone_dst GROUP BY event_type"
    assert(ClickHouseSql.rewriteWithProjection(spark, q)
      .exists(_.contains("prj_clone_dst__proj_pc")))
    assert(ch(q).collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("view", 7L)))
    ch("DROP TABLE prj_clone_src SYNC")
    ch("DROP TABLE prj_clone_dst SYNC")
  }

  test("projections round-trip through SHOW CREATE TABLE / inline CREATE") {
    Seq("prj_rt", "prj_rt2", "prj_rt__proj_p1", "prj_rt2__proj_p1")
      .foreach(dropAnyType)
    ch("DROP TABLE IF EXISTS prj_rt SYNC")
    ch("DROP TABLE IF EXISTS prj_rt2 SYNC")
    ch("""CREATE TABLE prj_rt (user_id UInt64, event_type String, vc Int64,
          PROJECTION p1 (SELECT event_type, sum(vc), count()
                         GROUP BY event_type))
          ENGINE = MergeTree ORDER BY (user_id)""")
    val show = ch("SHOW CREATE TABLE prj_rt").head().getString(0)
    assert(show.contains("PROJECTION p1 (SELECT event_type, sum(vc), " +
      "count() GROUP BY event_type)"), show)
    // fixed point: re-running the printed DDL declares the same table +
    // projection under another name, and ITS show is the same modulo name
    ch(show.replace("prj_rt", "prj_rt2"))
    val show2 = ch("SHOW CREATE TABLE prj_rt2").head().getString(0)
    assert(show2 === show.replace("prj_rt", "prj_rt2"))
    // inline-declared projections activate with MATERIALIZE like
    // ALTER-added ones, and INSERTs maintain them
    ch("INSERT INTO prj_rt2 VALUES (1, 'click', 10), (2, 'click', 5), (3, 'view', 7)")
    ch("ALTER TABLE prj_rt2 MATERIALIZE PROJECTION p1")
    ch("INSERT INTO prj_rt2 VALUES (4, 'view', 100)")
    val q = """SELECT event_type, sum(vc) AS s, count() AS n
               FROM prj_rt2 GROUP BY event_type ORDER BY event_type"""
    assert(ClickHouseSql.rewriteWithProjection(spark, q)
      .exists(_.contains("prj_rt2__proj_p1")))
    val got = ch(q).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(("click", 15L, 2L), ("view", 107L, 2L)))
    ch("DROP TABLE prj_rt SYNC")
    ch("DROP TABLE prj_rt2 SYNC")
  }
}
