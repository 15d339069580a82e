package graft

import graft.functions.ClickHouseSql
import org.apache.spark.sql.functions._

/** The CH system.* introspection tables: materialized on demand from
  * the catalog + registries + parquet FOOTER metadata (never a scan),
  * queryable with ordinary WHERE/ORDER/JOIN SQL.
  */
class SystemTablesSpec extends SparkSpec {

  private def ch(s: String) = ClickHouseSql.sql(spark, s)

  private def dropAnyType(name: String): Unit = {
    if (spark.catalog.tableExists(name)) {
      val isView = spark.catalog.getTable(name).tableType == "VIEW"
      spark.sql(s"DROP ${if (isView) "VIEW" else "TABLE"} $name")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), name))
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    Seq("sysd_plain", "sysd_part", "sysd_part__parts").foreach(dropAnyType)
    ch("DROP TABLE IF EXISTS sysd_plain SYNC")
    ch("DROP TABLE IF EXISTS sysd_part SYNC")
    ch("""CREATE TABLE sysd_plain (user_id UInt64, v Nullable(Int64))
          ENGINE = ReplacingMergeTree(v) ORDER BY (user_id)""")
    ch("INSERT INTO sysd_plain VALUES (1, 10), (2, 20), (3, 30)")
    ch("""CREATE TABLE sysd_part (d Date, vc Int64)
          ENGINE = MergeTree PARTITION BY toYYYYMM(d) ORDER BY (d)""")
    ch("""INSERT INTO sysd_part VALUES
          ('2024-01-05', 1), ('2024-01-06', 2), ('2024-02-01', 3)""")
  }

  test("system.tables: engine, keys, and footer-metadata row counts") {
    val r = ch("""SELECT name, engine, partition_key, sorting_key, total_rows
                  FROM system.tables WHERE name LIKE 'sysd_%' ORDER BY name""")
      .collect().map(x => (x.getString(0), x.getString(1), x.getString(2),
        x.getString(3), x.getLong(4)))
    assert(r.toSeq === Seq(
      ("sysd_part", "MergeTree", "toYYYYMM(d)", "d", 3L),
      ("sysd_plain", "ReplacingMergeTree(v)", "", "user_id", 3L)))
    // internals (two-piece physical, projection stores) never listed
    assert(ch("SELECT count() AS n FROM system.tables WHERE name LIKE '%__parts'")
      .head().getLong(0) === 0L)
  }

  test("system.columns: declared order and normalized CH types") {
    val r = ch("""SELECT name, type, position FROM system.columns
                  WHERE table = 'sysd_plain' ORDER BY position""")
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    // UInt64 normalizes to Int64 (Spark has no unsigned) — the same
    // spelling SHOW CREATE TABLE prints
    assert(r.toSeq === Seq(("user_id", "Int64", 1L), ("v", "Nullable(Int64)", 2L)))
  }

  test("system.parts: one row per data file with partition values and footer rows") {
    val parts = ch("""SELECT partition, rows FROM system.parts
                      WHERE table = 'sysd_part' ORDER BY partition""")
      .collect().map(x => (x.getString(0), x.getLong(1)))
    // two partitions; per-partition footer row counts sum to the table
    assert(parts.map(_._1).toSet === Set("202401", "202402"))
    assert(parts.map(_._2).sum === 3L)
    val plain = ch("SELECT partition FROM system.parts WHERE table = 'sysd_plain'")
      .collect().map(_.getString(0)).toSet
    assert(plain === Set("all"))
    // metadata joins work like any relation
    val joined = ch("""SELECT t.name, sum(p.rows) AS r
                       FROM system.tables t JOIN system.parts p ON p.table = t.name
                       WHERE t.name LIKE 'sysd_%' GROUP BY t.name ORDER BY t.name""")
      .collect().map(x => (x.getString(0), x.getLong(1)))
    assert(joined.toSeq === Seq(("sysd_part", 3L), ("sysd_plain", 3L)))
  }

  test("system.databases/functions/settings/one: the introspection long tail") {
    assert(ch("SELECT name, engine FROM system.databases").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("default", "Atomic")))
    // dialect names are listed with their origin; builtins follow
    val fns = ch("""SELECT origin, count() AS n FROM system.functions
                    GROUP BY origin ORDER BY origin""").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(fns("ch_dialect") > 200, fns.toString)
    assert(fns("builtin") > 300, fns.toString)
    assert(ch("""SELECT count() AS n FROM system.functions
                 WHERE name = 'countIf'""").head().getLong(0) === 1L)
    // SET round-trips into system.settings
    ch("SET optimize_use_projections = 0")
    try assert(ch("""SELECT value FROM system.settings
                     WHERE name = 'optimize_use_projections'""")
      .head().getString(0) === "0")
    finally ch("SET optimize_use_projections = 1")
    assert(ch("SELECT dummy FROM system.one").head().getLong(0) === 0L)
  }

  test("EXPLAIN ESTIMATE reads parts/rows/marks from the footer memo, never a scan") {
    val r = ch("EXPLAIN ESTIMATE SELECT v FROM sysd_plain WHERE user_id > 1")
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2),
        x.getLong(3), x.getLong(4)))
    assert(r.length === 1)
    val (db, tbl, parts, rows, marks) = r.head
    assert(db === "default" && tbl === "sysd_plain")
    assert(rows >= 3L && parts >= 1L && marks >= 1L)
    // still read-only: a DML body is rejected before any estimate
    intercept[IllegalArgumentException] {
      ch("EXPLAIN ESTIMATE INSERT INTO sysd_plain VALUES (9, 9)")
    }
  }

  test("system.parts is memoized: a repeat over unchanged tables does ZERO footer I/O") {
    // warm: this build may open footers (distributed, not driver-serial)
    ch("SELECT count() AS n FROM system.parts WHERE table LIKE 'sysd_%'").collect()
    val before = ClickHouseSql.footerReads.get()
    val again = ch("""SELECT table, sum(rows) AS r FROM system.parts
                      WHERE table LIKE 'sysd_%' GROUP BY table ORDER BY table""")
      .collect().map(x => (x.getString(0), x.getLong(1)))
    assert(again.toSeq === Seq(("sysd_part", 3L), ("sysd_plain", 3L)))
    assert(ClickHouseSql.footerReads.get() === before,
      "unchanged file lists must answer from the footer memo")
    // …and a CONTENT change invalidates exactly the changed table
    ch("INSERT INTO sysd_plain VALUES (4, 40)")
    val r2 = ch("SELECT sum(rows) AS r FROM system.parts WHERE table = 'sysd_plain'")
      .head().getLong(0)
    assert(r2 === 4L, "new parts must be re-read, not served stale")
  }

  test("system.parts pages to PARTITION grain past the file-count threshold") {
    // sysd_part holds 2 partitions across >1 data files; a threshold of
    // 1 forces the paged path — the driver must receive |partitions|
    // rows (aggregated on the cluster), never |files|
    val fileRows = ch("""SELECT count() AS n FROM system.parts
                         WHERE table = 'sysd_part'""").head().getLong(0)
    assert(fileRows >= 2L)
    spark.conf.set("spark.graft.system.partsPageThreshold", "1")
    try {
      val paged = ch("""SELECT partition, name, rows FROM system.parts
                        WHERE table = 'sysd_part' ORDER BY partition""")
        .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2)))
      // one row per PARTITION, rows aggregated exactly
      assert(paged.map(_._1).toSeq === Seq("202401", "202402"))
      assert(paged.map(_._3).sum === 3L)
      assert(paged.forall(_._2.matches("<\\d+ files>")), paged.mkString(", "))
      // system.tables totals ride the same partition-grain memo
      val tot = ch("""SELECT total_rows FROM system.tables
                      WHERE name = 'sysd_part'""").head().getLong(0)
      assert(tot === 3L)
      // and the paged path memoizes like the per-file one
      val before = ClickHouseSql.footerReads.get()
      ch("""SELECT partition FROM system.parts WHERE table = 'sysd_part'""")
        .collect()
      assert(ClickHouseSql.footerReads.get() === before,
        "paged partition stats must answer from the memo on repeat")
    } finally
      spark.conf.set("spark.graft.system.partsPageThreshold", "100000")
  }

  override def afterAll(): Unit = {
    ch("DROP TABLE IF EXISTS sysd_plain SYNC")
    ch("DROP TABLE IF EXISTS sysd_part SYNC")
    super.afterAll()
  }
}
