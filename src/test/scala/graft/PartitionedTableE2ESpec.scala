package graft

import graft.functions.{ClickHouseDialect, ClickHouseSql}
import org.apache.spark.sql.functions._

/** End-to-end interactions of the PARTITION BY two-piece layout
  * (physical `__parts` table + declared-order view) with the REST of
  * the dialect surface: mutations, OPTIMIZE FINAL, column DDL, RENAME/
  * EXCHANGE, materialized-view triggers, TRUNCATE. Every path must keep
  * the DECLARED column order at the read surface and real partition
  * pruning underneath — the round-7 regression class (silently
  * miscolumned positional INSERTs) must stay impossible.
  */
class PartitionedTableE2ESpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    ClickHouseDialect.register(spark)
  }

  private def ch(sql: String) = ClickHouseSql.sql(spark, sql)

  private def dropAnyType(name: String): Unit = {
    if (spark.catalog.tableExists(name)) {
      val isView = spark.catalog.getTable(name).tableType == "VIEW"
      spark.sql(s"DROP ${if (isView) "VIEW" else "TABLE"} $name")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), name))
  }

  test("mutations on a partitioned table keep declared order and partitioning") {
    Seq("pt_mut", "pt_mut__parts").foreach(dropAnyType)
    ch("""
      CREATE TABLE pt_mut (k UInt64, status String, amount Decimal(10, 2), d Date)
      ENGINE = MergeTree PARTITION BY toYYYYMM(d) ORDER BY (k)
    """)
    ch("""INSERT INTO pt_mut VALUES
      (1, 'open', 10.00, '2024-01-05'), (2, 'open', 20.00, '2024-01-20'),
      (3, 'closed', 30.00, '2024-02-10'), (4, 'open', 40.00, '2024-02-15')""")
    // ALTER UPDATE: assigned column changes, order intact, rows intact
    ch("ALTER TABLE pt_mut UPDATE status = 'late' WHERE d < '2024-02-01'")
    assert(spark.table("pt_mut").columns.toSeq ===
      Seq("k", "status", "amount", "d"))
    val afterUpd = spark.table("pt_mut").orderBy("k").collect()
    assert(afterUpd.map(_.getString(1)).toSeq ===
      Seq("late", "late", "closed", "open"))
    // the physical table is still partitioned (overwrite did not flatten)
    import scala.jdk.CollectionConverters._
    val pcols = spark.catalog.listColumns("pt_mut__parts").collectAsList()
      .asScala.filter(_.isPartition).map(_.name)
    assert(pcols.toSeq === Seq("__ch_part"))
    // ALTER DELETE: cond-true rows go, others stay
    ch("ALTER TABLE pt_mut DELETE WHERE status = 'closed'")
    assert(spark.table("pt_mut").orderBy("k").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L))
    // lightweight DELETE FROM
    ch("DELETE FROM pt_mut WHERE k = 4")
    assert(spark.table("pt_mut").count() === 2L)
    // DROP PARTITION still prunes a month after all the rewrites
    ch("ALTER TABLE pt_mut DROP PARTITION 202401")
    assert(spark.table("pt_mut").count() === 0L)
    ch("DROP TABLE pt_mut")
  }

  test("OPTIMIZE FINAL merges a partitioned ReplacingMergeTree in place") {
    Seq("pt_opt", "pt_opt__parts").foreach(dropAnyType)
    ch("""
      CREATE TABLE pt_opt (k UInt64, v String, ver UInt64, d Date)
      ENGINE = ReplacingMergeTree(ver) PARTITION BY toYYYYMM(d) ORDER BY (k)
    """)
    ch("""INSERT INTO pt_opt VALUES
      (1, 'old', 1, '2024-01-05'), (1, 'new', 2, '2024-01-06'),
      (2, 'only', 1, '2024-02-10')""")
    assert(spark.table("pt_opt").count() === 3L)
    ch("OPTIMIZE TABLE pt_opt FINAL")
    val merged = spark.table("pt_opt").orderBy("k").collect()
    assert(merged.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "new"), (2L, "only")))
    // still partitioned + prunable after the in-place merge
    import org.apache.spark.sql.execution.FormattedMode
    val plan = ch("SELECT k FROM pt_opt WHERE toYYYYMM(d) = 202402")
      .queryExecution.explainString(FormattedMode)
    assert(plan.contains("PartitionFilters"), plan.take(1200))
    // OPTIMIZE ... DEDUPLICATE composes too
    ch("INSERT INTO pt_opt VALUES (2, 'only', 1, '2024-02-10')")
    ch("OPTIMIZE TABLE pt_opt DEDUPLICATE")
    assert(spark.table("pt_opt").count() === 2L)
    ch("DROP TABLE pt_opt")
  }

  test("column DDL rebuilds both pieces, keeping partitioning and order") {
    Seq("pt_ddl", "pt_ddl__parts").foreach(dropAnyType)
    ch("""
      CREATE TABLE pt_ddl (k UInt64, name String, mon String)
      ENGINE = MergeTree PARTITION BY mon ORDER BY (k)
    """)
    ch("INSERT INTO pt_ddl VALUES (1, 'a', '2024-01'), (2, 'b', '2024-02')")
    // ADD COLUMN AFTER: position honored, CH zero default backfilled
    ch("ALTER TABLE pt_ddl ADD COLUMN score UInt64 AFTER name")
    assert(spark.table("pt_ddl").columns.toSeq ===
      Seq("k", "name", "score", "mon"))
    assert(spark.table("pt_ddl").agg(sum("score")).head().getLong(0) === 0L)
    // the rebuild kept REAL partitioning
    import scala.jdk.CollectionConverters._
    def pcolsOf(t: String) = spark.catalog.listColumns(t).collectAsList()
      .asScala.filter(_.isPartition).map(_.name).toSeq
    assert(pcolsOf("pt_ddl__parts") === Seq("mon"))
    // positional INSERT binds to the NEW declared order
    ch("INSERT INTO pt_ddl VALUES (3, 'c', 7, '2024-03')")
    val r3 = spark.table("pt_ddl").filter(col("k") === 3).head()
    assert(r3.getString(1) === "c" && r3.getLong(2) === 7L &&
      r3.getString(3) === "2024-03")
    // RENAME COLUMN keeps data; MODIFY retypes in place
    ch("ALTER TABLE pt_ddl RENAME COLUMN score TO pts")
    assert(spark.table("pt_ddl").columns.toSeq ===
      Seq("k", "name", "pts", "mon"))
    ch("ALTER TABLE pt_ddl MODIFY COLUMN pts String")
    assert(spark.table("pt_ddl").schema("pts").dataType.sql === "STRING")
    assert(spark.table("pt_ddl").filter(col("k") === 3)
      .head().getString(2) === "7")
    // DROP COLUMN works; dropping the partition column fails loudly
    ch("ALTER TABLE pt_ddl DROP COLUMN pts")
    assert(spark.table("pt_ddl").columns.toSeq === Seq("k", "name", "mon"))
    val err = intercept[IllegalArgumentException] {
      ch("ALTER TABLE pt_ddl DROP COLUMN mon")
    }
    assert(err.getMessage.contains("partition column"))
    ch("DROP TABLE pt_ddl")
  }

  test("RENAME and EXCHANGE follow the two-piece layout") {
    Seq("pt_rn_a", "pt_rn_a__parts", "pt_rn_b", "pt_rn_b__parts",
      "pt_rn_c", "pt_rn_c__parts").foreach(dropAnyType)
    ch("""CREATE TABLE pt_rn_a (k UInt64, mon String)
      ENGINE = MergeTree PARTITION BY mon ORDER BY (k)""")
    ch("INSERT INTO pt_rn_a VALUES (1, '2024-01')")
    ch("RENAME TABLE pt_rn_a TO pt_rn_b")
    assert(!spark.catalog.tableExists("pt_rn_a"))
    assert(spark.table("pt_rn_b").head().getLong(0) === 1L)
    // the renamed table still takes partitioned INSERTs + DROP PARTITION
    ch("INSERT INTO pt_rn_b VALUES (2, '2024-02')")
    ch("ALTER TABLE pt_rn_b DROP PARTITION '2024-01'")
    assert(spark.table("pt_rn_b").collect().map(_.getLong(0)).toSeq ===
      Seq(2L))
    // EXCHANGE with another partitioned table swaps contents
    ch("""CREATE TABLE pt_rn_c (k UInt64, mon String)
      ENGINE = MergeTree PARTITION BY mon ORDER BY (k)""")
    ch("INSERT INTO pt_rn_c VALUES (9, '2024-09')")
    ch("EXCHANGE TABLES pt_rn_b AND pt_rn_c")
    assert(spark.table("pt_rn_b").head().getLong(0) === 9L)
    assert(spark.table("pt_rn_c").head().getLong(0) === 2L)
    ch("DROP TABLE pt_rn_b")
    ch("DROP TABLE pt_rn_c")
  }

  test("ORDER BY tables write sort-key-ordered files (CH sorted parts)") {
    Seq("pt_sorted", "pt_sorted__parts", "pt_sorted_p", "pt_sorted_p__parts")
      .foreach(dropAnyType)
    ch("""CREATE TABLE pt_sorted (k UInt64, v String)
      ENGINE = MergeTree ORDER BY (k)""")
    assert(ClickHouseSql.sortKeyOf("pt_sorted") === Some(Seq("k")))
    // insert deliberately shuffled keys; the write path must sort them
    val vals = scala.util.Random.shuffle((1 to 500).toList)
      .map(i => s"($i, 'v$i')").mkString(", ")
    ch(s"INSERT INTO pt_sorted VALUES $vals")
    // every parquet file must be internally ordered by k — tight
    // row-group min/max = primary-key skipping at scale
    val dir = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"), "pt_sorted")
    val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val ks = spark.read.parquet(f.getAbsolutePath)
        .select("k").collect().map(_.getLong(0)).toSeq
      assert(ks === ks.sorted, s"file ${f.getName} is not sorted by k")
    }
    // a partitioned table sorts within each partition's files too
    ch("""CREATE TABLE pt_sorted_p (k UInt64, mon String)
      ENGINE = MergeTree PARTITION BY mon ORDER BY (k)""")
    val pvals = scala.util.Random.shuffle((1 to 200).toList)
      .map(i => s"($i, '2024-0${1 + i % 2}')").mkString(", ")
    ch(s"INSERT INTO pt_sorted_p VALUES $pvals")
    val pdir = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"), "pt_sorted_p__parts")
    val pfiles = new scala.collection.mutable.ArrayBuffer[java.io.File]
    def walk(d: java.io.File): Unit = d.listFiles().foreach { f =>
      if (f.isDirectory) walk(f)
      else if (f.getName.endsWith(".parquet")) pfiles += f
    }
    walk(pdir)
    assert(pfiles.nonEmpty)
    pfiles.foreach { f =>
      val ks = spark.read.parquet(f.getAbsolutePath)
        .select("k").collect().map(_.getLong(0)).toSeq
      assert(ks === ks.sorted, s"file ${f.getName} is not sorted by k")
    }
    ch("DROP TABLE pt_sorted")
    ch("DROP TABLE pt_sorted_p")
    dropAnyType("pt_sorted_p")
  }

  test("DETACH/ATTACH PARTITION round-trips through detached storage") {
    Seq("pt_da", "pt_da__parts", "pt_da__parts__detached").foreach(dropAnyType)
    ch("""CREATE TABLE pt_da (k UInt64, v String, d Date)
      ENGINE = MergeTree PARTITION BY toYYYYMM(d) ORDER BY (k)""")
    ch("""INSERT INTO pt_da VALUES
      (1, 'a', '2024-01-05'), (2, 'b', '2024-01-20'),
      (3, 'c', '2024-02-10')""")
    // detach: partition leaves the active set but survives detached
    ch("ALTER TABLE pt_da DETACH PARTITION 202401")
    assert(spark.table("pt_da").collect().map(_.getLong(0)).toSeq === Seq(3L))
    assert(spark.table("pt_da__parts__detached").count() === 2L)
    // detaching an absent partition is a no-op, like DROP
    ch("ALTER TABLE pt_da DETACH PARTITION 202512")
    assert(spark.table("pt_da").count() === 1L)
    // attach: rows come back in declared order; detached store drains
    ch("ALTER TABLE pt_da ATTACH PARTITION 202401")
    assert(spark.table("pt_da").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L, 3L))
    assert(spark.table("pt_da").columns.toSeq === Seq("k", "v", "d"))
    assert(spark.table("pt_da__parts__detached").count() === 0L)
    // attaching again (nothing detached) is a no-op, not a duplicate
    ch("ALTER TABLE pt_da ATTACH PARTITION 202401")
    assert(spark.table("pt_da").count() === 3L)
    ch("DROP TABLE pt_da")
    assert(!spark.catalog.tableExists("pt_da__parts__detached"))
  }

  test("ATTACH FROM / REPLACE FROM / MOVE TO TABLE copy partitions across tables") {
    Seq("pt_cp_a", "pt_cp_a__parts", "pt_cp_b", "pt_cp_b__parts")
      .foreach(dropAnyType)
    ch("""CREATE TABLE pt_cp_a (k UInt64, mon String)
      ENGINE = MergeTree PARTITION BY mon ORDER BY (k)""")
    ch("""CREATE TABLE pt_cp_b (k UInt64, mon String)
      ENGINE = MergeTree PARTITION BY mon ORDER BY (k)""")
    ch("""INSERT INTO pt_cp_a VALUES
      (1, '2024-01'), (2, '2024-01'), (3, '2024-02')""")
    ch("INSERT INTO pt_cp_b VALUES (9, '2024-01')")
    // ATTACH … FROM copies (src untouched) and ADDS to dst's partition
    ch("ALTER TABLE pt_cp_b ATTACH PARTITION '2024-01' FROM pt_cp_a")
    assert(spark.table("pt_cp_a").count() === 3L)
    assert(spark.table("pt_cp_b").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L, 9L))
    // REPLACE … FROM swaps dst's partition for a copy of src's
    ch("ALTER TABLE pt_cp_b REPLACE PARTITION '2024-01' FROM pt_cp_a")
    assert(spark.table("pt_cp_b").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L))
    // MOVE … TO TABLE transfers: dst gains, src loses
    ch("ALTER TABLE pt_cp_a MOVE PARTITION '2024-02' TO TABLE pt_cp_b")
    assert(spark.table("pt_cp_a").collect().map(_.getLong(0)).toSeq ===
      Seq(1L, 2L))
    assert(spark.table("pt_cp_b").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L, 3L))
    ch("DROP TABLE pt_cp_a")
    ch("DROP TABLE pt_cp_b")
  }

  test("CLEAR COLUMN IN PARTITION resets to the column default") {
    Seq("pt_clr", "pt_clr__parts").foreach(dropAnyType)
    ch("""CREATE TABLE pt_clr (k UInt64, score UInt32, note Nullable(String), d Date)
      ENGINE = MergeTree PARTITION BY toYYYYMM(d) ORDER BY (k)""")
    ch("""INSERT INTO pt_clr VALUES
      (1, 10, 'jan', '2024-01-05'), (2, 20, 'jan2', '2024-01-20'),
      (3, 30, 'feb', '2024-02-10')""")
    // plain column → the type's zero, only inside the named partition
    ch("ALTER TABLE pt_clr CLEAR COLUMN score IN PARTITION 202401")
    val scores = spark.table("pt_clr").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores === Map(1L -> 0L, 2L -> 0L, 3L -> 30L))
    // Nullable column → NULL (the INSERT-default rule), not ''
    ch("ALTER TABLE pt_clr CLEAR COLUMN note IN PARTITION 202401")
    val notes = spark.table("pt_clr").collect()
      .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(notes === Map(1L -> None, 2L -> None, 3L -> Some("feb")))
    assert(spark.table("pt_clr").columns.toSeq ===
      Seq("k", "score", "note", "d"))
    ch("DROP TABLE pt_clr")
  }

  test("MV triggers fire on partitioned-source inserts") {
    Seq("pt_mv_src", "pt_mv_src__parts", "pt_mv_agg").foreach(dropAnyType)
    ClickHouseSql.dropMaterializedView("pt_mv_agg")
    ch("""CREATE TABLE pt_mv_src (k UInt64, kind String, amount Decimal(10,2), d Date)
      ENGINE = MergeTree PARTITION BY toYYYYMM(d) ORDER BY (k)""")
    ch("""
      CREATE MATERIALIZED VIEW pt_mv_agg
      ENGINE = SummingMergeTree(n) ORDER BY (kind)
      POPULATE
      AS SELECT kind, count() AS n FROM pt_mv_src GROUP BY kind
    """)
    ch("""INSERT INTO pt_mv_src VALUES
      (1, 'click', 1.00, '2024-01-05'), (2, 'view', 2.00, '2024-01-06')""")
    ch("INSERT INTO pt_mv_src VALUES (3, 'click', 3.00, '2024-02-07')")
    val n = ch("SELECT n FROM pt_mv_agg FINAL WHERE kind = 'click'")
      .head().getLong(0)
    assert(n === 2L)
    // source keeps declared order and prunes
    assert(spark.table("pt_mv_src").columns.toSeq ===
      Seq("k", "kind", "amount", "d"))
    ch("DROP TABLE pt_mv_src")
    spark.sql("DROP TABLE IF EXISTS pt_mv_agg")
    ClickHouseSql.dropMaterializedView("pt_mv_agg")
  }
}
