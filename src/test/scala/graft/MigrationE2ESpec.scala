package graft

import graft.functions.{ClickHouseDialect, ClickHouseSql}

/** One realistic ClickHouse session, replayed VERBATIM: DDL with CH
  * types and a MergeTree engine, upsert-style inserts, the query
  * idioms a migrating dashboard actually contains (FINAL, PREWHERE,
  * combinators, parameterized aggregates, ternaries, QUALIFY,
  * LIMIT BY), and a closing OPTIMIZE. This is the acceptance test for
  * "a user of the reference could switch": every statement below is
  * ClickHouse syntax, none of it is hand-rewritten.
  */
class MigrationE2ESpec extends SparkSpec {

  private def ch(sql: String) = ClickHouseSql.sql(spark, sql)

  override def beforeAll(): Unit = {
    super.beforeAll()
    ClickHouseDialect.register(spark)
  }

  test("a ClickHouse session replays verbatim end-to-end") {
    spark.sql("DROP TABLE IF EXISTS mig_events")
    // an aborted earlier run can leave the managed location behind
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), "mig_events"))

    // 1. DDL — CH types, codec directives, Replacing engine, sort key
    ch("""
      CREATE TABLE mig_events (
        user_id UInt64,
        event_id UInt64,
        kind LowCardinality(String),
        amount Decimal(10, 2),
        ts DateTime CODEC(Delta, ZSTD),
        ver UInt64
      ) ENGINE = ReplacingMergeTree(ver)
      ORDER BY (user_id, event_id)
      SETTINGS index_granularity = 8192
    """)

    // 2. inserts, including a later-version correction of event 102
    spark.sql("""INSERT INTO mig_events VALUES
      (1, 101, 'click',    0.00, TIMESTAMP '2024-03-01 10:00:00', 1),
      (1, 102, 'purchase', 10.00, TIMESTAMP '2024-03-01 10:30:00', 1),
      (1, 102, 'purchase', 12.50, TIMESTAMP '2024-03-01 10:30:00', 2),
      (2, 201, 'click',    0.00, TIMESTAMP '2024-03-01 11:00:00', 1),
      (2, 202, 'view',     0.00, TIMESTAMP '2024-03-01 11:05:00', 1),
      (3, 301, 'click',    0.00, TIMESTAMP '2024-03-02 09:00:00', 1),
      (3, 302, 'purchase', 99.99, TIMESTAMP '2024-03-02 09:10:00', 1)""")

    // 3. FINAL + PREWHERE + combinators + bare count() + ternary
    val daily = ch("""
      SELECT toStartOfDay(ts) AS day,
             count() AS n,
             countIf(kind = 'purchase') AS purchases,
             sumIf(amount, kind = 'purchase') AS revenue,
             uniqExactIf(user_id, amount > 0 ? true : false) AS buyers
      FROM mig_events FINAL
      PREWHERE kind != 'error'
      GROUP BY day ORDER BY day
    """).collect()
    assert(daily.length === 2)
    // event 102's version-2 row (12.50) must win under FINAL
    assert(BigDecimal(daily(0).getDecimal(3)) === BigDecimal("12.50"))
    assert(daily(0).getLong(1) === 4L && daily(1).getLong(1) === 2L)
    assert(daily(0).getLong(4) === 1L && daily(1).getLong(4) === 1L)

    // 4. parameterized aggregates + windowFunnel from verbatim text
    val stats = ch("""
      SELECT quantileExact(0.5)(amount) AS med,
             topK(1)(kind) AS top_kind,
             windowFunnel(3600)(ts, kind = 'click', kind = 'purchase') AS lvl
      FROM mig_events FINAL
    """).head()
    assert(stats.getSeq[String](1) === Seq("click"))
    assert(stats.getInt(2) === 2)

    // 5. QUALIFY + LIMIT BY shapes on the merged view
    val topPerUser = ch("""
      SELECT user_id, event_id, amount FROM mig_events FINAL
      QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
        ORDER BY amount DESC, event_id) = 1
      ORDER BY user_id
    """).collect()
    assert(topPerUser.map(_.getLong(1)).toSeq === Seq(102L, 201L, 302L))

    // 5b. grouping modifiers, offset LIMIT BY, and locale collation
    val rolled = ch("""
      SELECT user_id, kind, count() AS n FROM mig_events
      GROUP BY user_id, kind WITH ROLLUP
      ORDER BY user_id, kind
    """).collect()
    // 6 leaf groups + 3 per-user subtotals + 1 grand total
    assert(rolled.length === 10)
    assert(rolled.count(r => r.isNullAt(0) && r.isNullAt(1)) === 1)
    val second = ch("""
      SELECT user_id, event_id FROM mig_events
      ORDER BY event_id LIMIT 1 OFFSET 1 BY user_id
    """).collect()
    // the second event of each user; user 3's rows collapse under no FINAL
    assert(second.map(_.getLong(1)).sorted.toSeq === Seq(102L, 202L, 302L))
    val byKind = ch("""
      SELECT DISTINCT kind FROM mig_events ORDER BY kind COLLATE 'en'
    """).collect().map(_.getString(0)).toSeq
    assert(byKind === Seq("click", "purchase", "view"))

    // 6. OPTIMIZE materializes the merge; plain reads see 6 rows
    ch("OPTIMIZE TABLE mig_events FINAL")
    assert(spark.table("mig_events").count() === 6)
    val merged = spark.sql(
      "SELECT amount FROM mig_events WHERE event_id = 102").head()
    assert(BigDecimal(merged.getDecimal(0)) === BigDecimal("12.50"))

    // 7. scalar WITH + bare IN-table set + GLOBAL IN, verbatim
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW mig_vips AS
      SELECT 1 AS user_id UNION ALL SELECT 3""")
    val vipRev = ch("""
      WITH 1.0 AS min_amount
      SELECT sum(amount) AS rev
      FROM mig_events
      WHERE amount >= min_amount AND user_id IN mig_vips
        AND user_id GLOBAL IN (SELECT user_id FROM mig_vips)
    """).head()
    assert(BigDecimal(vipRev.getDecimal(0)) === BigDecimal("112.49"))

    // 8. column lifecycle: ADD with CH default fill, RENAME, DROP
    ch("ALTER TABLE mig_events ADD COLUMN region String AFTER kind")
    assert(spark.table("mig_events").columns.toSeq ===
      Seq("user_id", "event_id", "kind", "region", "amount", "ts", "ver"))
    assert(spark.sql("SELECT count(*) FROM mig_events WHERE region = ''")
      .head().getLong(0) === 6L) // CH zero-default, not NULL
    ch("ALTER TABLE mig_events RENAME COLUMN region TO geo")
    ch("ALTER TABLE mig_events DROP COLUMN geo")
    assert(spark.table("mig_events").count() === 6)
    ch("ALTER TABLE mig_events MODIFY COLUMN ver UInt32")
    assert(spark.table("mig_events").schema("ver").dataType ===
      org.apache.spark.sql.types.LongType) // UInt32 maps to BIGINT
    ch("ALTER TABLE mig_events MODIFY COLUMN ver UInt64")

    // 9. dictionary DDL feeding dictGet in query text
    spark.sql("DROP TABLE IF EXISTS mig_kinds")
    spark.sql("CREATE TABLE mig_kinds (kind STRING, score BIGINT) USING parquet")
    spark.sql("INSERT INTO mig_kinds VALUES ('click', 1), ('purchase', 5), ('view', 0)")
    ch("""CREATE DICTIONARY mig_kind_dict (kind String, score UInt64)
          PRIMARY KEY kind SOURCE(CLICKHOUSE(TABLE 'mig_kinds'))
          LAYOUT(HASHED()) LIFETIME(MIN 0 MAX 600)""")
    val scored = spark.sql("""
      SELECT sum(dictGet('mig_kind_dict', 'score', kind)) AS s FROM mig_events
    """).head()
    assert(scored.getLong(0) === 3L * 1 + 2L * 5 + 0L) // 3 clicks, 2 purchases, 1 view
    ch("DROP DICTIONARY mig_kind_dict")

    // 10. single-file export closes the session
    val out = java.nio.file.Files.createTempDirectory("mig_out")
      .resolve("daily.csv").toString
    ch(s"""SELECT user_id, count() AS n FROM mig_events
           GROUP BY user_id ORDER BY user_id INTO OUTFILE '$out' FORMAT CSVWithNames""")
    val exported = scala.io.Source.fromFile(out).getLines().toList
    assert(exported.head === "user_id,n" && exported.length === 4)

    spark.sql("DROP TABLE mig_events")
    spark.sql("DROP TABLE mig_kinds")
  }

  test("materialized views refresh on INSERT — CH's actual MV contract") {
    for (t <- Seq("mv_src", "mv_rev", "mv_rev_daily")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), t))
    }
    ch("""
      CREATE TABLE mv_src (
        user_id UInt64, kind String, amount Decimal(10, 2), day Date
      ) ENGINE = MergeTree ORDER BY (user_id)
    """)
    ch("""INSERT INTO mv_src VALUES
      (1, 'purchase', 10.00, DATE '2024-03-01'),
      (2, 'click',     0.00, DATE '2024-03-01')""")

    // per-user revenue view over the PRE-EXISTING rows (POPULATE) —
    // and a CHAINED view reading the first (CH cascades MV triggers)
    ch("""
      CREATE MATERIALIZED VIEW mv_rev
      ENGINE = SummingMergeTree(rev) ORDER BY (user_id)
      POPULATE
      AS SELECT user_id, sum(amount) AS rev FROM mv_src
         WHERE kind = 'purchase' GROUP BY user_id
    """)
    ch("""
      CREATE MATERIALIZED VIEW mv_rev_daily
      ENGINE = SummingMergeTree(n) ORDER BY (bucket)
      POPULATE
      AS SELECT 'all' AS bucket, count() AS n FROM mv_rev
    """)
    assert(ch("SELECT user_id, rev FROM mv_rev FINAL").collect()
      .map(r => (r.getLong(0), BigDecimal(r.getDecimal(1)))).toSeq ===
      Seq((1L, BigDecimal("10.00"))))

    // the MV contract: an INSERT into the SOURCE refreshes the views —
    // a migrated dashboard reading mv_rev must see the new purchase
    // without anyone re-running the CTAS
    ch("""INSERT INTO mv_src VALUES
      (1, 'purchase',  2.50, DATE '2024-03-02'),
      (3, 'purchase', 99.99, DATE '2024-03-02'),
      (3, 'view',      0.00, DATE '2024-03-02')""")
    val fresh = ch("SELECT user_id, rev FROM mv_rev FINAL ORDER BY user_id")
      .collect().map(r => (r.getLong(0), BigDecimal(r.getDecimal(1)))).toSeq
    assert(fresh === Seq((1L, BigDecimal("12.50")), (3L, BigDecimal("99.99"))))
    // raw storage holds the per-block partial states (CH semantics:
    // merge happens at FINAL read / background merge, not at insert)
    assert(spark.table("mv_rev").count() === 3)
    // the chained view re-triggered off mv_rev's block
    assert(ch("SELECT bucket, n FROM mv_rev_daily FINAL").head().getLong(1) === 3L)

    // a column-listed insert fills unlisted columns with NULL and still
    // triggers; non-matching rows contribute nothing
    ch("INSERT INTO mv_src (user_id, kind, amount) VALUES (1, 'click', 0.00)")
    assert(ch("SELECT rev FROM mv_rev FINAL WHERE user_id = 1")
      .head().getDecimal(0).toString === "12.50")

    // inserts into unrelated tables take the generic path untouched
    spark.sql("DROP TABLE IF EXISTS mv_other")
    spark.sql("CREATE TABLE mv_other (x BIGINT) USING parquet")
    ch("INSERT INTO mv_other VALUES (1)")
    assert(spark.table("mv_other").count() === 1)

    for (t <- Seq("mv_src", "mv_rev", "mv_rev_daily", "mv_other"))
      spark.sql(s"DROP TABLE $t")
    ClickHouseSql.dropMaterializedView("mv_rev")
    ClickHouseSql.dropMaterializedView("mv_rev_daily")
  }

  test("inline-data INSERT FORMAT replays the entrypoint's exact statement shape") {
    for (t <- Seq("fmt_components", "fmt_stats")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), t))
    }
    ch("""
      CREATE TABLE fmt_components (
        name String, version String, license String, source String,
        scanned_at DateTime
      ) ENGINE = MergeTree ORDER BY (name)
    """)
    // entrypoint.sh:408's statement: column-listed INSERT, TSV body —
    // with the jq-@tsv escapes (tab/newline in a field) and \N null
    ch("INSERT INTO fmt_components (name, version, license, source) FORMAT TSV\n" +
      "lodash\t4.17.21\tMIT\tgithub\n" +
      "weird\\tname\t1.0\t\\N\tmend\n" +
      "multi\\nline\t2.0\tApache-2.0\twiz\n")
    val rows = spark.table("fmt_components").orderBy("version").collect()
    assert(rows.length === 3)
    assert(rows(2).getString(0) === "lodash")      // 4.17.21 sorts last
    assert(rows(0).getString(0) === "weird\tname") // escaped tab restored
    assert(rows(0).isNullAt(2))                    // \N is NULL
    assert(rows(1).getString(0) === "multi\nline")
    // unlisted column → CH TYPE default (epoch for DateTime), not NULL
    assert(rows.forall(_.getTimestamp(4).toInstant.toEpochMilli === 0L))

    // JSONEachRow: name-matched fields, CH type default for absent ones
    ch("""INSERT INTO fmt_components FORMAT JSONEachRow
      {"name": "left-pad", "version": "1.3.0", "license": "WTFPL", "source": "github"}
      {"name": "no-license", "version": "0.1"}""")
    val jr = spark.table("fmt_components")
      .filter(org.apache.spark.sql.functions.col("name") === "no-license").head()
    assert(jr.getString(2) === "") // CH default '', not NULL
    // unknown JSON fields are a loud error, like CH's default mode
    val err = intercept[IllegalArgumentException] {
      ch("""INSERT INTO fmt_components FORMAT JSONEachRow
        {"name": "x", "bogus": 1}""")
    }
    assert(err.getMessage.contains("bogus"))

    // FORMAT TSV inserts fire materialized-view triggers like any other
    ch("""
      CREATE MATERIALIZED VIEW fmt_stats
      ENGINE = SummingMergeTree(n) ORDER BY (source)
      POPULATE
      AS SELECT source, count() AS n FROM fmt_components GROUP BY source
    """)
    ch("INSERT INTO fmt_components (name, version, license, source) FORMAT TSV\n" +
      "extra\t9.9\tMIT\tgithub\n")
    val gh = ClickHouseSql.sql(spark,
      "SELECT n FROM fmt_stats FINAL WHERE source = 'github'").head()
    assert(gh.getLong(0) === 3L) // 2 from POPULATE + 1 triggered

    // CSV and Values forms round-trip through the same path
    ch("INSERT INTO fmt_components (name, version, license, source) FORMAT CSV\n" +
      "csvpkg,1.0,BSD-3-Clause,github\n")
    ch("INSERT INTO fmt_components (name, version, license, source) " +
      "FORMAT Values ('valpkg', '2.0', 'ISC', 'mend')")
    assert(spark.table("fmt_components").count() === 8)

    for (t <- Seq("fmt_components", "fmt_stats")) spark.sql(s"DROP TABLE $t")
    ClickHouseSql.dropMaterializedView("fmt_stats")
  }

  test("OPTIMIZE TABLE ... PARTITION merges ONLY the named partition") {
    ch("DROP TABLE IF EXISTS opt_p SYNC")
    ch("""
      CREATE TABLE opt_p (k UInt64, v UInt64, d Date)
      ENGINE = ReplacingMergeTree(v) PARTITION BY d ORDER BY (k)
    """)
    // duplicates for the same sort key in BOTH partitions
    ch("INSERT INTO opt_p VALUES " +
      "(1, 1, DATE '2024-01-01'), (1, 2, DATE '2024-01-01'), " +
      "(2, 1, DATE '2024-02-01'), (2, 2, DATE '2024-02-01')")

    ch("OPTIMIZE TABLE opt_p PARTITION '2024-01-01' FINAL")
    // January merged in place (one row, the max-version winner) …
    val jan = spark.table("opt_p")
      .where(org.apache.spark.sql.functions.col("d") === org.apache.spark.sql.functions.lit("2024-01-01")).collect()
    assert(jan.length === 1 && jan.head.getAs[Long]("v") === 2L)
    // … February untouched: its duplicate pair is still there
    assert(spark.table("opt_p")
      .where(org.apache.spark.sql.functions.col("d") === org.apache.spark.sql.functions.lit("2024-02-01")).count() === 2L)

    // full OPTIMIZE then collapses the rest
    ch("OPTIMIZE TABLE opt_p FINAL")
    assert(spark.table("opt_p").count() === 2L)

    // scoped DEDUPLICATE: only the named partition loses its dup pair
    ch("INSERT INTO opt_p VALUES (3, 9, DATE '2024-03-01'), " +
      "(3, 9, DATE '2024-03-01'), (4, 9, DATE '2024-04-01'), " +
      "(4, 9, DATE '2024-04-01')")
    ch("OPTIMIZE TABLE opt_p PARTITION '2024-03-01' DEDUPLICATE")
    assert(spark.table("opt_p")
      .where(org.apache.spark.sql.functions.col("d") === org.apache.spark.sql.functions.lit("2024-03-01")).count() === 1L)
    assert(spark.table("opt_p")
      .where(org.apache.spark.sql.functions.col("d") === org.apache.spark.sql.functions.lit("2024-04-01")).count() === 2L)

    // a PARTITION scope on an unpartitioned table errors loudly
    ch("DROP TABLE IF EXISTS opt_np SYNC")
    ch("CREATE TABLE opt_np (k UInt64) ENGINE = MergeTree")
    val e = intercept[IllegalArgumentException](
      ch("OPTIMIZE TABLE opt_np PARTITION 'x' FINAL"))
    assert(e.getMessage.contains("not partitioned"))

    for (t <- Seq("opt_p", "opt_np")) ch(s"DROP TABLE $t SYNC")
  }

  test("expression partitioning survives BACKUP/RESTORE and scoped OPTIMIZE") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bke").toFile
    dir.delete()
    ch("DROP TABLE IF EXISTS bke_t SYNC")
    ch("""
      CREATE TABLE bke_t (k UInt64, v UInt64, d Date)
      ENGINE = ReplacingMergeTree(v) PARTITION BY toYYYYMM(d) ORDER BY (k)
    """)
    ch("INSERT INTO bke_t VALUES " +
      "(1, 1, DATE '2024-01-05'), (1, 2, DATE '2024-01-20'), " +
      "(2, 1, DATE '2024-02-05'), (2, 2, DATE '2024-02-20')")

    // scoped OPTIMIZE addresses the partition by the EXPRESSION's value
    ch("OPTIMIZE TABLE bke_t PARTITION 202401 FINAL")
    assert(spark.table("bke_t")
      .where(org.apache.spark.sql.functions.expr("d < DATE '2024-02-01'"))
      .count() === 1L)
    assert(spark.table("bke_t")
      .where(org.apache.spark.sql.functions.expr("d >= DATE '2024-02-01'"))
      .count() === 2L)

    // backup + restore keeps the generated-column layout working
    ch(s"BACKUP TABLE bke_t TO File('${dir.getAbsolutePath}')")
    ch("DROP TABLE bke_t SYNC")
    ch(s"RESTORE TABLE bke_t FROM File('${dir.getAbsolutePath}')")
    assert(spark.table("bke_t").count() === 3L)
    assert(ch("SELECT count() AS n FROM bke_t FINAL").head().getLong(0) === 2L)
    // partition machinery intact after restore: drop by expression value
    ch("ALTER TABLE bke_t DROP PARTITION 202402")
    assert(spark.table("bke_t").count() === 1L)

    ch("DROP TABLE bke_t SYNC")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("MATERIALIZE TTL applies retention now, without merging versions") {
    ch("DROP TABLE IF EXISTS mt_t SYNC")
    ch("""
      CREATE TABLE mt_t (k UInt64, v UInt64, d Date)
      ENGINE = ReplacingMergeTree(v) PARTITION BY d ORDER BY (k)
      TTL d + INTERVAL 1 YEAR
    """)
    // two partitions long past the TTL horizon + one recent; the k=9
    // pair is a Replacing duplicate that must NOT collapse
    ch("INSERT INTO mt_t VALUES " +
      "(1, 1, DATE '2020-01-01'), (2, 1, DATE '2020-02-01'), " +
      "(9, 1, DATE '2099-01-01'), (9, 2, DATE '2099-01-01')")

    // scoped: only January 2020 expires
    ch("ALTER TABLE mt_t MATERIALIZE TTL IN PARTITION '2020-01-01'")
    assert(spark.table("mt_t").count() === 3L)
    // unscoped: the rest of the expired mass goes; versions survive
    // (CH MATERIALIZE TTL is a mutation, not a merge)
    ch("ALTER TABLE mt_t MATERIALIZE TTL")
    val left = spark.table("mt_t").collect()
    assert(left.length === 2 && left.forall(_.getAs[Long]("k") === 9L))
    // FINAL still collapses at read time
    assert(ch("SELECT count() AS n FROM mt_t FINAL").head().getLong(0) === 1L)

    ch("DROP TABLE mt_t SYNC")
  }

  test("a materialized view's insert trigger survives DROP + UNDROP") {
    for (t <- Seq("mvlc_src", "mvlc_mv"))
      ch(s"DROP TABLE IF EXISTS $t SYNC")
    ClickHouseSql.dropMaterializedView("mvlc_mv")
    ch("CREATE TABLE mvlc_src (k UInt64, v UInt64) ENGINE = MergeTree")
    ch("""
      CREATE MATERIALIZED VIEW mvlc_mv ENGINE = MergeTree
      AS SELECT k, v * 2 AS v2 FROM mvlc_src
    """)
    ch("INSERT INTO mvlc_src VALUES (1, 10)")
    assert(spark.table("mvlc_mv").count() === 1L)

    ch("DROP TABLE mvlc_mv")
    // while parked, inserts into the source do NOT feed the slot
    ch("INSERT INTO mvlc_src VALUES (2, 20)")
    ch("UNDROP TABLE mvlc_mv")
    assert(spark.table("mvlc_mv").count() === 1L) // missed (2,20) — dropped
    // restored trigger fires again
    ch("INSERT INTO mvlc_src VALUES (3, 30)")
    val rows = spark.table("mvlc_mv").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(rows.toSeq === Seq((1L, 20L), (3L, 60L)))

    for (t <- Seq("mvlc_mv", "mvlc_src")) ch(s"DROP TABLE $t SYNC")
    ClickHouseSql.dropMaterializedView("mvlc_mv")
  }

  test("EXISTS / SHOW TABLES speak CH shapes; KILL guides loudly") {
    for (t <- Seq("sh_alpha", "sh_beta"))
      ch(s"DROP TABLE IF EXISTS $t SYNC")
    ch("CREATE TABLE sh_alpha (k UInt64, d Date) " +
      "ENGINE = MergeTree PARTITION BY d ORDER BY (k)")
    ch("CREATE TABLE sh_beta (k UInt64) ENGINE = MergeTree")

    assert(ch("EXISTS sh_alpha").head().getLong(0) === 1L)
    assert(ch("EXISTS TABLE sh_beta").head().getLong(0) === 1L)
    assert(ch("EXISTS sh_gamma").head().getLong(0) === 0L)

    // one `name` column, CH shape; two-piece internals are hidden
    val names = ch("SHOW TABLES LIKE 'sh_%'").collect().map(_.getString(0))
    assert(names.toSeq === Seq("sh_alpha", "sh_beta"))
    assert(ch("SHOW TABLES LIKE 'sh_alpha'").count() === 1L)
    val all = ch("SHOW TABLES").collect().map(_.getString(0))
    assert(all.contains("sh_alpha") &&
      !all.exists(_.contains("__parts")) &&
      !all.exists(_.contains("__dropped")))

    val e = intercept[IllegalArgumentException](
      ch("KILL MUTATION WHERE mutation_id = '1'"))
    assert(e.getMessage.contains("synchronous"))

    // SHOW DATABASES / PROCESSLIST / FUNCTIONS (r15 verbs)
    assert(ch("SHOW DATABASES").collect().map(_.getString(0))
      .contains("default"))
    val pl = ch("SHOW PROCESSLIST")
    assert(pl.columns.toSeq ===
      Seq("query_id", "user", "elapsed", "query") && pl.count() === 0L)
    val fns = ch("SHOW FUNCTIONS LIKE 'arrayShift%'")
      .collect().map(_.getString(0))
    assert(fns.toSeq === Seq("arrayShiftLeft", "arrayShiftRight"))
    assert(ch("SHOW FUNCTIONS").count() > 600L)

    for (t <- Seq("sh_alpha", "sh_beta")) ch(s"DROP TABLE $t SYNC")
  }

  test("DETACH / ATTACH TABLE hide and restore a table with its registrations") {
    ch("DROP TABLE IF EXISTS det_t SYNC")
    ch("CREATE TABLE det_t (k UInt64, v UInt64, d Date) " +
      "ENGINE = ReplacingMergeTree(v) PARTITION BY d ORDER BY (k)")
    ch("INSERT INTO det_t VALUES (1, 1, '2024-01-01'), (1, 2, '2024-01-01')")
    ch("DETACH TABLE det_t")
    // invisible to SHOW TABLES and EXISTS, files intact
    assert(!ch("SHOW TABLES").collect().map(_.getString(0)).contains("det_t"))
    assert(ch("EXISTS det_t").head().getLong(0) === 0L)
    // double detach / premature attach-over-existing error loudly
    assertThrows[IllegalArgumentException](ch("DETACH TABLE det_t"))
    ch("ATTACH TABLE det_t")
    assert(ch("EXISTS det_t").head().getLong(0) === 1L)
    // data, engine registration (FINAL collapses versions), and the
    // partition layout all survived the round trip
    assert(ch("SELECT count() FROM det_t FINAL").head().getLong(0) === 1L)
    assert(ch("SELECT max(v) FROM det_t FINAL").head().getLong(0) === 2L)
    assertThrows[IllegalArgumentException](ch("ATTACH TABLE det_t"))
    // PERMANENTLY accepted; nothing-detached attach errors loudly
    ch("DETACH TABLE det_t PERMANENTLY")
    ch("ATTACH TABLE det_t")
    assertThrows[IllegalArgumentException](ch("ATTACH TABLE det_never"))
    ch("DROP TABLE det_t SYNC")
  }

  test("BACKUP TABLE / RESTORE TABLE round-trip data, DDL, and registrations") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bk").toFile
    dir.delete() // BACKUP refuses an existing destination
    val p = dir.getAbsolutePath
    for (t <- Seq("bk_t", "bk_t2"))
      ch(s"DROP TABLE IF EXISTS $t SYNC")

    ch("""
      CREATE TABLE bk_t (
        k UInt64, v Nullable(String), d Date
      ) ENGINE = ReplacingMergeTree(k) PARTITION BY d ORDER BY (k)
    """)
    ch("INSERT INTO bk_t VALUES (1, 'a', DATE '2024-01-01'), " +
      "(1, 'b', DATE '2024-01-01'), (2, NULL, DATE '2024-02-01')")

    ch(s"BACKUP TABLE bk_t TO File('$p')")
    // self-describing: data parquet + the normalized DDL
    assert(new java.io.File(dir, "ddl.sql").exists())
    assert(new java.io.File(dir, "data").exists())
    // a second backup to the same destination errors like CH
    val e0 = intercept[IllegalArgumentException](
      ch(s"BACKUP TABLE bk_t TO '$p'"))
    assert(e0.getMessage.contains("already exists"))

    // restore under the original name requires the name to be free
    val e1 = intercept[IllegalArgumentException](
      ch(s"RESTORE TABLE bk_t FROM File('$p')"))
    assert(e1.getMessage.contains("already exists"))
    ch("DROP TABLE bk_t SYNC")
    ch(s"RESTORE TABLE bk_t FROM File('$p')")
    assert(spark.table("bk_t").columns.toSeq === Seq("k", "v", "d"))
    assert(spark.table("bk_t").count() === 3L)
    // engine registration survived: FINAL collapses the k=1 pair
    assert(ch("SELECT count() AS n FROM bk_t FINAL").head().getLong(0) === 2L)
    // partition layout survived: DROP PARTITION still prunes by value
    ch("ALTER TABLE bk_t DROP PARTITION '2024-02-01'")
    assert(spark.table("bk_t").count() === 2L)
    // Nullable registry survived the round trip
    val desc = ch("DESCRIBE bk_t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc("v") === "Nullable(String)")

    // RESTORE ... AS lands the same backup under a new name
    ch(s"RESTORE TABLE bk_t AS bk_t2 FROM File('$p')")
    assert(spark.table("bk_t2").count() === 3L)
    assert(ch("SELECT count() AS n FROM bk_t2 FINAL").head().getLong(0) === 2L)

    // missing backup errors loudly
    val e2 = intercept[IllegalArgumentException](
      ch(s"RESTORE TABLE bk_t3 FROM File('${p}_nope')"))
    assert(e2.getMessage.contains("no backup"))

    for (t <- Seq("bk_t", "bk_t2")) ch(s"DROP TABLE $t SYNC")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  test("DESCRIBE / CHECK / delayed DROP + UNDROP complete the table lifecycle") {
    for (t <- Seq("lc_t", "lc_t__dropped", "lc_t__parts", "lc_t__dropped__parts"))
      ch(s"DROP TABLE IF EXISTS $t SYNC")

    ch("""
      CREATE TABLE lc_t (
        k UInt64,
        v Nullable(String),
        d Date
      ) ENGINE = ReplacingMergeTree(k) PARTITION BY d ORDER BY (k)
    """)
    ch("INSERT INTO lc_t VALUES (1, 'a', DATE '2024-01-01'), " +
      "(2, NULL, DATE '2024-02-01')")

    // DESCRIBE prints the normalized CH types, Nullable re-wrapped
    val desc = ch("DESCRIBE TABLE lc_t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc === Map("k" -> "Int64", "v" -> "Nullable(String)",
      "d" -> "Date"))
    // the short form resolves identically
    assert(ch("DESC lc_t").collect().length === 3)

    // CHECK on a healthy table → 1
    assert(ch("CHECK TABLE lc_t").head().getLong(0) === 1L)
    assert(ch("CHECK TABLE lc_missing").head().getLong(0) === 0L)

    // delayed DROP: data parks in the recycle slot, name is free
    ch("DROP TABLE lc_t")
    assert(!spark.catalog.tableExists("lc_t"))
    // UNDROP restores table, rows, engine, partition layout
    ch("UNDROP TABLE lc_t")
    assert(spark.table("lc_t").columns.toSeq === Seq("k", "v", "d"))
    assert(ch("SELECT count() AS n FROM lc_t FINAL").head().getLong(0) === 2L)
    assert(ch("CHECK TABLE lc_t").head().getLong(0) === 1L)
    // partition ops still work after the round trip
    ch("ALTER TABLE lc_t DROP PARTITION '2024-02-01'")
    assert(spark.table("lc_t").count() === 1L)

    // UNDROP with nothing parked errors loudly
    val e1 = intercept[IllegalArgumentException](ch("UNDROP TABLE lc_t2"))
    assert(e1.getMessage.contains("nothing to restore"))
    // re-CREATE after a drop blocks UNDROP (CH contract)
    ch("DROP TABLE lc_t")
    ch("CREATE TABLE lc_t (k UInt64) ENGINE = MergeTree")
    val e2 = intercept[IllegalArgumentException](ch("UNDROP TABLE lc_t"))
    assert(e2.getMessage.contains("already exists"))
    // a later drop of the same name purges the previous occupant
    ch("DROP TABLE lc_t")
    ch("UNDROP TABLE lc_t")
    assert(spark.table("lc_t").columns.toSeq === Seq("k"))
    // DROP ... SYNC removes immediately, leaving nothing to restore
    ch("DROP TABLE lc_t SYNC")
    val e3 = intercept[IllegalArgumentException](ch("UNDROP TABLE lc_t"))
    assert(e3.getMessage.contains("nothing to restore"))
  }
}
