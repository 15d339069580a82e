package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** String-processing operator family: function pipelines, regex, LIKE/glob
  * filters with include/exclude precedence, split+explode (arrayJoin),
  * ordered string aggregation, JSON extraction.
  */
object Strings {

  // q24 — scalar string function pipeline.
  val q24 = Q(
    "q24_string_funcs",
    Some("""
      SELECT p_partkey,
             UPPER(p_name) AS uname,
             SUBSTR(p_name, 1, 3) AS prefix,
             CAST(LENGTH(p_name) AS BIGINT) AS name_len,
             CONCAT(TRIM(p_brand), ':', LOWER(p_type)) AS brand_type
      FROM part
      ORDER BY p_partkey
    """)
  ) { t =>
    t.part
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 3).as("prefix"),
        length(col("p_name")).cast(LongType).as("name_len"),
        concat(trim(col("p_brand")), lit(":"), lower(col("p_type"))).as("brand_type"))
      .orderBy(col("p_partkey"))
  }

  // q25 — regexp extract + global replace (patterns kept in the common
  // subset of Java regex and RE2 so both engines agree).
  val q25 = Q(
    "q25_regexp",
    Some("""
      SELECT p_partkey,
             REGEXP_EXTRACT(p_name, '([a-z]+)$', 1) AS last_word,
             REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS devoweled,
             REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS brand_num
      FROM part
      ORDER BY p_partkey
    """)
  ) { t =>
    t.part
      .select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"))
      .orderBy(col("p_partkey"))
  }

  // q26 — include/exclude LIKE-pattern filtering with exclude-wins
  // precedence — the reference's SBOM merge file filter semantics
  // (sbom-merging.sh:32-77) as a relational predicate.
  val q26 = Q(
    "q26_like_patterns",
    Some("""
      SELECT p_partkey, p_name
      FROM part
      WHERE (p_name LIKE 'small%' OR p_name LIKE '%bolt')
        AND NOT (p_name LIKE '%red%')
      ORDER BY p_partkey
    """)
  ) { t =>
    t.part
      .filter((col("p_name").like("small%") || col("p_name").like("%bolt"))
        && !col("p_name").like("%red%"))
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey"))
  }

  // q27 — split → explode (ClickHouse arrayJoin) → word frequency.
  val q27 = Q(
    "q27_split_explode",
    Some("""
      SELECT word, COUNT(*) AS n
      FROM (SELECT UNNEST(STRING_SPLIT(p_name, ' ')) AS word FROM part)
      GROUP BY word
      ORDER BY word
    """)
  ) { t =>
    t.part
      .select(explode(split(col("p_name"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("word"))
  }

  // q28 — ordered collect serialized to a scalar (ClickHouse groupArray):
  // numeric sort before stringify keeps both engines identical.
  val q28 = Q(
    "q28_collect_sorted",
    Some("""
      SELECT o_custkey,
             STRING_AGG(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_keys,
             COUNT(*) AS n
      FROM orders
      WHERE o_totalprice > 450000
      GROUP BY o_custkey
      ORDER BY o_custkey
    """)
  ) { t =>
    t.orders
      .filter(col("o_totalprice") > 450000)
      .groupBy(col("o_custkey"))
      .agg(
        array_join(transform(sort_array(collect_list(col("o_orderkey"))),
          x => x.cast("string")), ",").as("order_keys"),
        count(lit(1)).as("n"))
      .orderBy(col("o_custkey"))
  }

  // q33 — JSON field extraction from events.props (ClickHouse JSONExtract).
  val q33 = Q(
    "q33_json_extract",
    Some("""
      SELECT event_type,
             CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             COUNT(*) AS n
      FROM events
      GROUP BY event_type
      ORDER BY event_type
    """)
  ) { t =>
    t.events
      .groupBy(col("event_type"))
      .agg(
        sum(get_json_object(col("props"), "$.k").cast(LongType)).as("sum_k"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  // q90 — the ClickHouse array-function surface (arraySort, arrayDifference,
  // arrayDistinct, arrayReverse, arrayEnumerate, indexOf, arrayMax) as
  // codegen'd Spark higher-order functions over per-order line arrays:
  // one collect per order (arrays bounded by lines-per-order, ≤ 7), then
  // four order-SENSITIVE array metrics per row — adjacent |difference|
  // sum, distinct count, reverse·enumerate dot, index-of-max — rolled up
  // by array length. One aggregation shuffle; per-row array work is
  // constant-bounded, so the op is a linear scan at any fact volume. The
  // DuckDB oracle computes identical values through window algebra (LAG /
  // ROW_NUMBER per order) — same numbers, two plans, which is exactly the
  // argument for HOFs: Spark does it without a second window pass.
  val q90 = Q(
    "q90_array_funcs",
    Some("""
      WITH li AS (
        SELECT l_orderkey AS k, l_linenumber AS ln,
               CAST(l_quantity AS BIGINT) AS q
        FROM lineitem),
      w AS (
        -- order by (ln, q): the synthetic lineitem has duplicate line
        -- numbers per order, and the array metrics are order-sensitive —
        -- (ln, q) matches the struct sort on the Spark side exactly
        SELECT k, q,
          ROW_NUMBER() OVER (PARTITION BY k ORDER BY ln, q) AS i,
          COUNT(*) OVER (PARTITION BY k) AS n,
          LAG(q) OVER (PARTITION BY k ORDER BY ln, q) AS pq,
          MAX(q) OVER (PARTITION BY k) AS mx
        FROM li),
      per AS (
        SELECT k, MAX(n) AS n,
          SUM(CASE WHEN pq IS NULL THEN 0 ELSE ABS(q - pq) END) AS absdiff,
          COUNT(DISTINCT q) AS ndistinct,
          SUM((n + 1 - i) * q) AS revdot,
          MIN(CASE WHEN q = mx THEN i END) AS idxmax
        FROM w GROUP BY k)
      SELECT CAST(n AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS n_orders,
        CAST(SUM(absdiff) AS BIGINT) AS sum_absdiff,
        CAST(SUM(ndistinct) AS BIGINT) AS sum_ndistinct,
        CAST(SUM(revdot) AS BIGINT) AS sum_revdot,
        CAST(SUM(idxmax) AS BIGINT) AS sum_idxmax
      FROM per GROUP BY n ORDER BY n
    """)
  ) { t =>
    val li = t.lineitem.select(col("l_orderkey").as("k"),
      col("l_linenumber").as("ln"), col("l_quantity").cast(LongType).as("q"))
    val arrs = li.groupBy(col("k"))
      .agg(transform(array_sort(collect_list(struct(col("ln"), col("q")))),
        x => x.getField("q")).as("arr"))
    val m = arrs.select(
      size(col("arr")).cast(LongType).as("n"),
      expr("""aggregate(zip_with(slice(arr, 1, size(arr) - 1),
               slice(arr, 2, size(arr) - 1), (a, b) -> abs(b - a)),
               0L, (acc, x) -> acc + x)""").as("absdiff"),
      size(array_distinct(col("arr"))).cast(LongType).as("ndistinct"),
      expr("""aggregate(zip_with(reverse(arr),
               sequence(1L, cast(size(arr) as bigint)), (v, i) -> v * i),
               0L, (acc, x) -> acc + x)""").as("revdot"),
      array_position(col("arr"), array_max(col("arr"))).as("idxmax"))
    m.groupBy(col("n"))
      .agg(count(lit(1)).cast(LongType).as("n_orders"),
        sum(col("absdiff")).cast(LongType).as("sum_absdiff"),
        sum(col("ndistinct")).cast(LongType).as("sum_ndistinct"),
        sum(col("revdot")).cast(LongType).as("sum_revdot"),
        sum(col("idxmax")).cast(LongType).as("sum_idxmax"))
      .orderBy(col("n"))
  }

  // q107_url_funcs — the ClickHouse URL-function family (domain,
  // topLevelDomain, path, extractURLParameter) over synthesized event
  // URLs: decompose with simple anchored regexes (kept inside the RE2 ∩
  // Java-regex common dialect so both engines extract identical
  // fields — no lookarounds), then the rollup a traffic report wants:
  // per (tld, domain), hits and distinct users. One scan, codegen'd
  // regexes, one aggregation.
  val q107 = Q(
    "q107_url_funcs",
    Some("""
      WITH urls AS (
        SELECT user_id,
               'https://sub' || CAST(user_id % 3 AS VARCHAR) || '.example' ||
               CASE CAST(user_id % 4 AS INTEGER)
                    WHEN 0 THEN '.com' WHEN 1 THEN '.org'
                    WHEN 2 THEN '.io' ELSE '.dev' END ||
               '/p/' || event_type || '/' || CAST(event_id % 100 AS VARCHAR) ||
               '?utm=' || CAST(event_id % 7 AS VARCHAR) AS url
        FROM events),
      parsed AS (
        SELECT user_id,
               REGEXP_EXTRACT(url, 'https://([^/]+)/', 1) AS domain,
               REGEXP_EXTRACT(url, '\.([a-z]+)/', 1) AS tld,
               REGEXP_EXTRACT(url, '//[^/]+(/[^?]*)', 1) AS path,
               REGEXP_EXTRACT(url, 'utm=([0-9]+)', 1) AS utm
        FROM urls)
      SELECT tld, domain,
             COUNT(*) AS n_hits,
             COUNT(DISTINCT user_id) AS n_users,
             COUNT(DISTINCT path) AS n_paths,
             COUNT(DISTINCT utm) AS n_utm_values
      FROM parsed
      GROUP BY tld, domain
      ORDER BY tld, domain
    """)
  ) { t =>
    val url = concat(
      lit("https://sub"), (col("user_id") % 3).cast("string"), lit(".example"),
      when(col("user_id") % 4 === 0, ".com")
        .when(col("user_id") % 4 === 1, ".org")
        .when(col("user_id") % 4 === 2, ".io")
        .otherwise(".dev"),
      lit("/p/"), col("event_type"), lit("/"), (col("event_id") % 100).cast("string"),
      lit("?utm="), (col("event_id") % 7).cast("string"))
    t.events
      .select(col("user_id"), url.as("url"))
      .select(col("user_id"),
        regexp_extract(col("url"), "https://([^/]+)/", 1).as("domain"),
        regexp_extract(col("url"), "\\.([a-z]+)/", 1).as("tld"),
        regexp_extract(col("url"), "//[^/]+(/[^?]*)", 1).as("path"),
        regexp_extract(col("url"), "utm=([0-9]+)", 1).as("utm"))
      .groupBy(col("tld"), col("domain"))
      .agg(count(lit(1)).as("n_hits"),
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("path")).as("n_paths"),
        countDistinct(col("utm")).as("n_utm_values"))
      .orderBy(col("tld"), col("domain"))
  }

  // q108_ip_funcs — the ClickHouse IPv4 function family
  // (IPv4NumToString / IPv4StringToNum / subnet truncation) as pure
  // integer arithmetic: synthesize a stable IPv4 per user with the
  // multiplicative-hash idiom, render dotted-quad via div/mod octets,
  // round-trip back to the number (the parse is the same arithmetic in
  // reverse, proving the rendering), and roll up the /16 subnets a
  // network report aggregates by. Everything is BIGINT + string concat —
  // bit-identical across engines; the top-10 cut runs on the aggregated
  // subnet relation.
  val q108 = Q(
    "q108_ip_funcs",
    Some("""
      WITH ips AS (
        SELECT user_id,
               (user_id * 2654435761) % 4294967296 AS ip
        FROM (SELECT DISTINCT user_id FROM events)),
      rendered AS (
        SELECT user_id, ip,
               CAST(ip // 16777216 AS VARCHAR) || '.' ||
               CAST((ip // 65536) % 256 AS VARCHAR) || '.' ||
               CAST((ip // 256) % 256 AS VARCHAR) || '.' ||
               CAST(ip % 256 AS VARCHAR) AS ip_str,
               ip - (ip % 65536) AS subnet16
        FROM ips),
      parsed AS (
        SELECT *,
               CAST(STRING_SPLIT(ip_str, '.')[1] AS BIGINT) * 16777216 +
               CAST(STRING_SPLIT(ip_str, '.')[2] AS BIGINT) * 65536 +
               CAST(STRING_SPLIT(ip_str, '.')[3] AS BIGINT) * 256 +
               CAST(STRING_SPLIT(ip_str, '.')[4] AS BIGINT) AS ip_rt
        FROM rendered)
      SELECT CAST(subnet16 // 16777216 AS VARCHAR) || '.' ||
             CAST((subnet16 // 65536) % 256 AS VARCHAR) || '.0.0/16' AS subnet,
             COUNT(*) AS n_users,
             COUNT(CASE WHEN ip_rt = ip THEN 1 END) AS n_roundtrip_ok
      FROM parsed
      GROUP BY subnet16
      ORDER BY n_users DESC, subnet
      LIMIT 10
    """)
  ) { t =>
    val ips = t.events.select(col("user_id")).distinct()
      .select(col("user_id"),
        ((col("user_id") * 2654435761L) % 4294967296L).as("ip"))
    val rendered = ips.select(col("user_id"), col("ip"),
      concat_ws(".",
        (col("ip") / 16777216).cast(LongType).cast("string"),
        ((col("ip") / 65536).cast(LongType) % 256).cast("string"),
        ((col("ip") / 256).cast(LongType) % 256).cast("string"),
        (col("ip") % 256).cast("string")).as("ip_str"),
      (col("ip") - (col("ip") % 65536)).as("subnet16"))
    val parsed = rendered.withColumn("ip_rt",
      split(col("ip_str"), "\\.").getItem(0).cast(LongType) * 16777216L +
        split(col("ip_str"), "\\.").getItem(1).cast(LongType) * 65536L +
        split(col("ip_str"), "\\.").getItem(2).cast(LongType) * 256L +
        split(col("ip_str"), "\\.").getItem(3).cast(LongType))
    parsed
      .groupBy(col("subnet16"))
      .agg(count(lit(1)).as("n_users"),
        count(when(col("ip_rt") === col("ip"), 1)).as("n_roundtrip_ok"))
      .select(
        concat((col("subnet16") / 16777216).cast(LongType).cast("string"),
          lit("."),
          ((col("subnet16") / 65536).cast(LongType) % 256).cast("string"),
          lit(".0.0/16")).as("subnet"),
        col("n_users"), col("n_roundtrip_ok"))
      .orderBy(col("n_users").desc, col("subnet"))
      .limit(10)
  }

  val all: Seq[Q] = Seq(q24, q25, q26, q27, q28, q33, q90, q107, q108)
}
