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

  val all: Seq[Q] = Seq(q24, q25, q26, q27, q28, q33)
}
