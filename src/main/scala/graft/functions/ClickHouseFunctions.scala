package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** ClickHouse-named function surface over Spark columns — the aggregate
  * and array function families a ClickHouse user reaches for, expressed
  * as thin wrappers over codegen'd Spark primitives so existing query
  * logic ports line-for-line. All are partial-aggregable (map-side
  * combine) unless noted.
  *
  * ClickHouse name → graft name mapping is 1:1 with the upstream SQL
  * reference; semantics notes where the engines differ.
  */
object ClickHouseFunctions {

  // ---- conditional combinators (…If) -------------------------------------
  def countIf(cond: Column): Column = count(when(cond, 1))
  def sumIf(c: Column, cond: Column): Column = sum(when(cond, c))
  def avgIf(c: Column, cond: Column): Column = avg(when(cond, c))
  def minIf(c: Column, cond: Column): Column = min(when(cond, c))
  def maxIf(c: Column, cond: Column): Column = max(when(cond, c))

  // ---- argMin / argMax ----------------------------------------------------
  /** argMax(arg, val) — deterministic: ties broken by the arg itself. */
  def argMax(arg: Column, by: Column): Column = max_by(arg, struct(by, arg))
  def argMin(arg: Column, by: Column): Column = min_by(arg, struct(by, arg))

  // ---- any / anyLast ------------------------------------------------------
  /** any(x) — ClickHouse's is arbitrary; this one is deterministic
    * (first in the ordering of `ord`), which is strictly stronger. */
  def anyDet(c: Column, ord: Column): Column = min_by(c, ord)
  def anyLastDet(c: Column, ord: Column): Column = max_by(c, ord)

  // ---- uniq family --------------------------------------------------------
  def uniq(c: Column): Column = approx_count_distinct(c, 0.02)
  def uniqExact(c: Column): Column = countDistinct(c)

  // ---- quantiles ----------------------------------------------------------
  /** quantileExact — exact sort-based percentile (interpolated). */
  def quantileExact(c: Column, p: Double): Column = percentile(c, lit(p))
  def quantilesExact(c: Column, ps: Seq[Double]): Column =
    percentile(c, array(ps.map(lit): _*))
  /** quantileTDigest analog — sketch-based approximate percentile. */
  def quantileApprox(c: Column, p: Double): Column =
    percentile_approx(c, lit(p), lit(10000))
  def medianExact(c: Column): Column = percentile(c, lit(0.5))

  // ---- groupArray family --------------------------------------------------
  /** groupArray — order-deterministic variant (sorted), unlike ClickHouse's
    * insertion-ordered one (nondeterministic under distributed merge). */
  def groupArraySorted(c: Column): Column = sort_array(collect_list(c))
  def groupUniqArray(c: Column): Column = sort_array(collect_set(c))

  // ---- sumMap analog ------------------------------------------------------
  /** sumMap(key, value) — per-key sums returned as a map. Keys are
    * low-cardinality by design (as in ClickHouse sumMap), so the per-row
    * fold over the collected pairs is small.
    */
  def sumMap(key: Column, value: Column): Column =
    aggregate(
      sort_array(collect_list(struct(key.as("k"), value.as("v")))),
      map().cast(org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.LongType)),
      (acc, e) => map_concat(
        map_filter(acc, (k, _) => k =!= e.getField("k")),
        map(e.getField("k"),
          coalesce(element_at(acc, e.getField("k")), lit(0L)) + e.getField("v"))))

  // ---- exact money arithmetic --------------------------------------------
  /** Exact decimal sum of a 2-decimal quantity surfaced as double — the
    * engine-portable money aggregate used across the operator library. */
  def sumMoney(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)
  def avgMoney(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType) / count(when(c.isNotNull, 1))

  // ---- array functions (ClickHouse arrayX → Spark HOF) --------------------
  def arrayJoinCol(c: Column): Column = explode(c)
  def arrayMap(c: Column, f: Column => Column): Column = transform(c, f)
  def arrayFilter(c: Column, f: Column => Column): Column = filter(c, f)
  def arraySum(c: Column): Column =
    aggregate(c, lit(0.0), (acc, x) => acc + x.cast(DoubleType))
  def arrayCount(c: Column, f: Column => Column): Column = size(filter(c, f))
  def arrayExists(c: Column, f: Column => Column): Column = exists(c, f)
  def arrayAll(c: Column, f: Column => Column): Column = forall(c, f)
  def arrayDistinctSorted(c: Column): Column = sort_array(array_distinct(c))
  def arrayStringConcat(c: Column, sep: String): Column = array_join(c, sep)
  def has(c: Column, v: Any): Column = array_contains(c, v)

  /** Binds `c` to a lambda variable so the input expression evaluates
    * ONCE per row: predecessor lookups inside then hit the materialized
    * array value (O(1) each) instead of re-embedding — and re-evaluating
    * — the whole input expression per element, which is O(n²) per row
    * and outright wrong for non-deterministic args (each lookup would
    * see a different array).
    */
  private def bindArray(c: Column)(f: Column => Column): Column =
    get(transform(array(c), arr => f(arr)), lit(0))

  /** ClickHouse arrayDifference: [0, a1−a0, a2−a1, …]. Index-aware
    * transform against the 0-based predecessor — one pass, codegen'd.
    */
  def arrayDifference(c: Column): Column =
    bindArray(c)(arr => transform(arr, (x, i) =>
      when(i === 0, lit(0).cast("double"))
        .otherwise(x.cast(DoubleType) - get(arr, i - 1).cast(DoubleType))))

  /** ClickHouse arrayCumSum: running prefix sums. Built with `aggregate`
    * appending per element — O(n²) element copies per row, fine for the
    * row-local bounded arrays ClickHouse uses this on (the set-returning
    * form at scale is a window over exploded rows, q09's shape).
    */
  def arrayCumSum(c: Column): Column =
    aggregate(c,
      struct(lit(0.0).as("run"), array().cast("array<double>").as("out")),
      (acc, x) => {
        val run = acc.getField("run") + x.cast(DoubleType)
        struct(run.as("run"), concat(acc.getField("out"), array(run)).as("out"))
      },
      acc => acc.getField("out"))

  /** ClickHouse arrayCompact: drop consecutive duplicates (keep first of
    * each run). Null-safe predecessor compare via <=>.
    */
  def arrayCompact(c: Column): Column =
    bindArray(c)(arr => filter(arr, (x, i) => i === 0 || !(x <=> get(arr, i - 1))))

  // ---- date/time (toStartOf*) --------------------------------------------
  def toStartOfMonth(c: Column): Column = date_trunc("month", c)
  /** ClickHouse toStartOfWeek defaults to mode 0 = SUNDAY-start weeks
    * (Spark's date_trunc('week', …) is Monday/ISO — that is ClickHouse
    * mode 1, exposed here as the mode=1 branch). Returns a date, matching
    * ClickHouse.
    */
  def toStartOfWeek(c: Column, mode: Int = 0): Column =
    if (mode == 1) to_date(date_trunc("week", c))
    else date_sub(to_date(c), dayofweek(c) - 1)
  def toStartOfDay(c: Column): Column = date_trunc("day", c)
  def toStartOfHour(c: Column): Column = date_trunc("hour", c)
  def toStartOfMinute(c: Column): Column = date_trunc("minute", c)
  def toStartOfInterval(c: Column, seconds: Int): Column =
    timestamp_seconds(floor(unix_timestamp(c) / seconds) * seconds)
  def toYYYYMM(c: Column): Column = date_format(c, "yyyyMM")

  // ---- string -------------------------------------------------------------
  def extractAll(c: Column, re: String): Column = regexp_extract_all(c, lit(re), lit(0))
  def splitByChar(sep: String, c: Column): Column = split(c, java.util.regex.Pattern.quote(sep))
  def cutToFirstSignificantSubdomain(c: Column): Column =
    regexp_extract(c, "([a-z0-9-]+\\.[a-z]+)$", 1)
}
