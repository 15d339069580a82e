package graft

import graft.plans.GroupedPrefix
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Property checks for plans.GroupedPrefix: the two-pass grouped prefix
  * aggregation must be value-identical to the naive enum-keyed window
  * it replaces, across slice boundaries, tie groups, empty slices, and
  * single-row groups. The naive forms are safe HERE because the spec
  * data is tiny — production plans must never use them (PlanShapeSpec
  * pins that).
  */
class GroupedPrefixSpec extends SparkSpec {

  // deterministic, tie-heavy, skewed: 3 enum groups, values drawn from
  // a small domain so tie groups span would-be slice boundaries, one
  // group with a single row, row count >> numPartitions
  private lazy val data = {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val rows = (1 to 400).map { i =>
      val g = if (i == 400) "Z" else Seq("A", "B", "C")(rng.nextInt(3))
      (g, rng.nextInt(20).toLong, i.toLong, rng.nextInt(1000).toLong - 500)
    }
    rows.toDF("g", "v", "id", "x")
  }

  test("withRank matches the naive grouped RANK() under heavy ties") {
    val got = GroupedPrefix.withRank(data, Seq("g"), col("v"), "r",
      numPartitions = 7)
      .select(col("g"), col("id"), col("r")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val naive = data.withColumn("r",
      rank().over(Window.partitionBy(col("g")).orderBy(col("v"))))
      .select(col("g"), col("id"), col("r")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2).toLong).toMap
    assert(got === naive)
  }

  test("running sum with offsets matches the naive window across slices") {
    val staged = GroupedPrefix.stage(data,
      Seq(col("g"), col("v"), col("id")), numPartitions = 7)
    val got = GroupedPrefix.withOffsets(staged, Seq("g"),
      Seq(sum(col("x")).as("__s"))) { (slices, wPrev) =>
      slices.select(col("g"), col(GroupedPrefix.PID),
        coalesce(sum(col("__s")).over(wPrev), lit(0L)).as("__off"))
    }
      .withColumn("run", col("__off") + sum(col("x")).over(
        GroupedPrefix.localWindow(Seq("g"), Seq(col("v"), col("id")))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("g"), col("id"), col("run")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val naive = data.withColumn("run", sum(col("x")).over(
      Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("g"), col("id"), col("run")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === naive)
  }

  test("boundary-patched lag matches the naive grouped lag") {
    val staged = GroupedPrefix.stage(data,
      Seq(col("g"), col("v"), col("id")), numPartitions = 7)
    val got = GroupedPrefix.withOffsets(staged, Seq("g"),
      Seq(max(struct(col("v").as("v"), col("id").as("i"),
        col("x").as("x"))).as("__last"))) { (slices, wPrev) =>
      slices.select(col("g"), col(GroupedPrefix.PID),
        max(col("__last")).over(wPrev).getField("x").as("__prev"))
    }
      .withColumn("lx", coalesce(
        lag(col("x"), 1).over(GroupedPrefix.localWindow(Seq("g"),
          Seq(col("v"), col("id")))), col("__prev")))
      .select(col("g"), col("id"), col("lx")).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val naive = data.withColumn("lx", lag(col("x"), 1).over(
      Window.partitionBy(col("g")).orderBy(col("v"), col("id"))))
      .select(col("g"), col("id"), col("lx")).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got === naive)
  }

  test("tie groups never straddle slices when staged without a tie-break") {
    // the property BIGINT-safe midranks rely on: stage(g, v) sends every
    // row of a (g, v) tie group to ONE slice
    val staged = GroupedPrefix.stage(data, Seq(col("g"), col("v")),
      numPartitions = 7)
    val spread = staged.groupBy(col("g"), col("v"))
      .agg(countDistinct(col(GroupedPrefix.PID)).as("slices"))
      .agg(max(col("slices"))).head().getLong(0)
    assert(spread === 1L, "a tie group crossed a slice boundary")
  }

  test("NULL group keys survive — treated as one regular group") {
    // PARTITION BY treats NULL as a group; the offsets join must use
    // null-safe equality or those rows silently drop (ADVICE r7)
    import spark.implicits._
    val withNulls = data.withColumn("g",
      when(col("g") === "C", lit(null: String)).otherwise(col("g")))
    val got = GroupedPrefix.withRank(withNulls, Seq("g"), col("v"), "r",
      numPartitions = 7)
    assert(got.count() === 400L, "rows dropped on NULL group keys")
    val gotMap = got.select(col("g"), col("id"), col("r")).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1)) -> r.getLong(2)).toMap
    val naive = withNulls.withColumn("r",
      rank().over(Window.partitionBy(col("g")).orderBy(col("v"))))
      .select(col("g"), col("id"), col("r")).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1)) ->
        r.getInt(2).toLong).toMap
    assert(gotMap === naive)
  }

  test("exactQuantile matches percentile() bit-for-bit, ties and all") {
    for (q <- Seq(0.0, 0.25, 0.5, 0.9, 1.0)) {
      val got = GroupedPrefix.exactQuantile(data, Seq("g"), col("x"), q,
        "qv", numPartitions = 7)
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
        .toMap
      val naive = data.groupBy(col("g"))
        .agg(expr(s"percentile(x, $q)").as("qv"), count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
        .toMap
      assert(got === naive, s"q=$q")
    }
  }

  test("exactQuantile ignores NULL values exactly like percentile()") {
    // NULLs sort first ascending — left in the staged order they would
    // inflate n, shift every target position, and could be selected as
    // lo/hi. percentile() ignores NULL inputs; so must the rank path.
    val withNulls = data.withColumn("xn",
      when(col("id") % 5 === 0, lit(null)).otherwise(col("x")))
    for (q <- Seq(0.0, 0.5, 0.9)) {
      val got = GroupedPrefix.exactQuantile(withNulls, Seq("g"), col("xn"), q,
        "qv", numPartitions = 7)
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
        .toMap
      val naiveAll = withNulls.groupBy(col("g"))
        .agg(expr(s"percentile(xn, $q)").as("qv"),
          count(col("xn")).as("n")) // non-null count — the documented {out}_n
        .collect()
      // a group whose values are ALL NULL (g=Z here: its one row lands
      // on the id%5 mask) emits no row from the rank path; percentile()
      // surfaces it as NULL — both mean "no data"
      val naive = naiveAll.filter(r => r.getLong(2) > 0)
        .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
      assert(naiveAll.exists(r => r.getLong(2) == 0L),
        "fixture lost its all-NULL group")
      assert(got === naive, s"q=$q")
    }
  }

  test("exactQuantiles multi-point and global (no groups) match percentile()") {
    val qs = Seq(0.5, 0.9, 0.99)
    val got = GroupedPrefix.exactQuantiles(data, Seq("g"), col("x"), qs,
      "ps", numPartitions = 7)
      .collect().map(r => r.getString(0) ->
        (r.getSeq[Double](1), r.getLong(2))).toMap
    val naive = data.groupBy(col("g"))
      .agg(expr("percentile(x, array(0.5, 0.9, 0.99))").as("ps"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[Double](1), r.getLong(2))).toMap
    assert(got === naive)
    // empty groupCols = one global group (the ungrouped-agg shape)
    val g0 = GroupedPrefix.exactQuantiles(data, Seq.empty, col("x"), qs,
      "ps", numPartitions = 7).head()
    val n0 = data.agg(expr("percentile(x, array(0.5, 0.9, 0.99))"),
      count(lit(1))).head()
    assert(g0.getSeq[Double](0) === n0.getSeq[Double](0))
    assert(g0.getLong(1) === n0.getLong(1))
  }

  test("offsets relation is slice-bounded, not data-bounded") {
    val staged = GroupedPrefix.stage(data,
      Seq(col("g"), col("v"), col("id")), numPartitions = 7)
    val slices = staged.groupBy(col("g"), col(GroupedPrefix.PID))
      .agg(count(lit(1))).count()
    // ≤ |groups| + numPartitions (each slice holds a contiguous range,
    // so at most one group boundary adds one extra (g, pid) row each)
    assert(slices <= 4 + 7, s"slices relation too large: $slices")
  }
}
