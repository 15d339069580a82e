package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Scale-safe GROUPED running aggregates: the generalization of
  * [[GlobalRank]] to `agg() OVER (PARTITION BY g ORDER BY s ROWS
  * UNBOUNDED PRECEDING)` where `g` is LOW-cardinality (an enum, a
  * status code, a handful of tenants). The naive window funnels the
  * entire fact table into |g| sorted partitions — parallelism is fixed
  * at 3-5 tasks while data grows, the canonical 100 TB scale-killer.
  *
  * Shape (two-pass prefix decomposition):
  *   1. `stage`: range-partition on (g ++ sortKey) so each task holds a
  *      CONTIGUOUS SLICE of each group's global order, sort within
  *      partitions, tag the slice id, and pin the layout with a
  *      localCheckpoint (two consumers must observe the same sampled
  *      range bounds — exchange reuse is not guaranteed).
  *   2. per-slice partials: one partial-aggregable groupBy over
  *      (g, slice) — the slices relation has ≤ |g| + numPartitions rows
  *      REGARDLESS of input size.
  *   3. prefix-combine the partials over strictly-earlier slices of the
  *      same group (a window over the tiny slices relation) and
  *      broadcast the offsets back onto the staged rows.
  *   4. local windows partitioned by (g, slice) — parallelism is
  *      numPartitions × |g|, each task sorts only its slice — plus the
  *      broadcast offset reconstruct the global running value exactly.
  *
  * Everything prefix-decomposable rides this: running sums (sweep
  * counters, island ids, cumulative weights), running max (interval
  * union), ranks and tie-aware midranks (count-based, BIGINT-safe —
  * no 32-bit rank()), lag across slice boundaries (per-slice last-row
  * partial). For rank/midrank callers the range keys MUST be
  * (g, value) WITHOUT a tie-break: the RangePartitioner sends equal
  * keys to one partition, so tied values never straddle a slice
  * boundary and within-slice tie counts are globally correct.
  */
object GroupedPrefix {

  /** Slice-id column: present in every window this plan family runs
    * (PlanShapeSpec pins that no fact window lacks it).
    */
  val PID = "__gp_pid"

  /** Range-partition `df` on `keys` (group columns first, then the sort
    * key), sort within partitions, tag the slice id, pin the layout.
    * numPartitions ≤ 0 means the session's shuffle parallelism.
    */
  def stage(df: DataFrame, keys: Seq[Column], numPartitions: Int = 0): DataFrame = {
    val n = if (numPartitions > 0) numPartitions
            else df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartitionByRange(n, keys: _*)
      .sortWithinPartitions(keys: _*)
      // spark_partition_id is nondeterministic-tagged, so the project is
      // never pushed below the sort; the checkpoint freezes the values
      .withColumn(PID, spark_partition_id())
      .localCheckpoint()
  }

  /** Exclusive-prefix window over the slices relation: strictly-earlier
    * slices of the same group, in slice order.
    */
  private def prevSlices(groupCols: Seq[String]): WindowSpec =
    Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(PID))
      .rowsBetween(Window.unboundedPreceding, -1)

  /** Compute per-(group, slice) partials `aggs` from a staged frame,
    * hand them (plus the exclusive-prefix WindowSpec over slices) to
    * `offsets`, which returns the offsets relation — it MUST keep the
    * (groupCols, PID) key columns and may add whole-group columns (e.g.
    * group totals) — and broadcast-join the result back onto the staged
    * rows. The offsets relation is ≤ |groups| × numPartitions rows, so
    * the broadcast is always dimension-sized.
    */
  def withOffsets(staged: DataFrame, groupCols: Seq[String], aggs: Seq[Column])
                 (offsets: (DataFrame, WindowSpec) => DataFrame): DataFrame = {
    val keys = (groupCols :+ PID).map(col)
    val slices = staged.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
    // NULL-SAFE key equality: a NULL group key is a regular group under
    // PARTITION BY window semantics, but null != null in a plain
    // equi-join — those rows would silently drop. Rename the offsets
    // side's keys, join on <=> (broadcast-hash supports EqualNullSafe),
    // and drop the duplicates.
    val keyNames = groupCols :+ PID
    val renamed = keyNames.foldLeft(offsets(slices, prevSlices(groupCols)))(
      (d, c) => d.withColumnRenamed(c, "__gp_r_" + c))
    val cond = keyNames.map(c => col(c) <=> col("__gp_r_" + c))
      .reduce(_ && _)
    staged.join(broadcast(renamed), cond)
      .drop(keyNames.map("__gp_r_" + _): _*)
  }

  /** The slice-scoped window every consumer's local pass runs under:
    * partitioned by (group, slice) — numPartitions × |groups| concurrent
    * window partitions, each holding one contiguous slice of one group's
    * order — never by the group alone.
    */
  def localWindow(groupCols: Seq[String], sortCols: Seq[Column]): WindowSpec =
    Window.partitionBy((groupCols :+ PID).map(col): _*).orderBy(sortCols: _*)

  /** Append a BIGINT grouped RANK() of `v` (min rank over ties) as
    * `out`: stage WITHOUT a tie-break so ties stay within one slice,
    * offset = rows in earlier slices, local rank within the slice.
    * Drops the plumbing columns so calls chain (q71 ranks two measures
    * by staging twice).
    */
  def withRank(df: DataFrame, groupCols: Seq[String], v: Column, out: String,
               numPartitions: Int = 0): DataFrame = {
    val staged = stage(df, groupCols.map(col) :+ v, numPartitions)
    withOffsets(staged, groupCols, Seq(count(lit(1)).as("__gp_c"))) { (slices, wPrev) =>
      slices.select((groupCols :+ PID).map(col) :+
        coalesce(sum(col("__gp_c")).over(wPrev), lit(0L)).as("__gp_off"): _*)
    }
      .withColumn(out, col("__gp_off") + rank().over(localWindow(groupCols, Seq(v))))
      .drop("__gp_off", PID)
  }
}
