package graft

import graft.operators.MergeTree
import org.apache.spark.sql.functions._

/** MergeTree-family FINAL semantics invariants (the dialect's FROM …
  * FINAL equivalences live in ClickHouseDialectSpec; these pin the
  * engine-side algebra).
  */
class MergeTreeSpec extends SparkSpec {

  test("q82 versioned collapsing: survivor state equals the per-key latest row") {
    val t = sf0001
    val rows = MergeTree.versioned.build(t).collect()
    assert(rows.length === 5)

    // the cancel-previous/insert-new protocol leaves exactly one
    // surviving +1 per key — the latest event — so total_final_value
    // must equal a direct latest-row-per-key aggregate
    val direct = t.events
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("latest"))
      .groupBy(col("event_type"))
      .agg(sum(col("latest").cast("decimal(18,2)")).cast("double").as("tv"),
        sum(col("n")).as("n_events"),
        count(lit(1)).as("n_keys"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3)))
      .toMap

    rows.foreach { r =>
      val (tv, nEvents, nKeys) = direct(r.getString(0))
      assert(math.abs(
        r.getAs[Double]("total_final_value") - tv) < 1e-6)
      assert(r.getAs[Long]("n_keys") === nKeys)
      // writes = 2n − 1 per key: n inserts + (n − 1) cancels
      assert(r.getAs[Long]("n_writes") === 2 * nEvents - nKeys)
      // every non-latest version is a cancelled pair
      assert(r.getAs[Long]("n_cancelled_pairs") === nEvents - nKeys)
    }
  }

  test("q84 TTL: delete and group-by policies partition rows exactly") {
    val t = sf0001
    val rows = MergeTree.ttlExpiry.build(t).collect()
    assert(rows.length === 5)
    val totals = t.events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("tv"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val (n, tv) = totals(r.getString(0))
      // the two policies cover every row exactly once
      assert(r.getAs[Long]("n_live") + r.getAs[Long]("n_expired") === n)
      // the GROUP BY policy preserves expired value mass exactly
      assert(math.abs(
        r.getAs[Double]("live_value") +
        r.getAs[Double]("rollup_value") - tv) < 1e-6)
      // 30 days of data, 14-day TTL: expired mass collapses to ≤16 day rows
      assert(r.getAs[Long]("n_rollup_rows") <= 16L)
      assert(r.getAs[Long]("n_rollup_rows") <= r.getAs[Long]("n_expired"))
    }
  }
}
