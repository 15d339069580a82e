package graft

import java.sql.Timestamp

import graft.streaming.Streams
import graft.streaming.Streams.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkSpec {

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")

  test("windowed counts aggregate per 5-minute window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(0), 10, "click", 1.0),
      Event(2, ts(1), 11, "click", 2.0),
      Event(3, ts(6), 10, "view", 3.0))
    val q = Streams.windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("win_counts").collect()
        .map(r => (r.getAs[Timestamp]("win_start").toString, r.getAs[String]("event_type"),
          r.getAs[Long]("n"), r.getAs[Double]("total"))).toSet
      assert(rows === Set(
        ("2024-01-01 00:00:00.0", "click", 2L, 3.0),
        ("2024-01-01 00:05:00.0", "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("stream dedup drops repeated event_ids within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.dedupStream(mem.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(Event(1, ts(0), 10, "click", 1.0), Event(1, ts(0), 10, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Event(1, ts(1), 10, "click", 1.0), Event(2, ts(1), 11, "view", 2.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").collect().map(_.getAs[Long]("event_id")).sorted
      assert(ids.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("partitioned ingest lands month-partitioned sorted files, idempotent on restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_pi").toString
    def mts(month: Int, day: Int): Timestamp =
      Timestamp.valueOf(f"2024-$month%02d-$day%02d 00:00:00")
    val mem = MemoryStream[Event]
    def start() = Streams.partitionedIngest(mem.toDF(),
      s"$dir/table", s"$dir/ckpt", sortKey = Seq("user_id", "ts"))
    val q1 = start()
    try {
      mem.addData(
        Event(1, mts(1, 5), 30, "click", 1.0),
        Event(2, mts(1, 6), 10, "view", 2.0),
        Event(3, mts(2, 3), 20, "click", 3.0))
      q1.processAllAvailable()
    } finally q1.stop()
    // month directories exist; files within each are sorted by user_id
    val root = new java.io.File(s"$dir/table")
    val parts = root.listFiles().filter(_.getName.startsWith("__ch_part="))
      .map(_.getName).sorted
    assert(parts.toSeq === Seq("__ch_part=202401", "__ch_part=202402"))
    root.listFiles().filter(_.isDirectory).foreach { d =>
      d.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        // each committed file holds runs sorted by the FULL declared
        // sort key (user_id, ts) — the same sorted-parts property the
        // batch CTAS write path guarantees (PartitionedTableE2ESpec)
        val us = spark.read.parquet(f.getAbsolutePath)
          .select("user_id", "ts").collect()
          .map(r => (r.getLong(0), r.getTimestamp(1).getTime)).toSeq
        assert(us === us.sorted, s"${f.getName} not sorted by (user_id, ts)")
      }
    }
    // restart on the same checkpoint: replayed batches are skipped by
    // the marker, new data appends exactly once
    val q2 = start()
    try {
      mem.addData(Event(4, mts(2, 9), 5, "view", 4.0))
      q2.processAllAvailable()
    } finally q2.stop()
    val all = spark.read.parquet(s"$dir/table")
    assert(all.count() === 4L)
    assert(all.select("event_id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L, 3L, 4L))
    // month retention = directory drop, exactly like the batch dialect
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$dir/table/__ch_part=202401"))
    assert(spark.read.parquet(s"$dir/table").count() === 2L)
  }

  test("TTL ingest drops expired month partitions at batch commit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_pttl").toString
    def mts(month: Int, day: Int): Timestamp =
      Timestamp.valueOf(f"2024-$month%02d-$day%02d 00:00:00")
    val mem = MemoryStream[Event]
    val q = Streams.partitionedIngestTtl(mem.toDF(),
      s"$dir/table", s"$dir/ckpt", keepMonths = 1)
    try {
      mem.addData(
        Event(1, mts(1, 5), 30, "click", 1.0),
        Event(2, mts(2, 6), 10, "view", 2.0))
      q.processAllAvailable()
      // both months within the horizon: nothing expires
      def months = new java.io.File(s"$dir/table").listFiles()
        .filter(_.getName.startsWith("__ch_part=")).map(_.getName).sorted.toSeq
      assert(months === Seq("__ch_part=202401", "__ch_part=202402"))
      // event time advances to April: January/February fall > 1 month
      // behind the newest landed month and their DIRECTORIES drop —
      // retention is a file operation, never a rewrite
      mem.addData(Event(3, mts(4, 2), 20, "click", 3.0))
      q.processAllAvailable()
      assert(months === Seq("__ch_part=202404"))
      assert(spark.read.parquet(s"$dir/table").count() === 1L)
      // wall clock never entered: a replayed/stalled source with no new
      // data expires nothing further
      val before = months
      mem.addData(Event(4, mts(4, 9), 5, "view", 4.0))
      q.processAllAvailable()
      assert(months === before)
      assert(spark.read.parquet(s"$dir/table").count() === 2L)
    } finally q.stop()
  }

  test("partitioned ingest recovers a crash between move and commit exactly once") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_piw").toString
    val path = s"$dir/table"
    val batch = Seq(
      Event(1, Timestamp.valueOf("2024-01-05 00:00:00"), 30, "click", 1.0),
      Event(2, Timestamp.valueOf("2024-02-03 00:00:00"), 20, "view", 2.0))
      .toDF()
      .withColumn("__ch_part",
        org.apache.spark.sql.functions.date_format(
          org.apache.spark.sql.functions.col("ts"), "yyyyMM").cast("int"))
    Streams.landPartitionedBatch(batch, path, Seq("user_id", "ts"), 0L)
    assert(spark.read.parquet(path).count() === 2L)
    // simulate the crash window the WAL closes: files moved, commit
    // marker never written — recovery must UNDO the listed destinations
    // and re-land, not append a second copy
    val root = new java.io.File(path)
    val landed = root.listFiles().filter(_.getName.startsWith("__ch_part="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).sorted
    assert(landed.nonEmpty)
    assert(new java.io.File(path, "_graft_batch_0").delete())
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "_graft_batch_0.inflight"),
      landed.mkString("\n"))
    Streams.landPartitionedBatch(batch, path, Seq("user_id", "ts"), 0L)
    assert(spark.read.parquet(path).count() === 2L,
      "recovery doubled the batch")
    assert(new java.io.File(path, "_graft_batch_0").exists())
    assert(!new java.io.File(path, "_graft_batch_0.inflight").exists())
    // replay with the commit marker present is a no-op
    Streams.landPartitionedBatch(batch, path, Seq("user_id", "ts"), 0L)
    assert(spark.read.parquet(path).count() === 2L)
  }

  test("materialized aggregate table refreshes across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_mv").toString
    val mem = MemoryStream[Event]
    val q = Streams.materializedAgg(mem.toDF(), s"$dir/table", s"$dir/ckpt")
    try {
      mem.addData(Event(1, ts(0), 10, "click", 2.0), Event(2, ts(1), 11, "click", 3.0))
      q.processAllAvailable()
      val s1 = spark.read.parquet(s"$dir/table").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(s1 === Set(("click", 2L, 5.0)))
      mem.addData(Event(3, ts(2), 10, "view", 7.0))
      q.processAllAvailable()
      val s2 = spark.read.parquet(s"$dir/table").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(s2 === Set(("click", 2L, 5.0), ("view", 1L, 7.0)))
    } finally q.stop()
  }

  test("state-store materialized view survives restart with no double counting") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_ss").toString
    val mem = MemoryStream[Event]
    def start() =
      Streams.materializedAggStateful(mem.toDF(), s"$dir/table", s"$dir/ckpt")
    def view(): Map[String, (Long, Double)] =
      spark.read.parquet(s"$dir/table").collect()
        .map(r => r.getAs[String]("event_type") ->
          (r.getAs[Long]("n"), r.getAs[Double]("total"))).toMap
    // phase 1: two batches accumulate state, then stop
    val q1 = start()
    try {
      mem.addData(Event(1, ts(0), 10, "click", 2.0), Event(2, ts(1), 11, "click", 3.0))
      q1.processAllAvailable()
      mem.addData(Event(3, ts(2), 10, "view", 7.0))
      q1.processAllAvailable()
      assert(view() === Map("click" -> (2L, 5.0), "view" -> (1L, 7.0)))
    } finally q1.stop()
    // phase 2: restart on the same checkpoint; the running (n, total)
    // must CONTINUE from restored state — 3 clicks total, not 1 — and
    // the untouched view partition must not double-count either
    val q2 = start()
    try {
      mem.addData(Event(4, ts(3), 12, "click", 1.0))
      q2.processAllAvailable()
      assert(view() === Map("click" -> (3L, 6.0), "view" -> (1L, 7.0)))
    } finally q2.stop()
  }

  test("stream-stream interval join attributes purchases to clicks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.clickAttribution(mem.toDF())
      .writeStream.format("memory").queryName("attribution")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Event(1, ts(0), 10, "click", 0.0),
        Event(2, ts(3), 10, "purchase", 99.0),   // within 10 min of click 1
        Event(3, ts(2), 11, "purchase", 50.0),   // different user, no click
        Event(4, ts(30), 10, "purchase", 10.0))  // outside the horizon
      q.processAllAvailable()
      mem.addData(Event(5, ts(59), 99, "click", 0.0)) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("attribution").collect()
        .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("purchase_id")))
      assert(rows.toSet === Set((1L, 2L)))
    } finally q.stop()
  }

  test("streaming as-of enrichment joins each event to the latest earlier quote") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = MemoryStream[Event]
    val qs = MemoryStream[Streams.Quote]
    val q = Streams.asofEnrich(ev.toDS(), qs.toDS())
      .writeStream.format("memory").queryName("asof_out")
      .outputMode(OutputMode.Append).start()
    try {
      // quotes at t=0 (10.0) and t=5 (20.0) for user 10; none for user 11
      qs.addData(Streams.Quote(ts(0), 10, 10.0), Streams.Quote(ts(5), 10, 20.0))
      ev.addData(
        Event(1, ts(2), 10, "click", 0.0),  // between quotes -> 10.0
        Event(2, ts(7), 10, "view", 0.0),   // after second -> 20.0
        Event(3, ts(3), 11, "click", 0.0))  // no quote -> None
      q.processAllAvailable()
      val rows = spark.table("asof_out").collect()
        .map(r => (r.getAs[Long]("event_id"),
          Option(r.getAs[java.lang.Double]("quote_value")).map(_.toDouble))).toMap
      assert(rows === Map(1L -> Some(10.0), 2L -> Some(20.0), 3L -> None))

      // a later quote never rewrites history: event at t=8 sees 20.0 even
      // after a t=9 quote lands first in arrival order
      qs.addData(Streams.Quote(ts(9), 10, 30.0))
      q.processAllAvailable()
      ev.addData(Event(4, ts(8), 10, "click", 0.0))
      q.processAllAvailable()
      val v4 = spark.table("asof_out").collect()
        .find(_.getAs[Long]("event_id") == 4L).get.getAs[java.lang.Double]("quote_value")
      assert(v4.toDouble === 20.0)
    } finally q.stop()
  }

  test("as-of eviction keeps the predecessor quote across the horizon boundary") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = MemoryStream[Event]
    val qs = MemoryStream[Streams.Quote]
    // 5-minute horizon: the t=0 quote falls outside it once the t=10 quote
    // lands, but it is still the as-of predecessor for events before t=10
    val q = Streams.asofEnrich(ev.toDS(), qs.toDS(), horizonSec = 300)
      .writeStream.format("memory").queryName("asof_evict")
      .outputMode(OutputMode.Append).start()
    try {
      qs.addData(Streams.Quote(ts(0), 10, 10.0), Streams.Quote(ts(10), 10, 30.0))
      q.processAllAvailable()
      ev.addData(Event(1, ts(8), 10, "click", 0.0)) // before t=10 -> needs t=0 quote
      q.processAllAvailable()
      val v = spark.table("asof_evict").collect()
        .find(_.getAs[Long]("event_id") == 1L).get.getAs[java.lang.Double]("quote_value")
      assert(v != null && v.toDouble === 10.0)
    } finally q.stop()
  }

  test("windowed top-k materialization keeps the k best types per window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_topk").toString
    val mem = MemoryStream[Event]
    val q = Streams.windowedTopK(mem.toDF(), s"$dir/out", s"$dir/ckpt", k = 2)
    try {
      mem.addData(
        Event(1, ts(0), 1, "click", 0), Event(2, ts(1), 2, "click", 0),
        Event(3, ts(1), 3, "click", 0), Event(4, ts(2), 4, "view", 0),
        Event(5, ts(2), 5, "view", 0), Event(6, ts(3), 6, "buy", 0),
        Event(7, ts(6), 7, "buy", 0))
      q.processAllAvailable()
      val rows = spark.read.parquet(s"$dir/out").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("win_start").toString,
          r.getAs[String]("event_type"), r.getAs[Long]("n"), r.getAs[Int]("rnk")))
      val w0 = rows.filter(_._1.startsWith("2024-01-01 00:00")).sortBy(_._4)
      assert(w0.map(r => (r._2, r._3)).toSeq === Seq(("click", 3L), ("view", 2L)))
      assert(rows.count(_._1.startsWith("2024-01-01 00:05")) === 1) // only "buy"
    } finally q.stop()
  }

  test("stateful sessionization closes sessions on gap timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.sessionize(mem.toDS(), gapSec = 300, watermark = "1 minute")
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append).start()
    try {
      // user 10: two events 1 min apart (one session), then a 20-min gap event
      mem.addData(Event(1, ts(0), 10, "click", 1.0), Event(2, ts(1), 10, "view", 1.0))
      q.processAllAvailable()
      mem.addData(Event(3, ts(21), 10, "click", 1.0))
      q.processAllAvailable()
      // push watermark far past the first session's timeout
      mem.addData(Event(4, ts(59), 99, "click", 1.0))
      q.processAllAvailable()
      val sessions = spark.table("sessions_out").collect()
        .filter(_.getAs[Long]("user_id") == 10L)
        .map(r => (r.getAs[Timestamp]("start_ts").toString, r.getAs[Long]("n_events")))
      assert(sessions.contains(("2024-01-01 00:00:00.0", 2L)),
        s"expected first session of user 10 closed, got ${sessions.mkString(", ")}")
    } finally q.stop()
  }

  test("streaming debounce keeps the chain survivors per (user, type)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.debounceStream(mem.toDS(), windowSec = 60,
      watermark = "1 minute")
      .writeStream.format("memory").queryName("debounce_out")
      .outputMode(OutputMode.Append).start()
    try {
      def at(sec: Int) = new java.sql.Timestamp(
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime + sec * 1000L)
      // burst at 0 / 50 / 100 / 150 s: chain semantics keep 0 and 100 —
      // 50 is within 60 s of kept-0, 100 is not, 150 is within 60 s of
      // kept-100. A different event_type at 50 s is its own chain.
      mem.addData(
        Event(1, at(0), 7, "click", 1.0), Event(2, at(50), 7, "click", 1.0),
        Event(5, at(50), 7, "view", 1.0))
      q.processAllAvailable()
      // later batch continues the same chain from state
      mem.addData(Event(3, at(100), 7, "click", 1.0),
        Event(4, at(150), 7, "click", 1.0))
      q.processAllAvailable()
      val kept = spark.table("debounce_out").collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("event_id")))
        .toSet
      assert(kept === Set(("click", 1L), ("click", 3L), ("view", 5L)),
        s"got $kept")
    } finally q.stop()
  }

  test("streaming near-dup flags a twin arriving in a later batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.Doc]
    val q = Streams.nearDupStream(mem.toDS())
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: three distinct documents (held in per-bucket state)
      mem.addData(
        Streams.Doc(1, ts(0), "alpha beta gamma delta epsilon zeta eta theta"),
        Streams.Doc(2, ts(0), "one two three four five six seven eight nine"),
        Streams.Doc(3, ts(0), "red orange yellow green blue indigo violet"))
      q.processAllAvailable()
      assert(spark.table("neardup_out").count() === 0, "distinct docs produce no hits")
      // batch 2: a near-twin of doc 1 (last word dropped) and a fresh doc
      mem.addData(
        Streams.Doc(11, ts(1), "alpha beta gamma delta epsilon zeta eta"),
        Streams.Doc(4, ts(1), "completely different text with no overlap at all"))
      q.processAllAvailable()
      val hits = spark.table("neardup_out").collect()
        .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
      assert(hits === Set((1L, 11L)),
        s"expected exactly the planted twin pair, got ${hits.mkString(", ")}")
    } finally q.stop()
  }

  test("near-dup bucket state survives a query restart via the state store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_nd_ckpt").toString
    val mem = MemoryStream[Streams.Doc]
    // memory sink cannot recover from a checkpoint; foreachBatch can
    val hits = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    def start() =
      Streams.nearDupStream(mem.toDS())
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Streams.NearDupHit], _: Long) =>
          batch.collect().foreach(h => hits.add((h.id1, h.id2)))
        }
        .start()
    // phase 1: hold three distinct documents in per-bucket state, then stop
    val q1 = start()
    try {
      mem.addData(
        Streams.Doc(1, ts(0), "alpha beta gamma delta epsilon zeta eta theta"),
        Streams.Doc(2, ts(0), "one two three four five six seven eight nine"),
        Streams.Doc(3, ts(0), "red orange yellow green blue indigo violet"))
      q1.processAllAvailable()
      assert(hits.isEmpty)
    } finally q1.stop()
    // phase 2: restart from the checkpoint; the twin of doc 1 must match
    // the signature held BEFORE the restart — state restored, and the
    // already-committed batch is not replayed
    val q2 = start()
    try {
      mem.addData(
        Streams.Doc(11, ts(1), "alpha beta gamma delta epsilon zeta eta"),
        Streams.Doc(4, ts(1), "completely different text with no overlap at all"))
      q2.processAllAvailable()
      val got = hits.toArray(Array.empty[(Long, Long)])
      // the pair may legitimately emit once per shared band bucket (sink
      // dedups per pair); what must hold is that ONLY the twin pair
      // appears — phase 1's committed batch is not replayed
      assert(got.toSet === Set((1L, 11L)),
        s"state must survive restart: got ${got.mkString(", ")}")
    } finally q2.stop()
  }

  test("idle near-dup buckets expire after the event-time TTL") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.Doc]
    // 60 s TTL, zero watermark delay: a bucket idle past a minute expires
    val q = Streams.nearDupStream(mem.toDS(), watermark = "0 seconds", idleTtlSec = 60)
      .writeStream.format("memory").queryName("nd_ttl_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(Streams.Doc(1, ts(0), "alpha beta gamma delta epsilon zeta eta theta"))
      q.processAllAvailable()
      // advance the watermark well past the TTL with an unrelated doc
      mem.addData(Streams.Doc(2, ts(10), "one two three four five six seven eight nine"))
      q.processAllAvailable()
      // doc 1's bucket state has timed out — its twin no longer matches
      mem.addData(Streams.Doc(11, ts(11), "alpha beta gamma delta epsilon zeta eta"))
      q.processAllAvailable()
      assert(spark.table("nd_ttl_out").count() === 0,
        "expired bucket state must not produce hits")
    } finally q.stop()
  }

  test("streaming replacing view emits only changed keys; stale updates are silent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.replacingStream(mem.toDS())
      .writeStream.format("memory").queryName("repl_stream")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Event(10, ts(1), 1, "cart", 5.0),
        Event(11, ts(2), 1, "cart", 7.0), // same batch: later version wins
        Event(20, ts(1), 2, "view", 1.0))
      q.processAllAvailable()
      val r1 = spark.table("repl_stream").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
          r.getAs[Long]("event_id"))).toSet
      assert(r1 === Set((1L, "cart", 11L), (2L, "view", 20L)))

      // stale update (older ts) → no emission; fresh update → one change
      mem.addData(
        Event(9, ts(0), 1, "cart", 3.0),   // stale — loses to held (ts(2), 11)
        Event(21, ts(5), 2, "view", 2.0))  // newer — replaces
      q.processAllAvailable()
      val r2 = spark.table("repl_stream").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
          r.getAs[Long]("event_id"))).toSet
      assert(r2 === r1 + ((2L, "view", 21L)))
    } finally q.stop()
  }

  test("streaming funnel emits the reached level once per user on timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.funnelStream(mem.toDS(), windowSec = 3600, idleSec = 300,
      watermark = "1 minute")
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        // user 10: full funnel click -> view -> purchase
        Event(1, ts(0), 10, "click", 0), Event(2, ts(5), 10, "view", 0),
        Event(3, ts(10), 10, "purchase", 0),
        // user 11: click then purchase but NO view — level stays 1
        Event(4, ts(0), 11, "click", 0), Event(5, ts(5), 11, "purchase", 0),
        // user 12: view only — never entered the funnel
        Event(6, ts(0), 12, "view", 0),
        // user 13: view first, the anchoring click arrives LATE next batch
        Event(7, ts(10), 13, "view", 0))
      q.processAllAvailable()
      // late click for user 13: event time BEFORE the view but INSIDE the
      // 1-minute lateness horizon (watermark is min 9 after batch 1 —
      // anything older would be dropped at the source) — re-anchors the
      // funnel to level 2
      mem.addData(Event(8, ts(9, 30), 13, "click", 0))
      q.processAllAvailable()
      // users still inside their idle horizon (timeout beyond the current
      // watermark) are not yet emitted; 12 and 13's timeouts are already
      // behind it and may fire as soon as the watermark advanced
      val early = spark.table("funnel_stream").collect()
        .map(_.getAs[Long]("user_id")).toSet
      assert(!Set(10L, 11L).exists(early))
      mem.addData(Event(9, ts(59), 99, "click", 0)) // advance watermark
      q.processAllAvailable()
      val all = spark.table("funnel_stream").collect()
      assert(all.length === 4) // exactly once per user
      val rows = all
        .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("funnel_level")).toMap
      assert(rows === Map(10L -> 3, 11L -> 1, 12L -> 0, 13L -> 2))
    } finally q.stop()
  }

  test("streaming token budget admits whole docs per source until exhausted") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.SourcedDoc]
    val q = Streams.budgetStream(mem.toDS(), tokenBudget = 10L)
      .writeStream.format("memory").queryName("budget_stream")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Streams.SourcedDoc(1, ts(0), "web", "a b c d"), // 4 tok -> admitted
        Streams.SourcedDoc(2, ts(1), "web", "e f g h"), // 8 total -> admitted
        Streams.SourcedDoc(3, ts(2), "web", "i j k"), // would hit 11 -> dropped
        Streams.SourcedDoc(4, ts(3), "web", "l m"), // 10 total -> still fits
        Streams.SourcedDoc(5, ts(0), "book", "x y z")) // independent budget
      q.processAllAvailable()
      val rows = spark.table("budget_stream").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cum_tokens")).toMap
      assert(rows === Map(1L -> 4L, 2L -> 8L, 4L -> 10L, 5L -> 3L))
      // a later batch cannot overdraw the exhausted source
      mem.addData(Streams.SourcedDoc(6, ts(4), "web", "n"),
        Streams.SourcedDoc(7, ts(4), "book", "w w w w w w w")) // 3+7=10 fits
      q.processAllAvailable()
      val after = spark.table("budget_stream").collect()
        .map(_.getAs[Long]("doc_id")).toSet
      assert(after === Set(1L, 2L, 4L, 5L, 7L))
    } finally q.stop()
  }

  test("streaming corpus clean: quality gate + PII scrub + exact dedup across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val good = "the cat sat on the mat and looked to the window for a long while today"
    val mem = MemoryStream[Streams.Doc]
    val q = Streams.cleanCorpusStream(mem.toDS(), minWords = 10)
      .writeStream.format("memory").queryName("clean_stream")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Streams.Doc(1, ts(0), good + " contact alice@example.com today"),
        Streams.Doc(2, ts(0), "too short"), // fails the word-count gate
        Streams.Doc(3, ts(1), "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor")) // no stopwords
      q.processAllAvailable()
      val rows1 = spark.table("clean_stream").collect()
      assert(rows1.map(_.getAs[Long]("doc_id")).toSet === Set(1L))
      val clean = rows1.head.getAs[String]("clean")
      assert(!clean.contains("alice@example.com") && clean.contains("<EMAIL>"))

      // the same content arriving again (different id, later batch) dedups
      mem.addData(
        Streams.Doc(4, ts(2), good + " contact alice@example.com today"),
        Streams.Doc(5, ts(2), good + " but this one is genuinely different text"))
      q.processAllAvailable()
      assert(spark.table("clean_stream").collect()
        .map(_.getAs[Long]("doc_id")).toSet === Set(1L, 5L))
    } finally q.stop()
  }

  test("TTL rollup stream compacts expired days and preserves value mass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ttl").toString
    def day(d: Int): Timestamp = Timestamp.valueOf(f"2024-01-${d + 1}%02d 00:00:00")
    val mem = MemoryStream[Event]
    val q = Streams.ttlRollupStream(mem.toDS(), s"$dir/t", s"$dir/ckpt", ttlDays = 14)
    try {
      mem.addData(Event(1, day(0), 1, "click", 1.5), Event(2, day(1), 2, "view", 2.5))
      q.processAllAvailable()
      // horizon = day1 − 14: nothing expired, all detail
      assert(spark.read.parquet(s"$dir/t/detail").count() === 2L)
      // day 20 arrives: horizon = day20 − 14 = day6 → days 0/1 expire
      mem.addData(Event(3, day(20), 3, "click", 4.0))
      q.processAllAvailable()
      val detail = spark.read.parquet(s"$dir/t/detail").collect()
      assert(detail.map(_.getAs[Long]("event_id")).toSet === Set(3L))
      val rollup = spark.read.parquet(s"$dir/t/rollup").collect()
        .map(r => (r.getAs[Long]("d"), r.getAs[String]("event_type"),
          r.getAs[Long]("n"), r.getAs[java.math.BigDecimal]("value_sum").doubleValue()))
      assert(rollup.length === 2)
      assert(rollup.map(_._4).sum === 4.0) // 1.5 + 2.5 preserved exactly
      assert(rollup.forall(_._3 === 1L))
      // a third batch must MERGE into the existing rollup, not replace it:
      // late-ish day-2 row expires immediately at the day-20 horizon
      mem.addData(Event(4, day(2), 4, "view", 0.5))
      q.processAllAvailable()
      val r2 = spark.read.parquet(s"$dir/t/rollup").collect()
        .map(r => (r.getAs[Long]("d"), r.getAs[String]("event_type"),
          r.getAs[java.math.BigDecimal]("value_sum").doubleValue()))
      assert(r2.length === 3)
      assert(math.abs(r2.map(_._3).sum - 4.5) < 1e-9)
    } finally q.stop()
  }

  test("stream_kmv: bounded state, batch-identical estimate across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val k = 8
    val p = graft.functions.PortableHash.P
    val mem = MemoryStream[Event]
    val q = Streams.kmvStream(mem.toDS(), k = k)
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode(OutputMode.Append).start()
    try {
      // two batches, 30 distinct users with overlap across batches
      mem.addData((1 to 20).map(i => Event(i, ts(i % 10), i.toLong, "click", 1.0)): _*)
      q.processAllAvailable()
      mem.addData((11 to 30).map(i => Event(100 + i, ts(i % 10), i.toLong, "click", 1.0)): _*)
      q.processAllAvailable()
      val rows = spark.table("kmv_stream").collect()
        .filter(_.getAs[String]("event_type") == "click")
      assert(rows.length === 2, "one estimate emitted per touched batch")
      assert(rows.forall(_.getAs[Long]("n_kept") <= k.toLong), "state bounded by k")
      // the final estimate must equal the batch KMV of ALL 30 users —
      // insertion order and batch boundaries must not matter
      val hashes = (1 to 30).map(u =>
        graft.functions.PortableHash.seeded(u.toLong % p, 9)).distinct.sorted
      val expected =
        if (hashes.size < k) hashes.size.toLong
        else (k - 1).toLong * p / hashes.take(k).last
      // rows are emitted in batch order; MemoryStream sink appends, so the
      // last row for the key is the final state
      assert(rows.last.getAs[Long]("estimate") === expected)
    } finally q.stop()
  }

  test("stream_uniq_upto: saturates at n+1, batch-identical, order-independent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val n = 5
    val mem = MemoryStream[Event]
    val q = Streams.uniqUpToStream(mem.toDS(), n = n)
      .writeStream.format("memory").queryName("uut_stream")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: 3 distinct users — below the cap, exact
      mem.addData((1 to 6).map(i => Event(i, ts(i), (i % 3).toLong, "click", 1.0)): _*)
      q.processAllAvailable()
      // batch 2: 20 more distinct users — saturates at n+1
      mem.addData((1 to 20).map(i => Event(100 + i, ts(i), (10 + i).toLong, "click", 1.0)): _*)
      q.processAllAvailable()
      val rows = spark.table("uut_stream").collect()
        .filter(_.getAs[String]("event_type") == "click")
        .map(_.getAs[Long]("capped_distinct"))
      assert(rows.length === 2)
      assert(rows(0) === 3L, "below the cap the count is exact")
      assert(rows(1) === (n + 1).toLong, "past the cap the answer saturates at n+1")
      // batch-boundary independence: same events in one batch, same answer
      val mem2 = MemoryStream[Event]
      val q2 = Streams.uniqUpToStream(mem2.toDS(), n = n)
        .writeStream.format("memory").queryName("uut_stream2")
        .outputMode(OutputMode.Append).start()
      try {
        mem2.addData(((1 to 6).map(i => Event(i, ts(i), (i % 3).toLong, "click", 1.0))
          ++ (1 to 20).map(i => Event(100 + i, ts(i), (10 + i).toLong, "click", 1.0))): _*)
        q2.processAllAvailable()
        val one = spark.table("uut_stream2").collect()
          .filter(_.getAs[String]("event_type") == "click")
          .map(_.getAs[Long]("capped_distinct"))
        assert(one.last === rows.last)
      } finally q2.stop()
    } finally q.stop()
  }

  test("stream_gap_alert: alerts on big gaps, including across batch boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // threshold 60 s
    val q = Streams.gapAlertStream(mem.toDS(), thresholdUs = 60000000L)
      .writeStream.format("memory").queryName("gap_stream")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: events at t=0s, 10s, 130s → one in-batch alert (120 s gap)
      mem.addData(Event(1, ts(0, 0), 1, "click", 1.0),
        Event(2, ts(0, 10), 1, "click", 1.0),
        Event(3, ts(2, 10), 1, "click", 1.0))
      q.processAllAvailable()
      // batch 2: next event at t=400s → one cross-batch alert (270 s gap)
      mem.addData(Event(4, ts(6, 40), 1, "click", 1.0))
      q.processAllAvailable()
      val alerts = spark.table("gap_stream").collect()
        .filter(_.getAs[String]("event_type") == "click")
        .map(_.getAs[Long]("gap_us")).sorted
      assert(alerts.toSeq === Seq(120000000L, 270000000L))
    } finally q.stop()
  }

  test("stream_partitioned_projection: one stream lands table AND projection, lockstep TTL") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ppi").toString
    def mts(month: Int, day: Int): Timestamp =
      Timestamp.valueOf(f"2024-$month%02d-$day%02d 00:00:00")
    val mem = MemoryStream[Event]
    def start() = Streams.partitionedProjectionIngest(mem.toDF(),
      s"$dir/table", s"$dir/proj", s"$dir/ckpt", keepMonths = 2)
    val q1 = start()
    try {
      mem.addData(
        Event(1, mts(1, 5), 10, "click", 2.50),
        Event(2, mts(1, 6), 10, "click", 3.25),
        Event(3, mts(2, 3), 11, "view", 7.00))
      q1.processAllAvailable()
    } finally q1.stop()
    // both stores landed batch 0: month dirs on the table, a projection
    // part holding month SUBDIRS (CH: projection parts live inside
    // their partition's parts)
    val tableMonths = new java.io.File(s"$dir/table").listFiles()
      .filter(_.getName.startsWith("__ch_part=")).map(_.getName).sorted
    assert(tableMonths.toSeq === Seq("__ch_part=202401", "__ch_part=202402"))
    val part0 = new java.io.File(s"$dir/proj/__part_id=0")
    assert(part0.listFiles().filter(_.getName.startsWith("__ch_part="))
      .map(_.getName).sorted.toSeq ===
      Seq("__ch_part=202401", "__ch_part=202402"))
    // restart on the same checkpoint: replay skips both landings, new
    // data appends exactly once to both
    val q2 = start()
    try {
      mem.addData(Event(4, mts(2, 9), 10, "click", 4.25))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.read.parquet(s"$dir/table").count() === 4L)
    val combined = Streams.readPartitionedProjection(spark, s"$dir/proj")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(combined === Set(
      (202401, "click", 10L, 2L, 575L, 250L, 325L),
      (202402, "view", 11L, 1L, 700L, 700L, 700L),
      (202402, "click", 10L, 1L, 425L, 425L, 425L)))
    // the covered answer equals the base-table recompute — the
    // projection is never a separate source of truth
    val base = spark.read.parquet(s"$dir/table")
      .groupBy("__ch_part", "event_type", "user_id")
      .count().count()
    assert(base === combined.size.toLong)
    // a month far enough ahead expires January from BOTH stores at the
    // same commit — base and projection never diverge
    val q3 = start()
    try {
      mem.addData(Event(5, mts(4, 1), 12, "view", 1.00))
      q3.processAllAvailable()
    } finally q3.stop()
    val monthsAfter = new java.io.File(s"$dir/table").listFiles()
      .filter(_.getName.startsWith("__ch_part=")).map(_.getName).toSet
    assert(!monthsAfter.contains("__ch_part=202401"), monthsAfter.toString)
    val projMonths = Streams.readPartitionedProjection(spark, s"$dir/proj")
      .select("__ch_part").distinct().collect().map(_.getInt(0)).toSet
    assert(projMonths === Set(202402, 202404))
  }

  test("stream_new_vs_returning: one verdict per (user, month), state bounded by calendar") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def mts(month: Int, day: Int): Timestamp =
      Timestamp.valueOf(f"2024-$month%02d-$day%02d 00:00:00")
    val mem = MemoryStream[Streams.Event]
    val q = Streams.newVsReturning(mem.toDS()).writeStream
      .format("memory").queryName("nvr").outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Event(1, mts(1, 5), 10, "click", 1.0),
        Event(2, mts(1, 9), 10, "click", 1.0),   // same month: no 2nd row
        Event(3, mts(2, 1), 10, "click", 1.0),
        Event(4, mts(1, 2), 11, "view", 1.0))
      q.processAllAvailable()
      val r1 = spark.table("nvr").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      val (jan, feb) = (2024 * 12 + 1, 2024 * 12 + 2)
      assert(r1 === Set((10L, jan, "new"), (10L, feb, "returning"),
        (11L, jan, "new")))
      // later batch: repeat months emit NOTHING; new months return once
      mem.addData(
        Event(5, mts(2, 9), 10, "click", 1.0),   // (10, feb) already out
        Event(6, mts(3, 1), 10, "click", 1.0),
        Event(7, mts(2, 2), 11, "view", 1.0))
      q.processAllAvailable()
      val r2 = spark.table("nvr").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(r2 === r1 ++ Set((10L, 2024 * 12 + 3, "returning"),
        (11L, feb, "returning")))
      // a LATE month dated EARLIER than the fixed first month: firstYm is
      // immutable, so the row is 'returning' — never a second
      // un-retractable 'new' for the same user (the documented
      // out-of-order caveat; exactly one 'new' per user, always)
      mem.addData(Event(8, Timestamp.valueOf("2023-12-15 00:00:00"),
        10, "click", 1.0))
      q.processAllAvailable()
      val r3 = spark.table("nvr").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(r3 === r2 + ((10L, 2023 * 12 + 12, "returning")))
      assert(r3.count { case (u, _, k) => u == 10L && k == "new" } === 1)
    } finally q.stop()
  }

  test("stream_bucketed_ingest: stream-landed bucketed facts join with ZERO exchanges, replay-safe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_bkt_ck").toString
    val tbl = "graft_stream_bkt_facts"
    val dim = "graft_stream_bkt_orders"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"DROP TABLE IF EXISTS $dim")
    val mem = MemoryStream[(Long, Double)]
    val facts = mem.toDF().toDF("l_orderkey", "price")
    val q = Streams.bucketedIngest(facts, tbl, ckpt, 4, "l_orderkey")
    try {
      mem.addData((1L, 10.0), (2L, 20.0), (3L, 30.0))
      q.processAllAvailable()
      mem.addData((1L, 40.0), (4L, 50.0))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table(tbl).count() === 5L)
    // a batch-written bucketed dim on the SAME bucket count: the
    // co-located layout q143 proves for batch, now fed by the stream
    Seq((1L, "A"), (2L, "B"), (3L, "C"), (4L, "D")).toDF("o_orderkey", "st")
      .write.format("parquet").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable(dim)
    val joined = spark.table(tbl).hint("merge")
      .join(spark.table(dim),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
    val plan = joined.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the whole point: NO exchange anywhere — both scans feed the merge
    // join bucket-aligned (a re-sort of multi-file buckets is fine; a
    // shuffle is the regression)
    assert(!plan.contains("Exchange"), plan.take(3000))
    assert(plan.contains("SortMergeJoin"), plan.take(3000))
    assert(joined.count() === 5L)
    // replay of a committed batch is a no-op (marker short-circuits)
    Streams.landBucketedBatch(Seq((9L, 99.0)).toDF("l_orderkey", "price"),
      tbl, 4, "l_orderkey", 0L)
    assert(spark.table(tbl).count() === 5L)
    // un-committed batch ids land normally (the recovery path appends)
    Streams.landBucketedBatch(Seq((9L, 99.0)).toDF("l_orderkey", "price"),
      tbl, 4, "l_orderkey", 7L)
    assert(spark.table(tbl).count() === 6L)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"DROP TABLE IF EXISTS $dim")
  }

  test("bucketed ingest recovers a crash between move and commit exactly once") {
    import spark.implicits._
    val tbl = "graft_stream_bkt_recovery"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val batch = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0))
      .toDF("l_orderkey", "price")
    Streams.landBucketedBatch(batch, tbl, 4, "l_orderkey", 0L)
    assert(spark.table(tbl).count() === 3L)
    // simulate the crash window the WAL closes: bucket files moved in,
    // commit marker never written — recovery must UNDO the listed
    // destinations and re-land, never append a second copy
    val loc = new java.io.File(java.net.URI.create(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl)).location.toString))
    val landed = loc.listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).sorted
    assert(landed.nonEmpty)
    assert(new java.io.File(loc, "_graft_batch_0").delete())
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(loc.getPath, "_graft_batch_0.inflight"),
      landed.mkString("\n"))
    Streams.landBucketedBatch(batch, tbl, 4, "l_orderkey", 0L)
    spark.catalog.refreshTable(tbl)
    assert(spark.table(tbl).count() === 3L, "recovery doubled the batch")
    assert(new java.io.File(loc, "_graft_batch_0").exists())
    assert(!new java.io.File(loc, "_graft_batch_0.inflight").exists())
    // and the recovered layout still carries the bucket spec: a merge
    // join against itself plans no exchange
    val self = spark.table(tbl).hint("merge").join(
      spark.table(tbl).toDF("k2", "p2"),
      org.apache.spark.sql.functions.col("l_orderkey") ===
        org.apache.spark.sql.functions.col("k2"))
    val plan = self.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("Exchange"), plan.take(3000))
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("bucketed ingest replay sweeps a staging table orphaned after the commit marker") {
    import spark.implicits._
    val tbl = "graft_stream_bkt_sweep"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val batch = Seq((1L, 10.0), (2L, 20.0)).toDF("l_orderkey", "price")
    Streams.landBucketedBatch(batch, tbl, 4, "l_orderkey", 0L)
    // simulate a crash AFTER the commit marker but BEFORE the staging
    // drop: the marker short-circuits every future replay, so unless
    // the early-return path sweeps it, the staging table would leak
    // into the catalog forever
    val staging = tbl + "__staging_0"
    Seq((1L, 10.0), (2L, 20.0)).toDF("l_orderkey", "price")
      .write.format("parquet").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable(staging)
    assert(spark.catalog.tableExists(staging))
    Streams.landBucketedBatch(batch, tbl, 4, "l_orderkey", 0L)
    assert(!spark.catalog.tableExists(staging),
      "replay left the orphaned staging table in the catalog")
    assert(spark.table(tbl).count() === 2L)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("stream_ann_ingest: online cell assignment == batch assignment, replay-safe, probe prunes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val centsT = "graft_stream_ann_cents"
    val dir = java.nio.file.Files.createTempDirectory("ann_ingest").toFile
    val path = new java.io.File(dir, "cells").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    spark.sql(s"DROP TABLE IF EXISTS $centsT")
    // sweep a stale warehouse dir a dead session may have left (the
    // catalog entry is gone after the DROP; the directory may not be)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), centsT))
    // a persisted 2-centroid quantizer: cell 0 near the origin, cell 1
    // out along every axis — assignment is unambiguous by construction
    Seq((0L, Array(0.0, 0.0, 0.0)), (1L, Array(10.0 * 1024, 10.0 * 1024,
      10.0 * 1024))).toDF("cid", "cv").write.saveAsTable(centsT)
    def vec(id: Long, base: Float): (Long, Array[Float]) =
      (id, Array(base, base + 0.25f, base + 0.5f))
    val b0 = Seq(vec(1, 0.1f), vec(2, 9.9f), vec(3, 0.2f))
    val b1 = Seq(vec(4, 9.7f), vec(5, 0.3f))
    // the streaming path end-to-end: MemoryStream → annIngest
    val mem = MemoryStream[(Long, Array[Float])]
    val q = Streams.annIngest(
      mem.toDF().toDF("vec_id", "embedding"), centsT, path, ckpt)
    try {
      mem.addData(b0: _*); q.processAllAvailable()
      mem.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    // online assignment == the batch formula over the same vectors —
    // Ann.assignCells against the same persisted centroids
    val expected = graft.ann.Ann.assignCells(
      (b0 ++ b1).toDF("vec_id", "embedding"), spark.table(centsT))
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def landed() = spark.read.parquet(path)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue())).toSet
    assert(landed() === expected)
    assert(expected.map(_._2) === Set(0L, 1L), "both cells exercised")
    // replay of a committed batch is a no-op (marker short-circuits) —
    // AND it sweeps a staging dir orphaned by a crash between the
    // commit-marker create and the staging delete
    val orphan = new java.io.File(path, "._staging_0/cell=0")
    assert(orphan.mkdirs())
    Streams.landAnnBatch(b0.toDF("vec_id", "embedding"), centsT, path, 0L)
    assert(spark.read.parquet(path).count() === 5L)
    assert(!new java.io.File(path, "._staging_0").exists(),
      "committed-batch replay must sweep the orphaned staging dir")
    // crash between move and commit: land a THIRD batch, then strip its
    // marker and reconstruct its intent log (the files added by it) —
    // recovery must undo the listed moves and re-land exactly once
    val root = new java.io.File(path)
    def dataFiles(): Set[java.io.File] = Option(root.listFiles()).get
      .filter(d => d.isDirectory && d.getName.startsWith("cell="))
      .flatMap(d => d.listFiles().filter(f =>
        f.isFile && f.getName.endsWith(".parquet"))).toSet
    val before = dataFiles()
    val b2 = Seq(vec(6, 9.8f), vec(7, 0.4f))
    Streams.landAnnBatch(b2.toDF("vec_id", "embedding"), centsT, path, 2L)
    val b2Files = dataFiles() -- before
    assert(b2Files.nonEmpty)
    assert(new java.io.File(root, "_graft_batch_2").delete())
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root.getPath, "_graft_batch_2.inflight"),
      b2Files.map(_.getAbsolutePath).mkString("\n"))
    Streams.landAnnBatch(b2.toDF("vec_id", "embedding"), centsT, path, 2L)
    val expected3 = graft.ann.Ann.assignCells(
      (b0 ++ b1 ++ b2).toDF("vec_id", "embedding"), spark.table(centsT))
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(landed() === expected3, "recovery duplicated or lost vectors")
    // the probe contract: a cell-filtered read prunes to the probed
    // cell DIRECTORY — stream-landed vectors serve like built ones
    val probe = spark.read.parquet(path)
      .filter(org.apache.spark.sql.functions.col("cell") === 0)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      plan.take(2000))
    assert(probe.count() === 4L)
    spark.sql(s"DROP TABLE IF EXISTS $centsT")
  }

  test("stream_corpus_health: per-source partials combine to the batch readout, replay-safe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("corpus_health").toFile
    val path = new java.io.File(dir, "health").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    def doc(id: Long, src: String, words: Int): Streams.SourcedDoc =
      Streams.SourcedDoc(id, ts(0), src, Seq.fill(words)("w").mkString(" "))
    // doc 6 is empty and doc 7 whitespace-only: both must count 0 tokens
    // (and therefore short), matching the batch words() convention —
    // split's "" artifact must not inflate n_tokens to 1
    val b0 = Seq(doc(1, "web", 30), doc(2, "web", 5), doc(3, "books", 50))
    val b1 = Seq(doc(4, "web", 10), doc(5, "books", 25), doc(6, "web", 0),
      Streams.SourcedDoc(7, ts(0), "web", "   "))
    val mem = MemoryStream[Streams.SourcedDoc]
    val q = Streams.corpusHealthStream(mem.toDS(), path, ckpt)
    try {
      mem.addData(b0: _*); q.processAllAvailable()
      mem.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    val got = Streams.readCorpusHealth(spark, path).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    // the batch twin over the union of both micro-batches
    val all = b0 ++ b1
    def expect(src: String) = {
      val ds = all.filter(_.source == src)
      val toks = ds.map(_.text.trim.split("\\s+").count(_.nonEmpty).toLong)
      (src, ds.size.toLong, toks.sum,
        ds.map(_.text.length.toLong).sum,
        toks.count(_ < 20).toLong,
        toks.count(_ < 20).toLong * 10000 / ds.size)
    }
    assert(got === Set(expect("web"), expect("books")))
    // a replayed batch id is a marker-gated no-op: same totals after
    Streams.landProjectionPart(
      Seq(("web", 99L, 99L, 99L, 99L))
        .toDF("source", "n_docs", "n_tokens", "n_chars", "n_short"), path, 0L)
    assert(Streams.readCorpusHealth(spark, path).collect()
      .map(_.getLong(1)).sum === 7L)
  }

  test("stream_tokenizer_fertility: frozen-model online encode matches the batch twin, replay-safe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("tok_fert").toFile
    val path = new java.io.File(dir, "fert").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    // a frozen toy model: singles guarantee totality, 'ab' must win
    // over a+b (5 - l2c > 2*(2 - l2c) at l2c=0? use l2c=1: 4 > 2)
    val pieces = Seq("a", "b", "c", "ab")
    val scores = Seq(2, 2, 2, 5)
    val l2c = 1
    def doc(id: Long, src: String, text: String): Streams.SourcedDoc =
      Streams.SourcedDoc(id, ts(0), src, text)
    val b0 = Seq(doc(1, "web", "ab ab c"), doc(2, "books", "abc ba"))
    val b1 = Seq(doc(3, "web", "aaab b"), doc(4, "web", ""))
    val mem = MemoryStream[Streams.SourcedDoc]
    val q = Streams.tokenizerFertilityStream(
      mem.toDS(), pieces, scores, l2c, path, ckpt)
    try {
      mem.addData(b0: _*); q.processAllAvailable()
      mem.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    val got = Streams.readTokenizerFertility(spark, path).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // batch twin: the SAME frozen model over the union of both batches,
    // token counts from the kernel directly
    val vocab = new java.util.HashMap[String, java.lang.Integer]()
    pieces.zip(scores).foreach { case (p, s) => vocab.put(p, s) }
    def toks(word: String): Long =
      graft.functions.UnigramKernels.viterbiSeg(word, vocab, l2c)
        .split("\\|").count(_.nonEmpty).toLong
    val words = (b0 ++ b1).flatMap(d =>
      d.text.trim.split("\\s+").filter(_.nonEmpty).map(w => (d.source, w)))
    val expect = words.groupBy(_._1).map { case (src, ws) =>
      val nw = ws.size.toLong
      val nt = ws.map(w => toks(w._2)).sum
      (src, nw, nt, nt * 1000000 / nw)
    }.toSet
    assert(got === expect)
    // sanity of the toy model: 'ab' stayed one token, 'abc' two
    assert(toks("ab") === 1L && toks("abc") === 2L)
    // a replayed batch id is a marker-gated no-op
    Streams.landProjectionPart(
      Seq(("web", 99L, 99L)).toDF("source", "n_words", "n_toks"), path, 0L)
    assert(Streams.readTokenizerFertility(spark, path).collect()
      .map(_.getLong(1)).sum === words.size.toLong)
  }

  test("stream_bm25_topk: frozen-stats online scoring matches the batch formula, replay-safe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("bm25s").toFile
    val path = new java.io.File(dir, "bm25").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    def doc(id: Long, text: String): Streams.SourcedDoc =
      Streams.SourcedDoc(id, ts(0), "web", text)
    val b0 = Seq(doc(1, "dup dup vector words here"), doc(2, "key alone"),
      doc(3, "nothing relevant at all"))
    val b1 = Seq(doc(4, "dup vector key"), doc(5, "vector vector vector"))
    val all = b0 ++ b1
    // the frozen model: corpus stats over the FULL corpus (offline train)
    def words(d: Streams.SourcedDoc): Seq[String] =
      d.text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val n = all.size.toLong
    val sumdl = all.map(words(_).size.toLong).sum
    val terms = Seq("dup", "vector", "key")
    val dfs = terms.map(t => t -> all.count(d => words(d).contains(t)).toLong).toMap
    val mem = MemoryStream[Streams.SourcedDoc]
    val q = Streams.bm25TopKStream(mem.toDS(), n, sumdl, dfs, path, ckpt)
    try {
      mem.addData(b0: _*); q.processAllAvailable()
      mem.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    val got = Streams.readBm25TopK(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // the batch formula replicated in scala over the same frozen stats
    val avgdl = sumdl.toDouble / n
    def idf(t: String): Double =
      math.log(1.0 + ((n - dfs(t)).toDouble + 0.5) / (dfs(t).toDouble + 0.5))
    def score(d: Streams.SourcedDoc): (Long, Long, Double) = {
      val ws = words(d)
      val dl = ws.size
      val tfs = terms.map(t => t -> ws.count(_ == t).toLong).toMap
      def s(t: String): Double =
        if (tfs(t) == 0L) 0.0
        else idf(t) * (tfs(t).toDouble * 2.2) /
          (tfs(t).toDouble + 1.2 * (0.25 + 0.75 * dl.toDouble / avgdl))
      (tfs.values.count(_ > 0L).toLong, tfs.values.sum,
        s("dup") + s("vector") + s("key"))
    }
    val expect = all.map(d => (d.doc_id, score(d)))
      .filter(_._2._2 > 0L)
      .sortBy { case (id, (_, _, sc)) => (-sc, id) }
      .zipWithIndex
      .map { case ((id, (nt, tft, sc)), i) =>
        (i + 1L, id, nt, tft,
          BigDecimal(sc).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble) }
    assert(got.toSeq === expect)
    // docs with no panel term never emit; ranks are 1..k
    assert(got.map(_._1).toSeq === (1L to got.length).toSeq)
    // a replayed batch id is a marker-gated no-op
    Streams.landProjectionPart(
      Seq((99L, 1L, 1L, 99.0)).toDF("doc_id", "n_terms", "tf_total", "score"),
      path, 0L)
    assert(!Streams.readBm25TopK(spark, path).collect()
      .exists(_.getLong(1) == 99L))
  }

  test("stream_growth_accounting: month-close verdicts match q166's decomposition, state bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def mts(month: Int, day: Int): Timestamp =
      Timestamp.valueOf(f"2024-$month%02d-$day%02d 00:00:00")
    val mem = MemoryStream[Streams.Event]
    val q = Streams.growthAccounting(mem.toDS()).writeStream
      .format("memory").queryName("ga").outputMode(OutputMode.Append).start()
    try {
      def rows() = spark.table("ga").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
        .toSet
      val (jan, feb, mar, apr, may) =
        (2024 * 12 + 1, 2024 * 12 + 2, 2024 * 12 + 3, 2024 * 12 + 4,
          2024 * 12 + 5)
      // Jan 15.00 → Feb 20.00: Jan closes as 'new' when Feb opens
      mem.addData(
        Event(1, mts(1, 5), 10, "click", 10.00),
        Event(2, mts(1, 9), 10, "click", 5.00),
        Event(3, mts(2, 1), 10, "click", 20.00))
      q.processAllAvailable()
      assert(rows() === Set((10L, jan, "new", 1500L)))
      // Mar opens → Feb closes as expansion (+5.00 vs Jan)
      mem.addData(Event(4, mts(3, 2), 10, "click", 20.00))
      q.processAllAvailable()
      assert(rows() === Set((10L, jan, "new", 1500L),
        (10L, feb, "expansion", 500L)))
      // May opens → Mar closes flat (same cents as Feb)
      mem.addData(Event(5, mts(5, 2), 10, "click", 1.00))
      q.processAllAvailable()
      assert(rows() === Set((10L, jan, "new", 1500L),
        (10L, feb, "expansion", 500L), (10L, mar, "flat", 0L)))
      // Jun opens → May closes: the Mar→May gap emits Apr 'churned'
      // (Mar's full cents) and May re-enters as 'new' — exactly batch
      // q166's full-outer decomposition on the same completed months
      mem.addData(Event(6, mts(6, 2), 10, "click", 1.00))
      q.processAllAvailable()
      assert(rows() === Set((10L, jan, "new", 1500L),
        (10L, feb, "expansion", 500L), (10L, mar, "flat", 0L),
        (10L, apr, "churned", 2000L), (10L, may, "new", 100L)))
    } finally q.stop()
  }

  test("stream_projection: append-only partial parts, exact combined reads, replay-safe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_proj").toString
    val mem = MemoryStream[Event]
    val q = Streams.projectionStream(mem.toDF(), s"$dir/store", s"$dir/ckpt")
    try {
      mem.addData(Event(1, ts(0), 10, "click", 2.50),
        Event(2, ts(1), 10, "click", 3.25),
        Event(3, ts(2), 11, "view", 7.00))
      q.processAllAvailable()
      mem.addData(Event(4, ts(3), 10, "click", 4.25),
        Event(5, ts(4), 12, "view", 1.00))
      q.processAllAvailable()
      // two immutable parts landed — nothing rewritten
      val parts = new java.io.File(s"$dir/store").listFiles()
        .filter(_.getName.startsWith("__part_id=")).map(_.getName).sorted
      assert(parts.toSeq === Seq("__part_id=0", "__part_id=1"))
      val combined = Streams.readProjection(spark, s"$dir/store").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
      assert(combined === Set(
        ("click", 10L, 3L, 1000L, 250L, 425L),
        ("view", 11L, 1L, 700L, 700L, 700L),
        ("view", 12L, 1L, 100L, 100L, 100L)))
      // replay of a committed batch is a no-op (marker short-circuits)
      val replay = Seq(("click", 10L, 99L, 99999L, 1L, 99999L))
        .toDF("event_type", "user_id", "cnt_all", "sum_vc", "min_vc", "max_vc")
      Streams.landProjectionPart(replay, s"$dir/store", 0L)
      assert(Streams.readProjection(spark, s"$dir/store").collect()
        .map(_.getLong(2)).sum === 5L)
    } finally q.stop()
  }

  test("stream_skyline: online front equals batch q121, batch-boundary independent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the real sf0.001 orders, deterministically shuffled so arrival
    // order shares nothing with the (price, date) staircase order
    val rows = sf0001.orders
      // NTZ parquet timestamps surface as LocalDateTime; the session is
      // pinned UTC so the LTZ cast is numerically the identity
      .selectExpr("o_orderpriority", "o_orderkey", "o_totalprice",
        "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate")
      .collect()
      .map(r => Streams.OrderRow(r.getString(0), r.getLong(1),
        r.getDouble(2), r.getTimestamp(3)))
      .sortBy(o => (o.o_orderkey * 2654435761L) % 100003)
    def lastPerPriority(table: String): Map[String, (Long, Long, Long)] =
      spark.table(table).collect().zipWithIndex
        .groupBy(_._1.getAs[String]("o_orderpriority"))
        .map { case (p, rs) =>
          val r = rs.maxBy(_._2)._1
          p -> ((r.getAs[Long]("front_size"), r.getAs[Long]("first_key"),
            r.getAs[Long]("front_price_cents")))
        }
    val mem = MemoryStream[Streams.OrderRow]
    val q = Streams.skylineStream(mem.toDS())
      .writeStream.format("memory").queryName("sky_stream")
      .outputMode(OutputMode.Append).start()
    val online =
      try {
        rows.grouped(400).foreach { chunk =>
          mem.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
        }
        lastPerPriority("sky_stream")
      } finally q.stop()
    // batch reference: the SkylinePerGroup-backed q121 over the same table
    val batch = graft.operators.Shapes.q121.build(sf0001).collect()
      .map(r => r.getAs[String]("o_orderpriority") ->
        ((r.getAs[Long]("front_size"), r.getAs[Long]("first_key"),
          r.getAs[Long]("front_price_cents"))))
      .toMap
    assert(online === batch, "online front diverged from the batch skyline")
    // batch-boundary independence: the whole stream in ONE batch
    val mem2 = MemoryStream[Streams.OrderRow]
    val q2 = Streams.skylineStream(mem2.toDS())
      .writeStream.format("memory").queryName("sky_stream2")
      .outputMode(OutputMode.Append).start()
    try {
      mem2.addData(rows.toIndexedSeq: _*)
      q2.processAllAvailable()
      assert(lastPerPriority("sky_stream2") === batch)
    } finally q2.stop()
  }

  test("stream_bitmap_distinct: bitmap-state partials merge to the exact distinct, replay-safe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("bm_distinct").toFile
    val path = new java.io.File(dir, "bm").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    // users deliberately OVERLAP across batches — the case summed counts
    // get wrong and only set-union states get right
    val b0 = Seq(Event(1, ts(0), 10, "click", 1.0), Event(2, ts(1), 11, "click", 1.0),
      Event(3, ts(2), 10, "view", 1.0))
    val b1 = Seq(Event(4, ts(3), 10, "click", 1.0), Event(5, ts(4), 12, "click", 1.0),
      Event(6, ts(5), 10, "view", 1.0), Event(7, ts(6), 13, "view", 1.0))
    val mem = MemoryStream[Event]
    val q = Streams.bitmapDistinctStream(mem.toDF(), path, ckpt)
    try {
      mem.addData(b0: _*); q.processAllAvailable()
      mem.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    def readout(): Map[String, Long] =
      Streams.readBitmapDistinct(spark, path).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    // == the batch q55 discipline over the union of both micro-batches:
    // click saw users {10,11,12}, view {10,13}; user 10 is in BOTH
    // batches of BOTH types — summed per-batch counts would read 4 and 3
    assert(readout() === Map("click" -> 3L, "view" -> 2L))
    // a replayed batch id is a marker-gated no-op
    val st = org.apache.spark.sql.functions.udaf(graft.functions.BitmapState())
    Streams.landProjectionPart(
      Seq(("click", 777L)).toDF("event_type", "user_id")
        .groupBy("event_type")
        .agg(st(org.apache.spark.sql.functions.col("user_id")).as("bm")),
      path, 0L)
    assert(readout() === Map("click" -> 3L, "view" -> 2L))
  }
}
