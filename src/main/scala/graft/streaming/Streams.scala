package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Structured Streaming operators (SURVEY.md §2d): windowed aggregation
  * with watermark, in-stream dedup, stateful gap sessionization.
  *
  * These mirror the batch operators (q22/q34/dedup_exact) in streaming
  * form: same semantics, incremental execution. State is keyed by
  * user/event id — partitioned across executors, no global state.
  */
object Streams {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

  final case class SessionAcc(start_ms: Long, end_ms: Long, n: Long)

  final case class SessionOut(user_id: Long, start_ts: Timestamp, end_ts: Timestamp,
    n_events: Long)

  /** Tumbling-window event counts + exact value sums, watermarked. */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes",
    win: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("total"))

  /** Exactly-once-per-key dedup within the watermark horizon. */
  def dedupStream(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id")

  /** Materialized-view maintenance (ClickHouse materialized view analog):
    * a continuously-refreshed aggregate table. The windowed aggregate runs
    * in Complete mode and each micro-batch atomically replaces the parquet
    * materialization via foreachBatch — readers always see a consistent
    * snapshot (write to _tmp, swap). At warehouse scale the same hook
    * writes MERGE-style to a transactional table format.
    */
  def materializedAgg(events: DataFrame, path: String,
    checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total"))
      .writeStream
      .outputMode(OutputMode.Complete)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        swapInto(batch, path, batchId)
      }
      .start()
  }

  /** State-store-backed materialized view — the production shape the
    * Complete-mode [[materializedAgg]] approximates with snapshot swaps.
    * The running aggregate lives in Spark's CHECKPOINTED state store
    * (Update output mode), so each micro-batch emits only the keys that
    * changed, and the foreachBatch hook upserts exactly those keys into
    * a parquet table partitioned by key (dynamic partition overwrite —
    * untouched partitions are never rewritten). Restart recovery is the
    * state store's own: stop and restart on the same checkpoint and the
    * per-key (n, total) continues where it left off, with committed
    * batches never replayed — no double counting. A replay of the one
    * uncommitted batch rewrites the same partitions with the same
    * values (idempotent upsert). At 100 TB this touches |changed keys|
    * partitions per batch where Complete mode rewrites the whole view.
    */
  def materializedAggStateful(events: DataFrame, path: String,
    checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total"))
      .writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val conf = batch.sparkSession.conf
        val key = "spark.sql.sources.partitionOverwriteMode"
        val prev = conf.getOption(key)
        conf.set(key, "dynamic")
        try batch.write.mode("overwrite").partitionBy("event_type").parquet(path)
        finally prev.fold(conf.unset(key))(conf.set(key, _))
      }
      .start()
  }

  /** Snapshot swap: write the batch to a temp dir, retire the current
    * snapshot aside, rename the new one into place, then delete the old.
    * A failure before the final rename leaves the previous snapshot
    * recoverable under `._old` (never silently lost); readers see either
    * the old or the new snapshot except during the instant between the
    * two renames.
    */
  private def swapInto(batch: Dataset[org.apache.spark.sql.Row], path: String,
    batchId: Long): Unit = {
    val conf = batch.sparkSession.sparkContext.hadoopConfiguration
    val dest = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + s"._tmp_$batchId")
    val old = new org.apache.hadoop.fs.Path(path + "._old")
    val fs = dest.getFileSystem(conf)
    batch.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(old, true)
    if (fs.exists(dest) && !fs.rename(dest, old))
      throw new java.io.IOException(s"snapshot swap: retire $dest -> $old failed")
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"snapshot swap: rename $tmp -> $dest failed")
    fs.delete(old, true)
    ()
  }

  /** Streaming ingest into the ClickHouse-like partitioned layout — the
    * §2d analog of the dialect's `PARTITION BY toYYYYMM(ts)` tables:
    * each micro-batch lands as parquet partitioned by the generated
    * month column and sorted within partitions by the declared sort
    * key, so the files hold sorted runs exactly like the batch write
    * path ([[graft.functions.ClickHouseSql]] sorted parts) and month
    * retention stays a directory drop. The sort forces foreachBatch
    * (streaming plans reject Sort outside Complete mode).
    *
    * Replay safety is a small write-ahead protocol, not a bare marker —
    * a marker written after a direct append leaves a window (job commit
    * → crash → no marker) where the restarted batch re-appends the same
    * rows. Here each batch (1) writes its files to a batch-private
    * staging dir, (2) records the exact DESTINATION paths it is about
    * to create in an `.inflight` file, (3) moves the files (a rename
    * per file — metadata-only on HDFS-like stores), (4) writes the
    * commit marker and drops the intent. Recovery replays the log:
    * commit marker present → batch already fully landed, skip; intent
    * present without commit → delete the listed destinations (undoing
    * any half-done move), then redo from a fresh staging write. Every
    * crash point therefore lands the batch exactly once.
    */
  /** [[partitionedIngest]] plus ClickHouse-style TTL retention applied
    * at each batch commit — the streaming analog of the dialect's
    * merge-time `TTL` (the batch side applies it at OPTIMIZE; a stream
    * has no OPTIMIZE, so the commit IS the merge point): after a batch
    * lands, month partitions more than `keepMonths` behind the newest
    * LANDED month are dropped as whole directories — CH's
    * `ttl_only_drop_parts` fast path, a metadata/file operation, never
    * a rewrite. Event-time driven: wall clock never enters, so replays
    * are deterministic and a stalled source expires nothing.
    */
  def partitionedIngestTtl(events: DataFrame, path: String,
    checkpoint: String, keepMonths: Int,
    sortKey: Seq[String] = Seq("user_id", "ts"))
    : org.apache.spark.sql.streaming.StreamingQuery =
    events
      .withColumn("__ch_part", date_format(col("ts"), "yyyyMM").cast("int"))
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        landPartitionedBatch(batch, path, sortKey, batchId)
        applyTtlRetention(batch.sparkSession, path, keepMonths)
        ()
      }
      .start()

  /** Drop `__ch_part=yyyyMM` partition directories more than
    * `keepMonths` behind the newest landed month (exposed for the
    * retention spec). Month arithmetic is calendar-correct across year
    * boundaries (202401 − 2 months → 202311).
    */
  private[graft] def applyTtlRetention(
    spark: org.apache.spark.sql.SparkSession, path: String,
    keepMonths: Int): Option[Int] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return None
    val parts = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("__ch_part="))
      .flatMap(s => scala.util.Try(
        s.getPath.getName.stripPrefix("__ch_part=").toInt).toOption
        .map(_ -> s.getPath))
    if (parts.isEmpty) return None
    val newest = parts.map(_._1).max
    val total = (newest / 100) * 12 + (newest % 100) - 1 - keepMonths
    val cutoff = (total / 12) * 100 + (total % 12) + 1
    parts.filter(_._1 < cutoff).foreach { case (_, p) => fs.delete(p, true) }
    // the cutoff is returned so a sibling store (a projection over this
    // table) can expire the SAME months — lockstep, never its own clock
    Some(cutoff)
  }

  def partitionedIngest(events: DataFrame, path: String, checkpoint: String,
    sortKey: Seq[String] = Seq("user_id", "ts"))
    : org.apache.spark.sql.streaming.StreamingQuery =
    events
      .withColumn("__ch_part", date_format(col("ts"), "yyyyMM").cast("int"))
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        landPartitionedBatch(batch, path, sortKey, batchId)
      }
      .start()

  /** One batch of [[partitionedIngest]]'s stage→intent→move→commit
    * protocol (exposed for the recovery-path spec — a streaming restart
    * only replays the last un-checkpointed batch, so the undo branch
    * needs direct drive to test deterministically).
    */
  private[graft] def landPartitionedBatch(
    batch: Dataset[org.apache.spark.sql.Row], path: String,
    sortKey: Seq[String], batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val conf = batch.sparkSession.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val commit = new Path(path + s"/_graft_batch_$batchId")
    val intent = new Path(path + s"/_graft_batch_$batchId.inflight")
    val staging = new Path(path + s"/._staging_$batchId")
    if (fs.exists(commit)) {
      // a crash between fs.create(commit) and the staging delete below
      // leaks ._staging_<batchId> forever; replay is the only actor
      // that revisits this batchId, so it sweeps the orphan here
      fs.delete(staging, true)
      return
    }
    // undo: a prior attempt may have moved some files before dying
    if (fs.exists(intent)) {
      val in = fs.open(intent)
      val listed = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toVector finally in.close()
      listed.foreach(p => fs.delete(new Path(p), false))
      fs.delete(intent, false)
    }
    fs.delete(staging, true)
    batch
      .sortWithinPartitions(("__ch_part" +: sortKey).map(col): _*)
      .write.mode("overwrite").partitionBy("__ch_part")
      .parquet(staging.toString)
    // enumerate staged data files → destination paths, log the intent
    // BEFORE any move so recovery can always undo
    val moves = fs.listStatus(staging).toSeq
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith("__ch_part="))
      .flatMap { dir =>
        fs.listStatus(dir.getPath).toSeq
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
          .map(f => (f.getPath,
            new Path(new Path(root, dir.getPath.getName),
              f.getPath.getName)))
      }
    val out = fs.create(intent, true)
    try out.write(moves.map(_._2.toString).mkString("\n")
      .getBytes("UTF-8")) finally out.close()
    moves.foreach { case (src, dst) =>
      fs.mkdirs(dst.getParent)
      if (!fs.rename(src, dst))
        throw new java.io.IOException(
          s"partitioned ingest: move $src -> $dst failed")
    }
    fs.create(commit, true).close()
    fs.delete(intent, false)
    fs.delete(staging, true)
  }

  /** Streaming BUCKETED ingest — the one batch layout lever that had no
    * streaming analog: maintain a bucketBy+sortBy catalog table ONLINE,
    * so stream-landed facts feed the same zero-exchange co-located merge
    * join the batch layout gives q143 (Scale.bucketedPair). Each
    * micro-batch writes its rows bucket-hashed on `key` into `nBuckets`
    * files (Spark reads the bucket id back from the file NAME, so files
    * appended by different batches co-exist in one bucket — the read
    * side unions a bucket's files without any exchange; with more than
    * one file per bucket the join re-sorts in place but still never
    * shuffles). Exactly-once rides the partitionedIngest protocol:
    * stage the batch as its own bucketed table, log the intended moves,
    * rename into the target, commit marker last — a replayed batch
    * whose marker exists is a no-op, a batch that died mid-move is
    * undone from the intent log. At 100 TB: the stream pays the bucket
    * hash once per row at ingest; every downstream join on the bucket
    * key moves ZERO fact rows, forever — the whole point of the layout.
    */
  def bucketedIngest(facts: DataFrame, table: String, checkpoint: String,
    nBuckets: Int, key: String)
    : org.apache.spark.sql.streaming.StreamingQuery =
    facts
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        landBucketedBatch(batch, table, nBuckets, key, batchId)
      }
      .start()

  /** One [[bucketedIngest]] batch landing (exposed for the replay spec).
    * Protocol per batch: ensure the target bucketed table exists (empty
    * create on first contact — data NEVER lands outside the staged
    * path), skip if the commit marker exists, undo a dead attempt's
    * partial moves from the intent log, stage the batch as a bucketed
    * table of its own, move its data files in, marker last.
    */
  private[graft] def landBucketedBatch(
    batch: Dataset[org.apache.spark.sql.Row], table: String,
    nBuckets: Int, key: String, batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = batch.sparkSession
    def locationOf(name: String): Path = new Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(name)).location)
    if (!spark.catalog.tableExists(table))
      batch.limit(0).write.format("parquet")
        .bucketBy(nBuckets, key).sortBy(key).saveAsTable(table)
    val loc = locationOf(table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commit = new Path(loc, s"_graft_batch_$batchId")
    val intent = new Path(loc, s"_graft_batch_$batchId.inflight")
    val staging = table + s"__staging_$batchId"
    if (fs.exists(commit)) {
      // a crash between marker creation and staging cleanup would leak
      // the staging table into the catalog forever — the replay is the
      // only actor that ever sees this state, so it sweeps it here
      spark.sql(s"DROP TABLE IF EXISTS $staging")
      return
    }
    if (fs.exists(intent)) {
      val in = fs.open(intent)
      val listed = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toVector finally in.close()
      listed.foreach(p => fs.delete(new Path(p), false))
      fs.delete(intent, false)
    }
    // stage as a real bucketed table: the bucket-id file naming the
    // target reader keys on comes from the SAME writer
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    batch.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, key).sortBy(key).saveAsTable(staging)
    val moves = fs.listStatus(locationOf(staging)).toSeq
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("."))
      .map(f => (f.getPath, new Path(loc, f.getPath.getName)))
    val out = fs.create(intent, true)
    try out.write(moves.map(_._2.toString).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    moves.foreach { case (src, dst) =>
      if (!fs.rename(src, dst))
        throw new java.io.IOException(
          s"bucketed ingest: move $src -> $dst failed")
    }
    fs.create(commit, true).close()
    fs.delete(intent, false)
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    spark.catalog.refreshTable(table)
  }

  /** Streaming ANN ingest — the ANN family's streaming analog (dedup
    * has stream_neardup; the IVF index had none): assign arriving
    * vectors to the PERSISTED index's cells ONLINE and append them
    * cell-partitioned, so the batch probe queries read stream-landed
    * vectors with the same partition pruning as the build-time corpus.
    * The assignment IS ann_ivf_persisted's — Ann.assignCells, the one
    * shared formula (integer-grid qv, broadcast centroids, argmin
    * dist² with centroid-id ties), called against the centroids READ
    * BACK from the persisted `centsTable`, so online and offline
    * assignment cannot drift. Exactly-once rides the partitionedIngest
    * protocol (stage → intent → move → commit marker): a replayed
    * batch whose marker exists is a no-op; a batch that died mid-move
    * is undone from the intent log. At 100 TB: each micro-batch pays
    * |batch|×C distance evaluations map-side (centroids broadcast,
    * corpus never shuffled) and appends only its own files — a probe
    * reads its nprobe cell DIRECTORIES, never the history.
    */
  def annIngest(vectors: DataFrame, centsTable: String, path: String,
    checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    vectors
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        landAnnBatch(batch, centsTable, path, batchId)
      }
      .start()

  /** One [[annIngest]] batch (exposed for the equivalence/replay spec):
    * online cell assignment via the shared formula, then the
    * stage→intent→move→commit landing under `cell=<id>/` directories.
    */
  private[graft] def landAnnBatch(
    batch: Dataset[org.apache.spark.sql.Row], centsTable: String,
    path: String, batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = batch.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val commit = new Path(path + s"/_graft_batch_$batchId")
    val intent = new Path(path + s"/_graft_batch_$batchId.inflight")
    val staging = new Path(path + s"/._staging_$batchId")
    if (fs.exists(commit)) {
      // same orphan sweep as landPartitionedBatch/landBucketedBatch: a
      // crash between fs.create(commit) and the staging delete would
      // leak ._staging_<batchId> on disk forever
      fs.delete(staging, true)
      return
    }
    if (fs.exists(intent)) {
      val in = fs.open(intent)
      val listed = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toVector finally in.close()
      listed.foreach(p => fs.delete(new Path(p), false))
      fs.delete(intent, false)
    }
    fs.delete(staging, true)
    graft.ann.Ann.assignCells(batch.toDF(), spark.table(centsTable))
      .write.mode("overwrite").partitionBy("cell").parquet(staging.toString)
    val moves = fs.listStatus(staging).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .flatMap { dir =>
        fs.listStatus(dir.getPath).toSeq
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
          .map(f => (f.getPath,
            new Path(new Path(root, dir.getPath.getName), f.getPath.getName)))
      }
    val out = fs.create(intent, true)
    try out.write(moves.map(_._2.toString).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    moves.foreach { case (src, dst) =>
      fs.mkdirs(dst.getParent)
      if (!fs.rename(src, dst))
        throw new java.io.IOException(s"ann ingest: move $src -> $dst failed")
    }
    fs.create(commit, true).close()
    fs.delete(intent, false)
    fs.delete(staging, true)
  }

  /** Streaming projection maintenance — the streaming twin of the CH
    * dialect's INSERT-side projection contract (ClickHouseSql: every
    * new part carries its own partial aggregates): each micro-batch
    * APPENDS one immutable projection part — the batch's partial
    * (event_type, user_id) states: count, exact-cents sum, min, max —
    * under `__part_id=<batchId>/`, and [[readProjection]] re-combines
    * with the partial-merge functions (SUM of counts/sums, MIN of
    * mins, MAX of maxes). No state store, no rewrite of existing
    * files: at 100 TB a batch writes |batch dims| rows and the hot
    * path never touches history (compaction is an offline OPTIMIZE,
    * exactly CH's merge). Exactly-once rides a per-batch commit
    * marker: a replayed batch whose marker exists is skipped; a batch
    * that died mid-write left no marker and its directory is
    * overwritten whole.
    */
  def projectionStream(events: DataFrame, path: String, checkpoint: String)
    : org.apache.spark.sql.streaming.StreamingQuery =
    events
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val part = batch
          .groupBy(col("event_type"), col("user_id"))
          .agg(count(lit(1)).as("cnt_all"),
            sum(col("value").cast(DecimalType(18, 2)).multiply(lit(100))
              .cast("bigint")).as("sum_vc"),
            min(col("value").cast(DecimalType(18, 2)).multiply(lit(100))
              .cast("bigint")).as("min_vc"),
            max(col("value").cast(DecimalType(18, 2)).multiply(lit(100))
              .cast("bigint")).as("max_vc"))
        landProjectionPart(part, path, batchId)
      }
      .start()

  /** One [[projectionStream]] part landing (exposed for the replay
    * spec): skip if committed, else overwrite the part dir whole and
    * only then write the commit marker.
    */
  private[graft] def landProjectionPart(
    block: Dataset[org.apache.spark.sql.Row], path: String,
    batchId: Long, partitionCols: Seq[String] = Nil): Unit = {
    import org.apache.hadoop.fs.Path
    val conf = block.sparkSession.sparkContext.hadoopConfiguration
    val fs = new Path(path).getFileSystem(conf)
    val commit = new Path(path + s"/_graft_batch_$batchId")
    if (fs.exists(commit)) return
    val w = block.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path + s"/__part_id=$batchId")
    fs.create(commit, true).close()
  }

  /** The PRODUCTION ingest shape — a partitioned CH table WITH a live
    * projection ingesting online, one stream: each micro-batch
    * (1) lands month-partitioned sorted data files through
    * [[landPartitionedBatch]]'s stage→intent→move→commit protocol,
    * then (2) appends the batch's partial projection part, itself
    * partitioned by the SAME month key — ClickHouse keeps projection
    * parts INSIDE their partition's parts, which is exactly why its
    * partition drops never leave a stale projection; this layout
    * reproduces that containment. Both landings are idempotent behind
    * their own per-batch commit markers, so a crash before, between,
    * or during either replays to exactly-once on BOTH stores. With
    * `keepMonths` set, retention expires base months and projection
    * months from the SAME cutoff (the base store's newest landed
    * month), so covered answers never diverge from the table.
    */
  def partitionedProjectionIngest(events: DataFrame, path: String,
    projPath: String, checkpoint: String, keepMonths: Int = Int.MaxValue,
    sortKey: Seq[String] = Seq("user_id", "ts"))
    : org.apache.spark.sql.streaming.StreamingQuery =
    events
      .withColumn("__ch_part", date_format(col("ts"), "yyyyMM").cast("int"))
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        landPartitionedBatch(batch, path, sortKey, batchId)
        val cents = col("value").cast(DecimalType(18, 2))
          .multiply(lit(100)).cast("bigint")
        val part = batch
          .groupBy(col("__ch_part"), col("event_type"), col("user_id"))
          .agg(count(lit(1)).as("cnt_all"), sum(cents).as("sum_vc"),
            min(cents).as("min_vc"), max(cents).as("max_vc"))
        landProjectionPart(part, projPath, batchId,
          partitionCols = Seq("__ch_part"))
        if (keepMonths != Int.MaxValue)
          applyTtlRetention(batch.sparkSession, path, keepMonths).foreach(
            cut => applyProjectionRetention(batch.sparkSession, projPath, cut))
      }
      .start()

  /** Expire the projection store's months below `cutoff` — the cutoff
    * COMES FROM the base table's retention pass ([[applyTtlRetention]]),
    * never from the projection's own contents, so the two stores age in
    * lockstep. A month drop here is a nested-directory delete (the
    * `__ch_part=m` subdir of every `__part_id=N`) — file operations
    * only, like CH dropping a partition's projection parts with it.
    */
  private[graft] def applyProjectionRetention(
    spark: org.apache.spark.sql.SparkSession, projPath: String,
    cutoff: Int): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(projPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("__part_id="))
      .foreach { part =>
        fs.listStatus(part.getPath).toSeq
          .filter(s => s.isDirectory &&
            scala.util.Try(s.getPath.getName.stripPrefix("__ch_part=").toInt)
              .toOption.exists(_ < cutoff))
          .foreach(s => fs.delete(s.getPath, true))
      }
  }

  /** Combined read of a [[partitionedProjectionIngest]] projection
    * store: per-(month, event_type, user_id) totals re-aggregated with
    * the partial-merge functions. The month key is a real partition
    * directory on BOTH levels, so a WHERE on it prunes parquet files
    * before any read.
    */
  def readPartitionedProjection(spark: org.apache.spark.sql.SparkSession,
    path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("__ch_part"), col("event_type"), col("user_id"))
      .agg(sum(col("cnt_all")).as("n"),
        sum(col("sum_vc")).as("sum_vc"),
        min(col("min_vc")).as("min_vc"),
        max(col("max_vc")).as("max_vc"))

  /** The combined read of a [[projectionStream]] store: partial parts
    * re-aggregate with the partial-merge functions.
    */
  def readProjection(spark: org.apache.spark.sql.SparkSession,
    path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("cnt_all")).as("n"),
        sum(col("sum_vc")).as("sum_vc"),
        min(col("min_vc")).as("min_vc"),
        max(col("max_vc")).as("max_vc"))

  /** Streaming corpus-health projection — the training-data ingest's
    * observability twin of [[projectionStream]] (that one watches the
    * events fact table; this one watches the DOCUMENT stream the dedup
    * and curation operators consume): each micro-batch appends one
    * immutable per-source partial — docs, whitespace tokens, chars,
    * and the short-doc count (under `shortTok` tokens, the first
    * quality gate every pipeline applies) — under `__part_id=<batch>`
    * behind the same per-batch commit marker, and
    * [[readCorpusHealth]] re-combines with plain sums (every column
    * is a partial-mergeable count). At 100 TB the hot path writes
    * |batch sources| rows per batch and never touches history; the
    * dashboard reads |sources| rows however long the stream has run.
    */
  def corpusHealthStream(docs: Dataset[SourcedDoc], path: String,
    checkpoint: String, shortTok: Int = 20)
    : org.apache.spark.sql.streaming.StreamingQuery =
    docs.toDF()
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val part = batch
          .select(col("source"),
            // filter the "" artifact split leaves on empty/whitespace-only
            // text so such docs count 0 tokens — the words()/list_filter
            // convention every batch text operator uses
            size(filter(split(trim(col("text")), "\\s+"),
              t => t =!= lit(""))).cast("long").as("n_tok"),
            length(col("text")).cast("long").as("n_chars"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("n_tokens"),
            sum(col("n_chars")).as("n_chars"),
            count(when(col("n_tok") < shortTok, 1)).as("n_short"))
        landProjectionPart(part, path, batchId)
      }
      .start()

  /** Combine [[corpusHealthStream]]'s parts to the per-source health
    * readout (docs, tokens, chars, short-doc share in exact bp).
    */
  def readCorpusHealth(spark: org.apache.spark.sql.SparkSession,
    path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("n_short")).as("n_short"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_chars"),
        col("n_short"),
        expr("n_short * 10000 div n_docs").as("short_bp"))

  /** Streaming exact distinct — q55/q178's online shape (the
    * groupBitmap -State discipline over an unbounded stream): each
    * micro-batch appends one immutable per-group partial holding the
    * batch's BITMAP STATE (BitmapState's compact ~10 B/word bytes),
    * never a count — counts don't merge across batches (a user active
    * in two batches would double-count under summation), set-union
    * states do, and union is idempotent so the combine is also safe
    * against any upstream at-least-once duplication of whole ids.
    * [[readBitmapDistinct]] ORs the parts back to the EXACT distinct
    * per group however long the stream has run — the first
    * sketch-state partial in this lane (every earlier projection
    * landed algebraic sums), proving the -State/-Merge pair composes
    * with the stage→commit landing unchanged. Hot path per batch:
    * |batch groups| rows, bytes bounded by the batch's distinct ids;
    * replay is marker-gated as everywhere else.
    */
  def bitmapDistinctStream(events: DataFrame, path: String,
    checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val st = udaf(graft.functions.BitmapState())
        val part = batch
          .groupBy(col("event_type"))
          .agg(st(col("user_id")).as("bm"))
        landProjectionPart(part, path, batchId)
      }
      .start()

  /** Combine [[bitmapDistinctStream]]'s parts to the exact per-group
    * distinct — the same numbers q55's batch aggregation would produce
    * over the union of every micro-batch.
    */
  def readBitmapDistinct(spark: org.apache.spark.sql.SparkSession,
    path: String): DataFrame = {
    val mg = udaf(graft.functions.BitmapMergeCount())
    spark.read.parquet(path)
      .groupBy(col("event_type"))
      .agg(mg(col("bm")).as("n_distinct"))
  }

  /** Streaming tokenizer-fertility projection — the FROZEN-tokenizer
    * serving shape online (pipe_tokenizer_fertility's streaming twin):
    * the trained unigram model rides in as literals (pieces, scores,
    * per-piece penalty — TextOps.unigramModel's export), the stream
    * NEVER re-trains, and each micro-batch appends one immutable
    * per-source partial (words, encoded tokens) behind the per-batch
    * commit marker. Unseen words SEGMENT under the frozen model
    * exactly like the batch apply — which is the point of the
    * dashboard: a new source whose words fragment (fertility spike) is
    * the tokenizer-drift signal a training pipeline watches for.
    * Per batch the model meets only the batch's DISTINCT (source,
    * word) histogram (vocabulary-parallel, like every serving path of
    * the tokenizer family); at 100 TB/day the hot path writes
    * |batch sources| rows per batch and never touches history.
    */
  def tokenizerFertilityStream(docs: Dataset[SourcedDoc],
    pieces: Seq[String], scores: Seq[Int], l2c: Int,
    path: String, checkpoint: String)
    : org.apache.spark.sql.streaming.StreamingQuery =
    docs.toDF()
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // foreachBatch runs on a CLONED session — register the kernel
        // function there, not on the builder's session
        graft.functions.GraftFunctions.register(batch.sparkSession)
        val part = batch
          .select(col("source"),
            explode(split(trim(col("text")), "\\s+")).as("w0"))
          .select(col("source"), lower(col("w0")).as("word"))
          .filter(col("word") =!= "")
          .groupBy(col("source"), col("word")).agg(count(lit(1)).as("c"))
          .withColumn("g", call_function("graft_unigram_seg", col("word"),
            typedLit(pieces), typedLit(scores), lit(l2c)))
          .groupBy(col("source"))
          .agg(sum(col("c")).cast("long").as("n_words"),
            sum(col("c") * (size(split(col("g"), "\\|")) - 1))
              .cast("long").as("n_toks"))
        landProjectionPart(part, path, batchId)
      }
      .start()

  /** Combine [[tokenizerFertilityStream]]'s parts to the per-source
    * fertility readout (words, tokens, fertility in exact ppm) — the
    * same columns the batch pipe_tokenizer_fertility publishes, so
    * online and offline dashboards read one shape.
    */
  def readTokenizerFertility(spark: org.apache.spark.sql.SparkSession,
    path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("source"))
      .agg(sum(col("n_words")).as("n_words"), sum(col("n_toks")).as("n_toks"))
      .select(col("source"), col("n_words"), col("n_toks"),
        expr("n_toks * 1000000 div n_words").as("fertility_ppm"))

  /** Streaming BM25 serving — text_bm25_topk's online twin under the
    * frozen-model rule: the corpus statistics the score needs (N,
    * Σdl, per-term df — the "model" a retrieval deployment trains
    * offline) ride in as literals and the stream NEVER updates them;
    * each micro-batch scores only ITS OWN docs against the frozen
    * panel and appends its per-batch top-10 candidate rows behind the
    * per-batch commit marker. The global top-10 is a subset of the
    * union of per-batch top-10s (each doc lives in exactly one
    * batch), so [[readBm25TopK]] re-cuts exactly — no retraction, no
    * cross-batch state. The score expression is SHAPE-IDENTICAL to
    * the batch op (same fixed-order pivoted dup+vector+key sum), so
    * online == batch bit-for-bit; at 100 TB/day the hot path writes
    * ≤ 10 rows per batch.
    */
  def bm25TopKStream(docs: Dataset[SourcedDoc],
    nDocs: Long, sumDl: Long, dfs: Map[String, Long],
    path: String, checkpoint: String)
    : org.apache.spark.sql.streaming.StreamingQuery = {
    val terms = Seq("dup", "vector", "key")
    docs.toDF()
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val lowWords = split(trim(lower(col("text"))), "\\s+")
        def idf(term: String): Double = {
          val df = dfs.getOrElse(term, 0L)
          math.log(1.0 + ((nDocs - df).toDouble + 0.5) / (df.toDouble + 0.5))
        }
        val tf = batch
          .select(col("doc_id"),
            size(lowWords).cast("long").as("dl"),
            explode(lowWords).as("term"))
          .where(col("term").isin(terms: _*))
          .groupBy(col("doc_id"), col("dl"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val avgdl = sumDl.toDouble / nDocs
        val sc = tf.select(col("doc_id"), col("term"), col("tf"),
          (element_at(
            typedLit(terms.map(t => t -> idf(t)).toMap), col("term"))
            * (col("tf").cast("double") * lit(2.2))
            / (col("tf").cast("double")
               + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double")
                                       / lit(avgdl)))).as("s"))
        def termScore(term: String) =
          coalesce(max(when(col("term") === term, col("s"))), lit(0.0))
        val part = sc.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("tf_total"),
            (termScore("dup") + termScore("vector") + termScore("key"))
              .as("score"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(10)
        landProjectionPart(part, path, batchId)
      }
      .start()
  }

  /** Combine [[bm25TopKStream]]'s per-batch candidates to the global
    * top-10 — the same columns text_bm25_topk publishes, so online and
    * offline retrieval dashboards read one shape.
    */
  def readBm25TopK(spark: org.apache.spark.sql.SparkSession,
    path: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    spark.read.parquet(path)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("rnk"), col("doc_id"),
        col("n_terms").cast("long").as("n_terms"),
        col("tf_total").cast("long").as("tf_total"),
        round(col("score"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  /** One first-seen row per (user, month) with the new/returning
    * verdict — q158's streaming sibling, the growth dashboard fed
    * online. State per user is ONE first-month long plus the bounded
    * set of months already emitted (bounded by the CALENDAR, not the
    * stream), so state never grows with event volume; kind is decided
    * once per (user, month) and never retracted — exactly-once rows
    * the downstream counter aggregates freely.
    *
    * Out-of-order caveat (the price of an append-only sink): firstYm is
    * IMMUTABLE once set — the first batch that sees a user fixes it. A
    * month arriving LATER but dated EARLIER than the fixed first month
    * is labeled 'returning', where batch q158 over the complete data
    * would call it 'new'. The alternative — lowering firstYm — would
    * emit a SECOND 'new' row for the user while the already-emitted
    * month's verdict can never be retracted, diverging worse (two 'new'
    * months per user, an invariant violation rather than a boundary
    * skew). Exact parity on heavily out-of-order sources comes from a
    * periodic batch backfill of q158, the standard lambda repair.
    */
  final case class NvrState(firstYm: Int, seen: Seq[Int])
  final case class NvrOut(user_id: Long, ym: Int, kind: String)

  def newVsReturning(events: Dataset[Event]): Dataset[NvrOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    def ymOf(ts: Timestamp): Int = {
      val ld = ts.toLocalDateTime
      ld.getYear * 12 + ld.getMonthValue
    }
    def update(userId: Long, it: Iterator[Event],
      state: GroupState[NvrState]): Iterator[NvrOut] = {
      val months = it.map(e => ymOf(e.ts)).toSeq.distinct.sorted
      if (months.isEmpty) Iterator.empty
      else {
        // firstYm immutable once set (see the caveat above): a late
        // earlier month must NOT mint a second un-retractable 'new' row
        val st0 = state.getOption.getOrElse(
          NvrState(months.head, Seq.empty))
        val fresh = months.filterNot(st0.seen.contains)
        val firstYm = st0.firstYm
        state.update(NvrState(firstYm, (st0.seen ++ fresh).distinct))
        fresh.iterator.map(m => NvrOut(userId, m,
          if (m == firstYm) "new" else "returning"))
      }
    }
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Streaming growth accounting — q166's online sibling: per user, a
    * month's revenue verdict (new / expansion / contraction / flat /
    * churned, with exact cents) is emitted when the user's month
    * ADVANCES — the moment the previous month is complete for that user
    * under event-time ordering. State per user is four longs (previous
    * closed month + cents, current month + cents) — never the order
    * history; verdicts are append-only, so the downstream (ym, kind)
    * counter aggregates freely. A gap of more than one month emits the
    * 'churned' verdict for the month after the last active one, exactly
    * like batch q166's full-outer decomposition. Out-of-order caveat
    * (the newVsReturning rule): a batch's events are processed in
    * event-time order per user, but an EARLIER month arriving after its
    * successor closed cannot reopen it — document-and-backfill, never
    * retract.
    */
  final case class GaState(prevYm: Int, prevCents: Long,
    curYm: Int, curCents: Long)
  final case class GaOut(user_id: Long, ym: Int, kind: String, cents: Long)

  def growthAccounting(events: Dataset[Event]): Dataset[GaOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    def ymOf(ts: Timestamp): Int = {
      val ld = ts.toLocalDateTime
      ld.getYear * 12 + ld.getMonthValue
    }
    def centsOf(v: Double): Long =
      new java.math.BigDecimal(v).setScale(2, java.math.RoundingMode.HALF_UP)
        .movePointRight(2).longValueExact()
    def close(st: GaState): Seq[GaOut] = {
      // verdict for the closing current month vs the previous closed one
      val verdict =
        if (st.prevYm == 0 || st.prevYm < st.curYm - 1)
          GaOut(0L, st.curYm, "new", st.curCents)
        else if (st.curCents > st.prevCents)
          GaOut(0L, st.curYm, "expansion", st.curCents - st.prevCents)
        else if (st.curCents < st.prevCents)
          GaOut(0L, st.curYm, "contraction", st.prevCents - st.curCents)
        else GaOut(0L, st.curYm, "flat", 0L)
      // a gap after the previous closed month is a churn at prev + 1
      val churn =
        if (st.prevYm != 0 && st.prevYm < st.curYm - 1)
          Seq(GaOut(0L, st.prevYm + 1, "churned", st.prevCents))
        else Seq.empty
      churn :+ verdict
    }
    def update(userId: Long, it: Iterator[Event],
      state: GroupState[GaState]): Iterator[GaOut] = {
      val batch = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      if (batch.isEmpty) return Iterator.empty
      var st = state.getOption.getOrElse(GaState(0, 0L, 0, 0L))
      val out = Seq.newBuilder[GaOut]
      batch.foreach { e =>
        val ym = ymOf(e.ts)
        if (st.curYm == 0) st = st.copy(curYm = ym)
        if (ym > st.curYm) {
          out ++= close(st).map(_.copy(user_id = userId))
          st = GaState(st.curYm, st.curCents, ym, 0L)
        }
        // an earlier month after its successor closed: fold into the
        // open month (the documented never-retract divergence)
        st = st.copy(curCents = st.curCents + centsOf(e.value))
      }
      state.update(st)
      out.result().iterator
    }
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Stream-stream interval join: purchases attributed to the same user's
    * clicks within `horizon`. Both sides watermarked so join state is
    * bounded and evicted as event time advances — the attribution-join
    * shape that at 100 TB must never buffer unbounded state.
    */
  def clickAttribution(events: DataFrame, watermark: String = "10 minutes",
    horizon: String = "10 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
    clicks.join(purchases,
      expr(s"""user_id = p_user AND purchase_ts >= click_ts
               AND purchase_ts <= click_ts + interval $horizon"""))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"), col("value"))
  }

  /** Gap-based sessionization with event-time timeout: a session closes
    * when no event arrives within `gapSec` of its last event (watermark-
    * driven), emitting (user, start, end, count).
    */
  def sessionize(events: Dataset[Event], gapSec: Long = 1800,
    watermark: String = "10 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSec * 1000

    def update(userId: Long, it: Iterator[Event],
      state: GroupState[SessionAcc]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(s =>
          SessionOut(userId, new Timestamp(s.start_ms), new Timestamp(s.end_ms), s.n)).iterator
        state.remove()
        out
      } else {
        val sorted = it.toSeq.sortBy(_.ts.getTime)
        var acc = state.getOption
        val closed = Seq.newBuilder[SessionOut]
        sorted.foreach { e =>
          val ms = e.ts.getTime
          acc match {
            case Some(s) if ms - s.end_ms <= gapMs =>
              acc = Some(s.copy(end_ms = math.max(s.end_ms, ms), n = s.n + 1))
            case Some(s) =>
              closed += SessionOut(userId, new Timestamp(s.start_ms), new Timestamp(s.end_ms), s.n)
              acc = Some(SessionAcc(ms, ms, 1))
            case None =>
              acc = Some(SessionAcc(ms, ms, 1))
          }
        }
        acc.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.end_ms + gapMs)
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  final case class DebounceAcc(last_kept_ms: Long)

  final case class DebounceOut(user_id: Long, event_type: String,
    ts: Timestamp, event_id: Long)

  /** Streaming telemetry debounce (q79_event_dedup's streaming analog):
    * per (user, type), an event is emitted only when it arrives more than
    * `windowSec` after the last KEPT event of that key. Note the chain
    * semantics: state tracks the last *survivor*, so a burst
    * t=0,50,100,150 at windowSec=60 keeps 0 and 100 — the true debounce a
    * device-telemetry ingest wants (the batch q79 compares against the
    * raw predecessor instead, the SQL-oracle-able form; the two agree
    * whenever gaps don't chain). State is one timestamp per active
    * (user, type) key, GC'd by event-time timeout once the watermark
    * passes the debounce horizon — bounded by |active keys|, not stream
    * length.
    */
  def debounceStream(events: Dataset[Event], windowSec: Long = 60,
    watermark: String = "10 minutes"): Dataset[DebounceOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val winMs = windowSec * 1000

    def update(key: (Long, String), it: Iterator[Event],
      state: GroupState[DebounceAcc]): Iterator[DebounceOut] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        var last = state.getOption.map(_.last_kept_ms)
        val out = Seq.newBuilder[DebounceOut]
        sorted.foreach { e =>
          val ms = e.ts.getTime
          if (last.forall(l => ms - l > winMs)) {
            out += DebounceOut(key._1, key._2, e.ts, e.event_id)
            last = Some(ms)
          }
        }
        last.foreach { l =>
          state.update(DebounceAcc(l))
          state.setTimeoutTimestamp(l + winMs)
        }
        out.result().iterator
      }
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  final case class FunnelAcc(events: Seq[(String, Long)], last_ms: Long)

  final case class FunnelOut(user_id: Long, funnel_level: Int,
    t1: Option[Timestamp])

  /** Streaming windowFunnel (ClickHouse windowFunnel over a live stream;
    * the batch q47 operator's streaming analog): per user, step 1 is the
    * earliest 'click', step 2 the earliest 'view' within `windowSec` of
    * step 1, step 3 the earliest 'purchase' within `windowSec` of step 2.
    * The reached level is emitted ONCE per user, when the event-time
    * timeout fires (watermark past last activity + `idleSec`) — i.e. when
    * the level can no longer change.
    *
    * State holds only the funnel-relevant events of the active horizon
    * (the three step types; everything else is filtered before the
    * shuffle) and recomputes the level on each batch, so late events
    * within the watermark — including a late FIRST click that re-anchors
    * the whole funnel — are handled exactly, not approximately. State is
    * per-user and cleared on timeout; at 100 TB the state size is
    * |active users| × |step events in the idle horizon|, the same bound
    * as sessionization.
    */
  def funnelStream(events: Dataset[Event], windowSec: Long = 3600,
    idleSec: Long = 7200, watermark: String = "10 minutes"): Dataset[FunnelOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val winMs = windowSec * 1000
    val steps = Set("click", "view", "purchase")

    def levelOf(evs: Seq[(String, Long)]): (Int, Option[Long]) = {
      val clicks = evs.collect { case ("click", ms) => ms }
      if (clicks.isEmpty) (0, None)
      else {
        val t1 = clicks.min
        val views = evs.collect {
          case ("view", ms) if ms > t1 && ms <= t1 + winMs => ms
        }
        if (views.isEmpty) (1, Some(t1))
        else {
          val t2 = views.min
          val reached = evs.exists {
            case ("purchase", ms) => ms > t2 && ms <= t2 + winMs
            case _ => false
          }
          (if (reached) 3 else 2, Some(t1))
        }
      }
    }

    def update(userId: Long, it: Iterator[Event],
      state: GroupState[FunnelAcc]): Iterator[FunnelOut] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map { acc =>
          val (level, t1) = levelOf(acc.events)
          FunnelOut(userId, level, t1.map(new Timestamp(_)))
        }.iterator
        state.remove()
        out
      } else {
        val incoming = it.filter(e => steps(e.event_type))
          .map(e => (e.event_type, e.ts.getTime)).toSeq
        val acc0 = state.getOption.getOrElse(FunnelAcc(Seq.empty, 0L))
        val acc = FunnelAcc(acc0.events ++ incoming,
          math.max(acc0.last_ms, if (incoming.isEmpty) 0L else incoming.map(_._2).max))
        if (acc.events.nonEmpty) {
          state.update(acc)
          state.setTimeoutTimestamp(acc.last_ms + idleSec * 1000)
        }
        Iterator.empty
      }
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Continuously-maintained top-k per window (ClickHouse topK over a
    * materialized view analog): each micro-batch ranks within windows and
    * swaps the k best rows per window into `path` (same snapshot-swap
    * discipline as materializedAgg). Runs in Complete mode, so aggregate
    * state covers EVERY window seen — |windows × types| grows with
    * stream lifetime, which is fine for bounded-retention jobs but NOT
    * watermark-evicted; a long-running deployment should periodically
    * restart from a fresh checkpoint after compacting `path`, or switch
    * to Update mode with MERGE-style maintenance of the snapshot.
    */
  def windowedTopK(events: DataFrame, path: String, checkpoint: String,
    k: Int = 3, win: String = "5 minutes",
    watermark: String = "10 minutes"): org.apache.spark.sql.streaming.StreamingQuery = {
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))
      .writeStream
      .outputMode(OutputMode.Complete)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import org.apache.spark.sql.expressions.Window
        val ranked = batch
          .withColumn("rnk", row_number().over(
            Window.partitionBy(col("win_start"))
              .orderBy(col("n").desc, col("event_type"))))
          .filter(col("rnk") <= k)
        swapInto(ranked, path, batchId)
      }
      .start()
  }

  final case class Quote(ts: Timestamp, user_id: Long, value: Double)

  final case class Enriched(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, quote_ts: Option[Timestamp], quote_value: Option[Double])

  /** Merged event∪quote row for the as-of enrichment state machine. */
  final case class Tagged(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, qvalue: Option[Double])

  /** Streaming AS-OF enrichment: each event is joined to the latest
    * quote for its key with quote.ts ≤ event.ts — the streaming analog of
    * the batch as-of join (Asof.scala), which Structured Streaming's
    * equi/interval joins cannot express directly. Implemented with
    * flatMapGroupsWithState holding a bounded, time-ordered buffer of
    * recent quotes per key (evicted up to the oldest event that can
    * still arrive ≈ the watermark horizon); events and quotes arrive
    * interleaved on a merged stream. State is per-key and
    * watermark-bounded — the 100 TB shape for streaming enrichment.
    */
  def asofEnrich(events: Dataset[Event], quotes: Dataset[Quote],
    watermark: String = "10 minutes", horizonSec: Long = 3600): Dataset[Enriched] = {
    val spark = events.sparkSession
    import spark.implicits._
    // merge both streams into one keyed stream (quotes tagged via null type)
    val tagged = events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        lit(null).cast(DoubleType).as("qvalue"))
      .unionByName(quotes.select(lit(-1L).as("event_id"), col("ts"), col("user_id"),
        lit(null).cast("string").as("event_type"), col("value").as("qvalue")))

    def update(userId: Long, it: Iterator[Tagged],
      state: GroupState[Seq[(Long, Double)]]): Iterator[Enriched] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        // Secondary key orders quotes BEFORE events at equal ts: as-of is
        // quote.ts <= event.ts, so a same-timestamp quote must be applied
        // to the book before the event reads it — without the tie-break
        // the outcome would depend on iterator arrival order.
        val batch = it.toSeq.sortBy(r => (r.ts.getTime, if (r.qvalue.isDefined) 0 else 1))
        var book = state.getOption.getOrElse(Seq.empty)
        val out = Seq.newBuilder[Enriched]
        batch.foreach { r =>
          if (r.qvalue.isDefined) {
            book = (book :+ (r.ts.getTime, r.qvalue.get)).sortBy(_._1)
          } else {
            val asof = book.filter(_._1 <= r.ts.getTime).lastOption
            out += Enriched(r.event_id, r.ts, userId, r.event_type,
              asof.map(q => new Timestamp(q._1)), asof.map(_._2))
          }
        }
        // evict quotes older than the horizon behind the newest seen ts,
        // but ALWAYS retain the latest quote at-or-before the cutoff: any
        // event still admissible under the watermark may need it as its
        // as-of predecessor (dropping it would mis-enrich to None).
        if (batch.nonEmpty) {
          val hi = batch.map(_.ts.getTime).max
          val cutoff = hi - horizonSec * 1000
          val (older, recent) = book.partition(_._1 < cutoff)
          book = older.lastOption.toSeq ++ recent
          state.update(book)
          state.setTimeoutTimestamp(hi + horizonSec * 1000)
        }
        out.result().iterator
      }
    }

    tagged.as[Tagged]
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  final case class Doc(doc_id: Long, ts: Timestamp, text: String)
  final case class NearDupHit(id1: Long, id2: Long, est_jaccard: Double)

  /** Streaming near-duplicate detection — the batch dedup_minhash_lsh as
    * a stateful stream. Each arriving document's k=16 MinHash signature
    * (the same codegen'd kernel arithmetic as the batch op) splits into
    * 4 band buckets; the stream is keyed by (band, bucket) and
    * flatMapGroupsWithState holds a bounded FIFO of recent signatures
    * per bucket. A new document emits a hit the moment its signature
    * agrees with a held one on ≥ `threshold` of components — the
    * pipeline shape for "drop near-dups at ingest before they reach the
    * corpus". State is per-bucket and bounded two ways: maxPerBucket
    * caps each FIFO, and an event-time timeout (`idleTtlSec` behind the
    * newest signature seen) expires buckets no new document has hashed
    * into — without it the live key space (bucket values range over the
    * whole modulus P) would grow without bound over a long-running
    * stream. A doc pair sharing several bands can emit once per shared
    * band — callers dedup on (id1, id2) in the sink (chaining a second
    * stateful operator behind flatMapGroupsWithState is restricted in
    * streaming).
    */
  def nearDupStream(docs: Dataset[Doc], threshold: Double = 0.5,
    maxPerBucket: Int = 256, watermark: String = "10 minutes",
    idleTtlSec: Long = 3600): Dataset[NearDupHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val k = 16; val bands = 4; val rows = k / bands
    val P = graft.functions.PortableHash.P

    // (band, bucket) keyed stream of signatures — same banding fold as
    // the batch operator (seed band+1, acc*31+v mod P).
    val banded = docs.flatMap { d =>
      val sig = graft.functions.SignatureKernels
        .minhashSig(org.apache.spark.unsafe.types.UTF8String.fromString(d.text), k, 3)
        .toLongArray()
      (0 until bands).map { b =>
        var acc = (b + 1).toLong
        var i = 0
        while (i < rows) { acc = (acc * 31 + sig(b * rows + i)) % P; i += 1 }
        (b.toLong, acc, d.doc_id, d.ts, sig)
      }
    }.toDF("band", "bucket", "doc_id", "ts", "sig")

    def update(key: (Long, Long), it: Iterator[(Long, Long, Long, Timestamp, Array[Long])],
      state: GroupState[Seq[(Long, Array[Long])]]): Iterator[NearDupHit] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        var held = state.getOption.getOrElse(Seq.empty)
        val out = Seq.newBuilder[NearDupHit]
        val batch = it.toSeq
        // deterministic intra-batch order: by doc id
        batch.sortBy(_._3).foreach { case (_, _, id, _, sig) =>
          held.foreach { case (hid, hsig) =>
            if (hid != id) {
              var same = 0
              var j = 0
              while (j < k) { if (sig(j) == hsig(j)) same += 1; j += 1 }
              val est = same.toDouble / k
              if (est >= threshold)
                out += NearDupHit(math.min(hid, id), math.max(hid, id),
                  math.round(est * 10000).toDouble / 10000)
            }
          }
          held = (held :+ (id, sig)).takeRight(maxPerBucket)
        }
        state.update(held)
        // expire this bucket once no new doc has hashed into it for
        // idleTtlSec of event time — bounds the LIVE key space
        state.setTimeoutTimestamp(batch.map(_._4.getTime).max + idleTtlSec * 1000)
        out.result().iterator
      }
    }

    banded.withWatermark("ts", watermark)
      .as[(Long, Long, Long, Timestamp, Array[Long])]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  final case class KeyState(event_id: Long, ts_ms: Long, value: Double)
  final case class StateChange(user_id: Long, event_type: String,
    event_id: Long, value: Double)

  /** Streaming ReplacingMergeTree — the q59 FINAL semantic maintained
    * continuously: state per (user_id, event_type) holds the current
    * winner (max (ts, event_id) version), and each micro-batch emits
    * only the keys whose state CHANGED — an upsert feed for a serving
    * store. Late or stale updates (older version than held) emit
    * nothing, so replays are idempotent. State size = |live keys|,
    * exactly the rows of the ClickHouse table it mirrors; `idleTtlSec`
    * optionally expires keys idle past the TTL for key spaces that
    * churn (session-scoped entities), at the cost of re-emitting a key
    * that reappears later.
    */
  def replacingStream(events: Dataset[Event], watermark: String = "10 minutes",
    idleTtlSec: Option[Long] = None): Dataset[StateChange] = {
    val spark = events.sparkSession
    import spark.implicits._
    def update(key: (Long, String), it: Iterator[Event],
      state: GroupState[KeyState]): Iterator[StateChange] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        val held = state.getOption
        import scala.math.Ordering.Implicits._
        val batchBest = it.reduceOption { (a, b) =>
          if ((a.ts.getTime, a.event_id) >= ((b.ts.getTime, b.event_id))) a else b
        }
        val next = (held, batchBest) match {
          case (Some(h), Some(b)) =>
            if ((b.ts.getTime, b.event_id) > ((h.ts_ms, h.event_id)))
              Some(KeyState(b.event_id, b.ts.getTime, b.value))
            else None
          case (None, Some(b)) => Some(KeyState(b.event_id, b.ts.getTime, b.value))
          case _ => None
        }
        next match {
          case Some(s) =>
            state.update(s)
            idleTtlSec.foreach(ttl => state.setTimeoutTimestamp(s.ts_ms + ttl * 1000))
            Iterator.single(StateChange(key._1, key._2, s.event_id, s.value))
          case None =>
            // stale batch: keep state (and its timeout) untouched
            Iterator.empty
        }
      }
    }
    events
      .withWatermark("ts", watermark)
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append,
        if (idleTtlSec.isDefined) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout)(update)
  }

  /** Streaming corpus cleaning — the batch pipe_clean_corpus +
    * text_pii_scrub stages composed at ingest time: quality gate (word
    * count + stopword ratio, pure narrow filters Catalyst fuses into the
    * scan), PII scrub (the SAME regexp chain the batch operator runs —
    * graft.text.TextOps.piiPatterns, so batch backfills and the live
    * stream can never disagree on what was redacted), then streaming
    * exact dedup on the normalized content hash.
    * dropDuplicatesWithinWatermark keys state by content hash and evicts
    * it at the watermark horizon — state is |unique docs per horizon|,
    * not |corpus|, so the stream runs forever. Near-dups are the
    * companion nearDupStream; this stage is the exact-dup + hygiene cut.
    */
  final case class SourcedDoc(doc_id: Long, ts: Timestamp, source: String,
    text: String)

  final case class Admitted(doc_id: Long, source: String, n_tok: Long,
    cum_tokens: Long)

  /** Streaming per-source token-budget admission (the ingest-side quota
    * of pipe_mix_sample): each source may contribute at most
    * `tokenBudget` whitespace tokens to the output stream; documents are
    * admitted whole, in (event-time, doc_id) order within each batch,
    * until the next document would overflow the budget — then that
    * document is dropped (not split) and smaller later documents may
    * still fit. State per source is ONE counter, so the operator's state
    * size is |sources| regardless of stream length — the cheapest
    * possible admission control at any scale. Cross-batch admission
    * depends on arrival order, as any online quota does.
    */
  def budgetStream(docs: Dataset[SourcedDoc],
    tokenBudget: Long = 1000000L,
    watermark: String = "10 minutes"): Dataset[Admitted] = {
    val spark = docs.sparkSession
    import spark.implicits._

    def update(source: String, it: Iterator[SourcedDoc],
      state: GroupState[Long]): Iterator[Admitted] = {
      var used = state.getOption.getOrElse(0L)
      val out = Seq.newBuilder[Admitted]
      it.toSeq.sortBy(d => (d.ts.getTime, d.doc_id)).foreach { d =>
        val n = d.text.trim.split("\\s+").count(_.nonEmpty).toLong
        if (used + n <= tokenBudget) {
          used += n
          out += Admitted(d.doc_id, source, n, used)
        }
      }
      state.update(used)
      out.result().iterator
    }

    docs
      .withWatermark("ts", watermark)
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }

  def cleanCorpusStream(docs: Dataset[Doc], watermark: String = "10 minutes",
    minWords: Int = 20, minStopRatio: Double = 0.05): DataFrame = {
    val ws = split(trim(col("text")), "\\s+")
    val nStop = size(filter(ws, w => w.isin(graft.text.TextOps.stopwords: _*)))
    val scrubbed = graft.text.TextOps.piiPatterns.foldLeft(col("text")) {
      case (acc, (_, pat, rep)) => regexp_replace(acc, pat, rep)
    }
    docs.toDF()
      .withWatermark("ts", watermark)
      .withColumn("n_words", size(ws))
      .withColumn("n_stop", nStop)
      .filter(col("n_words") >= minWords &&
        col("n_stop").cast(DoubleType) / col("n_words") >= minStopRatio)
      .withColumn("clean", scrubbed)
      .withColumn("content_key", md5(lower(col("clean")).cast("binary")))
      .dropDuplicatesWithinWatermark("content_key")
      .select(col("doc_id"), col("ts"), col("clean"), col("n_words"))
  }

  /** Streaming TTL compaction — q84_ttl_expiry's maintenance job run
    * continuously: each micro-batch appends detail rows, then re-splits
    * the detail table by the event-time TTL horizon (cutoff = the
    * table's max day − ttlDays — deterministic, no wall clock): rows
    * inside the horizon stay detail, expired rows collapse into the
    * per-(day, type) rollup table, whose (n, DECIMAL value) states merge
    * re-aggregatably with what previous batches already rolled up (the
    * TTL GROUP BY policy — old data gets coarser, never lost; DECIMAL
    * sums make merged and direct aggregation agree exactly). Both tables
    * move via the atomic snapshot swap. At 100 TB the same job drops or
    * rewrites only the PARTITIONS whose day extents cross the horizon —
    * exactly the per-granule day metadata q83 audits.
    */
  def ttlRollupStream(events: Dataset[Event], path: String, checkpoint: String,
    ttlDays: Int = 14): org.apache.spark.sql.streaming.StreamingQuery = {
    events.toDF()
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val detailP = s"$path/detail"
        val rollupP = s"$path/rollup"
        batch
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"),
            datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("d"))
          .write.mode("append").parquet(detailP)
        val detail = spark.read.parquet(detailP)
        val cut = detail.agg((max(col("d")) - ttlDays).as("cutoff"))
        val split = detail.crossJoin(broadcast(cut))
        val live = split.filter(col("d") > col("cutoff")).drop("cutoff")
        val expired = split.filter(col("d") <= col("cutoff"))
          .groupBy(col("d"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 2))).as("value_sum"))
        val fs = new org.apache.hadoop.fs.Path(rollupP)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val merged =
          if (fs.exists(new org.apache.hadoop.fs.Path(rollupP)))
            spark.read.parquet(rollupP).unionAll(expired)
              .groupBy(col("d"), col("event_type"))
              .agg(sum(col("n")).as("n"), sum(col("value_sum")).as("value_sum"))
          else expired
        swapInto(merged, rollupP, batchId)
        swapInto(live, detailP, batchId)
        ()
      }
      .start()
  }

  /** Streaming KMV distinct sketch — the q88 estimator maintained online:
    * per event_type, state is the k smallest universal hashes of user_id,
    * a bounded set of ≤ k longs per key FOREVER (no watermark-sized
    * growth — the sketch only shrinks its threshold), which is what makes
    * count-distinct serviceable on an unbounded stream where exact
    * distinct state would grow with |users|. KMV insertion is
    * order-independent (min-set of a set union), so the online estimate
    * is bit-identical to the batch q88 algebra over the same events —
    * the spec pins that equality. Each batch emits the refreshed
    * estimate per touched key (Update-style progress over an
    * ever-growing distinct count).
    */
  final case class KmvEstimate(event_type: String, n_kept: Long, estimate: Long)

  def kmvStream(events: Dataset[Event], k: Int = 64,
    watermark: String = "10 minutes"): Dataset[KmvEstimate] = {
    val spark = events.sparkSession
    import spark.implicits._
    val p = graft.functions.PortableHash.P

    def update(key: String, it: Iterator[Event],
      state: GroupState[Seq[Long]]): Iterator[KmvEstimate] = {
      val set = scala.collection.mutable.TreeSet.empty[Long]
      set ++= state.getOption.getOrElse(Seq.empty)
      it.foreach { e =>
        set += graft.functions.PortableHash.seeded(e.user_id % p, 9)
        if (set.size > k) set -= set.last
      }
      val kept = set.toSeq
      state.update(kept)
      val est =
        if (kept.size < k) kept.size.toLong
        else (k - 1).toLong * p / kept.last
      Iterator.single(KmvEstimate(key, kept.size.toLong, est))
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }

  /** Streaming gap alerting — q106_event_gaps' monitor run online: per
    * event_type the state is ONE timestamp (the latest event seen); a
    * batch emits an alert row for every inter-event silence above the
    * threshold, including the gap that straddles the batch boundary
    * (state carries the last event across batches). Events inside a
    * batch are processed in event-time order so the online gaps are
    * exactly the batch operator's LAG gaps over the same stream.
    */
  final case class GapAlert(event_type: String, gap_us: Long, at_us: Long)

  def gapAlertStream(events: Dataset[Event], thresholdUs: Long = 120000000L,
    watermark: String = "10 minutes"): Dataset[GapAlert] = {
    val spark = events.sparkSession
    import spark.implicits._

    def update(key: String, it: Iterator[Event],
      state: GroupState[Long]): Iterator[GapAlert] = {
      var last = state.getOption.getOrElse(Long.MinValue)
      val out = scala.collection.mutable.ArrayBuffer.empty[GapAlert]
      it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val us = e.ts.getTime * 1000L
        if (last != Long.MinValue && us - last > thresholdUs)
          out += GapAlert(key, us - last, us)
        if (us > last) last = us
      }
      state.update(last)
      out.iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }

  /** Streaming uniqUpTo(N) — the q98 combinator maintained online: per
    * event_type, state is the distinct user set ONLY while it is ≤ N
    * ids; at N+1 the set saturates and the state stops growing forever
    * (≤ N+1 longs per key, no watermark-sized growth) — the streaming
    * face of the same bound the batch Aggregator enforces per shuffle
    * row. Saturation is monotone and insertion order-independent, so
    * the online answer is identical to the batch operator over the same
    * events (the spec pins that equality). Each batch emits the
    * refreshed capped count per touched key.
    */
  final case class UniqUpToCount(event_type: String, capped_distinct: Long)

  def uniqUpToStream(events: Dataset[Event], n: Int = 50,
    watermark: String = "10 minutes"): Dataset[UniqUpToCount] = {
    val spark = events.sparkSession
    import spark.implicits._

    def update(key: String, it: Iterator[Event],
      state: GroupState[Seq[Long]]): Iterator[UniqUpToCount] = {
      var ids = scala.collection.mutable.TreeSet.empty[Long]
      ids ++= state.getOption.getOrElse(Seq.empty)
      it.foreach { e =>
        if (ids.size <= n) ids += e.user_id
      }
      // cap at n+1: drop any overshoot beyond the saturation sentinel
      val kept = ids.toSeq.take(n + 1)
      state.update(kept)
      Iterator.single(UniqUpToCount(key, math.min(kept.size, n + 1).toLong))
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }

  /** One arriving order for the streaming Pareto front. */
  final case class OrderRow(o_orderpriority: String, o_orderkey: Long,
    o_totalprice: Double, o_orderdate: Timestamp)

  /** Per-priority front stats — q121_skyline's output row, refreshed
    * per batch that touches the priority.
    */
  final case class SkylineFront(o_orderpriority: String, front_size: Long,
    first_key: Long, front_price_cents: Long)

  /** Streaming Pareto front — q121_skyline's online twin: per priority
    * class, state is the CURRENT front under the same staircase
    * invariant the batch SkylinePerGroupExec maintains (rows ordered by
    * (price asc, date desc, key asc), dominance dates strictly
    * increasing along it). An arriving order is dominated iff the
    * greatest kept row before it in that order carries a date ≥ its
    * own; admitting it prunes the contiguous now-dominated run after
    * it. State is FRONT-sized (E ≈ ln n for exchangeable arrivals),
    * never stream-sized, and needs no watermark: a skyline is a
    * monotone set function, so the front only refines. The staircase is
    * the skyline of the inserted SET — arrival and batch-boundary
    * independent — so the last emitted row per priority equals the
    * batch q121 result over the same orders (spec-pinned). Cents ride
    * BigDecimal HALF_UP × 100 — the batch DECIMAL(18,2) convention.
    */
  def skylineStream(orders: Dataset[OrderRow]): Dataset[SkylineFront] = {
    val spark = orders.sparkSession
    import spark.implicits._

    // state rows: (price, dateMicros, key), kept in staircase order
    val ord: Ordering[(Double, Long, Long)] =
      Ordering.by(t => (t._1, -t._2, t._3))

    def update(key: String, it: Iterator[OrderRow],
      state: GroupState[Seq[(Double, Long, Long)]]): Iterator[SkylineFront] = {
      val stair = new java.util.TreeMap[(Double, Long, Long), Long](
        (a: (Double, Long, Long), b: (Double, Long, Long)) => ord.compare(a, b))
      state.getOption.getOrElse(Seq.empty).foreach(r => stair.put(r, r._2))
      it.foreach { o =>
        val micros = o.o_orderdate.getTime * 1000 +
          (o.o_orderdate.getNanos / 1000) % 1000
        val row = (o.o_totalprice, micros, o.o_orderkey)
        val fl = stair.floorEntry(row)
        if (fl == null || fl.getValue < micros) {
          val tail = stair.tailMap(row, false).entrySet().iterator()
          var stop = false
          while (!stop && tail.hasNext) {
            if (tail.next().getValue <= micros) tail.remove() else stop = true
          }
          stair.put(row, micros)
        }
      }
      val front = {
        import scala.jdk.CollectionConverters._
        stair.keySet().iterator().asScala.toSeq
      }
      state.update(front)
      val cents = front.iterator.map { r =>
        new java.math.BigDecimal(r._1)
          .setScale(2, java.math.RoundingMode.HALF_UP)
          .movePointRight(2).longValueExact()
      }.sum
      Iterator.single(SkylineFront(key, front.size.toLong,
        front.iterator.map(_._3).min, cents))
    }

    orders
      .groupByKey(_.o_orderpriority)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }
}
