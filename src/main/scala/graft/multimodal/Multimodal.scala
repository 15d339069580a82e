package graft.multimodal

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Multimodal-column plumbing (SURVEY.md §2c): media as opaque binary
  * columns + typed metadata, decoded/feature-extracted per partition.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic FAKE (integer byte statistics standing in
  * for pixel decoding). Everything around it — binary schema, typed
  * Dataset, per-partition batched processing, downstream relational
  * aggregation — is the real plumbing a codec UDF would plug into, and
  * because the fake kernels are exact integer arithmetic over the
  * payload bytes, BOTH operators are verified end-to-end by DuckDB
  * oracles that recompute the same features from the source documents.
  */
object Multimodal {

  /** A media row: opaque payload + metadata, as a training pipeline would
    * model image/audio blobs alongside parquet metadata columns.
    */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
    width: Int, height: Int)

  /** Extracted features per media item (exact integers so the pipeline is
    * oracle-checkable: mean_centi = floor(100·Σbytes / n_bytes)).
    */
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
    mean_centi: Long, n_frames: Long)

  /** FAKE DECODE — stands in for an image/audio codec. Deterministic
    * integer byte statistics + synthetic frame count from metadata. A
    * real deployment swaps only this function (same batched signature).
    */
  private def decodeStub(row: MediaRow): MediaFeatures = {
    val bytes = row.payload
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    val meanCenti = if (bytes.isEmpty) 0L else (100L * sum) / bytes.length
    MediaFeatures(row.media_id, row.kind, bytes.length.toLong,
      meanCenti, (row.width.toLong * row.height) / 64)
  }

  /** FAKE RESIZE — stands in for an image resize kernel: scales the
    * metadata dimensions and truncates the payload proportionally
    * (deterministic). Real deployments swap the body, keep the signature.
    */
  def resizeStub(row: MediaRow, targetW: Int, targetH: Int): MediaRow = {
    val ratio = (targetW.toLong * targetH).toDouble /
      math.max(row.width.toLong * row.height, 1)
    val n = math.max(1, math.min(row.payload.length,
      math.ceil(row.payload.length * ratio).toInt))
    row.copy(payload = row.payload.take(n), width = targetW, height = targetH)
  }

  /** FAKE FRAME SAMPLE — stands in for video frame extraction: emits one
    * MediaRow per sampled "frame" (every `stride`-th synthetic frame),
    * payload sliced deterministically per frame index.
    */
  def frameSampleStub(row: MediaRow, stride: Int): Iterator[MediaRow] = {
    val nFrames = ((row.width.toLong * row.height) / 64).toInt
    (0 until nFrames by stride).iterator.map { f =>
      val from = math.min(f * 8, math.max(row.payload.length - 1, 0))
      val until = math.min(from + 8, row.payload.length)
      row.copy(media_id = row.media_id * 100000L + f,
        payload = row.payload.slice(from, until))
    }
  }

  /** The media table builder shared by both ops (payload = utf-8 bytes as
    * stand-in blob; dims derived from n_chars) and its SQL mirror.
    */
  private def mediaOf(t: Tables) = {
    val spark = t.spark
    import spark.implicits._
    t.documents.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image").when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("n_chars") % 64 + 1).cast("int").as("width"),
      (col("n_chars") % 48 + 1).cast("int").as("height"))
      .as[MediaRow]
  }

  private val mediaSql =
    """media AS (
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               text,
               LENGTH(text) AS n_bytes,
               LIST_SUM(LIST_TRANSFORM(string_split(text, ''), c -> ascii(c)::BIGINT)) AS byte_sum,
               n_chars % 64 + 1 AS width,
               n_chars % 48 + 1 AS height
        FROM documents)"""

  // mm_pipeline — end-to-end: build binary media rows from documents
  // (payload = utf-8 bytes as stand-in blob), decode per-partition through
  // the typed stub, aggregate features relationally. The mapPartitions
  // stage is the only non-Catalyst hop, exactly where a codec must live.
  // The oracle recomputes the integer features from the source text (the
  // corpus is ASCII, so code points == payload bytes).
  val pipeline = Q(
    "mm_pipeline",
    Some(s"""
      WITH $mediaSql,
      decoded AS (
        SELECT kind, n_bytes,
               CASE WHEN n_bytes = 0 THEN 0 ELSE (100 * byte_sum) // n_bytes END AS mean_centi,
               (width * height) // 64 AS n_frames
        FROM media)
      SELECT kind,
             COUNT(*) AS n_items,
             SUM(n_bytes)::BIGINT AS total_bytes,
             ROUND(SUM(mean_centi)::DOUBLE / (COUNT(*) * 100), 4) AS avg_mean_byte,
             SUM(n_frames)::BIGINT AS total_frames
      FROM decoded
      GROUP BY kind
      ORDER BY kind
    """)
  ) { t =>
    val spark = t.spark
    import spark.implicits._
    mediaOf(t)
      .mapPartitions(_.map(decodeStub))
      .toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("total_bytes"),
        round(sum(col("mean_centi")).cast(DoubleType) / (count(lit(1)) * 100), 4)
          .as("avg_mean_byte"),
        sum(col("n_frames")).as("total_frames"))
      .orderBy(col("kind"))
  }

  // mm_transform — resize + frame-sample plumbing over the same binary
  // rows: per-partition typed stages chained ahead of feature extraction,
  // the shape a real codec pipeline (decode → resize → sample → embed)
  // runs in. The oracle replays the resize ratio truncation and the
  // per-frame byte slicing in SQL.
  val transformPipeline = Q(
    "mm_transform",
    Some(s"""
      WITH $mediaSql,
      resized AS (
        SELECT media_id, kind,
               GREATEST(1, LEAST(n_bytes,
                 CAST(CEIL(n_bytes * (768.0 / GREATEST(width * height, 1))) AS BIGINT))) AS rlen
        FROM media),
      frames AS (
        SELECT media_id, kind, rlen, f,
               LEAST(f * 8, GREATEST(rlen - 1, 0)) AS ffrom
        FROM resized, UNNEST([0, 4, 8]) AS t(f)),
      sliced AS (
        SELECT media_id * 100000 + f AS frame_id, kind,
               LEAST(ffrom + 8, rlen) - ffrom AS flen
        FROM frames)
      SELECT kind,
             COUNT(*) AS n_frames_sampled,
             COUNT(DISTINCT frame_id) AS n_frame_ids,
             32::BIGINT AS w, 24::BIGINT AS h,
             SUM(flen)::BIGINT AS sampled_bytes
      FROM sliced
      GROUP BY kind
      ORDER BY kind
    """)
  ) { t =>
    val spark = t.spark
    import spark.implicits._
    mediaOf(t)
      .mapPartitions(_.map(resizeStub(_, 32, 24)))
      .mapPartitions(_.flatMap(frameSampleStub(_, stride = 4)))
      .toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_frames_sampled"),
        countDistinct(col("media_id")).as("n_frame_ids"),
        min(col("width")).cast("long").as("w"), min(col("height")).cast("long").as("h"),
        sum(length(col("payload"))).as("sampled_bytes"))
      .orderBy(col("kind"))
  }

  val all: Seq[Q] = Seq(pipeline, transformPipeline)
}
