package graft.multimodal

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Multimodal-column plumbing (SURVEY.md §2c): media as opaque binary
  * columns + typed metadata, decoded/feature-extracted per partition.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic FAKE (first-bytes statistics standing in
  * for pixel decoding). Everything around it — binary schema, typed
  * Dataset, per-partition batched processing, downstream relational
  * aggregation — is the real plumbing a decode UDF would plug into.
  */
object Multimodal {

  /** A media row: opaque payload + metadata, as a training pipeline would
    * model image/audio blobs alongside parquet metadata columns.
    */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
    width: Int, height: Int)

  /** Extracted features per media item. */
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
    mean_byte: Double, n_frames: Long)

  /** FAKE DECODE — stands in for an image/audio codec. Deterministic:
    * byte statistics + synthetic frame count from metadata. A real
    * deployment swaps only this function (same batched signature).
    */
  private def decodeStub(row: MediaRow): MediaFeatures = {
    val bytes = row.payload
    val mean = if (bytes.isEmpty) 0.0
      else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
    MediaFeatures(row.media_id, row.kind, bytes.length.toLong,
      math.rint(mean * 100) / 100, (row.width.toLong * row.height) / 64)
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

  // mm_pipeline — end-to-end: build binary media rows from documents
  // (payload = utf-8 bytes as stand-in blob), decode per-partition through
  // the typed stub, aggregate features relationally. The mapPartitions
  // stage is the only non-Catalyst hop, exactly where a codec must live.
  val pipeline = Q("mm_pipeline", None) { t =>
    val spark = t.spark
    import spark.implicits._
    val media = t.documents.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image").when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("n_chars") % 64 + 1).cast("int").as("width"),
      (col("n_chars") % 48 + 1).cast("int").as("height"))
      .as[MediaRow]
    media
      .mapPartitions(_.map(decodeStub))
      .toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("total_bytes"),
        round(sum(col("mean_byte")) / count(lit(1)), 2).as("avg_mean_byte"),
        sum(col("n_frames")).as("total_frames"))
      .orderBy(col("kind"))
  }

  // mm_transform — resize + frame-sample plumbing over the same binary
  // rows: per-partition typed stages chained ahead of feature extraction,
  // the shape a real codec pipeline (decode → resize → sample → embed)
  // runs in.
  val transformPipeline = Q("mm_transform", None) { t =>
    val spark = t.spark
    import spark.implicits._
    val media = t.documents.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image").when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("n_chars") % 64 + 1).cast("int").as("width"),
      (col("n_chars") % 48 + 1).cast("int").as("height"))
      .as[MediaRow]
    media
      .mapPartitions(_.map(resizeStub(_, 32, 24)))
      .mapPartitions(_.flatMap(frameSampleStub(_, stride = 4)))
      .toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_frames_sampled"),
        countDistinct(col("media_id")).as("n_frame_ids"),
        min(col("width")).as("w"), min(col("height")).as("h"),
        sum(length(col("payload"))).as("sampled_bytes"))
      .orderBy(col("kind"))
  }

  val all: Seq[Q] = Seq(pipeline, transformPipeline)
}
