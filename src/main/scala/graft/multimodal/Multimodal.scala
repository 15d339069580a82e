package graft.multimodal

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Multimodal-column pipeline (SURVEY.md §2c): media as opaque binary
  * columns decoded per partition through REAL image codecs —
  * [[Codecs.PpmCodec]] (binary P6), [[Codecs.BmpCodec]] (24-bit BI_RGB
  * with row padding / BGR order / bottom-up layout), and
  * [[Codecs.PpmStream]] (concatenated frames, the image2pipe video
  * convention). Payload pixels come from a deterministic generator the
  * DuckDB oracles replay in SQL, so the encode→decode round trip is
  * verified pixel-exactly: a missed padding byte, an unswapped BGR
  * triple or a flipped row order fails the gate (the position-weighted
  * checksum catches order-preserving mistakes that plain sums miss).
  *
  * The mapPartitions stages are the only non-Catalyst hops — exactly
  * where a production codec (JPEG/H.264) plugs in behind the same
  * Raster boundary. At 100 TB: payloads are a binary column scanned
  * partition-parallel; decode is embarrassingly parallel per batch;
  * everything downstream is relational aggregation.
  */
object Multimodal {
  import Codecs._

  /** A media row as a lake stores it: id + container kind + opaque bytes. */
  final case class MediaBlob(media_id: Long, kind: String, payload: Array[Byte])

  /** Per-item decoded statistics (exact integers → oracle-checkable). */
  final case class DecodedStats(media_id: Long, kind: String, n_frames: Long,
    width: Int, height: Int, sum_r: Long, sum_g: Long, sum_b: Long, wsum: Long)

  /** Post-resize/sample statistics for the transform pipeline. */
  final case class TransformStats(media_id: Long, kind: String,
    n_frames_sampled: Long, sum_r: Long, sum_g: Long, sum_b: Long, wsum: Long)

  private def dims(id: Long): (Int, Int) =
    ((id % 24 + 8).toInt, (id % 16 + 8).toInt)
  private def frameCount(id: Long): Int =
    if (id % 3 == 2) (id % 5 + 2).toInt else 1

  /** Encode the deterministic rasters into a real container per kind. */
  def encodeBlob(id: Long): MediaBlob = {
    val (w, h) = dims(id)
    id % 3 match {
      case 0 => MediaBlob(id, "image_ppm", PpmCodec.encode(generate(id, w, h)))
      case 1 => MediaBlob(id, "image_bmp", BmpCodec.encode(generate(id, w, h)))
      case _ => MediaBlob(id, "video",
        PpmStream.encode((0 until frameCount(id)).map(f => generate(id, w, h, f))))
    }
  }

  /** Channel sums + position-weighted checksum over decoded frames, in
    * flat top-down RGB order across frames (j = frame*w*h*3 + offset) —
    * the exact quantity the oracle computes from the generator.
    */
  def statsOf(id: Long, kind: String, frames: Seq[Raster]): DecodedStats = {
    var sr = 0L; var sg = 0L; var sb = 0L; var ws = 0L
    var j = 0L
    frames.foreach { fr =>
      var i = 0
      while (i < fr.rgb.length) {
        val v = fr.rgb(i) & 0xff
        (i % 3: @annotation.switch) match {
          case 0 => sr += v
          case 1 => sg += v
          case 2 => sb += v
        }
        ws += j * v
        i += 1; j += 1
      }
    }
    val head = frames.head
    DecodedStats(id, kind, frames.size.toLong, head.width, head.height, sr, sg, sb, ws)
  }

  /** The media table: doc ids → encoded binary payloads (the pipeline's
    * ingest boundary; a real lake reads these bytes from parquet/blob
    * storage instead of encoding them).
    */
  private def mediaOf(t: Tables) = {
    val spark = t.spark
    import spark.implicits._
    t.documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(encodeBlob))
  }

  /** Shared SQL mirror of the media-generation parameters. */
  private val mediaSql =
    """media AS (
        SELECT doc_id,
               CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image_ppm'
                    WHEN 1 THEN 'image_bmp' ELSE 'video' END AS kind,
               doc_id % 24 + 8 AS w,
               doc_id % 16 + 8 AS h,
               CASE WHEN doc_id % 3 = 2 THEN doc_id % 5 + 2 ELSE 1 END AS nf
        FROM documents)"""

  // mm_pipeline — ingest → decode → aggregate: binary payloads built by
  // the real encoders, sniffed (BMP magic vs PPM) and decoded per
  // partition, per-channel pixel sums + position checksum aggregated
  // relationally. The oracle recomputes every pixel from the generator
  // formula — the whole container round trip must be byte-perfect.
  val pipeline = Q(
    "mm_pipeline",
    Some(s"""
      WITH $mediaSql,
      px AS (
        SELECT kind, doc_id, nf, j, (doc_id * 7 + j * 13) % 251 AS v
        FROM media, UNNEST(RANGE(0, nf * w * h * 3)) AS t(j)),
      per_doc AS (
        SELECT kind, doc_id, nf,
               SUM(CASE WHEN j % 3 = 0 THEN v ELSE 0 END) AS sr,
               SUM(CASE WHEN j % 3 = 1 THEN v ELSE 0 END) AS sg,
               SUM(CASE WHEN j % 3 = 2 THEN v ELSE 0 END) AS sb,
               SUM(j * v) AS ws
        FROM px
        GROUP BY kind, doc_id, nf)
      SELECT kind,
             CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM(nf) AS BIGINT) AS total_frames,
             CAST(SUM(sr) AS BIGINT) AS sum_r,
             CAST(SUM(sg) AS BIGINT) AS sum_g,
             CAST(SUM(sb) AS BIGINT) AS sum_b,
             CAST(SUM(ws) AS BIGINT) AS total_wsum
      FROM per_doc
      GROUP BY kind
      ORDER BY kind
    """)
  ) { t =>
    val spark = t.spark
    import spark.implicits._
    mediaOf(t)
      .mapPartitions(_.map(b => statsOf(b.media_id, b.kind, decodeAny(b.payload))))
      .toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("n_frames")).as("total_frames"),
        sum(col("sum_r")).as("sum_r"),
        sum(col("sum_g")).as("sum_g"),
        sum(col("sum_b")).as("sum_b"),
        sum(col("wsum")).as("total_wsum"))
      .orderBy(col("kind"))
  }

  /** Decode → sample every 2nd frame → nearest-neighbor resize to 16×12
    * → stats, the shape of a real frame-extraction + thumbnail stage.
    */
  def transformOne(b: MediaBlob): TransformStats = {
    val sampled = decodeAny(b.payload).zipWithIndex
      .collect { case (fr, f) if f % 2 == 0 => fr }
    val resized = sampled.map(resizeNearest(_, 16, 12))
    var sr = 0L; var sg = 0L; var sb = 0L; var ws = 0L
    var k = 0
    resized.foreach { fr =>
      var o = 0
      while (o < fr.rgb.length) {
        val v = fr.rgb(o) & 0xff
        (o % 3: @annotation.switch) match {
          case 0 => sr += v
          case 1 => sg += v
          case 2 => sb += v
        }
        ws += (k.toLong * 576 + o) * v
        o += 1
      }
      k += 1
    }
    TransformStats(b.media_id, b.kind, resized.size.toLong, sr, sg, sb, ws)
  }

  // mm_transform — the thumbnail/frame-extract pipeline over the same
  // payloads: every 2nd frame, nearest-neighbor resized to 16×12. The
  // oracle replays the resize's floor index mapping per output pixel, so
  // the kernel's index arithmetic (not just its totals) is verified.
  val transformPipeline = Q(
    "mm_transform",
    Some(s"""
      WITH $mediaSql,
      frames AS (
        SELECT kind, doc_id, w, h, f, f // 2 AS k
        FROM media, UNNEST(RANGE(0, nf)) AS t(f)
        WHERE f % 2 = 0),
      outpx AS (
        SELECT kind, doc_id, w, h, f, k, o,
               (o // 3) % 16 AS ox, (o // 3) // 16 AS oy, o % 3 AS c
        FROM frames, UNNEST(RANGE(0, 576)) AS t2(o)),
      vals AS (
        SELECT kind, doc_id, k, o, c,
               (doc_id * 7 +
                (f * w * h * 3 + ((oy * h // 12) * w + (ox * w // 16)) * 3 + c) * 13)
                 % 251 AS v
        FROM outpx),
      per_doc AS (
        SELECT kind, doc_id,
               COUNT(DISTINCT k) AS nk,
               SUM(CASE WHEN c = 0 THEN v ELSE 0 END) AS sr,
               SUM(CASE WHEN c = 1 THEN v ELSE 0 END) AS sg,
               SUM(CASE WHEN c = 2 THEN v ELSE 0 END) AS sb,
               SUM((k * 576 + o) * v) AS ws
        FROM vals
        GROUP BY kind, doc_id)
      SELECT kind,
             CAST(SUM(nk) AS BIGINT) AS n_frames_sampled,
             CAST(16 AS BIGINT) AS out_w,
             CAST(12 AS BIGINT) AS out_h,
             CAST(SUM(sr) AS BIGINT) AS sum_r,
             CAST(SUM(sg) AS BIGINT) AS sum_g,
             CAST(SUM(sb) AS BIGINT) AS sum_b,
             CAST(SUM(ws) AS BIGINT) AS out_wsum
      FROM per_doc
      GROUP BY kind
      ORDER BY kind
    """)
  ) { t =>
    val spark = t.spark
    import spark.implicits._
    mediaOf(t)
      .mapPartitions(_.map(transformOne))
      .toDF()
      .groupBy(col("kind"))
      .agg(
        sum(col("n_frames_sampled")).as("n_frames_sampled"),
        lit(16L).cast(LongType).as("out_w"),
        lit(12L).cast(LongType).as("out_h"),
        sum(col("sum_r")).as("sum_r"),
        sum(col("sum_g")).as("sum_g"),
        sum(col("sum_b")).as("sum_b"),
        sum(col("wsum")).as("out_wsum"))
      .orderBy(col("kind"))
  }

  /** Per-clip decoded audio statistics (exact integers). */
  final case class AudioStats(media_id: Long, n_channels: Int, sample_rate: Int,
    n_samples: Long, amp_sum: Long, amp_sum_ch0: Long, energy: Long)

  // mm_audio — the audio lane of the multimodal pipeline: 16-bit PCM WAV
  // payloads (real RIFF chunk grammar — fmt parse, unknown-chunk skip,
  // little-endian words) built from a deterministic sample generator,
  // decoded per partition, amplitude/energy statistics aggregated per
  // channel layout. The oracle recomputes every sample from the
  // generator, so a byte-order or chunk-walk mistake fails the gate.
  // amp_sum_ch0 sums only channel 0 of the interleaved stream — it
  // catches interleaving/stride errors that whole-stream sums mask.
  val audio = Q(
    "mm_audio",
    Some("""
      WITH clips AS (
        -- sample count rounds down to a whole number of frames
        -- (blockAlign), mirroring generatePcm's alignment
        SELECT doc_id, n_channels, n_raw - n_raw % n_channels AS n_samples
        FROM (
          SELECT doc_id,
                 CAST(doc_id % 2 + 1 AS INT) AS n_channels,
                 doc_id % 500 + 100 AS n_raw
          FROM documents)),
      px AS (
        SELECT doc_id, n_channels, n_samples, j,
               (doc_id * 7 + j * 13) % 4001 - 2000 AS v
        FROM clips, UNNEST(RANGE(0, n_samples)) AS t(j)),
      per_clip AS (
        SELECT doc_id, n_channels, n_samples,
               SUM(v) AS amp_sum,
               SUM(CASE WHEN j % n_channels = 0 THEN v ELSE 0 END) AS amp_sum_ch0,
               SUM(v * v) AS energy
        FROM px
        GROUP BY doc_id, n_channels, n_samples)
      SELECT n_channels,
             CAST(8000 AS BIGINT) AS sample_rate,
             CAST(COUNT(*) AS BIGINT) AS n_clips,
             CAST(SUM(n_samples) AS BIGINT) AS total_samples,
             CAST(SUM(amp_sum) AS BIGINT) AS amp_sum,
             CAST(SUM(amp_sum_ch0) AS BIGINT) AS amp_sum_ch0,
             CAST(SUM(energy) AS BIGINT) AS energy
      FROM per_clip
      GROUP BY n_channels
      ORDER BY n_channels
    """)
  ) { t =>
    val spark = t.spark
    import spark.implicits._
    t.documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val channels = (id % 2 + 1).toInt
        val n = (id % 500 + 100).toInt
        val bytes = WavCodec.encode(generatePcm(id, channels, n))
        val clip = WavCodec.decode(bytes)
        var amp = 0L; var amp0 = 0L; var energy = 0L
        var j = 0
        while (j < clip.samples.length) {
          val v = clip.samples(j).toLong
          amp += v
          if (j % clip.channels == 0) amp0 += v
          energy += v * v
          j += 1
        }
        AudioStats(id, clip.channels, clip.sampleRate,
          clip.samples.length.toLong, amp, amp0, energy)
      })
      .toDF()
      .groupBy(col("n_channels"))
      .agg(
        min(col("sample_rate")).cast(LongType).as("sample_rate"),
        count(lit(1)).as("n_clips"),
        sum(col("n_samples")).as("total_samples"),
        sum(col("amp_sum")).as("amp_sum"),
        sum(col("amp_sum_ch0")).as("amp_sum_ch0"),
        sum(col("energy")).as("energy"))
      .orderBy(col("n_channels"))
  }

  /** Per-clip decoded video statistics (exact integers). */
  final case class VideoStats(media_id: Long, w: Long, n_frames_total: Long,
    n_frames_sampled: Long, luma_sum: Long, luma_wsum: Long)

  // mm_video — a REAL video container lane (Y4M/YUV4MPEG2), beside the
  // concatenated-PPM stream: ASCII stream header parse (tagged params,
  // unknown tags skipped), per-frame FRAME-marker walk, planar raster
  // decode, then the frame-sampling transform every production video
  // pipeline starts with (every 2nd frame). Statistics are exact luma
  // sums plus a position-weighted checksum keyed by SAMPLED frame index
  // k — a wrong frame size, a missed marker or an off-by-one in the
  // frame walk desynchronizes the stream and fails the oracle, which
  // replays every sampled byte from the generator.
  val video = Q(
    "mm_video",
    Some("""
      WITH clips AS (
        SELECT doc_id, 8 + (doc_id % 3) * 4 AS w, 8 AS h, doc_id % 4 + 2 AS nf
        FROM documents),
      sampled AS (
        SELECT doc_id, w, h, nf, f, f // 2 AS k
        FROM clips, UNNEST(RANGE(0, nf)) AS t(f)
        WHERE f % 2 = 0),
      px AS (
        SELECT doc_id, w, k,
               (w * h * k) + p AS wt,
               (doc_id * 7 + (f * w * h + p) * 13) % 251 AS v
        FROM sampled, UNNEST(RANGE(0, w * h)) AS t2(p)),
      per_clip AS (
        SELECT doc_id, w,
               COUNT(DISTINCT k) AS nk,
               SUM(v) AS ls,
               SUM(wt * v) AS ws
        FROM px
        GROUP BY doc_id, w)
      SELECT CAST(c.w AS BIGINT) AS w,
             CAST(COUNT(*) AS BIGINT) AS n_clips,
             CAST(SUM(c.nf) AS BIGINT) AS n_frames_total,
             CAST(SUM(p.nk) AS BIGINT) AS n_frames_sampled,
             CAST(SUM(p.ls) AS BIGINT) AS luma_sum,
             CAST(SUM(p.ws) AS BIGINT) AS luma_wsum
      FROM clips c JOIN per_clip p ON c.doc_id = p.doc_id
      GROUP BY c.w
      ORDER BY w
    """)
  ) { t =>
    val spark = t.spark
    import spark.implicits._
    t.documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (8 + (id % 3) * 4).toInt
        val h = 8
        val nf = (id % 4 + 2).toInt
        val bytes = Y4mCodec.encode(w, h, 30, 1,
          (0 until nf).map(f => generateLuma(id, w, h, f)))
        val clip = Y4mCodec.decode(bytes)
        require(clip.width == w && clip.height == h,
          s"Y4M geometry mismatch: ${clip.width}x${clip.height}")
        var ls = 0L; var ws = 0L; var k = 0L
        var f = 0
        while (f < clip.frames.length) {
          if (f % 2 == 0) {
            val fr = clip.frames(f)
            var p = 0
            while (p < fr.length) {
              val v = fr(p) & 0xff
              ls += v
              ws += (k * w * h + p) * v
              p += 1
            }
            k += 1
          }
          f += 1
        }
        VideoStats(id, w.toLong, clip.frames.length.toLong, k, ls, ws)
      })
      .toDF()
      .groupBy(col("w"))
      .agg(
        count(lit(1)).as("n_clips"),
        sum(col("n_frames_total")).as("n_frames_total"),
        sum(col("n_frames_sampled")).as("n_frames_sampled"),
        sum(col("luma_sum")).as("luma_sum"),
        sum(col("luma_wsum")).as("luma_wsum"))
      .orderBy(col("w"))
  }

  final case class AviStats(media_id: Long, w: Long, n_frames_total: Long,
    n_frames_sampled: Long, rgb_sum: Long, rgb_wsum: Long)

  // mm_avi — the second REAL video container (RIFF AVI with uncompressed
  // 24-bit DIB frames): nested LIST grammar (hdrl → avih/strl, movi),
  // JUNK-chunk skip, and — the capability Y4M lacks — the idx1 frame
  // index. Sampling is INDEX-DIRECTED: each sampled frame is fetched by
  // AviCodec.frameAt through idx1 without scanning movi, the access
  // pattern a production frame sampler uses on indexed containers
  // (decode cost scales with frames *kept*, not stored). Statistics are
  // exact RGB sums plus a position-weighted checksum keyed by sampled
  // index k; the oracle replays every sampled byte from the generator,
  // so a row-pad, BGR, bottom-up, or index off-by-one fails the gate.
  val avi = Q(
    "mm_avi",
    Some("""
      WITH clips AS (
        SELECT doc_id, 4 + (doc_id % 4) * 3 AS w, 6 AS h, doc_id % 3 + 2 AS nf
        FROM documents),
      sampled AS (
        SELECT doc_id, w, h, nf, f, f // 2 AS k
        FROM clips, UNNEST(RANGE(0, nf)) AS t(f)
        WHERE f % 2 = 0),
      px AS (
        SELECT doc_id, w, k,
               (w * h * 3 * k) + p AS wt,
               (doc_id * 7 + (f * w * h * 3 + p) * 13) % 251 AS v
        FROM sampled, UNNEST(RANGE(0, w * h * 3)) AS t2(p)),
      per_clip AS (
        SELECT doc_id, w,
               COUNT(DISTINCT k) AS nk,
               SUM(v) AS rs,
               SUM(wt * v) AS ws
        FROM px
        GROUP BY doc_id, w)
      SELECT CAST(c.w AS BIGINT) AS w,
             CAST(COUNT(*) AS BIGINT) AS n_clips,
             CAST(SUM(c.nf) AS BIGINT) AS n_frames_total,
             CAST(SUM(p.nk) AS BIGINT) AS n_frames_sampled,
             CAST(SUM(p.rs) AS BIGINT) AS rgb_sum,
             CAST(SUM(p.ws) AS BIGINT) AS rgb_wsum
      FROM clips c JOIN per_clip p ON c.doc_id = p.doc_id
      GROUP BY c.w
      ORDER BY w
    """)
  ) { t =>
    val spark = t.spark
    import spark.implicits._
    t.documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (4 + (id % 4) * 3).toInt
        val h = 6
        val nf = (id % 3 + 2).toInt
        val bytes = AviCodec.encode(25,
          (0 until nf).map(f => generate(id, w, h, f)))
        // total frame count from the container walk (validates avih/idx1)
        val clip = AviCodec.decode(bytes)
        require(clip.width == w && clip.height == h,
          s"AVI geometry mismatch: ${clip.width}x${clip.height}")
        var rs = 0L; var ws = 0L; var k = 0L
        var f = 0
        while (f < clip.frames.length) {
          if (f % 2 == 0) {
            // fetch through the index, not the walked vector — the
            // random-access path is the one under test
            val fr = AviCodec.frameAt(bytes, f)
            var p = 0
            while (p < fr.rgb.length) {
              val v = fr.rgb(p) & 0xff
              rs += v
              ws += (k * w * h * 3 + p) * v
              p += 1
            }
            k += 1
          }
          f += 1
        }
        AviStats(id, w.toLong, clip.frames.length.toLong, k, rs, ws)
      })
      .toDF()
      .groupBy(col("w"))
      .agg(
        count(lit(1)).as("n_clips"),
        sum(col("n_frames_total")).as("n_frames_total"),
        sum(col("n_frames_sampled")).as("n_frames_sampled"),
        sum(col("rgb_sum")).as("rgb_sum"),
        sum(col("rgb_wsum")).as("rgb_wsum"))
      .orderBy(col("w"))
  }

  /** Circular dHash of a decoded raster: grayscale box-downscale to an
    * 8×8 grid (integer division throughout), then bit gy·8+gx is set when
    * cell (gy,gx) is strictly brighter than its right neighbor
    * (wrapping) — 64 gradient bits, invariant to uniform brightness
    * shifts, the standard perceptual-hash key for image dedup.
    */
  def dhashOf(r: Raster): Long = {
    val (w, h) = (r.width, r.height)
    val sums = Array.ofDim[Long](8, 8)
    val cnts = Array.ofDim[Long](8, 8)
    var y = 0
    while (y < h) {
      val gy = y * 8 / h
      var x = 0
      while (x < w) {
        val gx = x * 8 / w
        val i = (y * w + x) * 3
        val gray = ((r.rgb(i) & 0xff) + (r.rgb(i + 1) & 0xff) +
          (r.rgb(i + 2) & 0xff)) / 3
        sums(gy)(gx) += gray
        cnts(gy)(gx) += 1
        x += 1
      }
      y += 1
    }
    val a = Array.tabulate(8, 8)((gy, gx) => sums(gy)(gx) / cnts(gy)(gx))
    var hv = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (a(gy)(gx) > a(gy)((gx + 1) % 8)) hv |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    hv
  }

  final case class ImageHash(media_id: Long, dhash: Long)

  // mm_image_dedup — perceptual-hash image dedup: decode the REAL
  // container bytes (P6 PPM / 24-bit BMP) per partition, compute the
  // circular 8×8 dHash, and bucket exact hash matches — the standard
  // first pass of image dedup at scale (pHash equality catches
  // re-encodes and brightness shifts that byte-hashing misses, before
  // any pairwise hamming stage). Per-image work is one decode + one
  // 64-bit key; the bucket stage is a plain hash aggregation, so the op
  // is a linear scan at any volume. The oracle recomputes every
  // gradient bit from the pixel generator — a codec bug that shifts one
  // channel byte flips hash bits and fails the gate.
  val imageDedup = Q(
    "mm_image_dedup",
    Some(s"""
      WITH media AS (
        SELECT doc_id, doc_id % 24 + 8 AS w, doc_id % 16 + 8 AS h
        FROM documents WHERE doc_id % 3 <> 2),
      px AS (
        SELECT doc_id, w, h, y.i AS y, x.i AS x,
               ((doc_id*7 + ((y.i*w + x.i)*3 + 0)*13) % 251
              + (doc_id*7 + ((y.i*w + x.i)*3 + 1)*13) % 251
              + (doc_id*7 + ((y.i*w + x.i)*3 + 2)*13) % 251) // 3 AS gray
        FROM media, UNNEST(RANGE(0, h)) AS y(i), UNNEST(RANGE(0, w)) AS x(i)),
      cells AS (
        SELECT doc_id, y*8//h AS gy, x*8//w AS gx, SUM(gray)//COUNT(*) AS a
        FROM px GROUP BY doc_id, y*8//h, x*8//w),
      bits AS (
        SELECT l.doc_id,
               CASE WHEN l.a > r.a THEN
                 CASE WHEN l.gy*8 + l.gx = 63 THEN -9223372036854775807 - 1
                      ELSE (1::BIGINT << (l.gy*8 + l.gx)) END
               ELSE 0 END AS bv
        FROM cells l JOIN cells r ON r.doc_id = l.doc_id AND r.gy = l.gy
                                 AND r.gx = (l.gx + 1) % 8),
      hashes AS (SELECT doc_id, SUM(bv)::BIGINT AS dhash FROM bits GROUP BY doc_id)
      SELECT dhash, CAST(COUNT(*) AS BIGINT) AS n_images,
             CAST(MIN(doc_id) AS BIGINT) AS min_media_id
      FROM hashes GROUP BY dhash
      ORDER BY n_images DESC, dhash LIMIT 20
    """)
  ) { t =>
    val spark = t.spark
    import spark.implicits._
    mediaOf(t)
      .filter(_.kind != "video")
      .mapPartitions(_.map { b =>
        val raster = b.kind match {
          case "image_ppm" => PpmCodec.decode(b.payload)
          case _           => BmpCodec.decode(b.payload)
        }
        ImageHash(b.media_id, dhashOf(raster))
      })
      .toDF()
      .groupBy(col("dhash"))
      .agg(count(lit(1)).cast(LongType).as("n_images"),
        min(col("media_id")).cast(LongType).as("min_media_id"))
      .orderBy(col("n_images").desc, col("dhash"))
      .limit(20)
  }

  /** Energy-profile audio fingerprint: channel-0 samples split into 16
    * equal windows (integer bounds), bit w set when window w's energy
    * strictly exceeds its right neighbor (wrapping) — the audio sibling
    * of [[dhashOf]]: gain-shape invariant, 16 bits per clip.
    */
  def audioFpOf(clip: Pcm): Long = {
    val nch = clip.channels
    val ns = clip.samples.length / nch
    val e = new Array[Long](16)
    var s = 0
    while (s < ns) {
      val v = clip.samples(s * nch).toLong
      e(s * 16 / ns) += v * v
      s += 1
    }
    var fp = 0L
    var w = 0
    while (w < 16) {
      if (e(w) > e((w + 1) % 16)) fp |= 1L << w
      w += 1
    }
    fp
  }

  /** Corpus-size-derived banding step for the media near-dup lanes: a
    * 64-bit perceptual fingerprint splits into `mediaBands` disjoint
    * sub-bands (4×16-bit below 2²³ clips, 2×32-bit at/above), and clips
    * sharing any sub-band value are candidates. Same law as
    * Dedup.simhashBands / VectorLsh.planesFor: banded candidates are
    * ~n²/2^width per band, so the key space must grow with the corpus —
    * 16-bit bands hold expected candidate volume ≤ ~64·n up to n = 2²³,
    * where the step widens to 32 bits. Recall guarantee by pigeonhole:
    * 4 bands always catch hamming ≤ 3 (covering both verify radii —
    * audio ≤ 2, closing the r15 2-band recall hole; video frame-match
    * ≤ 3); above the step, 2 bands guarantee ≤ 1 — the documented
    * simhash trade, with extra bands as the recall lever. SQL mirror
    * below so oracle and engine can never drift.
    */
  def mediaBands(corpusSize: Long): Int = if (corpusSize < 8388608L) 4 else 2

  /** SQL mirror of [[mediaBands]] as a 1-row CTE over `documents`. */
  private val mediaBandsSqlCte =
    "mb AS (SELECT CASE WHEN COUNT(*) < 8388608 THEN 4 ELSE 2 END AS nb FROM documents)"

  /** 64-window count-normalized energy fingerprint — mm_audio_neardup's
    * banding key. Bit w compares adjacent window energies
    * cross-multiplied by the OPPOSITE window's sample count
    * (e_w·c_{w+1} > e_{w+1}·c_w, exact integers): window sample counts
    * differ by ±1 at the integer boundaries, and on a near-stationary
    * signal that count bias — not content — dominated the raw
    * comparison (the r15 finding: biased, correlated bits collapsed the
    * effective key space, so the banded join went quadratic regardless
    * of nominal band width — 347×/decade at gsf10). Count-normalizing
    * leaves content-driven near-fair bits; uniform gain scales every
    * e_w equally, so the key keeps [[audioFpOf]]'s gain invariance.
    * 64 bits, channel 0 only. [[audioFpOf]] stays 16-bit: it is
    * mm_audio_dedup's EXACT-match key and its CodecSpec pins hold.
    */
  def audioNdFpOf(clip: Pcm): Long = {
    val nch = clip.channels
    val ns = clip.samples.length / nch
    val e = new Array[Long](64)
    val c = new Array[Long](64)
    var s = 0
    while (s < ns) {
      val v = clip.samples(s * nch).toLong
      val w = (s.toLong * 64 / ns).toInt
      e(w) += v * v
      c(w) += 1
      s += 1
    }
    var fp = 0L
    var w = 0
    while (w < 64) {
      val w2 = (w + 1) % 64
      if (e(w) * c(w2) > e(w2) * c(w)) fp |= 1L << w
      w += 1
    }
    fp
  }

  /** mm_audio_neardup's clip synthesis: cluster-keyed content with
    * PLANTED near-duplicates. Clips in a cluster of four (doc_id // 4)
    * share channel layout, length and base samples; values come from a
    * portable quadratic congruential mix — square the linear
    * (cl, j)-seed modulo the Mersenne prime 2³¹−1 — so sample streams
    * genuinely diffuse per cluster, unlike the old doc_id·7 + j·13
    * progression (a pure phase shift of one mod-4001 cycle, whose
    * window energies any fingerprint collapses to a few classes).
    * Exact integer arithmetic, Long-safe (h < 2³¹ ⇒ h² < 2⁶²), and the
    * oracle replays it verbatim. Variant
    * r ≥ 1 re-gains ONE window (×3), flipping at most the two adjacent
    * comparison bits: planted pairs sit at hamming ≤ 2, exactly the
    * verify radius. ns ≥ 128 keeps every one of the 64 windows ≥ 2
    * samples.
    */
  def generatePcmNd(id: Long): Pcm = {
    val cl = id / 4
    val r = (id % 4).toInt
    val nch = (cl % 2 + 1).toInt
    val ns = (128 + (cl * 131071) % 512).toInt
    val n = ns * nch
    val boosted = (r * 19) % 64
    val s = new Array[Short](n)
    var j = 0
    while (j < n) {
      val h = (cl * 48271 + j.toLong * 16807 + 11) % 2147483647L
      val vb = (h * h) % 2147483647L % 4001 - 2000
      val w = ((j / nch).toLong * 64 / ns).toInt
      s(j) = (if (r >= 1 && w == boosted) vb * 3 else vb).toShort
      j += 1
    }
    Pcm(nch, 8000, s)
  }

  final case class AudioFp(media_id: Long, fp: Long)

  // mm_audio_dedup — energy-profile audio fingerprinting over the REAL
  // WAV lane: decode the RIFF bytes per partition, fingerprint channel
  // 0's 16-window energy shape (strict right-neighbor comparisons,
  // wrapping), bucket exact fingerprint matches — the duplicate-audio
  // first pass, robust to uniform gain because only energy ORDER enters
  // the key. Stride-aware by construction: fingerprinting channel 0 of
  // the interleaved stream catches the interleave bugs whole-stream
  // statistics mask (the mm_audio lesson applied to retrieval). One
  // decode + one 16-bit key per clip, then a hash aggregation.
  val audioDedup = Q(
    "mm_audio_dedup",
    Some("""
      WITH clips AS (
        SELECT doc_id, CAST(doc_id % 2 + 1 AS BIGINT) AS nch,
               (doc_id % 500 + 100) - (doc_id % 500 + 100) % (doc_id % 2 + 1) AS n
        FROM documents),
      ch0 AS (
        SELECT doc_id, j // nch AS s, n // nch AS ns,
               (doc_id*7 + j*13) % 4001 - 2000 AS v
        FROM clips, UNNEST(RANGE(0, n)) AS t(j)
        WHERE j % nch = 0),
      wins AS (
        SELECT doc_id, (s * 16) // ns AS w, SUM(v * v) AS e
        FROM ch0 GROUP BY doc_id, (s * 16) // ns),
      bits AS (
        SELECT l.doc_id,
               CASE WHEN l.e > r.e THEN (1::BIGINT << l.w) ELSE 0 END AS bv
        FROM wins l JOIN wins r ON r.doc_id = l.doc_id AND r.w = (l.w + 1) % 16),
      hashes AS (SELECT doc_id, SUM(bv)::BIGINT AS fp FROM bits GROUP BY doc_id)
      SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_clips,
             CAST(MIN(doc_id) AS BIGINT) AS min_media_id
      FROM hashes GROUP BY fp
      ORDER BY n_clips DESC, fp LIMIT 20
    """)
  ) { t =>
    val spark = t.spark
    import spark.implicits._
    t.documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val channels = (id % 2 + 1).toInt
        val n = (id % 500 + 100).toInt
        val clip = WavCodec.decode(WavCodec.encode(generatePcm(id, channels, n)))
        AudioFp(id, audioFpOf(clip))
      })
      .toDF()
      .groupBy(col("fp"))
      .agg(count(lit(1)).cast(LongType).as("n_clips"),
        min(col("media_id")).cast(LongType).as("min_media_id"))
      .orderBy(col("n_clips").desc, col("fp"))
      .limit(20)
  }

  final case class VideoFp(media_id: Long, fp: Long)

  /** Temporal clip fingerprint: per frame an 8-bit spatial signature
    * (luma row sums compared to the wrapping right neighbor — the video
    * sibling of [[dhashOf]]: brightness-shift invariant, since a uniform
    * +c moves every row sum equally), combined across frames in temporal
    * order as a base-31 polynomial — so frame ORDER enters the key, not
    * just the frame multiset.
    */
  /** One frame's 8-bit spatial signature: luma row-band sums compared to
    * the wrapping next band (brightness-shift invariant — a uniform +c
    * moves every sum equally). Shared by the temporal-polynomial clip
    * key ([[videoFpOf]]) and mm_video_quality's frozen-frame screen;
    * mm_video_neardup's per-frame banding key is the 64-bit
    * [[lumaDhashOf]].
    */
  def frameSigOf(fr: Array[Byte], width: Int, height: Int): Long = {
    val rs = new Array[Long](8)
    var p = 0
    while (p < fr.length) {
      // 8 row bands; for the h=8 clips in the registry band == row,
      // which is exactly the oracle's p // w
      rs((p / width) * 8 / height) += (fr(p) & 0xff).toLong
      p += 1
    }
    var sig = 0L
    var r = 0
    while (r < 8) {
      if (rs(r) > rs((r + 1) % 8)) sig |= 1L << r
      r += 1
    }
    sig
  }

  /** Single-channel (luma) circular dHash — [[dhashOf]] on a Y plane:
    * 8×8 box-downscale with integer division, bit gy·8+gx set when cell
    * (gy,gx)'s average strictly exceeds its wrapping right neighbor's.
    * Brightness-shift invariant like the RGB dHash. mm_video_neardup's
    * per-frame banding key (r14/r15: the 8- then 16-bit row/column
    * signature keys saturated — any signature of the old
    * arithmetic-progression frames had ≤ ~750 distinct values, so
    * banded candidates were n²/phases, 71×/decade at gsf10; the 64-bit
    * dHash over [[generateLumaNd]]'s cluster-mixed frames gives the
    * banded join a real key space). [[videoFpOf]]'s
    * temporal-polynomial key keeps the 8-bit row signature — its key
    * space is already 31-ary-polynomial-wide.
    */
  def lumaDhashOf(fr: Array[Byte], width: Int, height: Int): Long = {
    val sums = Array.ofDim[Long](8, 8)
    val cnts = Array.ofDim[Long](8, 8)
    var p = 0
    while (p < fr.length) {
      val gy = (p / width) * 8 / height
      val gx = (p % width) * 8 / width
      sums(gy)(gx) += (fr(p) & 0xff).toLong
      cnts(gy)(gx) += 1
      p += 1
    }
    var hv = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        val a = sums(gy)(gx) / cnts(gy)(gx)
        val b = sums(gy)((gx + 1) % 8) / cnts(gy)((gx + 1) % 8)
        if (a > b) hv |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    hv
  }

  /** mm_video_neardup's frame synthesis — [[generatePcmNd]]'s design on
    * the luma lane: clusters of four (doc_id // 4) share geometry,
    * frame count and base pixels, valued by the same squared
    * (cl, q)-seed mix modulo 2³¹−1 — real diffusion, where the old
    * arithmetic-progression frames collapsed every derivable signature
    * to ≤ ~750 classes (r15) and a LINEAR cluster mix still made
    * adjacent-pixel gradients near-constant (one effective bit per
    * dHash, caught in the r16 rewrite); variant r ≥ 1
    * perturbs the first two columns of ONE frame ((r−1) mod nf),
    * leaving every other frame hash-identical.
    */
  def generateLumaNd(cl: Long, r: Int, width: Int, height: Int, f: Int,
    nf: Int): Array[Byte] = {
    val n = width * height
    val y = new Array[Byte](n)
    val perturbed = r >= 1 && f == (r - 1) % nf
    var p = 0
    while (p < n) {
      val q = f.toLong * n + p
      val h = (cl * 48271 + q * 16807 + 11) % 2147483647L
      val base = (h * h) % 2147483647L % 251
      val v = if (perturbed && p % width < 2) (base + 101) % 251 else base
      y(p) = v.toByte
      p += 1
    }
    y
  }

  def videoFpOf(clip: Y4m): Long = {
    var fp = 0L
    clip.frames.foreach { fr =>
      fp = fp * 31 + frameSigOf(fr, clip.width, clip.height)
    }
    fp
  }

  // mm_video_dedup — temporal fingerprinting over the REAL Y4M lane: the
  // third retrieval lane beside mm_image_dedup (spatial) and
  // mm_audio_dedup (energy order). Each decoded frame reduces to an
  // 8-bit SPATIAL signature (wrapping comparisons of the 8 luma row
  // sums — brightness-shift-invariant like the image dHash), and the
  // clip key is the base-31 polynomial combine of the per-frame
  // signatures in TEMPORAL order — so two clips collide only when their
  // whole frame sequence matches, and a reordered/dropped frame changes
  // the key (what a bag-of-frames hash cannot see). One decode + one
  // 64-bit key per clip, then a hash aggregation; the oracle replays
  // every row sum, comparison bit and polynomial term from the pixel
  // generator, with the polynomial as a closed-form POWER sum (no
  // sequential fold needed — frame index is data, not state).
  val videoDedup = Q(
    "mm_video_dedup",
    Some("""
      WITH clips AS (
        SELECT doc_id, 8 + (doc_id % 3) * 4 AS w, 8 AS h, doc_id % 4 + 2 AS nf
        FROM documents),
      px AS (
        SELECT doc_id, w, h, nf, f, p // w AS r,
               (doc_id * 7 + (f * w * h + p) * 13) % 251 AS v
        FROM clips, UNNEST(RANGE(0, nf)) AS t(f), UNNEST(RANGE(0, w * h)) AS t2(p)),
      rows_ AS (
        SELECT doc_id, nf, f, r, SUM(v) AS rs
        FROM px GROUP BY doc_id, nf, f, r),
      bits AS (
        SELECT l.doc_id, l.nf, l.f,
               CASE WHEN l.rs > rr.rs THEN (1::BIGINT << l.r) ELSE 0 END AS bv
        FROM rows_ l JOIN rows_ rr
          ON rr.doc_id = l.doc_id AND rr.f = l.f AND rr.r = (l.r + 1) % 8),
      sigs AS (
        SELECT doc_id, nf, f, SUM(bv) AS sig
        FROM bits GROUP BY doc_id, nf, f),
      fps AS (
        SELECT doc_id,
               CAST(SUM(sig * CAST(POWER(31, nf - 1 - f) AS BIGINT)) AS BIGINT) AS fp
        FROM sigs GROUP BY doc_id)
      SELECT fp, CAST(COUNT(*) AS BIGINT) AS n_clips,
             CAST(MIN(doc_id) AS BIGINT) AS min_media_id
      FROM fps GROUP BY fp
      ORDER BY n_clips DESC, fp LIMIT 20
    """)
  ) { t =>
    val spark = t.spark
    import spark.implicits._
    t.documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (8 + (id % 3) * 4).toInt
        val h = 8
        val nf = (id % 4 + 2).toInt
        val clip = Y4mCodec.decode(Y4mCodec.encode(w, h, 30, 1,
          (0 until nf).map(f => generateLuma(id, w, h, f))))
        VideoFp(id, videoFpOf(clip))
      })
      .toDF()
      .groupBy(col("fp"))
      .agg(count(lit(1)).cast(LongType).as("n_clips"),
        min(col("media_id")).cast(LongType).as("min_media_id"))
      .orderBy(col("n_clips").desc, col("fp"))
      .limit(20)
  }

  /** Per-clip scene-cut statistics (exact integers). */
  final case class SceneCutStats(media_id: Long, w: Long, n_frames: Long,
    n_cuts: Long, n_keyframes: Long, key_luma_wsum: Long)

  // mm_scene_cut — keyframe selection by scene-change detection, the
  // step a video training-data pipeline runs between frame decode and
  // captioning/dedup: decode the REAL Y4M container, compute each
  // frame's luma sum, declare a CUT where the absolute luma delta
  // between consecutive frames exceeds the threshold, and keep frame 0
  // plus every post-cut frame as keyframes. Statistics are exact — cut
  // and keyframe counts plus a (frame-position+1)-weighted luma
  // checksum over the KEPT frames only, so a cut placed one frame off
  // fails the oracle, which replays every luma byte from the shared
  // generator. Scale shape: decode + detection are per-clip inside one
  // mapPartitions (no shuffle until the final small groupBy on width) —
  // detection state is two longs per clip regardless of frame count.
  val sceneCut = Q(
    "mm_scene_cut",
    Some("""
      WITH clips AS (
        SELECT doc_id, 8 + (doc_id % 3) * 4 AS w, 8 AS h, doc_id % 6 + 3 AS nf
        FROM documents),
      fr AS (
        SELECT doc_id, w, nf, f,
               SUM((doc_id * 7 + (f * w * h + p) * 13) % 251) AS s
        FROM clips, UNNEST(RANGE(0, nf)) AS t(f),
                    UNNEST(RANGE(0, w * h)) AS t2(p)
        GROUP BY doc_id, w, nf, f),
      keyed AS (
        SELECT doc_id, w, nf, f, s,
               CASE WHEN f = 0 THEN 1
                    WHEN ABS(s - LAG(s) OVER (PARTITION BY doc_id
                                              ORDER BY f)) > 500 THEN 1
                    ELSE 0 END AS is_key
        FROM fr),
      per_clip AS (
        SELECT doc_id, w, MAX(nf) AS nf,
               SUM(CASE WHEN is_key = 1 AND f > 0 THEN 1 ELSE 0 END) AS n_cuts,
               SUM(is_key) AS n_keys,
               SUM(CASE WHEN is_key = 1 THEN s * (f + 1) ELSE 0 END) AS kw
        FROM keyed GROUP BY doc_id, w)
      SELECT CAST(w AS BIGINT) AS w,
             CAST(COUNT(*) AS BIGINT) AS n_clips,
             CAST(SUM(nf) AS BIGINT) AS n_frames,
             CAST(SUM(n_cuts) AS BIGINT) AS n_cuts,
             CAST(SUM(n_keys) AS BIGINT) AS n_keyframes,
             CAST(SUM(kw) AS BIGINT) AS key_luma_wsum
      FROM per_clip
      GROUP BY w
      ORDER BY w
    """)
  ) { t =>
    val spark = t.spark
    import spark.implicits._
    val threshold = 500L
    t.documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (8 + (id % 3) * 4).toInt
        val h = 8
        val nf = (id % 6 + 3).toInt
        val clip = Y4mCodec.decode(Y4mCodec.encode(w, h, 30, 1,
          (0 until nf).map(f => generateLuma(id, w, h, f))))
        require(clip.frames.length == nf, s"Y4M frame-count mismatch")
        var prev = 0L
        var cuts = 0L; var keys = 0L; var kw = 0L
        var f = 0
        while (f < clip.frames.length) {
          val fr = clip.frames(f)
          var s = 0L
          var p = 0
          while (p < fr.length) { s += fr(p) & 0xff; p += 1 }
          val isKey = f == 0 || math.abs(s - prev) > threshold
          if (isKey) {
            keys += 1
            kw += s * (f + 1)
            if (f > 0) cuts += 1
          }
          prev = s
          f += 1
        }
        SceneCutStats(id, w.toLong, nf.toLong, cuts, keys, kw)
      })
      .toDF()
      .groupBy(col("w"))
      .agg(
        count(lit(1)).as("n_clips"),
        sum(col("n_frames")).as("n_frames"),
        sum(col("n_cuts")).as("n_cuts"),
        sum(col("n_keyframes")).as("n_keyframes"),
        sum(col("key_luma_wsum")).as("key_luma_wsum"))
      .orderBy(col("w"))
  }

  /** Per-clip voice-activity statistics (exact integers). */
  final case class VadStats(media_id: Long, n_channels: Long, n_ch0: Long,
    n_voiced: Long, n_segments: Long, seg_checksum: Long)

  // mm_audio_vad — energy-threshold voice-activity detection, the
  // silence-trimming step an audio training-data pipeline runs between
  // decode and transcription: decode the REAL WAV container, walk
  // channel 0, mark samples with |amplitude| ≥ 1000 as voiced, and
  // count maximal voiced RUNS (segments). Exact statistics — voiced
  // and segment counts plus a (start-position+1)-sum checksum, so a
  // run boundary off by one sample fails the oracle, which replays
  // every amplitude from the shared generator. Detection state is one
  // boolean per clip inside one mapPartitions pass (the same
  // two-longs-per-item shape as mm_scene_cut).
  val audioVad = Q(
    "mm_audio_vad",
    Some("""
      WITH clips AS (
        SELECT doc_id,
               CAST(doc_id % 2 + 1 AS BIGINT) AS ch,
               (doc_id % 500 + 100) - (doc_id % 500 + 100) % (doc_id % 2 + 1)
                 AS n_samples
        FROM documents),
      ch0 AS (
        SELECT doc_id, ch, n_samples // ch AS n_ch0, k,
               ABS((doc_id * 7 + (k * ch) * 13) % 4001 - 2000) >= 1000
                 AS voiced
        FROM clips, UNNEST(RANGE(0, n_samples // ch)) AS t(k)),
      runs AS (
        SELECT doc_id, ch, n_ch0, k, voiced,
               CASE WHEN voiced AND NOT COALESCE(
                 LAG(voiced) OVER (PARTITION BY doc_id ORDER BY k), FALSE)
               THEN 1 ELSE 0 END AS is_start
        FROM ch0),
      per_clip AS (
        SELECT doc_id, ch, MAX(n_ch0) AS n_ch0,
               SUM(CASE WHEN voiced THEN 1 ELSE 0 END) AS n_voiced,
               SUM(is_start) AS n_segments,
               SUM(CASE WHEN is_start = 1 THEN k + 1 ELSE 0 END) AS cks
        FROM runs GROUP BY doc_id, ch)
      SELECT ch AS n_channels,
             CAST(COUNT(*) AS BIGINT) AS n_clips,
             CAST(SUM(n_ch0) AS BIGINT) AS n_ch0,
             CAST(SUM(n_voiced) AS BIGINT) AS n_voiced,
             CAST(SUM(n_segments) AS BIGINT) AS n_segments,
             CAST(SUM(cks) AS BIGINT) AS seg_checksum
      FROM per_clip
      GROUP BY ch
      ORDER BY ch
    """)
  ) { t =>
    val spark = t.spark
    import spark.implicits._
    val threshold = 1000
    t.documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val channels = (id % 2 + 1).toInt
        val n = (id % 500 + 100).toInt
        val clip = WavCodec.decode(WavCodec.encode(
          generatePcm(id, channels, n)))
        var prev = false
        var voiced = 0L; var segs = 0L; var cks = 0L
        var k = 0
        val nCh0 = clip.samples.length / clip.channels
        while (k < nCh0) {
          val v = clip.samples(k * clip.channels).toInt
          val vo = math.abs(v) >= threshold
          if (vo) {
            voiced += 1
            if (!prev) { segs += 1; cks += k + 1 }
          }
          prev = vo
          k += 1
        }
        VadStats(id, channels.toLong, nCh0.toLong, voiced, segs, cks)
      })
      .toDF()
      .groupBy(col("n_channels"))
      .agg(
        count(lit(1)).as("n_clips"),
        sum(col("n_ch0")).as("n_ch0"),
        sum(col("n_voiced")).as("n_voiced"),
        sum(col("n_segments")).as("n_segments"),
        sum(col("seg_checksum")).as("seg_checksum"))
      .orderBy(col("n_channels"))
  }

  /** Per-image letterbox detection readout (exact integers). */
  final case class LetterboxStats(kind: String, bars_top: Long,
    bars_bottom: Long, letterboxed: Long, content_wsum: Long)

  /** Raster with `bars = id % 4` near-black rows injected at the top
    * and bottom (values (id+j) % 3 ≤ 2) around the standard generator's
    * content — the deterministic letterbox the oracle replays.
    */
  private def letterboxRaster(id: Long, w: Int, h: Int): Raster = {
    val bars = (id % 4).toInt
    val n = w * h * 3
    val rgb = new Array[Byte](n)
    var j = 0
    while (j < n) {
      val row = j / (w * 3)
      rgb(j) =
        (if (row < bars || row >= h - bars) ((id + j) % 3).toInt
         else pixel(id, j)).toByte
      j += 1
    }
    Raster(w, h, rgb)
  }

  // mm_letterbox — black-bar (letterbox/pillarbox) detection on the
  // image lane, the crop-before-training QC step a vision pipeline runs
  // so padding bars don't dilute the signal. Deterministic letterboxed
  // rasters round-trip through the REAL containers (P6 PPM / 24-bit
  // BMP, whose bottom-up row order + row padding must be undone
  // correctly for bar positions to survive), then the detector works
  // from decoded bytes alone: a row is "black" iff its RGB sum < 9·w
  // (bar rows sum ≤ 6w; generator content rows are orders of magnitude
  // above), bars_top = first non-black row, bars_bottom counts from the
  // last. The content checksum Σ v·(j+1) over NON-black rows proves
  // the crop is positioned exactly — one row off fails the oracle,
  // which replays every pixel from the shared generator formula.
  // Scale shape: one decode + one O(pixels) scan per image inside
  // mapPartitions (constant state), then a map-side groupBy on the
  // 2-value kind. No shuffle carries pixels.
  val letterbox = Q(
    "mm_letterbox",
    Some("""
      WITH imgs AS (
        SELECT doc_id, CAST(doc_id % 24 + 8 AS BIGINT) AS w,
               CAST(doc_id % 16 + 8 AS BIGINT) AS h,
               CASE WHEN doc_id % 3 = 0 THEN 'image_ppm'
                    ELSE 'image_bmp' END AS kind,
               doc_id % 4 AS bars
        FROM documents WHERE doc_id % 3 <> 2),
      px AS (
        SELECT doc_id, kind, w, h, j, j // (w * 3) AS rw_row,
               CASE WHEN j // (w * 3) < bars OR j // (w * 3) >= h - bars
                    THEN (doc_id + j) % 3
                    ELSE (doc_id * 7 + j * 13) % 251 END AS v
        FROM imgs, UNNEST(RANGE(0, w * h * 3)) AS t(j)),
      rws AS (
        SELECT doc_id, kind, MAX(h) AS h, MAX(w) AS w, rw_row,
               SUM(v) AS rs, SUM(v * (j + 1)) AS rww
        FROM px GROUP BY doc_id, kind, rw_row),
      per_img AS (
        SELECT doc_id, kind, MAX(h) AS h,
               MIN(CASE WHEN rs >= 9 * w THEN rw_row END) AS top,
               MAX(CASE WHEN rs >= 9 * w THEN rw_row END) AS bot,
               SUM(CASE WHEN rs >= 9 * w THEN rww ELSE 0 END) AS cw
        FROM rws GROUP BY doc_id, kind)
      SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_images,
             CAST(SUM(CASE WHEN top > 0 OR bot < h - 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_letterboxed,
             CAST(SUM(top) AS BIGINT) AS bars_top,
             CAST(SUM(h - 1 - bot) AS BIGINT) AS bars_bottom,
             CAST(SUM(cw) AS BIGINT) AS content_wsum
      FROM per_img GROUP BY kind ORDER BY kind
    """)
  ) { t =>
    val spark = t.spark
    import spark.implicits._
    t.documents.select(col("doc_id")).where(col("doc_id") % 3 =!= 2)
      .as[Long]
      .mapPartitions(_.map { id =>
        val (w, h) = dims(id)
        val raster = letterboxRaster(id, w, h)
        val (kind, decoded) =
          if (id % 3 == 0) ("image_ppm", PpmCodec.decode(PpmCodec.encode(raster)))
          else ("image_bmp", BmpCodec.decode(BmpCodec.encode(raster)))
        require(decoded.width == w && decoded.height == h,
          s"codec round-trip dims mismatch for $id")
        // detector: first/last content row from decoded bytes alone
        var top = -1; var bot = -1; var cw = 0L
        var row = 0
        while (row < h) {
          var rs = 0L; var rww = 0L
          var k = row * w * 3
          val end = (row + 1) * w * 3
          while (k < end) {
            val v = decoded.rgb(k) & 0xff
            rs += v; rww += v.toLong * (k + 1); k += 1
          }
          if (rs >= 9L * w) {
            if (top < 0) top = row
            bot = row
            cw += rww
          }
          row += 1
        }
        LetterboxStats(kind, top.toLong, (h - 1 - bot).toLong,
          if (top > 0 || bot < h - 1) 1L else 0L, cw)
      })
      .toDF()
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_images"),
        sum(col("letterboxed")).cast("long").as("n_letterboxed"),
        sum(col("bars_top")).cast("long").as("bars_top"),
        sum(col("bars_bottom")).cast("long").as("bars_bottom"),
        sum(col("content_wsum")).cast("long").as("content_wsum"))
      .orderBy(col("kind"))
  }

  /** Per-clip resampled-audio statistics (exact integers). */
  final case class ResampleStats(media_id: Long, n_channels: Int,
    in_samples: Long, out_samples: Long, amp_sum_out: Long,
    energy_out: Long, checksum: Long)

  // mm_audio_resample — sample-rate conversion on the real WAV lane
  // (8000 → 4000 Hz by integer 2:1 decimation with a 2-tap boxcar
  // anti-alias prefilter: y[k,c] = floor((x[2k,c] + x[2k+1,c]) / 2) per
  // channel, FRAME-wise — stride-aware like mm_audio's amp_sum_ch0, so
  // an interleaving mistake shifts every output sample and fails the
  // checksum). The /2 is TRUNCATING division on both sides — Scala `/`
  // and DuckDB `//` both truncate toward zero (verified on negative
  // sums this round; floorDiv would diverge on every negative odd
  // sum). An odd trailing frame is
  // dropped (output length = frames div 2 per channel). Statistics are
  // exact: per-channel-layout clip counts, in/out sample volumes, the
  // resampled amplitude/energy sums, and a position-weighted checksum
  // Σ y·(k+1) that pins output ORDER, not just its multiset. The
  // oracle replays every resampled sample from the PCM generator.
  val audioResample = Q(
    "mm_audio_resample",
    Some("""
      WITH clips AS (
        SELECT doc_id, ch, n_raw - n_raw % ch AS n_samples
        FROM (SELECT doc_id,
                CAST(doc_id % 2 + 1 AS INT) AS ch,
                doc_id % 500 + 100 AS n_raw
              FROM documents)),
      frames AS (
        SELECT doc_id, ch, n_samples, n_samples // ch AS nf FROM clips),
      y AS (
        SELECT doc_id, ch, n_samples, k,
               (((doc_id * 7 + (2*k*ch + c) * 13) % 4001 - 2000)
                + ((doc_id * 7 + ((2*k+1)*ch + c) * 13) % 4001 - 2000)) // 2
                 AS yv
        FROM frames,
             UNNEST(RANGE(0, nf // 2)) AS t(k),
             UNNEST(RANGE(0, ch)) AS t2(c)),
      per_clip AS (
        SELECT doc_id, ch, MIN(n_samples) AS in_samples,
               COUNT(*) AS out_samples,
               SUM(yv) AS amp_sum_out,
               SUM(yv * yv) AS energy_out,
               SUM(yv * (k + 1)) AS checksum
        FROM y GROUP BY doc_id, ch)
      SELECT ch AS n_channels,
             CAST(COUNT(*) AS BIGINT) AS n_clips,
             CAST(SUM(in_samples) AS BIGINT) AS in_samples,
             CAST(SUM(out_samples) AS BIGINT) AS out_samples,
             CAST(SUM(amp_sum_out) AS BIGINT) AS amp_sum_out,
             CAST(SUM(energy_out) AS BIGINT) AS energy_out,
             CAST(SUM(checksum) AS BIGINT) AS checksum
      FROM per_clip
      GROUP BY ch
      ORDER BY n_channels
    """)
  ) { t =>
    val spark = t.spark
    import spark.implicits._
    t.documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val channels = (id % 2 + 1).toInt
        val n = (id % 500 + 100).toInt
        val clip = WavCodec.decode(WavCodec.encode(generatePcm(id, channels, n)))
        val ch = clip.channels
        val outFrames = (clip.samples.length / ch) / 2
        var amp = 0L; var energy = 0L; var chk = 0L
        var k = 0
        while (k < outFrames) {
          var c = 0
          while (c < ch) {
            val a = clip.samples((2 * k) * ch + c).toLong
            val b = clip.samples((2 * k + 1) * ch + c).toLong
            val y = (a + b) / 2
            amp += y; energy += y * y; chk += y * (k + 1)
            c += 1
          }
          k += 1
        }
        ResampleStats(id, ch, clip.samples.length.toLong,
          outFrames.toLong * ch, amp, energy, chk)
      })
      .toDF()
      .groupBy(col("n_channels"))
      .agg(
        count(lit(1)).as("n_clips"),
        sum(col("in_samples")).as("in_samples"),
        sum(col("out_samples")).as("out_samples"),
        sum(col("amp_sum_out")).as("amp_sum_out"),
        sum(col("energy_out")).as("energy_out"),
        sum(col("checksum")).as("checksum"))
      .orderBy(col("n_channels"))
  }

  // mm_image_neardup — hamming-radius image near-duplication over the
  // same 64-bit circular dHash mm_image_dedup buckets exactly: the
  // CLIP-era image-dedup primitive (re-encodes/minor edits flip a few
  // gradient bits, so exact-hash buckets miss them). Scale shape is
  // the simhash banding family's: 4×16-bit bands → candidate pairs
  // share a band bucket (never an all-pairs pass), verify with a
  // codegen'd popcount on the XOR, flag at hamming ≤ 6. Band
  // extraction is shift+mask, identical under arithmetic or logical
  // fill once masked. Oracle replays every gradient bit from the
  // pixel generator, then the same banded join.
  val imageNearDup = Q(
    "mm_image_neardup",
    Some(s"""
      WITH media AS (
        SELECT doc_id, doc_id % 24 + 8 AS w, doc_id % 16 + 8 AS h
        FROM documents WHERE doc_id % 3 <> 2),
      px AS (
        SELECT doc_id, w, h, y.i AS y, x.i AS x,
               ((doc_id*7 + ((y.i*w + x.i)*3 + 0)*13) % 251
              + (doc_id*7 + ((y.i*w + x.i)*3 + 1)*13) % 251
              + (doc_id*7 + ((y.i*w + x.i)*3 + 2)*13) % 251) // 3 AS gray
        FROM media, UNNEST(RANGE(0, h)) AS y(i), UNNEST(RANGE(0, w)) AS x(i)),
      cells AS (
        SELECT doc_id, y*8//h AS gy, x*8//w AS gx, SUM(gray)//COUNT(*) AS a
        FROM px GROUP BY doc_id, y*8//h, x*8//w),
      bits AS (
        SELECT l.doc_id,
               CASE WHEN l.a > r.a THEN
                 CASE WHEN l.gy*8 + l.gx = 63 THEN -9223372036854775807 - 1
                      ELSE (1::BIGINT << (l.gy*8 + l.gx)) END
               ELSE 0 END AS bv
        FROM cells l JOIN cells r ON r.doc_id = l.doc_id AND r.gy = l.gy
                                 AND r.gx = (l.gx + 1) % 8),
      hashes AS (SELECT doc_id, SUM(bv)::BIGINT AS dhash FROM bits GROUP BY doc_id),
      bands AS (
        SELECT doc_id, dhash, b.i AS band,
               (dhash >> (16 * b.i)) & 65535 AS bval
        FROM hashes, UNNEST(RANGE(0, 4)) AS b(i)),
      cand AS (
        SELECT DISTINCT a.doc_id AS i, b.doc_id AS j,
               BIT_COUNT(XOR(a.dhash, b.dhash)) AS ham
        FROM bands a JOIN bands b
          ON b.band = a.band AND b.bval = a.bval AND b.doc_id > a.doc_id)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
             CAST(COUNT(CASE WHEN ham <= 6 THEN 1 END) AS BIGINT) AS n_neardup,
             CAST(COALESCE(SUM(CASE WHEN ham <= 6 THEN ham END), 0) AS BIGINT) AS ham_sum,
             CAST(COALESCE(SUM(CASE WHEN ham <= 6 THEN i + j END), 0) AS BIGINT) AS id_checksum
      FROM cand
    """)
  ) { t =>
    val spark = t.spark
    import spark.implicits._
    val hashes = mediaOf(t)
      .filter(_.kind != "video")
      .mapPartitions(_.map { b =>
        val raster = b.kind match {
          case "image_ppm" => PpmCodec.decode(b.payload)
          case _           => BmpCodec.decode(b.payload)
        }
        ImageHash(b.media_id, dhashOf(raster))
      })
      .toDF()
    val bands = hashes
      .select(col("media_id"), col("dhash"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bval",
        expr("shiftrightunsigned(dhash, 16 * band)").bitwiseAND(lit(65535L)))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("b.band") === col("a.band") && col("b.bval") === col("a.bval") &&
          col("b.media_id") > col("a.media_id"))
      .select(col("a.media_id").as("i"), col("b.media_id").as("j"),
        expr("bit_count(a.dhash ^ b.dhash)").cast(LongType).as("ham"))
      .distinct()
    cand.agg(
      count(lit(1)).as("n_candidates"),
      count(when(col("ham") <= 6, 1)).as("n_neardup"),
      coalesce(sum(when(col("ham") <= 6, col("ham"))), lit(0L))
        .cast(LongType).as("ham_sum"),
      coalesce(sum(when(col("ham") <= 6, col("i") + col("j"))), lit(0L))
        .cast(LongType).as("id_checksum"))
  }

  // mm_audio_neardup — hamming-radius audio near-duplication over the
  // 64-window count-normalized energy fingerprint ([[audioNdFpOf]]: a
  // re-gain or mild re-encode flips a window bit or two;
  // mm_audio_dedup's exact buckets miss them), banded with the
  // corpus-size-derived [[mediaBands]] step: 4×16-bit sub-bands below
  // 2²³ clips — pigeonhole catches hamming ≤ 3, covering the ≤ 2
  // verify radius and closing r15's 2-band recall hole — 2×32 above
  // (guarantee ≤ 1, the documented simhash trade). r14/r15 history:
  // the raw energy-ORDER keys saturated however wide (347×/decade at
  // gsf10) because count-biased bits collapsed the effective key
  // space; the fix is key entropy + derived width, not width alone.
  // Clips carry PLANTED near-dup clusters ([[generatePcmNd]]); the
  // popcount verify rides the real WAV codec round trip. Oracle
  // replays every sample, window, band and the same banded join.
  val audioNearDup = Q(
    "mm_audio_neardup",
    Some(s"""
      WITH clips AS (
        SELECT doc_id, doc_id // 4 AS cl, doc_id % 4 AS r,
               CAST((doc_id // 4) % 2 + 1 AS BIGINT) AS nch,
               128 + ((doc_id // 4) * 131071) % 512 AS ns
        FROM documents),
      ch0 AS (
        SELECT doc_id, ns, j // nch AS s,
               CASE WHEN r >= 1 AND ((j // nch) * 64) // ns = (r * 19) % 64
                    THEN (hh % 4001 - 2000) * 3
                    ELSE hh % 4001 - 2000
               END AS v
        FROM (
          SELECT doc_id, ns, nch, r, j,
                 ((cl*48271 + j*16807 + 11) % 2147483647)
               * ((cl*48271 + j*16807 + 11) % 2147483647) % 2147483647 AS hh
          FROM clips, UNNEST(RANGE(0, ns * nch)) AS t(j)
          WHERE j % nch = 0)),
      wins AS (
        SELECT doc_id, (s * 64) // ns AS w, SUM(v * v) AS e, COUNT(*) AS c
        FROM ch0 GROUP BY doc_id, (s * 64) // ns),
      bits AS (
        SELECT l.doc_id,
               CASE WHEN l.e * rr.c > rr.e * l.c THEN
                 CASE WHEN l.w = 63 THEN -9223372036854775807 - 1
                      ELSE (1::BIGINT << l.w) END
               ELSE 0 END AS bv
        FROM wins l JOIN wins rr ON rr.doc_id = l.doc_id AND rr.w = (l.w + 1) % 64),
      hashes AS (SELECT doc_id, SUM(bv)::BIGINT AS fp FROM bits GROUP BY doc_id),
      $mediaBandsSqlCte,
      bands AS (
        SELECT doc_id, fp, b.i AS band,
               (fp >> ((64 // nb) * b.i)) & ((1::BIGINT << (64 // nb)) - 1) AS bval
        FROM hashes, mb, UNNEST(RANGE(0, nb)) AS b(i)),
      cand AS (
        SELECT DISTINCT a.doc_id AS i, b.doc_id AS j,
               BIT_COUNT(XOR(a.fp, b.fp)) AS ham
        FROM bands a JOIN bands b
          ON b.band = a.band AND b.bval = a.bval AND b.doc_id > a.doc_id)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
             CAST(COUNT(CASE WHEN ham <= 2 THEN 1 END) AS BIGINT) AS n_neardup,
             CAST(COALESCE(SUM(CASE WHEN ham <= 2 THEN ham END), 0) AS BIGINT) AS ham_sum,
             CAST(COALESCE(SUM(CASE WHEN ham <= 2 THEN i + j END), 0) AS BIGINT) AS id_checksum
      FROM cand
    """)
  ) { t =>
    val spark = t.spark
    import spark.implicits._
    val nb = mediaBands(t.documents.count())
    val wb = 64 / nb
    val hashes = t.documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val clip = WavCodec.decode(WavCodec.encode(generatePcmNd(id)))
        AudioFp(id, audioNdFpOf(clip))
      })
      .toDF()
    val bands = hashes
      .select(col("media_id"), col("fp"),
        explode(sequence(lit(0), lit(nb - 1))).as("band"))
      .withColumn("bval",
        expr(s"shiftrightunsigned(fp, $wb * band)")
          .bitwiseAND(lit((1L << wb) - 1)))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("b.band") === col("a.band") && col("b.bval") === col("a.bval") &&
          col("b.media_id") > col("a.media_id"))
      .select(col("a.media_id").as("i"), col("b.media_id").as("j"),
        expr("bit_count(a.fp ^ b.fp)").cast(LongType).as("ham"))
      .distinct()
    cand.agg(
      count(lit(1)).as("n_candidates"),
      count(when(col("ham") <= 2, 1)).as("n_neardup"),
      coalesce(sum(when(col("ham") <= 2, col("ham"))), lit(0L))
        .cast(LongType).as("ham_sum"),
      coalesce(sum(when(col("ham") <= 2, col("i") + col("j"))), lit(0L))
        .cast(LongType).as("id_checksum"))
  }

  final case class FrameHash(media_id: Long, nf: Long, f: Long, dhash: Long)

  // mm_video_neardup — near-duplicate CLIPS, completing the banding
  // family on the video lane (mm_video_dedup's temporal-polynomial key
  // is order-sensitive and EXACT: a one-frame re-encode bit flip misses
  // entirely). Each decoded frame carries a 64-bit luma dHash
  // ([[lumaDhashOf]]); candidates equi-join on (frame count, frame
  // index, sub-band, sub-band value) with the corpus-size-derived
  // [[mediaBands]] widths — never all-pairs, and the frame count rides
  // the key because the verify requires it anyway (a different-length
  // clip can never pass the majority rule, so those pairs are pruned
  // at the candidate stage, not after the shuffle). The verify is
  // FRAME-MAJORITY: same frame
  // count and more than half the frame pairs within hamming ≤ 3, the
  // radius 4×16 sub-bands guarantee by pigeonhole (above the 2²³ step,
  // 2×32 bands guarantee ≤ 1 — the documented trade). r14/r15 history:
  // the 8- then 16-bit row/column signature keys collapsed to the
  // generator's ~750 phase classes and read 71×/decade at gsf10 —
  // entropy + derived width, like the audio lane. Clips carry PLANTED
  // near-dup clusters ([[generateLumaNd]]); hashing rides the real Y4M
  // codec round trip. Oracle replays every luma byte, cell, gradient
  // bit and the same banded join.
  val videoNearDup = Q(
    "mm_video_neardup",
    Some(s"""
      WITH clips AS (
        SELECT doc_id, doc_id // 4 AS cl, doc_id % 4 AS r,
               8 + ((doc_id // 4) % 3) * 4 AS w, 8 AS h,
               (doc_id // 4) % 4 + 2 AS nf
        FROM documents),
      px AS (
        SELECT doc_id, w, h, nf, f, p // w AS y, p % w AS x,
               CASE WHEN r >= 1 AND f = (r - 1) % nf AND p % w < 2
                    THEN (hh % 251 + 101) % 251
                    ELSE hh % 251
               END AS v
        FROM (
          SELECT doc_id, w, h, nf, r, f, p,
                 ((cl*48271 + (f*w*h + p)*16807 + 11) % 2147483647)
               * ((cl*48271 + (f*w*h + p)*16807 + 11) % 2147483647) % 2147483647 AS hh
          FROM clips, UNNEST(RANGE(0, nf)) AS t(f), UNNEST(RANGE(0, w * h)) AS t2(p))),
      cells AS (
        SELECT doc_id, nf, f, y*8//h AS gy, x*8//w AS gx, SUM(v)//COUNT(*) AS a
        FROM px GROUP BY doc_id, nf, f, y*8//h, x*8//w),
      bits AS (
        SELECT l.doc_id, l.nf, l.f,
               CASE WHEN l.a > rr.a THEN
                 CASE WHEN l.gy*8 + l.gx = 63 THEN -9223372036854775807 - 1
                      ELSE (1::BIGINT << (l.gy*8 + l.gx)) END
               ELSE 0 END AS bv
        FROM cells l JOIN cells rr ON rr.doc_id = l.doc_id AND rr.f = l.f
                                  AND rr.gy = l.gy AND rr.gx = (l.gx + 1) % 8),
      hashes AS (
        SELECT doc_id, nf, f, SUM(bv)::BIGINT AS dhash
        FROM bits GROUP BY doc_id, nf, f),
      $mediaBandsSqlCte,
      bands AS (
        SELECT doc_id, nf, f, dhash, b.i AS band,
               (dhash >> ((64 // nb) * b.i)) & ((1::BIGINT << (64 // nb)) - 1) AS bval
        FROM hashes, mb, UNNEST(RANGE(0, nb)) AS b(i)),
      fcand AS (
        SELECT DISTINCT a.doc_id AS i, b.doc_id AS j, a.nf AS nfi, b.nf AS nfj,
               a.f AS f, BIT_COUNT(XOR(a.dhash, b.dhash)) AS ham
        FROM bands a JOIN bands b
          ON b.nf = a.nf AND b.f = a.f AND b.band = a.band
         AND b.bval = a.bval AND b.doc_id > a.doc_id),
      cand AS (
        SELECT i, j, nfi, nfj,
               COUNT(CASE WHEN ham <= 3 THEN 1 END) AS matches
        FROM fcand GROUP BY i, j, nfi, nfj)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
             CAST(COUNT(CASE WHEN nfi = nfj AND matches * 2 > nfi THEN 1 END)
               AS BIGINT) AS n_neardup,
             CAST(COALESCE(SUM(CASE WHEN nfi = nfj AND matches * 2 > nfi
               THEN matches END), 0) AS BIGINT) AS match_sum,
             CAST(COALESCE(SUM(CASE WHEN nfi = nfj AND matches * 2 > nfi
               THEN i + j END), 0) AS BIGINT) AS id_checksum
      FROM cand
    """)
  ) { t =>
    val spark = t.spark
    import spark.implicits._
    val nb = mediaBands(t.documents.count())
    val wb = 64 / nb
    val sigs = t.documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        val cl = id / 4
        val r = (id % 4).toInt
        val w = (8 + (cl % 3) * 4).toInt
        val h = 8
        val nf = (cl % 4 + 2).toInt
        val clip = Y4mCodec.decode(Y4mCodec.encode(w, h, 30, 1,
          (0 until nf).map(f => generateLumaNd(cl, r, w, h, f, nf))))
        clip.frames.iterator.zipWithIndex.map { case (fr, f) =>
          FrameHash(id, nf.toLong, f.toLong,
            lumaDhashOf(fr, clip.width, clip.height))
        }
      })
      .toDF()
    val bands = sigs
      .select(col("media_id"), col("nf"), col("f"), col("dhash"),
        explode(sequence(lit(0), lit(nb - 1))).as("band"))
      .withColumn("bval",
        expr(s"shiftrightunsigned(dhash, $wb * band)")
          .bitwiseAND(lit((1L << wb) - 1)))
    val fcand = bands.as("a")
      .join(bands.as("b"),
        col("b.nf") === col("a.nf") && col("b.f") === col("a.f") &&
          col("b.band") === col("a.band") && col("b.bval") === col("a.bval") &&
          col("b.media_id") > col("a.media_id"))
      .select(col("a.media_id").as("i"), col("b.media_id").as("j"),
        col("a.nf").as("nfi"), col("b.nf").as("nfj"), col("a.f").as("f"),
        expr("bit_count(a.dhash ^ b.dhash)").cast(LongType).as("ham"))
      .distinct()
    val cand = fcand.groupBy(col("i"), col("j"), col("nfi"), col("nfj"))
      .agg(count(when(col("ham") <= 3, 1)).as("matches"))
    val near = col("nfi") === col("nfj") && col("matches") * 2 > col("nfi")
    cand.agg(
      count(lit(1)).as("n_candidates"),
      count(when(near, 1)).as("n_neardup"),
      coalesce(sum(when(near, col("matches"))), lit(0L))
        .cast(LongType).as("match_sum"),
      coalesce(sum(when(near, col("i") + col("j"))), lit(0L))
        .cast(LongType).as("id_checksum"))
  }

  final case class ImageQuality(media_id: Long, kind: String, n_pixels: Long,
    n_grays: Long, modal_cnt: Long)

  // mm_image_quality — flatness audit, the image QUALITY filter next to
  // the dedup lanes (a training pipeline drops near-uniform images —
  // banners, color fills, letterbox mattes — before captioning): per
  // image, the gray-level diversity (distinct gray values) and the modal
  // gray's share in exact basis points, rolled up per container kind
  // with a flat-image count at modal share > 50%. One decode + one
  // 256-bin histogram per image inside mapPartitions (constant state),
  // then a kind-sized aggregation; the oracle replays every pixel's
  // gray value from the generator — all integer arithmetic, no FP.
  val imageQuality = Q(
    "mm_image_quality",
    Some("""
      WITH media AS (
        SELECT doc_id,
               CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image_ppm'
                    ELSE 'image_bmp' END AS kind,
               doc_id % 24 + 8 AS w, doc_id % 16 + 8 AS h
        FROM documents WHERE doc_id % 3 <> 2),
      px AS (
        SELECT doc_id, kind, w, h,
               ((doc_id*7 + (p*3 + 0)*13) % 251
              + (doc_id*7 + (p*3 + 1)*13) % 251
              + (doc_id*7 + (p*3 + 2)*13) % 251) // 3 AS gray
        FROM media, UNNEST(RANGE(0, w * h)) AS t(p)),
      hist AS (
        SELECT doc_id, kind, gray, COUNT(*) AS c
        FROM px GROUP BY doc_id, kind, gray),
      per_img AS (
        SELECT doc_id, kind, SUM(c) AS n_pixels, COUNT(*) AS n_grays,
               MAX(c) AS modal_cnt
        FROM hist GROUP BY doc_id, kind)
      SELECT kind,
             CAST(COUNT(*) AS BIGINT) AS n_images,
             CAST(SUM(n_pixels) AS BIGINT) AS n_pixels,
             CAST(SUM(n_grays) * 100 // COUNT(*) AS BIGINT) AS avg_grays_x100,
             CAST(SUM(modal_cnt * 10000 // n_pixels) // COUNT(*) AS BIGINT)
               AS avg_modal_bp,
             CAST(COUNT(CASE WHEN modal_cnt * 2 > n_pixels THEN 1 END)
               AS BIGINT) AS n_flat
      FROM per_img
      GROUP BY kind
      ORDER BY kind
    """)
  ) { t =>
    val spark = t.spark
    import spark.implicits._
    val perImg = mediaOf(t)
      .filter(_.kind != "video")
      .mapPartitions(_.map { b =>
        val raster = b.kind match {
          case "image_ppm" => PpmCodec.decode(b.payload)
          case _           => BmpCodec.decode(b.payload)
        }
        val hist = new Array[Long](256)
        var i = 0
        while (i < raster.rgb.length) {
          val gray = ((raster.rgb(i) & 0xff) + (raster.rgb(i + 1) & 0xff) +
            (raster.rgb(i + 2) & 0xff)) / 3
          hist(gray) += 1
          i += 3
        }
        var grays = 0L; var modal = 0L; var n = 0L
        hist.foreach { c =>
          if (c > 0) { grays += 1; n += c; if (c > modal) modal = c }
        }
        ImageQuality(b.media_id, b.kind, n, grays, modal)
      })
      .toDF()
    perImg.groupBy(col("kind"))
      .agg(count(lit(1)).as("n_images"),
        sum(col("n_pixels")).as("n_pixels"),
        expr("sum(n_grays) * 100 div count(1)").as("avg_grays_x100"),
        expr("sum(modal_cnt * 10000 div n_pixels) div count(1)")
          .as("avg_modal_bp"),
        count(when(col("modal_cnt") * 2 > col("n_pixels"), 1)).as("n_flat"))
      .select(col("kind"),
        col("n_images").cast(LongType).as("n_images"),
        col("n_pixels").cast(LongType).as("n_pixels"),
        col("avg_grays_x100").cast(LongType).as("avg_grays_x100"),
        col("avg_modal_bp").cast(LongType).as("avg_modal_bp"),
        col("n_flat").cast(LongType).as("n_flat"))
      .orderBy(col("kind"))
  }

  final case class AudioQuality(media_id: Long, n_channels: Long,
    n_samples: Long, n_clipped: Long, n_silent: Long)

  // mm_audio_quality — clipping / silence audit, the audio QUALITY
  // filter beside mm_audio_vad's speech detection (a pipeline drops
  // clips that are mostly clipped — distorted beyond use — or mostly
  // silence): per decoded clip, samples at |v| ≥ 1900 (near the
  // generator's ±2000 rail) and |v| ≤ 100, rolled up per channel
  // count in exact basis points. One decode + three counters per clip,
  // then a tiny aggregation; the oracle replays every PCM sample — all
  // integer arithmetic.
  val audioQuality = Q(
    "mm_audio_quality",
    Some("""
      WITH clips AS (
        SELECT doc_id, CAST(doc_id % 2 + 1 AS BIGINT) AS nch,
               (doc_id % 500 + 100) - (doc_id % 500 + 100) % (doc_id % 2 + 1) AS n
        FROM documents),
      s AS (
        SELECT doc_id, nch, (doc_id*7 + j*13) % 4001 - 2000 AS v
        FROM clips, UNNEST(RANGE(0, n)) AS t(j)),
      per_clip AS (
        SELECT doc_id, nch, COUNT(*) AS n_samples,
               COUNT(CASE WHEN ABS(v) >= 1900 THEN 1 END) AS n_clipped,
               COUNT(CASE WHEN ABS(v) <= 100 THEN 1 END) AS n_silent
        FROM s GROUP BY doc_id, nch)
      SELECT nch AS n_channels,
             CAST(COUNT(*) AS BIGINT) AS n_clips,
             CAST(SUM(n_samples) AS BIGINT) AS n_samples,
             CAST(SUM(n_clipped) * 10000 // SUM(n_samples) AS BIGINT)
               AS clipped_bp,
             CAST(SUM(n_silent) * 10000 // SUM(n_samples) AS BIGINT)
               AS silent_bp
      FROM per_clip
      GROUP BY nch
      ORDER BY n_channels
    """)
  ) { t =>
    val spark = t.spark
    import spark.implicits._
    t.documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val channels = (id % 2 + 1).toInt
        val n = (id % 500 + 100).toInt
        val clip = WavCodec.decode(WavCodec.encode(generatePcm(id, channels, n)))
        var clipped = 0L; var silent = 0L
        clip.samples.foreach { v =>
          val a = math.abs(v.toInt)
          if (a >= 1900) clipped += 1
          if (a <= 100) silent += 1
        }
        AudioQuality(id, clip.channels.toLong, clip.samples.length.toLong,
          clipped, silent)
      })
      .toDF()
      .groupBy(col("n_channels"))
      .agg(count(lit(1)).as("n_clips"),
        sum(col("n_samples")).as("n_samples"),
        sum(col("n_clipped")).as("nc"),
        sum(col("n_silent")).as("ns"))
      .select(col("n_channels"),
        col("n_clips").cast(LongType).as("n_clips"),
        col("n_samples").cast(LongType).as("n_samples"),
        expr("nc * 10000 div n_samples").cast(LongType).as("clipped_bp"),
        expr("ns * 10000 div n_samples").cast(LongType).as("silent_bp"))
      .orderBy(col("n_channels"))
  }

  final case class VideoQuality(media_id: Long, w: Long, nf: Long,
    luma_sum: Long, flicker: Long, n_frozen: Long)

  // mm_video_quality — frozen-frame / flicker audit, completing the
  // QUALITY triad (mm_image_quality: flatness; mm_audio_quality:
  // clipping/silence) on the video lane: a training pipeline drops
  // clips that are mostly STATIC (screen recordings idling, slate
  // cards, stuck encoders) before captioning, and flags brightness
  // instability. Per decoded frame: the luma sum (brightness) and the
  // 8-bit row signature ([[frameSigOf]] — shared with mm_video_dedup's
  // temporal key); per clip: frozen transitions (consecutive
  // frames whose signatures MATCH — the cheap static-content screen a
  // production pipeline runs before any byte compare) and total
  // flicker (absolute brightness step between consecutive frames).
  // Rolled up per width in exact integer arithmetic: mean luma and
  // mean flicker ×100, frozen transition and affected-clip counts.
  // One decode + two longs of sequential state per clip inside
  // mapPartitions (no shuffle until the width-sized groupBy) — the
  // same scale shape as mm_scene_cut; the oracle replays every luma
  // byte and signature bit from the shared Y4M generator.
  val videoQuality = Q(
    "mm_video_quality",
    Some("""
      WITH clips AS (
        SELECT doc_id, 8 + (doc_id % 3) * 4 AS w, 8 AS h, doc_id % 6 + 3 AS nf
        FROM documents),
      px AS (
        SELECT doc_id, w, nf, f, p // w AS r,
               (doc_id * 7 + (f * w * h + p) * 13) % 251 AS v
        FROM clips, UNNEST(RANGE(0, nf)) AS t(f),
                    UNNEST(RANGE(0, w * h)) AS t2(p)),
      rows_ AS (
        SELECT doc_id, w, nf, f, r, SUM(v) AS rs
        FROM px GROUP BY doc_id, w, nf, f, r),
      bits AS (
        SELECT l.doc_id, l.w, l.nf, l.f,
               CASE WHEN l.rs > rr.rs THEN (1::BIGINT << l.r) ELSE 0 END AS bv,
               l.rs AS band_sum
        FROM rows_ l JOIN rows_ rr
          ON rr.doc_id = l.doc_id AND rr.f = l.f AND rr.r = (l.r + 1) % 8),
      fr AS (
        SELECT doc_id, w, nf, f, SUM(bv) AS sig, SUM(band_sum) AS s
        FROM bits GROUP BY doc_id, w, nf, f),
      steps AS (
        SELECT doc_id, w, nf, f, s, sig,
               LAG(s) OVER (PARTITION BY doc_id ORDER BY f) AS ps,
               LAG(sig) OVER (PARTITION BY doc_id ORDER BY f) AS psig
        FROM fr),
      per_clip AS (
        SELECT doc_id, w, MAX(nf) AS nf, SUM(s) AS luma_sum,
               COALESCE(SUM(ABS(s - ps)), 0) AS flicker,
               COUNT(CASE WHEN sig = psig THEN 1 END) AS n_frozen
        FROM steps GROUP BY doc_id, w)
      SELECT CAST(w AS BIGINT) AS w,
             CAST(COUNT(*) AS BIGINT) AS n_clips,
             CAST(SUM(nf) AS BIGINT) AS n_frames,
             CAST(SUM(luma_sum) * 100 // (SUM(nf) * w * 8) AS BIGINT)
               AS mean_luma_x100,
             CAST(SUM(flicker) * 100 // (SUM(nf) - COUNT(*)) AS BIGINT)
               AS mean_flicker_x100,
             CAST(SUM(n_frozen) AS BIGINT) AS n_frozen,
             CAST(COUNT(CASE WHEN n_frozen > 0 THEN 1 END) AS BIGINT)
               AS n_clips_frozen
      FROM per_clip
      GROUP BY w
      ORDER BY w
    """)
  ) { t =>
    val spark = t.spark
    import spark.implicits._
    val perClip = t.documents.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (8 + (id % 3) * 4).toInt
        val h = 8
        val nf = (id % 6 + 3).toInt
        val clip = Y4mCodec.decode(Y4mCodec.encode(w, h, 30, 1,
          (0 until nf).map(f => generateLuma(id, w, h, f))))
        var lumaSum = 0L; var flicker = 0L; var frozen = 0L
        var prevS = 0L; var prevSig = -1L
        var f = 0
        while (f < clip.frames.length) {
          val fr = clip.frames(f)
          var s = 0L
          var p = 0
          while (p < fr.length) { s += fr(p) & 0xff; p += 1 }
          val sig = frameSigOf(fr, clip.width, clip.height)
          if (f > 0) {
            flicker += math.abs(s - prevS)
            if (sig == prevSig) frozen += 1
          }
          lumaSum += s
          prevS = s; prevSig = sig
          f += 1
        }
        VideoQuality(id, w.toLong, nf.toLong, lumaSum, flicker, frozen)
      })
      .toDF()
    perClip.groupBy(col("w"))
      .agg(count(lit(1)).as("n_clips"),
        sum(col("nf")).as("n_frames"),
        sum(col("luma_sum")).as("ls"),
        sum(col("flicker")).as("fl"),
        sum(col("n_frozen")).as("nfz"),
        count(when(col("n_frozen") > 0, 1)).as("n_clips_frozen"))
      .select(col("w").cast(LongType).as("w"),
        col("n_clips").cast(LongType).as("n_clips"),
        col("n_frames").cast(LongType).as("n_frames"),
        expr("ls * 100 div (n_frames * w * 8)").cast(LongType)
          .as("mean_luma_x100"),
        expr("fl * 100 div (n_frames - n_clips)").cast(LongType)
          .as("mean_flicker_x100"),
        col("nfz").cast(LongType).as("n_frozen"),
        col("n_clips_frozen").cast(LongType).as("n_clips_frozen"))
      .orderBy(col("w"))
  }

  final case class DominantColor(media_id: Long, kind: String, cell: Long,
    dom_bp: Long)

  // mm_dominant_color — dominant-color census, the color-space filter
  // beside mm_image_quality's flatness audit (a training pipeline
  // buckets images by dominant color to drop monochrome mattes and
  // balance color distribution before captioning): each pixel maps to
  // one of 27 color cells (RGB quantized to 3 levels per channel — the
  // coarse histogram production pipelines actually key on), each image
  // reports its modal cell (ties to the lowest cell id) and that
  // cell's share in exact basis points, and the rollup counts images
  // per (kind, dominant cell). One decode + a 27-counter pass per
  // image inside mapPartitions — NO per-image window anywhere (the
  // oracle's 27-row ROW_NUMBER partitions are bounded by the cell
  // count, the Spark side is row-local argmax) — then a ≤54-row
  // aggregation; all integer, oracle replays every RGB byte.
  val dominantColor = Q(
    "mm_dominant_color",
    Some("""
      WITH media AS (
        SELECT doc_id,
               CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image_ppm'
                    ELSE 'image_bmp' END AS kind,
               doc_id % 24 + 8 AS w, doc_id % 16 + 8 AS h
        FROM documents WHERE doc_id % 3 <> 2),
      px AS (
        SELECT doc_id, kind, w, h,
               ((doc_id*7 + (p*3 + 0)*13) % 251) // 84 * 9
             + ((doc_id*7 + (p*3 + 1)*13) % 251) // 84 * 3
             + ((doc_id*7 + (p*3 + 2)*13) % 251) // 84 AS cell
        FROM media, UNNEST(RANGE(0, w * h)) AS t(p)),
      cnt AS (
        SELECT doc_id, kind, w, h, cell, COUNT(*) AS c
        FROM px GROUP BY doc_id, kind, w, h, cell),
      dom AS (
        SELECT doc_id, kind, cell, c * 10000 // (w * h) AS dom_bp,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY c DESC, cell) AS rn
        FROM cnt)
      SELECT kind, CAST(cell AS BIGINT) AS cell,
             CAST(COUNT(*) AS BIGINT) AS n_images,
             CAST(SUM(dom_bp) // COUNT(*) AS BIGINT) AS avg_dom_bp
      FROM dom WHERE rn = 1
      GROUP BY kind, cell
      ORDER BY kind, cell
    """)
  ) { t =>
    val spark = t.spark
    import spark.implicits._
    val perImg = mediaOf(t)
      .filter(_.kind != "video")
      .mapPartitions(_.map { b =>
        val raster = b.kind match {
          case "image_ppm" => PpmCodec.decode(b.payload)
          case _           => BmpCodec.decode(b.payload)
        }
        val counts = new Array[Long](27)
        var i = 0
        while (i < raster.rgb.length) {
          val cell = ((raster.rgb(i) & 0xff) / 84) * 9 +
            ((raster.rgb(i + 1) & 0xff) / 84) * 3 +
            ((raster.rgb(i + 2) & 0xff) / 84)
          counts(cell) += 1
          i += 3
        }
        var best = 0
        var c = 1
        while (c < 27) {
          if (counts(c) > counts(best)) best = c
          c += 1
        }
        val npix = raster.rgb.length / 3
        DominantColor(b.media_id, b.kind, best.toLong,
          counts(best) * 10000 / npix)
      })
      .toDF()
    perImg.groupBy(col("kind"), col("cell"))
      .agg(count(lit(1)).as("n_images"), sum(col("dom_bp")).as("sb"))
      .select(col("kind"), col("cell").cast(LongType).as("cell"),
        col("n_images").cast(LongType).as("n_images"),
        expr("sb div n_images").cast(LongType).as("avg_dom_bp"))
      .orderBy(col("kind"), col("cell"))
  }

  val all: Seq[Q] = Seq(pipeline, transformPipeline, audio, video, avi,
    imageDedup, audioDedup, videoDedup, sceneCut, audioVad, letterbox,
    audioResample, imageNearDup, audioNearDup, videoNearDup, imageQuality,
    audioQuality, videoQuality, dominantColor)
}
