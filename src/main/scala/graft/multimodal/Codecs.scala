package graft.multimodal

/** Real image codecs for the multimodal pipeline — replaces the round-3
  * byte-statistic stubs with genuine format encode/decode:
  *
  *   - [[PpmCodec]]: binary P6 PPM (header tokenizer with comment and
  *     whitespace handling, maxval check)
  *   - [[BmpCodec]]: 24-bit uncompressed BI_RGB BMP (BITMAPFILEHEADER +
  *     BITMAPINFOHEADER, 4-byte row padding, BGR channel order,
  *     bottom-up or top-down row direction)
  *   - [[PpmStream]]: concatenated P6 frames (the ffmpeg image2pipe
  *     convention) standing in for video
  *   - [[Y4mCodec]]: YUV4MPEG2 — a real video container (stream header
  *     with tagged parameters, per-frame FRAME markers, planar
  *     colorspace geometry for Cmono, the C420 family, and C444)
  *
  * The pipelines' DuckDB oracles recompute pixel statistics from the
  * deterministic generator formula, so any decode mistake — missed row
  * padding, unswapped BGR, flipped row order, off-by-one in the header —
  * breaks the exact compare. Real image/audio/video codecs (JPEG, FLAC,
  * H.264) plug in behind the same [[Raster]] boundary.
  */
object Codecs {

  /** A decoded image: RGB raster, row-major top-down, 3 bytes per pixel. */
  final case class Raster(width: Int, height: Int, rgb: Array[Byte]) {
    require(rgb.length == width * height * 3,
      s"raster size ${rgb.length} != ${width}x${height}x3")
  }

  /** Deterministic pixel generator shared with the SQL oracles:
    * value of flat RGB index j (across frames) for media item `id`.
    */
  def pixel(id: Long, j: Long): Int = ((id * 7 + j * 13) % 251).toInt

  /** Build the raster for frame `frame` of media item `id` (frames index
    * the same flat generator sequence contiguously).
    */
  def generate(id: Long, width: Int, height: Int, frame: Int = 0): Raster = {
    val n = width * height * 3
    val offset = frame.toLong * n
    val rgb = new Array[Byte](n)
    var i = 0
    while (i < n) { rgb(i) = pixel(id, offset + i).toByte; i += 1 }
    Raster(width, height, rgb)
  }

  object PpmCodec {

    def encode(img: Raster): Array[Byte] = {
      val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + img.rgb.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
      out
    }

    /** Parse one P6 image starting at `from`; returns the raster and the
      * offset just past it (so streams of concatenated frames parse
      * sequentially). Handles arbitrary header whitespace and `#`
      * comments per the netpbm grammar.
      */
    def decodeFrom(bytes: Array[Byte], from: Int): (Raster, Int) = {
      var i = from
      def fail(msg: String) = throw new IllegalArgumentException(s"PPM: $msg at $i")
      def skipSpace(): Unit = {
        var in = true
        while (in && i < bytes.length) {
          val c = bytes(i)
          if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
          else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') i += 1
          else in = false
        }
      }
      def int(): Int = {
        skipSpace()
        val s = i
        while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') i += 1
        if (i == s) fail("expected integer")
        new String(bytes, s, i - s, "US-ASCII").toInt
      }
      if (i + 2 > bytes.length || bytes(i) != 'P' || bytes(i + 1) != '6')
        fail("bad magic")
      i += 2
      val (w, h, maxval) = (int(), int(), int())
      if (maxval != 255) fail(s"unsupported maxval $maxval")
      i += 1 // exactly one whitespace byte separates header from raster
      val n = w * h * 3
      if (i + n > bytes.length) fail(s"truncated raster (need $n)")
      val rgb = new Array[Byte](n)
      System.arraycopy(bytes, i, rgb, 0, n)
      (Raster(w, h, rgb), i + n)
    }

    def decode(bytes: Array[Byte]): Raster = decodeFrom(bytes, 0)._1
  }

  object BmpCodec {

    private def rowSize(width: Int): Int = ((width * 3 + 3) / 4) * 4

    private def putInt(b: Array[Byte], at: Int, v: Int): Unit = {
      b(at) = v.toByte; b(at + 1) = (v >> 8).toByte
      b(at + 2) = (v >> 16).toByte; b(at + 3) = (v >> 24).toByte
    }
    private def putShort(b: Array[Byte], at: Int, v: Int): Unit = {
      b(at) = v.toByte; b(at + 1) = (v >> 8).toByte
    }
    private def getInt(b: Array[Byte], at: Int): Int =
      (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8) |
        ((b(at + 2) & 0xff) << 16) | ((b(at + 3) & 0xff) << 24)
    private def getShort(b: Array[Byte], at: Int): Int =
      (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8)

    /** Standard layout: bottom-up rows, BGR pixels, rows padded to 4. */
    def encode(img: Raster): Array[Byte] = {
      val rs = rowSize(img.width)
      val imageSize = rs * img.height
      val out = new Array[Byte](54 + imageSize)
      out(0) = 'B'; out(1) = 'M'
      putInt(out, 2, 54 + imageSize)
      putInt(out, 10, 54)                 // pixel-array offset
      putInt(out, 14, 40)                 // BITMAPINFOHEADER size
      putInt(out, 18, img.width)
      putInt(out, 22, img.height)         // positive height = bottom-up
      putShort(out, 26, 1)                // planes
      putShort(out, 28, 24)               // bpp
      putInt(out, 30, 0)                  // BI_RGB
      putInt(out, 34, imageSize)
      putInt(out, 38, 2835); putInt(out, 42, 2835) // 72 dpi
      var y = 0
      while (y < img.height) {
        val rowAt = 54 + (img.height - 1 - y) * rs // bottom-up
        var x = 0
        while (x < img.width) {
          val p = (y * img.width + x) * 3
          out(rowAt + x * 3) = img.rgb(p + 2)      // B
          out(rowAt + x * 3 + 1) = img.rgb(p + 1)  // G
          out(rowAt + x * 3 + 2) = img.rgb(p)      // R
          x += 1
        }
        y += 1
      }
      out
    }

    def decode(bytes: Array[Byte]): Raster = {
      def fail(msg: String) = throw new IllegalArgumentException(s"BMP: $msg")
      if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') fail("bad magic")
      val offset = getInt(bytes, 10)
      val w = getInt(bytes, 18)
      val rawH = getInt(bytes, 22)
      val bottomUp = rawH > 0                      // negative height = top-down
      val h = math.abs(rawH)
      if (getShort(bytes, 28) != 24) fail(s"unsupported bpp ${getShort(bytes, 28)}")
      if (getInt(bytes, 30) != 0) fail("compressed BMP unsupported")
      val rs = rowSize(w)
      if (offset + rs * h > bytes.length) fail("truncated pixel array")
      val rgb = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        val srcRow = if (bottomUp) h - 1 - y else y
        val rowAt = offset + srcRow * rs
        var x = 0
        while (x < w) {
          val p = (y * w + x) * 3
          rgb(p) = bytes(rowAt + x * 3 + 2)        // R ← position 2
          rgb(p + 1) = bytes(rowAt + x * 3 + 1)    // G
          rgb(p + 2) = bytes(rowAt + x * 3)        // B ← position 0
          x += 1
        }
        y += 1
      }
      Raster(w, h, rgb)
    }
  }

  /** Concatenated P6 frames — the image2pipe "video" convention. */
  object PpmStream {
    def encode(frames: Seq[Raster]): Array[Byte] =
      frames.iterator.map(PpmCodec.encode).reduce(_ ++ _)

    def decode(bytes: Array[Byte]): Vector[Raster] = {
      val frames = Vector.newBuilder[Raster]
      var at = 0
      while (at < bytes.length) {
        val (frame, next) = PpmCodec.decodeFrom(bytes, at)
        frames += frame
        at = next
      }
      frames.result()
    }
  }

  /** Deterministic luma-plane generator shared with the SQL oracle:
    * byte p of frame `frame` for clip `id` (frames index the flat
    * generator sequence contiguously, like [[generate]]).
    */
  def generateLuma(id: Long, width: Int, height: Int, frame: Int): Array[Byte] = {
    val n = width * height
    val offset = frame.toLong * n
    val y = new Array[Byte](n)
    var i = 0
    while (i < n) { y(i) = pixel(id, offset + i).toByte; i += 1 }
    y
  }

  /** A decoded Y4M clip: per-frame luma planes (row-major), plus the
    * stream header's geometry and frame rate.
    */
  final case class Y4m(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
    frames: Vector[Array[Byte]])

  /** YUV4MPEG2 — a REAL video container (what ffmpeg/mjpegtools pipe):
    * ASCII stream header `YUV4MPEG2 W.. H.. F..:..` with tagged
    * parameters in any order (unknown tags skipped, like WAV's unknown
    * chunks), then one `FRAME[ params]\n` marker per frame followed by
    * raw planar data. Colorspace handling is real: Cmono is one Y
    * plane; C420* carries two quarter-size chroma planes and C444 two
    * full-size ones — the walker computes and skips the correct chroma
    * geometry (a wrong plane size desynchronizes every later FRAME
    * marker, which the marker check catches loudly). Decode returns the
    * luma plane — the channel frame-sampling statistics read.
    */
  object Y4mCodec {

    /** Encode mono frames (the honest lossless lane: no color transform
      * to round-trip; Cmono is spec-valid Y4M).
      */
    def encode(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
      val header =
        s"YUV4MPEG2 W$width H$height F$fpsNum:$fpsDen Ip A1:1 Cmono\n"
          .getBytes("US-ASCII")
      val marker = "FRAME\n".getBytes("US-ASCII")
      val out = new java.io.ByteArrayOutputStream(
        header.length + frames.map(_.length + marker.length).sum)
      out.write(header)
      frames.foreach { f =>
        require(f.length == width * height,
          s"luma plane ${f.length} != ${width}x$height")
        out.write(marker); out.write(f)
      }
      out.toByteArray
    }

    def decode(bytes: Array[Byte]): Y4m = {
      def fail(msg: String) = throw new IllegalArgumentException(s"Y4M: $msg")
      var i = 0
      def line(): String = {
        val s = i
        while (i < bytes.length && bytes(i) != '\n') i += 1
        if (i >= bytes.length) fail("unterminated header line")
        i += 1
        new String(bytes, s, i - 1 - s, "US-ASCII")
      }
      val header = line()
      val tokens = header.split(" ").filter(_.nonEmpty)
      if (tokens.isEmpty || tokens(0) != "YUV4MPEG2") fail("bad magic")
      var w = -1; var h = -1; var fn = 30; var fd = 1; var cs = "C420"
      tokens.drop(1).foreach { tok =>
        tok.charAt(0) match {
          case 'W' => w = tok.substring(1).toInt
          case 'H' => h = tok.substring(1).toInt
          case 'F' =>
            val parts = tok.substring(1).split(":")
            fn = parts(0).toInt; fd = parts(1).toInt
          case 'C' => cs = tok
          case _ => // I (interlace), A (aspect), X (metadata): skipped
        }
      }
      if (w <= 0 || h <= 0) fail(s"missing or bad geometry W$w H$h")
      val chroma = cs match {
        case "Cmono" => 0
        case c if c.startsWith("C420") =>
          if (w % 2 != 0 || h % 2 != 0) fail(s"$cs needs even geometry")
          2 * ((w / 2) * (h / 2))
        case "C444" => 2 * (w * h)
        case other => fail(s"unsupported colorspace $other")
      }
      val frameSize = w * h + chroma
      val frames = Vector.newBuilder[Array[Byte]]
      while (i < bytes.length) {
        val mark = line()
        if (mark != "FRAME" && !mark.startsWith("FRAME "))
          fail(s"expected FRAME marker, got '${mark.take(16)}'")
        if (i + frameSize > bytes.length) fail("truncated frame")
        val y = new Array[Byte](w * h)
        System.arraycopy(bytes, i, y, 0, w * h)
        frames += y
        i += frameSize // luma + (correctly sized) chroma planes
      }
      Y4m(w, h, fn, fd, frames.result())
    }
  }

  /** A decoded audio clip: interleaved 16-bit PCM samples. */
  final case class Pcm(channels: Int, sampleRate: Int, samples: Array[Short])

  /** 16-bit PCM WAV (RIFF/WAVE): the real container grammar — chunked
    * layout with a fmt chunk, unknown chunks skipped (LIST/INFO tags are
    * common in the wild), little-endian sample words. Decode mistakes
    * (missed chunk skip, wrong byte order, odd-size padding) break the
    * sample-exact oracle sums.
    */
  object WavCodec {

    private def putInt(b: Array[Byte], at: Int, v: Int): Unit = {
      b(at) = v.toByte; b(at + 1) = (v >> 8).toByte
      b(at + 2) = (v >> 16).toByte; b(at + 3) = (v >> 24).toByte
    }
    private def putShort(b: Array[Byte], at: Int, v: Int): Unit = {
      b(at) = v.toByte; b(at + 1) = (v >> 8).toByte
    }
    private def getInt(b: Array[Byte], at: Int): Int =
      (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8) |
        ((b(at + 2) & 0xff) << 16) | ((b(at + 3) & 0xff) << 24)
    private def getShort(b: Array[Byte], at: Int): Int =
      (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8)

    def encode(clip: Pcm): Array[Byte] = {
      val dataSize = clip.samples.length * 2
      val out = new Array[Byte](44 + dataSize)
      out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
      putInt(out, 4, 36 + dataSize)
      out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
      out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
      putInt(out, 16, 16)                      // PCM fmt chunk size
      putShort(out, 20, 1)                     // audioFormat = PCM
      putShort(out, 22, clip.channels)
      putInt(out, 24, clip.sampleRate)
      putInt(out, 28, clip.sampleRate * clip.channels * 2) // byteRate
      putShort(out, 32, clip.channels * 2)     // blockAlign
      putShort(out, 34, 16)                    // bitsPerSample
      out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
      putInt(out, 40, dataSize)
      var i = 0
      while (i < clip.samples.length) {
        putShort(out, 44 + i * 2, clip.samples(i)); i += 1
      }
      out
    }

    def decode(bytes: Array[Byte]): Pcm = {
      def fail(msg: String) = throw new IllegalArgumentException(s"WAV: $msg")
      def tag(at: Int): String = new String(bytes, at, 4, "US-ASCII")
      if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") fail("bad magic")
      var at = 12
      var channels = 0; var sampleRate = 0; var haveFmt = false
      var samples: Array[Short] = null
      // walk the chunk list: fmt and data matter, everything else skips
      while (at + 8 <= bytes.length && samples == null) {
        val id = tag(at)
        val size = getInt(bytes, at + 4)
        val body = at + 8
        // a negative size (corrupt 32-bit field) would loop forever or
        // feed a negative array length below; an oversized one walks off
        // the buffer — both are malformed input, not crashes
        if (size < 0 || body + size > bytes.length)
          fail(s"chunk '$id' size $size exceeds payload")
        id match {
          case "fmt " =>
            if (size < 16) fail(s"fmt chunk too small ($size)")
            if (getShort(bytes, body) != 1) fail("non-PCM format")
            if (getShort(bytes, body + 14) != 16) fail("unsupported bit depth")
            channels = getShort(bytes, body + 2)
            if (channels < 1) fail(s"invalid channel count $channels")
            sampleRate = getInt(bytes, body + 4)
            haveFmt = true
          case "data" =>
            if (!haveFmt) fail("data chunk before fmt")
            if (body + size > bytes.length) fail("truncated data chunk")
            val n = size / 2
            val s = new Array[Short](n)
            var i = 0
            while (i < n) { s(i) = getShort(bytes, body + i * 2).toShort; i += 1 }
            samples = s
          case _ => () // LIST/INFO/fact/… — skip
        }
        at = body + size + (size & 1) // chunks are word-aligned
      }
      if (samples == null) fail("no data chunk")
      Pcm(channels, sampleRate, samples)
    }
  }

  /** Deterministic 16-bit sample generator shared with the SQL oracle:
    * sample j of clip `id` in [-2000, 2000].
    */
  def pcmSample(id: Long, j: Long): Int = ((id * 7 + j * 13) % 4001).toInt - 2000

  /** `n` rounds DOWN to a whole number of frames (multiple of channels):
    * a data chunk that is not frame-aligned (blockAlign) is spec-invalid
    * WAV that real decoders may reject, even though a naive round trip
    * would agree with itself.
    */
  def generatePcm(id: Long, channels: Int, n: Int): Pcm = {
    val aligned = n - n % channels
    val s = new Array[Short](aligned)
    var i = 0
    while (i < aligned) { s(i) = pcmSample(id, i).toShort; i += 1 }
    Pcm(channels, 8000, s)
  }

  /** A decoded AVI clip: RGB frames plus the stream header geometry. */
  final case class Avi(width: Int, height: Int, fps: Int,
    frames: Vector[Raster])

  /** AVI (RIFF 'AVI ') with uncompressed 24-bit DIB video — the second
    * REAL video container beside Y4M, exercising the binary-chunked
    * grammar family: nested LIST chunks (hdrl → avih + strl[strh/strf],
    * movi → per-frame '00db'), unknown-chunk skip with word alignment
    * (a JUNK pad chunk is always emitted so the skip path runs on every
    * file), and the idx1 frame INDEX — the piece Y4M lacks. Frames are
    * the BMP raster convention (bottom-up rows, BGR, 4-byte row pad)
    * without the BITMAPFILEHEADER. [[frameAt]] seeks one frame through
    * idx1 without touching the rest of movi — the random-access read
    * a frame sampler wants from an indexed container.
    */
  object AviCodec {

    private def rowSize(width: Int): Int = ((width * 3 + 3) / 4) * 4

    private def putInt(b: Array[Byte], at: Int, v: Int): Unit = {
      b(at) = v.toByte; b(at + 1) = (v >> 8).toByte
      b(at + 2) = (v >> 16).toByte; b(at + 3) = (v >> 24).toByte
    }
    private def putShort(b: Array[Byte], at: Int, v: Int): Unit = {
      b(at) = v.toByte; b(at + 1) = (v >> 8).toByte
    }
    private def getInt(b: Array[Byte], at: Int): Int =
      (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8) |
        ((b(at + 2) & 0xff) << 16) | ((b(at + 3) & 0xff) << 24)

    private def fourcc(b: Array[Byte], at: Int): String =
      new String(b, at, 4, "US-ASCII")
    private def putFourcc(b: Array[Byte], at: Int, s: String): Unit = {
      val cs = s.getBytes("US-ASCII"); System.arraycopy(cs, 0, b, at, 4)
    }

    /** DIB frame payload: bottom-up, BGR, rows padded to 4 bytes (the
      * BMP pixel-array convention, headerless inside '00db').
      */
    private def dibEncode(img: Raster): Array[Byte] = {
      val rs = rowSize(img.width)
      val out = new Array[Byte](rs * img.height)
      var y = 0
      while (y < img.height) {
        val rowAt = (img.height - 1 - y) * rs
        var x = 0
        while (x < img.width) {
          val p = (y * img.width + x) * 3
          out(rowAt + x * 3) = img.rgb(p + 2)
          out(rowAt + x * 3 + 1) = img.rgb(p + 1)
          out(rowAt + x * 3 + 2) = img.rgb(p)
          x += 1
        }
        y += 1
      }
      out
    }

    private def dibDecode(bytes: Array[Byte], at: Int, w: Int, h: Int): Raster = {
      val rs = rowSize(w)
      val rgb = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        val rowAt = at + (h - 1 - y) * rs
        var x = 0
        while (x < w) {
          val p = (y * w + x) * 3
          rgb(p) = bytes(rowAt + x * 3 + 2)
          rgb(p + 1) = bytes(rowAt + x * 3 + 1)
          rgb(p + 2) = bytes(rowAt + x * 3)
          x += 1
        }
        y += 1
      }
      Raster(w, h, rgb)
    }

    def encode(fps: Int, frames: Seq[Raster]): Array[Byte] = {
      require(frames.nonEmpty, "AVI needs at least one frame")
      val w = frames.head.width; val h = frames.head.height
      require(frames.forall(f => f.width == w && f.height == h),
        "all frames must share geometry")
      val frameBytes = rowSize(w) * h
      val nf = frames.length
      // sizes: LIST hdrl = 4('hdrl') + avih(8+56) + LIST strl(8 + 4 +
      // strh(8+56) + strf(8+40))
      val strlSize = 4 + 64 + 48
      val hdrlSize = 4 + 64 + 8 + strlSize
      val juknSize = 8 + 12                    // a 12-byte JUNK pad
      val moviSize = 4 + nf * (8 + frameBytes)
      val idxSize = 8 + nf * 16
      val riffSize = 4 + (8 + hdrlSize) + juknSize + (8 + moviSize) + idxSize
      val out = new Array[Byte](8 + riffSize)
      var at = 0
      putFourcc(out, 0, "RIFF"); putInt(out, 4, riffSize)
      putFourcc(out, 8, "AVI "); at = 12
      // LIST hdrl
      putFourcc(out, at, "LIST"); putInt(out, at + 4, hdrlSize)
      putFourcc(out, at + 8, "hdrl"); at += 12
      // avih
      putFourcc(out, at, "avih"); putInt(out, at + 4, 56); at += 8
      putInt(out, at, 1000000 / fps)           // dwMicroSecPerFrame
      putInt(out, at + 4, frameBytes * fps)    // dwMaxBytesPerSec
      putInt(out, at + 16, nf)                 // dwTotalFrames
      putInt(out, at + 24, 1)                  // dwStreams
      putInt(out, at + 32, w); putInt(out, at + 36, h)
      at += 56
      // LIST strl
      putFourcc(out, at, "LIST"); putInt(out, at + 4, strlSize)
      putFourcc(out, at + 8, "strl"); at += 12
      putFourcc(out, at, "strh"); putInt(out, at + 4, 56); at += 8
      putFourcc(out, at, "vids"); putFourcc(out, at + 4, "DIB ")
      putInt(out, at + 20, 1)                  // dwScale
      putInt(out, at + 24, fps)                // dwRate
      putInt(out, at + 32, nf)                 // dwLength
      at += 56
      putFourcc(out, at, "strf"); putInt(out, at + 4, 40); at += 8
      putInt(out, at, 40)                      // biSize
      putInt(out, at + 4, w); putInt(out, at + 8, h)
      putShort(out, at + 12, 1)                // biPlanes
      putShort(out, at + 14, 24)               // biBitCount
      putInt(out, at + 16, 0)                  // BI_RGB
      putInt(out, at + 20, frameBytes)         // biSizeImage
      at += 40
      // JUNK pad (alignment chunk real muxers emit; exercises skip)
      putFourcc(out, at, "JUNK"); putInt(out, at + 4, 12); at += 20
      // LIST movi
      putFourcc(out, at, "LIST"); putInt(out, at + 4, moviSize)
      putFourcc(out, at + 8, "movi")
      val moviFcc = at + 8                     // idx1 offsets are relative here
      at += 12
      val offsets = new Array[Int](nf)
      frames.zipWithIndex.foreach { case (f, i) =>
        offsets(i) = at - moviFcc
        putFourcc(out, at, "00db"); putInt(out, at + 4, frameBytes)
        System.arraycopy(dibEncode(f), 0, out, at + 8, frameBytes)
        at += 8 + frameBytes
      }
      // idx1
      putFourcc(out, at, "idx1"); putInt(out, at + 4, nf * 16); at += 8
      offsets.foreach { off =>
        putFourcc(out, at, "00db")
        putInt(out, at + 4, 0x10)              // AVIIF_KEYFRAME
        putInt(out, at + 8, off)
        putInt(out, at + 12, frameBytes)
        at += 16
      }
      require(at == out.length, s"encoder desync: $at != ${out.length}")
      out
    }

    /** Parsed top-level structure: geometry/rate from hdrl, the movi
      * fourcc position, frame-chunk offsets found by the movi walk, and
      * the idx1 entries (movi-relative offsets). decode() cross-checks
      * walk vs index — a desynchronized index is a corrupt file.
      */
    private final case class Layout(w: Int, h: Int, fps: Int, nf: Int,
      moviFcc: Int, walked: Vector[Int], idx: Vector[Int])

    private def layout(bytes: Array[Byte], walkMovi: Boolean = true): Layout = {
      def fail(msg: String) = throw new IllegalArgumentException(s"AVI: $msg")
      if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
        fourcc(bytes, 8) != "AVI ") fail("bad magic")
      var w = -1; var h = -1; var fps = -1; var nf = -1
      var moviFcc = -1
      val walked = Vector.newBuilder[Int]
      val idx = Vector.newBuilder[Int]
      var haveIdx = false
      var at = 12
      val end = math.min(8L + getInt(bytes, 4), bytes.length.toLong).toInt
      while (at + 8 <= end) {
        val ck = fourcc(bytes, at)
        val size = getInt(bytes, at + 4)
        val body = at + 8
        ck match {
          case "LIST" =>
            fourcc(bytes, body) match {
              case "hdrl" =>
                // walk the header list: avih then nested LIST strl
                var ha = body + 4
                val hend = body + size
                while (ha + 8 <= hend) {
                  val hck = fourcc(bytes, ha)
                  val hsz = getInt(bytes, ha + 4)
                  if (hck == "avih") {
                    fps = 1000000 / math.max(getInt(bytes, ha + 8), 1)
                    nf = getInt(bytes, ha + 8 + 16)
                  } else if (hck == "LIST" &&
                    fourcc(bytes, ha + 8) == "strl") {
                    var sa = ha + 12
                    val send = ha + 8 + hsz
                    while (sa + 8 <= send) {
                      val sck = fourcc(bytes, sa)
                      val ssz = getInt(bytes, sa + 4)
                      if (sck == "strh" &&
                        fourcc(bytes, sa + 8) != "vids")
                        fail(s"unsupported stream ${fourcc(bytes, sa + 8)}")
                      if (sck == "strf") {
                        w = getInt(bytes, sa + 8 + 4)
                        h = getInt(bytes, sa + 8 + 8)
                        val bpp = (bytes(sa + 8 + 14) & 0xff) |
                          ((bytes(sa + 8 + 15) & 0xff) << 8)
                        if (bpp != 24) fail(s"unsupported bpp $bpp")
                        if (getInt(bytes, sa + 8 + 16) != 0)
                          fail("compressed AVI unsupported")
                      }
                      sa += 8 + ssz + (ssz & 1)
                    }
                  }
                  ha += 8 + hsz + (hsz & 1)
                }
              case "movi" =>
                moviFcc = body
                if (walkMovi) {
                  var ma = body + 4
                  val mend = body + size
                  while (ma + 8 <= mend) {
                    val mck = fourcc(bytes, ma)
                    val msz = getInt(bytes, ma + 4)
                    if (mck == "00db" || mck == "00dc") walked += ma - moviFcc
                    ma += 8 + msz + (msz & 1)
                  }
                }
              case _ => // INFO and friends: skipped
            }
          case "idx1" =>
            haveIdx = true
            var ia = body
            val iend = body + size
            while (ia + 16 <= iend) {
              if (fourcc(bytes, ia) == "00db" || fourcc(bytes, ia) == "00dc")
                idx += getInt(bytes, ia + 8)
              ia += 16
            }
          case _ => // JUNK and unknown chunks: skipped with word alignment
        }
        at = body + size + (size & 1)
      }
      if (w <= 0 || h <= 0) fail("missing strf geometry")
      if (moviFcc < 0) fail("no movi list")
      val wk = walked.result(); val ix = idx.result()
      if (walkMovi) {
        if (nf >= 0 && wk.length != nf)
          fail(s"avih says $nf frames, movi walk found ${wk.length}")
        if (haveIdx && ix != wk)
          fail(s"idx1 disagrees with the movi walk (${ix.length} vs ${wk.length} entries)")
      }
      Layout(w, h, fps, if (walkMovi) wk.length else ix.length, moviFcc, wk, ix)
    }

    def decode(bytes: Array[Byte]): Avi = {
      val l = layout(bytes)
      Avi(l.w, l.h, l.fps,
        l.walked.map(off => dibDecode(bytes, l.moviFcc + off + 8, l.w, l.h)))
    }

    /** Random access: decode ONLY frame `k`, located through idx1 — the
      * movi payload is never scanned (layout skips its inner walk), so
      * seeking frame 900 of a 1000-frame file reads header + index +
      * one frame, which is the point of an indexed container.
      */
    def frameAt(bytes: Array[Byte], k: Int): Raster = {
      val l = layout(bytes, walkMovi = false)
      require(k >= 0 && k < l.idx.length, s"frame $k of ${l.idx.length}")
      dibDecode(bytes, l.moviFcc + l.idx(k) + 8, l.w, l.h)
    }
  }

  /** Sniff the container from magic bytes — the decode dispatch a real
    * media lake needs (payloads arrive as opaque binaries).
    */
  def decodeAny(bytes: Array[Byte]): Vector[Raster] =
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M')
      Vector(BmpCodec.decode(bytes))
    else PpmStream.decode(bytes)

  /** Nearest-neighbor resize (floor mapping: src = out * srcDim / outDim) —
    * mirrored exactly by the oracle's integer-division index math.
    */
  def resizeNearest(img: Raster, outW: Int, outH: Int): Raster = {
    val rgb = new Array[Byte](outW * outH * 3)
    var oy = 0
    while (oy < outH) {
      val sy = oy * img.height / outH
      var ox = 0
      while (ox < outW) {
        val sx = ox * img.width / outW
        val src = (sy * img.width + sx) * 3
        val dst = (oy * outW + ox) * 3
        rgb(dst) = img.rgb(src); rgb(dst + 1) = img.rgb(src + 1)
        rgb(dst + 2) = img.rgb(src + 2)
        ox += 1
      }
      oy += 1
    }
    Raster(outW, outH, rgb)
  }
}
