package graft

import graft.multimodal.Codecs
import graft.multimodal.Codecs._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pixel-exact round-trip properties for the real multimodal codecs:
  * binary P6 PPM, 24-bit BI_RGB BMP (row padding, BGR, bottom-up), and
  * the concatenated-PPM frame stream.
  */
class CodecSpec extends AnyFunSuite {

  /** Deterministic sampling harness over ScalaCheck generators (the
    * scalatest-scalacheck bridge isn't on the classpath).
    */
  private def forAll[A](g: Gen[A], n: Int = 60)(f: A => Unit): Unit = {
    var seed = Seed(7L)
    var i = 0
    while (i < n) {
      g.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private val dimGen: Gen[(Int, Int, Long)] = for {
    w <- Gen.choose(1, 40)
    h <- Gen.choose(1, 30)
    id <- Gen.choose(0L, 1000000L)
  } yield (w, h, id)

  test("PPM round-trips pixel-exactly for arbitrary dims") {
    forAll(dimGen) { case (w, h, id) =>
      val img = Codecs.generate(id, w, h)
      val back = PpmCodec.decode(PpmCodec.encode(img))
      assert(back.width === w && back.height === h)
      assert(back.rgb.toSeq === img.rgb.toSeq)
    }
  }

  test("PPM decoder handles comments and arbitrary header whitespace") {
    val img = Codecs.generate(42L, 3, 2)
    val header = "P6 # a comment\n# another comment line\n  3\t2 # dims\n255\n"
    val bytes = header.getBytes("US-ASCII") ++ img.rgb
    val back = PpmCodec.decode(bytes)
    assert(back.rgb.toSeq === img.rgb.toSeq)
  }

  test("PPM decoder rejects bad magic, truncation, and wrong maxval") {
    val img = Codecs.generate(7L, 2, 2)
    val good = PpmCodec.encode(img)
    assertThrows[IllegalArgumentException](PpmCodec.decode("P5\n2 2\n255\n".getBytes ++ img.rgb))
    assertThrows[IllegalArgumentException](PpmCodec.decode(good.dropRight(1)))
    assertThrows[IllegalArgumentException](PpmCodec.decode("P6\n2 2\n65535\n".getBytes ++ img.rgb))
  }

  test("BMP round-trips pixel-exactly, including padded row widths") {
    // w=1..4 covers every padding residue (3,2,1,0 pad bytes per row)
    for (w <- 1 to 9; h <- Seq(1, 3, 5)) {
      val img = Codecs.generate(99L, w, h)
      val bytes = BmpCodec.encode(img)
      // encoded size embeds the 4-byte-aligned row stride
      val stride = ((w * 3 + 3) / 4) * 4
      assert(bytes.length === 54 + stride * h)
      val back = BmpCodec.decode(bytes)
      assert(back.width === w && back.height === h)
      assert(back.rgb.toSeq === img.rgb.toSeq)
    }
  }

  test("BMP round-trips for arbitrary dims (property)") {
    forAll(dimGen) { case (w, h, id) =>
      val img = Codecs.generate(id, w, h)
      assert(BmpCodec.decode(BmpCodec.encode(img)).rgb.toSeq === img.rgb.toSeq)
    }
  }

  test("BMP decoder honors top-down (negative height) layout") {
    val img = Codecs.generate(5L, 4, 3)
    val bytes = BmpCodec.encode(img)
    // flip to top-down: negate height and reorder rows accordingly
    val h = img.height
    val stride = ((img.width * 3 + 3) / 4) * 4
    val flipped = bytes.clone()
    val negH = -h
    flipped(22) = negH.toByte; flipped(23) = (negH >> 8).toByte
    flipped(24) = (negH >> 16).toByte; flipped(25) = (negH >> 24).toByte
    for (y <- 0 until h)
      System.arraycopy(bytes, 54 + (h - 1 - y) * stride, flipped, 54 + y * stride, stride)
    assert(BmpCodec.decode(flipped).rgb.toSeq === img.rgb.toSeq)
  }

  test("BMP decoder rejects unsupported bit depths and compression") {
    val bytes = BmpCodec.encode(Codecs.generate(1L, 2, 2))
    val bad8 = bytes.clone(); bad8(28) = 8
    assertThrows[IllegalArgumentException](BmpCodec.decode(bad8))
    val rle = bytes.clone(); rle(30) = 1 // BI_RLE8
    assertThrows[IllegalArgumentException](BmpCodec.decode(rle))
  }

  test("PPM stream round-trips multi-frame sequences in order") {
    val frames = (0 until 4).map(f => Codecs.generate(11L, 5, 4, f))
    val decoded = PpmStream.decode(PpmStream.encode(frames))
    assert(decoded.size === 4)
    decoded.zip(frames).foreach { case (d, o) => assert(d.rgb.toSeq === o.rgb.toSeq) }
  }

  test("decodeAny dispatches on container magic") {
    val img = Codecs.generate(3L, 6, 6)
    assert(Codecs.decodeAny(BmpCodec.encode(img)).head.rgb.toSeq === img.rgb.toSeq)
    assert(Codecs.decodeAny(PpmCodec.encode(img)).head.rgb.toSeq === img.rgb.toSeq)
    assert(Codecs.decodeAny(PpmStream.encode(Seq(img, img))).size === 2)
  }

  test("Y4M round-trips mono frames exactly and keeps header geometry") {
    for (nf <- Seq(1, 3, 5)) {
      val frames = (0 until nf).map(f => Codecs.generateLuma(9L, 12, 8, f))
      val clip = Codecs.Y4mCodec.decode(Codecs.Y4mCodec.encode(12, 8, 30, 1, frames))
      assert(clip.width === 12 && clip.height === 8)
      assert(clip.fpsNum === 30 && clip.fpsDen === 1)
      assert(clip.frames.size === nf)
      clip.frames.zip(frames).foreach { case (d, o) => assert(d.toSeq === o.toSeq) }
    }
  }

  test("Y4M header tags parse in any order; unknown tags and FRAME params skip") {
    val y = Array.tabulate(6)(i => (i * 7).toByte)
    val bytes = ("YUV4MPEG2 F24:1 Xcolorrange=FULL H2 Cmono W3 A1:1\n" +
      "FRAME Xtimecode=00\n").getBytes("US-ASCII") ++ y
    val clip = Codecs.Y4mCodec.decode(bytes)
    assert(clip.width === 3 && clip.height === 2)
    assert(clip.fpsNum === 24)
    assert(clip.frames.size === 1 && clip.frames.head.toSeq === y.toSeq)
  }

  test("Y4M C420 walks quarter-size chroma planes and returns luma") {
    // 4x2 C420: 8 luma + 2+2 chroma per frame, two frames
    val f1y = Array.tabulate(8)(i => i.toByte)
    val f2y = Array.tabulate(8)(i => (100 + i).toByte)
    val chroma = Array.fill(4)(0x80.toByte)
    val bytes = "YUV4MPEG2 W4 H2 F25:1 C420jpeg\n".getBytes("US-ASCII") ++
      "FRAME\n".getBytes("US-ASCII") ++ f1y ++ chroma ++
      "FRAME\n".getBytes("US-ASCII") ++ f2y ++ chroma
    val clip = Codecs.Y4mCodec.decode(bytes)
    assert(clip.frames.size === 2)
    assert(clip.frames(0).toSeq === f1y.toSeq)
    assert(clip.frames(1).toSeq === f2y.toSeq) // chroma skip stayed in sync
  }

  test("Y4M rejects bad magic, truncated frames, and odd C420 geometry") {
    assertThrows[IllegalArgumentException](
      Codecs.Y4mCodec.decode("RIFF1234".getBytes("US-ASCII")))
    val ok = Codecs.Y4mCodec.encode(4, 4, 30, 1, Seq(new Array[Byte](16)))
    assertThrows[IllegalArgumentException](
      Codecs.Y4mCodec.decode(ok.dropRight(1))) // truncated raster
    assertThrows[IllegalArgumentException](Codecs.Y4mCodec.decode(
      "YUV4MPEG2 W3 H2 F25:1 C420\nFRAME\n".getBytes("US-ASCII"))) // odd W
  }

  test("WAV round-trips samples exactly for mono and stereo") {
    for (ch <- Seq(1, 2); n <- Seq(1, 7, 250)) {
      val clip = Codecs.generatePcm(37L, ch, n)
      val back = WavCodec.decode(WavCodec.encode(clip))
      assert(back.channels === ch && back.sampleRate === 8000)
      assert(back.samples.toSeq === clip.samples.toSeq)
    }
  }

  test("generated WAVs are frame-aligned: data chunk is a multiple of blockAlign") {
    for (ch <- Seq(1, 2); n <- Seq(1, 7, 101, 250)) {
      val clip = Codecs.generatePcm(11L, ch, n)
      assert(clip.samples.length % ch === 0, s"ch=$ch n=$n")
      assert(clip.samples.length === n - n % ch)
      val bytes = WavCodec.encode(clip)
      // data bytes = samples * 2; blockAlign = channels * 2
      assert((clip.samples.length * 2) % (ch * 2) === 0)
      assert(WavCodec.decode(bytes).samples.length === clip.samples.length)
    }
  }

  test("WAV decoder skips unknown chunks (LIST/INFO) and honors word alignment") {
    val clip = Codecs.generatePcm(5L, 2, 40)
    val plain = WavCodec.encode(clip)
    // splice an odd-sized LIST chunk between fmt and data: 12-byte header
    // region stays, then fmt (24 bytes at offset 12), then LIST, then the rest
    val listBody = "INFOx".getBytes("US-ASCII") // odd size → 1 pad byte
    val chunk = new java.io.ByteArrayOutputStream()
    chunk.write(plain, 0, 36) // through end of fmt chunk
    chunk.write("LIST".getBytes("US-ASCII"))
    chunk.write(Array[Byte]((listBody.length & 0xff).toByte, 0, 0, 0))
    chunk.write(listBody)
    chunk.write(0) // alignment pad
    chunk.write(plain, 36, plain.length - 36) // data chunk onward
    val back = WavCodec.decode(chunk.toByteArray)
    assert(back.samples.toSeq === clip.samples.toSeq)
  }

  test("WAV decoder rejects non-PCM, bad depth, and missing data") {
    val bytes = WavCodec.encode(Codecs.generatePcm(1L, 1, 4))
    val nonPcm = bytes.clone(); nonPcm(20) = 3 // IEEE float format tag
    assertThrows[IllegalArgumentException](WavCodec.decode(nonPcm))
    val depth8 = bytes.clone(); depth8(34) = 8
    assertThrows[IllegalArgumentException](WavCodec.decode(depth8))
    assertThrows[IllegalArgumentException](WavCodec.decode(bytes.take(36)))
  }

  test("AVI round-trips frames pixel-exactly, geometry from strf") {
    import Codecs.AviCodec
    val frames = (0 until 4).map(f => Codecs.generate(9L, 7, 5, f))
    val bytes = AviCodec.encode(25, frames)
    val back = AviCodec.decode(bytes)
    assert(back.width === 7 && back.height === 5 && back.fps === 25)
    assert(back.frames.length === 4)
    back.frames.zip(frames).foreach { case (a, b) =>
      assert(a.rgb.toSeq === b.rgb.toSeq)
    }
  }

  test("AVI frameAt seeks through idx1 without a movi walk") {
    import Codecs.AviCodec
    val frames = (0 until 5).map(f => Codecs.generate(3L, 6, 4, f))
    val bytes = AviCodec.encode(30, frames)
    // each frame individually addressable, in any order
    Seq(4, 0, 2).foreach { k =>
      assert(AviCodec.frameAt(bytes, k).rgb.toSeq === frames(k).rgb.toSeq)
    }
    assertThrows[IllegalArgumentException](AviCodec.frameAt(bytes, 5))
  }

  test("AVI decoder rejects desynchronized idx1 and frame-count lies") {
    import Codecs.AviCodec
    val bytes = AviCodec.encode(25, (0 until 3).map(f => Codecs.generate(2L, 4, 4, f)))
    // corrupt the LAST idx1 entry's offset field (idx1 sits at the tail:
    // 16 bytes per entry, offset lives at entry + 8)
    val badIdx = bytes.clone()
    badIdx(badIdx.length - 8) = (badIdx(badIdx.length - 8) + 4).toByte
    assertThrows[IllegalArgumentException](AviCodec.decode(badIdx))
    // lie in avih dwTotalFrames (offset: RIFF 12 + LIST hdr 12 + avih 8 + 16)
    val badCount = bytes.clone()
    badCount(12 + 12 + 8 + 16) = 9
    assertThrows[IllegalArgumentException](AviCodec.decode(badCount))
    // bpp != 24 in strf is refused loudly
    val bad16 = bytes.clone()
    val strfAt = {
      // locate 'strf' by scan (test-side only)
      val s = new String(bad16, "ISO-8859-1").indexOf("strf")
      require(s > 0); s
    }
    bad16(strfAt + 8 + 14) = 16
    assertThrows[IllegalArgumentException](AviCodec.decode(bad16))
  }

  test("nearest-neighbor resize: identity at same dims, correct floor mapping") {
    val img = Codecs.generate(8L, 10, 6)
    assert(Codecs.resizeNearest(img, 10, 6).rgb.toSeq === img.rgb.toSeq)
    val out = Codecs.resizeNearest(img, 4, 3)
    for (oy <- 0 until 3; ox <- 0 until 4; c <- 0 until 3) {
      val sx = ox * 10 / 4
      val sy = oy * 6 / 3
      assert(out.rgb((oy * 4 + ox) * 3 + c) === img.rgb((sy * 10 + sx) * 3 + c))
    }
  }

  test("dHash: invariant to uniform brightness shift, sensitive to gradient flip") {
    import graft.multimodal.Multimodal.dhashOf
    val img = Codecs.generate(11L, 16, 12)
    val h0 = dhashOf(img)
    // +24 brightness on every channel (saturating add keeps order where
    // unclipped; use a margin-safe shift by remapping into 0..200 first)
    val capped = Codecs.Raster(16, 12,
      img.rgb.map(b => ((b & 0xff) * 200 / 255).toByte))
    val shifted = Codecs.Raster(16, 12,
      capped.rgb.map(b => ((b & 0xff) + 24).toByte))
    assert(dhashOf(shifted) === dhashOf(capped),
      "gradient bits must survive a uniform brightness shift")
    // horizontal mirror flips the gradient structure
    val mirrored = {
      val out = new Array[Byte](img.rgb.length)
      for (y <- 0 until 12; x <- 0 until 16; c <- 0 until 3)
        out((y * 16 + x) * 3 + c) = img.rgb((y * 16 + (15 - x)) * 3 + c)
      Codecs.Raster(16, 12, out)
    }
    assert(dhashOf(mirrored) !== h0, "mirror must change the hash")
  }

  test("audio fingerprint: gain-invariant energy shape, stride-aware") {
    import graft.multimodal.Multimodal.audioFpOf
    val mono = Codecs.generatePcm(5L, 1, 320)
    val fp0 = audioFpOf(mono)
    // doubling the gain scales every window energy by 4 — order unchanged
    val louder = Codecs.Pcm(1, 8000, mono.samples.map(s => (s * 2).toShort))
    assert(audioFpOf(louder) === fp0, "uniform gain must not change the key")
    // a stereo clip fingerprints channel 0 only: interleaving the same
    // channel-0 stream with arbitrary channel-1 data leaves the key alone
    val stereo = {
      val out = new Array[Short](mono.samples.length * 2)
      for (i <- mono.samples.indices) {
        out(2 * i) = mono.samples(i)
        out(2 * i + 1) = 1234.toShort
      }
      Codecs.Pcm(2, 8000, out)
    }
    assert(audioFpOf(stereo) === fp0, "channel-1 content leaked into the key")
    // the 64-window count-normalized near-dup fingerprint carries the
    // same invariances (cross-multiplied comparisons: gain scales every
    // window energy equally, and channel-1 samples never enter)
    import graft.multimodal.Multimodal.audioNdFpOf
    val big = Codecs.generatePcm(5L, 1, 320)
    val fp64 = audioNdFpOf(big)
    val bigLoud = Codecs.Pcm(1, 8000, big.samples.map(s => (s * 3).toShort))
    assert(audioNdFpOf(bigLoud) === fp64, "64-window: gain leaked")
    val bigStereo = {
      val out = new Array[Short](big.samples.length * 2)
      for (i <- big.samples.indices) {
        out(2 * i) = big.samples(i)
        out(2 * i + 1) = 987.toShort
      }
      Codecs.Pcm(2, 8000, out)
    }
    assert(audioNdFpOf(bigStereo) === fp64, "64-window: channel-1 leaked")
    // count normalization: two windows of DIFFERENT sample counts but
    // identical per-sample energy must compare equal on both sides
    // (raw sums would make the longer window always win) — 96 samples
    // over 64 windows gives a 1/2-count pattern; a constant signal
    // must fingerprint to 0
    val const = Codecs.Pcm(1, 8000, Array.fill[Short](96)(500))
    assert(audioNdFpOf(const) === 0L, "count bias leaked into the key")
  }

  test("near-dup clip synthesis: planted variants sit at hamming <= 2") {
    import graft.multimodal.Multimodal.{audioNdFpOf, generatePcmNd}
    // ids 40..43 form one cluster: id 40 is the base, 41..43 re-gain one
    // window each — every planted pair must sit within the verify radius
    val fps = (40L to 43L).map(id => audioNdFpOf(generatePcmNd(id)))
    for (a <- 0 until 4; b <- a + 1 until 4) {
      val ham = java.lang.Long.bitCount(fps(a) ^ fps(b))
      if (a == 0)
        assert(ham <= 2, s"base-variant pair $a/$b at hamming $ham")
    }
    // different clusters must not share the fingerprint (the squared
    // seed mix diffuses per cluster)
    val other = audioNdFpOf(generatePcmNd(80L))
    assert(other !== fps(0), "cross-cluster fingerprint collision")
    // video lane: a variant perturbs exactly ONE frame, so every other
    // frame's dHash is identical to the base clip's
    import graft.multimodal.Multimodal.{generateLumaNd, lumaDhashOf}
    val cl = 10L; val w = 12; val h = 8; val nf = (cl % 4 + 2).toInt
    val base = (0 until nf).map(f => lumaDhashOf(generateLumaNd(cl, 0, w, h, f, nf), w, h))
    val vari = (0 until nf).map(f => lumaDhashOf(generateLumaNd(cl, 2, w, h, f, nf), w, h))
    val touched = (2 - 1) % nf
    (0 until nf).foreach { f =>
      if (f != touched) assert(vari(f) === base(f), s"untouched frame $f drifted")
    }
    assert(base.toSet.size > 1 || nf == 1, "frames should differ across indexes")
  }

  test("media banding: corpus-size step and the pigeonhole recall guarantee") {
    import graft.multimodal.Multimodal.mediaBands
    assert(mediaBands(0L) === 4)
    assert(mediaBands(8388607L) === 4)
    assert(mediaBands(8388608L) === 2)
    // pigeonhole: ANY two 64-bit keys within hamming ≤ 3 share at least
    // one intact 16-bit sub-band under the 4-band split — the stated
    // recall guarantee covering the audio ≤2 and video ≤3 verify radii
    // (deterministic LCG pairs, 0–3 flipped bits each)
    var seed = 42L
    def next(): Long = {
      seed = seed * 6364136223846793005L + 1442695040888963407L; seed
    }
    for (_ <- 0 until 2000) {
      val a = next()
      var b = a
      val flips = (math.floorMod(next(), 4L)).toInt
      for (_ <- 0 until flips) b ^= 1L << math.floorMod(next(), 64L).toInt
      val shares = (0 until 4).exists { band =>
        ((a >>> (16 * band)) & 0xffffL) == ((b >>> (16 * band)) & 0xffffL)
      }
      assert(shares,
        s"hamming-${java.lang.Long.bitCount(a ^ b)} pair missed by 4×16 banding")
    }
  }

  test("luma dHash: brightness-shift invariant, structure-sensitive") {
    import graft.multimodal.Multimodal.{frameSigOf, lumaDhashOf}
    val w = 16; val h = 8
    val fr = Array.tabulate(w * h)(p => ((p * 37 + 11) % 200).toByte)
    val d0 = lumaDhashOf(fr, w, h)
    // a uniform brightness shift moves every cell average equally
    val brighter = fr.map(b => ((b & 0xff) + 3).toByte)
    assert(lumaDhashOf(brighter, w, h) === d0, "brightness leaked")
    // the 64-bit key sees structure the 8-bit row signature cannot: a
    // frame constant along rows but ramping across columns has equal
    // row sums (sig 0) yet non-trivial column gradients
    val colRamp = Array.tabulate(w * h)(p => (((p % w) * 8) % 251).toByte)
    assert(frameSigOf(colRamp, w, h) === 0L, "row sums are equal here")
    assert(lumaDhashOf(colRamp, w, h) !== 0L, "column ramp missed")
    // a one-pixel edit flips at most a few gradient bits, never the key
    // space (the near-dup contract)
    val edited = fr.clone(); edited(5) = ((fr(5) & 0xff) + 40).toByte
    val ham = java.lang.Long.bitCount(lumaDhashOf(edited, w, h) ^ d0)
    assert(ham <= 4, s"local edit moved $ham bits")
  }

  test("video fingerprint: brightness-shift invariant, frame-order sensitive") {
    import graft.multimodal.Multimodal.videoFpOf
    val w = 8; val h = 8
    def frame(seed: Int): Array[Byte] =
      Array.tabulate(w * h)(p => ((seed * 7 + p * 13) % 200).toByte)
    val f0 = frame(3); val f1 = frame(11); val f2 = frame(27)
    val clip = Codecs.Y4m(w, h, 30, 1, Vector(f0, f1, f2))
    val fp0 = videoFpOf(clip)
    // uniform brightness shift moves every row sum equally — key unchanged
    val brighter = Codecs.Y4m(w, h, 30, 1,
      Vector(f0, f1, f2).map(_.map(b => ((b & 0xff) + 30).toByte)))
    assert(videoFpOf(brighter) === fp0, "uniform brightness leaked into the key")
    // reordering the same frames must change the key (temporal polynomial)
    val reordered = Codecs.Y4m(w, h, 30, 1, Vector(f1, f0, f2))
    assert(videoFpOf(reordered) !== fp0, "frame order must enter the key")
  }
}
