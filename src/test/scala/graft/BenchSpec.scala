package graft

import org.scalatest.funsuite.AnyFunSuite
import Bench.Timing

/** The bench JSON contract: error markers, budget cut, _other rollup. */
class BenchSpec extends AnyFunSuite {

  test("a query that throws shows as \"err\", never as a fast timing") {
    val line = Bench.buildLine(
      Seq(Timing("q_ok", 1.5, err = false), Timing("q_broken", 0.001, err = true)),
      "/sf")
    assert(line.contains("\"q_broken\":\"err\""))
    assert(line.contains("\"q_ok\":1.500"))
    assert(line.contains("\"errors\":1"))
  }

  test("errors sort ahead of slow queries and never land in _other") {
    val many = (1 to 200).map(i => Timing(f"q$i%03d", 200 - i * 0.5, err = false))
    val line = Bench.buildLine(many :+ Timing("q_broken", 0.0, err = true), "/sf",
      budget = 400)
    assert(line.indexOf("\"q_broken\":\"err\"") >= 0)
    assert(line.indexOf("\"q_broken\"") < line.indexOf("\"q001\""))
    assert(line.contains("_other_"))
  }

  test("budgeted map is the slowest-N prefix with an exact _other rollup") {
    val ts = Seq(Timing("slow", 10.0, err = false), Timing("mid", 5.0, err = false),
      Timing("fast1", 1.0, err = false), Timing("fast2", 0.5, err = false))
    // budget chosen so only the two slowest fit
    val line = Bench.buildLine(ts, "/sf", budget = 60 + 26)
    assert(line.contains("\"slow\":10.000"))
    assert(line.contains("\"mid\":5.000"))
    assert(!line.contains("fast1"))
    assert(line.contains("\"_other_2q\":1.500"))
    assert(line.contains("\"value\":16.500"))
  }

  test("mass breakage: errors overflowing the budget surface as an err marker, not seconds") {
    // so many errored queries that the budget cannot list them all
    val broken = (1 to 100).map(i => Timing(f"broken_query_number_$i%03d", 0.001, err = true))
    val ok = Seq(Timing("survivor", 2.0, err = false))
    val line = Bench.buildLine(broken ++ ok, "/sf", budget = 300)
    assert(line.contains("\"errors\":100"))
    // dropped errored queries appear as an explicit err marker...
    assert("\"_other_err_\\d+\":\"err\"".r.findFirstIn(line).isDefined)
    // ...and the numeric rollup holds exactly the dropped OK seconds —
    // the 100 near-zero errored timings never read as a fast bucket
    assert(line.contains("\"_other_1q\":2.000"))
  }

  test("valid JSON even when no entry fits the budget") {
    val line = Bench.buildLine(
      Seq(Timing("a_query_name_longer_than_the_tiny_content_budget", 0.1, err = true),
        Timing("another_equally_long_query_name_that_cannot_fit", 1.0, err = false)),
      "/sf", budget = 80)
    // no leading comma inside the map, both rollups present
    assert(line.contains("\"queries\":{\"_other_err_1\":\"err\",\"_other_1q\":1.000}"))
  }

  test("median is the middle of 3 runs, robust to one outlier") {
    assert(Bench.median(Seq(1.0, 15.0, 1.2)) === 1.2)
    assert(Bench.median(Seq(0.5)) === 0.5)
    // even count: upper median, still never the outlier max... unless n=2
    assert(Bench.median(Seq(1.0, 2.0, 3.0, 99.0)) === 3.0)
  }

  test("multi-run benches carry reps and max_spread; single-run contract unchanged") {
    val ts = Seq(Timing("q", 1.0, err = false))
    val single = Bench.buildLine(ts, "/sf")
    assert(!single.contains("reps"))
    val multi = Bench.buildLine(ts, "/sf", reps = 3, maxSpread = 0.4567)
    assert(multi.contains("\"reps\":3"))
    assert(multi.contains("\"max_spread\":0.457"))
  }

  test("steal_pct appears only when measurable; absent keeps the contract") {
    val ts = Seq(Timing("q", 1.0, err = false))
    assert(!Bench.buildLine(ts, "/sf").contains("steal_pct"))
    val withSteal = Bench.buildLine(ts, "/sf", stealPct = 27.94)
    assert(withSteal.contains("\"steal_pct\":27.94"))
    // still valid JSON envelope
    assert(withSteal.startsWith("{\"metric\":\"total\""))
    assert(withSteal.endsWith("\"sf\":\"/sf\"}"))
  }

  test("diag flags 2x-vs-prior and high-spread queries, capped and slowest-first") {
    val runs = Seq(
      "q_regressed" -> Seq(10.0, 10.5, 9.8),   // prior 2.0 → flagged
      "q_steady" -> Seq(3.0, 3.1, 2.9),         // prior 3.0 → not flagged
      "q_noisy" -> Seq(1.0, 9.0, 3.0),          // spread 2.7 on 3 s → flagged
      "q_fast_jitter" -> Seq(0.01, 0.05, 0.02)) // tiny: never flagged
    val d = Map("q_regressed" -> Bench.QDiag(gcMs = 1234, memMb = 512,
      inMb = 310, rdMb = 7, shMb = 12))
    val prior = Map("q_regressed" -> 2.0, "q_steady" -> 3.0)
    val diag = Bench.diagEntries(runs, d, prior)
    assert(diag.contains("\"q_regressed\":{\"gc_ms\":1234,"))
    assert(diag.contains("\"mem_mb\":512"))
    // I/O deltas ride each entry (r14 verdict's ask: the four
    // calibFactor~1 flags had no input-read attribution): in_mb =
    // logical read bytes, rd_mb = storage-layer bytes (page-cache
    // misses), sh_mb = shuffle read+write
    assert(diag.contains("\"in_mb\":310") && diag.contains("\"rd_mb\":7") &&
      diag.contains("\"sh_mb\":12"))
    assert(diag.contains("\"q_noisy\""))
    assert(!diag.contains("q_steady") && !diag.contains("q_fast_jitter"))
    // slowest first
    assert(diag.indexOf("q_regressed") < diag.indexOf("q_noisy"))
    // the diag field rides inside the line and the budget still holds
    val line = Bench.buildLine(Seq(Timing("q_regressed", 10.0, err = false)),
      "/sf", diagJson = diag)
    assert(line.contains("\"diag\":{\"q_regressed\""))
    assert(line.startsWith("{\"metric\":\"total\""))
    // the cap cuts at the first non-fit: the diag is always the
    // slowest-N prefix, never a shorter-named fast entry sneaking in
    val tight = Bench.diagEntries(runs, d, prior, cap = 130)
    assert(tight.contains("q_regressed") && !tight.contains("q_noisy"))
  }

  test("calib fields ride the line together; absent keeps the contract") {
    val t = Seq(Timing("q1", 1.0, err = false))
    val withCalib = Bench.buildLine(t, "/sf", calib1t = 1.234, calib32t = 1.567)
    assert(withCalib.contains("\"calib_1t\":1.234,\"calib_32t\":1.567"))
    val without = Bench.buildLine(t, "/sf")
    assert(!without.contains("calib"))
    // half-measured calibration never emits (both or neither)
    assert(!Bench.buildLine(t, "/sf", calib1t = 1.0).contains("calib"))
  }

  test("calib_io fields ride together; a no-parquet dir yields absent") {
    val t = Seq(Timing("q1", 1.0, err = false))
    val withIo = Bench.buildLine(t, "/sf",
      calibIoMbps = 812.5, calibIoWarmMbps = 9123.4)
    assert(withIo.contains(
      "\"calib_io_mbps\":812.500,\"calib_io_warm_mbps\":9123.400"))
    assert(!Bench.buildLine(t, "/sf").contains("calib_io"))
    // ioSpin on a parquet-less dir reports (-1,-1), which buildLine
    // must drop rather than publish a negative throughput
    val empty = java.nio.file.Files.createTempDirectory("iospin_empty")
    val (c, w) = try Bench.ioSpin(empty.toString)
      finally java.nio.file.Files.delete(empty)
    assert(c == -1.0 && w == -1.0)
    assert(!Bench.buildLine(t, "/sf", calibIoMbps = c, calibIoWarmMbps = w)
      .contains("calib_io"))
  }

  test("ioSpin reads fixed warm work and reports sane throughput") {
    val dir = java.nio.file.Files.createTempDirectory("iospin").toFile
    try {
      // a 4 MiB fake parquet file: warmBytes=16 MiB → exactly 4 sweeps
      val f = new java.io.File(dir, "t.parquet")
      val out = new java.io.FileOutputStream(f)
      try out.write(new Array[Byte](4 << 20)) finally out.close()
      val (cold, warm) = Bench.ioSpin(dir.getPath, warmBytes = 16L << 20)
      assert(cold > 0.0 && warm > 0.0, s"cold=$cold warm=$warm")
      // warm passes re-read page-cached bytes: at least not 100x slower
      // than the first pass (a loose sanity floor, not a perf pin)
      assert(warm > cold / 100.0)
      // the first pass is CAPPED — fixed work at any SF, per docstring
      val (cap, _) = Bench.ioSpin(dir.getPath, warmBytes = 1L << 20,
        capBytes = 1L << 20)
      assert(cap > 0.0)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("ioSpin reads Spark-written *.parquet DIRECTORIES and survives empty files") {
    // SfGen writes each table as t.parquet/part-*.parquet — the probe
    // must see those bytes (the r15 review caught the files-only
    // filter silently dropping calib_io on the scaling-decade runs)
    val dir = java.nio.file.Files.createTempDirectory("iospin_dirs").toFile
    try {
      val tbl = new java.io.File(dir, "t.parquet"); tbl.mkdir()
      val part = new java.io.File(tbl, "part-0000.snappy.parquet")
      val out = new java.io.FileOutputStream(part)
      try out.write(new Array[Byte](2 << 20)) finally out.close()
      val (cold, warm) = Bench.ioSpin(dir.getPath, warmBytes = 4L << 20)
      assert(cold > 0.0 && warm > 0.0, s"cold=$cold warm=$warm")
      // a zero-byte parquet must report unmeasurable, never spin forever
      val empty = java.nio.file.Files.createTempDirectory("iospin_zero").toFile
      val zf = new java.io.File(empty, "z.parquet")
      new java.io.FileOutputStream(zf).close()
      try assert(Bench.ioSpin(empty.getPath) === ((-1.0, -1.0)))
      finally { zf.delete(); empty.delete() }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
      }
      rm(dir)
    }
  }

  test("calibFactor host-normalizes the 2x-vs-best flag; spread rule unaffected") {
    val runs = Seq(
      "q_host_slow" -> Seq(4.5, 4.6, 4.4),   // prior 2.0: 2.25x best
      "q_real_regr" -> Seq(9.0, 9.1, 8.9),   // prior 2.0: 4.5x best
      "q_noisy" -> Seq(1.0, 9.0, 3.0))       // spread-flagged regardless
    val prior = Map("q_host_slow" -> 2.0, "q_real_regr" -> 2.0)
    // on the fastest host on record (factor 1) both slow queries flag
    val at1 = Bench.diagEntries(runs, Map.empty, prior)
    assert(at1.contains("q_host_slow") && at1.contains("q_real_regr"))
    // a host measuring 1.4x slower on fixed CPU work raises the bar to
    // 2.8x: the uniform-multiplier entry closes as host-attributed, the
    // genuine regression and the spread signature still fire
    val at14 = Bench.diagEntries(runs, Map.empty, prior, calibFactor = 1.4)
    assert(!at14.contains("q_host_slow"))
    assert(at14.contains("q_real_regr") && at14.contains("q_noisy"))
    // a FASTER host (factor < 1) never loosens the rule below 2x
    val fast = Bench.diagEntries(runs, Map.empty, prior, calibFactor = 0.5)
    assert(fast.contains("q_host_slow"))
  }

  test("calibSpin does fixed work and scales roughly with it") {
    val short = Bench.calibSpin(1, perThread = 2000000L)
    val longer = Bench.calibSpin(1, perThread = 40000000L)
    assert(short > 0.0 && longer > short,
      s"short=$short longer=$longer")
    // multi-thread wall time is per-thread-bound, not summed: 4 threads
    // of the same per-thread work must not take ~4x the single thread
    val mt = Bench.calibSpin(4, perThread = 40000000L)
    assert(mt < 4 * longer, s"mt=$mt 1t=$longer")
  }

  test("diag bytes come out of the queries budget, keeping the line bound") {
    val many = (1 to 300).map(i =>
      Timing(s"very_long_query_name_number_$i", i * 0.01, err = false))
    val diag = """"q":{"gc_ms":1,"spread":9.000,"mem_mb":1,"disk_mb":0}"""
    val line = Bench.buildLine(many, "/sf", diagJson = diag)
    assert(line.length <= 1600 + 120)
    assert(line.contains("\"diag\":"))
  }

  test("flag reference is the MINIMUM across all rounds and the local record") {
    // the r11 ratchet blindspot: comparing against the NEWEST round lets a
    // regression that persists become its own reference after one round
    // and never fire the diagnostics again — the reference must be the
    // best reading the query has EVER had, driver rounds and quiet-host
    // local records alike
    val dir = java.nio.file.Files.createTempDirectory("benchspec").toFile
    try {
      def put(name: String, body: String): Unit =
        java.nio.file.Files.write(new java.io.File(dir, name).toPath,
          body.getBytes("UTF-8"))
      put("BENCH_r01.json", """{"queries":{"q_a":2.0,"q_b":5.0}}""")
      // newest round: q_a regressed — the OLD lastRound rule would adopt
      // 18.0 as the reference and self-exempt the regression
      put("BENCH_r02.json", """{"queries":{"q_a":18.0,"q_b":4.0,"q_c":7.0}}""")
      new java.io.File(dir, "docs").mkdir()
      put("docs/bench_r02_local.json", """{"queries":{"q_c":1.5}}""")
      val best = Bench.bestRoundSecs(dir.getAbsolutePath)
      assert(best("q_a") === 2.0)  // min across rounds, not the newest
      assert(best("q_b") === 4.0)
      assert(best("q_c") === 1.5)  // local quiet-host record counts
      // and a persistent regression now FIRES the diag every round
      val diag = Bench.diagEntries(
        Seq("q_a" -> Seq(18.0, 18.2, 17.9)), Map.empty, best)
      assert(diag.contains("\"q_a\":{"))
    } finally {
      dir.listFiles().foreach { f =>
        if (f.isDirectory) f.listFiles().foreach(_.delete()); f.delete()
      }
      dir.delete()
    }
  }

  test("bestRoundSecs on a dir with no artifacts is empty, never throws") {
    val dir = java.nio.file.Files.createTempDirectory("benchspec2").toFile
    try assert(Bench.bestRoundSecs(dir.getAbsolutePath).isEmpty)
    finally dir.delete()
  }

  test("scaling slopes: hi/lo ratio, flag only super-linear AND non-trivial") {
    val lo = Map("linear" -> 0.5, "super" -> 0.3, "tiny" -> 0.05,
      "const" -> 1.0, "lo_only" -> 2.0)
    val hi = Map("linear" -> 4.8, "super" -> 9.0, "tiny" -> 0.9,
      "const" -> 1.1, "hi_only" -> 3.0)
    val s = Bench.scalingSlopes(lo, hi).map(t => t._1 -> t).toMap
    // linear: 9.6x on 10x rows — not flagged
    assert(!s("linear")._5 && math.abs(s("linear")._4 - 9.6) < 1e-9)
    // super: 30x and hi >= 2 s — flagged
    assert(s("super")._5)
    // tiny: 18x ratio but hi under the floor — jitter, not a scaling law
    assert(!s("tiny")._5)
    // constant-cost query: slope ~1, never flagged
    assert(!s("const")._5)
    // a query present on only one side never produces a slope
    assert(!s.contains("lo_only") && !s.contains("hi_only"))
    // worst scaler leads the artifact
    assert(Bench.scalingSlopes(lo, hi).head._1 === "super")
  }

  test("full-dump parse: rep arrays back out, errored reps dropped") {
    val txt = """{"q_a":{"sec":[1.5,2.5,2.0],"gc_ms":[10,20,30],""" +
      """"cache_mem_mb":[1,1,1],"cache_disk_mb":[0,0,0]},""" +
      """"q_b":{"sec":["err",3.0],"gc_ms":[0,0],"cache_mem_mb":[0,0],""" +
      """"cache_disk_mb":[0,0]},""" +
      """"q_dead":{"sec":["err"],"gc_ms":[0],"cache_mem_mb":[0],""" +
      """"cache_disk_mb":[0]}}"""
    val m = Bench.parseFullDump(txt)
    assert(m("q_a") === Seq(1.5, 2.5, 2.0))
    assert(m("q_b") === Seq(3.0))
    assert(!m.contains("q_dead"))
    assert(Bench.median(m("q_a")) === 2.0)
  }

  test("line stays within the log-tail budget even with many queries") {
    val many = (1 to 300).map(i =>
      Timing(s"very_long_query_name_number_$i", i * 0.01, err = false))
    val line = Bench.buildLine(many, "/root/testdata/sf0.1")
    assert(line.length <= 1600 + 120) // queries map budgeted; envelope is small
    assert(line.endsWith("\"sf\":\"/root/testdata/sf0.1\"}"))
  }
}
