package graft

/** Empirical scaling-slope artifact: combines two [[Bench]] full dumps
  * (the same registry timed at two scale factors whose ROW COUNTS are
  * 10x apart) into docs/scaling_slopes.json — per query, the measured
  * wall-time ratio hi/lo with anything super-linear flagged and carrying
  * its gc/cache attribution from the high-SF run.
  *
  * This is the check the plan-reading audit cannot do: docs/SCALING.md
  * ARGUES each operator family is linear (bucketed candidate joins,
  * map-side combines, bounded heaps); this artifact MEASURES it on the
  * data already on disk. A slope past the flag ratio on a non-trivial
  * timing means some stage's work grew faster than its input — a plan
  * that would not survive the 100x scale-up whatever the explain dump
  * says. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=…/sf0.01 sbt "runMain graft.Bench"   # dump A
  *   SPARK_GRAFT_SF_DIR=…/sf0.1  sbt "runMain graft.Bench"   # dump B
  *   sbt "runMain graft.ScalingReport A.json B.json docs/scaling_slopes.json"
  *
  * The slope computation itself is [[Bench.scalingSlopes]] (pure,
  * BenchSpec-pinned); this main is IO glue.
  */
object ScalingReport {
  private def r3(v: Double): String =
    "%.3f".formatLocal(java.util.Locale.ROOT, v)

  /** Max gc_ms / cache_mem_mb / cache_disk_mb per query from a full
    * dump — attribution columns for flagged entries.
    */
  private def parseDiag(txt: String): Map[String, (Long, Long, Long)] =
    ("\"([A-Za-z0-9_]+)\":\\{\"sec\":\\[[^\\]]*\\],\"gc_ms\":\\[([^\\]]*)\\]," +
      "\"cache_mem_mb\":\\[([^\\]]*)\\],\"cache_disk_mb\":\\[([^\\]]*)\\]").r
      .findAllMatchIn(txt).map { m =>
        def mx(s: String): Long = {
          val vs = s.split(",").toSeq.map(_.trim).filter(_.matches("-?\\d+"))
          if (vs.isEmpty) 0L else vs.map(_.toLong).max
        }
        m.group(1) -> ((mx(m.group(2)), mx(m.group(3)), mx(m.group(4))))
      }.toMap

  def main(args: Array[String]): Unit = {
    val (loPath, hiPath, outPath) = (args(0), args(1), args(2))
    // optional 4th/5th args: SF labels for the artifact header (the
    // second decade runs on the builder-generated gsf0.1/gsf1 corpora)
    val loLabel = if (args.length > 3) args(3) else "sf0.01"
    val hiLabel = if (args.length > 4) args(4) else "sf0.1"
    def medians(path: String): Map[String, Double] =
      Bench.parseFullDump(new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        "UTF-8")).map { case (k, secs) => k -> Bench.median(secs) }
    val lo = medians(loPath)
    val hi = medians(hiPath)
    val hiDiag = parseDiag(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(hiPath)),
      "UTF-8"))
    val slopes = Bench.scalingSlopes(lo, hi)
    val flagged = slopes.collect { case (n, _, _, _, true) => n }
    val entries = slopes.map { case (n, l, h, s, f) =>
      val diag = if (f) {
        val (gc, mem, disk) = hiDiag.getOrElse(n, (0L, 0L, 0L))
        s""","diag":{"gc_ms":$gc,"cache_mem_mb":$mem,"cache_disk_mb":$disk}"""
      } else ""
      s""""$n":{"lo_sec":${r3(l)},"hi_sec":${r3(h)},"slope":${r3(s)},""" +
        s""""flagged":$f$diag}"""
    }
    val json =
      s"""{"sf_lo":"$loLabel","sf_hi":"$hiLabel","rows_ratio":10.0,""" +
        s""""flag_ratio":15.0,"hi_floor_sec":2.0,""" +
        s""""n_queries":${slopes.size},""" +
        s""""n_flagged":${flagged.size},""" +
        s""""flagged":[${flagged.map("\"" + _ + "\"").mkString(",")}],""" +
        s""""queries":{${entries.mkString(",")}}}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath), json.getBytes("UTF-8"))
    println(s"[scaling] ${slopes.size} queries, ${flagged.size} flagged -> $outPath")
    flagged.foreach { n =>
      val (_, l, h, s, _) = slopes.find(_._1 == n).get
      println(f"[scaling]   FLAGGED $n: ${l}%.3f s -> ${h}%.3f s (${s}%.1fx)")
    }
  }
}
