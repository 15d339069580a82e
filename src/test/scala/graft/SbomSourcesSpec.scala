package graft

import java.nio.file.{Files, Paths}

import graft.sources.SbomSources
import org.apache.spark.sql.functions._

/** End-to-end reference-pipeline spec over REAL JSON documents: write
  * CycloneDX + SPDX files, detect, flatten (license fallback chain),
  * merge-dedup, map unknown licenses, write the sorted component table,
  * read it back.
  */
class SbomSourcesSpec extends SparkSpec {

  private val cdxDoc =
    """{
      |  "bomFormat": "CycloneDX",
      |  "specVersion": "1.6",
      |  "version": 1,
      |  "metadata": {
      |    "component": {"type": "application", "name": "service-a", "version": "2.0"}
      |  },
      |  "components": [
      |    {"type": "library", "name": "libfoo", "version": "1.2.3",
      |     "purl": "pkg:generic/libfoo@1.2.3",
      |     "licenses": [{"license": {"id": "MIT"}}]},
      |    {"type": "library", "name": "libbar", "version": "0.9",
      |     "purl": "pkg:generic/libbar@0.9",
      |     "licenses": [{"expression": "Apache-2.0 OR MIT"}]},
      |    {"type": "library", "name": "libbaz", "version": "3.1",
      |     "purl": "pkg:generic/libbaz@3.1",
      |     "properties": [{"name": "spdx:license-concluded", "value": "BSD-3-Clause"}]},
      |    {"type": "library", "name": "mystery", "version": "0.0.1",
      |     "purl": "pkg:generic/mystery@0.0.1"}
      |  ]
      |}""".stripMargin

  private val cdxDoc2 =
    """{
      |  "bomFormat": "CycloneDX",
      |  "specVersion": "1.6",
      |  "version": 1,
      |  "metadata": {
      |    "component": {"type": "application", "name": "service-b", "version": "1.0"}
      |  },
      |  "components": [
      |    {"type": "library", "name": "libfoo", "version": "1.2.3",
      |     "purl": "pkg:generic/libfoo@1.2.3",
      |     "licenses": [{"license": {"id": "MIT"}}]}
      |  ]
      |}""".stripMargin

  private val spdxDoc =
    """{
      |  "spdxVersion": "SPDX-2.3",
      |  "SPDXID": "SPDXRef-DOCUMENT",
      |  "name": "repo-sbom",
      |  "packages": [
      |    {"name": "pkg-one", "SPDXID": "SPDXRef-1", "versionInfo": "4.5",
      |     "licenseConcluded": "GPL-3.0"},
      |    {"name": "pkg-two", "SPDXID": "SPDXRef-2", "versionInfo": "1.1",
      |     "licenseDeclared": "ISC"}
      |  ]
      |}""".stripMargin

  private lazy val dir = {
    val d = Files.createTempDirectory("graft_sbom").toString
    Files.writeString(Paths.get(d, "service-a.json"), cdxDoc)
    Files.writeString(Paths.get(d, "service-b.json"), cdxDoc2)
    Files.writeString(Paths.get(d, "repo.json"), spdxDoc)
    d
  }

  test("wrapped SBOM (.sbom envelope) is unwrapped transparently") {
    val d = Files.createTempDirectory("graft_wrap").toString
    Files.writeString(Paths.get(d, "wrapped.json"), s"""{"sbom": $cdxDoc}""")
    Files.writeString(Paths.get(d, "plain.json"), cdxDoc2)
    val docs = SbomSources.readCycloneDx(spark, d)
    assert(docs.count() === 2)
    val flat = SbomSources.flattenCycloneDx(docs)
    assert(flat.count() === 5)
    assert(flat.filter(col("source") === "service-a").count() === 4)
    assert(flat.filter(col("source") === "service-b").count() === 1)
  }

  test("corrupt JSON files are skipped, not fatal (reference: 'Skipping - not valid JSON')") {
    val d = Files.createTempDirectory("graft_corrupt").toString
    Files.writeString(Paths.get(d, "good.json"), cdxDoc)
    Files.writeString(Paths.get(d, "corrupt.json"), "{not json at all!!")
    val flat = SbomSources.flattenCycloneDx(SbomSources.readCycloneDx(spark, d))
    // only the valid document's components flow through
    assert(flat.count() === 4)
    val fmts = SbomSources.detectFormat(spark, d).collect()
      .map(r => (r.getString(0).split("/").last, r.getString(1))).toMap
    assert(fmts("good.json") === "cyclonedx")
    assert(fmts("corrupt.json") === "spdxjson") // the reference's default fallback
  }

  test("streaming ingestion: new SBOM files flow through the flatten pipeline incrementally") {
    import org.apache.spark.sql.streaming.OutputMode
    val in = Files.createTempDirectory("graft_stream_in").toString
    Files.writeString(Paths.get(in, "service-a.json"), cdxDoc)
    val q = SbomSources.flattenCycloneDx(SbomSources.streamCycloneDx(spark, in))
      .writeStream.format("memory").queryName("sbom_stream")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      assert(spark.table("sbom_stream").count() === 4)
      Files.writeString(Paths.get(in, "service-b.json"), cdxDoc2)
      q.processAllAvailable()
      val rows = spark.table("sbom_stream").collect()
      assert(rows.length === 5)
      assert(rows.map(_.getAs[String]("source")).toSet === Set("service-a", "service-b"))
    } finally q.stop()
  }

  test("format detection over real JSON files") {
    val formats = SbomSources.detectFormat(spark, dir).collect()
      .map(r => (r.getString(0).split("/").last, r.getString(1))).toMap
    assert(formats("service-a.json") === "cyclonedx")
    assert(formats("service-b.json") === "cyclonedx")
    assert(formats("repo.json") === "spdxjson")
  }

  test("SWID documents (SoftwareIdentity) are detected as swid") {
    val d = Files.createTempDirectory("graft_swid").toString
    Files.writeString(Paths.get(d, "tag.json"),
      """{"SoftwareIdentity": {"name": "acme-app", "tagId": "abc-123"}}""")
    Files.writeString(Paths.get(d, "repo.json"), spdxDoc)
    val formats = SbomSources.detectFormat(spark, d).collect()
      .map(r => (r.getString(0).split("/").last, r.getString(1))).toMap
    assert(formats("tag.json") === "swid")
    assert(formats("repo.json") === "spdxjson")
  }

  test("source-ref strategies 4 and 5: top-level name, then tools-name hint with denylist") {
    val d = Files.createTempDirectory("graft_srcref").toString
    // strategy 4: no metadata names at all, but a top-level .name
    Files.writeString(Paths.get(d, "toplevel.json"),
      """{"bomFormat": "CycloneDX", "name": "named-at-top",
        | "components": [{"type": "library", "name": "libx", "version": "1"}]}""".stripMargin)
    // strategy 5: only tools names, the first two denylisted generators
    Files.writeString(Paths.get(d, "toolsonly.json"),
      """{"bomFormat": "CycloneDX",
        | "metadata": {"tools": [
        |   {"vendor": "gh", "name": "GitHub.com-Dependency-Graph"},
        |   {"vendor": "cdx", "name": "CycloneDX-cli"},
        |   {"vendor": "wiz", "name": "wiz-scanner"}]},
        | "components": [{"type": "library", "name": "liby", "version": "2"}]}""".stripMargin)
    // strategy 6: nothing usable → filename fallback
    Files.writeString(Paths.get(d, "barefile.json"),
      """{"bomFormat": "CycloneDX",
        | "metadata": {"tools": [{"vendor": "cdx", "name": "cyclonedx-merge"}]},
        | "components": [{"type": "library", "name": "libz", "version": "3"}]}""".stripMargin)
    val flat = SbomSources.flattenCycloneDx(SbomSources.readCycloneDx(spark, d))
      .collect().map(r => r.getAs[String]("name") -> r.getAs[String]("source")).toMap
    assert(flat("libx") === "named-at-top")
    assert(flat("liby") === "wiz-scanner")
    assert(flat("libz") === "barefile")
  }

  test("cyclonedx flatten applies the license fallback chain") {
    val flat = SbomSources.flattenCycloneDx(
      SbomSources.readCycloneDx(spark, s"$dir/service-a.json"))
      .collect().map(r => r.getAs[String]("name") ->
        (r.getAs[String]("license"), r.getAs[String]("source"))).toMap
    assert(flat("libfoo") === (("MIT", "service-a")))
    assert(flat("libbar") === (("Apache-2.0 OR MIT", "service-a")))
    assert(flat("libbaz") === (("BSD-3-Clause", "service-a")))
    assert(flat("mystery") === (("unknown", "service-a")))
  }

  test("spdx flatten uses concluded then declared") {
    val flat = SbomSources.flattenSpdx(SbomSources.readSpdx(spark, s"$dir/repo.json"))
      .collect().map(r => r.getAs[String]("name") -> r.getAs[String]("license")).toMap
    assert(flat === Map("pkg-one" -> "GPL-3.0", "pkg-two" -> "ISC"))
  }

  test("SPDX→CycloneDX conversion: compatibility walk + emitted doc re-reads as CycloneDX") {
    val d = Files.createTempDirectory("graft_convert").toString
    Files.writeString(Paths.get(d, "repo.json"),
      """{
        |  "spdxVersion": "SPDX-2.3",
        |  "SPDXID": "SPDXRef-DOCUMENT",
        |  "name": "repo-sbom",
        |  "packages": [
        |    {"name": "pkg-one", "SPDXID": "SPDXRef-1", "versionInfo": "4.5",
        |     "licenseConcluded": "GPL-3.0",
        |     "externalRefs": [
        |       {"referenceCategory": "PACKAGE-MANAGER", "referenceType": "purl",
        |        "referenceLocator": "pkg:generic/pkg-one@4.5"},
        |       {"referenceCategory": "wat", "referenceType": "cpe", "referenceLocator": "x"}]},
        |    {"name": "pkg-two", "SPDXID": "SPDXRef-2", "licenseDeclared": "ISC"}
        |  ]
        |}""".stripMargin)
    val fixed = SbomSources.fixSpdxCompatibility(SbomSources.readSpdx(spark, d))
    val cats = fixed.select(explode(col("packages")).as("p"))
      .select(explode(col("p.externalRefs")).as("r"))
      .select(col("r.referenceCategory")).collect().map(_.getString(0)).toSeq.sorted
    assert(cats === Seq("OTHER", "PACKAGE_MANAGER"))

    // convert and re-read the emitted JSON through the CycloneDX reader path
    val converted = SbomSources.convertSpdxToCycloneDx(fixed)
    val outDir = Files.createTempDirectory("graft_converted").toString
    converted.collect().zipWithIndex.foreach { case (r, i) =>
      Files.writeString(Paths.get(outDir, s"conv$i.json"), r.getAs[String]("cdx_json"))
    }
    val flat = SbomSources.flattenCycloneDx(SbomSources.readCycloneDx(spark, outDir))
      .collect().map(r => r.getAs[String]("name") ->
        (r.getAs[String]("version"), r.getAs[String]("license"), r.getAs[String]("source"))).toMap
    assert(flat("pkg-one") === (("4.5", "GPL-3.0", "repo-sbom")))
    assert(flat("pkg-two") === (("unknown", "ISC", "repo-sbom")))
  }

  test("CycloneDX→SPDX conversion round-trips through the SPDX reader") {
    val converted = SbomSources.convertCycloneDxToSpdx(
      SbomSources.readCycloneDx(spark, s"$dir/service-a.json"))
    val outDir = Files.createTempDirectory("graft_cdx2spdx").toString
    converted.collect().zipWithIndex.foreach { case (r, i) =>
      Files.writeString(Paths.get(outDir, s"conv$i.json"), r.getAs[String]("spdx_json"))
    }
    val flat = SbomSources.flattenSpdx(SbomSources.readSpdx(spark, outDir))
      .collect().map(r => r.getAs[String]("name") ->
        (r.getAs[String]("license"), r.getAs[String]("source"))).toMap
    assert(flat("libfoo") === (("MIT", "service-a")))
    assert(flat("libbar") === (("Apache-2.0 OR MIT", "service-a")))
    assert(flat("mystery") === (("NOASSERTION", "service-a")))
  }

  test("merge dedups by name@version#purl^source; mapping fills unknown; sink round-trips sorted") {
    import spark.implicits._
    val a = SbomSources.flattenCycloneDx(SbomSources.readCycloneDx(spark, s"$dir/service-a.json"))
    val b = SbomSources.flattenCycloneDx(SbomSources.readCycloneDx(spark, s"$dir/service-b.json"))
    val merged = SbomSources.mergeComponents(a, b)
    // libfoo appears in both docs with different sources → both kept
    assert(merged.filter(col("name") === "libfoo").count() === 2)
    assert(merged.count() === 5)
    // double merge of the same doc dedups to the same count
    assert(SbomSources.mergeComponents(a, a).count() === 4)

    val mapping = Seq(("mystery", "MIT")).toDF("name", "mapped_license")
    val mapped = SbomSources.mapUnknownLicenses(merged, mapping)
    assert(mapped.filter(col("name") === "mystery").head().getAs[String]("license") === "MIT")
    assert(mapped.filter(col("name") === "libbaz").head().getAs[String]("license") === "BSD-3-Clause")

    val out = Files.createTempDirectory("graft_comp_table").toString
    SbomSources.writeComponentTable(mapped, out)
    val back = spark.read.parquet(out)
    assert(back.count() === 5)
    assert(back.columns.toSet === Set("name", "version", "license", "purl", "source"))
    assert(back.filter(col("source") === "service-b").count() === 1)
  }
}
