package graft.sbom

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The reference's SBOM-pipeline semantics (ClickBOM) re-expressed as
  * relational operators over a deterministic synthetic component corpus
  * derived from the `part` table. Each operator cites the reference
  * behavior it reproduces; every derivation is mirrored in the DuckDB
  * oracle SQL so the gate checks exact semantics, not just shape.
  *
  * At 100 TB the corpus is a parquet fact table of components: all
  * operators below are single-shuffle groupBy/join/window plans with
  * broadcast-sized mapping dims.
  */
object Sbom {

  /** Deterministic component corpus (shared Spark/SQL definition).
    * name/version/purl/license-fields/source-filename modeled from part.
    */
  private def components(t: Tables): DataFrame =
    t.part.select(
      col("p_partkey").as("comp_id"),
      col("p_name").as("name"),
      col("p_brand").as("version"),
      concat(lit("pkg:graft/"), regexp_replace(col("p_name"), " ", "-"),
        lit("@"), col("p_brand")).as("purl"),
      when(col("p_partkey") % 7 === 0, lit(null).cast("string"))
        .when(col("p_partkey") % 7 === 1, "MIT")
        .when(col("p_partkey") % 7 === 2, "Apache-2.0")
        .when(col("p_partkey") % 7 === 3, "unknown")
        .when(col("p_partkey") % 7 === 4, "GPL-3.0")
        .when(col("p_partkey") % 7 === 5, "BSD-3-Clause")
        .otherwise("MIT").as("lic_id"),
      when(col("p_partkey") % 3 === 0, "Apache License 2.0")
        .otherwise(lit(null).cast("string")).as("lic_name"),
      concat(lit("src"), (col("p_partkey") % 4).cast("string"), lit(".json")).as("filename"),
      col("p_size"), col("p_type"))

  /** Identical corpus as a SQL CTE for the oracles. */
  private val componentsSql: String = """
    components AS (
      SELECT p_partkey AS comp_id,
             p_name AS name,
             p_brand AS version,
             'pkg:graft/' || REPLACE(p_name, ' ', '-') || '@' || p_brand AS purl,
             CASE WHEN p_partkey % 7 = 0 THEN NULL
                  WHEN p_partkey % 7 = 1 THEN 'MIT'
                  WHEN p_partkey % 7 = 2 THEN 'Apache-2.0'
                  WHEN p_partkey % 7 = 3 THEN 'unknown'
                  WHEN p_partkey % 7 = 4 THEN 'GPL-3.0'
                  WHEN p_partkey % 7 = 5 THEN 'BSD-3-Clause'
                  ELSE 'MIT' END AS lic_id,
             CASE WHEN p_partkey % 3 = 0 THEN 'Apache License 2.0' ELSE NULL END AS lic_name,
             'src' || CAST(p_partkey % 4 AS VARCHAR) || '.json' AS filename,
             p_size, p_type
      FROM part)"""

  // sbom_flatten — CycloneDX component flattening with the license coalesce
  // chain (entrypoint.sh:328-361): licenses[0].license.id → .name → fallback
  // "unknown", exercised through REAL JSON build + extract on both engines.
  val flatten = Q(
    "sbom_flatten",
    Some(s"""
      WITH $componentsSql,
      docs AS (
        SELECT comp_id, name,
               '{"name":"' || name || '","licenses":' ||
               (CASE WHEN lic_id IS NULL AND lic_name IS NULL THEN '[]'
                     WHEN lic_id IS NOT NULL THEN '[{"license":{"id":"' || lic_id || '"}}]'
                     ELSE '[{"license":{"name":"' || lic_name || '"}}]' END) ||
               '}' AS comp_json
        FROM components)
      SELECT comp_id, name,
             COALESCE(JSON_EXTRACT_STRING(comp_json, '$$.licenses[0].license.id'),
                      JSON_EXTRACT_STRING(comp_json, '$$.licenses[0].license.name'),
                      'unknown') AS license
      FROM docs
      ORDER BY comp_id
    """)
  ) { t =>
    val docs = components(t).select(
      col("comp_id"), col("name"),
      concat(
        lit("{\"name\":\""), col("name"), lit("\",\"licenses\":"),
        when(col("lic_id").isNull && col("lic_name").isNull, "[]")
          .when(col("lic_id").isNotNull,
            concat(lit("[{\"license\":{\"id\":\""), col("lic_id"), lit("\"}}]")))
          .otherwise(concat(lit("[{\"license\":{\"name\":\""), col("lic_name"), lit("\"}}]"))),
        lit("}")).as("comp_json"))
    docs.select(
      col("comp_id"), col("name"),
      coalesce(
        get_json_object(col("comp_json"), "$.licenses[0].license.id"),
        get_json_object(col("comp_json"), "$.licenses[0].license.name"),
        lit("unknown")).as("license"))
      .orderBy(col("comp_id"))
  }

  // sbom_merge_dedup — multi-document merge + dedup by
  // name@version#purl^source (sbom-merging.sh:358): two overlapping
  // document slices, union, keep first per composite key.
  val mergeDedup = Q(
    "sbom_merge_dedup",
    Some(s"""
      WITH $componentsSql,
      doc1 AS (SELECT name, version, purl, 'sbom-alpha' AS source, comp_id
               FROM components WHERE p_size <= 30),
      doc2 AS (SELECT name, version, purl, 'sbom-beta' AS source, comp_id
               FROM components WHERE p_size >= 15),
      merged AS (SELECT * FROM doc1 UNION ALL SELECT * FROM doc2),
      dedup AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY name, version, purl, source
                                     ORDER BY comp_id) AS rn
        FROM merged)
      SELECT name, version, source, COUNT(*) AS n_components
      FROM dedup WHERE rn = 1
      GROUP BY name, version, source
      ORDER BY name, version, source
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    val c = components(t)
    val doc1 = c.filter(col("p_size") <= 30)
      .select(col("name"), col("version"), col("purl"), lit("sbom-alpha").as("source"), col("comp_id"))
    val doc2 = c.filter(col("p_size") >= 15)
      .select(col("name"), col("version"), col("purl"), lit("sbom-beta").as("source"), col("comp_id"))
    val w = Window.partitionBy(col("name"), col("version"), col("purl"), col("source"))
      .orderBy(col("comp_id"))
    doc1.unionAll(doc2)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("name"), col("version"), col("source"))
      .agg(count(lit(1)).as("n_components"))
      .orderBy(col("name"), col("version"), col("source"))
  }

  // sbom_license_map — unknown-license mapping (entrypoint.sh:245-269):
  // when license ∈ {unknown, '', NULL}, look the component name up in the
  // mapping dim (license-mappings.json analog); broadcast join.
  val licenseMap = Q(
    "sbom_license_map",
    Some(s"""
      WITH $componentsSql,
      mapping(name, mapped_license) AS (VALUES
        ('small ring', 'MIT'), ('red widget', 'Apache-2.0'),
        ('blue bolt', 'BSD-3-Clause'), ('green gear', 'GPL-3.0'),
        ('silver screw', 'ISC')),
      flat AS (
        SELECT comp_id, name, COALESCE(lic_id, 'unknown') AS license
        FROM components)
      SELECT f.comp_id, f.name,
             CASE WHEN f.license IN ('unknown', '') THEN COALESCE(m.mapped_license, 'unknown')
                  ELSE f.license END AS license
      FROM flat f LEFT JOIN mapping m ON f.name = m.name
      ORDER BY f.comp_id
    """)
  ) { t =>
    import t.spark.implicits._
    val mapping = Seq(
      ("small ring", "MIT"), ("red widget", "Apache-2.0"),
      ("blue bolt", "BSD-3-Clause"), ("green gear", "GPL-3.0"),
      ("silver screw", "ISC")).toDF("m_name", "mapped_license")
    components(t)
      .select(col("comp_id"), col("name"), coalesce(col("lic_id"), lit("unknown")).as("license"))
      .join(broadcast(mapping), col("name") === col("m_name"), "left")
      .select(col("comp_id"), col("name"),
        when(col("license").isin("unknown", ""), coalesce(col("mapped_license"), lit("unknown")))
          .otherwise(col("license")).as("license"))
      .orderBy(col("comp_id"))
  }

  // sbom_source_extract — the 6-strategy source-reference coalesce chain
  // (entrypoint.sh:38-104): spdx doc name → component name → bom-ref →
  // top-level name → tools-name hint (first name surviving the generator
  // denylist, entrypoint.sh:85-92) → filename fallback. Synthetic docs
  // cycle through which strategy is populated; the tools case carries a
  // denylisted generator first so the grep -v behavior is exercised.
  val sourceExtract = Q(
    "sbom_source_extract",
    Some(s"""
      WITH $componentsSql,
      metas AS (
        SELECT comp_id,
               CASE WHEN comp_id % 6 = 0 THEN 'spdx:' || name END AS spdx_doc_name,
               CASE WHEN comp_id % 6 = 1 THEN 'comp:' || name END AS meta_component_name,
               CASE WHEN comp_id % 6 = 2 THEN 'ref:' || purl END AS bom_ref,
               CASE WHEN comp_id % 6 = 3 THEN 'top:' || name END AS top_name,
               CASE WHEN comp_id % 6 = 4
                    THEN ['CycloneDX-core', 'protobom-v2', 'wiz-cli:' || name, 'GitHub.com-Dependency-Graph']
                    ELSE [] END AS tool_names,
               filename
        FROM components)
      SELECT comp_id,
             COALESCE(spdx_doc_name, meta_component_name, bom_ref, top_name,
                      list_filter(tool_names,
                        tn -> NOT regexp_matches(tn, '${graft.sources.SbomSources.toolNameDenylist}'))[1],
                      REPLACE(filename, '.json', '')) AS source_ref
      FROM metas
      ORDER BY comp_id
    """)
  ) { t =>
    components(t)
      .select(
        col("comp_id"),
        when(col("comp_id") % 6 === 0, concat(lit("spdx:"), col("name"))).as("spdx_doc_name"),
        when(col("comp_id") % 6 === 1, concat(lit("comp:"), col("name"))).as("meta_component_name"),
        when(col("comp_id") % 6 === 2, concat(lit("ref:"), col("purl"))).as("bom_ref"),
        when(col("comp_id") % 6 === 3, concat(lit("top:"), col("name"))).as("top_name"),
        when(col("comp_id") % 6 === 4,
          array(lit("CycloneDX-core"), lit("protobom-v2"),
            concat(lit("wiz-cli:"), col("name")), lit("GitHub.com-Dependency-Graph")))
          .otherwise(array().cast("array<string>")).as("tool_names"),
        col("filename"))
      .select(col("comp_id"),
        coalesce(col("spdx_doc_name"), col("meta_component_name"), col("bom_ref"),
          col("top_name"),
          get(filter(col("tool_names"),
            tn => !tn.rlike(graft.sources.SbomSources.toolNameDenylist)), lit(0)),
          regexp_replace(col("filename"), "\\.json", "")).as("source_ref"))
      .orderBy(col("comp_id"))
  }

  /** Glob → LIKE pattern translation (bash fnmatch subset: * and ?).
    * The reference filters merge inputs by filename glob (sbom-merging.sh:7).
    */
  def globToLike(glob: String): String =
    glob.flatMap {
      case '*' => "%"
      case '?' => "_"
      case '%' => "\\%"
      case '_' => "\\_"
      case c   => c.toString
    }

  // sbom_filter_patterns — include/exclude filename filtering with
  // exclude-wins precedence (sbom-merging.sh:32-77), include = {src1*.json,
  // src2*.json}, exclude = {*2.json}.
  val filterPatterns = Q(
    "sbom_filter_patterns",
    Some(s"""
      WITH $componentsSql
      SELECT filename, COUNT(*) AS n
      FROM components
      WHERE (filename LIKE 'src1%.json' OR filename LIKE 'src2%.json')
        AND NOT (filename LIKE '%2.json')
      GROUP BY filename
      ORDER BY filename
    """)
  ) { t =>
    val include = Seq("src1*.json", "src2*.json").map(globToLike)
    val exclude = Seq("*2.json").map(globToLike)
    val inc = include.map(col("filename").like(_)).reduce(_ || _)
    val exc = exclude.map(col("filename").like(_)).reduce(_ || _)
    components(t)
      .filter(inc && !exc)
      .groupBy(col("filename"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("filename"))
  }

  // sbom_table_name — ClickHouse table-name derivation for every source
  // mode (entrypoint.sh:545-560 + merge path 469): github = sanitized
  // REPOSITORY; mend = 'mend_' + sanitized scope uuid; wiz = 'wiz_' +
  // sanitized report id; merge = sanitized s3 key. Sanitize = non-alnum
  // → '_', lowercase. NOTE (bug-compatible): the merge path's intended
  // '.json'→'_merged' rewrite runs AFTER the non-alnum pass has already
  // turned the dot into '_', so it never matches and keys end '_json' —
  // reproduced faithfully.
  val tableName = Q(
    "sbom_table_name",
    Some("""
      WITH names AS (
        SELECT n_name, n_nationkey, r_name
        FROM region JOIN nation ON n_regionkey = r_regionkey),
      derived AS (
        SELECT 'github' AS mode,
               LOWER(REGEXP_REPLACE(r_name || '/' || n_name, '[^a-zA-Z0-9]', '_', 'g')) AS table_name
        FROM names
        UNION ALL
        SELECT 'mend',
               'mend_' || LOWER(REGEXP_REPLACE(n_name || '-' || CAST(n_nationkey AS VARCHAR),
                 '[^a-zA-Z0-9]', '_', 'g'))
        FROM names
        UNION ALL
        SELECT 'wiz',
               'wiz_' || LOWER(REGEXP_REPLACE('report-' || CAST(n_nationkey AS VARCHAR) || '.id',
                 '[^a-zA-Z0-9]', '_', 'g'))
        FROM names
        UNION ALL
        SELECT 'merge',
               LOWER(REGEXP_REPLACE(
                 REGEXP_REPLACE('sboms/' || n_name || '.json', '[^a-zA-Z0-9]', '_', 'g'),
                 '\.json', '_merged', 'g'))
        FROM names)
      SELECT DISTINCT mode, table_name
      FROM derived
      ORDER BY mode, table_name
    """)
  ) { t =>
    val names = t.region.join(t.nation, col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name"), col("n_nationkey"), col("r_name"))
    def sanitized(c: Column): Column = lower(regexp_replace(c, "[^a-zA-Z0-9]", "_"))
    val github = names.select(lit("github").as("mode"),
      sanitized(concat(col("r_name"), lit("/"), col("n_name"))).as("table_name"))
    val mend = names.select(lit("mend").as("mode"),
      concat(lit("mend_"),
        sanitized(concat(col("n_name"), lit("-"), col("n_nationkey").cast("string")))).as("table_name"))
    val wiz = names.select(lit("wiz").as("mode"),
      concat(lit("wiz_"),
        sanitized(concat(lit("report-"), col("n_nationkey").cast("string"), lit(".id")))).as("table_name"))
    val merged = names.select(lit("merge").as("mode"),
      regexp_replace(
        sanitized(concat(lit("sboms/"), col("n_name"), lit(".json"))),
        "\\.json", "_merged").as("table_name"))
    github.unionAll(mend).unionAll(wiz).unionAll(merged)
      .distinct()
      .orderBy(col("mode"), col("table_name"))
  }

  // sbom_format_detect — format detection priority chain
  // (sbom-processing.sh:58-91): CycloneDX markers → SPDX markers → SWID →
  // default spdxjson. Marker presence modeled deterministically.
  val formatDetect = Q(
    "sbom_format_detect",
    Some(s"""
      WITH $componentsSql,
      marked AS (
        SELECT comp_id,
               comp_id % 4 = 0 AS has_bom_format,
               comp_id % 4 = 1 AS has_metadata_component,
               comp_id % 4 = 2 AS has_spdx_version,
               comp_id % 8 = 3 AS has_swid_tag
        FROM components)
      SELECT CASE WHEN has_bom_format OR has_metadata_component THEN 'cyclonedx'
                  WHEN has_spdx_version THEN 'spdxjson'
                  WHEN has_swid_tag THEN 'swid'
                  ELSE 'spdxjson' END AS format,
             COUNT(*) AS n
      FROM marked
      GROUP BY 1
      ORDER BY format
    """)
  ) { t =>
    components(t)
      .select(col("comp_id"),
        (col("comp_id") % 4 === 0).as("has_bom_format"),
        (col("comp_id") % 4 === 1).as("has_metadata_component"),
        (col("comp_id") % 4 === 2).as("has_spdx_version"),
        (col("comp_id") % 8 === 3).as("has_swid_tag"))
      .select(
        when(col("has_bom_format") || col("has_metadata_component"), "cyclonedx")
          .when(col("has_spdx_version"), "spdxjson")
          .when(col("has_swid_tag"), "swid")
          .otherwise("spdxjson").as("format"))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("format"))
  }

  // sbom_ref_category — SPDX referenceCategory normalization
  // (sbom-processing.sh:15-35): PACKAGE-MANAGER → PACKAGE_MANAGER, keep
  // {SECURITY, PERSISTENT_ID, OTHER}, anything else → OTHER. The jq chain
  // omits the already-correct 'PACKAGE_MANAGER' spelling, so the
  // reference rewrites it to OTHER — reproduced bug-compatibly.
  val refCategory = Q(
    "sbom_ref_category",
    Some(s"""
      WITH $componentsSql,
      cats AS (
        SELECT comp_id,
               CASE comp_id % 6 WHEN 0 THEN 'PACKAGE-MANAGER'
                                WHEN 1 THEN 'SECURITY'
                                WHEN 2 THEN 'PERSISTENT_ID'
                                WHEN 3 THEN 'OTHER'
                                WHEN 4 THEN 'PACKAGE_MANAGER'
                                ELSE 'bogus-category' END AS ref_category
        FROM components)
      SELECT CASE WHEN ref_category = 'PACKAGE-MANAGER' THEN 'PACKAGE_MANAGER'
                  WHEN ref_category IN ('SECURITY', 'PERSISTENT_ID', 'OTHER')
                    THEN ref_category
                  ELSE 'OTHER' END AS ref_category,
             COUNT(*) AS n
      FROM cats
      GROUP BY 1
      ORDER BY ref_category
    """)
  ) { t =>
    components(t)
      .select((col("comp_id") % 6).as("m"))
      .select(
        when(col("m") === 0, "PACKAGE-MANAGER").when(col("m") === 1, "SECURITY")
          .when(col("m") === 2, "PERSISTENT_ID").when(col("m") === 3, "OTHER")
          .when(col("m") === 4, "PACKAGE_MANAGER").otherwise("bogus-category")
          .as("raw"))
      .select(
        when(col("raw") === "PACKAGE-MANAGER", "PACKAGE_MANAGER")
          .when(col("raw").isin("SECURITY", "PERSISTENT_ID", "OTHER"), col("raw"))
          .otherwise("OTHER").as("ref_category"))
      .groupBy(col("ref_category"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("ref_category"))
  }

  // sbom_convert — doc-level SPDX→CycloneDX conversion (sbom-processing.sh:
  // 94-152) including the fix_spdx_compatibility referenceCategory walk
  // (sbom-processing.sh:7-35): each synthetic SPDX package (licenseConcluded
  // → licenseDeclared → NOASSERTION, an externalRef with a possibly-invalid
  // category) is emitted as a CycloneDX v1.6 component JSON document, then
  // parsed back — the round-trip proves the emission is well-formed and the
  // category walk applied. Both engines build and re-parse identical JSON.
  val convert = Q(
    "sbom_convert",
    Some(s"""
      WITH $componentsSql,
      spdx AS (
        SELECT comp_id, name, version,
               COALESCE(lic_id, lic_name, 'NOASSERTION') AS license,
               CASE comp_id % 6 WHEN 0 THEN 'PACKAGE-MANAGER'
                                WHEN 1 THEN 'SECURITY'
                                WHEN 2 THEN 'PERSISTENT_ID'
                                WHEN 3 THEN 'OTHER'
                                WHEN 4 THEN 'PACKAGE_MANAGER'
                                ELSE 'bogus-category' END AS raw_category
        FROM components),
      fixed AS (
        SELECT comp_id, name, version, license,
               CASE WHEN raw_category = 'PACKAGE-MANAGER' THEN 'PACKAGE_MANAGER'
                    WHEN raw_category IN ('SECURITY', 'PERSISTENT_ID', 'OTHER')
                      THEN raw_category
                    ELSE 'OTHER' END AS ref_category
        FROM spdx),
      emitted AS (
        SELECT comp_id,
               '{"bomFormat":"CycloneDX","specVersion":"1.6","components":[{"type":"library","name":"'
                 || name || '","version":"' || version
                 || '","licenses":[{"license":{"id":"' || license
                 || '"}}],"properties":[{"name":"spdx:referenceCategory","value":"'
                 || ref_category || '"}]}]}' AS cdx_json
        FROM fixed)
      SELECT comp_id,
             JSON_EXTRACT_STRING(cdx_json, '$$.components[0].name') AS name,
             JSON_EXTRACT_STRING(cdx_json, '$$.components[0].version') AS version,
             JSON_EXTRACT_STRING(cdx_json, '$$.components[0].licenses[0].license.id') AS license,
             JSON_EXTRACT_STRING(cdx_json, '$$.components[0].properties[0].value') AS ref_category
      FROM emitted
      ORDER BY comp_id
    """)
  ) { t =>
    val spdx = components(t).select(
      col("comp_id"), col("name"), col("version"),
      coalesce(col("lic_id"), col("lic_name"), lit("NOASSERTION")).as("license"),
      when(col("comp_id") % 6 === 0, "PACKAGE-MANAGER")
        .when(col("comp_id") % 6 === 1, "SECURITY")
        .when(col("comp_id") % 6 === 2, "PERSISTENT_ID")
        .when(col("comp_id") % 6 === 3, "OTHER")
        .when(col("comp_id") % 6 === 4, "PACKAGE_MANAGER")
        .otherwise("bogus-category").as("raw_category"))
    val fixed = spdx.withColumn("ref_category",
      when(col("raw_category") === "PACKAGE-MANAGER", "PACKAGE_MANAGER")
        .when(col("raw_category").isin("SECURITY", "PERSISTENT_ID", "OTHER"),
          col("raw_category"))
        .otherwise("OTHER"))
    val emitted = fixed.select(col("comp_id"), concat(
      lit("{\"bomFormat\":\"CycloneDX\",\"specVersion\":\"1.6\",\"components\":[{\"type\":\"library\",\"name\":\""),
      col("name"), lit("\",\"version\":\""), col("version"),
      lit("\",\"licenses\":[{\"license\":{\"id\":\""), col("license"),
      lit("\"}}],\"properties\":[{\"name\":\"spdx:referenceCategory\",\"value\":\""),
      col("ref_category"), lit("\"}]}]}")).as("cdx_json"))
    // single-parse re-read (get_json_object would re-parse the document
    // once per extracted field)
    val cdxParsed = from_json(col("cdx_json"), org.apache.spark.sql.types.DataType.fromDDL(
      "STRUCT<components: ARRAY<STRUCT<name: STRING, version: STRING, " +
        "licenses: ARRAY<STRUCT<license: STRUCT<id: STRING>>>, " +
        "properties: ARRAY<STRUCT<name: STRING, value: STRING>>>>>"))
    emitted
      .withColumn("doc", cdxParsed)
      .withColumn("comp", col("doc.components").getItem(0))
      .select(
        col("comp_id"),
        col("comp.name").as("name"),
        col("comp.version").as("version"),
        col("comp.licenses").getItem(0).getField("license").getField("id").as("license"),
        col("comp.properties").getItem(0).getField("value").as("ref_category"))
      .orderBy(col("comp_id"))
  }

  // sbom_validate_modes — mode-conditional required-variable validation
  // (lib/validation.sh:7-71): REPOSITORY required only outside
  // merge/mend/wiz modes; the ClickHouse URL implies the DATABASE+USERNAME
  // triplet; mend needs its credential quad plus at least one of
  // project/product scope; wiz needs its endpoint/client/report set.
  val validateModes = Q(
    "sbom_validate_modes",
    Some(s"""
      WITH $componentsSql,
      cfg AS (
        SELECT comp_id,
               CASE comp_id % 4 WHEN 0 THEN 'github' WHEN 1 THEN 'merge'
                                WHEN 2 THEN 'mend' ELSE 'wiz' END AS mode,
               comp_id % 5 <> 0 AS has_repository,
               comp_id % 3 = 0  AS has_ch_url,
               comp_id % 6 <> 2 AS has_ch_db_and_user,
               comp_id % 7 <> 0 AS has_mend_creds,
               comp_id % 2 = 0  AS has_project_uuid,
               comp_id % 9 = 0  AS has_product_uuid,
               comp_id % 8 <> 1 AS has_wiz_vars
        FROM components),
      checked AS (
        SELECT mode,
               (mode IN ('merge', 'mend', 'wiz') OR has_repository)
               AND (NOT has_ch_url OR has_ch_db_and_user)
               AND (mode <> 'mend' OR (has_mend_creds AND (has_project_uuid OR has_product_uuid)))
               AND (mode <> 'wiz' OR has_wiz_vars) AS ok
        FROM cfg)
      SELECT mode,
             COUNT(CASE WHEN ok THEN 1 END) AS n_valid,
             COUNT(*) AS n_total
      FROM checked
      GROUP BY mode
      ORDER BY mode
    """)
  ) { t =>
    val cfg = components(t).select(
      when(col("comp_id") % 4 === 0, "github").when(col("comp_id") % 4 === 1, "merge")
        .when(col("comp_id") % 4 === 2, "mend").otherwise("wiz").as("mode"),
      (col("comp_id") % 5 =!= 0).as("has_repository"),
      (col("comp_id") % 3 === 0).as("has_ch_url"),
      (col("comp_id") % 6 =!= 2).as("has_ch_db_and_user"),
      (col("comp_id") % 7 =!= 0).as("has_mend_creds"),
      (col("comp_id") % 2 === 0).as("has_project_uuid"),
      (col("comp_id") % 9 === 0).as("has_product_uuid"),
      (col("comp_id") % 8 =!= 1).as("has_wiz_vars"))
    cfg.select(col("mode"),
      ((col("mode").isin("merge", "mend", "wiz") || col("has_repository")) &&
        (!col("has_ch_url") || col("has_ch_db_and_user")) &&
        (col("mode") =!= "mend" ||
          (col("has_mend_creds") && (col("has_project_uuid") || col("has_product_uuid")))) &&
        (col("mode") =!= "wiz" || col("has_wiz_vars"))).as("ok"))
      .groupBy(col("mode"))
      .agg(count(when(col("ok"), 1)).as("n_valid"), count(lit(1)).as("n_total"))
      .orderBy(col("mode"))
  }

  // sbom_component_stats — the downstream ClickHouse analytics use-case:
  // components per (license, source-file) with distinct-name counts — the
  // table the reference's whole pipeline feeds (entrypoint.sh:220-229).
  val componentStats = Q(
    "sbom_component_stats",
    Some(s"""
      WITH $componentsSql
      SELECT COALESCE(lic_id, 'unknown') AS license, filename AS source,
             COUNT(*) AS n_components,
             COUNT(DISTINCT name) AS n_names
      FROM components
      GROUP BY 1, 2
      ORDER BY license, source
    """)
  ) { t =>
    components(t)
      .groupBy(coalesce(col("lic_id"), lit("unknown")).as("license"),
        col("filename").as("source"))
      .agg(count(lit(1)).as("n_components"), countDistinct(col("name")).as("n_names"))
      .orderBy(col("license"), col("source"))
  }

  // sbom_validate — sanitize-layer predicates (lib/sanitize.sh) as vectorized
  // filters: repo-format, uuid-format, db-name validity over derived strings.
  val validate = Q(
    "sbom_validate",
    Some(s"""
      WITH $componentsSql,
      inputs AS (
        SELECT comp_id,
               CASE WHEN comp_id % 3 = 0 THEN 'owner/' || REPLACE(name, ' ', '-')
                    WHEN comp_id % 3 = 1 THEN 'bad repo!' || name
                    ELSE 'org-' || CAST(comp_id AS VARCHAR) || '/repo_' || version END AS repo,
               CASE WHEN comp_id % 2 = 0
                    THEN '12345678-1234-1234-1234-1234567890ab'
                    ELSE 'not-a-uuid-' || CAST(comp_id AS VARCHAR) END AS uuid
        FROM components)
      SELECT
        COUNT(CASE WHEN REGEXP_MATCHES(repo, '^[a-zA-Z0-9._-]+/[a-zA-Z0-9._-]+$$') THEN 1 END) AS n_valid_repo,
        COUNT(CASE WHEN REGEXP_MATCHES(uuid, '^[0-9a-fA-F]{8}-([0-9a-fA-F]{4}-){3}[0-9a-fA-F]{12}$$') THEN 1 END) AS n_valid_uuid,
        COUNT(*) AS n_total
      FROM inputs
    """)
  ) { t =>
    components(t)
      .select(col("comp_id"),
        when(col("comp_id") % 3 === 0, concat(lit("owner/"), regexp_replace(col("name"), " ", "-")))
          .when(col("comp_id") % 3 === 1, concat(lit("bad repo!"), col("name")))
          .otherwise(concat(lit("org-"), col("comp_id").cast("string"), lit("/repo_"), col("version")))
          .as("repo"),
        when(col("comp_id") % 2 === 0, "12345678-1234-1234-1234-1234567890ab")
          .otherwise(concat(lit("not-a-uuid-"), col("comp_id").cast("string"))).as("uuid"))
      .agg(
        count(when(col("repo").rlike("^[a-zA-Z0-9._-]+/[a-zA-Z0-9._-]+$"), 1)).as("n_valid_repo"),
        count(when(col("uuid").rlike("^[0-9a-fA-F]{8}-([0-9a-fA-F]{4}-){3}[0-9a-fA-F]{12}$"), 1)).as("n_valid_uuid"),
        count(lit(1)).as("n_total"))
  }

  // sbom_purl_parse — package-URL decomposition. The reference's merge
  // dedup key embeds the raw purl (`name@version#purl^source`,
  // sbom-merging.sh:358) but never parses it; any analytics over an SBOM
  // lake needs the purl grammar broken out
  // (pkg:type/namespace?/name@version?qualifiers#subpath) to group by
  // ecosystem or join across registries. Synthetic purls exercise every
  // optional part; parsing is anchored regex strip/extract steps that
  // evaluate identically in Spark and the oracle. Narrow per-row
  // transform — runs in the scan at any scale.
  val purlParse = Q(
    "sbom_purl_parse",
    Some(s"""
      WITH $componentsSql,
      purls AS (
        SELECT comp_id,
               'pkg:' ||
               (CASE comp_id % 4 WHEN 0 THEN 'npm' WHEN 1 THEN 'maven'
                                 WHEN 2 THEN 'pypi' ELSE 'golang' END) || '/' ||
               (CASE WHEN comp_id % 3 <> 0 THEN 'ns' || (comp_id % 5) || '/' ELSE '' END) ||
               REPLACE(name, ' ', '-') || '@v' || (comp_id % 9) || '.' || (comp_id % 5) ||
               (CASE WHEN comp_id % 2 = 0 THEN '?arch=x86_64&os=linux' ELSE '' END) ||
               (CASE WHEN comp_id % 5 = 0 THEN '#lib/src' ELSE '' END) AS purl
        FROM components),
      parsed AS (
        SELECT comp_id, purl,
               REGEXP_EXTRACT(purl, '^pkg:([^/]+)/', 1) AS ptype,
               REGEXP_REPLACE(REGEXP_REPLACE(purl, '^pkg:[^/]+/', ''), '[?#].*$$', '') AS core
        FROM purls),
      split_ver AS (
        SELECT comp_id, purl, ptype,
               REGEXP_EXTRACT(core, '@([^@]*)$$', 1) AS version,
               REGEXP_REPLACE(core, '@[^@]*$$', '') AS path
        FROM parsed)
      SELECT comp_id, ptype,
             REGEXP_REPLACE(path, '/?[^/]+$$', '') AS namespace,
             REGEXP_EXTRACT(path, '([^/]+)$$', 1) AS name,
             version,
             REGEXP_EXTRACT(purl, '\\?([^#]*)', 1) AS qualifiers,
             REGEXP_EXTRACT(purl, '#(.*)$$', 1) AS subpath
      FROM split_ver
      ORDER BY comp_id
    """)
  ) { t =>
    val purl = concat(
      lit("pkg:"),
      when(col("comp_id") % 4 === 0, "npm").when(col("comp_id") % 4 === 1, "maven")
        .when(col("comp_id") % 4 === 2, "pypi").otherwise("golang"),
      lit("/"),
      when(col("comp_id") % 3 =!= 0,
        concat(lit("ns"), (col("comp_id") % 5).cast("string"), lit("/"))).otherwise(""),
      regexp_replace(col("name"), " ", "-"), lit("@v"),
      (col("comp_id") % 9).cast("string"), lit("."), (col("comp_id") % 5).cast("string"),
      when(col("comp_id") % 2 === 0, "?arch=x86_64&os=linux").otherwise(""),
      when(col("comp_id") % 5 === 0, "#lib/src").otherwise(""))
    val core = regexp_replace(
      regexp_replace(col("purl"), "^pkg:[^/]+/", ""), "[?#].*$", "")
    components(t)
      .select(col("comp_id"), purl.as("purl"))
      .select(col("comp_id"), col("purl"),
        regexp_extract(col("purl"), "^pkg:([^/]+)/", 1).as("ptype"),
        core.as("core"))
      .select(col("comp_id"), col("purl"), col("ptype"),
        regexp_extract(col("core"), "@([^@]*)$", 1).as("version"),
        regexp_replace(col("core"), "@[^@]*$", "").as("path"))
      .select(col("comp_id"), col("ptype"),
        regexp_replace(col("path"), "/?[^/]+$", "").as("namespace"),
        regexp_extract(col("path"), "([^/]+)$", 1).as("name"),
        col("version"),
        regexp_extract(col("purl"), "\\?([^#]*)", 1).as("qualifiers"),
        regexp_extract(col("purl"), "#(.*)$", 1).as("subpath"))
      .orderBy(col("comp_id"))
  }

  // sbom_migrate — check_and_migrate_table (entrypoint.sh:130-163): a
  // legacy component table written before source tracking lacks the
  // source column; migration adds it with DEFAULT 'unknown', after which
  // both generations query identically through one schema. Modeled as
  // two table generations derived from part; the Spark side runs the
  // actual read-side upgrade (SbomSources.upgradeLegacySchema — the same
  // projection the physical rewrite uses, spec'd with real parquet in
  // SbomSourcesSpec).
  val migrate = Q(
    "sbom_migrate",
    Some(s"""
      WITH $componentsSql,
      legacy_gen AS (
        SELECT name, version, COALESCE(lic_id, 'unknown') AS license
        FROM components WHERE comp_id % 5 < 2),
      current_gen AS (
        SELECT name, version, COALESCE(lic_id, 'unknown') AS license,
               'repo-' || CAST(comp_id % 3 AS VARCHAR) AS source
        FROM components WHERE comp_id % 5 >= 2),
      migrated AS (
        SELECT name, version, license, 'unknown' AS source FROM legacy_gen
        UNION ALL
        SELECT name, version, license, source FROM current_gen)
      SELECT source, COUNT(*) AS n_components,
             COUNT(DISTINCT license) AS n_licenses
      FROM migrated
      GROUP BY source
      ORDER BY source
    """)
  ) { t =>
    val c = components(t)
    val legacyGen = c.filter(col("comp_id") % 5 < 2)
      .select(col("name"), col("version"),
        coalesce(col("lic_id"), lit("unknown")).as("license"))
    val currentGen = c.filter(col("comp_id") % 5 >= 2)
      .select(col("name"), col("version"),
        coalesce(col("lic_id"), lit("unknown")).as("license"),
        concat(lit("repo-"), (col("comp_id") % 3).cast("string")).as("source"))
    graft.sources.SbomSources.upgradeLegacySchema(legacyGen)
      .unionByName(currentGen)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_components"),
        countDistinct(col("license")).as("n_licenses"))
      .orderBy(col("source"))
  }

  // sbom_insert_escape — insert_sbom_data's TSV serialization
  // (entrypoint.sh:334-417, jq @tsv semantics): embedded backslashes,
  // tabs, newlines and carriage returns in name/version/license must
  // escape — backslash FIRST, or escaping a tab would double-escape —
  // else the ClickHouse TSV insert shifts columns and splits rows.
  // Dirty characters injected deterministically; the exact escaped line
  // plus its field count are compared, so a wrong escape order or a
  // missed character class fails the gate.
  val insertEscape = Q(
    "sbom_insert_escape",
    Some(s"""
      WITH $componentsSql,
      dirty AS (
        SELECT comp_id,
               name || CASE comp_id % 4
                 WHEN 0 THEN CHR(9) || 'x'
                 WHEN 1 THEN CHR(10) || 'y'
                 WHEN 2 THEN CHR(92) || 'z'
                 ELSE '' END AS name,
               version,
               COALESCE(lic_id, 'unknown') ||
                 CASE WHEN comp_id % 5 = 0 THEN CHR(13) || 'q' ELSE '' END AS license,
               'src-' || CAST(comp_id % 4 AS VARCHAR) AS source
        FROM components),
      esc AS (
        SELECT comp_id,
               REPLACE(REPLACE(REPLACE(REPLACE(name,
                 CHR(92), CHR(92) || CHR(92)), CHR(9), CHR(92) || 't'),
                 CHR(10), CHR(92) || 'n'), CHR(13), CHR(92) || 'r') AS e_name,
               REPLACE(REPLACE(REPLACE(REPLACE(version,
                 CHR(92), CHR(92) || CHR(92)), CHR(9), CHR(92) || 't'),
                 CHR(10), CHR(92) || 'n'), CHR(13), CHR(92) || 'r') AS e_version,
               REPLACE(REPLACE(REPLACE(REPLACE(license,
                 CHR(92), CHR(92) || CHR(92)), CHR(9), CHR(92) || 't'),
                 CHR(10), CHR(92) || 'n'), CHR(13), CHR(92) || 'r') AS e_license,
               source
        FROM dirty),
      lines AS (
        SELECT comp_id,
               e_name || CHR(9) || e_version || CHR(9) || e_license || CHR(9) || source AS tsv
        FROM esc)
      SELECT comp_id, tsv,
             CAST(LEN(STRING_SPLIT(tsv, CHR(9))) AS BIGINT) AS n_fields
      FROM lines
      ORDER BY comp_id
    """)
  ) { t =>
    import graft.sources.SbomSources.escapeTsv
    val dirty = components(t).select(
      col("comp_id"),
      concat(col("name"),
        when(col("comp_id") % 4 === 0, "\tx")
          .when(col("comp_id") % 4 === 1, "\ny")
          .when(col("comp_id") % 4 === 2, "\\z")
          .otherwise("")).as("name"),
      col("version"),
      concat(coalesce(col("lic_id"), lit("unknown")),
        when(col("comp_id") % 5 === 0, "\rq").otherwise("")).as("license"),
      concat(lit("src-"), (col("comp_id") % 4).cast("string")).as("source"))
    dirty
      .select(col("comp_id"),
        concat_ws("\t", escapeTsv(col("name")), escapeTsv(col("version")),
          escapeTsv(col("license")), escapeTsv(col("source"))).as("tsv"))
      .select(col("comp_id"), col("tsv"),
        size(split(col("tsv"), "\t", -1)).cast(LongType).as("n_fields"))
      .orderBy(col("comp_id"))
  }

  // sbom_local_merge — merge_local_cyclonedx_sboms (sbom-merging.sh:
  // 404-533): the local-files merge variant. Source tags derive from
  // each file's basename (the reader chain's last-resort strategy), the
  // dedup key includes that source (name@version#purl^source — the same
  // component from two files survives twice), and the output is a
  // reassembled CycloneDX envelope stamped ClickBOM/cyclonedx-merge with
  // a wiz-merged-sbom root component. The Spark side genuinely builds
  // the envelope JSON and parses it back; the oracle computes the same
  // extracted facts directly.
  val localMerge = Q(
    "sbom_local_merge",
    Some(s"""
      WITH $componentsSql,
      files AS (
        SELECT name, version, purl, REPLACE(filename, '.json', '') AS source,
               comp_id
        FROM components
        UNION ALL
        SELECT name, version, purl, 'extra-scan' AS source, comp_id
        FROM components WHERE comp_id % 3 = 0),
      dedup AS (
        SELECT name, version, purl, source,
               ROW_NUMBER() OVER (PARTITION BY name, version, purl, source
                                  ORDER BY comp_id) AS rn
        FROM files)
      SELECT 'CycloneDX' AS bom_format, '1.6' AS spec_version,
             'ClickBOM' AS tool_vendor, 'cyclonedx-merge' AS tool_name,
             'wiz-merged-sbom' AS root_component,
             CAST(COUNT(*) AS BIGINT) AS n_components,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
      FROM dedup WHERE rn = 1
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    val c = components(t)
    val files = c.select(col("name"), col("version"), col("purl"),
      regexp_replace(col("filename"), "\\.json", "").as("source"), col("comp_id"))
      .unionAll(c.filter(col("comp_id") % 3 === 0)
        .select(col("name"), col("version"), col("purl"),
          lit("extra-scan").as("source"), col("comp_id")))
    val w = Window.partitionBy(col("name"), col("version"), col("purl"), col("source"))
      .orderBy(col("comp_id"))
    val deduped = files.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    // assemble the real envelope, then parse it back — the extraction
    // fails if the assembled document is malformed
    val envelope = deduped
      .select(struct(col("name"), col("version"), col("purl"), col("source")).as("c"))
      .agg(sort_array(collect_list(col("c"))).as("components"))
      .select(to_json(struct(
        lit("CycloneDX").as("bomFormat"),
        lit("1.6").as("specVersion"),
        struct(
          array(struct(lit("ClickBOM").as("vendor"),
            lit("cyclonedx-merge").as("name"), lit("1.0.10").as("version"))).as("tools"),
          struct(lit("application").as("type"),
            lit("wiz-merged-sbom").as("name")).as("component")).as("metadata"),
        col("components"))).as("doc"))
    val schema = org.apache.spark.sql.types.DataType.fromDDL(
      "STRUCT<bomFormat: STRING, specVersion: STRING, " +
        "metadata: STRUCT<tools: ARRAY<STRUCT<vendor: STRING, name: STRING, version: STRING>>, " +
        "component: STRUCT<type: STRING, name: STRING>>, " +
        "components: ARRAY<STRUCT<name: STRING, version: STRING, purl: STRING, source: STRING>>>")
    envelope
      .withColumn("parsed", from_json(col("doc"), schema))
      .select(
        col("parsed.bomFormat").as("bom_format"),
        col("parsed.specVersion").as("spec_version"),
        col("parsed.metadata.tools").getItem(0).getField("vendor").as("tool_vendor"),
        col("parsed.metadata.tools").getItem(0).getField("name").as("tool_name"),
        col("parsed.metadata.component.name").as("root_component"),
        size(col("parsed.components")).cast(LongType).as("n_components"),
        size(array_distinct(transform(col("parsed.components"),
          c => c.getField("source")))).cast(LongType).as("n_sources"))
  }

  // sbom_diff — scan-over-scan drift: the query a security team runs
  // every morning against the component table the reference maintains —
  // what appeared, what vanished, what changed version between
  // yesterday's scan and today's. Two deterministic scan snapshots are
  // carved from the shared component corpus (distinct drop patterns +
  // a version-bump cohort), full-outer-joined on comp_id, classified,
  // and rolled up per status with the five lowest ids as evidence
  // (sorted-CSV serialization — the portable map idiom). One join keyed
  // on comp_id + one aggregation; at 100 TB the snapshots are two
  // partitions of the same inserted_at-partitioned table.
  val diff = Q(
    "sbom_diff",
    Some(s"""
      WITH $componentsSql,
      old_scan AS (
        SELECT comp_id, name, version FROM components WHERE comp_id % 10 <> 7),
      new_scan AS (
        SELECT comp_id, name,
               CASE WHEN comp_id % 5 = 0 THEN version || '-r2' ELSE version END AS version
        FROM components WHERE comp_id % 10 <> 3),
      joined AS (
        SELECT COALESCE(o.comp_id, n.comp_id) AS comp_id,
               CASE WHEN o.comp_id IS NULL THEN 'added'
                    WHEN n.comp_id IS NULL THEN 'removed'
                    WHEN o.version <> n.version THEN 'version_changed'
                    ELSE 'unchanged' END AS status
        FROM old_scan o FULL OUTER JOIN new_scan n ON n.comp_id = o.comp_id)
      SELECT status,
             CAST(COUNT(*) AS BIGINT) AS n_components,
             array_to_string(LIST(comp_id::VARCHAR ORDER BY comp_id)[1:5], ',') AS sample_ids
      FROM joined
      GROUP BY status
      ORDER BY status
    """)
  ) { t =>
    val comps = components(t)
    val oldScan = comps.filter(col("comp_id") % 10 =!= 7)
      .select(col("comp_id").as("o_id"), col("version").as("o_ver"))
    val newScan = comps.filter(col("comp_id") % 10 =!= 3)
      .select(col("comp_id").as("n_id"),
        when(col("comp_id") % 5 === 0, concat(col("version"), lit("-r2")))
          .otherwise(col("version")).as("n_ver"))
    oldScan
      .join(newScan, col("o_id") === col("n_id"), "full_outer")
      .select(coalesce(col("o_id"), col("n_id")).as("comp_id"),
        when(col("o_id").isNull, "added")
          .when(col("n_id").isNull, "removed")
          .when(col("o_ver") =!= col("n_ver"), "version_changed")
          .otherwise("unchanged").as("status"))
      .groupBy(col("status"))
      .agg(count(lit(1)).cast(LongType).as("n_components"),
        concat_ws(",",
          transform(slice(sort_array(collect_list(col("comp_id"))), 1, 5),
            c => c.cast("string"))).as("sample_ids"))
      .orderBy(col("status"))
  }

  // sbom_fuzzy_match — cross-scanner component reconciliation: two
  // scanners report the same package under formatting variants
  // ("my widget" vs "my-widget" vs "MY_WIDGET"), and naive exact joins
  // call them different components. The scalable shape: join on a
  // NORMALIZED key (lower, non-alnum → nothing — a pure per-row
  // expression, so the join stays an equi-join) and CONFIRM with edit
  // distance on the raw names bounded to the candidate pairs only —
  // never names². Reports match classes: exact, normalized-only
  // (formatting drift), and the per-class edit-distance mass.
  val fuzzyMatch = Q(
    "sbom_fuzzy_match",
    Some(s"""
      WITH $componentsSql,
      scan_a AS (
        SELECT comp_id, name FROM components),
      scan_b AS (
        SELECT comp_id,
               CASE WHEN comp_id % 3 = 0 THEN REPLACE(name, ' ', '-')
                    WHEN comp_id % 3 = 1 THEN UPPER(REPLACE(name, ' ', '_'))
                    ELSE name END AS name
        FROM components),
      keyed AS (
        SELECT a.comp_id, a.name AS name_a, b.name AS name_b,
               CASE WHEN a.name = b.name THEN 'exact'
                    ELSE 'normalized' END AS match_class,
               levenshtein(a.name, b.name) AS edit_dist
        FROM scan_a a JOIN scan_b b
          ON REGEXP_REPLACE(LOWER(a.name), '[^a-z0-9]', '', 'g')
           = REGEXP_REPLACE(LOWER(b.name), '[^a-z0-9]', '', 'g')
         AND a.comp_id = b.comp_id)
      SELECT match_class,
             CAST(COUNT(*) AS BIGINT) AS n_components,
             CAST(SUM(edit_dist) AS BIGINT) AS total_edit_dist,
             CAST(MAX(edit_dist) AS BIGINT) AS max_edit_dist
      FROM keyed
      GROUP BY match_class
      ORDER BY match_class
    """)
  ) { t =>
    val comps = components(t)
    val scanA = comps.select(col("comp_id").as("id_a"), col("name").as("name_a"))
    val scanB = comps.select(col("comp_id").as("id_b"),
      when(col("comp_id") % 3 === 0, regexp_replace(col("name"), " ", "-"))
        .when(col("comp_id") % 3 === 1, upper(regexp_replace(col("name"), " ", "_")))
        .otherwise(col("name")).as("name_b"))
    def norm(c: Column): Column = regexp_replace(lower(c), "[^a-z0-9]", "")
    scanA
      .join(scanB,
        norm(col("name_a")) === norm(col("name_b")) && col("id_a") === col("id_b"))
      .select(
        when(col("name_a") === col("name_b"), "exact")
          .otherwise("normalized").as("match_class"),
        levenshtein(col("name_a"), col("name_b")).cast(LongType).as("edit_dist"))
      .groupBy(col("match_class"))
      .agg(count(lit(1)).cast(LongType).as("n_components"),
        sum(col("edit_dist")).cast(LongType).as("total_edit_dist"),
        max(col("edit_dist")).cast(LongType).as("max_edit_dist"))
      .orderBy(col("match_class"))
  }

  val all: Seq[Q] = Seq(flatten, mergeDedup, licenseMap, sourceExtract,
    filterPatterns, tableName, formatDetect, refCategory, componentStats,
    validate, convert, validateModes, purlParse, migrate, insertEscape,
    localMerge, diff, fuzzyMatch)
}
