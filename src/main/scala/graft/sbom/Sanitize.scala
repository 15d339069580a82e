package graft.sbom

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's input-sanitization layer (lib/sanitize.sh) as
  * vectorized Column transforms — identical rules, engine semantics:
  * where the bash exits 1 on invalid input, these return NULL so invalid
  * rows are filterable/attributable instead of aborting a 100 TB job.
  *
  * Each function cites the lib/sanitize.sh lines it mirrors; SanitizeSpec
  * re-runs the reference's bats cases against them.
  */
object Sanitize {

  /** sanitize.sh:5-17 — strip control chars + high bytes, drop shell
    * metacharacters (backtick, $(){}|;&<>@[] and brackets), cap length.
    */
  def sanitizeString(c: Column, maxLength: Int = 1000): Column =
    substring(
      regexp_replace(
        regexp_replace(c, "[\\x00-\\x1f\\x7f-\\uffff]", ""),
        "[\\]\\$\\(\\)\\{\\}\\|;&<>@\\[`]", ""),
      1, maxLength)

  /** sanitize.sh:20-35 — charset-strip then owner/repo validation;
    * NULL when the stripped value is not `owner/repo`.
    */
  def sanitizeRepository(c: Column): Column = {
    val stripped = regexp_replace(c, "[^a-zA-Z0-9._/-]", "")
    when(stripped.rlike("^[a-zA-Z0-9._-]+/[a-zA-Z0-9._-]+$"), stripped)
  }

  /** sanitize.sh:38-79 — control-char strip + per-type protocol/format
    * validation (clickhouse: http(s) host[:port] only; mend/wiz: https
    * domain; general: http(s) host with optional path).
    */
  def sanitizeUrl(c: Column, urlType: String = "general"): Column = {
    val stripped = regexp_replace(c, "[\\x00-\\x1f\\x7f-\\uffff]", "")
    val re = urlType match {
      case "clickhouse" => "^https?://[a-zA-Z0-9][a-zA-Z0-9.-]*(:[0-9]+)?/?$"
      case "mend" | "wiz" => "^https://[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}(/.*)?$"
      case _ => "^https?://[a-zA-Z0-9][a-zA-Z0-9.-]*(:[0-9]+)?(/.*)?$"
    }
    when(stripped.rlike(re), stripped)
  }

  /** sanitize.sh:82-106 — lowercase, charset-strip, 3-63 char rule,
    * not-IP-formatted rule.
    */
  def sanitizeS3Bucket(c: Column): Column = {
    val stripped = regexp_replace(lower(c), "[^a-z0-9.-]", "")
    when(stripped.rlike("^[a-z0-9][a-z0-9.-]{1,61}[a-z0-9]$") &&
      !stripped.rlike("^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$"), stripped)
  }

  /** sanitize.sh:109-129 — charset whitelist, kill `..` traversal,
    * collapse duplicate slashes, trim edge slashes; NULL if empty after.
    */
  def sanitizeS3Key(c: Column): Column = {
    val cleaned = regexp_replace(
      regexp_replace(
        regexp_replace(regexp_replace(c, "[^a-zA-Z0-9._/-]", ""), "\\.\\.", ""),
        "/+", "/"),
      "^/+|/+$", "")
    when(length(cleaned) > 0, cleaned)
  }

  /** sanitize.sh:132-148 — hex+hyphen strip then UUID shape validation. */
  def sanitizeUuid(c: Column): Column = {
    val stripped = regexp_replace(c, "[^a-fA-F0-9-]", "")
    when(stripped.rlike("^[0-9a-fA-F]{8}-?([0-9a-fA-F]{4}-?){3}[0-9a-fA-F]{12}$"), stripped)
  }

  /** sanitize.sh:151-174 — drop literal escape sequences, control chars,
    * non-email chars; validate user@domain.tld.
    */
  def sanitizeEmail(c: Column): Column = {
    val stripped = regexp_replace(
      regexp_replace(
        regexp_replace(c, "\\\\n|\\\\r|\\\\t|\\\\\\\\", ""),
        "[\\x00-\\x1f\\x7f-\\uffff]", ""),
      "[^a-zA-Z0-9@._+-]", "")
    when(stripped.rlike("^[a-zA-Z0-9._+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}$"), stripped)
  }

  /** sanitize.sh:177-185 — alphanumeric+underscore only; leading digit
    * gets an underscore prefix.
    */
  def sanitizeDatabaseName(c: Column): Column = {
    val stripped = regexp_replace(c, "[^a-zA-Z0-9_]", "")
    when(stripped.rlike("^[0-9]"), concat(lit("_"), stripped)).otherwise(stripped)
  }

  /** sanitize.sh:188-217 — split on commas, trim, whitelist (wildcards
    * kept), drop empties, rejoin.
    */
  def sanitizePatterns(c: Column): Column =
    array_join(
      filter(
        transform(split(c, ","),
          p => regexp_replace(trim(p), "[^a-zA-Z0-9.*_-]", "")),
        p => length(p) > 0),
      ",")

  /** sanitize.sh:220-251 — digit-strip, integer parse (leading zeros
    * collapse), range check; NULL when non-numeric or out of range.
    */
  def sanitizeNumeric(c: Column, minVal: Long = 0, maxVal: Long = 999999): Column = {
    val digits = regexp_replace(c, "[^0-9]", "")
    val n = when(digits.rlike("^[0-9]+$"), digits.cast("long"))
    when(n.between(minVal, maxVal), n)
  }

  /** entrypoint.sh:469 — ClickHouse table-name derivation. */
  def tableName(c: Column): Column =
    lower(regexp_replace(c, "[^a-zA-Z0-9]", "_"))
}
