package graft

import graft.sbom.Sanitize
import org.apache.spark.sql.Column

/** The reference's sanitize bats cases (test/simple.bats, advanced.bats)
  * re-run against the vectorized transforms. Invalid input → NULL (the
  * engine analog of the bash `exit 1`).
  */
class SanitizeSpec extends SparkSpec {

  private def run1(f: Column => Column, in: String): Option[String] = {
    import spark.implicits._
    Seq(in).toDF("x").select(f(org.apache.spark.sql.functions.col("x")).as("y"))
      .collect().headOption.flatMap(r => Option(r.getString(0)))
  }

  test("sanitize_string removes dangerous characters, control chars, respects length") {
    assert(run1(Sanitize.sanitizeString(_), "hello$(rm -rf /)world") === Some("hellorm -rf /world"))
    assert(run1(Sanitize.sanitizeString(_), "back`tick`") === Some("backtick"))
    assert(run1(Sanitize.sanitizeString(_), "pipe|and;semi&amp") === Some("pipeandsemiamp"))
    assert(run1(Sanitize.sanitizeString(_), "redirect>out<in") === Some("redirectoutin"))
    assert(run1(Sanitize.sanitizeString(_), "tab\tnew\nline\rctrl") === Some("tabnewlinectrl"))
    assert(run1(Sanitize.sanitizeString(_, 5), "abcdefghij") === Some("abcde"))
    assert(run1(Sanitize.sanitizeString(_), "safe-chars_1.2/ok") === Some("safe-chars_1.2/ok"))
    assert(run1(Sanitize.sanitizeString(_), "") === Some(""))
  }

  test("sanitize_repository validates owner/repo") {
    assert(run1(Sanitize.sanitizeRepository(_), "ClickHouse/ClickBOM") === Some("ClickHouse/ClickBOM"))
    assert(run1(Sanitize.sanitizeRepository(_), "own-er_1/re.po_2") === Some("own-er_1/re.po_2"))
    assert(run1(Sanitize.sanitizeRepository(_), "owner/repo$(evil)") === Some("owner/repoevil"))
    assert(run1(Sanitize.sanitizeRepository(_), "noslash") === None)
    assert(run1(Sanitize.sanitizeRepository(_), "a/b/c") === None)
    assert(run1(Sanitize.sanitizeRepository(_), "/repo") === None)
    assert(run1(Sanitize.sanitizeRepository(_), "owner/") === None)
    assert(run1(Sanitize.sanitizeRepository(_), "../../../etc/passwd") === None)
  }

  test("sanitize_url enforces protocols per service") {
    assert(run1(Sanitize.sanitizeUrl(_), "http://example.com/path") === Some("http://example.com/path"))
    assert(run1(Sanitize.sanitizeUrl(_), "ftp://example.com") === None)
    assert(run1(Sanitize.sanitizeUrl(_), "javascript:alert(1)") === None)
    assert(run1(Sanitize.sanitizeUrl(_), "file:///etc/passwd") === None)
    assert(run1(Sanitize.sanitizeUrl(_, "clickhouse"), "https://ch.example.com:8443") === Some("https://ch.example.com:8443"))
    assert(run1(Sanitize.sanitizeUrl(_, "mend"), "https://api-saas.mend.io") === Some("https://api-saas.mend.io"))
    assert(run1(Sanitize.sanitizeUrl(_, "mend"), "http://api-saas.mend.io") === None)
    assert(run1(Sanitize.sanitizeUrl(_, "wiz"), "http://api.wiz.io") === None)
  }

  test("sanitize_s3_bucket rules") {
    assert(run1(Sanitize.sanitizeS3Bucket(_), "My-Bucket-123") === Some("my-bucket-123"))
    assert(run1(Sanitize.sanitizeS3Bucket(_), "bucket.with.dots") === Some("bucket.with.dots"))
    assert(run1(Sanitize.sanitizeS3Bucket(_), "ab") === None)
    assert(run1(Sanitize.sanitizeS3Bucket(_), "a" * 64) === None)
    assert(run1(Sanitize.sanitizeS3Bucket(_), "192.168.1.1") === None)
    assert(run1(Sanitize.sanitizeS3Bucket(_), "-bad-start") === None)
  }

  test("sanitize_s3_key traversal and slash handling") {
    assert(run1(Sanitize.sanitizeS3Key(_), "path/to/sbom.json") === Some("path/to/sbom.json"))
    assert(run1(Sanitize.sanitizeS3Key(_), "../../etc/passwd") === Some("etc/passwd"))
    assert(run1(Sanitize.sanitizeS3Key(_), "a//b///c") === Some("a/b/c"))
    assert(run1(Sanitize.sanitizeS3Key(_), "/leading/and/trailing/") === Some("leading/and/trailing"))
    assert(run1(Sanitize.sanitizeS3Key(_), "$(){}|") === None)
  }

  test("sanitize_uuid shapes") {
    assert(run1(Sanitize.sanitizeUuid(_), "12345678-1234-1234-1234-1234567890ab")
      === Some("12345678-1234-1234-1234-1234567890ab"))
    assert(run1(Sanitize.sanitizeUuid(_), "123456781234123412341234567890AB")
      === Some("123456781234123412341234567890AB"))
    assert(run1(Sanitize.sanitizeUuid(_), "1234-too-short") === None)
    assert(run1(Sanitize.sanitizeUuid(_), "zzzzzzzz-1234-1234-1234-1234567890ab")
      === None)
  }

  test("sanitize_email validation and injection defense") {
    assert(run1(Sanitize.sanitizeEmail(_), "user@example.com") === Some("user@example.com"))
    assert(run1(Sanitize.sanitizeEmail(_), "u.s-er+tag@ex-ample.co") === Some("u.s-er+tag@ex-ample.co"))
    assert(run1(Sanitize.sanitizeEmail(_), "user\\nBcc:evil@x.com@example.com") === None)
    assert(run1(Sanitize.sanitizeEmail(_), "no-at-sign.com") === None)
    assert(run1(Sanitize.sanitizeEmail(_), "user@nodomain") === None)
  }

  test("sanitize_database_name rules") {
    assert(run1(Sanitize.sanitizeDatabaseName(_), "valid_db_1") === Some("valid_db_1"))
    assert(run1(Sanitize.sanitizeDatabaseName(_), "1starts_with_digit") === Some("_1starts_with_digit"))
    assert(run1(Sanitize.sanitizeDatabaseName(_), "bad; DROP TABLE x") === Some("badDROPTABLEx"))
  }

  test("sanitize_patterns preserves wildcards, trims, drops empties") {
    assert(run1(Sanitize.sanitizePatterns(_), "*.json, file?.txt") === Some("*.json,file.txt"))
    assert(run1(Sanitize.sanitizePatterns(_), " a*.json ,, b-*.json ") === Some("a*.json,b-*.json"))
    assert(run1(Sanitize.sanitizePatterns(_), ",,,") === Some(""))
    assert(run1(Sanitize.sanitizePatterns(_), "evil$(x)*.json") === Some("evilx*.json"))
  }

  test("sanitize_numeric range and parsing") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def num(in: String, lo: Long, hi: Long): Option[Long] =
      Seq(in).toDF("x").select(Sanitize.sanitizeNumeric(col("x"), lo, hi).as("y"))
        .collect().headOption.flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(num("300", 60, 7200) === Some(300L))
    assert(num("0042", 0, 100) === Some(42L))
    assert(num("30s", 0, 100) === Some(30L))
    assert(num("abc", 0, 100) === None)
    assert(num("30", 60, 7200) === None)
    assert(num("9999", 0, 100) === None)
    assert(num("60", 60, 7200) === Some(60L))
    assert(num("7200", 60, 7200) === Some(7200L))
  }

  test("table name derivation") {
    assert(run1(Sanitize.tableName(_), "ClickHouse/ClickBOM") === Some("clickhouse_clickbom"))
    assert(run1(Sanitize.tableName(_), "repo.name-1") === Some("repo_name_1"))
  }
}
