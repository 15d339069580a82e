package graft.dedup

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Deduplication operators for training-data pipelines (SURVEY.md §2c):
  * exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design: every near-dup algorithm is candidate-generation by
  * bucketing (band hash / simhash prefix / shared shingle) followed by
  * per-bucket or per-pair verification — never an all-pairs cartesian.
  * The self-test corpus plants perturbed twins (doc_id + 1_000_000, last
  * words dropped) so specs can assert recovery.
  */
object Dedup {

  private def words(c: Column): Column = split(trim(c), "\\s+")

  /** documents ∪ perturbed twins (last 3 words dropped, id offset 1M). */
  def withTwins(t: Tables): DataFrame = {
    val d = t.documents.select(col("doc_id"), col("text"))
    val twins = d.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      array_join(slice(words(col("text")), lit(1),
        greatest(size(words(col("text"))) - 3, lit(1))), " ").as("text"))
    d.unionAll(twins)
  }

  // dedup_exact — content-hash dedup at two normalization levels: full text
  // (md5 of lowercased text) and 20-char prefix key. One shuffle per level.
  val exact = Q(
    "dedup_exact",
    Some("""
      WITH full_key AS (
        SELECT MD5(LOWER(text)) AS k FROM documents),
      prefix_key AS (
        SELECT SUBSTR(text, 1, 20) AS k FROM documents)
      SELECT 'full_md5' AS method, COUNT(*) AS n_docs, COUNT(DISTINCT k) AS n_unique,
             COUNT(*) - COUNT(DISTINCT k) AS n_dropped
      FROM full_key
      UNION ALL
      SELECT 'prefix20' AS method, COUNT(*) AS n_docs, COUNT(DISTINCT k) AS n_unique,
             COUNT(*) - COUNT(DISTINCT k) AS n_dropped
      FROM prefix_key
      ORDER BY method
    """)
  ) { t =>
    def level(method: String, key: Column): DataFrame =
      t.documents.select(key.as("k"))
        .agg(count(lit(1)).as("n_docs"), countDistinct(col("k")).as("n_unique"))
        .select(lit(method).as("method"), col("n_docs"), col("n_unique"),
          (col("n_docs") - col("n_unique")).as("n_dropped"))
    level("full_md5", md5(lower(col("text")).cast("binary")))
      .unionAll(level("prefix20", substring(col("text"), 1, 20)))
      .orderBy(col("method"))
  }

  /** Word w-shingles as strings. */
  private def shingles(c: Column, w: Int): Column = {
    val ws = words(c)
    array_distinct(transform(
      sequence(lit(0), greatest(size(ws) - w, lit(0))),
      i => array_join(slice(ws, i + 1, lit(w)), " ")))
  }

  // dedup_ngram_jaccard — 3-word-shingle Jaccard via inverted-index
  // candidate join: explode shingles → self-join on shingle (id<id2) →
  // co-occurrence counts → Jaccard ≥ 0.6. The join key is the shingle, so
  // work is proportional to shared-shingle pairs, not |docs|².
  val ngramJaccard = Q("dedup_ngram_jaccard", None) { t =>
    val sh = withTwins(t).select(col("doc_id"), shingles(col("text"), 3).as("sh"))
    val sizes = sh.select(col("doc_id"), size(col("sh")).as("n"))
    val inv = sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val co = inv.as("a")
      .join(inv.as("b"), col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("co"))
    co.join(sizes.as("s1"), col("id1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("id2") === col("s2.doc_id"))
      .select(col("id1"), col("id2"),
        round(col("co").cast(DoubleType) /
          (col("s1.n") + col("s2.n") - col("co")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.6)
      .orderBy(col("id1"), col("id2"))
  }

  /** k MinHash values for a shingle array: min over universal-hash family
    * h_i(x) = xxhash64(shingle, seed=i). Codegen'd higher-order functions.
    */
  private def minhashSig(sh: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(sh, s => xxhash64(s, i))))

  // dedup_minhash_lsh — MinHash signatures (k=16) banded into 4 bands of 4;
  // docs sharing any band bucket are candidates; verified by signature
  // agreement (estimated Jaccard ≥ 0.5). Bucket-join, never cartesian.
  val minhashLsh = Q("dedup_minhash_lsh", None) { t =>
    val k = 16; val bands = 4; val rows = k / bands
    val sig = withTwins(t)
      .select(col("doc_id"), minhashSig(shingles(col("text"), 3), k).as("sig"))
    val banded = sig.select(col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(array_join(slice(col("sig"), b * rows + 1, lit(rows)), ",")))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val cands = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.sig").as("sig1"), col("b.sig").as("sig2"))
      .distinct()
    cands
      .select(col("id1"), col("id2"),
        round(size(filter(zip_with(col("sig1"), col("sig2"), (x, y) => x === y),
          m => m)).cast(DoubleType) / k, 4).as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.5)
      .orderBy(col("id1"), col("id2"))
  }

  /** 64-bit SimHash over word xxhashes: bit b set iff the majority of word
    * hashes have bit b set.
    */
  private def simhash(c: Column): Column = {
    val hs = transform(words(lower(c)), w => xxhash64(w))
    val n = size(hs)
    aggregate(sequence(lit(0), lit(63)), lit(0L), (acc, b) =>
      acc.bitwiseOR(
        when(size(filter(hs, h =>
            call_function("shiftright", h, b).bitwiseAND(lit(1L)) === 1L)) * 2 >= n,
          call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))))
  }

  // dedup_simhash — SimHash near-dup with multi-table banding: the 64-bit
  // signature splits into 8 disjoint 8-bit bands; docs sharing ANY band
  // value are candidates (pigeonhole: hamming ≤ 7 guarantees a clean band),
  // then exact Hamming ≤ 8 verification via bit_count(xor). The join key is
  // (band, value) — candidate volume scales with real collisions, never n².
  val simhashDedup = Q("dedup_simhash", None) { t =>
    val sigs = withTwins(t).select(col("doc_id"), simhash(col("text")).as("sig"))
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(7)),
        b => call_function("shiftright", col("sig"), b * 8).bitwiseAND(lit(0xffL)))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bval")
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast(LongType).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 8)
      .orderBy(col("id1"), col("id2"))
  }

  /** Diagnostic accessor for tooling/specs. */
  def debugSimhashSigs(t: Tables): DataFrame =
    withTwins(t).select(col("doc_id"), simhash(col("text")).as("sig"))

  val all: Seq[Q] = Seq(exact, ngramJaccard, minhashLsh, simhashDedup)
}
