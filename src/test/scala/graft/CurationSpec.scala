package graft

import graft.text.CurationOps
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  test("pipe_eval_split: splits partition the corpus and leaks are cross-split dup groups") {
    val rows = CurationOps.evalSplit.build(sf0001).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total === sf0001.documents.count())
    // every (source, split) row belongs to the fixed split set and the
    // 90/5/5 hash split makes train strictly dominant per source
    val splits = rows.map(_.getAs[String]("split")).toSet
    assert(splits.subsetOf(Set("train", "valid", "test")))
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (_, rs) =>
      val m = rs.map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
      assert(m.getOrElse("train", 0L) > m.getOrElse("valid", 0L))
      assert(m.getOrElse("train", 0L) > m.getOrElse("test", 0L))
    }
    // a doc leaked in one split implies its twin is counted in another:
    // leaks can never be confined to a single split overall
    val leakedSplits = rows.filter(_.getAs[Long]("n_leaked") > 0)
      .map(_.getAs[String]("split")).toSet
    assert(leakedSplits.isEmpty || leakedSplits.size >= 2)
  }

  test("pipe_eval_split: planted cross-split duplicate is flagged in both splits") {
    import spark.implicits._
    // doc ids 0 and 13 land in different splits under the Knuth hash;
    // give them identical text and both must count as leaked
    def bucket(id: Long): Long = id * 2654435761L % 2147483648L % 100L
    val id2 = (1L to 200L).find(i => (bucket(i) < 90) != (bucket(0L) < 90)).get
    val docs = Seq(
      (0L, "alpha beta gamma", "s1", "en"),
      (id2, "ALPHA BETA GAMMA", "s1", "en"), // case-insensitive dup
      (2L, "wholly unrelated content", "s2", "en"))
      .toDF("doc_id", "text", "source", "lang")
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("curation-planted").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = CurationOps.evalSplit.build(Tables(spark, dir)).collect()
    assert(rows.map(_.getAs[Long]("n_leaked")).sum === 2L)
    assert(rows.filter(_.getAs[Long]("n_leaked") > 0)
      .map(_.getAs[String]("split")).toSet.size === 2)
  }

  test("dedup_cross_source: pairs are ordered, bounded, and overlap_bp is a valid jaccard") {
    val rows = CurationOps.crossSource.build(sf0001).collect()
    assert(rows.nonEmpty)
    val nSources = sf0001.documents.select("source").distinct().count()
    assert(rows.length <= nSources * (nSources - 1) / 2)
    rows.foreach { r =>
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
      val bp = r.getAs[Long]("overlap_bp")
      assert(bp >= 0 && bp <= 10000)
      assert(r.getAs[Long]("n_shared") > 0)
    }
  }

  test("text_tfidf: five non-stopword terms per source, rarity-ranked") {
    val rows = CurationOps.tfidf.build(sf0001).collect()
    val sources = rows.map(_.getAs[String]("source")).distinct
    assert(rows.length === sources.length * 5)
    val stop = graft.text.TextOps.stopwords.toSet
    rows.foreach { r =>
      assert(!stop.contains(r.getAs[String]("term")))
      assert(r.getAs[Long]("score") === r.getAs[Long]("tf") * 10000 / r.getAs[Long]("df"))
    }
    // ranks are dense 1..5 and scores non-increasing within a source
    rows.groupBy(_.getAs[String]("source")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq === (1L to 5L))
      val scores = sorted.map(_.getAs[Long]("score")).toSeq
      assert(scores === scores.sorted.reverse)
    }
  }

  test("pipe_quality_classifier: scores are the planted hash-weight sums") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // reference scoring: portable word hash → weight = h % 2001 - 1000
    val P = graft.functions.PortableHash.P
    def wh(w: String): Long =
      w.getBytes("UTF-8").foldLeft(7L)((h, b) => (h * 31 + (b & 0xff)) % P)
    def score(text: String): Long =
      text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .map(w => wh(w) % 2001 - 1000).sum
    val texts = Seq("alpha beta gamma delta", "zip zap", "one two three four five")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, s"s${i % 2}", "en") }
      .toDF("doc_id", "text", "source", "lang")
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("clf-planted").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = CurationOps.qualityClassifier.build(Tables(spark, dir)).collect()
    val expKept = texts.zipWithIndex.groupBy { case (_, i) => s"s${i % 2}" }
      .view.mapValues(ts => ts.count { case (t, _) => score(t) >= 0 }).toMap
    rows.foreach { r =>
      val s = r.getAs[String]("source")
      assert(r.getAs[Long]("kept_docs") === expKept(s).toLong, s)
      assert(r.getAs[Long]("kept_bp") ===
        r.getAs[Long]("kept_docs") * 10000 / r.getAs[Long]("docs"))
    }
    assert(rows.map(_.getAs[Long]("docs")).sum === texts.length.toLong)
  }

  test("pipe_dataset_card: counters agree with directly-computed facts") {
    val rows = CurationOps.datasetCard.build(sf0001).collect()
    val docs = sf0001.documents
    assert(rows.map(_.getAs[Long]("docs")).sum === docs.count())
    val bySource = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), countDistinct(col("lang")).as("langs"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val s = r.getAs[String]("source")
      assert(r.getAs[Long]("docs") === bySource(s)._1)
      assert(r.getAs[Long]("langs") === bySource(s)._2)
      assert(r.getAs[Long]("mean_tokens_x100") ===
        r.getAs[Long]("tokens") * 100 / r.getAs[Long]("docs"))
      assert(r.getAs[Long]("vocab") > 0 && r.getAs[Long]("dup_docs") >= 0)
      // the majority language is the argmax of the per-source lang counts
      val top = docs.filter(col("source") === s).groupBy(col("lang"))
        .agg(count(lit(1)).as("n")).orderBy(col("n").desc, col("lang"))
        .head().getString(0)
      assert(r.getAs[String]("top_lang") === top)
    }
  }

  test("text_novelty: novel shingle totals equal the distinct corpus shingle count") {
    graft.functions.GraftFunctions.register(spark)
    val rows = CurationOps.novelty.build(sf0001).collect()
    val totalNovel = rows.map(_.getAs[Long]("n_novel")).sum
    val distinctShingles = sf0001.documents
      .select(explode(call_function("graft_shingles", col("text"))).as("sh"))
      .distinct().count()
    // every distinct shingle is novel exactly once — in its first document
    assert(totalNovel === distinctShingles)
    rows.foreach { r =>
      assert(r.getAs[Long]("novelty_bp") >= 0 && r.getAs[Long]("novelty_bp") <= 10000)
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_shingles"))
    }
  }

  test("text_tv_drift: tv_bp in [0, 10000]; one row per source; top token drawn from the source") {
    val rows = CurationOps.tvDrift.build(sf0001).collect()
    val sources = sf0001.documents.select(col("source")).distinct().count()
    assert(rows.length === sources.toInt)
    rows.foreach { r =>
      val tv = r.getAs[Long]("tv_bp")
      assert(tv >= 0L && tv <= 10000L, s"tv_bp out of range: $tv")
      assert(r.getAs[String]("top_token").nonEmpty)
      assert(r.getAs[Long]("n_tokens") > 0L)
    }
  }

  test("text_tv_drift: operator matches a driver-side exact replay of the TV formula") {
    val rows = CurationOps.tvDrift.build(sf0001).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("tv_bp")).toMap
    // independent reimplementation: collect token counts, compute
    // ½·Σ_t |c_ts/N_s − C_t/N| per source with exact BigInt arithmetic
    val counts = sf0001.documents
      .select(col("source"),
        explode(filter(split(trim(lower(col("text"))), "\\s+"), w => w =!= "")).as("w"))
      .groupBy(col("source"), col("w")).count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val corpus = counts.groupMapReduce(_._1._2)(_._2)(_ + _)
    val perSrc = counts.groupMapReduce(_._1._1)(_._2)(_ + _)
    val n = BigInt(corpus.values.sum)
    perSrc.foreach { case (src, nsL) =>
      val ns = BigInt(nsL)
      val total = corpus.keysIterator.map { w =>
        val cts = BigInt(counts.getOrElse((src, w), 0L))
        (cts * n - BigInt(corpus(w)) * ns).abs
      }.sum
      val expect = (BigInt(10000) * total / (2 * n * ns)).toLong
      // the operator floors an IEEE quotient; allow the 1-ulp boundary
      assert(math.abs(rows(src) - expect) <= 1L, s"$src: ${rows(src)} vs $expect")
    }
  }

  test("text_readability: formula reproduces from the reported integer sums") {
    CurationOps.readability.build(sf0001).collect().foreach { r =>
      val w = r.getAs[Long]("words"); val s = r.getAs[Long]("sentences")
      val y = r.getAs[Long]("syllables")
      val expect = BigDecimal(206.835 - 1.015 * (w.toDouble / s) - 84.6 * (y.toDouble / w))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("flesch") - expect) < 1e-9)
      assert(w > 0 && s >= 1 && y > 0)
    }
  }
}
