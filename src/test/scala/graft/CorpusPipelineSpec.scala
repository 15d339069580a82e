package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.text.CorpusPipeline

/** End-to-end corpus build: run(config) over sf0.001, checking stage
  * monotonicity, decontamination, the written shards, and the manifest's
  * internal consistency.
  */
class CorpusPipelineSpec extends SparkSpec {

  test("run ships a sharded corpus with consistent yields and manifest") {
    val t = sf0001
    val out = Files.createTempDirectory("graft-corpus").toString
    // holdout = the texts of three real docs → those docs (and any doc
    // sharing a 5-gram with them) must be decontaminated away
    val benchIds = Seq(3L, 7L, 11L)
    val holdout = t.documents.filter(col("doc_id").isin(benchIds: _*))
      .select(col("text"))
    val cfg = CorpusPipeline.Config(
      minTokens = 10,
      minStopwordBp = 0,
      holdout = Some(holdout),
      sourceShareBp = Map("src0" -> 5000),
      dsirMinWeightBp = Some(8000),
      shardTokenBudget = 500L,
      outDir = out)
    val res = CorpusPipeline.run(t, cfg)

    // the DSIR stage selected exactly the docs whose recomputed weight
    // over the decontaminated corpus clears the threshold
    val postDecon = res.stages.find(_.stage === "decontaminate").get.docs
    val postDsir = res.stages.find(_.stage === "dsir_select").get.docs
    assert(postDsir <= postDecon)
    assert(postDsir > 0, "DSIR selection emptied the corpus")

    // stage yields decrease monotonically (every stage only drops docs)
    val docs = res.stages.map(_.docs)
    assert(docs === docs.sorted.reverse, s"stage docs not monotone: $docs")
    assert(res.stages.head.stage === "raw")
    assert(res.docsWritten > 0 && res.docsWritten <= docs.head)

    val corpus = spark.read.parquet(s"$out/corpus")
    assert(corpus.count() === res.docsWritten)
    // the holdout docs themselves share all their 5-grams → dropped
    val leaked = corpus.filter(col("doc_id").isin(benchIds: _*)).count()
    assert(leaked === 0L, s"$leaked holdout docs leaked into the corpus")

    // mix: src0 kept at most half its pre-mix docs
    val bySource = corpus.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val preMix = res.stages.find(_.stage === "decontaminate").get.docs
    assert(bySource.getOrElse("src0", 0L) < preMix)

    // manifest consistency: totals match, shards bounded by budget +
    // one overflowing doc (whole-doc assignment never splits)
    val manifest = spark.read.parquet(s"$out/manifest").collect()
    assert(manifest.length.toLong === res.shards)
    assert(manifest.map(_.getAs[Long]("n_tokens")).sum === res.tokensWritten)
    assert(manifest.map(_.getAs[Long]("n_docs")).sum === res.docsWritten)
    val maxDoc = corpus.agg(max(col("n_tok"))).head().getLong(0)
    manifest.foreach { m =>
      assert(m.getAs[Long]("n_tokens") <= cfg.shardTokenBudget + maxDoc)
      assert(m.getAs[Long]("id_lo") <= m.getAs[Long]("id_hi"))
    }
    assert(res.log.exists(_.contains("wrote manifest")))
  }
}
