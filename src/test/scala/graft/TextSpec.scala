package graft

import graft.text.TextOps
import graft.sbom.Sbom
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {

  test("langid: predictions are deterministic, in the language set, and 'the'-bearing docs score en>0") {
    val rows = TextOps.langid.build(sf0001).collect()
    val langs = Set("en", "de", "fr", "es", "zh")
    assert(rows.nonEmpty)
    rows.foreach(r => assert(langs.contains(r.getAs[String]("predicted"))))
    // run twice — identical output (pure function of input)
    val again = TextOps.langid.build(sf0001).collect()
    assert(rows.map(_.toSeq.toList).toList === again.map(_.toSeq.toList).toList)
  }

  test("fingerprint: stable, bounded, and sensitive to word order") {
    import spark.implicits._
    val rows = TextOps.fingerprint.build(sf0001).collect()
    assert(rows.forall { r =>
      val fp = r.getAs[Long]("fingerprint"); fp >= 0 && fp < 1000000007L
    })
    // same text twice → same fingerprint; reversed text → different
    val probe = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "gamma beta alpha"))
      .toDF("doc_id", "text")
    val t = Tables(spark, "/root/testdata/sf0.001")
    // fingerprint logic is embedded in the Q builder over documents; recompute via SQL parity here
    val fps = probe.select(
      aggregate(
        transform(split(trim(lower(col("text"))), "\\s+"), w => crc32(w.cast("binary"))),
        lit(5381L), (acc, h) => (acc * lit(31L) + pmod(h, lit(1000000007L))) % lit(1000000007L)
      ).as("fp")).collect().map(_.getLong(0))
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("globToLike translates bash fnmatch globs") {
    assert(Sbom.globToLike("*.json") === "%.json")
    assert(Sbom.globToLike("file?.json") === "file_.json")
    assert(Sbom.globToLike("a*b?c") === "a%b_c")
    assert(Sbom.globToLike("50%_x") === "50\\%\\_x")
  }

  test("langid argmax picks the language whose markers dominate") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // synthetic docs with unambiguous marker content
    val docs = Seq(
      (1L, "xx", "the cat and the dog is on the mat"),          // en markers
      (2L, "xx", "der hund und die katze ist das haus der"),    // de markers
      (3L, "xx", "le chat et la maison est les le et la"),      // fr markers
      (4L, "xx", "el perro y la casa es los el y la"))          // es markers
      .toDF("doc_id", "lang", "text")
    val scored = TextOps.langidOn(docs)
    val out = scored.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted")).toMap
    assert(out(1L) === "en"); assert(out(2L) === "de")
    assert(out(3L) === "fr"); assert(out(4L) === "es")
  }

  test("multimodal decode pipeline covers all real containers and is deterministic") {
    val rows = graft.multimodal.Multimodal.pipeline.build(sf0001).collect()
    assert(rows.map(_.getAs[String]("kind")).toSet === Set("image_ppm", "image_bmp", "video"))
    val total = rows.map(_.getAs[Long]("n_items")).sum
    assert(total === sf0001.documents.count())
    // videos carry ≥2 frames each, single images exactly one
    val byKind = rows.map(r => r.getAs[String]("kind") ->
      (r.getAs[Long]("n_items"), r.getAs[Long]("total_frames"))).toMap
    assert(byKind("image_ppm")._1 === byKind("image_ppm")._2)
    assert(byKind("image_bmp")._1 === byKind("image_bmp")._2)
    assert(byKind("video")._2 >= byKind("video")._1 * 2)
    // run twice — identical (pure codec round trip)
    val again = graft.multimodal.Multimodal.pipeline.build(sf0001).collect()
    assert(rows.map(_.toSeq.toList).toList === again.map(_.toSeq.toList).toList)
  }

  test("multimodal resize + frame-sample stages produce bounded deterministic output") {
    val rows = graft.multimodal.Multimodal.transformPipeline.build(sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("out_w") === 16L && r.getAs[Long]("out_h") === 12L)
      // 16×12 thumbnails bound every channel sum by frames × 192 px × 255
      val cap = r.getAs[Long]("n_frames_sampled") * 192L * 255L
      assert(r.getAs[Long]("sum_r") <= cap)
      assert(r.getAs[Long]("sum_g") <= cap)
      assert(r.getAs[Long]("sum_b") <= cap)
    }
    val again = graft.multimodal.Multimodal.transformPipeline.build(sf0001).collect()
    assert(rows.map(_.toSeq.toList).toList === again.map(_.toSeq.toList).toList)
  }

  test("quality features bounded") {
    val rows = TextOps.quality.build(sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pr = r.getAs[Double]("punct_ratio")
      val sr = r.getAs[Double]("stop_ratio")
      assert(pr >= 0 && pr <= 1); assert(sr >= 0 && sr <= 1)
      assert(Set("high", "mid", "low").contains(r.getAs[String]("quality")))
    }
  }

  test("vocab stats: hapax <= vocab <= tokens per source") {
    val rows = TextOps.vocab.build(sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tok, voc, hap, ttr) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(hap <= voc && voc <= tok)
      assert(ttr === math.floor(10000.0 * voc / tok).toLong)
    }
  }

  test("strict funnel levels partition all users") {
    val rows = graft.operators.Behavior.q58.build(sf0001).collect()
    val total = rows.map(_.getLong(1)).sum
    val users = sf0001.events.select(col("user_id")).distinct().count()
    assert(total === users, "every user lands in exactly one strict level")
    rows.foreach(r => assert(r.getInt(0) >= 0 && r.getInt(0) <= 3))
  }

  test("purl parse: fields reassemble the original purl") {
    val rows = Sbom.purlParse.build(sf0001).collect()
    assert(rows.nonEmpty)
    val types = Set("npm", "maven", "pypi", "golang")
    rows.foreach { r =>
      assert(types.contains(r.getString(1)))
      assert(r.getString(3).nonEmpty, "name never empty")
      assert(r.getString(4).startsWith("v"), "version parsed")
      val ns = r.getString(2)
      assert(ns.isEmpty || ns.startsWith("ns"))
      val q = r.getString(5)
      assert(q.isEmpty || q == "arch=x86_64&os=linux")
    }
  }

  test("repetition signals: internally consistent per document") {
    val rows = TextOps.repetition.build(sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nWords = r.getLong(1); val nDistinct = r.getLong(2)
      val topN = r.getLong(3); val repBp = r.getLong(5)
      assert(nDistinct >= 1 && nDistinct <= nWords)
      // the modal word count is at least the mean count
      assert(topN * nDistinct >= nWords)
      assert(repBp === math.floor(10000.0 * (nWords - nDistinct) / nWords).toLong)
      assert(repBp >= 0 && repBp <= 10000)
    }
  }

  test("pipe_attrition: monotone funnel that starts at the corpus size") {
    val rows = TextOps.attrition.build(sf0001).collect()
      .sortBy(_.getAs[Long]("ord"))
    assert(rows.map(_.getAs[String]("stage")).toSeq ===
      Seq("total", "min_words", "stopword_ratio", "exact_dedup"))
    val counts = rows.map(_.getAs[Long]("n_docs")).toSeq
    assert(counts.head === sf0001.documents.count())
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"each gate can only shrink the corpus: $counts")
    assert(counts.last > 0, "the pipeline must not drop everything")
  }

  test("pipe_pack_sequences: chunk math is internally consistent per source") {
    val rows = TextOps.packSequences.build(sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val total = r.getAs[Long]("total_tokens")
      val nSeqs = r.getAs[Long]("n_seqs")
      val pad = r.getAs[Long]("tail_padding")
      val boundary = r.getAs[Long]("n_boundary_docs")
      assert(nSeqs === (total + 2047) / 2048)
      assert(pad === nSeqs * 2048 - total)
      assert(boundary <= r.getAs[Long]("n_docs"))
      // every interior chunk boundary is crossed by or lands between
      // docs; crossings can't exceed the boundary count
      assert(boundary <= nSeqs)
    }
  }

  test("shard plan: contiguous shards, disjoint ordered doc ranges, bounded overflow") {
    val rows = graft.text.TextOps.shardPlan.build(sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (s, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("shard_idx"))
      // shard indexes contiguous from 0
      assert(sorted.map(_.getAs[Long]("shard_idx")).toSeq ===
        (0L until sorted.length).toSeq, s"source $s shard idx gap")
      // doc ranges ordered and disjoint across consecutive shards
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"), s"source $s overlap")
        case _ =>
      }
      // a shard never overflows by a whole budget (overflow < budget here
      // since no doc in the corpus is 4096 tokens long)
      sorted.foreach(r => assert(r.getAs[Long]("overflow_tokens") < 4096L))
      // all but possibly the last shard have at least the budget's span
      // covered: n_tokens + start-within-shard ≥ budget ⇒ n_tokens > 0
      sorted.foreach(r => assert(r.getAs[Long]("n_tokens") > 0L))
    }
  }

  test("text_bpe_merges: 3 merges + 12 tokens, non-increasing merge counts") {
    val rows = TextOps.bpeMerges.build(sf0001).collect()
    val merges = rows.filter(_.getAs[String]("stage").startsWith("merge_"))
      .sortBy(_.getAs[String]("stage"))
    val toks = rows.filter(_.getAs[String]("stage") == "token")
    assert(merges.length === 3)
    assert(toks.length === 12)
    merges.foreach { r =>
      assert(r.getAs[String]("item").matches(".+\\+.+"), "merge item is l+r")
      assert(r.getAs[Long]("cnt") > 0L)
    }
    // merging the best pair can only create sub-counted successors and
    // shrink existing pairs, so the per-round max pair count never grows
    val cs = merges.map(_.getAs[Long]("cnt")).toSeq
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b },
      s"argmax pair count must be non-increasing across rounds: $cs")
    // every learned merge symbol is a concatenation of its two halves
    merges.foreach { r =>
      val Array(l, rr) = r.getAs[String]("item").split("\\+", 2)
      assert((l + rr).nonEmpty)
    }
    assert(toks.forall(_.getAs[Long]("cnt") > 0L))
  }

  test("pipe_tokenizer_apply: both tokenizer families compress every source") {
    val rows = TextOps.tokenizerApply.build(sf0001).collect()
    assert(rows.nonEmpty)
    val srcs = sf0001.documents.select(col("source")).distinct().count()
    assert(rows.length.toLong === 2 * srcs, "a bpe AND a unigram row per source")
    assert(rows.map(_.getAs[String]("tokenizer")).toSet === Set("bpe", "unigram"))
    rows.foreach { r =>
      val (ch, nt, bp) = (r.getAs[Long]("n_char_toks"),
        r.getAs[Long]("n_toks"), r.getAs[Long]("saved_bp"))
      assert(nt <= ch, "encoding can only shorten the char-level count")
      // a trained tokenizer applied to a real corpus must save SOMETHING
      assert(nt < ch, s"${r.getString(0)}/${r.getString(1)}: no compression")
      assert(bp === (ch - nt) * 10000 / ch)
      assert(bp >= 0L && bp < 10000L)
    }
    // per source, the two lanes scored the SAME corpus: identical
    // char-level denominators
    rows.groupBy(_.getAs[String]("source")).foreach { case (s, rs) =>
      assert(rs.map(_.getAs[Long]("n_char_toks")).distinct.length === 1, s)
    }
  }

  test("unigram tokenizer: trained vocab is real, segmentation covers every word") {
    val vocab = TextOps.unigramVocab.build(sf0001).collect()
    assert(vocab.length === 32)
    vocab.foreach { r =>
      val (u, sc) = (r.getAs[Long]("usage_cnt"), r.getAs[Long]("score"))
      assert(u > 0L)
      assert(sc === java.lang.Long.toBinaryString(u).length.toLong,
        "score must be the quantized log2 of usage")
    }
    // the hard-EM round must have promoted at least one multi-char
    // piece into heavy usage — an all-singles top-32 means the merge
    // lattice learned nothing
    assert(vocab.exists(_.getAs[String]("piece").length > 1))
    // serving segmentation: every distinct word got k ∈ [ceil(len/4), len]
    val perWord = TextOps.unigramArtifacts(sf0001)
      .filter(col("kind") === "w")
      .select(col("word"), col("k")).collect()
    assert(perWord.nonEmpty)
    perWord.foreach { r =>
      val len = r.getAs[String]("word").codePointCount(0, r.getAs[String]("word").length).toLong
      val k = r.getAs[Long]("k")
      assert(k >= (len + 3) / 4 && k <= len,
        s"'${r.getAs[String]("word")}' k=$k len=$len")
    }
  }

  test("pipe_tokenizer_fertility: unigram rows sit beside bpe with consistent ppm math") {
    val rows = TextOps.tokenizerFertility.build(sf0001).collect()
    assert(rows.map(_.getAs[String]("tokenizer")).toSet === Set("bpe", "unigram"))
    rows.foreach { r =>
      val (w, nt) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_toks"))
      assert(nt >= w, "every word is at least one token")
      assert(r.getAs[Long]("fertility_ppm") === nt * 1000000 / w)
    }
  }

  test("text_countmin: CM estimates never under-count, probes are top-10") {
    val rows = TextOps.countMin.build(sf0001).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val (ex, cm, bp) = (r.getAs[Long]("exact_cnt"), r.getAs[Long]("cm_est"),
        r.getAs[Long]("over_bp"))
      // the Count-Min guarantee: min over rows can only over-estimate
      assert(cm >= ex, s"${r.getString(0)}: CM $cm under exact $ex")
      assert(bp === (cm - ex) * 10000 / ex)
      assert(ex > 0L)
    }
    // probes are the exact top shingles: counts arrive non-increasing
    val cs = rows.map(_.getAs[Long]("exact_cnt")).toSeq
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
  }

  test("char trigrams: ≤10 per lang, all length 3, counts non-increasing") {
    val rows = graft.text.TextOps.charTrigrams.build(sf0001).collect()
      .groupBy(_.getAs[String]("lang"))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, rs) =>
      assert(rs.length <= 10)
      val sorted = rs.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq === (1L to rs.length).toSeq)
      sorted.foreach(r => assert(r.getAs[String]("tri").length === 3, s"$lang bad trigram"))
      val cnts = sorted.map(_.getAs[Long]("cnt"))
      assert(cnts.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
        s"$lang counts must be non-increasing")
    }
  }

  test("gopher battery: clean docs bounded by docs minus worst single rule") {
    graft.text.TextOps.gopherBattery.build(sf0001).collect().foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val fails = Seq("fail_short", "fail_word_len", "fail_symbols",
        "fail_numeric", "fail_modal").map(r.getAs[Long](_))
      fails.foreach(f => assert(f >= 0L && f <= n))
      val clean = r.getAs[Long]("n_clean")
      assert(clean <= n - fails.max, "clean docs cannot exceed survivors of the worst rule")
      assert(clean >= math.max(n - fails.sum, 0L), "clean floor: union bound")
    }
  }

  test("langid eval: accuracy consistent with the confusion cells; docs conserved") {
    val rows = graft.text.TextOps.langidEval.build(sf0001).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total === sf0001.documents.count())
    rows.foreach { r =>
      val acc = r.getAs[Long]("accuracy_bp")
      assert(acc >= 0L && acc <= 10000L)
      assert(r.getAs[Long]("n_correct") <= r.getAs[Long]("n_docs"))
      assert(acc === 10000L * r.getAs[Long]("n_correct") / r.getAs[Long]("n_docs"))
    }
  }
}
