package graft

import graft.ann.Ann
import org.apache.spark.sql.functions._

class AnnSpec extends SparkSpec {

  test("brute-force: each query's top hit is itself at cosine ~1") {
    val rows = Ann.bruteForce.build(sf0001)
      .filter(col("rnk") === 1).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("query_id") === r.getAs[Long]("vec_id"))
      assert(math.abs(r.getAs[Double]("cos") - 1.0) < 1e-4)
    }
  }

  test("brute-force returns k=10 ranked results per query, descending") {
    val df = Ann.bruteForce.build(sf0001)
    val byQuery = df.collect().groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size === 5)
    byQuery.values.foreach { rs =>
      assert(rs.length === 10)
      val cosines = rs.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("cos"))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH: every query finds itself; results are a subset of brute-force scoring") {
    val lsh = Ann.lsh.build(sf0001).collect()
    val selfHits = lsh.filter(r => r.getAs[Long]("query_id") == r.getAs[Long]("vec_id"))
    assert(selfHits.length === 5, "each query shares its own bucket")
    selfHits.foreach(r => assert(math.abs(r.getAs[Double]("cos") - 1.0) < 1e-4))
  }

  test("multiprobe LSH: superset of single-probe candidates, recall never lower") {
    val bf = Ann.bruteForce.build(sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val lsh = Ann.lsh.build(sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val mp = Ann.lshMultiprobe.build(sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val selfHits = mp.count { case (q, v) => q == v }
    assert(selfHits === 5, "each query probes its own bucket")
    // the candidate space is a strict superset (base bucket + 8 flips),
    // so top-10 recall vs brute force can never drop below single-probe
    val rLsh = lsh.intersect(bf).size.toDouble / bf.size
    val rMp = mp.intersect(bf).size.toDouble / bf.size
    assert(rMp >= rLsh, s"multiprobe recall $rMp < single-probe $rLsh")
  }

  test("IVF: self-match found; recall@10 vs brute force is useful") {
    val bf = Ann.bruteForce.build(sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val ivf = Ann.ivf.build(sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val selfHits = ivf.count { case (q, v) => q == v }
    assert(selfHits === 5, "every query's own cell is always probed")
    val recall = ivf.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.4, s"IVF recall@10 $recall vs brute force")
  }

  test("int8-quantized search keeps high recall vs float brute force") {
    val bf = Ann.bruteForce.build(sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val q = Ann.quantized.build(sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = q.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.8, s"quantized recall@10 $recall")
    assert(q.count { case (a, b) => a == b } === 5, "self-match survives quantization")
  }

  test("PQ: ADC candidates + exact re-rank keep useful recall vs brute force") {
    val bf = Ann.bruteForce.build(sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val pq = Ann.pq.build(sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = pq.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.4, s"PQ recall@10 $recall vs brute force")
  }

  test("hybrid IVF+PQ results are drawn from probed cells and keep recall") {
    val bf = Ann.bruteForce.build(sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val hy = Ann.hybrid.build(sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = hy.intersect(bf).size.toDouble / bf.size
    assert(recall >= 0.3, s"hybrid recall@10 $recall vs brute force")
    // every hybrid hit must live in a cell the query probed
    val (cells, probes) = Ann.ivfIndex(sf0001, 16, 4)
    val cellOf = cells.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probed = probes.select("query_id", "cell").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    hy.foreach { case (q, v) =>
      assert(probed(q).contains(cellOf(v)), s"hit $v outside query $q's probed cells")
    }
  }

  test("approx_count_distinct within 5% of exact") {
    val approx = graft.operators.AggExt.q37.build(sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = sf0001.events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex <= 0.05, s"$k: approx $ap vs exact $ex")
    }
  }

  test("q88 KMV sketch: estimate within order-statistic bounds, exact under k") {
    val rows = graft.operators.AggExt.q88.build(sf001).collect()
    assert(rows.map(_.getString(0)).contains("_all"), "merged-union row present")
    rows.foreach { r =>
      val (ex, est, bp) = (r.getAs[Long]("exact_distinct"),
        r.getAs[Long]("kmv_estimate"), r.getAs[Long]("err_bp"))
      assert(ex > 64L, "fixture groups must exceed the sketch size")
      // KMV stderr ~ 1/sqrt(k-2) ~ 12.7% at k=64; 4 sigma = ~51%
      assert(bp <= 5100L, s"${r.getString(0)}: est $est vs exact $ex ($bp bp)")
      assert(est > 0L)
    }
    // the sketch must be EXACT when the group cardinality is under k
    val tiny = graft.operators.AggExt.q88.build(sf0001).collect()
      .filter(_.getAs[Long]("exact_distinct") < 64L)
    tiny.foreach { r =>
      assert(r.getAs[Long]("kmv_estimate") === r.getAs[Long]("exact_distinct"),
        s"${r.getString(0)} under-k sketch must be exact")
    }
  }

  test("ann_diversify: picks are distinct top-10 members, rank-1 = best cosine") {
    val mmr = graft.ann.Ann.diversify.build(sf0001).collect()
    val bf = graft.ann.Ann.bruteForce.build(sf0001).collect()
    val top10 = bf.groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val best = bf.filter(_.getAs[Long]("rnk") == 1L)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("vec_id")).toMap
    mmr.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      val picks = rs.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Long]("vec_id"))
      assert(picks.length === 3 && picks.distinct.length === 3)
      assert(picks.toSet.subsetOf(top10(q)), s"query $q picked outside its top-10")
      // the first MMR pick has no diversity penalty — it must be argmax cosine
      assert(picks.head === best(q), s"query $q rank-1 disagrees with brute force")
    }
  }

  test("ann_recall gates all four index families against brute-force truth") {
    val rows = Ann.recallEval.build(sf0001).collect()
    val byMethod = rows.groupBy(_.getString(0))
    assert(byMethod.keySet === Set("lsh", "ivf", "pq", "ivfpq"))
    byMethod.foreach { case (m, rs) =>
      assert(rs.length === 5, s"$m: one row per panel query")
    }
    // the compression families must keep useful recall@10 on the panel —
    // a codebook regression shows up here as a hard number
    def avgHits(m: String): Double = byMethod(m).map(_.getLong(3)).sum / 5.0
    assert(avgHits("ivf") >= 4.0, s"ivf ${avgHits("ivf")}")
    assert(avgHits("pq") >= 4.0, s"pq ${avgHits("pq")}")
    assert(avgHits("ivfpq") >= 4.0, s"ivfpq ${avgHits("ivfpq")}")
  }

  test("embed_kmeans: cells partition the corpus; radius bounds the mean") {
    val rows = Ann.kmeansStats.build(sf0001).collect()
    assert(rows.length === 16)
    val corpus = sf0001.embeddings.count()
    assert(rows.map(_.getAs[Long]("n")).sum === corpus)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val inertia = r.getAs[Long]("inertia_fp")
      val radius = r.getAs[Long]("radius_fp")
      assert(n >= 1 && inertia >= 0)
      // max member distance can't be under the mean member distance
      assert(radius * n >= inertia - n, s"cell ${r.getAs[Long]("cell")}")
    }
  }

  test("ann_filtered: neighbors share the query's label and never include self") {
    import org.apache.spark.sql.functions.col
    val rows = Ann.filteredSearch.build(sf0001).collect()
    val labelOf = sf0001.embeddings.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id")
      val v = r.getAs[Long]("vec_id")
      assert(v !== q, "self excluded")
      assert(labelOf(v) === labelOf(q), "neighbor from the query's label")
      assert(r.getAs[Long]("rnk") >= 1 && r.getAs[Long]("rnk") <= 5)
    }
    // full k rows per query (filter-then-search can't under-fill here)
    assert(rows.groupBy(_.getAs[Long]("query_id")).forall(_._2.length == 5))
  }

  test("embed_outliers: outliers bounded by cluster population, means consistent") {
    val rows = Ann.outliers.build(sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("n_outliers") >= 0 && r.getAs[Long]("n_outliers") < n,
        "a cluster is never 100% outliers under a 2x-mean cut")
      assert(r.getAs[Long]("max_dq") >= r.getAs[Long]("mean_dq"))
    }
  }

  test("dedup_semantic: planted twins dropped, originals kept, same cell") {
    val rows = Ann.semanticDedup.build(sf0001).collect()
    val corpus = sf0001.embeddings.count()
    assert(rows.length === 2 * corpus)
    val byId = rows.map(r => r.getAs[Long]("vec_id") ->
      (r.getAs[Long]("cell"), r.getAs[Long]("keep"))).toMap
    (0L until corpus).foreach { id =>
      val (cell, keep) = byId(id)
      val (tcell, tkeep) = byId(id + 1000000L)
      assert(keep === 1L, s"original $id must survive")
      assert(tkeep === 0L, s"twin of $id must be dropped")
      assert(cell === tcell, s"twin of $id must share its cluster")
    }
  }

  test("pca power iteration lands on a dominant direction of the real covariance") {
    val v = Ann.pcaPower.build(sf0001).collect()
      .sortBy(_.getAs[Long]("dim")).map(_.getAs[Long]("loading_milli").toDouble)
    assert(v.length === 64)
    // L-infinity normalized: the peak loading is exactly ±1000
    assert(v.map(math.abs).max === 1000.0, v.map(math.abs).max)
    // compute the true covariance in doubles and check the iterate's
    // Rayleigh quotient dominates every coordinate direction — i.e. the
    // three integer rounds actually climbed toward the top eigenvector
    val embs = sf0001.embeddings.collect()
      .map(_.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray)
    val n = embs.length
    val d = 64
    val mean = Array.tabulate(d)(j => embs.map(_(j)).sum / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      embs.map(e => (e(i) - mean(i)) * (e(j) - mean(j))).sum / n)
    def rayleigh(x: Array[Double]): Double = {
      val cx = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * x(j)).sum)
      (0 until d).map(i => x(i) * cx(i)).sum / (0 until d).map(i => x(i) * x(i)).sum
    }
    val rq = rayleigh(v)
    (0 until d).foreach { k =>
      val e = Array.fill(d)(0.0); e(k) = 1.0
      assert(rq >= rayleigh(e) * 0.999,
        s"iterate's Rayleigh $rq below axis $k's ${rayleigh(e)}")
    }
  }

  test("knn graph: ranks contiguous from 1, dot non-increasing, no self edges") {
    val rows = Ann.knnGraph.build(sf0001).collect()
    assert(rows.nonEmpty)
    val byVec = rows.groupBy(_.getAs[Long]("vec_id"))
    byVec.foreach { case (v, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq ===
        (1L to sorted.length).toSeq, s"vec $v ranks not contiguous")
      assert(sorted.length <= 3)
      sorted.foreach(r => assert(r.getAs[Long]("neighbor_id") != v))
      val dots = sorted.map(_.getAs[Long]("dot_q")).toSeq
      assert(dots === dots.sorted.reverse, s"vec $v dot_q not non-increasing")
    }
  }

  test("embed_rp_project: ±1 projection preserves norms within JL distortion") {
    val rows = graft.ann.Ann.rpProject.build(sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mean = r.getAs[Long]("mean_ratio_bp")
      // E[ratio] = 10000 bp; per-label means over ~50 vectors at k=8
      // concentrate well inside a factor of ~2
      assert(mean > 4000L && mean < 25000L,
        s"label ${r.getAs[Long]("label")} mean_ratio_bp $mean")
      assert(r.getAs[Long]("min_ratio_bp") >= 0L)
      assert(r.getAs[Long]("min_ratio_bp") <= mean &&
        mean <= r.getAs[Long]("max_ratio_bp"))
    }
  }

  test("graph search: monotone improvement along the trace, 4 steps per query") {
    val rows = graft.ann.Ann.graphSearch.build(sf0001).collect()
      .groupBy(_.getAs[Long]("query_id"))
    assert(rows.nonEmpty)
    rows.foreach { case (q, trace) =>
      assert(trace.length === 4, s"query $q: expected steps 0..3")
      val byStep = trace.sortBy(_.getAs[Long]("step"))
      val dots = byStep.map(_.getAs[Long]("dot_q"))
      assert(dots.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
        s"query $q: greedy walk must never lose dot product: ${dots.toSeq}")
    }
  }

  test("matryoshka: recall is monotone in width and bounded") {
    val rows = graft.ann.Ann.matryoshka.build(sf0001).collect()
      .sortBy(_.getAs[Long]("width"))
    assert(rows.map(_.getAs[Long]("width")).toSeq === Seq(8L, 16L, 32L))
    val rc = rows.map(_.getAs[Long]("recall_bp"))
    assert(rc.forall(r => r >= 0L && r <= 10000L))
    // wider prefixes cannot lose recall on this deterministic panel
    assert(rc.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
      s"recall must not decrease with width: ${rc.toSeq}")
  }

  test("binary quant: 50 retrieved, recall bounded, hamming totals sane") {
    val r = graft.ann.Ann.binaryQuant.build(sf0001).collect().head
    assert(r.getAs[Long]("n_retrieved") === 50L)
    val rc = r.getAs[Long]("recall_bp")
    assert(rc >= 0L && rc <= 10000L)
    // 50 pairs × ≤64 differing bits
    assert(r.getAs[Long]("total_hamming") <= 50L * 64L)
  }

  test("binary rerank: at least as good as raw binary top-10; scan share correct") {
    val rr = graft.ann.Ann.binaryRerank.build(sf0001).collect().head
    val bq = graft.ann.Ann.binaryQuant.build(sf0001).collect().head
    assert(rr.getAs[Long]("n_retrieved") === 50L)
    // reranking a 50-candidate shortlist can only improve on the raw
    // hamming top-10's recall
    assert(rr.getAs[Long]("recall_bp") >= bq.getAs[Long]("recall_bp"),
      s"rerank ${rr.getAs[Long]("recall_bp")} < raw ${bq.getAs[Long]("recall_bp")}")
    val n = sf0001.embeddings.count()
    assert(rr.getAs[Long]("exact_scan_bp") === 50L * 10000L / n)
  }

  test("pq distortion: cells cover the corpus, denominators are cnt², and the mean minimizes") {
    val rows = graft.ann.Ann.pqDistortion.build(sf0001).collect()
    assert(rows.nonEmpty)
    val nVecs = sf0001.embeddings.count()
    // every subspace's cells partition the corpus
    rows.groupBy(_.getAs[Long]("m")).foreach { case (m, rs) =>
      assert(rs.map(_.getAs[Long]("n_vecs")).sum === nVecs, s"subspace $m")
    }
    rows.foreach { r =>
      val c = r.getAs[Long]("n_vecs")
      assert(r.getAs[Long]("err_den") === c * c)
      assert(r.getAs[Long]("err_num") >= 0L)
      // a single-member cell reconstructs itself exactly
      if (c == 1L) assert(r.getAs[Long]("err_num") === 0L)
    }
  }
}
