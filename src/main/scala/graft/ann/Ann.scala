package graft.ann

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Similarity search over the embeddings table (SURVEY.md §2c):
  * brute-force cosine top-k (the exactness baseline) and a random-
  * hyperplane LSH-bucketed variant (the scale path).
  *
  * Scale design: queries are a tiny broadcast side; the corpus is never
  * shuffled. Brute-force is broadcast-join + per-partition top-k
  * (TakeOrderedAndProject after a window prune); LSH prunes candidates to
  * same-bucket rows before scoring.
  */
object Ann {

  /** Double-space dot product of two float vectors (zip_with + aggregate —
    * codegen'd, no UDF).
    */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  // embed_norms — vector statistics per label: exact dims, rounded norms.
  // Oracle-checked: the same double-space fold is expressible in DuckDB
  // list lambdas with identical sequential semantics.
  val norms = Q(
    "embed_norms",
    Some("""
      SELECT label,
             COUNT(*) AS n,
             CAST(MIN(LEN(embedding)) AS BIGINT) AS dim,
             ROUND(MIN(SQRT(LIST_SUM(LIST_TRANSFORM(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 3) AS min_norm,
             ROUND(MAX(SQRT(LIST_SUM(LIST_TRANSFORM(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 3) AS max_norm
      FROM embeddings
      GROUP BY label
      ORDER BY label
    """)
  ) { t =>
    t.embeddings
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n"),
        min(size(col("embedding"))).cast(LongType).as("dim"),
        round(min(norm(col("embedding"))), 3).as("min_norm"),
        round(max(norm(col("embedding"))), 3).as("max_norm"))
      .orderBy(col("label"))
  }

  // ann_bruteforce — exact cosine top-10 for 5 query vectors. The query set
  // is broadcast; ranking is a window over (query, corpus) scored pairs.
  // Oracle: identical double-space zip fold in DuckDB list lambdas
  // (LIST_COSINE_SIMILARITY is float32 — not used), ranked on the same
  // rounded score with the same vec_id tie-break.
  val bruteForce = Q(
    "ann_bruteforce",
    Some("""
      WITH e AS (SELECT vec_id, embedding FROM embeddings),
      q AS (SELECT vec_id AS query_id, embedding AS qvec FROM e WHERE vec_id < 5),
      scored AS (
        SELECT query_id, vec_id,
          ROUND(
            LIST_SUM(LIST_TRANSFORM(LIST_ZIP(qvec, embedding),
              p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
            (SQRT(LIST_SUM(LIST_TRANSFORM(qvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             SQRT(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
            6) AS cos
        FROM e, q),
      ranked AS (
        SELECT query_id, vec_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
        FROM scored)
      SELECT query_id, vec_id, cos, CAST(rnk AS BIGINT) AS rnk
      FROM ranked WHERE rnk <= 10
      ORDER BY query_id, rnk
    """)
  ) { t =>
    import org.apache.spark.sql.expressions.Window
    val queries = t.embeddings.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val scored = t.embeddings
      .join(broadcast(queries))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("qvec"), col("embedding")), 6).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= 10)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Deterministic pseudo-random hyperplane sign for (plane, dim):
    * ±1 from the parity of a seeded xxhash. */
  private def planeSign(plane: Int, d: Column): Column =
    when(xxhash64(lit(plane), d).bitwiseAND(lit(1L)) === 1L, lit(1.0)).otherwise(lit(-1.0))

  // ann_lsh — random-hyperplane LSH: 8 planes → 8-bit bucket; candidates =
  // same-bucket pairs with the query set; exact cosine re-ranking inside
  // the bucket. Recall is traded for pruning; AnnSpec measures it against
  // the brute-force result.
  val lsh = Q("ann_lsh", None) { t =>
    import org.apache.spark.sql.expressions.Window
    val nPlanes = 8
    def bucket(vec: Column): Column =
      (0 until nPlanes).map { p =>
        val proj = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1),
            (x, i) => x.cast(DoubleType) * planeSign(p, i)),
          lit(0.0), (acc, v) => acc + v)
        when(proj > 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b))

    val corpus = t.embeddings.select(col("vec_id"), col("embedding"),
      bucket(col("embedding")).as("bucket"))
    val queries = corpus.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("bucket").as("qbucket"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    corpus.join(broadcast(queries), col("bucket") === col("qbucket"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("qvec"), col("embedding")), 6).as("cos"))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= 10)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Squared L2 distance in double space. */
  private def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  // ann_ivf — IVF (inverted-file) ANN: deterministic coarse quantizer
  // (first-C init + one Lloyd iteration, all DataFrame ops), corpus
  // assigned to nearest centroid, queries probe their nprobe nearest
  // cells, exact cosine re-rank inside the probed cells. The corpus is
  // scanned/scored only within probed cells — the 100 TB shape where
  // brute force is off the table. AnnSpec measures recall vs brute force.
  val ivf = Q("ann_ivf", None) { t =>
    import org.apache.spark.sql.expressions.Window
    val C = 16; val nprobe = 4; val dim = 64
    val emb = t.embeddings.select(col("vec_id"),
      transform(col("embedding"), x => x.cast(DoubleType)).as("v"))

    // init: first C vectors; one Lloyd step to settle
    val init = emb.filter(col("vec_id") < C)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val assigned0 = emb.join(broadcast(init))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("cid"), col("cv")), dist2(col("v"), col("cv"))).getField("cid").as("cid"),
        first(col("v")).as("v"))
    val centroids = assigned0.groupBy(col("cid"))
      .agg(array((0 until dim).map(i => avg(col("v").getItem(i))): _*).as("cv"))

    // corpus cell assignment against settled centroids
    val corpus = emb.join(broadcast(centroids))
      .groupBy(col("vec_id"))
      .agg(min_by(col("cid"), dist2(col("v"), col("cv"))).as("cell"),
        first(col("v")).as("v"))

    // queries probe their nprobe nearest cells
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val wq = Window.partitionBy(col("query_id")).orderBy(col("cdist"), col("cid"))
    val probes = queries.join(broadcast(centroids))
      .select(col("query_id"), col("qv"), col("cid"),
        dist2(col("qv"), col("cv")).as("cdist"))
      .withColumn("prank", row_number().over(wq))
      .filter(col("prank") <= nprobe)
      .select(col("query_id"), col("qv"), col("cid").as("cell"))

    // exact cosine inside probed cells only
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    corpus.join(broadcast(probes), "cell")
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("qv"), col("v")), 6).as("cos"))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= 10)
      .orderBy(col("query_id"), col("rnk"))
  }

  // ann_quantized — int8 scalar quantization: per-vector max-abs scale,
  // elements rounded to [-127, 127]. 4× memory/shuffle reduction for the
  // 100 TB corpus; query-time scoring dequantizes on the fly. AnnSpec
  // measures recall@10 of quantized search vs the float brute force.
  val quantized = Q("ann_quantized", None) { t =>
    import org.apache.spark.sql.expressions.Window
    val scaleC = aggregate(col("embedding"), lit(0.0),
      (acc, x) => greatest(acc, abs(x.cast(DoubleType))))
    val corpus = t.embeddings
      .select(col("vec_id"), col("embedding"), scaleC.as("scale"))
      .select(col("vec_id"), col("scale"),
        transform(col("embedding"),
          x => round(x.cast(DoubleType) / col("scale") * 127).cast("tinyint")).as("qvec"))
    val queries = corpus.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("qvec").as("q_qvec"), col("scale").as("q_scale"))
    // integer dot product, dequantized by the two scales
    def qdot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x.cast("int") * y.cast("int")).cast("long")),
        lit(0L), (acc, v) => acc + v).cast(DoubleType)
    def qnorm(a: Column): Column = sqrt(qdot(a, a))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    corpus.join(broadcast(queries))
      .select(col("query_id"), col("vec_id"),
        round(qdot(col("q_qvec"), col("qvec")) /
          (qnorm(col("q_qvec")) * qnorm(col("qvec"))), 6).as("cos"))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= 10)
      .orderBy(col("query_id"), col("rnk"))
  }

  val all: Seq[Q] = Seq(norms, bruteForce, lsh, ivf, quantized)
}
