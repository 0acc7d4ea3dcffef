package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over the `embeddings` table
 * (`embedding: array<float>`, 64-dim).
 *
 * Three tiers, trading recall for scan cost:
 *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline; the
 *    query side is broadcast so the corpus is scanned once with no shuffle;
 *  - [[ivfTopK]]: inverted-file style — the corpus is partitioned by a coarse
 *    cell id and a query probes only its own cell (partition pruning: at 100 TB
 *    this is the difference between scanning everything and scanning 1/cells);
 *  - cosine arithmetic is a sequential double fold, bit-reproducible by the
 *    DuckDB oracle (`list_dot_product` on DOUBLE[] folds identically).
 */
object Similarity {

  /** Sequential-fold dot product — the codegen'd custom Expression
    * ([[graft.functions.DotProduct]]); bit-identical to the interpreted
    * `aggregate(zip_with(...))` formulation it replaces. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExprs.dotProduct(a, b)

  /** cosine(a, b) with a fixed operation order: dot / sqrt(na * nb). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))

  /** cosine from a precomputed squared-norm pair: dot / sqrt(n2a * n2b) —
    * the same doubles as [[cosine]], but self-dots are evaluated once per ROW
    * before the pair join instead of once per PAIR (3x fewer vector ops on an
    * all-pairs or top-k scan). */
  private def cosineWithNorms(a: Column, b: Column, n2a: Column, n2b: Column): Column =
    dot(a, b) / sqrt(n2a * n2b)

  /** Adds the squared norm AND pre-casts the float embedding to
    * array<double> ONCE per row: every pair-scoring join downstream evaluates
    * the dot on the double arrays directly — without this, the float→double
    * cast (an array allocation) re-runs per PAIR, which at n² pairs dwarfs
    * the dot product itself. */
  private def withNorm2(e: DataFrame): DataFrame =
    e.withColumn("embedding", col("embedding").cast("array<double>"))
      .withColumn("n2", dot(col("embedding"), col("embedding")))

  /** Exact top-k neighbors for the query subset, by cosine. The query set is
    * broadcast (small side), the corpus is scanned once; ranking shuffles only
    * (query_id, candidate) pairs. Self-matches excluded. */
  def bruteForceTopK(embeddings: DataFrame, queryPred: Column, k: Int = 5): DataFrame = {
    val corpus = withNorm2(embeddings)
    val queries = withNorm2(embeddings.filter(queryPred))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("n2").as("qn2"))
    val scored = corpus.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosineWithNorms(col("qe"), col("embedding"), col("qn2"), col("n2")).as("cosine"))
    topK(scored, k)
  }

  /** IVF-style ANN: both sides are assigned a coarse cell (here the stored
    * `label`, standing in for a centroid assignment) and a query probes only
    * its own cell. */
  def ivfTopK(embeddings: DataFrame, queryPred: Column, k: Int = 3): DataFrame = {
    val corpus = withNorm2(embeddings)
    val queries = withNorm2(embeddings.filter(queryPred))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("label").as("qcell"), col("n2").as("qn2"))
    val scored = corpus.join(broadcast(queries),
        col("label") === col("qcell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosineWithNorms(col("qe"), col("embedding"), col("qn2"), col("n2")).as("cosine"))
    topK(scored, k)
  }

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Number of random hyperplanes for [[rpLshTopK]] (2^H buckets). */
  val LshBits = 8

  /** Deterministic pseudo-random hyperplanes: component d of hyperplane h is
    * derived from md5("h:d") — first 4 hex digits as an int x in [0, 65536),
    * mapped to (x - 32768) / 32768.0 (a dyadic rational: exactly
    * representable, so the oracle reproduces it bit-for-bit). */
  def hyperplane(h: Int, dims: Int): Seq[Double] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    (0 until dims).map { d =>
      val hex = digest.digest(s"$h:$d".getBytes("UTF-8"))
        .take(2).map(b => f"$b%02x").mkString
      (Integer.parseInt(hex, 16) - 32768) / 32768.0
    }
  }

  /** Sign-bucket of a vector under the LshBits hyperplanes. */
  def lshBucket(embedding: Column, dims: Int): Column =
    (0 until LshBits).map { h =>
      when(dot(embedding, typedlit(hyperplane(h, dims))) >= 0, lit(1 << h))
        .otherwise(lit(0))
    }.reduce(_ + _)

  /** Random-hyperplane LSH ANN: corpus and queries are hashed to sign buckets
    * (2^LshBits of them) and a query ranks only its own bucket by exact
    * cosine — the bucket join replaces the full corpus scan (at 100 TB,
    * bucketing/partitioning the corpus by this key makes a query touch
    * 1/2^bits of the data). Single-probe; recall rises with multi-probe or
    * repeated tables, same shape. */
  def rpLshTopK(embeddings: DataFrame, queryPred: Column, k: Int = 3,
      dims: Int = 64): DataFrame = {
    val corpus = withNorm2(embeddings)
      .withColumn("bucket", lshBucket(col("embedding"), dims))
    val queries = corpus.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("n2").as("qn2"), col("bucket").as("qbucket"))
    val scored = corpus.join(broadcast(queries),
        col("bucket") === col("qbucket") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosineWithNorms(col("qe"), col("embedding"), col("qn2"), col("n2")).as("cosine"))
    topK(scored, k)
  }

  /** Embedding near-duplicate pairs: cosine >= threshold over all pairs a<b.
    * All-pairs is the exact baseline; the scale path buckets by SimHash of the
    * embedding signs first (same banding shape as Dedup.minhashLsh). */
  def nearDupPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val e = withNorm2(embeddings)
    e.as("l").join(e.as("r"), col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"),
        cosineWithNorms(col("l.embedding"), col("r.embedding"),
          col("l.n2"), col("r.n2")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
