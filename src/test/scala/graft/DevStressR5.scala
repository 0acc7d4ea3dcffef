package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stress validation (r5): key dedup/ANN operators against the
  * 10x-replicated corpus (/tmp/stress10), timing the post-trackEager /
  * staged-clusters-gate binary at the next scale step. Not part of the
  * driver contract. */
object DevStressR5 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/stress10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[stress] $label%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
      ops.CacheScope.releaseAll(spark)
    }
    val docs = SparkEntry.docs(spark, dir)
    val emb = SparkEntry.emb(spark, dir)
    docs.count(); emb.count() // warm scans
    time("dedup_exact")(ops.Dedup.exact(docs).count())
    time("dedup_pipeline")(ops.Dedup.dedupPipeline(docs).count())
    time("dedup_simhash_pairs")(ops.Dedup.simhashPairs(docs).count())
    time("dedup_clusters") {
      val p = ops.Dedup.simhashPairs(docs).select(col("a"), col("b"))
      ops.Dedup.clusters(docs, p).count()
    }
    time("dedup_incremental") {
      ops.Dedup.incremental(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0)).count()
    }
    time("dedup_embedding_t08")(
      ops.Similarity.nearDupPairs(emb, threshold = 0.8).count())
    time("dedup_semantic_lloyd2")(
      ops.Similarity.semanticDedup(emb, lloydIters = 2).count())
    time("ann_ivf")(
      ops.Similarity.ivfTopK(emb, col("vec_id") % 100 === 0, k = 3).count())
    time("ann_lsh_multitable")(
      ops.Similarity.rpLshMultiTableTopK(emb, col("vec_id") % 100 === 0, k = 3).count())
    time("ann_pq_adc")(
      ops.Similarity.pqAdcTopK(emb, col("vec_id") % 100 === 0, k = 3).count())
    spark.stop()
  }
}
