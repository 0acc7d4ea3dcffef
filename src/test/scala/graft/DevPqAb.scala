package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only A/B: PQ subspace count (4 vs 8) on the clustered fixture —
  * rerank-shortlist capture of the exact top-3 vs the bench cost of the
  * wider codebook. Not part of the driver contract. */
object DevPqAb {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val f = Recall.clusteredFixture(spark).cache()
    f.count()
    val queryPred = col("vec_id") % 25 === 3
    val bf = ops.Similarity.bruteForceTopK(f, queryPred, k = 3)
      .select(col("query_id"), col("neighbor_id")).cache()
    val total = bf.count()
    for (m <- Seq(4, 8); shortlist <- Seq(3, 30)) {
      val t0 = System.nanoTime()
      val approx = ops.Similarity.pqAdcTopK(f, queryPred, k = shortlist,
        subspaces = m)
      val hits = bf.join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi").count()
      println(f"[pqab] m=$m shortlist=$shortlist capture=${hits.toDouble / total}%.3f " +
        f"(${(System.nanoTime() - t0) / 1e9}%5.2f s)")
      ops.CacheScope.releaseAll(spark)
    }
    // bench-scale cost on the real embeddings table at sf0.1
    val emb = SparkEntry.emb(spark, "/root/testdata/sf0.1")
    emb.count()
    for (m <- Seq(4, 8)) {
      val t0 = System.nanoTime()
      ops.Similarity.pqAdcTopK(emb, col("vec_id") % 100 === 0, k = 3,
        subspaces = m).count()
      ops.CacheScope.releaseAll(spark)
      val t1 = System.nanoTime()
      ops.Similarity.pqCodes(emb, subspaces = m).count()
      ops.CacheScope.releaseAll(spark)
      println(f"[pqab] m=$m sf0.1 adc=${(t1 - t0) / 1e9}%5.2f s codes=${(System.nanoTime() - t1) / 1e9}%5.2f s")
    }
    spark.stop()
  }
}
