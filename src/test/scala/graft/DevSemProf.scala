package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage timings of semanticDedup(lloydIters = 2) at bench scale. */
object DevSemProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[semprof] $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val emb = SparkEntry.emb(spark, "/root/testdata/sf0.1")
    time("warm emb")(emb.count())
    // whole query, twice (second run shows steady state)
    time("semanticDedup cold")(
      ops.Similarity.semanticDedup(emb, lloydIters = 2).count())
    ops.CacheScope.releaseAll(spark)
    time("semanticDedup warm")(
      ops.Similarity.semanticDedup(emb, lloydIters = 2).count())
    ops.CacheScope.releaseAll(spark)
    // stages
    val c0 = time("centroids lloyd0")(
      ops.Similarity.ivfCentroids(emb, lloydIters = 0).count())
    ops.CacheScope.releaseAll(spark)
    time("centroids lloyd1")(
      ops.Similarity.ivfCentroids(emb, lloydIters = 1).count())
    ops.CacheScope.releaseAll(spark)
    time("centroids lloyd2")(
      ops.Similarity.ivfCentroids(emb, lloydIters = 2).count())
    ops.CacheScope.releaseAll(spark)
    time("cells lloyd2")(
      ops.Similarity.cellAssignments(emb, lloydIters = 2).count())
    ops.CacheScope.releaseAll(spark)
    time("lloyd0 whole query")(
      ops.Similarity.semanticDedup(emb, lloydIters = 0).count())
    ops.CacheScope.releaseAll(spark)
    println(s"[semprof] codebook rows = $c0")
    spark.stop()
  }
}
