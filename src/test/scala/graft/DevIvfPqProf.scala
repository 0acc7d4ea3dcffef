package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage timing for ivfPqAdcTopK at sf0.1 — where do the 4.8
  * clean-bench seconds go? Not part of the driver contract. */
object DevIvfPqProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val emb = SparkEntry.emb(spark, dir)
    emb.count()
    // end-to-end, twice (second run shows cache/JIT-warm cost)
    time("ann_ivfpq cold")(
      ops.Similarity.ivfPqAdcTopK(emb, col("vec_id") % 100 === 0, k = 3).count())
    ops.CacheScope.releaseAll(spark)
    time("ann_ivfpq warm")(
      ops.Similarity.ivfPqAdcTopK(emb, col("vec_id") % 100 === 0, k = 3).count())
    ops.CacheScope.releaseAll(spark)
    // stages
    val corpus = time("withNorm2+cache")(
      ops.CacheScope.track(emb.withColumn("embedding",
        col("embedding").cast("array<double>"))))
    time("ivfPqCodes only")(ops.Similarity.ivfPqCodes(emb).count())
    ops.CacheScope.releaseAll(spark)
    time("plain pqAdcTopK")(
      ops.Similarity.pqAdcTopK(emb, col("vec_id") % 100 === 0, k = 3).count())
    ops.CacheScope.releaseAll(spark)
    time("ann_ivf (assign cost)")(
      ops.Similarity.ivfTopK(emb, col("vec_id") % 100 === 0, k = 3).count())
    ops.CacheScope.releaseAll(spark)
    spark.stop()
  }
}
