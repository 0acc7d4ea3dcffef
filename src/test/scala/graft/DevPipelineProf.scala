package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiling main: stage-level timings of Dedup.dedupPipeline at the
  * bench scale (not part of the driver contract). */
object DevPipelineProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val docs = SparkEntry.docs(spark, sfDir)
    time("warm docs")(docs.count())
    val reps = time("reps (exact collapse)") {
      val withRep = docs
        .select(col("doc_id"), md5(col("text")).as("__h"))
        .withColumn("rep_id",
          min(col("doc_id")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("__h"))))
        .drop("__h")
      val r = docs.join(
        withRep.filter(col("doc_id") === col("rep_id")).select(col("doc_id")),
        "doc_id").persist()
      System.err.println(s"[prof]   reps=${r.count()}")
      r
    }
    val pairs = time("minhashLsh pairs") {
      val p = ops.Dedup.minhashLsh(reps).select(col("a"), col("b")).persist()
      System.err.println(s"[prof]   pairs=${p.count()}")
      p
    }
    time("clusters (gated finish)") {
      ops.Dedup.clusters(reps, pairs, localEdgeGate = 5000000L).count()
    }
    time("full dedupPipeline") {
      ops.Dedup.dedupPipeline(docs).count()
    }
    ops.CacheScope.releaseAll(spark)
    spark.stop()
  }
}
