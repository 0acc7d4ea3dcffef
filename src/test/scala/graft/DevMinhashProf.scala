package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only MinHash-LSH stage profiler (not part of the engine surface). */
object DevMinhashProf {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = Runtime.getRuntime.availableProcessors.toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $name n=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = ops.Par.spread(spark.read.parquet(s"$dir/documents.parquet"))
    val sigs = ops.Dedup.minhashSignatures(docs).persist()
    t("signatures") { sigs.count() }
    val banded = ops.Dedup.lshBands(sigs).persist()
    t("banded") { banded.count() }
    t("bucket-sizes-band0") {
      banded.groupBy("band0").count().agg(max("count"), sum(col("count") * col("count")))
        .collect().mkString
    }
    t("bucket-sizes-band1") {
      banded.groupBy("band1").count().agg(max("count"), sum(col("count") * col("count")))
        .collect().mkString
    }
    t("full-minhashLsh") { ops.Dedup.minhashLsh(docs).count() }
    t("full-minhashLsh-2") { ops.Dedup.minhashLsh(docs).count() }
    spark.stop()
  }
}
