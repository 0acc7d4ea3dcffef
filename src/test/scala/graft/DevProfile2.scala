package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the r3 dedup changes (not part of the engine
  * surface). */
object DevProfile2 {
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
    // warm codegen
    ops.Dedup.simhash(docs).count(); ops.CacheScope.releaseAll(spark)

    t("simhash") { ops.Dedup.simhash(docs).count() }
    val fp = ops.Dedup.simhash(docs).persist()
    t("fp-materialize") { fp.count() }
    t("simhashPairs-full") { ops.Dedup.simhashPairs(docs).count() }
    ops.CacheScope.releaseAll(spark)
    t("simhashPairs-full-2") { ops.Dedup.simhashPairs(docs).count() }
    ops.CacheScope.releaseAll(spark)

    val sigs = ops.Dedup.minhashSignatures(docs).persist()
    t("mh-signatures") { sigs.count() }
    val banded = ops.Dedup.lshBands(sigs).persist()
    t("mh-banded") { banded.count() }
    val cands = (0 until 8).map { b =>
      val guard = (0 until b)
        .map(p => col(s"l.band$p") =!= col(s"r.band$p"))
        .foldLeft(col(s"l.band$b") === col(s"r.band$b"))(_ && _)
      banded.as("l").join(broadcast(banded.as("r")),
          guard && col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
    }.reduce(_ unionByName _)
      .repartition(spark.sparkContext.defaultParallelism).persist()
    t("mh-candidates") { cands.count() }
    t("mh-verify") { ops.Dedup.jaccardVerify(cands, docs)
      .filter(col("jaccard") >= 0.8).count() }
    ops.CacheScope.releaseAll(spark)
    t("mh-full") { ops.Dedup.minhashLsh(docs).count() }
    spark.stop()
  }
}
