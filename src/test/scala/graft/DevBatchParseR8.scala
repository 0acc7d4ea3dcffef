package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.forceCount
import org.apache.spark.storage.StorageLevel

/** Dev-only: BATCH throughput of the stateless parse chain over the same
  * 1M-record envelope the streaming bench replays — the control experiment
  * for `BENCH_stream_r8.json`'s parse-mode number. If the batch number is
  * far above the streaming parse-mode rec/s, the streaming "parse floor" is
  * mostly harness cost (MemoryStream driver-side feeding + micro-batch
  * machinery), not expression cost — which decides whether a codegen'd
  * decode expression is worth building. Not part of the driver contract. */
object DevBatchParseR8 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 10x replay with shifted offsets — the same record volume and content
    // as the streaming bench's mult=10 run, materialized and cached so the
    // timed pass measures the parse chain, not parquet I/O
    val env = sources.DeadLetterSource.envelope(spark, dir)
    val big = (0 until 10).map(i =>
        env.withColumn("offset", col("offset") + lit(i * 1000000L)))
      .reduce(_ unionByName _)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = big.count()
    println(s"[batch-parse] corpus rows=$n")

    def timed(label: String)(f: => Long): Unit = {
      f // warm (fills codegen caches; input already cached)
      val t0 = System.nanoTime()
      val rows = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[batch-parse] $label%-28s $dt%6.2f s  ${rows / dt}%,.0f rec/s (rows=$rows)")
    }

    timed("parse chain (batch)")(forceCount(plans.Analyzer.parsed(big)))
    timed("parse + enrich (batch)") {
      val p = plans.Analyzer.parsed(big)
      forceCount(plans.Analyzer.enriched(
        p.filter(col("parsed").getField("error").isNull)))
    }
    big.unpersist()
    spark.stop()
  }
}
