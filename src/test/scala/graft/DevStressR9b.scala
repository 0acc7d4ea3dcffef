package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.forceCount

/** Dev-only stress validation (r9, second batch): the REAL-FILE WARC front
  * end at 100× — 500k docs render to ~20k on-disk `.warc.gz` files
  * (executor-side write), then the byte-level `binaryFile` parse and the
  * full file-rooted crawl pipeline run over them. What this pins:
  *
  *  - the write path scales (one task per output partition, no driver
  *    collect);
  *  - the read path's small-file behavior (`binaryFile` coalesces ~20k
  *    small files into size-bounded partitions — the shape of a real
  *    crawl segment listing);
  *  - `prepWarcFiles` tracks `prep_warc`'s fixture-rooted time at scale
  *    (the disk hop must not change the pipeline's complexity class).
  *
  * All timings use `forceCount`. Not part of the driver contract. */
object DevStressR9b {
  def main(args: Array[String]): Unit = {
    val div = args.headOption.getOrElse("/tmp/stress100div")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$div/documents.parquet")
    println(s"[stress-r9b] corpus rows ${docs.count()}")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress-r9b] $label%-44s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      ops.CacheScope.releaseAll(spark)
      r
    }

    timed("web_warc_files   100x-diverse")(
      forceCount(ops.Warc.webWarcFiles(docs)))
    timed("prep_warc_files  100x-diverse")(
      forceCount(ops.Prep.prepWarcFiles(docs)))
    timed("prep_warc        100x-diverse (control)")(
      forceCount(ops.Prep.prepWarc(docs)))
    spark.stop()
  }
}
