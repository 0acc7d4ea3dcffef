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

    // the fixture's 25-pages-per-file knob produces ~20k tiny files at
    // 100× — the pathological small-file shape. Real crawl segments are
    // ~1 GB; 2500 pages/file (200 files here) isolates the tax: if the
    // delta vs the control is the FILE COUNT (open/list/create per file),
    // the big-file run should approach the in-memory time.
    timed("warc files write+read  200 big files") {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-warcbig").toString
      ops.Warc.writeFixtureFiles(docs, dir, gzip = true, perFile = 2500)
      forceCount(ops.Warc.recordsFromFiles(spark, dir))
    }
    timed("warc files write+read  20k small files") {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-warcsmall").toString
      ops.Warc.writeFixtureFiles(docs, dir, gzip = true)
      forceCount(ops.Warc.recordsFromFiles(spark, dir))
    }
    spark.stop()
  }
}
