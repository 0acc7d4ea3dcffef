package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.forceCount

/** Dev-only stress validation (r10):
  *
  *  1. the robots decision fold at 100× (judge r9 watch item: the
  *     per-page `aggregate`/`filter` HOF over the joined rule array is
  *     interpreted, and since r10 the wildcard rules add a per-(page,
  *     wildcard-rule) regex probe) — 5M parsed pages through
  *     [[graft.ops.Robots.robotsGate]], pages pre-materialized so the
  *     measurement isolates the gate from the fixture render;
  *  2. the streamed WARC file read at a larger multi-record shape (the
  *     512 MB-heap OOM counterexample for the old whole-file buffer runs
  *     separately via spark-shell; COVERAGE r10 records it).
  *
  * All timings use `forceCount`. Not part of the driver contract. */
object DevStressR10 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // NO releaseAll between timings: the measured frames share the
    // barrier'd `pages` (localCheckpoint — truncated lineage cannot
    // recompute after an unpersist); blocks release once at the end
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress-r10] $label%-38s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = SparkEntry.docs(spark, dir)
    val big = docs.crossJoin(spark.range(100).toDF("copy"))
      .select((col("doc_id") + col("copy") * 1000000L).as("doc_id"),
        col("text"), col("lang"), col("source"))
    // materialize the parsed pages FIRST: the timing below must measure
    // the gate (join + decision fold), not the URL render/parse lineage
    val pages = ops.CacheScope.barrier(
      ops.UrlOps.urls(ops.UrlOps.pageUrls(big))
        .select(col("doc_id"), col("url"), col("registered_domain"),
          col("path")))
    println(s"[stress-r10] pages=${pages.count()}")
    val robots = ops.Robots.robotsTxt(pages)
    timed("pages passthrough (baseline)")(forceCount(pages))
    timed("robotsGate 100x (fold + wildcards)")(
      forceCount(ops.Robots.robotsGate(pages, robots)))
    // fold-only variant: domains stripped of wildcard rules, so the per-row
    // work is the pure struct-compare fold (no regex) — the delta names the
    // wildcard-regex share of the gate cost
    val robotsNoWild = robots.withColumn("robots_txt",
      regexp_replace(col("robots_txt"),
        "(?im)^(dis)?allow: [^\\r\\n]*[*$][^\\r\\n]*\\r?\\n?", ""))
    timed("robotsGate 100x (no wildcard rules)")(
      forceCount(ops.Robots.robotsGate(pages, robotsNoWild)))
    ops.CacheScope.releaseAll(spark)

    // 3. the durable ANN index at 100×: build+write once over the
    // replicated corpus (the offline cost a deployment pays once), then
    // probe the fixture query batch twice from the on-disk artifacts —
    // the steady-state read+probe is what scales with query traffic
    val bigEmb = SparkEntry.emb(spark, dir)
      .crossJoin(spark.range(100).toDF("copy"))
      .select((col("vec_id") + col("copy") * 1000000L).as("vec_id"),
        col("embedding"), col("label"))
    val idxDir = "/tmp/stress100annidx"
    val t0 = System.nanoTime()
    if (!new java.io.File(s"$idxDir/meta").isDirectory) {
      ops.Similarity.writeAnnIndex(
        ops.Similarity.buildAnnIndex(bigEmb), idxDir)
      println(f"[stress-r10] ann index build+write 100x (400k vecs) " +
        f"${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    ops.CacheScope.releaseAll(spark)
    val loaded = ops.Similarity.readAnnIndex(spark, idxDir)
    val queries = bigEmb.filter(col("vec_id") % 100000 === 0)
    timed("ann index probe 100x (cold read)")(
      forceCount(ops.Similarity.probeAnnIndex(loaded, queries)))
    timed("ann index probe 100x (repeat)")(
      forceCount(ops.Similarity.probeAnnIndex(
        ops.Similarity.readAnnIndex(spark, idxDir), queries)))
    spark.stop()
  }
}
