package graft

import org.apache.spark.sql.SparkSession

/** Dev-only drift sweep (r12, judge r11 #5): where does the frozen-
  * quantizer append's recall caveat BITE — i.e. at what distribution
  * drift should a deployment re-train instead of appending?
  *
  * For each drift delta, [[Recall.appendDriftMetricsAt]] appends a batch
  * drawn from perturbed-center clusters onto the base clustered-fixture
  * index (quantizers FROZEN from the base build) and probes the drifted
  * region, against the same brute-force baseline as a FULL REBUILD whose
  * quantizers retrained on the combined corpus. The gap between the two
  * recalls is the price of not re-training at that drift.
  *
  * Not part of the driver contract; results recorded in COVERAGE.md and
  * the operative delta (0.6) ships in recall.json as
  * `fixture_ann_append_drift{,_rebuild}`. */
object DevStressR12 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the retrain column rides along since r13 (the harness pays for it
    // either way — appendDriftMetricsAt measures the remedy too)
    println("[stress-r12] delta  center_cos  append_recall  rebuild_recall" +
      "  retrain_recall")
    for (delta <- Seq(0.1, 0.2, 0.3, 0.45, 0.6, 0.8, 1.0)) {
      val (a, r, rt) =
        try Recall.appendDriftMetricsAt(spark, delta)
        finally ops.CacheScope.releaseAll(spark)
      val cc = a.extra.toMap.getOrElse("center_cos_x1000", -1L) / 1000.0
      println(f"[stress-r12] $delta%5.2f  $cc%10.3f  ${a.recall}%13.3f" +
        f"  ${r.recall}%14.3f  ${rt.recall}%14.3f")
    }

    // takedown at 100×: tombstone 1% of a 400k-vector durable index, then
    // compact — the claim under test is that a takedown costs one probe-
    // side anti-join immediately and one codes rewrite offline, vs the
    // full rebuild (160.8 s at this scale, r10 stress) a deployment would
    // otherwise pay re-deriving quantizers it gets to keep
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftbridge.forceCount
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress-r12] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val bigEmb = SparkEntry.emb(spark, dir)
      .crossJoin(spark.range(100).toDF("copy"))
      .select((col("vec_id") + col("copy") * 1000000L).as("vec_id"),
        col("embedding"), col("label"))
    val idxDir = ops.TempDirs.scratch("stress-r12-annidx")
    timed("ann index build+write 100x (400k vecs)")(
      ops.Similarity.writeAnnIndex(ops.Similarity.buildAnnIndex(bigEmb), idxDir))
    ops.CacheScope.releaseAll(spark)
    val queries = bigEmb.filter(col("vec_id") % 100000 === 0)
    timed("probe 100x (pre-delete baseline)")(
      forceCount(ops.Similarity.probeAnnIndex(
        ops.Similarity.readAnnIndex(spark, idxDir), queries)))
    ops.CacheScope.releaseAll(spark)
    timed("deleteFromAnnIndex 100x (1% = 4k ids)")(
      ops.Similarity.deleteFromAnnIndex(idxDir,
        bigEmb.filter(col("vec_id") % 100 === 7).select(col("vec_id"))))
    timed("probe 100x (tombstoned, pre-compaction)")(
      forceCount(ops.Similarity.probeAnnIndex(
        ops.Similarity.readAnnIndex(spark, idxDir), queries)))
    ops.CacheScope.releaseAll(spark)
    timed("compactAnnIndex 100x (codes rewrite)")(
      ops.Similarity.compactAnnIndex(spark, idxDir))
    timed("probe 100x (post-compaction)")(
      forceCount(ops.Similarity.probeAnnIndex(
        ops.Similarity.readAnnIndex(spark, idxDir), queries)))
    ops.CacheScope.releaseAll(spark)

    // the three-source frontier at 100×: 500k corpus pages, their 3.5M
    // resolved outlinks, and the sitemap tree, through the url_norm
    // collapse + robots gate, then freshness-ranked into politeness lanes
    // — the full daily crawl-planning pass. One slim-row shuffle for the
    // collapse, one window for the lanes; everything else is broadcast.
    val docs100 = SparkEntry.docs(spark, dir)
      .crossJoin(spark.range(100).toDF("copy"))
      .select((col("doc_id") + col("copy") * 1000000L).as("doc_id"),
        col("text"), col("lang"), col("source"))
    val pages100 = ops.UrlOps.pageUrls(docs100)
      .select(col("doc_id"), col("url"))
    val links100 = ops.TextExtract.webOutlinks(docs100).select(col("link"))
    val sm100 = ops.Robots.webSitemapDocs(docs100)
    val robots100 = ops.Robots.fixtureRobots(docs100)
    val frontier = ops.Robots.crawlFrontier(pages100, sm100, robots100,
      linkPages = Some(links100))
    timed("crawlFrontier 100x (500k pages + 3.5M links)")(
      forceCount(frontier))
    val lastCrawl = ops.UrlOps.urls(pages100)
      .select(col("url_norm"), lit("2026-03-15").as("last_crawled"))
    timed("recrawlSchedule 100x over the frontier")(
      forceCount(ops.Robots.recrawlSchedule(
        ops.Robots.recrawlPriority(frontier, lastCrawl))))
    spark.stop()
  }
}
