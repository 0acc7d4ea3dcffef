package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.forceCount

/** Dev-only stress validation (r11): attribute the `prep_warc_files` /
  * `prep_warc` sibling ratio (1.30× in the r10 driver artifact — exactly
  * AT the watch bar, judge r10 next #8).
  *
  * The two recipes differ ONLY in their WARC front end — in-memory render
  * → parse (`Warc.records(Warc.files(docs))`) vs real on-disk files →
  * `binaryFile` listing → per-file gunzip → streamed parse + charset
  * decode (`Warc.responsePagesFromFiles`); everything downstream
  * (urlGateCanonical → crawlChain) is byte-identical. So the ratio is
  * attributed by timing the front ends alone over the same corpus while
  * varying the FILE SIZE (pages per file: the default 25 → ~2k files at
  * sf0.1, then 250 → ~200, then 2500 → ~20), against the in-memory
  * baseline. If the file tax is per-FILE (listing, open, gzip header,
  * task overhead) it amortizes as files grow; if it were per-BYTE
  * (decompression, decode) the ratio would hold flat.
  *
  * Not part of the driver contract; results recorded in COVERAGE.md. */
object DevStressR11 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress-r11] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = ops.CacheScope.barrier(SparkEntry.docs(spark, dir))
    println(s"[stress-r11] docs=${docs.count()}")

    // in-memory baseline: render + parse, no disk hop (warm then timed)
    def inMem = ops.Warc.records(ops.Warc.files(docs))
      .filter(col("warc_type") === "response")
    forceCount(inMem)
    timed("front end: in-memory render+parse")(forceCount(inMem))

    for (perFile <- Seq(25, 250, 2500)) {
      val d = timed(s"write fixture files (perFile=$perFile)")(
        ops.Warc.fixtureFilesDir(docs, perFile = perFile))
      val n = new java.io.File(d).list().count(_.endsWith(".warc.gz"))
      def fromFiles = ops.Warc.responsePagesFromFiles(spark, d)
      forceCount(fromFiles) // warm (listing caches, codegen)
      timed(f"front end: files perFile=$perFile%-5d n_files=$n%5d")(
        forceCount(fromFiles))
    }
    // the judged pair itself, prewarm-shared fixture dir as in the bench
    // (write amortized away), warm run then timed run
    def warc = ops.Prep.prepWarc(docs)
    def warcFiles = ops.Prep.prepWarcFiles(docs)
    forceCount(warc); forceCount(warcFiles)
    val tW = { val t0 = System.nanoTime(); forceCount(warc)
      (System.nanoTime() - t0) / 1e9 }
    val tF = { val t0 = System.nanoTime(); forceCount(warcFiles)
      (System.nanoTime() - t0) / 1e9 }
    println(f"[stress-r11] prep_warc=$tW%.2f s  prep_warc_files=$tF%.2f s  " +
      f"ratio=${tF / tW}%.2f")

    // 10x corpus: the per-FILE tax trend at the 2k-file shape
    val big = ops.CacheScope.barrier(docs
      .crossJoin(spark.range(10).toDF("copy"))
      .select((col("doc_id") + col("copy") * 1000000L).as("doc_id"),
        col("text"), col("lang"), col("source")))
    println(s"[stress-r11] big=${big.count()}")
    def inMemBig = ops.Warc.records(ops.Warc.files(big))
      .filter(col("warc_type") === "response")
    forceCount(inMemBig)
    timed("front end 10x: in-memory render+parse")(forceCount(inMemBig))
    for (perFile <- Seq(25, 250)) {
      val d = timed(s"write 10x fixture files (perFile=$perFile)")(
        ops.Warc.fixtureFilesDir(big, perFile = perFile))
      val n = new java.io.File(d).list().count(_.endsWith(".warc.gz"))
      def fromFiles = ops.Warc.responsePagesFromFiles(spark, d)
      forceCount(fromFiles)
      timed(f"front end 10x: files perFile=$perFile%-5d n_files=$n%5d")(
        forceCount(fromFiles))
    }
    // new-operator scale witnesses at 100x pages (the DevStressR10 robots
    // shape): the politeness schedule is ONE window on registered_domain
    // over the gate output; the sitemap document parse is regex explode
    // over the bounded domain table (here inflated 100x in DOCUMENT count
    // via synthetic per-copy domains to stress the parse itself)
    val big100 = ops.CacheScope.barrier(docs
      .crossJoin(spark.range(100).toDF("copy"))
      .select((col("doc_id") + col("copy") * 1000000L).as("doc_id"),
        col("text"), col("lang"), col("source")))
    val pages100 = ops.CacheScope.barrier(
      ops.UrlOps.urls(ops.UrlOps.pageUrls(big100))
        .select(col("doc_id"), col("url"), col("registered_domain"),
          col("path")))
    println(s"[stress-r11] pages100=${pages100.count()}")
    val gated = ops.CacheScope.barrier(
      ops.Robots.robotsGate(pages100, ops.Robots.robotsTxt(pages100)))
    println(s"[stress-r11] gated=${gated.count()}")
    timed("crawlSchedule 100x (domain window)")(
      forceCount(ops.Robots.crawlSchedule(gated)))
    val listings = ops.CacheScope.barrier(
      ops.Robots.webSitemaps(big100)
        .crossJoin(spark.range(100).toDF("c"))
        .select(concat(col("registered_domain"), lit("-"), col("c"))
          .as("registered_domain"), col("sitemap_url")))
    println(s"[stress-r11] sitemap listings=${listings.count()}")
    timed("sitemapDocs 100x (render+parse+1 hop)")(
      forceCount(ops.Robots.sitemapDocs(listings, ops.Robots.sitemapXmlFixture)))
    ops.CacheScope.releaseAll(spark)
    spark.stop()
  }
}
