package graft

import org.apache.spark.sql.SparkSession

/** Dev-only r15 witnesses (judge r14 next-round items #1–#5) — each new
  * operator at ~100× its fixture scale:
  *
  *  1. resolveChain open/closed split re-measurement: the EXACT r14
  *     witness shape (1M pages, 3-deep canonical chains + loops,
  *     maxHops 5) re-run after settled rows stopped riding the per-hop
  *     join — r14 measured 20.2 s with the ride-along form.
  *
  *  2. Known-suppressed frontier expansion over a 1M-row frontier
  *     across 50k origins with a 1M-row durable discovered table — the
  *     known set adds one distinct + one anti-join branch per hop; the
  *     suppression must not change the per-hop shape.
  *
  *  3. Hierarchical trap localization over a 5M-row frontier whose
  *     explosion lives at depth 3 (/forum/thread/<tid> mills) — three
  *     passes max, levels 2+ semi-join-restricted to flagged subtrees.
  *
  *  4. Recrawl ranking + schedule over a 2M-row frontier against a 1M
  *     fetch history — the priority join keys on url_norm, the domain
  *     signal broadcasts, one window pass per lane.
  *
  *  5. The audited PII scrub (4 categories, K=2 excerpts) over 1M
  *     documents — map-only, pure regex throughput; the samples must
  *     not change the shape.
  *
  * Not part of the driver contract; numbers recorded in COVERAGE.md. */
object DevStressR15 {
  def main(args: Array[String]): Unit = {
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
      println(f"[stress-r15] $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // 1. the r14 chain witness, verbatim shapes: ids 4k+1..4k+3 chain
    // down to the terminal 4k; every 10_000th id pair forms a 2-loop
    val n = 1000000L
    def urlOf(c: org.apache.spark.sql.Column) = concat(
      lit("https://h"), (c % 50000).cast("string"), lit(".example/p/"),
      c.cast("string"))
    val pages = spark.range(n).toDF("doc_id").select(col("doc_id"),
      urlOf(col("doc_id")).as("url"),
      when(col("doc_id") % 10000 === 0,
          concat(lit("https://loopback.example/x/"),
            col("doc_id").cast("string")))
        .when(col("doc_id") % 4 =!= 0, urlOf(col("doc_id") - 1))
        .otherwise(lit(null).cast("string")).as("canonical"))
    val loopTwins = spark.range(n / 10000).toDF("k").select(
      (col("k") * 10000 + 20000000L).as("doc_id"),
      concat(lit("https://loopback.example/x/"),
        (col("k") * 10000).cast("string")).as("url"),
      urlOf(col("k") * 10000).as("canonical"))
    val chained = timed("canonical chain keys, 1M pages (open/closed)") {
      val d = ops.UrlOps.urlDedupCanonicalChain(
        pages.unionByName(loopTwins), maxHops = 5)
      forceCount(d); d
    }
    val k3 = chained.filter(col("doc_id") === 3L).head()
      .getAs[String]("dedup_key")
    println(s"[stress-r15]   chain head 3 -> $k3")
    ops.CacheScope.releaseAll(spark)

    // 2. known-suppressed expansion: 1M frontier rows over 50k origins;
    // the durable table holds every origin's /tags plus 950k unrelated
    // rows; the fetch fixture links /tags (suppressed) + /chain/0 (new)
    val fm = 1000000L
    def frontierDf(rows: Long) = spark.range(rows).toDF("i").select(
      col("i"),
      concat(lit("https://o"), (col("i") % 50000).cast("string"),
        lit(".example/p/"), col("i").cast("string")).as("url_norm"))
      .withColumn("url", col("url_norm"))
      .withColumn("registered_domain",
        concat(lit("o"), (col("i") % 50000).cast("string"), lit(".example")))
      .withColumn("path", concat(lit("/p/"), col("i").cast("string")))
      .withColumn("doc_id", col("i"))
      .withColumn("provenance", lit("corpus"))
      .withColumn("lastmod", lit(null).cast("string"))
      .withColumn("robots_allowed", lit(true))
      .withColumn("robots_rule", lit(null).cast("string"))
      .withColumn("crawl_delay", lit(null).cast("int"))
      .drop("i")
    val robots = spark.range(50000).toDF("k").select(
      concat(lit("o"), col("k").cast("string"), lit(".example"))
        .as("registered_domain"),
      lit("User-agent: *\nAllow: /").as("robots_txt"))
    val knownTags = spark.range(50000).toDF("k").select(
      concat(lit("https://o"), col("k").cast("string"),
        lit(".example/tags")).as("url_norm"))
    val knownNoise = spark.range(950000).toDF("k").select(
      concat(lit("https://elsewhere.example/seen/"), col("k").cast("string"))
        .as("url_norm"))
    val fetch = (urls: org.apache.spark.sql.DataFrame) => urls.select(
      col("url"),
      lit("""<a href="/tags">t</a><a href="/chain/0">c</a>""").as("html"))
    val expanded = timed("expandFrontier 1M rows + 1M known (2 hops)") {
      val d = ops.Robots.expandFrontier(frontierDf(fm), fetch, robots,
        maxHops = 2, known = Some(knownTags.unionByName(knownNoise)))
      forceCount(d); d
    }
    val hop1 = expanded.filter(col("hop") === 1).count()
    println(s"[stress-r15]   hop-1 rows (chain only, tags suppressed): $hop1")
    ops.CacheScope.releaseAll(spark)

    // 3. hierarchical traps at 5M: per domain, /forum/thread/<tid>/p<i>
    // mills (the depth-3 explosion), healthy /forum/faq + flat /news
    val tm = 5000000L
    val trapFrontier = spark.range(tm).toDF("i").select(
      concat(lit("d"), (col("i") % 40).cast("string"), lit(".example"))
        .as("registered_domain"),
      when(col("i") % 10 < 7,
          concat(lit("/forum/thread/t"), ((col("i") / 40) % 2000).cast("string"),
            lit("/p"), col("i").cast("string")))
        .when(col("i") % 10 < 8, concat(lit("/forum/faq/f"),
          col("i").cast("string")))
        .otherwise(concat(lit("/news/n"), col("i").cast("string")))
        .as("path"))
    val hier = timed("crawlTrapsHier 5M frontier (maxDepth 3)") {
      val d = ops.Robots.crawlTrapsHier(trapFrontier,
        maxPerPrefix = 10000, maxDepth = 3, topK = 5)
      forceCount(d); d
    }
    val loc = hier.filter(col("trap_localized"))
      .groupBy(col("depth")).count().collect()
      .map(r => r.getAs[Int]("depth") -> r.getAs[Long]("count")).toMap
    println(s"[stress-r15]   localized per depth: $loc")
    ops.CacheScope.releaseAll(spark)

    // 4. recrawl ranking over a 2M frontier vs a 1M fetch history
    val rf = frontierDf(2000000L)
      .withColumn("lastmod",
        when(col("doc_id") % 3 === 0, lit("2026-04-01")))
    val lastCrawl = spark.range(1000000L).toDF("i").select(
      concat(lit("https://o"), (col("i") % 50000).cast("string"),
        lit(".example/p/"), col("i").cast("string")).as("url_norm"),
      lit("2026-03-15").as("last_crawled"))
    val changed = spark.range(5000).toDF("k").select(
      concat(lit("o"), col("k").cast("string"), lit(".example"))
        .as("registered_domain"))
    timed("recrawl priority+schedule, 2M frontier") {
      forceCount(ops.Robots.recrawlSchedule(ops.Robots.recrawlPriority(
        rf, lastCrawl, Some(changed))))
    }
    ops.CacheScope.releaseAll(spark)

    // 5. audited PII scrub over 1M docs: every row carries one entity
    // plus a multi-email stack on the % 13 == 2 residue
    val docs = spark.range(1000000L).toDF("doc_id").select(col("doc_id"),
      concat(lit("lorem ipsum dolor sit amet "),
        when(col("doc_id") % 3 === 0,
            concat(lit("mail u"), col("doc_id").cast("string"),
              lit("@ex.com ")))
          .when(col("doc_id") % 3 === 1, lit("call 555-123-4567 "))
          .otherwise(lit("host 10.1.2.3 ")),
        when(col("doc_id") % 13 === 2,
            lit("alt a@b.co and c@d.co and e@f.co")).otherwise(lit("")),
        when(col("doc_id") % 11 === 4, lit(" ssn 774-12-9876"))
          .otherwise(lit(""))).as("text"))
    timed("piiScrub 1M docs, 4 categories, K=2 samples") {
      forceCount(ops.TextAnalysis.piiScrub(docs,
        extra = Seq(("ssns", ops.TextAnalysis.PiiSsnRe,
          ops.TextAnalysis.PiiSsnToken)), auditK = 2))
    }

    spark.stop()
  }
}
