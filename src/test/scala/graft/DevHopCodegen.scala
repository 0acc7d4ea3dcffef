package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r16 scratch: A/B codegen shapes for the frontier-expansion hop. */
object DevHopCodegen {
  def nondet(c: Column): Column = graft.functions.CodegenSplit.nondet(c)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = SparkEntry.docs(spark, sfDir)
    val f0 = ops.CacheScope.barrier(
      ops.Robots.webFrontier(docs).withColumn("hop", lit(0)))
    def fetched = ops.Robots.chainPageFixture(None)(
      f0.filter(col("robots_allowed")).select(col("url_norm").as("url")))
    def links = ops.TextExtract.outlinks(fetched.select(
      lit(null).cast("long").as("doc_id"), col("url"), col("html")))

    // A: current one-step shape
    def candA = links
      .filter(ops.UrlOps.filterReason(col("link")) === "ok")
      .groupBy(ops.UrlOps.parseNormalize(col("link")).getField("url_norm")
        .as("url_norm"))
      .agg(min(col("link")).as("url"))

    // B: staged projection, nondet __r blocks pushdown/duplication
    def candB = {
      val staged = links.select(col("link"),
        nondet(ops.UrlOps.filterReason(col("link"))).as("__r"),
        ops.UrlOps.parseNormalize(col("link")).getField("url_norm")
          .as("url_norm"))
      staged.filter(col("__r") === "ok")
        .groupBy(col("url_norm")).agg(min(col("link")).as("url"))
    }

    // C: B + nondet-resolved link (outlinks duplication also blocked)
    def candC = {
      val lk = fetched.select(col("url"),
          explode(regexp_extract_all(col("html"),
            lit("(?is)<a\\b[^>]*?[\\s\"']href\\s*=\\s*([\"'])([\\s\\S]*?)\\1"),
            lit(2))).as("link_raw"))
        .select(nondet(ops.UrlOps.resolveUrl(col("url"), col("link_raw")))
          .as("link"))
        .filter(col("link").isNotNull)
      val staged = lk.select(col("link"),
        nondet(ops.UrlOps.filterReason(col("link"))).as("__r"),
        ops.UrlOps.parseNormalize(col("link")).getField("url_norm")
          .as("url_norm"))
      staged.filter(col("__r") === "ok")
        .groupBy(col("url_norm")).agg(min(col("link")).as("url"))
    }

    val variants = Seq("A" -> (() => candA), "B" -> (() => candB),
      "C" -> (() => candC))
    for ((name, fn) <- variants) {
      // warm-up + min of 3
      try org.apache.spark.sql.graftbridge.forceCount(fn())
      catch { case e: Throwable => println(s"[hopcg] $name FAILED: $e") }
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = org.apache.spark.sql.graftbridge.forceCount(fn())
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[hopcg] variant $name: rows=${secs.head._2} min=${secs.map(_._1).min}%.3f s " +
        secs.map(s => f"${s._1}%.2f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}
