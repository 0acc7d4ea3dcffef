package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.forceCount

/** Dev-only stress validation (r8c) for the late-round-8 operators:
  *
  *  1. the WARC front end at the 100× corpus — the render+concat is
  *     expression compute plus one per-file aggregation, the parse is a
  *     per-file byte walk, so the pair must scale linearly with bytes;
  *  2. `prep_warc` vs `prep_web` at sf0.1 — the WARC-rooted pipeline adds
  *     parse + one metadata join over the identical downstream chain, so
  *     its overhead must stay a small constant factor;
  *  3. the token-odds quality classifier at sf0.1 and 100× — one token
  *     explosion, vocab-bounded weight join, per-doc regroup: near-linear;
  *  4. URL-level dedup at 100× — two digest-keyed exchanges.
  *
  * Timings use `forceCount` (r7 lesson). Not part of the driver contract. */
object DevStressR8c {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = SparkEntry.docs(spark, dir)
    docs.count()
    val big = "/tmp/stress100b"
    require(new java.io.File(s"$big/documents.parquet").isDirectory,
      "run DevStressR8 first to generate /tmp/stress100b")
    val bigDocs = SparkEntry.docs(spark, big)
    bigDocs.count()

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress-r8c] $label%-44s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      ops.CacheScope.releaseAll(spark)
      r
    }

    timed("warc render (files)  sf0.1")(forceCount(ops.Warc.files(docs)))
    timed("warc render (files)  100x")(forceCount(ops.Warc.files(bigDocs)))
    timed("web_warc render+parse  sf0.1")(forceCount(ops.Warc.webWarc(docs)))
    timed("web_warc render+parse  100x")(forceCount(ops.Warc.webWarc(bigDocs)))

    timed("prep_web   sf0.1 (baseline)")(forceCount(ops.Prep.prepWeb(docs)))
    timed("prep_warc  sf0.1")(forceCount(ops.Prep.prepWarc(docs)))

    def classifier(d: org.apache.spark.sql.DataFrame): Long =
      forceCount(ops.TextAnalysis.qualityClassifier(d,
        Seq("src0", "src1", "src2", "src3"),
        Seq("src16", "src17", "src18", "src19")))
    timed("text_quality_classifier  sf0.1")(classifier(docs))
    timed("text_quality_classifier  100x")(classifier(bigDocs))

    timed("web_url_dedup  100x")(forceCount(ops.UrlOps.webUrlDedup(bigDocs)))

    spark.stop()
  }
}
