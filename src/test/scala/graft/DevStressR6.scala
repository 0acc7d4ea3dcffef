package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stress validation (r6): the judge-named operators against the
  * 100x corpus (/tmp/stress100 — 500k docs with 100-way duplication, 40k
  * vectors, 1M events), checking ≤ ~linear growth vs the 10x measurements
  * in COVERAGE.md. Not part of the driver contract. */
object DevStressR6 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/stress100")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[stress] $label%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
      ops.CacheScope.releaseAll(spark)
    }
    val docs = SparkEntry.docs(spark, dir)
    val emb = SparkEntry.emb(spark, dir)
    docs.count(); emb.count() // warm scans
    // `r6b` as a second arg: the end-of-round curation operators
    if (args.contains("r6b")) {
      time("emb_diversity")(
        ops.Similarity.diversityPrune(emb).count())
      // t=0.8 is the pruning regime on this near-orthogonal corpus (the
      // t=0.45 wall is documented at dedup_semantic_full); the composed
      // pipeline inherits the same tier economics
      time("prep_d4_t08")(
        ops.Similarity.prepD4(emb, threshold = 0.8).count())
      time("corpus_dsir")(
        ops.TextAnalysis.dsirWeights(docs, col("source") === "src0").count())
      time("text_quality_topfrac")(
        ops.TextAnalysis.qualityTopFrac(docs).count())
      time("text_mix_temperature")(
        ops.TextAnalysis.mixTemperature(docs).count())
      time("text_ngrams")(ops.TextAnalysis.topNgrams(docs).count())
      time("ann_pq_rerank")(
        ops.Similarity.ivfPqRerankTopK(emb, col("vec_id") % 1000 === 0)
          .count())
      time("text_bpe_merges")(ops.TextAnalysis.bpeMerges(docs).count())
      time("text_bpe_encode")(
        ops.TextAnalysis.bpeEncode(docs, ops.TextAnalysis.bpeMerges(docs))
          .count())
      spark.stop()
      return
    }
    // `new` as a second arg: only the late-round curation operators
    if (args.contains("new")) {
      time("ann_range_t03")(
        ops.Similarity.rangeSearch(emb, col("vec_id") % 1000 === 0,
          threshold = 0.3).count())
      time("emb_kmeans_lloyd2")(
        ops.Similarity.kmeansSummary(emb, lloydIters = 2).count())
      time("corpus_overlap")(ops.Dedup.sourceOverlap(docs).count())
      spark.stop()
      return
    }
    time("dedup_exact")(ops.Dedup.exact(docs).count())
    time("dedup_pipeline")(ops.Dedup.dedupPipeline(docs).count())
    time("prep_corpus")(ops.Prep.prepCorpus(docs).count())
    time("dedup_incremental") {
      ops.Dedup.incremental(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0)).count()
    }
    time("dedup_incremental_emb") {
      val e = emb.select(col("vec_id").as("doc_id"), col("embedding"))
      val idx0 = ops.Dedup.buildIndex(docs.filter(col("doc_id") % 5 =!= 0),
        embeddings = Some(e.filter(col("doc_id") % 5 =!= 0)),
        embThreshold = 0.8)
      val idx = idx0.copy(banded = ops.CacheScope.track(idx0.banded),
        emb = idx0.emb.map(ops.CacheScope.track))
      ops.Dedup.incrementalWithIndex(idx, docs.filter(col("doc_id") % 5 === 0),
        batchEmb = Some(e.filter(col("doc_id") % 5 === 0)),
        embThreshold = 0.8).count()
    }
    time("dedup_semantic_lloyd2")(
      ops.Similarity.semanticDedup(emb, lloydIters = 2).count())
    // t=0.8 is the regime where banding prunes; the sf default t=0.45 on
    // THIS near-orthogonal corpus is the documented no-prune wall (~60% of
    // all-pairs collide: at 40k vectors that is a ~500M-pair verify stream —
    // inherent to any pair-listing contract there, not a plan property; the
    // 10x-corpus run below carries the t45 cross-scale datapoint)
    time("dedup_semantic_full_t08")(
      ops.Similarity.semanticDedupFull(emb, threshold = 0.8).count())
    time("dedup_embedding_t08")(
      ops.Similarity.nearDupPairs(emb, threshold = 0.8).count())
    if (java.nio.file.Files.exists(java.nio.file.Paths.get("/tmp/stress10"))) {
      val emb10 = SparkEntry.emb(spark, "/tmp/stress10")
      time("dedup_semantic_full@10x")(
        ops.Similarity.semanticDedupFull(emb10).count())
    }
    time("ann_ivfpq")(
      ops.Similarity.ivfPqAdcTopK(emb, col("vec_id") % 1000 === 0, k = 3).count())
    time("ev_asof_1M")(SparkEntry.queries("ev_asof")(spark, dir).count())
    spark.stop()
  }
}
