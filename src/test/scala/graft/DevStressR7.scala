package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stress validation (r7): BPE merge training at REAL vocab scale.
  * The r6 formulation ran one Spark job round per merge (10 rounds ≈ 1.9 s of
  * pure job overhead — 32k merges undeliverable); the r7 formulation keeps
  * the corpus-scale word count distributed, collects the bounded word table
  * once, and runs the merge loop locally with an incremental pair index.
  * This harness measures (a) merges/second at 1k and 4k merges — per-merge
  * cost must stay ~flat in the round number — and (b) corpus-size invariance
  * (sf0.1 vs the 100x corpus at the same merge count: only the word-count
  * pass may grow). Also: prep_d4 at the 100x corpus after the shared-scan
  * change, and the selective LargeMessage path. Not part of the driver
  * contract. */
object DevStressR7 {
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
    docs.count() // warm scan

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress-r7] $label%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      ops.CacheScope.releaseAll(spark)
      r
    }

    // merge-count scaling: per-merge cost must be ~flat (the collect and the
    // word-count pass amortize; each extra merge touches only posted words)
    for (m <- Seq(10, 1000, 4000)) {
      val t0 = System.nanoTime()
      val n = ops.TextAnalysis.bpeMerges(docs, merges = m).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[stress-r7] bpe_merges m=$m%-5d $sec%7.2f s  " +
        f"rows=$n  per-merge=${sec / m * 1000}%8.3f ms")
      ops.CacheScope.releaseAll(spark)
    }

    // the synthetic corpus's vocabulary is tiny (~30 distinct words — the
    // pair space exhausts after ~107 merges), so the corpus runs above can't
    // exercise 1k+ REAL rounds. Stress the local merge loop itself on a
    // natural-language-shaped synthetic vocabulary: 50k distinct words of
    // length 3..12 over a 26-letter alphabet, Zipf-weighted counts — per-merge
    // cost must stay ~flat from 1k to 8k rounds (the 32k-vocab deliverability
    // claim). Deterministic seed; pure driver-side (that IS the design: the
    // merge loop runs off the cluster).
    {
      val rnd = new scala.util.Random(42)
      val vocab = Array.tabulate(50000) { i =>
        val len = 3 + rnd.nextInt(10)
        val w = (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
        (w + i.toString, (100000.0 / (i + 1) + 1).toLong) // suffix → distinct
      }
      for (m <- Seq(1000, 8000, 32000)) {
        val t0 = System.nanoTime()
        val out = ops.TextAnalysis.localBpeMerges(vocab, m)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[stress-r7] local_bpe 50k-vocab m=$m%-5d $sec%7.2f s  " +
          f"rows=${out.length}  per-merge=${sec / m * 1000}%8.3f ms")
      }
    }

    if (args.contains("d4")) {
      val emb = SparkEntry.emb(spark, dir)
      emb.count()
      timed("prep_d4_t08 (shared scan)")(
        ops.Similarity.prepD4(emb, threshold = 0.8).count())
    }

    // `r7b`: the round-7 curation operators at the 100x corpus (500k docs:
    // each sf0.1 doc in 100 copies — every 4th copy byte-identical, the
    // rest suffix-perturbed, so exact-dup groups and distinct docs mix the
    // way a crawl refresh does). Key A/B: Bloom-prefiltered decontamination
    // must BEAT the exact pass here (at sf0.1 its blob job overhead wins;
    // the prefilter pays off once the gram shuffle dominates).
    if (args.contains("r7b")) {
      val big = "/tmp/stress100b"
      if (!new java.io.File(s"$big/documents.parquet").isDirectory) {
        println("[stress-r7] generating /tmp/stress100b (500k docs)")
        val perturbed = when(col("copy") % 4 === 0, col("text"))
          .otherwise(concat(col("text"), lit(" v"), col("copy").cast("string")))
        docs.crossJoin(spark.range(100).toDF("copy"))
          .select(
            (col("doc_id") + col("copy") * 1000000L).as("doc_id"),
            perturbed.as("text"),
            col("lang"), col("source"),
            length(perturbed).cast("long").as("n_chars"))
          .repartition(32)
          .write.mode("overwrite").parquet(s"$big/documents.parquet")
      }
      val bigDocs = SparkEntry.docs(spark, big)
      println(s"[stress-r7] corpus rows=${bigDocs.count()}")
      timed("text_cap_per_source")(
        ops.TextAnalysis.capPerSource(bigDocs, cap = 1000).count())
      timed("corpus_select_budget")(
        ops.TextAnalysis.selectBudget(bigDocs, budget = 1000000L).count())
      timed("text_decontaminate")(
        ops.TextAnalysis.decontaminate(bigDocs).count())
      timed("text_decontaminate_bloom")(
        ops.TextAnalysis.decontaminateBloom(bigDocs).count())
      timed("dedup_cross")(
        ops.Dedup.crossDedup(bigDocs.filter(col("source") =!= "src0"),
          bigDocs.filter(col("source") === "src0")).count())
      timed("corpus_snapshot_diff")(
        ops.Dedup.snapshotDiff(bigDocs.filter(col("doc_id") % 10 =!= 3),
          bigDocs.filter(col("doc_id") % 10 =!= 7)).count())
      timed("text_ccnet_buckets")(
        ops.TextAnalysis.ccnetBuckets(bigDocs).count())
      timed("text_gopher")(ops.TextAnalysis.gopherRules(bigDocs).count())
    }

    // `bloomab`: decontamination exact-vs-bloom on the 100x corpus.
    // CAVEAT the first cut missed: `.count()` on the decontamination output
    // lets Catalyst ELIMINATE the left join against the distinct
    // contaminated-id set (count prunes all columns; a distinct right side
    // preserves cardinality), so the whole gram pipeline is optimized away
    // and "exact" times a bare corpus count. The honest measurement below
    // aggregates OVER the contaminated flag, which forces the join.
    if (args.contains("bloomab")) {
      val big = "/tmp/stress100b"
      val bigDocs = SparkEntry.docs(spark, big)
      bigDocs.count()
      def hits(df: org.apache.spark.sql.DataFrame): Long =
        df.agg(sum(when(col("contaminated"), 1L).otherwise(0L)))
          .head().getLong(0)
      // evidence of the pruning: the count() plan has no Generate (explode)
      val countPlan = org.apache.spark.sql.graftbridge.executedPlanString(
        ops.TextAnalysis.decontaminate(bigDocs)
          .groupBy().count())
      println(s"[stress-r7] count()-plan has explode: " +
        countPlan.contains("Generate"))
      ops.CacheScope.releaseAll(spark)
      timed("exact (forced)")(
        hits(ops.TextAnalysis.decontaminate(bigDocs)))
      for (bits <- Seq(20, 23, 26)) {
        timed(s"bloom 2^$bits bits (forced)")(
          hits(ops.TextAnalysis.decontaminateBloom(bigDocs,
            numBits = 1L << bits)))
      }
    }
    spark.stop()
  }
}
