package graft

import java.nio.file.Files

import graft.sources.Bucketing

import org.apache.spark.sql.functions._

/** Plan-level proof of the bucketed-layout claim: the SAME equi-join that
  * shuffles both sides over plain parquet plans with ZERO exchanges over
  * catalog tables bucketed on the join key. */
class BucketingSpec extends SparkSpec {

  test("bucketed tables co-locate the join; plain parquet shuffles") {
    val dir = Files.createTempDirectory("graft-bucketing").toString
    // plan-shape assertions read the static plan, not AQE's runtime rewrite
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // force the SHUFFLE join shape on both paths (a tiny fixture would
    // otherwise broadcast and prove nothing about co-location)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = spark.range(0, 1000)
        .select(col("id").as("doc_id"), (col("id") % 7).as("x"))
      val b = spark.range(0, 1000)
        .select(col("id").as("doc_id"), (col("id") % 5).as("y"))
      Bucketing.writeBucketed(a, "bk_a", s"$dir/a", "doc_id", 8)
      Bucketing.writeBucketed(b, "bk_b", s"$dir/b", "doc_id", 8)
      // layout invariant: one file per bucket (the pre-repartition writer
      // emitted tasks×buckets files, fragmenting every later scan)
      val nFiles = new java.io.File(s"$dir/a").listFiles
        .count(_.getName.endsWith(".parquet"))
      assert(nFiles == 8, s"one file per bucket expected, got $nFiles")
      val j = Bucketing.bucketedJoin(spark, "bk_a", "bk_b", "doc_id")
      assert(!Bucketing.hasShuffle(j), "bucketed join must not exchange:\n" +
        j.queryExecution.executedPlan.toString.take(2000))
      assert(j.count() == 1000)
      // control: identical join over the same data as plain parquet
      a.write.mode("overwrite").parquet(s"$dir/ap")
      b.write.mode("overwrite").parquet(s"$dir/bp")
      val raw = spark.read.parquet(s"$dir/ap")
        .join(spark.read.parquet(s"$dir/bp"), "doc_id")
      assert(Bucketing.hasShuffle(raw), "plain-parquet control should shuffle")
      assert(raw.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS bk_a")
      spark.sql("DROP TABLE IF EXISTS bk_b")
    }
  }

  test("bucketed incremental index drops history-side probe exchanges") {
    import graft.ops.Dedup
    val dir = Files.createTempDirectory("graft-bkidx").toString
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // the layout only matters once the batch is too big to broadcast —
    // force that regime so the plan delta is visible on a fixture
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val history = spark.range(0, 500).select(col("id").as("doc_id"),
        concat(lit("history document body number "), col("id") % 50,
          lit(" with shared phrasing")).as("text"))
      val batch = spark.range(1000, 1100).select(col("id").as("doc_id"),
        concat(lit("history document body number "), col("id") % 50,
          lit(" with shared phrasing")).as("text"))
      Dedup.writeIndexBucketed(Dedup.buildIndex(history), dir, "bkidx", 8)
      val bucketed = Dedup.readIndexBucketed(spark, dir, "bkidx")
      val plain = Dedup.readIndex(spark, dir)
      val pb = Dedup.incrementalWithIndex(bucketed, batch, threshold = 0.5)
      val pp = Dedup.incrementalWithIndex(plain, batch, threshold = 0.5)
      val nb = Bucketing.countShuffles(pb)
      val np = Bucketing.countShuffles(pp)
      assert(nb < np, s"bucketed probe should drop history-side exchanges " +
        s"(bucketed=$nb plain=$np):\n" +
        pb.queryExecution.executedPlan.toString.take(3000))
      // identical rows either way — layout is pure plumbing
      def norm(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toString).sorted.toSeq
      assert(norm(pb) == norm(pp))
      assert(pb.filter(col("dup_of").isNotNull).count() == 100)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS bkidx_digests")
      spark.sql("DROP TABLE IF EXISTS bkidx_banded")
      graft.ops.CacheScope.releaseAll(spark)
    }
  }
}
