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

  test("compactIndexBucketed folds takedowns keeping the bucketed layout") {
    import graft.ops.Dedup
    val dir = Files.createTempDirectory("graft-bkidx-comp").toString
    val freshDir = Files.createTempDirectory("graft-bkidx-fresh").toString
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // 50 exact classes of 10 docs each (class = doc_id % 50); deleting
      // doc_id % 10 == 0 removes WHOLE classes 0/10/20/30/40 (every member
      // of a %50-class shares its residue mod 10), so no sketch class
      // loses a representative while siblings survive — the regime where
      // compaction must equal a fresh build on the survivors
      val history = spark.range(0, 500).select(col("id").as("doc_id"),
        concat(lit("history document body number "), col("id") % 50,
          lit(" with shared phrasing")).as("text"))
      Dedup.writeIndexBucketed(Dedup.buildIndex(history), dir, "cmpidx", 8)
      Dedup.deleteFromIndex(dir,
        history.filter(col("doc_id") % 10 === 0).select(col("doc_id")))
      val batch = spark.range(1000, 1100).select(col("id").as("doc_id"),
        concat(lit("history document body number "), col("id") % 50,
          lit(" with shared phrasing")).as("text"))
      def probe() = Dedup.incrementalWithIndex(
        Dedup.readIndexBucketed(spark, dir, "cmpidx"), batch,
        threshold = 0.8)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toString).sorted.toSeq
      // pre-compaction view: batch docs of the deleted classes come back
      // new; surviving classes label with their (surviving) min doc_id
      val afterDelete = rows(probe())
      assert(probe().filter(col("dup_of").isNotNull).count() == 90)
      Dedup.compactIndexBucketed(spark, dir, "cmpidx")
      assert(!new java.io.File(s"$dir/tombstones").exists())
      // probe rows unchanged, and the probe join is STILL exchange-free
      // relative to the plain-parquet read of the same files
      val pb = probe()
      assert(rows(pb) == afterDelete, "compaction changed probe labels")
      val np = Bucketing.countShuffles(Dedup.incrementalWithIndex(
        Dedup.readIndex(spark, dir), batch, threshold = 0.8))
      assert(Bucketing.countShuffles(pb) < np,
        "compacted layout lost the bucketed probe's exchange elision")
      // layout invariant: one file per bucket, bucket-id naming intact
      val files = new java.io.File(s"$dir/digests").listFiles
        .filter(_.getName.endsWith(".parquet")).map(_.getName)
      assert(files.length == 8, files.mkString(","))
      assert(files.forall(_.matches("part-\\d+-.*_\\d{5}\\.c\\d{3}.*")),
        files.mkString(","))
      // row-identity with a FRESH bucketed build over the survivors
      Dedup.writeIndexBucketed(
        Dedup.buildIndex(history.filter(col("doc_id") % 10 =!= 0)),
        freshDir, "cmpidxf", 8)
      def tbl(df: org.apache.spark.sql.DataFrame) = {
        val cs = df.columns.sorted.map(col(_))
        df.select(cs: _*).collect().map(_.toString).sorted.toSeq
      }
      assert(tbl(spark.table("cmpidx_digests")) ==
        tbl(spark.table("cmpidxf_digests")))
      assert(tbl(spark.table("cmpidx_banded")) ==
        tbl(spark.table("cmpidxf_banded")))
      // full-takedown refusal preserved, BEFORE mutating
      Dedup.deleteFromIndex(dir, history.select(col("doc_id")))
      intercept[IllegalArgumentException] {
        Dedup.compactIndexBucketed(spark, dir, "cmpidx")
      }
      assert(new java.io.File(s"$dir/tombstones").exists())
      // a CROSSED (dir, prefix) pairing refuses before reading anything:
      // cmpidxf's catalog tables live under freshDir, not dir — without
      // the location check this call would overwrite dir's index with
      // freshDir's rows and drop dir's tombstones
      val crossed = intercept[IllegalArgumentException] {
        Dedup.compactIndexBucketed(spark, dir, "cmpidxf")
      }
      assert(crossed.getMessage.contains("dir/prefix mismatch"),
        crossed.getMessage)
      assert(new java.io.File(s"$dir/tombstones").exists())
      // a plain writeIndex layout refuses the bucketed compaction
      val pdir = Files.createTempDirectory("graft-bkidx-plain").toString
      Dedup.writeIndex(Dedup.buildIndex(history.limit(5)), pdir)
      Dedup.deleteFromIndex(pdir, spark.range(1, 2).select(
        col("id").as("doc_id")))
      intercept[IllegalArgumentException] {
        Dedup.compactIndexBucketed(spark, pdir, "cmpidx")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      Seq("cmpidx_digests", "cmpidx_banded", "cmpidxf_digests",
        "cmpidxf_banded", "cmpidx_digests_compacting",
        "cmpidx_banded_compacting").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      graft.ops.CacheScope.releaseAll(spark)
    }
  }
}
