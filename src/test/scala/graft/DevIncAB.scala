package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.forceCount

/** Dev-only controlled A/B for the incremental-dedup probe (r9): the r7
  * probe shape (no representative collapse anywhere — raw banded tables
  * joined directly, min per batch doc) vs the r9 shape
  * ([[graft.ops.Dedup.incrementalWithIndex]]: history pre-collapsed at
  * build, batch collapsed via one digest-keyed agg + member re-expansion).
  * Interleaved reps in ONE session so JIT/cache state is shared. Not part
  * of the driver contract. */
object DevIncAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet(s"$dir/documents.parquet")
    d.count()
    val hist = d.filter(col("doc_id") % 5 =!= 0)
    val batch = d.filter(col("doc_id") % 5 === 0)

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[inc-ab] $label%-36s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (rows $n)")
      ops.CacheScope.releaseAll(spark)
    }

    /** The r7 probe, inlined: exact tier + 8-branch banded join with
      * in-stage Jaccard, NO collapse on either side. */
    def r7Probe(): Long = {
      import ops.Par.maybeBroadcast
      val k = 32; val bands = 8; val threshold = 0.8
      val bHash = ops.CacheScope.trackEager(
        batch.select(col("doc_id"), md5(col("text")).as("__h")))
      val hHash = hist.select(col("doc_id").as("hid"), md5(col("text")).as("__h"))
      val exact = hHash
        .join(maybeBroadcast(bHash.select(col("__h")).distinct()), Seq("__h"),
          "left_semi")
        .join(maybeBroadcast(bHash), "__h")
        .groupBy(col("doc_id")).agg(min(col("hid")).as("exact_id"))
      val bandedH = ops.CacheScope.track(
        ops.Dedup.bandedWithSets(hist, k, bands, ops.Tokenizer.Whitespace))
      val bandedB = ops.CacheScope.trackEager(
        ops.Dedup.bandedWithSets(batch, k, bands, ops.Tokenizer.Whitespace))
      val inter = graft.functions.ArrayExprs.sortedIntersectSize(
        col("h.tks"), col("b.tks"))
      val near = (0 until bands).map { bd =>
        val guard = (0 until bd)
          .map(p => col(s"h.band$p") =!= col(s"b.band$p"))
          .foldLeft(col(s"h.band$bd") === col(s"b.band$bd"))(_ && _)
        bandedH.as("h").join(maybeBroadcast(bandedB.as("b")), guard)
          .select(col("b.doc_id").as("doc_id"), col("h.doc_id").as("hid"),
            (inter.cast("double") /
              (size(col("h.tks")) + size(col("b.tks")) - inter)).as("j"))
      }.reduce(_ unionByName _)
        .filter(col("j") >= threshold)
        .groupBy(col("doc_id")).agg(min(col("hid")).as("near_id"))
      forceCount(batch.select(col("doc_id"))
        .join(exact, Seq("doc_id"), "left")
        .join(near, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("exact_id"), col("near_id")).as("dup_of")))
    }

    def r9Probe(): Long =
      forceCount(ops.Dedup.incremental(hist, batch))

    // sub-piece timings of the r9 shape (fresh index each, like the bench)
    def pieces(): Unit = {
      val idx = ops.Dedup.buildIndex(hist)
      timed("r9 piece: history build+collapse")(forceCount(idx.banded))
      val bga = ops.Dedup.bandedWithSets(batch, 32, 8, ops.Tokenizer.Whitespace)
      timed("r9 piece: batch banded (no collapse)")(forceCount(bga))
    }

    (1 to 3).foreach { i =>
      timed(s"r7 shape, rep $i")(r7Probe())
      timed(s"r9 shape, rep $i")(r9Probe())
    }
    pieces()
    spark.stop()
  }
}
