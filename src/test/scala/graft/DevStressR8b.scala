package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.forceCount

/** Dev-only: 100× re-measure of the stage-zero composed recipes after the
  * eager-materialization fix (lazy caches lost the race to the chains'
  * first jobs and the render→extract lineage recomputed — see
  * [[graft.ops.Prep.prepFineWebHtml]]'s scaladoc), plus the first 100×
  * numbers for `prep_web`. Requires /tmp/stress100b from [[DevStressR8]].
  * Not part of the driver contract. */
object DevStressR8b {
  def main(args: Array[String]): Unit = {
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
      println(f"[stress-r8b] $label%-36s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      ops.CacheScope.releaseAll(spark)
      r
    }
    val d01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val d100 = spark.read.parquet("/tmp/stress100b/documents.parquet")
    d01.count(); d100.count()
    timed("prep_fineweb_html sf0.1 (eager)")(
      forceCount(ops.Prep.prepFineWebHtml(d01)))
    timed("prep_fineweb_html 100x (eager)")(
      forceCount(ops.Prep.prepFineWebHtml(d100)))
    timed("prep_web sf0.1")(forceCount(ops.Prep.prepWeb(d01)))
    timed("prep_web 100x")(forceCount(ops.Prep.prepWeb(d100)))
    spark.stop()
  }
}
