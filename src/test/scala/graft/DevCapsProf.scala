package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase profiler for webCrawlCaps (not part of the engine
  * surface): times surface materialization, the hier report, and the
  * cap join/window separately. */
object DevCapsProf {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    SparkEntry.prewarm(spark, dir)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val m = classOf[ops.Robots.type].getDeclaredMethods
      .find(_.getName == "trapsDeepSurfaceNormed").get
    m.setAccessible(true)
    val surface0 = m.invoke(ops.Robots, docs)
      .asInstanceOf[org.apache.spark.sql.DataFrame]
    val surface = t("surface-barrier") { ops.CacheScope.barrier(surface0) }
    val traps = t("hier-report-build+materialize") {
      val tr = ops.Robots.crawlTrapsHier(
        surface.select(col("registered_domain"), col("path")),
        maxPerPrefix = 8, maxDepth = 3, topK = 5)
      tr.count(); tr
    }
    t("cap-join+window") {
      ops.Robots.applyTrapCaps(surface, traps, capPerPrefix = 8).count()
    }
    t("full-query-second-run") {
      ops.Robots.webCrawlCaps(docs).count()
    }
    ops.CacheScope.releaseAll(spark)
    spark.stop()
  }
}
