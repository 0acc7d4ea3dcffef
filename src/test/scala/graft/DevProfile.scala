package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler (not part of the engine surface). */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $name n=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val env = sources.DeadLetterSource.envelope(spark, dir).persist()
    t("envelope-materialize") { env.count() }
    t("parse-full") { plans.Analyzer.parsed(env).count() }
    t("parse-full-2") { plans.Analyzer.parsed(env).count() }
    // branch predicates only
    t("predicates-only") {
      env.select(
        operators.Parsers.isAvroDeadLetter(col("value")).as("a"),
        operators.Parsers.hasStreamsHeaders(col("headers")).as("b"),
        operators.Parsers.hasNativeHeaders(col("headers")).as("c"),
        operators.Parsers.hasConnectHeaders(col("headers")).as("d"))
        .filter(col("a") || col("b") || col("c") || col("d")).count()
    }
    // single branches
    t("branch-avro") {
      env.filter(operators.Parsers.isAvroDeadLetter(col("value")))
        .select(operators.Parsers.avroValue(col("value")).as("p"))
        .filter(col("p").getField("error").isNull).count()
    }
    t("branch-streams") {
      env.filter(operators.Parsers.hasStreamsHeaders(col("headers")))
        .select(operators.Parsers.streamsHeaders(col("value"), col("headers"), col("timestamp")).as("p"))
        .filter(col("p").getField("error").isNull).count()
    }
    t("branch-connect") {
      env.filter(operators.Parsers.hasConnectHeaders(col("headers")))
        .select(operators.Parsers.connectHeaders(col("value"), col("headers"), col("timestamp")).as("p"))
        .filter(col("p").getField("error").isNull).count()
    }
    println("==== parsed plan ====")
    plans.Analyzer.parsed(env).explain("formatted")
    spark.stop()
  }
}
