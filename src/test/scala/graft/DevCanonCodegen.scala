package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r16 scratch: find the >64KB codegen span in the canonical-tier queries. */
object DevCanonCodegen {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = SparkEntry.docs(spark, sfDir)
    val df = ops.UrlOps.webUrlCanonical(docs)
    import org.apache.spark.sql.execution.debug._
    val cg = df.queryExecution.debug.codegenToSeq()
    println(s"[canoncg] spans: ${cg.size}")
    cg.zipWithIndex.foreach { case ((subtree, code, _), i) =>
      println(s"[canoncg] === span $i: ${code.length} chars, " +
        s"${code.count(_ == '\n')} lines ===")
      println(subtree.split("\n").take(8).map("[canoncg]   " + _).mkString("\n"))
    }
    org.apache.spark.sql.graftbridge.forceCount(df)
    spark.stop()
  }
}
