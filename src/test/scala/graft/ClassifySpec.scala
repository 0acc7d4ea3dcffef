package graft

import graft.functions.Classify

import org.apache.spark.sql.functions.col

/** Port of reference StackTraceClassifierTest.java:58-80 (same fixtures,
  * same expected classifications). */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private def classify(st: String): String =
    Seq(st).toDF("st").select(Classify.classify(col("st"))).head.getString(0)

  test("frame line extracted from full jdbi stack trace") {
    assert(classify(Fixtures.StackTrace) == Fixtures.StackTraceType)
  }

  test("exception class extracted when no frame lines") {
    assert(classify(Fixtures.ElasticTrace) == Fixtures.ElasticType)
  }

  test("bare exception line with trailing newline") {
    assert(classify("java.lang.NullPointerException\n") == "java.lang.NullPointerException")
  }

  test("unparseable first line falls back to the raw first line") {
    assert(classify("!! not a trace\nsecond line") == "!! not a trace")
  }

  test("single line without newline") {
    assert(classify("java.lang.IllegalStateException: boom") == "java.lang.IllegalStateException")
  }
}
