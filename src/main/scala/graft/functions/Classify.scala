package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Stack-trace → error-type classification (reference
 * StackTraceClassifier.java:36-66), expressed as pure Catalyst column
 * expressions so it stays inside whole-stage codegen.
 *
 * Semantics (validated against the reference test fixtures,
 * StackTraceClassifierTest.java:58-80):
 *   1. first `\tat pkg.Cls.method(File.java:NN)` frame anywhere in the trace;
 *   2. else the exception class at the start of the first line;
 *   3. else the raw first line.
 *
 * NOTE the dot before `java` in the frame regex is intentionally unescaped —
 * the reference source has the same bug and we reproduce it verbatim
 * (StackTraceClassifier.java:37-38).
 */
object Classify {
  /** `(?:\n|^)\tat ([.\w]+\(\w+.java:\d+\))(?:\n|$)` */
  val FrameRegex: String = "(?:\\n|^)\\tat ([.\\w]+\\(\\w+.java:\\d+\\))(?:\\n|$)"

  /** `^([.\w$]+).*` applied with find() — effectively anchored to the first
    * line's start because the input is pre-split to its first line. */
  val ExceptionRegex: String = "^([.\\w$]+).*"

  /** First line of a (possibly multi-line) string; the whole string when it
    * has no newline — mirrors Splitter.on("\n").findFirst. */
  def firstLine(s: Column): Column = substring_index(s, "\n", 1)

  /** The error "type" of a stack trace. Null input → null (caller routes null
    * stack traces to the error channel before classification, reference
    * ContextEnricher.java:38-41 via orElseThrow). */
  def classify(stackTrace: Column): Column = {
    val fl = firstLine(stackTrace)
    coalesce(
      nullif(regexp_extract(stackTrace, FrameRegex, 1), lit("")),
      nullif(regexp_extract(fl, ExceptionRegex, 1), lit("")),
      fl)
  }
}
