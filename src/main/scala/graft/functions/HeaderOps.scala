package graft.functions

import graft.model.Messages

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Kafka-header extraction as pure column expressions (reference
 * HeaderHelper.java:36-64).
 *
 * A header list is `array<struct<key: string, value: binary>>` (the exact shape
 * Spark's Kafka source produces with `includeHeaders=true`). Kafka allows
 * duplicate header keys; like the reference (`Headers.lastHeader`) the LAST
 * occurrence wins. A header that is present with a null value is distinct from
 * an absent header (SURVEY §2.5.6).
 *
 * Extraction failures are values, not exceptions: every extractor returns the
 * extracted value plus a nullable error string carrying the reference's literal
 * error message. The parser composes them with `coalesce` in the reference's
 * sequential-throw order (error-capture channel, SURVEY §2.2 T11).
 */
object HeaderOps {

  /** value + first applicable error, both as columns. */
  final case class Extracted(value: Column, err: Column)

  /** Whether a header with this exact name is present (any value, incl. null).
    * Codegen'd reverse scan ([[HeaderExprs]]) — the higher-order-function
    * route (`filter` + `get`) is interpreted and was the parse bottleneck. */
  def hasHeader(headers: Column, name: String): Column =
    HeaderExprs.headerPresent(headers, name)

  /** UTF-8 string value of the last header with this name; null when absent or
    * when present with a null value. */
  def lastHeader(headers: Column, name: String): Column =
    HeaderExprs.lastHeaderValue(headers, name).cast("string")

  private def missing(name: String): Column =
    lit(Messages.MissingRequiredHeader.format(name))

  /** Required string header: absent OR null-valued → "Missing required header X"
    * (flatMap(stringValue).orElseThrow collapses both, reference
    * StreamsDeadLetterParser.java:53-56). */
  def reqString(headers: Column, name: String): Extracted = {
    val v = lastHeader(headers, name)
    Extracted(v, when(v.isNull, missing(name)))
  }

  /** Optional string header: never errors. */
  def optString(headers: Column, name: String): Extracted =
    Extracted(lastHeader(headers, name), lit(null).cast("string"))

  /** Header that must be present but whose value may be null
    * (EXCEPTION_MESSAGE, reference StreamsDeadLetterParser.java:68-70). */
  def presentString(headers: Column, name: String): Extracted = {
    val v = lastHeader(headers, name)
    Extracted(v, when(!hasHeader(headers, name), missing(name)))
  }

  private def numeric(headers: Column, name: String, required: Boolean,
      castTo: String, nullMsg: String): Extracted = {
    val present = hasHeader(headers, name)
    val v = lastHeader(headers, name)
    val parsed = v.try_cast(castTo)
    val err =
      when(present && v.isNull, lit(nullMsg))
        // Integer.parseInt / Long.parseLong failure message, verbatim
        .when(present && v.isNotNull && parsed.isNull,
          format_string("For input string: \"%s\"", v))
    Extracted(parsed, if (required) when(!present, missing(name)).otherwise(err)
                      else err)
  }

  /** Required int header: absent → missing; null value → "Cannot parse int from
    * null"; unparseable → NumberFormatException text (HeaderHelper.java:36-46). */
  def reqInt(headers: Column, name: String): Extracted =
    numeric(headers, name, required = true, "int", Messages.CannotParseIntFromNull)

  /** Optional int header: absent is fine, but present-and-null still errors
    * (reference ConnectDeadLetterParser.java:50 — `.map(intValue)`). */
  def optInt(headers: Column, name: String): Extracted =
    numeric(headers, name, required = false, "int", Messages.CannotParseIntFromNull)

  def reqLong(headers: Column, name: String): Extracted =
    numeric(headers, name, required = true, "long", Messages.CannotParseLongFromNull)

  def optLong(headers: Column, name: String): Extracted =
    numeric(headers, name, required = false, "long", Messages.CannotParseLongFromNull)

  /** Required long with a second header accepted as fallback when the first is
    * absent; the error message still names the primary header (faulty legacy
    * offset header, reference StreamsDeadLetterParser.java:56-61). */
  def reqLongWithFallback(headers: Column, name: String, fallback: String): Extracted = {
    val present = hasHeader(headers, name)
    val fbPresent = hasHeader(headers, fallback)
    val v = when(present, lastHeader(headers, name))
      .otherwise(lastHeader(headers, fallback))
    val parsed = v.try_cast("long")
    val err =
      when(!present && !fbPresent, missing(name))
        .when(v.isNull, lit(Messages.CannotParseLongFromNull))
        .when(parsed.isNull, format_string("For input string: \"%s\"", v))
    Extracted(parsed, err)
  }
}
