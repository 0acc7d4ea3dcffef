package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Charset-aware, NEVER-throwing byte decode for crawl payloads: decodes a
 * binary column under a PER-ROW charset label (the HTTP `Content-Type`
 * charset parameter as captured by the WARC walker), with two crawl-grade
 * lenitions Spark's built-in `decode` lacks:
 *
 *  - an unknown/illegal charset label falls back to UTF-8 (real crawls
 *    carry garbage labels; a pipeline must not die on one bad header) —
 *    labels resolve through `java.nio.charset.Charset.forName`, so every
 *    platform charset and alias (latin1, cp1252, shift_jis, gb2312, …)
 *    works without a whitelist;
 *  - malformed/unmappable byte sequences decode as U+FFFD REPLACEMENT
 *    (`CodingErrorAction.REPLACE`) instead of raising — Spark 4's `decode`
 *    raises `MALFORMED_CHARACTER_CODING` by default, which would kill a
 *    100 TB scan on its first mojibake page.
 *
 * Codegen'd (one virtual call per row); resolved `Charset` objects are
 * memoized per label in a small map so the per-row cost after the first
 * page of a charset is one hash probe.
 */
case class CharsetDecode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_charset_decode"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY, STRING) children, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Charset]()
  @transient private lazy val negative =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def charsetFor(label: String): Charset = {
    // normalize before caching (charset labels are case-insensitive, RFC
    // 2978 §2.3) and use TWO capped caches: the positive cache admits only
    // labels that RESOLVE (so high-cardinality garbage can never fill it
    // and lock a legitimate late-arriving charset out — its universe is
    // the few hundred charsets+aliases the JVM knows), while the negative
    // set remembers failed labels so the COMMON real-crawl garbage
    // ('x-user-defined', 'none', '8bit', …, repeated millions of times)
    // stays one hash probe instead of a thrown-and-caught forName
    // exception per row; only UNSEEN garbage past the negative cap pays
    // the exception — bounded, adversarial-only work.
    val key = label.trim.toLowerCase(java.util.Locale.ROOT)
    if (key.isEmpty) return StandardCharsets.UTF_8
    val hit = cache.get(key)
    if (hit != null) return hit
    if (negative.contains(key)) return StandardCharsets.UTF_8
    try {
      val cs = Charset.forName(key)
      if (cache.size < CharsetDecode.MaxCachedLabels)
        cache.putIfAbsent(key, cs)
      cs
    } catch {
      case _: Exception =>
        // length-bound the retained key: the label comes from an untrusted
        // header capture with no length cap, and 2048 crafted multi-MB
        // tokens would pin GBs per executor — no real charset name is
        // anywhere near 64 chars, so longer garbage just stays uncached
        if (key.length <= CharsetDecode.MaxNegativeKeyLen &&
            negative.size < CharsetDecode.MaxCachedLabels) negative.add(key)
        StandardCharsets.UTF_8
    }
  }

  def decodeBytes(b: Array[Byte], cs: UTF8String): UTF8String = {
    val dec = charsetFor(if (cs == null) "UTF-8" else cs.toString).newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    UTF8String.fromString(dec.decode(ByteBuffer.wrap(b)).toString)
  }

  override def nullSafeEval(b: Any, cs: Any): Any =
    decodeBytes(b.asInstanceOf[Array[Byte]], cs.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dec", this, classOf[CharsetDecode].getName)
    nullSafeCodeGen(ctx, ev, (b, cs) => s"${ev.value} = $ref.decodeBytes($b, $cs);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object CharsetDecode {
  /** Per-expression charset-label cache cap — comfortably above every
    * legitimate charset+alias the JVM knows, small enough that an
    * adversarial label stream cannot matter. */
  private[functions] val MaxCachedLabels = 2048

  /** Longest label the NEGATIVE cache retains (the entry-count cap alone
    * would let 2048 crafted multi-MB tokens pin GBs per executor). */
  private[functions] val MaxNegativeKeyLen = 64

  /** Column form: decode `bytes` under the per-row `charset` label (null
    * label → UTF-8; see the class doc for the lenient semantics). */
  def decodeWith(bytes: Column, charset: Column): Column = {
    val b = org.apache.spark.sql.graftbridge
    b.column(CharsetDecode(b.expression(bytes), b.expression(charset)))
  }
}
