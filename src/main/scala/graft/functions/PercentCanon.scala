package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Canonical percent-encoding form for robots.txt path matching — RFC 9309
 * §2.2.2: percent-encoded octets in rule and target "MUST be unencoded
 * prior to comparison, unless it is a reserved character ... or the
 * character is outside the unreserved character range"; octets outside
 * US-ASCII are compared percent-encoded. Concretely, both sides normalize
 * to ONE spelling so `/caf%C3%A9` and its decoded `/café` match either
 * way:
 *
 *  - `%XX` decoding to an RFC 3986 UNRESERVED octet (ALPHA / DIGIT /
 *    `-._~`) is decoded to the bare character (`%61bc` → `abc`);
 *  - any other valid `%XX` (reserved or non-ASCII octet) is kept encoded
 *    with UPPERCASE hex (`%c3%a9` → `%C3%A9` — RFC 3986 §6.2.2.1's case
 *    normalization);
 *  - raw non-ASCII characters percent-encode their UTF-8 octets
 *    (`café` → `caf%C3%A9`);
 *  - a `%` not followed by two hex digits stays literal (robots files are
 *    untrusted; a malformed escape must not throw);
 *  - all other ASCII (including the `*` and `$` rule metacharacters,
 *    which are RFC 3986 reserved) passes through untouched — ASCII-only
 *    input with no escapes is the identity, so the existing fixture
 *    decisions are unchanged.
 *
 * Codegen'd single pass over the UTF-8 bytes (one virtual call per row) —
 * applied to rule patterns once per domain at parse time and to each
 * page's match target in the gate projection.
 */
case class PercentCanon(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_percent_canon"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING child, got ${child.dataType.simpleString}")

  override def nullSafeEval(s: Any): Any =
    PercentCanon.canon(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PercentCanon.canon($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PercentCanon {
  private val Hex = "0123456789ABCDEF".getBytes

  private def hexVal(b: Byte): Int =
    if (b >= '0' && b <= '9') b - '0'
    else if (b >= 'a' && b <= 'f') b - 'a' + 10
    else if (b >= 'A' && b <= 'F') b - 'A' + 10
    else -1

  private def isUnreserved(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
      (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' || v == '~'

  /** The canonicalization (see the class doc). Static so codegen calls it
    * directly — no per-expression state. */
  def canon(s: UTF8String): UTF8String = {
    val in = s.getBytes
    // fast path: pure printable-ASCII with no '%' is already canonical
    var i = 0
    var clean = true
    while (clean && i < in.length) {
      if (in(i) == '%' || (in(i) & 0x80) != 0) clean = false
      i += 1
    }
    if (clean) return s
    val out = new java.io.ByteArrayOutputStream(in.length + 8)
    i = 0
    while (i < in.length) {
      val b = in(i)
      if (b == '%' && i + 2 < in.length && hexVal(in(i + 1)) >= 0 &&
          hexVal(in(i + 2)) >= 0) {
        val v = hexVal(in(i + 1)) * 16 + hexVal(in(i + 2))
        if (isUnreserved(v)) out.write(v)
        else {
          out.write('%')
          out.write(Hex(hexVal(in(i + 1))))
          out.write(Hex(hexVal(in(i + 2))))
        }
        i += 3
      } else if ((b & 0x80) != 0) {
        out.write('%')
        out.write(Hex((b >> 4) & 0xF))
        out.write(Hex(b & 0xF))
        i += 1
      } else {
        out.write(b)
        i += 1
      }
    }
    UTF8String.fromBytes(out.toByteArray)
  }

  /** Column form. */
  def canonize(c: Column): Column = {
    val b = org.apache.spark.sql.graftbridge
    b.column(PercentCanon(b.expression(c)))
  }
}
