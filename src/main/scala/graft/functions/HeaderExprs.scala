package graft.functions

import org.apache.spark.sql.{graftbridge, Column}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codegen'd Kafka-header lookup.
 *
 * The generic route — `filter(headers, h -> h.key = name)` + `get(...)` — is a
 * higher-order function, which Catalyst interprets (CodegenFallback); the
 * parsers perform ~40 such lookups per record, which made header parsing the
 * pipeline's bottleneck. These expressions are a tight generated reverse scan
 * of the header array (last occurrence wins, like the reference's
 * `Headers.lastHeader`, HeaderHelper.java:54-56), keeping the whole parse
 * stage inside whole-stage codegen.
 */
abstract class HeaderLookup extends BinaryExpression {
  override def left: Expression = headers
  override def right: Expression = name
  def headers: Expression
  def name: Expression

  protected def scanCode(ctx: CodegenContext, arr: String, key: String,
      found: String, valueIsNull: String, value: String): String = {
    val i = ctx.freshName("i")
    val row = ctx.freshName("row")
    s"""
       |boolean $found = false;
       |boolean $valueIsNull = true;
       |byte[] $value = null;
       |for (int $i = $arr.numElements() - 1; $i >= 0; $i--) {
       |  InternalRow $row = $arr.getStruct($i, 2);
       |  if (!$row.isNullAt(0) && $row.getUTF8String(0).equals($key)) {
       |    $found = true;
       |    if (!$row.isNullAt(1)) { $valueIsNull = false; $value = $row.getBinary(1); }
       |    break;
       |  }
       |}
     """.stripMargin
  }

  protected def scan(h: Any, n: Any): (Boolean, Array[Byte]) = {
    val arr = h.asInstanceOf[ArrayData]
    val key = n.asInstanceOf[UTF8String]
    var i = arr.numElements() - 1
    while (i >= 0) {
      val row = arr.getStruct(i, 2)
      if (!row.isNullAt(0) && row.getUTF8String(0) == key) {
        return (true, if (row.isNullAt(1)) null else row.getBinary(1))
      }
      i -= 1
    }
    (false, null)
  }
}

/** Whether a header with this exact name is present (any value, incl. null).
  * A null headers array counts as absent. */
case class HeaderPresent(headers: Expression, name: Expression) extends HeaderLookup {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val h = headers.eval(input)
    if (h == null) false
    else scan(h, name.eval(input))._1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hc = headers.genCode(ctx)
    val nc = name.genCode(ctx)
    val found = ctx.freshName("found")
    val vin = ctx.freshName("vIsNull")
    val v = ctx.freshName("v")
    val body = s"""
         |boolean ${ev.value} = false;
         |if (!${hc.isNull}) {
         |  ${scanCode(ctx, hc.value.toString, nc.value.toString, found, vin, v)}
         |  ${ev.value} = $found;
         |}
       """.stripMargin
    ev.copy(isNull = FalseLiteral, code = hc.code + nc.code + code"$body")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(headers = l, name = r)
}

/** Binary value of the last header with this name; null when absent or
  * null-valued (callers distinguish via [[HeaderPresent]]). */
case class LastHeaderValue(headers: Expression, name: Expression) extends HeaderLookup {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val h = headers.eval(input)
    if (h == null) null
    else scan(h, name.eval(input))._2
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hc = headers.genCode(ctx)
    val nc = name.genCode(ctx)
    val found = ctx.freshName("found")
    val vin = ctx.freshName("vIsNull")
    val v = ctx.freshName("v")
    val body = s"""
         |boolean ${ev.isNull} = true;
         |byte[] ${ev.value} = null;
         |if (!${hc.isNull}) {
         |  ${scanCode(ctx, hc.value.toString, nc.value.toString, found, vin, v)}
         |  if ($found && !$vin) { ${ev.isNull} = false; ${ev.value} = $v; }
         |}
       """.stripMargin
    ev.copy(code = hc.code + nc.code + code"$body")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(headers = l, name = r)
}

object HeaderExprs {
  def headerPresent(headers: Column, name: String): Column =
    graftbridge.column(HeaderPresent(
      graftbridge.expression(headers),
      graftbridge.expression(org.apache.spark.sql.functions.lit(name))))

  def lastHeaderValue(headers: Column, name: String): Column =
    graftbridge.column(LastHeaderValue(
      graftbridge.expression(headers),
      graftbridge.expression(org.apache.spark.sql.functions.lit(name))))
}
