package graft.functions

import org.apache.spark.sql.{graftbridge, Column}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * Native Catalyst vector arithmetic for embedding columns.
 *
 * Spark's generic route for an array dot product —
 * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — allocates an intermediate
 * array and interprets two lambdas per row (higher-order functions are
 * CodegenFallback). For ANN scoring that's the entire runtime. [[DotProduct]]
 * is the custom-Expression tier of SURVEY §7.4: a tight codegen'd loop over
 * the two `ArrayData`s, no allocation, stays inside whole-stage codegen.
 *
 * The accumulation is a sequential left fold in doubles — the same order as
 * the higher-order-function formulation and the DuckDB oracle, so results are
 * bit-identical.
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are always cast to array<double> by the Column helper below
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  private def toDoubleArray(c: Column): Column = c.cast("array<double>")

  /** Sequential-fold dot product (codegen'd). Accepts float or double arrays. */
  def dotProduct(a: Column, b: Column): Column =
    graftbridge.column(DotProduct(
      graftbridge.expression(toDoubleArray(a)),
      graftbridge.expression(toDoubleArray(b))))
}
