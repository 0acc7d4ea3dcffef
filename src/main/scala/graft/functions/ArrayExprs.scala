package graft.functions

import org.apache.spark.sql.{graftbridge, Column}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/**
 * Intersection cardinality of two SORTED int arrays, as a single merge pass.
 *
 * The set-similarity verify stage of near-dup detection (Dedup.jaccardVerify)
 * evaluates |A∩B| once per candidate pair — at corpus scale that's billions of
 * evaluations. Spark's `array_intersect` builds a hash set of one side per
 * call and materializes the intersection array; over string tokens that is
 * ~100x the cost of this expression, which walks two pre-sorted int arrays
 * with no allocation and stays inside whole-stage codegen (the custom-
 * Expression tier of SURVEY §7.4, like [[DotProduct]]).
 *
 * Inputs must be sorted ascending and duplicate-free (the caller builds them
 * with `array_sort(array_distinct(...))` once per document, not per pair).
 */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xv = x.getInt(i); val yv = y.getInt(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val c = ctx.freshName("c"); val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  int $xv = $a.getInt($i);
         |  int $yv = $b.getInt($j);
         |  if ($xv < $yv) $i++;
         |  else if ($xv > $yv) $j++;
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayExprs {
  /** |A∩B| for two sorted duplicate-free int arrays (codegen'd merge pass). */
  def sortedIntersectSize(a: Column, b: Column): Column =
    graftbridge.column(SortedIntersectSize(
      graftbridge.expression(a), graftbridge.expression(b)))
}
