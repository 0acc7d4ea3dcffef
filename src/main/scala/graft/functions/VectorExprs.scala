package graft.functions

import org.apache.spark.sql.{graftbridge, Column}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

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

/**
 * All `bands` sign-LSH band keys of a vector in ONE pass: band b's key packs
 * the signs of the dots with hyperplanes [b·r, (b+1)·r). One Expression
 * instead of r·b [[DotProduct]] columns — at production banding widths
 * (hundreds of sign bits) the per-column formulation explodes generated code
 * past what whole-stage codegen tolerates, while this is a single tight
 * O(bits·dims) loop over a precomputed plane matrix. Codegen emits one call
 * on the captured expression instance (the standard reference-object
 * pattern), so the surrounding stage stays fully compiled.
 */
case class SignBandKeys(child: Expression, dims: Int, rowsPerBand: Int,
    bands: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "sign_band_keys"

  // flattened [bit][dim] hyperplane matrix, built once per executor
  @transient private lazy val planes: Array[Double] = {
    val total = rowsPerBand * bands
    val arr = new Array[Double](total * dims)
    var h = 0
    while (h < total) {
      val hp = VectorExprs.hyperplane(h, dims)
      var d = 0
      while (d < dims) { arr(h * dims + d) = hp(d); d += 1 }
      h += 1
    }
    arr
  }

  def compute(x: ArrayData): ArrayData = {
    // shorter input arrays are zero-padded — same as the fold in DotProduct
    // stopping at min(len), so engine and oracle agree on truncated vectors
    val n = math.min(dims, x.numElements())
    val vec = new Array[Double](dims)
    var d = 0
    while (d < n) { vec(d) = x.getDouble(d); d += 1 }
    val keys = new Array[Int](bands)
    var b = 0
    var h = 0
    while (b < bands) {
      var key = 0
      var j = 0
      while (j < rowsPerBand) {
        var s = 0.0
        val base = h * dims
        var d2 = 0
        while (d2 < dims) { s += planes(base + d2) * vec(d2); d2 += 1 }
        if (s >= 0) key |= (1 << j)
        h += 1
        j += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signBandKeys", this, classOf[SignBandKeys].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExprs {
  private def toDoubleArray(c: Column): Column = c.cast("array<double>")

  /** Sequential-fold dot product (codegen'd). Accepts float or double arrays. */
  def dotProduct(a: Column, b: Column): Column =
    graftbridge.column(DotProduct(
      graftbridge.expression(toDoubleArray(a)),
      graftbridge.expression(toDoubleArray(b))))

  /** Deterministic pseudo-random hyperplanes: component d of hyperplane h is
    * derived from md5("h:d") — first 4 hex digits as an int x in [0, 65536),
    * mapped to (x - 32768) / 32768.0 (a dyadic rational: exactly
    * representable, so the DuckDB oracle reproduces it bit-for-bit). */
  def hyperplane(h: Int, dims: Int): Seq[Double] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    (0 until dims).map { d =>
      val hex = digest.digest(s"$h:$d".getBytes("UTF-8"))
        .take(2).map(b => f"$b%02x").mkString
      (Integer.parseInt(hex, 16) - 32768) / 32768.0
    }
  }

  /** All sign-LSH band keys of a vector (codegen'd single pass). */
  def signBandKeys(embedding: Column, dims: Int, rowsPerBand: Int,
      bands: Int): Column =
    graftbridge.column(SignBandKeys(
      graftbridge.expression(toDoubleArray(embedding)), dims, rowsPerBand, bands))
}
