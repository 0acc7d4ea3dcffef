package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Packed trigram-profile scorer for [[graft.ops.TextAnalysis.langId2]]: one
 * O(len) pass over the padded normalized string summing, per character
 * trigram, the 4 languages' profile weights — the table stores one packed
 * long per trigram (16 bits per language, en«48 | de«32 | es«16 | fr) so the
 * hot loop does ONE HashMap probe per position, but each language's running
 * sum lives in its own 64-bit accumulator (the lanes are unpacked per hit,
 * a shift+mask each). The r8 shape accumulated the packed longs themselves
 * and unpacked the SUM, which silently carries across lanes once any
 * language's sum exceeds 2¹⁶ — true for any few-KB document at weights up
 * to [[graft.ops.TextAnalysis.TrigramK]] (advisor r8, high). Long
 * accumulators cannot overflow: a max-length (2³¹) string of max-weight
 * (2⁶) trigrams sums to < 2³⁸.
 *
 * Returns the 4 scores as `array<long>` in [[graft.ops
 * .TextAnalysis.TrigramLangs]] order.
 *
 * Why an Expression and not `aggregate(transform(...), element_at(map...))`:
 * the HOF chain is CodegenFallback (interpreted lambdas), `element_at` on a
 * literal map is a LINEAR scan of the map per lookup, and every reference to
 * the score column in the winner `CASE` re-evaluates the whole chain —
 * measured 359 s for the 100× corpus. Here the profile probes are one
 * real-HashMap lookup each and the scan is one codegen'd virtual call per
 * row. Unlike [[BloomMightContain]]'s megabyte blob, the merged profile is a
 * few hundred entries, so it can stay an ordinary (deeply-compared)
 * constructor field — no identity-hash carrier needed.
 */
case class TrigramScore(child: Expression, profile: Map[String, Long])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_trigram_score"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING child, got ${child.dataType.simpleString}")

  @transient private lazy val table: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](profile.size * 2)
    profile.foreach { case (k, v) => m.put(k, v) }
    m
  }

  def score(s: UTF8String): ArrayData = {
    val str = s.toString
    var s0 = 0L; var s1 = 0L; var s2 = 0L; var s3 = 0L
    var i = 0
    val end = str.length - 3
    while (i <= end) {
      val w = table.get(str.substring(i, i + 3))
      if (w != null) {
        val p = w.longValue()
        s0 += (p >>> 48) & 0xffffL
        s1 += (p >>> 32) & 0xffffL
        s2 += (p >>> 16) & 0xffffL
        s3 += p & 0xffffL
      }
      i += 1
    }
    new GenericArrayData(Array(s0, s1, s2, s3))
  }

  override def nullSafeEval(s: Any): Any = score(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("trigramScorer", this,
      classOf[TrigramScore].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.score($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
