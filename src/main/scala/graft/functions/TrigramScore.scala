package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Packed trigram-profile scorer for [[graft.ops.TextAnalysis.langId2]]: one
 * O(len) pass over the padded normalized string summing, per character
 * trigram, a 4-lane packed weight long (16 bits per language —
 * en«48 | de«32 | es«16 | fr). Lanes cannot carry into each other: each lane
 * sums ≤ len weights of ≤ 64 ≪ 2¹⁶.
 *
 * Why an Expression and not `aggregate(transform(...), element_at(map...))`:
 * the HOF chain is CodegenFallback (interpreted lambdas), `element_at` on a
 * literal map is a LINEAR scan of the map per lookup, and every reference to
 * the score column in the winner `CASE` re-evaluates the whole chain —
 * measured 359 s for the 100× corpus. Here the profile probes are one
 * real-HashMap lookup each, the scan is one codegen'd virtual call per row,
 * and the per-language unpack (`shift + mask`) is cheap enough to duplicate.
 * Unlike [[BloomMightContain]]'s megabyte blob, the merged profile is a few
 * hundred entries, so it can stay an ordinary (deeply-compared) constructor
 * field — no identity-hash carrier needed.
 */
case class TrigramScore(child: Expression, profile: Map[String, Long])
    extends UnaryExpression {

  override def dataType: DataType = LongType
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

  def score(s: UTF8String): Long = {
    val str = s.toString
    var sum = 0L
    var i = 0
    val end = str.length - 3
    while (i <= end) {
      val w = table.get(str.substring(i, i + 3))
      if (w != null) sum += w.longValue()
      i += 1
    }
    sum
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
