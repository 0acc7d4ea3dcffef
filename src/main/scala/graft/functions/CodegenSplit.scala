package graft.functions

import org.apache.spark.sql.{graftbridge, Column}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.DataType

/**
 * Identity expression that DELIBERATELY does not support whole-stage
 * codegen — a fusion breaker for operator chains whose fused consume method
 * exceeds janino's hard 64 KB bytecode-per-method limit.
 *
 * Whole-stage codegen inlines every downstream operator's consume into the
 * producing loop; when the chain's inputs are codegen VARIABLES (the output
 * of a Generate or a hash aggregate) Spark cannot split the generated
 * method, so a chain of several expression-heavy operators (the URL
 * pipeline: RFC 3986 resolution, normalization, hygiene gating — each tens
 * of KB of generated code) produces one giant method that FAILS to compile.
 * The failure is not cached: every run of every such stage re-attempts the
 * multi-thousand-line compile (~0.3–0.5 s of driver time each) and then
 * executes the WHOLE span interpreted — measured in r16 as one failed
 * compile per hop per run of the frontier-expansion queries.
 *
 * Placing this marker on ONE CHEAP sub-expression of an operator (e.g. an
 * already-computed long column) excludes that operator from whole-stage
 * fusion (`CollapseCodegenStages` treats any `CodegenFallback` expression
 * as unsupported) WITHOUT losing codegen for the heavy work: the excluded
 * operator still compiles its expressions through per-operator codegen
 * (`newPredicate` / unsafe projection), where row-based inputs let Spark
 * split generated methods freely, and the spans on either side compile the
 * same way. Only this marker itself evaluates via `eval` — wrap a trivial
 * column, never the heavy expression.
 */
case class CodegenSplitMarker(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "codegen_split_marker"
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def withNewChildInternal(newChild: Expression)
      : CodegenSplitMarker = copy(child = newChild)
}

/**
 * Identity expression DECLARED non-deterministic (it is not — the point is
 * what the declaration switches off): the optimizer may not duplicate,
 * push filters through, or collapse projections over a non-deterministic
 * alias. Wrapping ONE expensive projected expression (an RFC 3986
 * resolution, a URL normalization) pins its evaluation to exactly one
 * place — without it, filter-pushdown and project-collapsing INLINE a copy
 * of the expression into every consumer (measured in r16: the hop loop's
 * fused link pipeline carried ~13 substituted copies of the 40-regex
 * resolver per row, and the resulting single generated method overflowed
 * janino's 64 KB limit, so the span failed to compile on every run and
 * executed interpreted). The optimization guide's §4.4 non-deterministic
 * trick, applied to Catalyst expressions instead of UDFs. Codegen is a
 * transparent passthrough of the child; `eval` delegates.
 */
case class NondetIdentity(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nondet_identity"
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression)
      : NondetIdentity = copy(child = newChild)
}

object CodegenSplit {
  /** Wrap a cheap column with the fusion-breaking marker (see
    * [[CodegenSplitMarker]]). */
  def marker(c: Column): Column =
    graftbridge.column(CodegenSplitMarker(graftbridge.expression(c)))

  /** Pin an expensive projected expression to one evaluation site (see
    * [[NondetIdentity]]). */
  def nondet(c: Column): Column =
    graftbridge.column(NondetIdentity(graftbridge.expression(c)))
}
