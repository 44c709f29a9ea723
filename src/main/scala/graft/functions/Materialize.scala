package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Evaluation barrier: a pass-through that pins its child to the Project that
  * computes it, forcing downstream operators to reference the RESULT
  * attribute instead of a re-inlined copy of the expression tree.
  *
  * Why it exists: Catalyst's alias substitution has no cost model for
  * higher-order-function lambdas. `PushPredicateThroughNonJoin` pushing a
  * filter through `Project [toks(text) AS tk] → Project [ngrams(tk) AS ghs]`
  * rewrites the filter condition with the WHOLE chain inlined — and a token
  * array referenced inside the n-gram lambda then re-evaluates PER GRAM
  * POSITION (no CSE inside lambdas): measured 17× on c06 at sf1.0, where the
  * scan-side Bloom probe filter re-tokenized every document ~90 times.
  * `CollapseProject` declines such inlining (multi-reference, non-cheap);
  * predicate pushdown substitutes unconditionally.
  *
  * Mechanism: the expression reports `deterministic = false`, which both
  * rules treat as "do not copy / do not push through" — the standard
  * cost-barrier trick. The child IS pure; the flag is a placement constraint,
  * not a semantics claim. Costs: a filter on a pinned column no longer pushes
  * into the scan (here that is the point — the probe must run where its
  * operand is materialized), and the pinned alias cannot appear in GROUP BY
  * keys (nondeterministic-expression analysis rule) — use it on carrier
  * columns (gram arrays, signatures), not grouping keys.
  *
  * Codegen: delegates to the child — stays inside WholeStageCodegen. */
case class Materialize(child: Expression) extends UnaryExpression {

  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "materialize"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ExprCode(c.code, c.isNull, c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Materialize {
  import org.apache.spark.sql.classic.GraftColumnBridge.{column => toCol}
  import org.apache.spark.sql.classic.ExpressionColumnHelper.expr

  /** Pin `c` to its own Project: downstream filters/projections reference the
    * computed attribute instead of re-inlining (and re-evaluating) the
    * expression tree. Use for expensive HOF-built carrier columns consumed by
    * a filter (gram arrays probed by Bloom/intersect). */
  def materialized(c: Column): Column = toCol(Materialize(expr(c)))
}
