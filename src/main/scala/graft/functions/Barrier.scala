package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that refuses to be inlined.
  *
  * `CollapseProject` freely substitutes a deterministic alias's defining
  * expression into every downstream reference — across a `Generate`
  * (explode) that turns "compute once per input row" into "recompute per
  * OUTPUT row". For `spanDedup` the inlined `split(text)` was re-run for
  * every 10-token span (plus twice more in an inferred join-key filter):
  * O(tokens × spans) per document — a 1M-token document took ~46 CPU-min
  * instead of milliseconds. Declaring the wrapper non-deterministic makes
  * the optimizer keep the defining Project in place (evaluate once, carry
  * the result), which is exactly the semantics of materialization.
  * Evaluation and codegen are pure pass-throughs.
  */
case class Materialize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object Barrier {
  /** Pin `c`'s result to the projection that computes it: downstream
    * operators (including Generates) reference the materialized column
    * instead of re-evaluating the expression per output row. Use on any
    * expensive array/string derivation that an explode fans out. */
  def materialized(c: Column): Column =
    GraftBridge.column(Materialize(GraftBridge.expression(c)))
}
