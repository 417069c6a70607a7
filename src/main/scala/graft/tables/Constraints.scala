package graft.tables

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType}

/** The in-plan enforcement expression behind persisted CHECK constraints
  * (Delta's `CheckDeltaInvariant` architecture): evaluates the constraint
  * predicate per row INSIDE the write's own pass — always `true` for a
  * passing row, THROWS for a violating or null-result row (CHECK
  * semantics: a row passes only when the predicate is TRUE). Wrapping the
  * staged frame in `filter(guard)` costs zero extra Spark actions — the
  * check rides the write job in whole-stage codegen — unlike a validate-
  * then-write pre-pass, which reads every batch twice. The expression is
  * opaque to the optimizer (not foldable, not a recognized comparison),
  * so constant-folding, filter elimination, and scan pushdown all leave
  * it in place.
  */
private[tables] final case class CheckConstraintGuard(
    child: Expression, name: String, sqlText: String) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def foldable: Boolean = false

  private def message: String =
    s"CHECK constraint $name ($sqlText) violated by a row in the write batch"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null || !v.asInstanceOf[Boolean])
      throw new IllegalStateException(message)
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val err = ctx.addReferenceObj("constraintErr", message, "java.lang.String")
    ev.copy(
      code = code"""
        ${c.code}
        if (${c.isNull} || !${c.value}) {
          throw new IllegalStateException($err);
        }
        final boolean ${ev.value} = true;""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CheckConstraintGuard =
    copy(child = newChild)
}
