package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.internal

/** Narrow bridge into `private[sql]` surface: wrap a raw Catalyst
  * `Expression` as a public `Column` (Spark 4 moved the Expression-backed
  * Column constructor behind the `classic` converters). This is the single
  * place the engine touches non-public Spark API.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGERLY convert a composed Column tree to a Catalyst `Expression` —
    * what classic `Dataset.select` does internally. `expression(c)` wraps
    * the node lazily (`ColumnNodeExpression`), which only resolves through
    * Dataset API entry points; an expression returned from a
    * `FunctionRegistry` builder never passes through them, so SQL-surface
    * registration of Column-combinators needs the eager form. */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
  /** Flatten a predicate Column into conjunct atoms for data skipping.
    *
    * Walks the Spark-4 `ColumnNode` tree the DataFrame API builds
    * (`col("x") > 5` is `UnresolvedFunction(">", attr, literal)`; the
    * catalyst comparison classes only exist after analysis, which never
    * runs for a predicate inspected driver-side). `ColumnNode` is
    * `private[sql]`, hence this lives in the bridge. Unrecognized shapes
    * come back as [[graft.tables.PredOpaque]] — the consumer treats them
    * as un-prunable, so this conversion can never cause wrong skipping. */
  def conjuncts(c: Column): Seq[graft.tables.PredAtom] = splitAnd(c.node)

  private def splitAnd(n: internal.ColumnNode): Seq[graft.tables.PredAtom] = n match {
    case f: internal.UnresolvedFunction if f.functionName == "and" =>
      f.arguments.flatMap(splitAnd)
    // startswith desugars to its range atoms (see PrefixBounds)
    case f: internal.UnresolvedFunction
        if f.functionName.equalsIgnoreCase("startswith") && f.arguments.length == 2 =>
      (attrName(f.arguments(0)), litValue(f.arguments(1))) match {
        case (Some(name), Some(p: String)) if p.nonEmpty =>
          graft.tables.PredCmp(">=", name, p) +:
            graft.tables.PrefixBounds.upper(p)
              .map(graft.tables.PredCmp("<", name, _)).toSeq
        case _ => Seq(graft.tables.PredOpaque)
      }
    case other => Seq(atom(other))
  }

  private def attrName(n: internal.ColumnNode): Option[String] = n match {
    case a: internal.UnresolvedAttribute => Some(a.nameParts.mkString("."))
    case _                               => None
  }

  private def litValue(n: internal.ColumnNode): Option[Any] = n match {
    case l: internal.Literal => Some(l.value)
    case _                   => None
  }

  private val Flip = Map(">" -> "<", ">=" -> "<=", "<" -> ">", "<=" -> ">=", "=" -> "=")

  private def atom(n: internal.ColumnNode): graft.tables.PredAtom = n match {
    case f: internal.UnresolvedFunction =>
      (normalizeOp(f.functionName), f.arguments) match {
        case (Some(op), Seq(a, b)) =>
          (attrName(a), litValue(b), attrName(b), litValue(a)) match {
            case (Some(name), Some(v), _, _) => graft.tables.PredCmp(op, name, v)
            case (_, _, Some(name), Some(v)) => graft.tables.PredCmp(Flip(op), name, v)
            case _                           => graft.tables.PredOpaque
          }
        case (None, args) if f.functionName == "in" && args.length >= 2 =>
          // Column.isin builds fn("in", attr, lit, lit, ...); any
          // non-literal element (e.g. a column) makes the atom opaque
          (attrName(args.head), args.tail.map(litValue)) match {
            case (Some(name), vs) if vs.forall(_.isDefined) =>
              graft.tables.PredIn(name, vs.map(_.get))
            case _ => graft.tables.PredOpaque
          }
        case (None, Seq(a)) if f.functionName == "isNull" =>
          attrName(a).map(graft.tables.PredNull(_, isNull = true))
            .getOrElse(graft.tables.PredOpaque)
        case (None, Seq(a)) if f.functionName == "isNotNull" =>
          attrName(a).map(graft.tables.PredNull(_, isNull = false))
            .getOrElse(graft.tables.PredOpaque)
        case _ => graft.tables.PredOpaque
      }
    case _ => graft.tables.PredOpaque
  }

  private def normalizeOp(fn: String): Option[String] = fn match {
    case ">" | ">=" | "<" | "<=" | "=" => Some(fn)
    case "=="                          => Some("=")
    case _                             => None
  }
}
