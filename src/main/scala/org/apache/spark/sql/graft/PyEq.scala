package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, Expression}
import org.apache.spark.sql.classic.ExpressionUtils

/** Python-semantics equality for the RBQL dialect.
  *
  * The reference evaluates `==`/`!=` as Python object comparison, where
  * `None == None` is True and `None != "x"` is True
  * (/root/reference/rbql-py/rbql/rbql_engine.py — expressions run as
  * host-language code). SQL's three-valued logic would instead yield NULL
  * and silently drop such rows in WHERE — observable on every LEFT JOIN
  * whose predicate touches an unmatched B column. So every user expression
  * is parsed and its EqualTo nodes rewritten to EqualNullSafe (`<=>`).
  * `!=` parses to Not(EqualTo(..)) and becomes Not(EqualNullSafe(..)) —
  * exactly Python's `!=` on None. Catalyst still extracts EqualNullSafe as
  * equi-join keys, so join planning (broadcast/SMJ) is unaffected.
  *
  * Note: `functions.expr` defers SQL parsing to analysis time (the Column
  * wraps the raw SQL string), so the rewrite must parse eagerly via the
  * session parser to see the expression tree.
  */
object PyEq {

  private def rewrite(e: Expression): Expression = e.transform {
    case EqualTo(l, r) => EqualNullSafe(l, r)
  }

  def nullSafe(c: Column): Column =
    ExpressionUtils.column(rewrite(ExpressionUtils.expression(c)))

  /** Parse SQL text and apply the null-safe equality rewrite. */
  def expr(sql: String): Column =
    ExpressionUtils.column(rewrite(
      SparkSession.active.sessionState.sqlParser.parseExpression(sql)))
}
