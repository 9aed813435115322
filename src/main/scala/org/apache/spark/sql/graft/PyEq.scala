package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions.{BinaryComparison, Cast, EqualNullSafe, EqualTo, Expression, Literal}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.StringType

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

  /** A `variant_get(...)` call — the translator's sugar for `a1['k']` JSON
    * access. Spark defines no ordering on VARIANT, so any comparison on the
    * raw call fails analysis; the reference's JSON model compares the
    * extracted host value (a dict lookup is a str/int/None). The variant
    * side is cast to the comparand's type (string for non-literals — the
    * dialect's tables are stringly anyway), matching that semantics. */
  private def isVariantGet(e: Expression): Boolean = e match {
    case f: UnresolvedFunction =>
      f.nameParts.last.equalsIgnoreCase("variant_get") && f.arguments.length == 2
    // strict-JSON-keys mode wraps the access in a CASE whose ELSE is the
    // variant_get (the WHEN branches raise the missing-key error) — the
    // value type is still the variant access, so compare the same way
    case cw: org.apache.spark.sql.catalyst.expressions.CaseWhen =>
      cw.elseValue.exists(isVariantGet)
    case _ => false
  }

  private def castVariant(v: Expression, other: Expression): Expression =
    other match {
      // a NULL literal has NullType — Cast(v, NullType) fails analysis,
      // and `a1['k'] == NULL` is exactly the None-comparison this module
      // exists for; compare through the string cast instead
      case lit: Literal if lit.value != null => Cast(v, lit.dataType)
      case _ => Cast(v, StringType)
    }

  private def coerceVariant(l: Expression, r: Expression): (Expression, Expression) =
    (isVariantGet(l), isVariantGet(r)) match {
      case (true, true) => (Cast(l, StringType), Cast(r, StringType))
      case (true, false) => (castVariant(l, r), r)
      case (false, true) => (l, castVariant(r, l))
      case _ => (l, r)
    }

  private def rewrite(e: Expression): Expression = e.transform {
    case cmp: BinaryComparison =>
      val (l, r) = coerceVariant(cmp.left, cmp.right)
      cmp.withNewChildren(Seq(l, r)) match {
        case EqualTo(a, b) => EqualNullSafe(a, b)
        case other => other
      }
  }

  def nullSafe(c: Column): Column =
    ExpressionUtils.column(rewrite(ExpressionUtils.expression(c)))

  /** Parse SQL text and apply the null-safe equality rewrite. */
  def expr(sql: String): Column =
    ExpressionUtils.column(rewrite(
      SparkSession.active.sessionState.sqlParser.parseExpression(sql)))
}
