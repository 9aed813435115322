package graft.engine

/** Clause-level AST for one pipe stage. Expressions stay as (masked) text —
  * they are translated to Spark Columns by ExprTranslator, never interpreted
  * by us. Mirrors the reference's RBQLContext of translated clause strings
  * (/root/reference/rbql-py/rbql/rbql_engine.py:76-103).
  */
final case class SelectItem(rawExpr: String, alias: Option[String])

final case class SelectSpec(
    topN: Option[Long],
    distinct: Boolean,
    distinctCount: Boolean,
    exceptCols: Option[Seq[String]], // SELECT EXCEPT c1, c2 (column exclusion)
    items: Seq[SelectItem])

/** UPDATE is projection-with-conditional-replacement, not mutation
  * (reference README.md:82-84). */
final case class UpdateSpec(assignments: Seq[(String, String)]) // varRef -> expr

final case class JoinSpec(
    kind: JoinKind,
    tableId: String,
    /** raw ON text: conjunctive equalities `a.x == b.y [AND ...]`
      * (reference parse_join_expression, rbql_engine.py:991-1013) */
    onRaw: String)

sealed trait JoinKind { def sparkName: String }
object JoinKind {
  case object Inner extends JoinKind { val sparkName = "inner" }
  case object Left extends JoinKind { val sparkName = "left_outer" }
  /** LEFT JOIN that errors unless every A row has exactly one B match
    * (reference StrictLeftJoiner, rbql_engine.py:595-603). */
  case object StrictLeft extends JoinKind { val sparkName = "left_outer" }
}

final case class OrderKey(expr: String, asc: Boolean)

final case class StageAst(
    select: Option[SelectSpec],
    update: Option[UpdateSpec],
    from: Option[String],
    join: Option[JoinSpec],
    where: Option[String],
    groupBy: Option[Seq[String]],
    orderBy: Option[Seq[OrderKey]],
    limit: Option[Long],
    withMods: Seq[String]) {

  def isAggregateCandidate: Boolean = groupBy.isDefined
}
