package graft.engine

import scala.util.matching.Regex

/** Aggregate-call detection and mapping to Spark SQL aggregate functions.
  *
  * Reference semantics (/root/reference/rbql-py/rbql/rbql_engine.py):
  *  - 9 aggregate functions, case-insensitive (720-739)
  *  - aggregate calls cannot be nested inside expressions (46, 638-639) —
  *    `MAX(a1) / 1000` is an error, `MAX(a1 / 1000)` is fine
  *  - min/max are polymorphic: 2+ scalar args = plain scalar min/max
  *    (mad_max/mad_min, 902-939) → rewritten to least/greatest
  *  - COUNT(*) → COUNT(1) (replace_star_count, 1144-1145)
  */
object Aggregates {

  /** aggregate name → spark SQL function template ({0} = translated arg) */
  private val SparkFn: Map[String, String] = Map(
    "count" -> "count({0})",
    "sum" -> "sum({0})",
    "min" -> "min({0})",
    "max" -> "max({0})",
    "avg" -> "avg({0})",
    "mean" -> "avg({0})",
    // population variance E[x^2]-E[x]^2 (VarianceAggregator, 395-411)
    "variance" -> "var_pop({0})",
    // exact median; Spark's exact percentile matches mean-of-middle-two
    // (MedianAggregator, 414-432)
    "median" -> "percentile({0}, 0.5)",
    "array_agg" -> "collect_list({0})",
    "any_value" -> "first({0})")

  val Names: Set[String] = SparkFn.keySet

  private val AggCallRe: Regex =
    ("""(?i)(?<![A-Za-z0-9_.])(""" + Names.mkString("|") + """)\s*\(""").r

  final case class Item(
      raw: String, // masked original
      /** None = plain (group-constant) expression; Some = (aggregate
        * function name, translated argument SQL) */
      agg: Option[(String, String)])

  /** Aggregates that numeric-coerce string inputs (NumHandler,
    * rbql_engine.py:293-314). ANSI cast errors on non-numeric garbage —
    * matching the reference's error-on-bad-value semantics (ints come out
    * as doubles; the int-preserving sticky switch is intentionally not
    * replicated). */
  private val NumericCoercing = Set("sum", "avg", "mean", "variance", "median", "min", "max")

  /** Build the Spark aggregate Column; `argType` is the resolved input type
    * (None when resolution was skipped). */
  def toColumn(fname: String, argSql: String,
      argType: Option[org.apache.spark.sql.types.DataType]): org.apache.spark.sql.Column = {
    val arg =
      if (NumericCoercing(fname) &&
        argType.contains(org.apache.spark.sql.types.StringType))
        s"cast(($argSql) as double)"
      else argSql
    org.apache.spark.sql.functions.expr(SparkFn(fname).replace("{0}", arg))
  }

  /** Find the balanced-paren span starting at the '(' at `open`. Returns the
    * index just past the matching ')'. */
  private def closeParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) return i + 1 }
      i += 1
    }
    Errors.parsing(s"Unbalanced parentheses in expression: '$s'")
  }

  /** Rewrite multi-arg min(...)/max(...) to least/greatest (they are scalar
    * builtins in that arity, not aggregates). */
  def rewritePolymorphic(item: String): String = {
    val m = AggCallRe.findFirstMatchIn(item)
    m match {
      case Some(mm) =>
        val fname = mm.group(1).toLowerCase
        if (fname == "min" || fname == "max") {
          val open = mm.end - 1
          val end = closeParen(item, open)
          val args = ClauseParser.splitTopLevel(item.substring(open + 1, end - 1), ',')
          if (args.length > 1) {
            val repl = (if (fname == "min") "least" else "greatest") +
              "(" + args.mkString(",") + ")"
            return rewritePolymorphic(
              item.substring(0, mm.start) + repl + item.substring(end))
          }
        }
        // advance past this call's open paren to look for later calls
        val rest = rewritePolymorphic(item.substring(mm.end))
        item.substring(0, mm.end) + rest
      case None => item
    }
  }

  /** Classify one select item. `translate` maps masked expression text to
    * final Spark SQL. Errors on nested aggregates. */
  def classify(rawItem: String, translate: String => String): Item = {
    val item = rewritePolymorphic(rawItem.trim)
    AggCallRe.findFirstMatchIn(item) match {
      case None => Item(item, None)
      case Some(m) =>
        val fname = m.group(1).toLowerCase
        val open = m.end - 1
        val end = closeParen(item, open)
        val isWhole = item.substring(0, m.start).trim.isEmpty &&
          item.substring(end).trim.isEmpty
        if (!isWhole)
          Errors.parsing(
            s"Aggregate functions inside expressions are not allowed: '$rawItem'. " +
              "Put the expression inside the aggregate instead, e.g. MAX(x / 1000)")
        val inner = item.substring(open + 1, end - 1).trim
        if (AggCallRe.findFirstMatchIn(inner).isDefined)
          Errors.parsing(s"Aggregate functions cannot be nested: '$rawItem'")
        val arg =
          if (fname == "count" && (inner == "*" || inner.isEmpty)) "1"
          else translate(inner)
        Item(item, Some((fname, arg)))
    }
  }

  /** True if the masked stage text contains any aggregate call at all
    * (used for the aggregate-in-WHERE guard). */
  def containsAggCall(text: String): Boolean =
    AggCallRe.findFirstMatchIn(rewritePolymorphic(text)).isDefined
}
