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

  /** aggregate name → spark SQL function template ({0} = translated arg).
    * array_agg / any_value are NR-order-pinned and built in toColumn. */
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
    "median" -> "percentile({0}, 0.5)")

  val Names: Set[String] = SparkFn.keySet ++ Set("array_agg", "any_value")

  /** Aggregates whose result order/value depends on record order (NR):
    * ARRAY_AGG collects in insertion order, ANY_VALUE keeps the first-seen
    * value (reference rbql_engine.py:317-325, 446-458). Their presence
    * forces NR materialization so distributed plans stay deterministic. */
  val OrderSensitive: Set[String] = Set("array_agg", "any_value")

  private val AggCallRe: Regex =
    ("""(?i)(?<![A-Za-z0-9_.])(""" + Names.mkString("|") + """)\s*\(""").r

  /** One parsed aggregate call: function name, translated argument SQL,
    * and the optional ARRAY_AGG post-processing lambda (README.md:91-92,
    * rbql_engine.py:446-458 — `ARRAY_AGG(a1, v -> ...)` applies the
    * callback to the collected list per group). */
  final case class AggCall(fname: String, argSql: String, callback: Option[String])

  final case class Item(
      raw: String, // masked original
      /** None = plain (group-constant) expression */
      agg: Option[AggCall])

  /** Aggregates that numeric-coerce string inputs (NumHandler,
    * rbql_engine.py:293-314). ANSI cast errors on non-numeric garbage —
    * matching the reference's error-on-bad-value semantics. */
  private val NumericCoercing = Set("sum", "avg", "mean", "variance", "median", "min", "max")

  /** sum/min/max of string inputs keep the reference's int-preservation
    * (NumHandler, rbql_engine.py:293-314): a group whose values all parse
    * as integers yields an integral result ("7", not "7.0"); any
    * float-looking value switches the group to float. Result is a string
    * (the reference's CSV-boundary observable); non-numeric garbage errors
    * either way, like the reference's numeric_conversion_error. */
  private val IntPreserving = Set("sum", "min", "max")

  private def stickyNumericSql(fn: String, arg: String): String = {
    val allInt = s"bool_and(($arg) IS NULL OR try_cast(($arg) AS BIGINT) IS NOT NULL)"
    s"CASE WHEN $allInt THEN cast($fn(try_cast(($arg) AS BIGINT)) AS STRING) " +
      s"ELSE cast($fn(cast(($arg) AS DOUBLE)) AS STRING) END"
  }

  /** SQL for the NR-order-pinned collect: per group, sort the collected
    * (NR, value) structs by NR, project the values back out. Struct
    * wrapping also preserves nulls (collect_list alone drops them;
    * the reference appends None like any other value). */
  private def orderedCollectSql(arg: String, nrCol: String): String =
    s"transform(array_sort(collect_list(struct(`$nrCol` AS o, ($arg) AS v))), s -> s.v)"

  /** Build the Spark aggregate Column; `argType` is the resolved input type
    * (None when resolution was skipped); `nrCol` is the materialized record
    * number column (always present when order-sensitive aggregates occur). */
  def toColumn(call: AggCall, argType: Option[org.apache.spark.sql.types.DataType],
      nrCol: String): org.apache.spark.sql.Column = {
    val isStr = argType.contains(org.apache.spark.sql.types.StringType)
    val sql = call.fname match {
      case "array_agg" =>
        val collected = orderedCollectSql(call.argSql, nrCol)
        call.callback match {
          // apply the unary lambda to the whole collected array:
          // transform over a 1-element wrapper binds the lambda var to the
          // array itself — works for any Spark HOF body, no text surgery
          case Some(cb) => s"transform(array($collected), $cb)[0]"
          case None => collected
        }
      case "any_value" => s"min_by((${call.argSql}), `$nrCol`)"
      case f if IntPreserving(f) && isStr => stickyNumericSql(f, call.argSql)
      case f =>
        val arg =
          if (NumericCoercing(f) && isStr) s"cast((${call.argSql}) as double)"
          else call.argSql
        SparkFn(f).replace("{0}", arg)
    }
    org.apache.spark.sql.functions.expr(sql)
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
        val fname = mm.group(1).toLowerCase(java.util.Locale.ROOT)
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
        val fname = m.group(1).toLowerCase(java.util.Locale.ROOT)
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
        val call =
          if (fname == "count" && (inner == "*" || inner.isEmpty))
            AggCall("count", "1", None)
          else if (fname == "array_agg") {
            ClauseParser.splitTopLevel(inner, ',') match {
              case Seq(one) => AggCall(fname, translate(one), None)
              case Seq(value, cb) if cb.contains("->") =>
                AggCall(fname, translate(value), Some(translate(cb)))
              case _ => Errors.parsing(
                s"ARRAY_AGG takes one expression plus an optional lambda (e.g. ARRAY_AGG(a1, v -> slice(v, 1, 5))): '$rawItem'")
            }
          } else AggCall(fname, translate(inner), None)
        Item(item, Some(call))
    }
  }

  /** True if the masked stage text contains any aggregate call at all
    * (used for the aggregate-in-WHERE guard). */
  def containsAggCall(text: String): Boolean =
    AggCallRe.findFirstMatchIn(rewritePolymorphic(text)).isDefined
}
