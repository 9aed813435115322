package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-style non-fatal write warnings, byte-exact with
  * CSVWriter.get_warnings (rbql_csv.py:309-315):
  *   'None values in output were replaced by empty strings'
  *   'Some output fields contain separator'
  * The separator warning only applies to unquoted output policies
  * (simple/whitespace/monocolumn) — quoted policies escape the delimiter,
  * so the reference never flags it there (check_separators_in_fields_
  * before_join is installed only for the simple join, rbql_csv.py:159-171).
  * Computed in ONE aggregate pass over the result (no per-row driver
  * work); call before/with a sink write. */
object Warnings {

  def scan(df0: DataFrame, delim: String = ",",
      policy: String = "simple"): Seq[String] = {
    // variable-arity results (hidden per-record width column, headerless
    // ragged star): scan the SLICED field arrays — nulls padded beyond the
    // record width are structural, not None values (the reference scans
    // the true fields list)
    if (df0.columns.contains(graft.engine.PlanBuilder.OwidCol) ||
        df0.columns.toSeq == Seq(graft.engine.ExprTranslator.FieldsCol))
      return scanRagged(df0, delim, policy)
    // position-based access: output headers may contain duplicate names
    val df = df0.toDF(df0.columns.indices.map(i => s"__graft_w$i"): _*)
    val unquotedPolicy =
      policy == "simple" || policy == "whitespace" || policy == "monocolumn"
    val strCols =
      if (unquotedPolicy && delim.nonEmpty)
        df.schema.fields.filter(_.dataType == StringType).map(_.name)
      else Array.empty[String]
    val nullChecks = df.schema.fieldNames.map(c =>
      sum(when(col(c).isNull, 1).otherwise(0)).alias(s"__n_$c"))
    val delimChecks = strCols.map(c =>
      sum(when(col(c).contains(delim), 1).otherwise(0)).alias(s"__d_$c"))
    if (nullChecks.isEmpty) return Seq.empty
    val row = df.agg(nullChecks.head, (nullChecks.tail ++ delimChecks).toIndexedSeq: _*).head()
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    val nNull = df.schema.fieldNames.indices
      .map(i => if (row.isNullAt(i)) 0L else row.getLong(i)).sum
    if (nNull > 0)
      buf += "None values in output were replaced by empty strings"
    val offset = df.schema.fieldNames.length
    val nDelim = strCols.indices
      .map(i => if (row.isNullAt(offset + i)) 0L else row.getLong(offset + i)).sum
    if (nDelim > 0)
      buf += "Some output fields contain separator"
    buf.toSeq
  }

  private def scanRagged(df0: DataFrame, delim: String,
      policy: String): Seq[String] = {
    val unquotedPolicy =
      policy == "simple" || policy == "whitespace" || policy == "monocolumn"
    val arr = Sinks.raggedFields(df0)
    val nullCount = sum(size(filter(col("__fields"), e => e.isNull)))
    val delimCount =
      if (unquotedPolicy && delim.nonEmpty)
        sum(size(filter(col("__fields"),
          e => coalesce(e, lit("")).contains(delim))))
      else sum(lit(0))
    val row = arr.agg(nullCount.alias("__n"), delimCount.alias("__d")).head()
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    if (!row.isNullAt(0) && row.getLong(0) > 0)
      buf += "None values in output were replaced by empty strings"
    if (!row.isNullAt(1) && row.getLong(1) > 0)
      buf += "Some output fields contain separator"
    buf.toSeq
  }
}
