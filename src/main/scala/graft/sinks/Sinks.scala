package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Output writers with the reference's normalization semantics
  * (/root/reference/rbql-py/rbql/rbql_csv.py:146-315 CSVWriter,
  * rbql_json.py:17-70 JsonWriter).
  */
object Sinks {

  /** CSV output normalization (rbql_csv.py:258-277): numbers/bools → text,
    * null → '' (reference emits a warning), arrays → '|'-joined
    * recursively. */
  def normalizeForCsv(df: DataFrame): DataFrame = {
    // position-based: output headers may legally contain duplicates (e.g.
    // `select *` over a headerless join — both sides named a1..aN), so
    // rename to unique internals, transform, and restore the names
    val names = df.columns.toSeq
    val uniq = names.indices.map(i => s"__graft_sink_c$i")
    val renamed = df.toDF(uniq: _*)
    val cols = renamed.schema.fields.zipWithIndex.map { case (f, i) =>
      normalizeCol(col(f.name), f.dataType).alias(uniq(i))
    }
    renamed.select(cols.toIndexedSeq: _*).toDF(names: _*)
  }

  private def normalizeCol(c: Column, dt: DataType): Column = dt match {
    case ArrayType(inner, _) =>
      coalesce(array_join(transform(c, e => normalizeCol(e, inner)), "|"), lit(""))
    case StringType => coalesce(c, lit(""))
    case _ => coalesce(c.cast(StringType), lit(""))
  }

  /** Distributed CSV write: header row, delimiter + policy-matched quoting
    * via Spark's writer (univocity quotes only when needed — matching the
    * reference's quote_field). `simple` policy writes raw fields without
    * quoting, like the reference's simple writer (fields containing the
    * delimiter surface through Warnings.scan). */
  def writeCsv(df: DataFrame, path: String, delim: String = ",",
      header: Boolean = true, policy: String = "quoted"): Unit = {
    var w = normalizeForCsv(df).write
      .option("sep", if (policy == "monocolumn" && delim.isEmpty) "," else delim)
      .option("header", header)
      .option("quoteAll", value = false)
      // RFC-4180 doubled-quote escaping (Spark's default is backslash)
      .option("escape", "\"")
      .option("emptyValue", "")
    if (policy == "simple" || policy == "whitespace" || policy == "monocolumn")
      w = w.option("quote", "")
    w.mode("overwrite").csv(path)
  }

  /** One JSON text line per record, with the reference's single-column
    * unwrap rule: one output column → bare value per line; N columns →
    * object keyed by the output header, nulls kept (the reference's
    * json.dumps writes null values, rbql_json.py:17-70). */
  private def jsonLinesDf(df: DataFrame): DataFrame =
    if (df.schema.length == 1) {
      df.select(to_json(struct(df.columns.map(c => col(s"`$c`")).toIndexedSeq: _*),
        java.util.Map.of("ignoreNullFields", "false")).alias("j"))
        .select(
          // strip the single-key object wrapper → bare value per line
          expr(s"substring(j, ${df.columns.head.length + 5}, length(j) - ${df.columns.head.length + 5})")
            .alias("value"))
    } else {
      df.select(to_json(struct(df.columns.map(c => col(s"`$c`")).toIndexedSeq: _*),
        java.util.Map.of("ignoreNullFields", "false")).alias("value"))
    }

  /** JSON-lines write (distributed). */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    jsonLinesDf(df).write.mode("overwrite").text(path)

  /** Driver-side collect of JSON lines (stdout CLI sink). */
  def collectJsonLines(df: DataFrame): Seq[String] =
    jsonLinesDf(df).collect().toSeq.map(_.getString(0))

  /** Driver-side collect for stdout-style output (the reference's default
    * CLI sink); only for interactive / small results. */
  def collectCsvLines(df: DataFrame, delim: String = ",",
      header: Boolean = true, policy: String = "quoted"): Seq[String] = {
    val norm = normalizeForCsv(df)
    val q: String => String =
      if (policy == "simple" || policy == "whitespace" || policy == "monocolumn")
        identity
      else quoteField(_, delim)
    val rows = norm.collect().map(_.toSeq.map(v => q(String.valueOf(v)))
      .mkString(delim))
    if (header) norm.columns.map(q).mkString(delim) +: rows.toSeq
    else rows.toSeq
  }

  /** quote_field semantics (csv_utils.py:93-107): quote only when the field
    * contains the delimiter, a quote, or a newline. */
  def quoteField(s: String, delim: String): String =
    if (s.contains(delim) || s.contains("\"") || s.contains("\n") || s.contains("\r"))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s
}
