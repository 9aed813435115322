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

  /** Python-rendering of one column (reference normalize_fields =
    * `str(value)`, rbql_csv.py:258-277): doubles through the exact
    * Python float repr ([[PyFloat]] — Spark's cast writes `7.5E15`
    * where Python writes `7500000000000000.0`), booleans as
    * `True`/`False` (Spark casts to `true`/`false`). */
  private def pyStr(c: Column, dt: DataType): Column = dt match {
    case DoubleType =>
      org.apache.spark.sql.graft.csvtext.py_float_repr(c)
    case BooleanType =>
      // null must stay null here (NOT fall into the otherwise branch):
      // normalizeCol's coalesce renders it as '' and normalizeColNullable
      // keeps it structural, matching the reference's str(None) → warning
      // path rather than printing a phantom "False"
      when(c.isNull, lit(null).cast(StringType))
        .when(c, "True").otherwise("False")
    case _ => c.cast(StringType)
  }

  private def normalizeCol(c: Column, dt: DataType): Column = dt match {
    case ArrayType(inner, _) =>
      coalesce(array_join(transform(c, e => normalizeCol(e, inner)), "|"), lit(""))
    case StringType => coalesce(c, lit(""))
    case _ => coalesce(pyStr(c, dt), lit(""))
  }

  private val OwidCol = graft.engine.PlanBuilder.OwidCol
  private val FieldsColName = graft.engine.ExprTranslator.FieldsCol

  private def hasOwid(df: DataFrame): Boolean = df.columns.contains(OwidCol)

  /** Bare ragged result: a single fields-array column (the engine's
    * ragged projection for star/unpack output over a fields-model
    * table). Variable arity is the array length itself — no hidden
    * width column needed. */
  private def isBareFields(df: DataFrame): Boolean =
    df.columns.toSeq == Seq(FieldsColName)

  /** Like normalizeCol but PRESERVES null (for the ragged path, where a
    * null beyond the record width is structural, not a None value). */
  private def normalizeColNullable(c: Column, dt: DataType): Column = dt match {
    case ArrayType(inner, _) =>
      array_join(transform(c, e => normalizeCol(e, inner)), "|")
    case StringType => c
    case _ => pyStr(c, dt)
  }

  /** Variable-arity output rows (reference ragged model: a star over a
    * short record emits the record's TRUE field count, rbql_csv.py write —
    * fields list, not a padded fixed width): one `__fields` array column
    * per record, sliced to the hidden per-record width. Null elements
    * inside the slice are genuine None values; the padding beyond it is
    * gone. */
  private[sinks] def raggedFields(df: DataFrame): DataFrame = {
    // bare fields-array results ARE the record: elements are strings
    // (nulls inside are genuine None values — safe_get pads)
    if (isBareFields(df))
      return df.select(col(s"`$FieldsColName`").alias("__fields"))
    val names = df.columns.toSeq
    val uniq = names.indices.map(i => s"__graft_rg$i")
    val renamed = df.toDF(uniq: _*)
    val owidIdx = names.indexOf(OwidCol)
    val elems = names.indices.filter(_ != owidIdx).map(i =>
      normalizeColNullable(col(uniq(i)), df.schema.fields(i).dataType))
    renamed.select(slice(array(elems: _*), lit(1),
      col(uniq(owidIdx)).cast("int")).alias("__fields"))
  }

  /** Policy-aware field quoting as a codegen'd expression (csv_utils.py
    * quote_field vs rfc_quote_field: only the rfc variant quotes on
    * newlines). Unquoted policies pass fields through verbatim. */
  private def quoteExpr(c0: Column, delim: String, policy: String): Column =
    if (policy == "simple" || policy == "whitespace" || policy == "monocolumn")
      c0
    else {
      val needNl =
        if (policy == "quoted_rfc") c0.contains("\n") || c0.contains("\r")
        else lit(false)
      val need = c0.contains(delim) || c0.contains("\"") || needNl
      when(need,
        concat(lit("\""), replace(c0, lit("\""), lit("\"\"")), lit("\"")))
        .otherwise(c0)
    }

  /** Ragged lines DataFrame (single `value` column) for the variable-arity
    * write path. */
  private def raggedLines(df: DataFrame, delim: String, policy: String): DataFrame =
    raggedFields(df).select(
      array_join(transform(col("__fields"),
        e => quoteExpr(coalesce(e, lit("")), delim, policy)), delim)
        .alias("value"))

  /** Distributed CSV write: header row, delimiter + policy-matched
    * quoting. A headerless result carrying the hidden per-record width
    * column writes variable-arity rows (the reference's ragged star
    * model) via a text write of pre-quoted lines.
    *
    * Quoting is OURS, not univocity's: fields are pre-quoted with the
    * same codegen'd [[quoteExpr]] the stdout sink uses (the exact
    * quote_field / rfc_quote_field semantics), and Spark's writer runs
    * with its quote char disabled so it only joins fields with the
    * delimiter. Univocity's own policy quotes newline-containing fields
    * under the plain `quoted` policy where the reference's quote_field
    * does not, and its writer defaults additionally TRIM leading/
    * trailing whitespace — both made `--output` file bytes diverge from
    * the (exact) stdout sink (r12 advice). Header fields quote through
    * the same policy. Multi-part layout keeps Spark's convention
    * (header line per part file) so dir-reading stays unchanged. */
  def writeCsv(df0: DataFrame, path: String, delim: String = ",",
      header: Boolean = true, policy: String = "quoted"): Unit = {
    if (!header && (hasOwid(df0) || isBareFields(df0))) {
      raggedLines(df0, delim, policy).write.mode("overwrite").text(path)
      return
    }
    val df = if (hasOwid(df0)) df0.drop(OwidCol) else df0
    val norm = normalizeForCsv(df)
    val sep = if (policy == "monocolumn" && delim.isEmpty) "," else delim
    val names = norm.columns.toSeq
    val uniq = names.indices.map(i => s"__graft_w$i")
    val lines = norm.toDF(uniq: _*).select(
      array_join(array(uniq.map(u => quoteExpr(col(u), sep, policy)): _*),
        sep).alias("value"))
    val out = if (!header) lines else {
      // header line per PARTITION file — Spark's own CSV-writer dir
      // layout, which CsvSource.read's multi-file header-dropper expects.
      // EMPTY partitions skip it (Spark's csv writer leaves empty files
      // headerless too; a header-only part file reads as a phantom row to
      // naive line consumers) — except partition 0, so a fully-empty
      // result still carries its header.
      val hdrQ: String => String =
        if (policy == "simple" || policy == "whitespace" ||
          policy == "monocolumn") identity
        else quoteField(_, sep, quoteNewlines = policy == "quoted_rfc")
      val hdr = names.map(hdrQ).mkString(sep)
      import lines.sparkSession.implicits._
      lines.as[String].mapPartitions { it =>
        if (org.apache.spark.TaskContext.getPartitionId() == 0 || it.hasNext)
          Iterator(hdr) ++ it
        else Iterator.empty
      }.toDF("value")
    }
    out.write.mode("overwrite").text(path)
  }

  /** Marks a pre-rendered JSON number riding through to_json as a
    * string; stripped (with its quotes) afterwards. A DATA string could
    * in principle contain raw U+0001 (the writer escapes it to the same
    * 6-char `\\u0001` the strip regex matches), so while this path is
    * active string columns are pre-escaped U+0001 → U+0001 'E'
    * ([[escSentinel]]) and un-escaped on the rendered text after the
    * strip — a data string can then never produce the
    * `\\u0001G\\u0001` sequence. The payload shape is additionally
    * pinned to number tokens as defense in depth (variant-nested
    * strings, which the escape can't reach, would also have to render
    * as a number token). */
  private val NumSentinel = "\u0001G\u0001"
  private val NumSentinelRe =
    "\"\\\\u0001G\\\\u0001(NaN|-?Infinity|-?\\d+(?:\\.\\d+)?(?:e[+-]\\d+)?)\""

  /** Pre-escape of raw U+0001 in data strings while the number-sentinel
    * path is active (see the NumSentinel scaladoc). Undone by
    * [[unescSentinel]] on the rendered JSON text. Recursive over
    * array/map/struct shapes so a sentinel-shaped byte sequence inside a
    * nested string (or a map key) cannot be mistaken for a jsonNum
    * payload and have its quotes stripped (r15 advice: the old
    * top-level-only escape left map/struct string fields unprotected).
    * Variant stays out of reach (the engine renders it opaquely) and
    * remains covered by the number-token pin in NumSentinelRe. */
  private def hasStringLeaf(dt: DataType): Boolean = dt match {
    case StringType => true
    case ArrayType(et, _) => hasStringLeaf(et)
    case MapType(kt, vt, _) => hasStringLeaf(kt) || hasStringLeaf(vt)
    case st: StructType => st.fields.exists(f => hasStringLeaf(f.dataType))
    case _ => false
  }

  private def escSentinel(c: Column, dt: DataType): Column = dt match {
    case StringType => replace(c, lit("\u0001"), lit("\u0001E"))
    case ArrayType(et, _) if hasStringLeaf(et) =>
      transform(c, e => escSentinel(e, et))
    case MapType(kt, vt, _) if hasStringLeaf(kt) || hasStringLeaf(vt) =>
      val keyed =
        if (hasStringLeaf(kt)) transform_keys(c, (k, _) => escSentinel(k, kt))
        else c
      if (hasStringLeaf(vt))
        transform_values(keyed, (_, v) => escSentinel(v, vt))
      else keyed
    case st: StructType if st.fields.exists(f => hasStringLeaf(f.dataType)) =>
      // rebuild field-wise; a null struct must stay null (struct() of
      // escaped fields would render {} instead of null)
      when(c.isNull, lit(null).cast(st)).otherwise(
        struct(st.fields.map(f =>
          escSentinel(c.getField(f.name), f.dataType).alias(f.name))
          .toIndexedSeq: _*))
    case _ => c
  }

  private def unescSentinel(j: Column): Column =
    regexp_replace(j, "\\\\u0001E", "\\\\u0001")

  /** Python json.dumps float rendering: repr digits ([[PyFloat]]), and
    * the non-standard NaN / Infinity / -Infinity tokens for specials
    * (json.dumps default allow_nan, rbql_json.py writes through it). */
  private def jsonNum(c: Column): Column =
    when(isnan(c), lit(NumSentinel + "NaN"))
      .when(c === lit(Double.PositiveInfinity), lit(NumSentinel + "Infinity"))
      .when(c === lit(Double.NegativeInfinity), lit(NumSentinel + "-Infinity"))
      .otherwise(concat(lit(NumSentinel),
        org.apache.spark.sql.graft.csvtext.py_float_repr(c)))

  /** Doubles re-rendered for json.dumps parity: the sentinel makes
    * to_json emit them as strings, and the writer strips the quotes
    * back off — `7500000000000000.0` instead of Jackson's `7.5E15`
    * (byte parity; both parse to the same double). Scalar doubles and
    * arrays of doubles; deeper nesting (variant passthrough) keeps the
    * engine rendering. */
  private[sinks] def needsPyNum(df: DataFrame): Boolean =
    df.schema.fields.exists(f => f.dataType == DoubleType ||
      f.dataType == ArrayType(DoubleType, true) ||
      f.dataType == ArrayType(DoubleType, false))

  private def pyJsonCols(df: DataFrame): DataFrame = {
    if (!needsPyNum(df)) return df
    val names = df.columns.toSeq
    val uniq = names.indices.map(i => s"__graft_j$i")
    df.toDF(uniq: _*).select(df.schema.fields.zipWithIndex.map {
      case (f, i) =>
        val c = col(uniq(i))
        (f.dataType match {
          case DoubleType => jsonNum(c)
          case ArrayType(DoubleType, _) => transform(c, e => jsonNum(e))
          case other => escSentinel(c, other)
        }).alias(uniq(i))
    }.toIndexedSeq: _*).toDF(names: _*)
  }

  private def stripNumSentinels(j: Column): Column =
    regexp_replace(j, NumSentinelRe, "$1")

  /** One JSON text line per record, with the reference's single-column
    * unwrap rule: one output column → bare value per line; N columns →
    * object keyed by the output header, nulls kept (the reference's
    * json.dumps writes null values, rbql_json.py:17-70). */
  private def jsonLinesDf(df0: DataFrame): DataFrame = {
    // the strip + unescape pair runs ONLY when pyJsonCols was active:
    // unescaping without the matching pre-escape would corrupt genuine
    // data occurrences of U+0001 followed by 'E'
    val post: Column => Column =
      if (needsPyNum(df0)) j => unescSentinel(stripNumSentinels(j))
      else identity
    val df = pyJsonCols(df0)
    if (df.schema.length == 1) {
      df.select(to_json(struct(df.columns.map(c => col(s"`$c`")).toIndexedSeq: _*),
        java.util.Map.of("ignoreNullFields", "false")).alias("j"))
        .select(
          // strip the single-key object wrapper → bare value per line
          post(expr(
            s"substring(j, ${df.columns.head.length + 5}, length(j) - ${df.columns.head.length + 5})"))
            .alias("value"))
    } else {
      df.select(post(
        to_json(struct(df.columns.map(c => col(s"`$c`")).toIndexedSeq: _*),
          java.util.Map.of("ignoreNullFields", "false"))).alias("value"))
    }
  }

  /** JSON-lines write (distributed). */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    jsonLinesDf(df).write.mode("overwrite").text(path)

  /** Driver-side collect of JSON lines (stdout CLI sink). */
  def collectJsonLines(df: DataFrame): Seq[String] =
    jsonLinesDf(df).collect().toSeq.map(_.getString(0))

  /** Driver-side collect for stdout-style output (the reference's default
    * CLI sink); only for interactive / small results. A headerless result
    * carrying the hidden width column collects variable-arity lines. */
  def collectCsvLines(df0: DataFrame, delim: String = ",",
      header: Boolean = true, policy: String = "quoted"): Seq[String] = {
    if (!header && (hasOwid(df0) || isBareFields(df0)))
      return raggedLines(df0, delim, policy).collect().toSeq.map(_.getString(0))
    val df = if (hasOwid(df0)) df0.drop(OwidCol) else df0
    val norm = normalizeForCsv(df)
    val q: String => String =
      if (policy == "simple" || policy == "whitespace" || policy == "monocolumn")
        identity
      else quoteField(_, delim, quoteNewlines = policy == "quoted_rfc")
    val rows = norm.collect().map(_.toSeq.map(v => q(String.valueOf(v)))
      .mkString(delim))
    if (header) norm.columns.map(q).mkString(delim) +: rows.toSeq
    else rows.toSeq
  }

  /** quote_field semantics (csv_utils.py:93-107): quote when the field
    * contains the delimiter or a quote; ONLY the rfc variant
    * (rfc_quote_field, used by the quoted_rfc policy) also quotes on
    * newlines — the plain quoted writer emits them raw, structure be
    * damned, and graft matches (CSV differential fuzz pinned it). */
  def quoteField(s: String, delim: String, quoteNewlines: Boolean = true): String =
    if (s.contains(delim) || s.contains("\"") ||
        (quoteNewlines && (s.contains("\n") || s.contains("\r"))))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s
}
