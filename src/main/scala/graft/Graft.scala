package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine._

/** Public entry points — the Spark-native analog of the reference's exported
  * API surface (/root/reference/rbql-py/rbql/__init__.py:1-11: query,
  * query_table, query_csv, query_pandas_dataframe).
  *
  * Dialect: RBQL clause grammar (SELECT/UPDATE/WHERE/GROUP BY/ORDER BY/
  * LIMIT/TOP/DISTINCT [COUNT]/EXCEPT/JOINs/UNNEST, pipe chaining) with
  * Spark SQL as the expression language — the Scala-native counterpart of
  * RBQL embedding Python/JS expressions (SURVEY §7.1). Everything codegens;
  * no per-row interpreter.
  */
object Graft {

  /** Run a query against an input DataFrame (the `A` table). `tables`
    * resolves FROM/JOIN table ids; ids not found there are treated as file
    * paths (parquet/csv/jsonl by extension) or temp-view names. */
  /** `ordered = true` (the RBQL-parity surfaces: queryTable/queryCsv/CLI)
    * additionally pins the reference's sequential output order — input
    * order, A-then-B-insertion order for joins, stable sorts, first-seen
    * DISTINCT. The DataFrame surface defaults to `ordered = false`: same
    * rows, order unspecified unless ORDER BY — at 100 TB an implicit global
    * order pin would serialize every query on a single sort. */
  def query(
      spark: SparkSession,
      queryStr: String,
      input: DataFrame,
      tables: Map[String, DataFrame] = Map.empty,
      tableFallback: String => Option[DataFrame] = _ => None,
      ordered: Boolean = false): DataFrame =
    // the hidden structural-width column is CLI-internal (write-side width
    // check); the library surface returns only user-visible columns
    queryImpl(spark, queryStr, input, tables, tableFallback, ordered)
      .drop(PlanBuilder.OwidCol)

  /** Like query but keeps the hidden structural-width column on the final
    * stage (CLI write-side width check, reference rbql_csv.py:208-210). */
  private[graft] def queryImpl(
      spark: SparkSession,
      queryStr: String,
      input: DataFrame,
      tables: Map[String, DataFrame] = Map.empty,
      tableFallback: String => Option[DataFrame] = _ => None,
      ordered: Boolean = false): DataFrame = {
    val masked = Lexer.mask(Lexer.cleanup(queryStr))
    val stages = Lexer.splitStages(masked.text)
    // pipe chaining: each stage's output is the next stage's input
    // (reference split_query_to_stages + TablePipe,
    // rbql_engine.py:1577-1602); Spark chains lazily — no materialization
    stages.zipWithIndex.foldLeft(input) { case (df, (stageText, i)) =>
      // the hidden structural-width column is a sink-side channel of the
      // FINAL stage only — an intermediate stage must not see it as data
      val in = if (i > 0) df.drop(PlanBuilder.OwidCol) else df
      PlanBuilder.build(spark, stageText, masked, in,
        resolveTable(spark, tables, tableFallback), ordered)
    }
  }

  /** FROM-first form: the query must name its input via FROM. */
  def query(spark: SparkSession, queryStr: String,
      tables: Map[String, DataFrame]): DataFrame = {
    val masked = Lexer.mask(Lexer.cleanup(queryStr))
    val stages = Lexer.splitStages(masked.text)
    val first = PlanBuilder.build(spark, stages.head, masked,
      errorNoInput(spark), resolveTable(spark, tables))
    stages.tail.foldLeft(first) { (df, stageText) =>
      PlanBuilder.build(spark, stageText, masked, df,
        resolveTable(spark, tables))
    }
  }

  private def errorNoInput(spark: SparkSession): DataFrame = {
    // placeholder that fails only if actually used without FROM
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("__graft_no_input", StringType))))
  }

  /** Resolve a FROM/JOIN table id: registered DataFrame > caller-provided
    * fallback (e.g. CSV dialect-aware / registry-aware resolution) > file
    * path by extension > Spark temp view. (reference table registry,
    * rbql_engine.py:1634-1644 + rbql_csv.py:508-540) */
  private def resolveTable(
      spark: SparkSession,
      tables: Map[String, DataFrame],
      fallback: String => Option[DataFrame] = _ => None)(id: String): DataFrame = {
    val key = id.trim
    tables.get(key)
      .orElse(tables.find(_._1.equalsIgnoreCase(key)).map(_._2))
      .orElse(fallback(key))
      .getOrElse {
        val lower = key.toLowerCase(java.util.Locale.ROOT)
        if (lower.endsWith(".parquet")) spark.read.parquet(key)
        else if (lower.endsWith(".csv")) sources.CsvSource.read(spark, key)
        else if (lower.endsWith(".tsv")) sources.CsvSource.read(spark, key, delim = "\t")
        else if (lower.endsWith(".jsonl") || lower.endsWith(".ndjson"))
          sources.JsonLinesSource.read(spark, key)
        else
          try spark.table(key)
          catch {
            case _: Exception =>
              Errors.io(s"Unable to find table: '$key' (not a registered table, file path, or temp view)")
          }
      }
  }

  /** JOIN-table path resolution for file-backed queries (reference
    * find_table_path, rbql_csv.py:101-115): literal path (with ~ expansion)
    * > main-table-relative path > the `~/.graft_table_names` index — a
    * tab-separated `name<TAB>path` file, the analog of the reference's
    * `~/.rbql_table_names`. Override the index location with the
    * GRAFT_TABLE_NAMES environment variable. */
  def findTablePath(mainTablePath: Option[String], tableId: String): Option[String] = {
    val home = System.getProperty("user.home")
    def expand(p: String): String =
      if (p.startsWith("~")) home + p.substring(1) else p
    val literal = new java.io.File(expand(tableId))
    if (literal.exists()) return Some(literal.getPath)
    if (!literal.isAbsolute) {
      mainTablePath.flatMap(m => Option(new java.io.File(m).getParentFile))
        .map(dir => new java.io.File(dir, tableId))
        .filter(_.exists())
        .foreach(f => return Some(f.getPath))
    }
    val indexPath = sys.props.get("graft.table.names")
      .orElse(sys.env.get("GRAFT_TABLE_NAMES"))
      .getOrElse(s"$home/.graft_table_names")
    try {
      scala.io.Source.fromFile(indexPath).getLines()
        .map(_.stripLineEnd.split('\t'))
        .collectFirst { case rec if rec.length > 1 && rec(0) == tableId => rec(1) }
        .filter(p => new java.io.File(expand(p)).exists())
        .map(expand)
    } catch { case _: Exception => None }
  }

  /** CSV entry point (reference query_csv, rbql_csv.py:543-580): loads the
    * input with the given dialect, honoring a WITH (header)/(noheader)
    * modifier in the query over the `hasHeader` default, runs the query,
    * and returns the result (write it with graft.sinks.Sinks). */
  def queryCsv(
      spark: SparkSession,
      queryStr: String,
      path: String,
      delim: String = ",",
      policy: String = "quoted",
      hasHeader: Boolean = false,
      encoding: String = "UTF-8",
      commentPrefix: Option[String] = None,
      tables: Map[String, DataFrame] = Map.empty,
      stripWhitespaces: Boolean = false,
      commentRegex: Option[String] = None,
      /** invoked with each JOIN-table file path resolved through the
        * registry (reference FileSystemCSVRegistry warns per join file,
        * rbql_csv.py:552-557) */
      onJoinFileRead: String => Unit = _ => ()): DataFrame =
    // the hidden structural-width column is CLI-internal: the library
    // surface returns only user-visible output columns (and keeps the
    // projected fixed-width shape — allowRaggedFast=false)
    queryCsvImpl(spark, queryStr, path, delim, policy, hasHeader, encoding,
      commentPrefix, tables, stripWhitespaces, commentRegex, onJoinFileRead,
      allowRaggedFast = false)
      .drop(engine.PlanBuilder.OwidCol)

  /** Like queryCsv but keeps the hidden per-record structural-width column
    * (when a star over a CSV table produced one) for the CLI's write-side
    * width check (reference rbql_csv.py:208-210). */
  private[graft] def queryCsvImpl(
      spark: SparkSession,
      queryStr: String,
      path: String,
      delim: String = ",",
      policy: String = "quoted",
      hasHeader: Boolean = false,
      encoding: String = "UTF-8",
      commentPrefix: Option[String] = None,
      tables: Map[String, DataFrame] = Map.empty,
      stripWhitespaces: Boolean = false,
      commentRegex: Option[String] = None,
      onJoinFileRead: String => Unit = _ => (),
      /** CLI surface only: headerless positional-only queries read via
        * the single-scan RAGGED fields model (no width-inference pass;
        * variable-arity star output rides to the sinks as the bare
        * fields column). The library wrapper [[queryCsv]] keeps the
        * projected fixed-width result shape its callers expect. */
      allowRaggedFast: Boolean = true): DataFrame = {
    // invalid delim/policy/encoding combinations are rejected up front
    // with the reference's messages (rbql_csv.py:551-560)
    sources.CsvSource.validateDialect(delim, policy, encoding, queryStr)
    val masked = Lexer.mask(Lexer.cleanup(queryStr))
    val stages = Lexer.splitStages(masked.text)
    val mods = ClauseParser.parse(masked.copy(text = stages.head)).withMods
    val header =
      if (mods.contains("header")) true
      else if (mods.contains("noheader")) false
      else hasHeader
    // query-derived width: when stage 1 provably touches the input only
    // through literal positional vars, the reader projects just that many
    // columns and SKIPS the width-inference scan — one full pass saved on
    // the hot simple-query path (engine.QueryWidth documents why this is
    // output-identical and which constructs disable it)
    val qw = engine.QueryWidth.inputWidthHint(masked)
    val raggedFast = allowRaggedFast && !header &&
      Set("quoted", "simple", "whitespace")(policy) &&
      engine.QueryWidth.raggedEligible(masked)
    val input =
      if (raggedFast)
        sources.CsvSource.readRaggedPolicy(spark, path, delim, policy,
          encoding, commentPrefix, stripWhitespaces, commentRegex)
      else sources.CsvSource.read(spark, path, delim, policy, header,
        encoding, commentPrefix, stripWhitespaces, commentRegex,
        queryWidth = qw)
    // JOIN tables resolve like the reference's FileSystemCSVRegistry
    // (rbql_csv.py:508-540): same dialect as the input, paths relative to
    // the input file, name aliases from the table-names index
    val fallback: String => Option[DataFrame] = id =>
      findTablePath(Some(path), id).map { p =>
        onJoinFileRead(p)
        sources.CsvSource.read(spark, p, delim, policy, header,
          encoding, commentPrefix, stripWhitespaces, commentRegex)
      }
    queryImpl(spark, queryStr, input, tables, fallback, ordered = true)
  }

  /** Ragged-model CSV entry point: records are variable-length fields
    * arrays, NF is per-record, reads past a row's end are null (the
    * reference's faithful data model for inconsistent-width input —
    * SURVEY §1.1/§7.4). Positional addressing only. */
  def queryRaggedCsv(
      spark: SparkSession,
      queryStr: String,
      path: String,
      delim: String = ",",
      tables: Map[String, DataFrame] = Map.empty): DataFrame =
    query(spark, queryStr, sources.CsvSource.readRagged(spark, path, delim),
      tables, ordered = true)

  /** JSON-lines entry point: whole object lands in a single VARIANT column
    * a1 (reference rbql_json.py:73-156); access nested fields with
    * variant_get(a1, '$.path', 'type'). */
  def queryJsonLines(spark: SparkSession, queryStr: String, path: String,
      tables: Map[String, DataFrame] = Map.empty): DataFrame =
    query(spark, queryStr, sources.JsonLinesSource.read(spark, path), tables,
      ordered = true)

  /** Error classification for front-ends (reference exception_to_error_info,
    * rbql_engine.py:950-975): (category, message). A GraftError raised
    * inside an executor task reaches the driver wrapped in a SparkException
    * — the cause chain is walked so the user sees the original category and
    * message, not Spark's stage-failure noise. */
  def exceptionToErrorInfo(e: Throwable): (String, String) = e match {
    case g: GraftError => (g.category, g.getMessage)
    case s: org.apache.spark.SparkException
        if unwrapGraftError(s).isDefined =>
      val g = unwrapGraftError(s).get
      (g.category, g.getMessage)
    case p: org.apache.spark.sql.catalyst.parser.ParseException =>
      ("query parsing", p.getMessage)
    case a: org.apache.spark.sql.AnalysisException
        if a.getCondition == "UNRESOLVED_ROUTINE" =>
      // a bare unknown function: the reference evaluates expressions
      // per record, so it surfaces as a Python NameError at record 1
      // ('query execution', probed live). Spark resolves at analysis
      // time; the one shape this mapping can't reproduce is an unknown
      // function over an EMPTY input (reference: no error) or first
      // reached past record 1 via short-circuit — accepted corner.
      val fn = "`([^`]+)`".r.findFirstMatchIn(a.getMessage)
        .map(_.group(1)).getOrElse("?")
      ("query execution", s"At record 1, Details: name '$fn' is not defined")
    case a: org.apache.spark.sql.AnalysisException =>
      val cat =
        if (a.getMessage.contains("PATH_NOT_FOUND") ||
          a.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND")) "IO handling"
        else "query parsing"
      (cat, a.getMessage)
    case other
        if Option(other.getMessage)
          .exists(_.contains(sources.CsvSource.Utf8DecodeError)) =>
      // in-job raise_error from the UTF-8 decode guard (Spark wraps the
      // text in USER_RAISED_EXCEPTION) — reference category: IO handling
      ("IO handling", sources.CsvSource.Utf8DecodeError)
    case other =>
      val msg = Option(other.getMessage).getOrElse(other.toString)
      ("query execution", msg)
  }

  /** First GraftError in the cause chain (bounded walk — cause chains can
    * be cyclic). */
  private def unwrapGraftError(e: Throwable): Option[GraftError] = {
    var cur: Throwable = e.getCause
    var depth = 0
    while (cur != null && depth < 16) {
      cur match {
        case g: GraftError => return Some(g)
        case _ => cur = cur.getCause; depth += 1
      }
    }
    None
  }

  /** In-memory convenience: query a local Seq of rows (reference
    * query_table, rbql_engine.py:1747-1756). */
  def queryTable(
      spark: SparkSession,
      queryStr: String,
      rows: Seq[Seq[String]],
      columnNames: Option[Seq[String]] = None,
      joinRows: Option[(Seq[Seq[String]], Option[Seq[String]])] = None): Seq[Seq[Any]] = {
    // inputs persisted for NR's two-pass assignment are released after the
    // collect — queryTableDf alone returns a lazy plan, so its callers own
    // that lifecycle themselves
    val (df, persisted) = PlanBuilder.trackPersists {
      queryTableDf(spark, queryStr, rows, columnNames, joinRows)
    }
    try spreadRagged(df)
    finally persisted.foreach(_.unpersist(false))
  }

  /** Collect, spreading ragged output (single `__graft_fields` array column,
    * produced by the `*expr` unpack operator) into per-record field lists —
    * the reference's output records are plain Python lists of the spread
    * values (translate_select_expression star-unpacking). */
  private[graft] def spreadRagged(df: DataFrame): Seq[Seq[Any]] = {
    val ragged = df.columns.toSeq == Seq(ExprTranslator.FieldsCol)
    df.collect().toSeq.map { r =>
      if (ragged) r.getSeq[Any](0).toSeq else r.toSeq
    }
  }

  /** Like queryTable but returns the DataFrame (schema = output header). */
  def queryTableDf(
      spark: SparkSession,
      queryStr: String,
      rows: Seq[Seq[String]],
      columnNames: Option[Seq[String]] = None,
      joinRows: Option[(Seq[Seq[String]], Option[Seq[String]])] = None): DataFrame = {
    val df = localDf(spark, rows, columnNames)
    val tables = joinRows match {
      case Some((jr, jn)) =>
        // header presence must agree between A and B (reference engine check,
        // rbql_engine.py:1509-1511)
        if (columnNames.isEmpty && jn.isDefined)
          Errors.io("Inconsistent modes: Input table doesn't have a header while the Join table has a header")
        if (columnNames.isDefined && jn.isEmpty)
          Errors.io("Inconsistent modes: Input table has a header while the Join table doesn't have a header")
        // B stays fixed-width (padded): the join side has no ragged record
        // model — bNF is its max record width, like the reference's
        // LeftJoiner null_record (rbql_engine.py:583-593)
        val j = localDf(spark, jr, jn, allowRagged = false)
        Map("b" -> j, "B" -> j)
      case None => Map.empty[String, DataFrame]
    }
    query(spark, queryStr, df, tables, ordered = true)
  }

  private def localDf(spark: SparkSession, rows: Seq[Seq[String]],
      names: Option[Seq[String]], allowRagged: Boolean = true): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    // headerless tables get synthetic positional names, tagged so header
    // generation can tell them from a real header (reference input_header
    // = None mode, select_output_header rbql_engine.py:1411-1424)
    val meta =
      if (names.isDefined) Metadata.empty
      else new MetadataBuilder().putBoolean(Graft.SyntheticNameKey, true).build()
    val ragged = allowRagged && names.isEmpty &&
      rows.map(_.length).distinct.size > 1
    if (ragged) {
      // inconsistent record widths: keep the reference's record-as-list
      // model (per-record NF, reads past the end → null, UPDATE preserves
      // each record's own length) instead of padding to a fixed schema
      val schema = StructType(Seq(StructField(ExprTranslator.FieldsCol,
        ArrayType(StringType, containsNull = true), nullable = false, metadata = meta)))
      return spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r => Row(r)).toIndexedSeq), schema)
    }
    val width = if (rows.isEmpty) names.map(_.length).getOrElse(0)
      else rows.map(_.length).max
    val cols = names.getOrElse((1 to width).map(i => s"a$i"))
    val schema = StructType(cols.map(c =>
      StructField(c, StringType, nullable = true, metadata = meta)))
    // ragged rows padded with null (reference safe_get → None,
    // rbql_engine.py:249-250)
    val padded = rows.map(r => Row.fromSeq(r.padTo(width, null)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(padded.toIndexedSeq), schema)
  }

  /** StructField metadata key marking synthetic (headerless) column names. */
  val SyntheticNameKey = "graft_synthetic_name"

  /** StructField metadata key carrying a column's original (user-facing)
    * name when it had to be renamed internally — duplicate or empty header
    * names are legal in the reference's model but not addressable in
    * Spark; variables resolve against this and output headers restore it. */
  val OriginalNameKey = "graft_original_name"
}
