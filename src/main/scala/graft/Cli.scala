package graft

import org.apache.spark.sql.SparkSession

/** Command-line entry point — the counterpart of the reference CLI
  * (/root/reference/rbql-py/rbql/rbql_main.py: `rbql --query ... --delim
  * ...`). Reads a CSV (dialect flags or autodetected; stdin when no
  * --input), runs the query, writes CSV to --output or prints to stdout —
  * optionally converting the output dialect — and reports errors with the
  * reference's category labels.
  *
  * Usage:
  *   graft.Cli --query "SELECT a1, a2 WHERE a2 == 'x'" [--input in.csv]
  *     [--delim ,] [--policy quoted] [--with-headers] [--encoding UTF-8]
  *     [--comment-prefix '#'] [--comment-regex '^;'] [--strip-whitespaces]
  *     [--out-format csv|tsv|input] [--output-delim D] [--output-policy P]
  *     [--init-source-file prelude.sql] [--output outdir] [--ragged]
  *
  * `--init-source-file` (default `~/.graft_init_source.sql` when present,
  * reference rbql_main.py:76 + rbql_csv.py:22-24) is a file of
  * semicolon-separated Spark SQL statements run against the session before
  * the query — e.g. SQL UDFs: `CREATE TEMPORARY FUNCTION double_it(x INT)
  * RETURNS INT RETURN x * 2`.
  */
object Cli {

  private val OutFormats = Map(
    // reference interpret_named_csv_format + rbql_main.py:73-74
    "csv" -> (",", "quoted"),
    "tsv" -> ("\t", "simple"))

  /** Thrown instead of exiting so `run` is testable in-JVM. */
  private final case class CliExit(code: Int) extends RuntimeException

  def main(args: Array[String]): Unit = sys.exit(run(args))

  /** CLI body; returns the exit code. `stopSpark = false` keeps the
    * (shared) session alive for in-JVM tests. The first argument selects
    * the source subcommand — `csv` (default), `json`, `jdbc`/`sqlite` —
    * mirroring the reference's main() dispatch (rbql_main.py:539-554). */
  def run(args: Array[String], stopSpark: Boolean = true): Int =
    try {
      args.headOption match {
        case Some("json") => jsonMain(args.tail, stopSpark)
        case Some("jdbc") | Some("sqlite") =>
          jdbcMain(args.tail, sqliteShorthand = args.head == "sqlite", stopSpark)
        case Some("csv") => realMain(args.tail, stopSpark)
        case _ => realMain(args, stopSpark)
      }
      0
    } catch { case CliExit(code) => code }

  private def buildSession(): SparkSession = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** `graft json` — RBQL queries over a JSON Lines file (reference
    * json_main, rbql_main.py:458-485: --input/--query/--output +
    * init-source; the whole parsed object is a1). */
  private def jsonMain(args: Array[String], stopSpark: Boolean): Unit = {
    val opts = parseArgs(args.toList, Map.empty)
    if (opts.contains("version")) { println(Version); return }
    val query = opts.getOrElse("query",
      fail("query parsing", "--query is required for the json subcommand"))
    val spark = buildSession()
    try {
      val input = opts.get("input").getOrElse(readStdinToTemp())
      runInitSource(spark, opts.get("init-source-file"))
      val result = Graft.queryJsonLines(spark, query, input)
      opts.get("output") match {
        case Some(out) =>
          val parent = new java.io.File(out).getAbsoluteFile.getParentFile
          if (parent != null && !parent.exists())
            fail("IO handling", s"No such file or directory: '$out'")
          sinks.Sinks.writeJsonLines(result, out)
        case None =>
          sinks.Sinks.collectJsonLines(result).foreach(println)
      }
    } catch {
      case e: CliExit => throw e
      case e: Throwable =>
        // --debug-mode: re-raise with the full stack trace instead of the
        // friendly one-line error (reference rbql_main.py:387, hidden flag)
        if (opts.contains("debug-mode")) e.printStackTrace()
        val (cat, msg) = Graft.exceptionToErrorInfo(e)
        System.err.println(s"Error [$cat]: $msg")
        if (stopSpark) spark.stop()
        throw CliExit(1)
    }
    if (stopSpark) spark.stop()
  }

  /** `graft jdbc <url>` / `graft sqlite <db-path>` — RBQL queries over a
    * JDBC table, result written as CSV (reference sqlite_main,
    * rbql_main.py:487-536: positional database, --input table name,
    * --out-format csv→(',', quoted_rfc) / tsv, --output, --color). JOIN
    * tables resolve against the same database, like the reference's
    * SqliteDbRegistry (rbql_sqlite.py:59-65). The sqlite subcommand
    * reads the file NATIVELY ([[sources.SqliteFile]] — pure-JVM
    * file-format decode; no driver exists in the offline cache); `jdbc`
    * takes any URL with a driver on the classpath. */
  private def jdbcMain(args: Array[String], sqliteShorthand: Boolean,
      stopSpark: Boolean): Unit = {
    val (positional, flagArgs) = args.toList match {
      case p :: rest if !p.startsWith("--") => (Some(p), rest)
      case rest => (None, rest)
    }
    val opts = parseArgs(flagArgs, Map.empty)
    if (opts.contains("version")) { println(Version); return }
    val target = positional.getOrElse(
      fail("generic", "Database is required (positional argument)"))
    if (sqliteShorthand && !new java.io.File(target).isFile)
      fail("generic", s"The database does not exist: $target")
    val url = target
    if (opts.contains("output") && opts.contains("color"))
      fail("generic", "\"--output\" is not compatible with \"--color\" option")
    val (outDelim, outPolicy) = opts.getOrElse("out-format", "csv") match {
      // reference: csv output defaults to quoted_rfc (rbql_main.py:519)
      case "csv" => (",", "quoted_rfc")
      case "tsv" => ("\t", "simple")
      case f => fail("query parsing", s"Unknown --out-format: '$f' (csv, tsv)")
    }
    val query = opts.getOrElse("query",
      fail("query parsing", "--query is required for the jdbc subcommand"))
    val spark = buildSession()
    try {
      // native file decode for sqlite, generic JDBC otherwise
      def readTable(t: String): org.apache.spark.sql.DataFrame =
        if (sqliteShorthand) sources.SqliteFile.read(spark, url, t)
        else sources.JdbcSource.read(spark, url, t)
      val table = opts.get("input").getOrElse {
        val names =
          if (sqliteShorthand) sources.SqliteFile.tableNames(url)
          else sources.JdbcSource.tableNames(url)
        names match {
          case Seq(only) => only
          case _ => fail("generic",
            "Please provide input table name with --input parameter: source database has more than one table")
        }
      }
      runInitSource(spark, opts.get("init-source-file"))
      val input = readTable(table)
      // JOIN tables come from the same database (SqliteDbRegistry model)
      val fallback: String => Option[org.apache.spark.sql.DataFrame] = id =>
        try Some(readTable(id))
        catch { case _: Exception => None }
      val result = Graft.query(spark, query, input,
        tableFallback = fallback, ordered = true)
      opts.get("output") match {
        case Some(out) =>
          val parent = new java.io.File(out).getAbsoluteFile.getParentFile
          if (parent != null && !parent.exists())
            fail("IO handling", s"No such file or directory: '$out'")
          sinks.Sinks.writeCsv(result, out, outDelim,
            header = true, policy = outPolicy)
        case None =>
          val lines = sinks.Sinks.collectCsvLines(result, outDelim,
            header = true, policy = outPolicy)
          if (opts.contains("color"))
            lines.foreach(l => println(colorizeLine(l, outDelim)))
          else lines.foreach(println)
      }
      sinks.Warnings.scan(result, outDelim, outPolicy)
        .foreach(w => System.err.println(s"Warning: $w"))
    } catch {
      case e: CliExit => throw e
      case e: Throwable =>
        // --debug-mode: re-raise with the full stack trace instead of the
        // friendly one-line error (reference rbql_main.py:387, hidden flag)
        if (opts.contains("debug-mode")) e.printStackTrace()
        val (cat, msg) = Graft.exceptionToErrorInfo(e)
        System.err.println(s"Error [$cat]: $msg")
        if (stopSpark) spark.stop()
        throw CliExit(1)
    }
    if (stopSpark) spark.stop()
  }

  private val Version = "0.1.0-graft"

  private def realMain(args: Array[String], stopSpark: Boolean): Unit = {
    val opts = parseArgs(args.toList, Map.empty)
    // --version prints and exits (reference rbql_main.py:390-392)
    if (opts.contains("version")) { println(Version); return }
    // --output captures to a file; colorizing it would corrupt the data
    // (reference rbql_main.py:398-400)
    if (opts.contains("output") && opts.contains("color"))
      fail("generic", "\"--output\" is not compatible with \"--color\" option")
    // no --query with a file input → interactive loop
    // (reference run_interactive_loop, rbql_main.py:207-238)
    val interactive = !opts.contains("query")
    if (interactive && !opts.contains("input"))
      fail("query parsing", "--query is required when reading from stdin")
    val spark = buildSession()
    try {
      // stdin input when --input is absent (reference rbql_main.py:373)
      val input = opts.get("input").getOrElse(readStdinToTemp())
      // --policy without --delim is an error; monocolumn forces an empty
      // delim (reference rbql_main.py:402-407)
      if (opts.contains("policy") && !opts.contains("delim"))
        fail("generic", "Using \"--policy\" without \"--delim\" is not allowed")
      val (delim, policy) = (opts.get("delim"), opts.get("policy")) match {
        case (_, Some("monocolumn")) => ("", "monocolumn")
        case (Some(d), Some(p)) => (unescapeDelim(d), p)
        case (Some(d), None) => (unescapeDelim(d), "quoted")
        case _ => sources.CsvSource.autodetect(spark, input,
          opts.getOrElse("encoding", "UTF-8"))
      }
      sources.CsvSource.validateDialect(delim, policy,
        opts.getOrElse("encoding", "UTF-8"), opts.getOrElse("query", ""))
      // output dialect: --output-delim/--output-policy > --out-format
      // (csv/tsv) > same as input (reference rbql_main.py:73-74)
      val (outDelim, outPolicy) = (opts.get("output-delim"), opts.get("output-policy")) match {
        case (Some(d), p) => (unescapeDelim(d), p.getOrElse(policy))
        case (None, Some(p)) => (delim, p)
        case _ => opts.get("out-format") match {
          case Some("input") | None => (delim, policy)
          case Some(f) => OutFormats.getOrElse(f,
            fail("query parsing", s"Unknown --out-format: '$f' (csv, tsv, input)"))
        }
      }
      runInitSource(spark, opts.get("init-source-file"))

      // interactive mode always writes to a file: --output, or the
      // reference's default path input+{.csv|.tsv|.txt} by the INPUT
      // delim (get_default_output_path, rbql_main.py:201-205; the
      // not-provided warning prints after the input preview, colored)
      val outputPath: Option[String] =
        if (!interactive) opts.get("output")
        else Some(opts.getOrElse("output", input + (delim match {
          case "," => ".csv"
          case "\t" => ".tsv"
          case _ => ".txt"
        })))

      // interactive warnings/errors go to STDOUT with ANSI color
      // (reference show_warning/show_error, rbql_main.py:43-60);
      // non-interactive to stderr, plain
      def warn(msg: String): Unit =
        if (interactive) println(s"\u001b[33;1mWarning:\u001b[0m $msg")
        else System.err.println(s"Warning: $msg")

      def runOne(query: String): Unit = {
        // NR's two-pass persist (PlanBuilder.withNr) is released after this
        // query's terminal action — the interactive loop must not leak one
        // cached input per query
        val (_, nrPersists) = engine.PlanBuilder.trackPersists(runOneInner(query))
        nrPersists.foreach(_.unpersist(false))
      }

      def runOneInner(query: String): Unit = {
        val joinFiles = scala.collection.mutable.ArrayBuffer.empty[String]
        // a WITH (header)/(noheader) modifier in the query overrides the
        // --with-headers flag for BOTH input reading (queryCsv) and output
        // header emission (reference rbql_csv.py:374-380)
        val headerMode = {
          val mods = try engine.ClauseParser.parse(
            engine.Lexer.mask(engine.Lexer.cleanup(query))
              .copy(text = engine.Lexer.splitStages(
                engine.Lexer.mask(engine.Lexer.cleanup(query)).text).head)).withMods
          catch { case _: Throwable => Seq.empty[String] }
          if (mods.contains("header")) true
          else if (mods.contains("noheader")) false
          else opts.contains("with-headers")
        }
        val result0 =
          if (opts.contains("ragged"))
            Graft.queryRaggedCsv(spark, query, input, delim)
          else Graft.queryCsvImpl(spark, query, input, delim, policy,
            hasHeader = opts.contains("with-headers"),
            encoding = opts.getOrElse("encoding", "UTF-8"),
            commentPrefix = opts.get("comment-prefix"),
            stripWhitespaces = opts.contains("strip-whitespaces"),
            commentRegex = opts.get("comment-regex"),
            onJoinFileRead = joinFiles += _)
        // reference FileSystemCSVRegistry.get_warnings (rbql_csv.py:552-557)
        // join-header warnings are emitted LAST (reference order:
        // input-iterator, writer, then join-registry —
        // rbql_engine.py:1588-1591 + rbql_csv.py:580); buffered here
        // because the join files are discovered at plan-build time
        val joinHeaderWarns =
          if (!headerMode) Seq.empty
          else joinFiles.toSeq.map(p =>
            s"The first record in JOIN file ${new java.io.File(p).getName} was also treated as header (and skipped)")
        // persist: the sink write and the warnings scan share one
        // execution instead of running the query twice
        result0.persist()
        // write-side width check (reference CSVWriter.write,
        // rbql_csv.py:208-210): with an output header, every record must
        // match the header's field count — a star over a short (ragged)
        // record makes the output record structurally narrower. The hidden
        // width column exists only on the CSV star path (parity surface).
        val owidName = engine.PlanBuilder.OwidCol
        if (headerMode && result0.columns.contains(owidName)) {
          val hdrLen = result0.columns.length - 1
          result0.select(owidName).collect().foreach { r =>
            val w = r.getAs[Number](0).intValue
            if (w != hdrLen) fail("IO handling",
              s"Inconsistent number of columns in output header and the current record: $hdrLen != $w")
          }
        }
        // the hidden width column rides along: the sinks route a headerless
        // result through the variable-arity (ragged star) write path and
        // drop it otherwise; Warnings.scan slices by it so padding nulls
        // are not mistaken for None values
        val result = result0
        try {
          outputPath match {
            case Some(out) =>
              // the reference fails on a nonexistent output directory
              // (open() ENOENT); Spark would silently create it
              val parent = new java.io.File(out).getAbsoluteFile.getParentFile
              if (parent != null && !parent.exists())
                fail("IO handling", s"No such file or directory: '$out'")
              sinks.Sinks.writeCsv(result, out, outDelim,
                header = headerMode, policy = outPolicy)
            case None =>
              val lines = sinks.Sinks.collectCsvLines(result, outDelim,
                header = headerMode, policy = outPolicy)
              // --color cycles an ANSI color per field, with aN labels on
              // headerless output (reference print_colorized,
              // rbql_main.py:177-198)
              if (opts.contains("color"))
                lines.foreach(l =>
                  println(colorizeLine(l, outDelim, labels = !headerMode)))
              else lines.foreach(println)
          }
          // read-side warnings (BOM, inconsistent field counts —
          // CSVRecordIterator.get_warnings, rbql_csv.py:496-504) first,
          // then writer warnings, then join-header: the reference's
          // emission order, byte-pinned by CliInteractiveSpec
          val inputWarns = sources.CsvSource.inputWarnings(spark, input, delim,
            if (opts.contains("ragged")) "simple" else policy,
            opts.getOrElse("encoding", "UTF-8"), opts.get("comment-prefix"))
          val writerWarns = sinks.Warnings.scan(result, outDelim, outPolicy)
          (inputWarns ++ writerWarns ++ joinHeaderWarns).foreach(warn)
        } finally result0.unpersist()
      }

      if (interactive) interactiveLoop(spark, input, delim, policy, opts,
        outputPath.get, outProvided = opts.contains("output"),
        outDelim, outPolicy, runOne)
      else runOne(opts("query"))
    } catch {
      case e: CliExit => throw e
      case e: Throwable =>
        // --debug-mode: re-raise with the full stack trace instead of the
        // friendly one-line error (reference rbql_main.py:387, hidden flag)
        if (opts.contains("debug-mode")) e.printStackTrace()
        val (cat, msg) = Graft.exceptionToErrorInfo(e)
        System.err.println(s"Error [$cat]: $msg")
        if (stopSpark) spark.stop()
        throw CliExit(1)
    }
    if (stopSpark) spark.stop()
  }

  // ANSI palette from the reference's print_colorized (rbql_main.py:177-198)
  private val ColorCodes = Seq("0m", "31m", "32m", "33m", "34m", "35m",
    "36m", "31;1m", "32;1m", "33;1m").map(c => s"\u001b[$c")

  /** Cycle a color per FIELD list (the reference's print_colorized,
    * rbql_main.py:177-198): each field prefixed with its cycle color
    * (and `aN:` label when `labels`), joined by the delim, reset at the
    * line end. Field-list-based so ragged records render their own
    * width and quoted delims never split. */
  private def colorizeFields(fields: Seq[String], delim: String,
      labels: Boolean): String =
    fields.zipWithIndex.map { case (f, i) =>
      val c = ColorCodes(i % ColorCodes.length)
      if (labels) s"$c" + "a" + (i + 1) + s":$f" else s"$c$f"
    }.mkString(delim) + "\u001b[0m"

  /** First 10 records of a written CSV output, in file order, parsed
    * with the output dialect. Handles both sink layouts: a plain file
    * and a Spark part-file directory (parts in name order; when the
    * write was headered every non-empty part repeats the header, so
    * parts after the first drop a first line equal to part 0's). */
  private def outputPreviewFields(outPath: String, delim: String,
      policy: String, encoding: String): Seq[Seq[String]] = {
    val root = new java.io.File(outPath)
    val files =
      if (root.isDirectory)
        root.listFiles().filter(_.getName.startsWith("part-"))
          .sortBy(_.getName).toSeq
      else Seq(root)
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    var firstLineOfFirstPart: Option[String] = None
    for ((f, fi) <- files.zipWithIndex if lines.size < 10) {
      val src = scala.io.Source.fromFile(f, encoding)
      try {
        var ln = src.getLines()
        if (fi == 0) {
          ln = ln.buffered
          firstLineOfFirstPart =
            if (ln.hasNext) Some(ln.asInstanceOf[BufferedIterator[String]].head)
            else None
        } else if (ln.hasNext && firstLineOfFirstPart.isDefined) {
          // repeated per-part header from the headered dir layout
          val b = ln.buffered
          if (b.head == firstLineOfFirstPart.get) b.next()
          ln = b
        }
        while (ln.hasNext && lines.size < 10) lines += ln.next()
      } finally src.close()
    }
    lines.toSeq.map { l =>
      if (policy == "simple" || policy == "whitespace")
        l.split(java.util.regex.Pattern.quote(delim), -1).toSeq
      else if (policy == "monocolumn") Seq(l)
      else sources.CsvSource.splitQuoted(l, delim.head)
    }
  }

  /** Cycle a color per field of an already-joined CSV line. */
  private def colorizeLine(line: String, delim: String,
      labels: Boolean = false): String = {
    val fields = line.split(java.util.regex.Pattern.quote(delim), -1)
    fields.zipWithIndex.map { case (f, i) =>
      val c = ColorCodes(i % ColorCodes.length)
      if (labels) s"${c}a${i + 1}:$f" else s"$c$f"
    }.mkString(delim) + "\u001b[0m"
  }

  /** Interactive query loop (reference run_interactive_loop +
    * start_preview_mode_csv, rbql_main.py:207-238, 306-338; every
    * behavior below byte-pinned against the live reference CLI in
    * CliSpec): colorized input preview with aN column labels, a colored
    * output-path warning when --output was absent, then read-run until
    * the FIRST success — which previews the written output file (no
    * labels), prints the Success line, and breaks. Errors print to
    * STDOUT in red and the loop continues; an empty line breaks
    * silently; EOF prints one newline and breaks. */
  private def interactiveLoop(spark: SparkSession, input: String,
      delim: String, policy: String, opts: Map[String, String],
      outPath: String, outProvided: Boolean,
      outDelim: String, outPolicy: String,
      runOne: String => Unit): Unit = {
    println("Input table preview:")
    println("====================================")
    // raw RAGGED records (the reference's sample_records parses each
    // record into its own field list — a 1-field row previews as one
    // labeled field, never padded to the table's max width)
    val enc = opts.getOrElse("encoding", "UTF-8")
    val preview: Seq[Seq[String]] =
      if (Set("quoted", "simple", "whitespace")(policy))
        sources.CsvSource.readRaggedPolicy(spark, input, delim, policy,
          encoding = enc, commentPrefix = opts.get("comment-prefix"),
          stripWhitespaces = opts.contains("strip-whitespaces"))
          .limit(10).collect().toSeq.map(_.getSeq[String](0))
      else {
        // quoted_rfc / monocolumn: padded read (fixed-width fallback)
        val df = sources.CsvSource.read(spark, input, delim, policy,
          hasHeader = false, encoding = enc,
          commentPrefix = opts.get("comment-prefix")).limit(10)
        sinks.Sinks.collectCsvLines(df, delim, header = false,
          policy = "simple")
          .map(l => l.split(java.util.regex.Pattern.quote(delim), -1).toSeq)
      }
    val withHeaders = opts.contains("with-headers")
    preview.zipWithIndex
      .map { case (f, i) => colorizeFields(f, delim, labels = !(withHeaders && i == 0)) }
      .foreach(println)
    println("====================================\n")
    // preview-stage warnings (reference start_preview_mode_csv shows
    // sample_records' warnings here, colored). The reference scopes them
    // to the 10-row sample; graft scans the whole file -- for a file
    // whose first inconsistency lies past row 10 graft warns one query
    // earlier than the reference (cosmetic; recorded here).
    sources.CsvSource.inputWarnings(spark, input, delim,
      if (opts.contains("ragged")) "simple" else policy,
      opts.getOrElse("encoding", "UTF-8"), opts.get("comment-prefix"))
      .foreach(w => println(s"\u001b[33;1mWarning:\u001b[0m $w"))
    if (!outProvided)
      println("\u001b[33;1mWarning:\u001b[0m Output path was not provided. " +
        s"Result set will be saved as: $outPath")
    var done = false
    while (!done) {
      print("Input SQL-like RBQL query and press Enter:\n> ")
      Console.flush()
      val line = scala.io.StdIn.readLine()
      if (line == null) { println(); done = true }
      else if (line.trim.isEmpty) done = true
      else {
        val ok =
          try { runOne(line.trim); true }
          catch {
            case e: Throwable =>
              val (cat, msg) = Graft.exceptionToErrorInfo(e)
              println(s"\u001b[31;1mError [$cat]:\u001b[0m $msg")
              false
          }
        if (ok) {
          // success: preview the OUTPUT FILE (read back with the output
          // dialect, never whitespace-stripped), then break
          println("\nOutput table preview:")
          println("====================================")
          // driver-side read-back in FILE ORDER: a Spark scan packs
          // splits by size, which scrambles small multi-part outputs
          // (probed: the join session previewed rows reordered); the
          // preview is <=10 records, so sequential part-file reads in
          // name order are both exact and cheap
          outputPreviewFields(outPath, outDelim, outPolicy,
            opts.getOrElse("encoding", "UTF-8"))
            .map(f => colorizeFields(f, outDelim, labels = false))
            .foreach(println)
          println("====================================")
          println(s"Success! Result table was saved to: $outPath")
          done = true
        }
      }
    }
  }

  /** Execute the SQL prelude: --init-source-file, or the default
    * `~/.graft_init_source.sql` when it exists. Statements are split on
    * semicolons at top level (quotes respected). */
  private def runInitSource(spark: SparkSession, explicit: Option[String]): Unit = {
    val path = explicit.orElse {
      val default = new java.io.File(
        System.getProperty("user.home"), ".graft_init_source.sql")
      if (default.isFile) Some(default.getPath) else None
    }
    path.foreach { p =>
      val text =
        try scala.io.Source.fromFile(p).mkString
        catch {
          case e: Exception =>
            fail("IO handling", s"Unable to read init source file '$p': ${e.getMessage}")
        }
      splitSqlStatements(text).foreach(spark.sql(_))
    }
  }

  private def splitSqlStatements(text: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var quote: Char = 0
    for (c <- text) {
      if (quote != 0) { cur.append(c); if (c == quote) quote = 0 }
      else if (c == '\'' || c == '"') { quote = c; cur.append(c) }
      else if (c == ';') { out += cur.toString; cur.clear() }
      else cur.append(c)
    }
    out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Spool stdin to a temp file so Spark can scan it (reference reads the
    * table from stdin when --input is absent, rbql_main.py:373). */
  private def readStdinToTemp(): String = {
    val tmp = java.nio.file.Files.createTempFile("graft_stdin", ".csv")
    java.nio.file.Files.copy(System.in, tmp,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    tmp.toFile.deleteOnExit()
    tmp.toString
  }

  private def unescapeDelim(d: String): String =
    d.replace("\\t", "\t").replace("TAB", "\t")

  @annotation.tailrec
  private def parseArgs(args: List[String], acc: Map[String, String]): Map[String, String] =
    args match {
      case Nil => acc
      case ("--with-headers" | "--ragged" | "--strip-whitespaces" |
            "--color" | "--version" | "--debug-mode") :: rest =>
        parseArgs(rest, acc + (args.head.stripPrefix("--") -> "true"))
      // the reference's spelling of the whitespace-strip flag
      // (rbql_main.py: --strip-spaces); both are accepted
      case "--strip-spaces" :: rest =>
        parseArgs(rest, acc + ("strip-whitespaces" -> "true"))
      case flag :: value :: rest if flag.startsWith("--") =>
        parseArgs(rest, acc + (flag.stripPrefix("--") -> value))
      case other :: _ =>
        fail("query parsing", s"Unrecognized argument: $other")
    }

  private def fail(cat: String, msg: String): Nothing = {
    System.err.println(s"Error [$cat]: $msg")
    throw CliExit(1)
  }
}
