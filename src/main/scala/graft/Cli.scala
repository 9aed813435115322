package graft

import org.apache.spark.sql.SparkSession

/** Command-line entry point — the counterpart of the reference CLI
  * (/root/reference/rbql-py/rbql/rbql_main.py: `rbql --query ... --delim
  * ...`). Reads a CSV (dialect flags or autodetected), runs the query,
  * writes CSV to --output or prints to stdout, and reports errors with the
  * reference's category labels.
  *
  * Usage:
  *   graft.Cli --query "SELECT a1, a2 WHERE a2 == 'x'" --input in.csv
  *     [--delim ,] [--policy quoted] [--with-headers] [--encoding UTF-8]
  *     [--comment-prefix '#'] [--output outdir] [--ragged]
  */
object Cli {

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args.toList, Map.empty)
    val query = opts.getOrElse("query",
      fail("query parsing", "--query is required"))
    val input = opts.getOrElse("input",
      fail("IO handling", "--input is required"))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val (delim, policy) = (opts.get("delim"), opts.get("policy")) match {
        case (Some(d), Some(p)) => (unescapeDelim(d), p)
        case (Some(d), None) => (unescapeDelim(d), "quoted")
        case _ => sources.CsvSource.autodetect(spark, input,
          opts.getOrElse("encoding", "UTF-8"))
      }
      val result =
        if (opts.contains("ragged"))
          Graft.queryRaggedCsv(spark, query, input, delim)
        else Graft.queryCsv(spark, query, input, delim, policy,
          hasHeader = opts.contains("with-headers"),
          encoding = opts.getOrElse("encoding", "UTF-8"),
          commentPrefix = opts.get("comment-prefix"))
      // read-side warnings (BOM, inconsistent field counts) — reference
      // CSVRecordIterator.get_warnings, rbql_csv.py:496-504
      sources.CsvSource.inputWarnings(spark, input, delim,
        if (opts.contains("ragged")) "simple" else policy,
        opts.getOrElse("encoding", "UTF-8"), opts.get("comment-prefix"))
        .foreach(w => System.err.println(s"Warning: $w"))
      opts.get("output") match {
        case Some(out) =>
          sinks.Sinks.writeCsv(result, out, delim,
            header = opts.contains("with-headers"))
          sinks.Warnings.scan(result, delim)
            .foreach(w => System.err.println(s"Warning: $w"))
        case None =>
          sinks.Sinks.collectCsvLines(result, delim,
            header = opts.contains("with-headers")).foreach(println)
      }
    } catch {
      case e: Throwable =>
        val (cat, msg) = Graft.exceptionToErrorInfo(e)
        System.err.println(s"Error [$cat]: $msg")
        spark.stop()
        sys.exit(1)
    }
    spark.stop()
  }

  private def unescapeDelim(d: String): String =
    d.replace("\\t", "\t").replace("TAB", "\t")

  @annotation.tailrec
  private def parseArgs(args: List[String], acc: Map[String, String]): Map[String, String] =
    args match {
      case Nil => acc
      case ("--with-headers" | "--ragged") :: rest =>
        parseArgs(rest, acc + (args.head.stripPrefix("--") -> "true"))
      case flag :: value :: rest if flag.startsWith("--") =>
        parseArgs(rest, acc + (flag.stripPrefix("--") -> value))
      case other :: _ =>
        fail("query parsing", s"Unrecognized argument: $other")
    }

  private def fail(cat: String, msg: String): Nothing = {
    System.err.println(s"Error [$cat]: $msg")
    sys.exit(1)
  }
}
