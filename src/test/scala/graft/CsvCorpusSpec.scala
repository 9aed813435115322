package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, PrintStream}
import java.nio.file.{Files, Paths}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Data-driven runner over the reference's CSV-level golden corpus
  * (/root/reference/test/csv_unit_tests.json, 56 cases; reference runner:
  * test/test_csv_utils.py). Each case drives the REAL CLI (`Cli.run`) —
  * dialect flags, encodings, headers, comment filters, join-table
  * resolution relative to the input file, stdout goldens against the
  * expected output files, warning presence on stderr, and error exit
  * codes. Queries are translated from the Python dialect by
  * [[PyDialect.translate]]; host-language-specific cases carry a rewrite
  * or a skip with a reason in [[CsvCorpusSpec.overrides]]. */
class CsvCorpusSpec extends SparkSpec {

  import CsvCorpusSpec._

  private val testsDir = "/root/reference/test"
  private val corpusFile = new java.io.File(s"$testsDir/csv_unit_tests.json")

  private val cases: List[JObject] =
    if (!corpusFile.exists()) Nil
    else JsonMethods.parse(corpusFile) match {
      case JArray(cs) => cs.collect { case o: JObject => o }
      case _          => Nil
    }

  private def strOpt(v: JValue): Option[String] = v match {
    case JString(s) => Some(s)
    case _          => None
  }

  private def runCli(args: Seq[String]): (Int, String, String) = {
    val out = new ByteArrayOutputStream()
    val err = new ByteArrayOutputStream()
    val oldErr = System.err
    System.setErr(new PrintStream(err, true, "UTF-8"))
    try {
      val code = Console.withOut(new PrintStream(out, true, "UTF-8")) {
        Console.withIn(new java.io.InputStreamReader(
          new ByteArrayInputStream(Array.empty[Byte]))) {
          Cli.run(args.toArray, stopSpark = false)
        }
      }
      (code, out.toString("UTF-8"), err.toString("UTF-8"))
    } finally System.setErr(oldErr)
  }

  /** Loose mapping from the corpus' abbreviated warning keys to graft's
    * (reference-text) warning lines. */
  private def warningPattern(w: String): Option[String] = {
    val l = w.toLowerCase(java.util.Locale.ROOT)
    if (l.contains("inconsistent input records")) Some("not consistent")
    else if (l.contains("bom removed")) Some("Byte Order Mark")
    else if (l.contains("null values in output")) Some("None values in output")
    else if (l.contains("double quote escaping")) Some("double quote")
    else if (l.contains("separator")) Some("separator")
    else if (l.contains("JOIN file") || l.contains("join file")) Some("JOIN file")
    else None
  }

  private def runCase(c: JObject, graftQuery: String): Unit = {
    val inputRel = strOpt(c \ "input_table_path").get
    val input = s"$testsDir/$inputRel"
    val delim = strOpt(c \ "csv_separator").getOrElse(",")
    val policy = strOpt(c \ "csv_policy").getOrElse("quoted")
    val encoding = strOpt(c \ "csv_encoding").getOrElse("utf-8")
    val withHeaders = (c \ "with_headers") == JBool(true)
    val expectedErr = strOpt(c \ "expected_error")
      .orElse(strOpt(c \ "expected_error_py")).isDefined
    val expectedOutPath = strOpt(c \ "expected_output_table_path")
      .map(p => s"$testsDir/$p")
    val absOutPath = strOpt(c \ "absolute_output_table_path")
    val outputFormat = strOpt(c \ "output_format")
    val expWarnings = (c \ "expected_warnings") match {
      case JArray(ws) => ws.flatMap(strOpt)
      case _          => Nil
    }

    var args = Seq("--query", graftQuery, "--input", input,
      "--delim", delim, "--policy", policy, "--encoding", encoding)
    CsvCorpusSpec.extraArgs.get(strOpt(c \ "test_name").getOrElse(""))
      .foreach(args ++= _)
    if (withHeaders) args ++= Seq("--with-headers")
    strOpt(c \ "comment_prefix").foreach(p => args ++= Seq("--comment-prefix", p))
    strOpt(c \ "comment_regex").foreach(r => args ++= Seq("--comment-regex", r))
    if ((c \ "strip_whitespaces") == JBool(true)) args ++= Seq("--strip-whitespaces")
    outputFormat.foreach(f => args ++= Seq("--out-format", f))
    absOutPath.foreach(p => args ++= Seq("--output", p))

    val (code, out, errTxt) = runCli(args)

    if (expectedErr) {
      assert(code != 0,
        s"expected an error but CLI exited 0\nquery: $graftQuery\nstdout: ${out.take(400)}")
      assert(errTxt.contains("Error ["), s"stderr had no error line: $errTxt")
    } else {
      assert(code == 0, s"CLI failed\nquery: $graftQuery\nstderr: $errTxt")
      expectedOutPath.foreach { p =>
        val cs = if (encoding.equalsIgnoreCase("latin-1")) "ISO-8859-1" else "UTF-8"
        val expected = new String(Files.readAllBytes(Paths.get(p)), cs)
        val expLines = expected.split("\n", -1).toSeq.reverse.dropWhile(_.isEmpty).reverse
        val gotLines = out.split("\n", -1).toSeq.reverse.dropWhile(_.isEmpty).reverse
        assert(gotLines == expLines,
          s"\nquery: $graftQuery\nexpected(${expLines.length}): ${expLines.take(5).mkString(" \\n ")}\n" +
            s"actual(${gotLines.length}):   ${gotLines.take(5).mkString(" \\n ")}")
      }
      expWarnings.foreach { w =>
        warningPattern(w).foreach { pat =>
          assert(errTxt.contains(pat),
            s"expected warning matching '$pat' (for '$w'); stderr: $errTxt")
        }
      }
    }
  }

  private var ran = 0
  private val skipped = scala.collection.mutable.ArrayBuffer.empty[(String, String)]

  for ((c, idx) <- cases.zipWithIndex) {
    val name = strOpt(c \ "test_name").getOrElse(s"case_$idx")
    val pyQuery = strOpt(c \ "query_python")
    val ov = overrides.get(name)

    (ov, pyQuery) match {
      case (Some(Skip(reason)), _) => skipped += ((name, reason))
      case (None, None) =>
        skipped += ((name, "JS-only case (the reference's Python runner skips it too)"))
      case (maybeOv, _) =>
        ran += 1
        val q0 = maybeOv match {
          case Some(Rewrite(gq)) => gq
          case _ => PyDialect.translate(pyQuery.get)
        }
        val q = q0.replace("###UT_TESTS_DIR###", testsDir)
        test(s"csv-corpus[$idx]: $name") { runCase(c, q) }
    }
  }

  test("csv-corpus accounting: every case runs or is skip-listed with a reason") {
    assert(cases.nonEmpty, s"corpus not found at $corpusFile")
    assert(ran + skipped.size == cases.size)
    info(s"csv corpus: ${cases.size} cases, $ran executed, ${skipped.size} skipped:")
    skipped.foreach { case (n, r) => info(s"  SKIP $n — $r") }
    assert(ran >= 40, s"expected ≥40 executed csv-corpus cases, got $ran")
  }
}

object CsvCorpusSpec {
  sealed trait Override
  final case class Skip(reason: String) extends Override
  final case class Rewrite(graftQuery: String) extends Override

  /** Extra CLI flags per case. `test_9` selects on per-record NF over a
    * variable-width file — that is the ragged record model, which the CLI
    * exposes as `--ragged` (the fixed-width reader pads to a constant
    * column count, so NF would be constant). */
  val extraArgs: Map[String, Seq[String]] = Map(
    "test_9" -> Seq("--ragged"))

  val overrides: Map[String, Override] = Map(
    // JS-only in the reference, but every expression is host-neutral:
    // string concat, null literal, int arithmetic, toFixed(2) → %.2f
    "utf-8 with bom js only" -> Rewrite(
      "select 'Movie: ' || a1, null, 2017 - cast(a4 as int), " +
        "format_string('%.2f', cast(a8 as double) / 60.0), 48 order by a5"),
    // JS-only because it demonstrates the JS backend's WEAKNESS (unknown
    // field → undefined); the Python backend and graft both treat an
    // unknown field name as an error, so the expected output is
    // unreachable by design
    "JS: demonstration of failure to handle unknown field" -> Skip(
      "graft follows the Python model: an unknown field name is an error, not undefined"),
    // f-string interpolation (incl. triple-quoted) — rewritten as concat
    "named fields in interpolated strings" -> Rewrite(
      "select top 10 a1, 'area: ' || (a['Area square miles'] || ', GDP: ' || a['GDP per capita']) || \" - '\" || a.country || \"' stats\" " +
        "where cast(a['Area square miles'] as int) > 1000000 order by cast(a['GDP per capita'] as int) desc"),
    "named fields in interpolated triple-quoted strings" -> Rewrite(
      "select top 10 a1, 'area: ' || (a['Area square miles'] || ', GDP: ' || a['GDP per capita']) || \" - '\" || a.country || \"' stats\" " +
        "where cast(a['Area square miles'] as int) > 1000000 order by cast(a['GDP per capita'] as int) desc"),
    )
}
