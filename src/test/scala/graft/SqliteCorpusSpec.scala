package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.{Files, Paths}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Data-driven runner over the reference's sqlite golden corpus
  * (/root/reference/test/sqlite_unit_tests.json, 3 cases; reference
  * runner: test/test_rbql_sqlite.py:47-113 — query_sqlite_to_csv with
  * out_delim=',', out_policy='quoted_rfc', output md5-compared to
  * expected_result_*.csv, warnings normalized).
  *
  * The corpus cases run against the REAL reference `.sqlite` files
  * through the native file-format reader (SqliteFile — no JDBC driver
  * exists in the offline cache, so graft decodes the public file format
  * itself) via the real CLI (`Cli.run("sqlite", path, ...)`): table
  * scan, header from the schema, JOIN resolution against the same
  * database (reference SqliteDbRegistry, rbql_sqlite.py:59-65), CSV
  * output with the runner's dialect, stdout goldens, warning lines on
  * stderr. The Derby database (same data dumped to jsonl resources)
  * keeps the generic `jdbc` subcommand covered too. */
class SqliteCorpusSpec extends SparkSpec {

  private val testsDir = "/root/reference/test"
  private val corpusFile = new java.io.File(s"$testsDir/sqlite_unit_tests.json")

  // ---- Derby databases built from the dumped sqlite data ---------------
  /** db file name (as referenced in the corpus json) → (derby url, tables) */
  private lazy val databases: Map[String, String] = {
    def load(resource: String): (Seq[String], Seq[String], Seq[Seq[JValue]]) = {
      val src = scala.io.Source.fromInputStream(
        getClass.getResourceAsStream(s"/sqlite_corpus/$resource.jsonl"), "UTF-8")
      val lines = try src.getLines().toList finally src.close()
      val header = JsonMethods.parse(lines.head)
      val cols = (header \ "columns").asInstanceOf[JArray].arr.map { case JString(s) => s; case o => o.toString }
      val types = (header \ "types").asInstanceOf[JArray].arr.map { case JString(s) => s; case o => o.toString }
      val rows = lines.tail.map(l => JsonMethods.parse(l).asInstanceOf[JArray].arr)
      (cols, types, rows)
    }
    def createDb(name: String, tables: Seq[(String, String)]): String = {
      val dir = Files.createTempDirectory(s"graftsqlite_$name").toString
      val url = s"jdbc:derby:$dir/db;create=true"
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        tables.foreach { case (table, resource) =>
          val (cols, types, rows) = load(resource)
          val st = conn.createStatement()
          // quoted column names keep the sqlite header's exact case; the
          // unquoted table name stays addressable via Spark's dbtable
          val colDefs = cols.zip(types).map { case (c, t) =>
            val derbyType = if (t.toUpperCase.startsWith("VARCHAR")) t else "INT"
            s""""$c" $derbyType"""
          }.mkString(", ")
          st.execute(s"CREATE TABLE $table ($colDefs)")
          st.close()
          val ps = conn.prepareStatement(
            s"INSERT INTO $table VALUES (${cols.map(_ => "?").mkString(",")})")
          rows.foreach { r =>
            r.zipWithIndex.foreach {
              case (JNull, i) =>
                ps.setNull(i + 1,
                  if (types(i).toUpperCase.startsWith("VARCHAR")) java.sql.Types.VARCHAR
                  else java.sql.Types.INTEGER)
              case (JString(s), i) => ps.setString(i + 1, s)
              case (JInt(n), i) => ps.setInt(i + 1, n.toInt)
              case (JLong(n), i) => ps.setLong(i + 1, n)
              case (other, i) => ps.setString(i + 1, other.toString)
            }
            ps.addBatch()
          }
          ps.executeBatch()
          ps.close()
        }
      } finally conn.close()
      s"jdbc:derby:$dir/db"
    }
    Map(
      "sqlite_files/mental_health_single_table.sqlite" ->
        createDb("single", Seq("Question" -> "single_Question")),
      "sqlite_files/mental_health.sqlite" ->
        createDb("mh", Seq("Answer" -> "mh_Answer",
          "Question" -> "mh_Question", "Survey" -> "mh_Survey")))
  }

  /** The corpus queries are Python expressions; graft's dialect is Spark
    * SQL. Chained-method cases (x.lower().find) are beyond the mechanical
    * PyDialect translator, so each case carries an explicit faithful
    * rewrite. */
  private val queryRewrites: Map[String, String] = Map(
    // "select top 100 *, a2 * 10, len(a.questiontext) if a.questiontext
    //  else 0 WHERE a1 is None or a1.find(\"your\") != -1"
    // Python truthiness: None and '' both take the else branch;
    // str.find != -1 ⇔ instr != 0
    "test_1" -> ("select top 100 *, a2 * 10, " +
      "if(a.questiontext is not null and a.questiontext != '', length(a.questiontext), 0) " +
      "where a1 is null or instr(a1, 'your') != 0"),
    // "select a3, b1, a1 join Question on a.QuestionID = b.questionid
    //  where b1.lower().find('your age') != -1 order by int(a1), a3"
    "test_2" -> ("select a3, b1, a1 join Question on a.QuestionID == b.questionid " +
      "where instr(lower(b1), 'your age') != 0 order by cast(a1 as int), a3"),
    // "UPDATE a2 = \"Year {} survey\".format(a1)"
    "test_3" -> "update a2 = format_string('Year %s survey', a1)")

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
        Cli.run(args.toArray, stopSpark = false)
      }
      (code, out.toString("UTF-8"), err.toString("UTF-8"))
    } finally System.setErr(oldErr)
  }

  private var ran = 0
  private val skipped = scala.collection.mutable.ArrayBuffer.empty[(String, String)]

  for ((c, idx) <- cases.zipWithIndex) {
    val name = strOpt(c \ "test_name").getOrElse(s"case_$idx")
    queryRewrites.get(name) match {
      case None =>
        skipped += ((name, "no dialect rewrite for this query"))
      case Some(graftQuery) =>
        ran += 1
        test(s"sqlite-corpus[$idx]: $name (native .sqlite file)") {
          val dbKey = strOpt(c \ "input_db_path").get
          val table = strOpt(c \ "input_table_name").get
          val expectedPath = s"$testsDir/${strOpt(c \ "expected_output_table_path").get}"
          val expWarnings = (c \ "expected_warnings") match {
            case JArray(ws) => ws.flatMap(strOpt)
            case _          => Nil
          }
          // the REAL reference .sqlite file through the native
          // file-format reader (SqliteFile) — the `sqlite` subcommand,
          // exactly the reference's sqlite_main entry
          val (code, out, errTxt) = runCli(Seq("sqlite", s"$testsDir/$dbKey",
            "--input", table, "--query", graftQuery))
          assert(code == 0, s"CLI failed\nquery: $graftQuery\nstderr: $errTxt")
          val expected = new String(Files.readAllBytes(Paths.get(expectedPath)), "UTF-8")
          val expLines = expected.split("\n", -1).toSeq.reverse.dropWhile(_.isEmpty).reverse
          val gotLines = out.split("\n", -1).toSeq.reverse.dropWhile(_.isEmpty).reverse
          assert(gotLines == expLines,
            s"\nquery: $graftQuery\nexpected(${expLines.length}): ${expLines.take(5).mkString(" \\n ")}\n" +
              s"actual(${gotLines.length}):   ${gotLines.take(5).mkString(" \\n ")}")
          expWarnings.foreach { w =>
            if (w.contains("null values in output"))
              assert(errTxt.contains("None values in output"),
                s"expected null-replaced warning; stderr: $errTxt")
          }
        }
    }
  }

  test("sqlite-corpus accounting: every case runs or is skip-listed with a reason") {
    assert(cases.nonEmpty, s"corpus not found at $corpusFile")
    assert(ran + skipped.size == cases.size)
    info(s"sqlite corpus: ${cases.size} cases, $ran executed, ${skipped.size} skipped")
    skipped.foreach { case (n, r) => info(s"  SKIP $n — $r") }
    assert(ran == 3, s"expected all 3 sqlite corpus cases executed, got $ran")
  }

  test("jdbc subcommand: test_1 equivalent through embedded Derby") {
    // the generic-JDBC path (any URL with a driver) stays covered: the
    // same corpus data dumped into Derby, same CLI surface minus the
    // native file decode
    val url = databases("sqlite_files/mental_health_single_table.sqlite")
    val (code, out, _) = runCli(Seq("jdbc", url,
      "--input", "Question", "--query", queryRewrites("test_1")))
    assert(code == 0)
    val expected = new String(Files.readAllBytes(
      Paths.get(s"$testsDir/sqlite_files/expected_result_1.csv")), "UTF-8")
    val expLines = expected.split("\n", -1).toSeq.reverse.dropWhile(_.isEmpty).reverse
    val gotLines = out.split("\n", -1).toSeq.reverse.dropWhile(_.isEmpty).reverse
    assert(gotLines == expLines)
  }
}
