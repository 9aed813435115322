package graft

import org.apache.spark.sql.functions._

/** Entry-point parity with the reference's exported API surface
  * (query / query_table / query_csv / query_dataframe,
  * /root/reference/rbql-py/rbql/__init__.py:1-11). */
class ApiSpec extends SparkSpec {

  private val fixtures = "/root/reference/test/csv_files"

  test("queryCsv with hasHeader default") {
    val out = Graft.queryCsv(spark,
      "SELECT a.country WHERE a.Region LIKE '%EUROPE%' LIMIT 4",
      s"$fixtures/countries.csv", hasHeader = true)
    assert(out.count() == 4)
  }

  test("WITH (header) modifier overrides the default") {
    val out = Graft.queryCsv(spark,
      "SELECT a.country LIMIT 2 WITH (header)",
      s"$fixtures/countries.csv", hasHeader = false)
    assert(out.columns.toSeq == Seq("country"))
    assert(out.count() == 2)
  }

  test("WITH (noheader) gives positional access to the first row too") {
    val out = Graft.queryCsv(spark,
      "SELECT a1 WITH (noheader)",
      s"$fixtures/countries.csv", hasHeader = true)
    // header row is data now: one extra record
    val withHeader = Graft.queryCsv(spark, "SELECT a1 WITH (header)",
      s"$fixtures/countries.csv", hasHeader = false)
    assert(out.count() == withHeader.count() + 1)
  }

  test("queryJsonLines: nested access through the a1 variant column") {
    val out = Graft.queryJsonLines(spark,
      "SELECT variant_get(a1, '$.name', 'string') AS name, " +
        "variant_get(a1, '$.age', 'int') AS age WHERE variant_get(a1, '$.age', 'int') > 30 ORDER BY name",
      "/root/reference/test/json_files/names10.jsonl")
    assert(out.columns.toSeq == Seq("name", "age"))
    assert(out.count() > 0)
  }

  test("exceptionToErrorInfo categories") {
    val (c1, _) = Graft.exceptionToErrorInfo(
      intercept[Throwable](Graft.query(spark, "SELEKT a1", sf("region"))))
    assert(c1 == "query parsing")
    // unknown bare function: the reference evaluates per record, so it
    // surfaces as a NameError at record 1 under 'query execution'
    // (probed live, r15; byte-pinned in CliInteractiveSpec)
    val (c2, m2) = Graft.exceptionToErrorInfo(
      intercept[Throwable](Graft.query(spark, "SELECT nosuchfn(a1)", sf("region")).collect()))
    assert(c2 == "query execution")
    assert(m2 == "At record 1, Details: name 'nosuchfn' is not defined")
    val (c3, m3) = Graft.exceptionToErrorInfo(new RuntimeException("boom"))
    assert(c3 == "query execution" && m3 == "boom")
  }

  test("queryCsv strip-whitespaces and comment-regex") {
    val dir = java.nio.file.Files.createTempDirectory("graftcli").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/t.csv"),
      "; a comment\n 1 , ada \n 2 , grace \n")
    val out = Graft.queryCsv(spark, "SELECT a1, a2", s"$dir/t.csv",
      stripWhitespaces = true, commentRegex = Some("^;"))
      .collect().map(_.toSeq)
    assert(out.toSeq == Seq(Seq("1", "ada"), Seq("2", "grace")))
    // quoted fields survive the comment-regex text path, delims inside
    // quotes intact, doubled quotes unescaped
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/q.csv"),
      "# skip\n\"x,y\",\"he said \"\"hi\"\"\"\n")
    val out2 = Graft.queryCsv(spark, "SELECT a1, a2", s"$dir/q.csv",
      commentRegex = Some("^#"))
      .collect().map(_.toSeq)
    assert(out2.toSeq == Seq(Seq("x,y", "he said \"hi\"")))
  }

  test("JOIN table resolution: input-relative path and table-names index") {
    val dir = java.nio.file.Files.createTempDirectory("graftreg").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/main.csv"),
      "id,name\n1,ada\n2,grace\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/side.csv"),
      "id,city\n1,london\n2,ny\n")
    // relative to the main table's directory (reference rbql_csv.py:101-115)
    val rel = Graft.queryCsv(spark,
      "SELECT a.id, b.city JOIN side.csv ON a.id == b.id ORDER BY a.id",
      s"$dir/main.csv", hasHeader = true)
      .collect().map(_.toSeq)
    assert(rel.toSeq == Seq(Seq("1", "london"), Seq("2", "ny")))
    // name alias via the table-names index
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/idx"),
      s"cities\t$dir/side.csv\n")
    System.setProperty("graft.table.names", s"$dir/idx")
    try {
      val byName = Graft.queryCsv(spark,
        "SELECT a.id, b.city JOIN cities ON a.id == b.id ORDER BY a.id",
        s"$dir/main.csv", hasHeader = true)
        .collect().map(_.toSeq)
      assert(byName.toSeq == Seq(Seq("1", "london"), Seq("2", "ny")))
    } finally System.clearProperty("graft.table.names")
  }

  test("FROM temp view resolution") {
    sf("region").createOrReplaceTempView("regions_v")
    val out = Graft.query(spark,
      "SELECT a.r_name FROM regions_v ORDER BY a.r_name LIMIT 2",
      spark.emptyDataFrame)
    assert(out.count() == 2)
  }

  test("invalid CSV dialect combinations error with the reference messages") {
    val dir = java.nio.file.Files.createTempDirectory("graftdialect").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/t.csv"), "1,2\n")
    def err(f: => Any): String =
      intercept[graft.engine.IoError](f).getMessage
    // double-quote delim + quoted policy (rbql_csv.py:551-552)
    assert(err(Graft.queryCsv(spark, "select a1", s"$dir/t.csv",
      delim = "\"", policy = "quoted"))
      .contains("Double quote delimiter is incompatible"))
    // non-space delim + whitespace policy (rbql_csv.py:553-554)
    assert(err(Graft.queryCsv(spark, "select a1", s"$dir/t.csv",
      delim = ",", policy = "whitespace"))
      .contains("Only whitespace \" \" delim is supported"))
    // non-ascii query text under latin-1 (rbql_csv.py:556-557)
    assert(err(Graft.queryCsv(spark, "select a1 || 'ü'", s"$dir/t.csv",
      encoding = "latin-1"))
      .contains("enable UTF-8 encoding instead of latin-1"))
    // non-ascii separator under latin-1 (rbql_csv.py:559-560)
    assert(err(Graft.queryCsv(spark, "select a1", s"$dir/t.csv",
      delim = "¦", encoding = "latin-1"))
      .contains("non-ascii separators"))
    // unknown policy name
    assert(err(Graft.queryCsv(spark, "select a1", s"$dir/t.csv",
      policy = "nope")).contains("Unknown CSV policy"))
  }
}
