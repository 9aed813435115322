package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, PrintStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** In-JVM CLI golden tests (round-2 verdict #7 — previously driven
  * manually). `Cli.run` is invoked directly with stdout/stderr/stdin
  * redirected; the shared test SparkSession is reused via getOrCreate
  * (`stopSpark = false`). */
class CliSpec extends SparkSpec {

  private def runCli(args: Seq[String], stdin: String = ""): (Int, String, String) = {
    val out = new ByteArrayOutputStream()
    val err = new ByteArrayOutputStream()
    val oldErr = System.err
    val oldIn = System.in
    System.setErr(new PrintStream(err, true, "UTF-8"))
    System.setIn(new ByteArrayInputStream(stdin.getBytes(StandardCharsets.UTF_8)))
    try {
      val code = Console.withOut(new PrintStream(out, true, "UTF-8")) {
        Console.withIn(new java.io.InputStreamReader(
          new ByteArrayInputStream(stdin.getBytes(StandardCharsets.UTF_8)))) {
          Cli.run(args.toArray, stopSpark = false)
        }
      }
      (code, out.toString("UTF-8"), err.toString("UTF-8"))
    } finally {
      System.setErr(oldErr)
      System.setIn(oldIn)
    }
  }

  private lazy val dir = Files.createTempDirectory("graftcli").toString

  private def writeCsv(name: String, content: String): String = {
    val p = s"$dir/$name"
    Files.writeString(Paths.get(p), content)
    p
  }

  test("cli: basic query prints CSV to stdout") {
    val in = writeCsv("basic.csv", "name,age\nada,36\nbob,25\ngrace,47\n")
    val (code, out, err) = runCli(Seq(
      "--query", "select a.name, a.age where cast(a.age as int) > 30",
      "--input", in, "--delim", ",", "--with-headers"))
    assert(code == 0, err)
    assert(out == "name,age\nada,36\ngrace,47\n")
  }

  test("cli: --out-format tsv converts the output dialect") {
    val in = writeCsv("conv.csv", "1,one\n2,two\n")
    val (code, out, _) = runCli(Seq(
      "--query", "select a1, a2", "--input", in, "--delim", ",",
      "--out-format", "tsv"))
    assert(code == 0)
    assert(out == "1\tone\n2\ttwo\n")
  }

  test("cli: error category and exit code for a bad query") {
    val in = writeCsv("err.csv", "1,2\n")
    val (code, out, err) = runCli(Seq(
      "--query", "selec a1", "--input", in, "--delim", ","))
    assert(code == 1)
    assert(err.contains("Error [query parsing]"), s"stderr was: $err")
    assert(out.isEmpty)
  }

  test("cli: dialect-combination error surfaces with IO category") {
    val in = writeCsv("combo.csv", "1 2\n")
    val (code, _, err) = runCli(Seq(
      "--query", "select a1", "--input", in,
      "--delim", ",", "--policy", "whitespace"))
    assert(code == 1)
    assert(err.contains("Only whitespace \" \" delim is supported"))
  }

  test("cli: --policy without --delim errors") {
    val in = writeCsv("pol.csv", "1,2\n")
    val (code, _, err) = runCli(Seq(
      "--query", "select a1", "--input", in, "--policy", "quoted"))
    assert(code == 1)
    assert(err.contains("Using \"--policy\" without \"--delim\" is not allowed"))
  }

  test("cli: --init-source-file registers SQL UDFs for the query") {
    val in = writeCsv("udf.csv", "3\n4\n")
    val initF = s"$dir/prelude.sql"
    Files.writeString(Paths.get(initF),
      "CREATE OR REPLACE TEMPORARY FUNCTION double_it(x INT) RETURNS INT RETURN x * 2;")
    val (code, out, err) = runCli(Seq(
      "--query", "select double_it(cast(a1 as int))",
      "--input", in, "--delim", ",", "--init-source-file", initF))
    assert(code == 0, err)
    assert(out == "6\n8\n")
  }

  test("cli: read-side warnings are printed to stderr") {
    val in = writeCsv("warn.csv", "1,2,3\n4,5\n6,7,8\n")
    val (code, _, err) = runCli(Seq(
      "--query", "select a1", "--input", in, "--delim", ","))
    assert(code == 0)
    assert(err.contains("Number of fields in \"input\" table is not consistent"))
    assert(err.contains("record 1 -> 3 fields, record 2 -> 2 fields"))
  }

  test("cli: stdin input when --input is absent") {
    val (code, out, err) = runCli(
      Seq("--query", "select a2, a1", "--delim", ","),
      stdin = "1,one\n2,two\n")
    assert(code == 0, err)
    assert(out == "one,1\ntwo,2\n")
  }

  test("cli: --version prints and exits") {
    val (code, out, _) = runCli(Seq("--version"))
    assert(code == 0)
    assert(out.trim == "0.1.0-graft")
  }

  test("cli: --color labels and colorizes headerless stdout output") {
    val in = writeCsv("color.csv", "x,1\ny,2\n")
    val (code, out, _) = runCli(Seq(
      "--query", "select a1, a2", "--input", in, "--delim", ",", "--color"))
    assert(code == 0)
    assert(out.contains("[") && out.contains("a1:x") && out.contains("a2:1"))
  }

  test("cli: --output with --color errors") {
    val in = writeCsv("oc.csv", "1\n")
    val (code, _, err) = runCli(Seq(
      "--query", "select a1", "--input", in, "--delim", ",",
      "--color", "--output", s"$dir/outdir"))
    assert(code == 1)
    assert(err.contains("not compatible"))
  }

  test("cli: interactive mode previews the table and runs queries") {
    val in = writeCsv("inter.csv", "a,1\nb,2\n")
    val (code, out, _) = runCli(
      Seq("--input", in, "--delim", ","),
      stdin = "select a1 where a2 == '2'\n\n")
    assert(code == 0)
    assert(out.contains("Input table preview:"))
    assert(out.contains("b"))
  }

  test("cli: --strip-spaces (reference spelling) strips like --strip-whitespaces") {
    val in = writeCsv("strip.csv", "  ada , 36 \n bob,25\n")
    val (code, out, err) = runCli(Seq(
      "--query", "select a1, a2", "--input", in, "--delim", ",",
      "--strip-spaces"))
    assert(code == 0, err)
    assert(out == "ada,36\nbob,25\n")
  }

  test("cli: UPDATE-assigned None then star keeps the record's width " +
      "(empty field + None-warning, not a shortened record)") {
    // reference pinned live: both queries emit '1,\n3,\n' plus the
    // None-values warning — a None VALUE occupies its slot; only fields
    // past the record end shorten a ragged record (r12 advice: the
    // last-non-null star width silently shortened this shape)
    val in = writeCsv("updnone.csv", "1,2\n3,4\n")
    for (q <- Seq("update a2 = NULL", "update a2 = NULL | select *")) {
      val (code, out, err) = runCli(Seq(
        "--query", q, "--input", in, "--delim", ","))
      assert(code == 0, err)
      assert(out == "1,\n3,\n", s"query '$q' produced ${out.replace("\n", "\\n")}")
      assert(err.contains("None values in output were replaced by empty strings"),
        s"query '$q' stderr: $err")
    }
  }

  test("cli: ragged star output emits variable-arity records (both the " +
      "--ragged flag and the default headerless fast path)") {
    // reference probed live (quoted read of the same bytes):
    // 'select NF, *' -> '2,x,1\n1,y\n3,z,3,9\n' + inconsistent-width
    // warning. Both graft read models must produce those bytes: the
    // --ragged flag (explicit fields-array model) and the default path,
    // which routes headerless positional-only queries through the
    // single-scan ragged model.
    val in = writeCsv("ragstar.csv", "x,1\ny\nz,3,9\n")
    for (flags <- Seq(Seq("--ragged"), Seq.empty)) {
      val (code, out, err) = runCli(Seq(
        "--query", "select NF, *", "--input", in, "--delim", ",") ++ flags)
      assert(code == 0, err)
      assert(out == "2,x,1\n1,y\n3,z,3,9\n",
        s"flags=$flags produced ${out.replace("\n", "\\n")}")
    }
    // plain star keeps each record's own arity
    val (c2, out2, _) = runCli(Seq(
      "--query", "select *", "--input", in, "--delim", ","))
    assert(c2 == 0 && out2 == "x,1\ny\nz,3,9\n", out2)
  }
}
