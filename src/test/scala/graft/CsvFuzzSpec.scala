package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, PrintStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** CSV-path differential corpus against the reference engine (see
  * `tools/gen_csv_differential.py`): 225 random CSV files — dialects
  * (quoted / simple / whitespace / monocolumn / quoted_rfc multiline),
  * quoting hazards, headers, comment lines, BOM, ragged rows,
  * latin-1/binary encoding, strip_whitespaces — each with a
  * dual-dialect query executed there through the reference's `query_csv`
  * to record the expected output file and warning texts. Replayed here
  * end-to-end through `Cli.run`, comparing stdout byte-for-byte (ordered
  * templates) or as a sorted physical-line multiset (GROUP BY — the
  * reference emits first-seen group order, a partition-order artifact
  * graft does not replicate under shuffle), plus the stderr `Warning:`
  * set. Queries keep int/string-valued outputs: float output would compare
  * Python repr against Java shortest-repr — a formatting model difference
  * the hand-ported corpus pins — while int/string bytes must be identical.
  */
class CsvFuzzSpec extends SparkSpec {

  private val cases: List[JObject] = {
    val in = getClass.getResourceAsStream("/differential/csv_fuzz.json")
    assert(in != null, "missing /differential/csv_fuzz.json test resource")
    val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    JsonMethods.parse(txt) match {
      case JArray(cs) => cs.collect { case o: JObject => o }
      case _          => Nil
    }
  }

  private def str(c: JObject, k: String): Option[String] =
    (c \ k) match { case JString(s) => Some(s); case _ => None }

  private def bool(c: JObject, k: String): Boolean =
    (c \ k) match { case JBool(b) => b; case _ => false }

  private lazy val dir = Files.createTempDirectory("graftcsvfuzz").toString

  private def runCli(args: Seq[String]): (Int, String, String) = {
    val out = new ByteArrayOutputStream()
    val err = new ByteArrayOutputStream()
    val oldErr = System.err
    System.setErr(new PrintStream(err, true, "UTF-8"))
    try {
      val code = Console.withOut(new PrintStream(out, true, "UTF-8")) {
        Console.withIn(new java.io.InputStreamReader(
          new ByteArrayInputStream(Array.emptyByteArray))) {
          Cli.run(args.toArray, stopSpark = false)
        }
      }
      (code, out.toString("UTF-8"), err.toString("UTF-8"))
    } finally System.setErr(oldErr)
  }

  private def esc(d: String): String = if (d == "\t") "TAB" else d

  private def runCase(c: JObject, idx: Int): Unit = {
    val name = str(c, "name").get
    val content = str(c, "csv_content").get
    val encoding = str(c, "encoding").getOrElse("utf-8")
    val charset =
      if (encoding == "latin-1") StandardCharsets.ISO_8859_1
      else StandardCharsets.UTF_8
    val path = s"$dir/case_$idx.csv"
    val bytes = content.getBytes(charset)
    val withBom =
      if (bool(c, "bom")) Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ bytes
      else bytes
    Files.write(Paths.get(path), withBom)

    val args = Seq.newBuilder[String]
    args ++= Seq("--query", str(c, "query_sql").get, "--input", path,
      "--delim", esc(str(c, "delim").get),
      "--policy", str(c, "policy").get,
      "--output-delim", esc(str(c, "out_delim").get),
      "--output-policy", str(c, "out_policy").get,
      "--encoding", encoding)
    if (bool(c, "with_headers")) args += "--with-headers"
    if (bool(c, "strip")) args += "--strip-whitespaces"
    str(c, "comment_prefix").foreach(p => args ++= Seq("--comment-prefix", p))

    val (code, out, err) = runCli(args.result())
    assert(code == 0, s"[$name] exit $code\nstderr: $err")

    val expected = str(c, "expected_output").get
    val ordered = (c \ "ordered") match { case JBool(b) => b; case _ => true }
    if (ordered) {
      assert(out == expected,
        s"\n[$name] query: ${str(c, "query_sql").get}" +
          s"\npy:    ${str(c, "query_py").get}" +
          s"\nexpected: ${expected.take(400)}\nactual:   ${out.take(400)}")
    } else {
      // header line (when present) must stay first; the rest compares as a
      // sorted physical-line multiset
      val (eh, el) = splitHeader(expected, bool(c, "with_headers"))
      val (ah, al) = splitHeader(out, bool(c, "with_headers"))
      assert(ah == eh && al.sorted == el.sorted,
        s"\n[$name] query: ${str(c, "query_sql").get}" +
          s"\nexpected: ${expected.take(400)}\nactual:   ${out.take(400)}")
    }

    val expWarns = (c \ "expected_warnings") match {
      case JArray(ws) => ws.collect { case JString(s) => s }.toSet
      case _          => Set.empty[String]
    }
    val actWarns = err.linesIterator
      .filter(_.startsWith("Warning: ")).map(_.stripPrefix("Warning: ")).toSet
    assert(actWarns == expWarns,
      s"\n[$name] warning mismatch\nexpected: $expWarns\nactual:   $actWarns")
  }

  private def splitHeader(s: String, hasHeader: Boolean): (String, Seq[String]) = {
    val lines = s.split("\n", -1).toSeq
    if (hasHeader && lines.nonEmpty) (lines.head, lines.tail)
    else ("", lines)
  }

  for ((c, i) <- cases.zipWithIndex) {
    val name = str(c, "name").getOrElse(s"case_$i")
    test(s"csv differential $name") { runCase(c, i) }
  }

  test("csv differential corpus present and complete") {
    assert(cases.length >= 220, s"expected >=220 cases, got ${cases.length}")
  }
}
