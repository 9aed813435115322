package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, PrintStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Interactive-CLI differential corpus (r14 verdict item 7 — the
  * preview/colorize loop was the last untested CLI surface): replays
  * the sessions recorded from the LIVE reference CLI by
  * `tools/gen_cli_interactive.py` (the piped-stdin shape the
  * reference's own test_all.sh:385-420 uses) and compares stdout
  * BYTE-FOR-BYTE — input preview with aN labels and ANSI colors, the
  * colored output-path / inconsistent-fields / None-values warnings in
  * the reference's emission order, red error lines with the loop
  * continuing, the output-file read-back preview after the first
  * success, the Success line, and the empty-line/EOF exit shapes.
  *
  * Fixture files are recreated at the exact absolute paths the
  * transcripts embed (the default output path includes the input
  * path). Known divergence, invisible here by fixture choice: graft's
  * --output writes a Spark part-file DIRECTORY where the reference
  * writes one file (recorded in BASELINE.md), and graft's preview-stage
  * warnings scan the whole file where the reference samples 10 rows. */
class CliInteractiveSpec extends SparkSpec {

  private val corpus: JValue = JsonMethods.parse(new String(
    Files.readAllBytes(Paths.get(
      "src/test/resources/differential/cli_interactive.json")),
    StandardCharsets.UTF_8))

  private def str(v: JValue): String =
    v match { case JString(s) => s; case other => other.toString }

  private def setupFixtures(): Unit = {
    val dir = Paths.get("/tmp/graft_cli_ifix")
    Files.createDirectories(dir)
    val JObject(fx) = (corpus \ "fixtures"): @unchecked
    // clean previous outputs (graft writes directories; the reference
    // generator writes files — stale ones must not leak across runs)
    Files.list(dir).toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(p => !fx.exists(_._1 == p.getFileName.toString))
      .foreach { p =>
        if (Files.isDirectory(p)) {
          val w = Files.walk(p)
          try w.sorted(java.util.Comparator.reverseOrder())
            .forEach(q => Files.deleteIfExists(q))
          finally w.close()
        } else Files.deleteIfExists(p)
      }
    fx.foreach { case (name, content) =>
      Files.write(dir.resolve(name), str(content).getBytes(StandardCharsets.UTF_8))
    }
  }

  private def runCli(args: Seq[String], stdin: String): (Int, String) = {
    val out = new ByteArrayOutputStream()
    val oldIn = System.in
    System.setIn(new ByteArrayInputStream(stdin.getBytes(StandardCharsets.UTF_8)))
    try {
      val code = Console.withOut(new PrintStream(out, true, "UTF-8")) {
        Console.withIn(new java.io.InputStreamReader(
          new ByteArrayInputStream(stdin.getBytes(StandardCharsets.UTF_8)))) {
          Cli.run(args.toArray, stopSpark = false)
        }
      }
      (code, out.toString("UTF-8"))
    } finally System.setIn(oldIn)
  }

  private val JArray(cases) = (corpus \ "cases"): @unchecked

  for (c <- cases) {
    val name = str(c \ "name")
    test(s"interactive differential $name") {
      setupFixtures()
      val JArray(argv) = (c \ "args"): @unchecked
      val (code, out) = runCli(argv.map(str), str(c \ "stdin"))
      val expected = str(c \ "stdout")
      assert(out == expected,
        s"\n[$name] transcript mismatch\nexpected: ${expected.replace("\u001b", "<ESC>")}\n" +
          s"actual:   ${out.replace("\u001b", "<ESC>")}")
      assert(code == (c \ "exit" match {
        case JInt(n) => n.toInt
        case _ => 0
      }))
    }
  }

  test("interactive corpus present and complete") {
    assert(cases.length >= 10, s"expected >=10 sessions, got ${cases.length}")
  }
}
