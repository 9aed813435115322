package graft

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Differential replay of the JSON missing-key corpus
  * (src/test/resources/differential/json_fuzz.json, generated against
  * the LIVE reference by tools/gen_json_differential.py — r13 verdict
  * item 3). Each case carries BOTH dialect expectations:
  *
  *  - default mode (graft's documented divergence): a missing key binds
  *    null — pinned byte-for-byte against the reference run on a PADDED
  *    copy of the data (absent keys made explicit null), which is the
  *    exact semantics `variant_get` implements;
  *  - strict mode (`spark.graft.json.strictKeys=true`): the reference
  *    run on the RAW data — a missing key raises the reference's
  *    per-record error `At record N, Details: 'key'` with matching
  *    record number and key (single-partition inputs, so the first
  *    failing record is deterministic like the reference's sequential
  *    scan); clean cases must produce the same bytes as default mode.
  *
  * Deliberate divergence kept OUT of the corpus: the reference's
  * TopWriter evaluates one record PAST a LIMIT (write() returns False
  * only on the N+1-th attempt, rbql_engine.py:489-495), so `limit 1`
  * can raise on record 2 there; graft's LIMIT stops at exactly N rows
  * and never evaluates the N+1-th record's guard.
  */
class JsonFuzzSpec extends SparkSpec {

  private val res = getClass.getResourceAsStream("/differential/json_fuzz.json")
  private val cases: List[JObject] =
    if (res == null) Nil
    else JsonMethods.parse(scala.io.Source.fromInputStream(res, "UTF-8").mkString) match {
      case JArray(cs) => cs.collect { case o: JObject => o }
      case _ => Nil
    }

  private def str(v: JValue): String = v match { case JString(s) => s; case x => sys.error(s"not a string: $x") }
  private def strSeq(v: JValue): Seq[String] = v match {
    case JArray(xs) => xs.map(str)
    case _ => sys.error("not an array")
  }

  test("json fuzz corpus is present and mixed") {
    assert(cases.size >= 40, s"corpus shrank to ${cases.size}")
    val errs = cases.count(c => (c \ "strict_error") != JNull)
    assert(errs >= 10 && errs < cases.size,
      s"corpus must mix strict-error and strict-clean draws (got $errs errors)")
  }

  private def runCase(query: String, path: String): Either[String, Seq[String]] =
    try Right(sinks.Sinks.collectJsonLines(
      Graft.queryJsonLines(spark, query, path)))
    catch {
      case e: Throwable =>
        val (cat, msg) = Graft.exceptionToErrorInfo(e)
        assert(cat == "query execution", s"category $cat for: $msg")
        Left(msg)
    }

  for ((c, idx) <- cases.zipWithIndex) {
    val name = str(c \ "name")
    test(s"json-fuzz[$idx] $name: ${str(c \ "query")}") {
      val query = str(c \ "query")
      val dir = java.nio.file.Files.createTempDirectory("graftjf")
      val in = dir.resolve("in.jsonl")
      java.nio.file.Files.write(in,
        strSeq(c \ "input_lines").map(_ + "\n").mkString
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // default mode: padded-oracle byte parity
      val expDefault = strSeq(c \ "default_output_lines")
      runCase(query, in.toString) match {
        case Right(lines) => assert(lines == expDefault,
          s"default mode diverged\ngot: $lines\nexp: $expDefault")
        case Left(msg) => fail(s"default mode must not error: $msg")
      }
      // strict mode
      spark.conf.set("spark.graft.json.strictKeys", "true")
      try {
        (c \ "strict_error") match {
          case JString(expErr) =>
            runCase(query, in.toString) match {
              case Left(msg) => assert(msg.contains(expErr),
                s"strict error mismatch\ngot: $msg\nexp contains: $expErr")
              case Right(lines) =>
                fail(s"strict mode must raise '$expErr', got rows: $lines")
            }
          case _ =>
            val expStrict = strSeq(c \ "strict_output_lines")
            runCase(query, in.toString) match {
              case Right(lines) => assert(lines == expStrict)
              case Left(msg) => fail(s"strict mode errored unexpectedly: $msg")
            }
        }
      } finally spark.conf.unset("spark.graft.json.strictKeys")
    }
  }
}
