package graft

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Data-driven runner over the reference's JSON-lines corpus
  * (/root/reference/test/json_files_unit_tests.json, 5 cases; runner
  * test/test_json_io.py). Queries run through `Graft.queryJsonLines`
  * (whole object → a1 VARIANT) and results are written with the real
  * JSON sink (single column unwraps to bare values, like the reference's
  * writer). Comparison is semantic: per line, the ordered VALUES of the
  * JSON payload — the reference names multi-column outputs col0..colN
  * (0-based) where graft uses its own header rules, so key names are not
  * part of the contract. */
class JsonCorpusSpec extends SparkSpec {

  private val testsDir = "/root/reference/test"
  private val corpusFile = new java.io.File(s"$testsDir/json_files_unit_tests.json")

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

  /** Ordered value list of one JSON line; a non-object line is a single
    * bare value. */
  private def lineValues(line: String): List[JValue] =
    JsonMethods.parse(line) match {
      case JObject(fields) => fields.map(_._2)
      case other           => List(other)
    }

  /** Whole-object lines (identity queries) compare as objects. */
  private def parseLine(line: String): JValue = JsonMethods.parse(line)

  for ((c, idx) <- cases.zipWithIndex) {
    val name = strOpt(c \ "test_name").getOrElse(s"case_$idx")
    val query = strOpt(c \ "query_python").get
    test(s"json-corpus[$idx]: $name") {
      val input = s"$testsDir/${strOpt(c \ "input_table_path").get}"
      val expectedPath = s"$testsDir/${strOpt(c \ "expected_output_table_path").get}"
      val df = Graft.queryJsonLines(spark, query, input)
      val outDir = java.nio.file.Files.createTempDirectory("graftjson").toString
      sinks.Sinks.writeJsonLines(df.coalesce(1), outDir)
      val gotLines = new java.io.File(outDir).listFiles()
        .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
        .flatMap(f => scala.io.Source.fromFile(f, "UTF-8").getLines()).toSeq
      val expLines = scala.io.Source.fromFile(expectedPath, "UTF-8").getLines().toSeq
      assert(gotLines.length == expLines.length,
        s"row count ${gotLines.length} != ${expLines.length}\nquery: $query")
      val identity = expectedPath.endsWith(strOpt(c \ "input_table_path").get.split('/').last)
      gotLines.zip(expLines).zipWithIndex.foreach { case ((g, e), i) =>
        (parseLine(g), parseLine(e)) match {
          // same keyset (identity or bare-object output): order-free object
          // compare — Spark's variant serializer sorts keys, the reference
          // preserves insertion order; content is the contract
          case (JObject(gf), JObject(ef))
              if identity || gf.map(_._1).toSet == ef.map(_._1).toSet =>
            assert(gf.toMap == ef.toMap, s"line $i\nquery: $query\ngot: $g\nexp: $e")
          // different key names (reference col0..N vs graft headers):
          // ordered values are the contract
          case _ =>
            assert(lineValues(g) == lineValues(e), s"line $i\nquery: $query\ngot: $g\nexp: $e")
        }
      }
    }
  }

  test("json-corpus accounting") {
    assert(cases.size == 5)
  }
}
