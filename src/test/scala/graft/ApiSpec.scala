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
    val (c2, _) = Graft.exceptionToErrorInfo(
      intercept[Throwable](Graft.query(spark, "SELECT nosuchfn(a1)", sf("region")).collect()))
    assert(c2 == "query parsing")
    val (c3, m3) = Graft.exceptionToErrorInfo(new RuntimeException("boom"))
    assert(c3 == "query execution" && m3 == "boom")
  }

  test("FROM temp view resolution") {
    sf("region").createOrReplaceTempView("regions_v")
    val out = Graft.query(spark,
      "SELECT a.r_name FROM regions_v ORDER BY a.r_name LIMIT 2",
      spark.emptyDataFrame)
    assert(out.count() == 2)
  }
}
