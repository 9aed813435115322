package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JSON Lines scan preserving the reference's "whole object lands in a1"
  * semantics (/root/reference/rbql-py/rbql/rbql_json.py:73-156): one JSON
  * value per line becomes a single VARIANT column `a1`; blank lines are
  * skipped. Nested access works via a1['address']['street'] — Spark 4
  * variant extraction. */
object JsonLinesSource {
  def read(spark: SparkSession, path: String): DataFrame = {
    spark.read.text(path)
      .filter(trim(col("value")) =!= "")
      .select(parse_json(col("value")).alias("a1"))
  }
}
