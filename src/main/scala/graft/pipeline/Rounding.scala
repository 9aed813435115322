package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-agnostic deterministic rounding: floor(x·10ⁿ + 0.5)/10ⁿ.
  * Spark's round() works on the shortest-decimal rendering of the double
  * (BigDecimal.valueOf) while DuckDB rounds the raw binary double — on
  * boundary values the two can disagree by one ulp of the last digit.
  * The floor formulation evaluates identically on identical input doubles
  * in every engine, which is what oracle hash-comparison needs. */
object Rounding {
  def halfUp(c: Column, digits: Int): Column = {
    val p = math.pow(10, digits)
    floor(c * p + lit(0.5)) / p
  }
}
