package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling: the one-pass summary a pipeline runs before deciding
  * partition counts, salt factors, and filter thresholds.
  *
  * `describe` emits one row per requested column — count, null count,
  * min/max/mean and EXACT median (Spark's `percentile`, interpolating
  * like DuckDB's `median`; `percentile_approx` would not oracle-match).
  * All statistics for all columns compute in ONE aggregate pass over the
  * table — never a job per column. State caveat: the exact percentile's
  * buffer grows with the column's DISTINCT values (a value→count map),
  * so on an unbounded-cardinality column at extreme scale swap it for
  * `percentile_approx` (constant state, no longer oracle-exact); the
  * other five statistics are constant-size. Mean and median round
  * half-up so engines compare bit-equal. */
object Profiling {

  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val aggs = cols.flatMap { c =>
      val v = col(c).cast("double")
      Seq(
        count(v).alias(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).alias(s"__nn_$c"),
        min(v).alias(s"__min_$c"),
        max(v).alias(s"__max_$c"),
        avg(v).alias(s"__mean_$c"),
        percentile(v, lit(0.5)).alias(s"__med_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // pivot the single wide row to long form inside the plan (no collect)
    val rows = cols.map { c =>
      struct(lit(c).alias("column"),
        col(s"__n_$c").alias("n"),
        col(s"__nn_$c").alias("n_null"),
        col(s"__min_$c").alias("min"),
        col(s"__max_$c").alias("max"),
        Rounding.halfUp(col(s"__mean_$c"), 6).alias("mean"),
        Rounding.halfUp(col(s"__med_$c"), 6).alias("median"))
    }
    wide.select(explode(array(rows: _*)).alias("s")).select(col("s.*"))
  }
}
