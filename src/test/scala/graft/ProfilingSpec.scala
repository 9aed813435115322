package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Profiling

class ProfilingSpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.0), (2.0, null), (3.0, 30.0), (4.0, 40.0))
      .toDF("a", "b")
  }

  test("describe computes count, nulls, min/max/mean and exact median") {
    val got = Profiling.describe(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    assert(got("a") == ((4L, 0L, 1.0, 4.0, 2.5, 2.5)))
    // b: nulls excluded from stats; median of {10,30,40} = 30
    assert(got("b") == ((3L, 1L, 10.0, 40.0, 26.666667, 30.0)))
  }

  test("all statistics run in a single aggregate pass") {
    val plan = Profiling.describe(df, Seq("a", "b"))
      .queryExecution.executedPlan.toString
    val aggregates = "(?m)^\\s*\\+?-?\\s*(SortAggregate|HashAggregate|ObjectHashAggregate)"
      .r.findAllIn(plan).length
    // partial + final of ONE aggregate (not one per column)
    assert(aggregates <= 2, s"expected one aggregate pair:\n$plan")
  }
}
