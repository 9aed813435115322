package graft

import scala.util.{Failure, Success, Try}

/** Structural scale guard over the ENTIRE contract surface: no query in
  * `SparkEntry.queries` may plan a CartesianProduct — the one join
  * shape that cannot survive a 100× scale-up under any partitioning.
  * Intentional tiny cross joins (1-row aggregate normalizers crossed
  * onto results) plan as BroadcastNestedLoopJoin over a 1-row side and
  * are permitted; CartesianProductExec (both sides non-broadcast,
  * partition-pair enumeration) is not, anywhere, ever.
  *
  * The sweep plans every query against the sf0.001 parquet and fails
  * with the offending plan on any hit, so an accidental cross join
  * introduced in an operator's returned plan fails CI instead of
  * surfacing as a 100 TB incident. Scope caveat: EAGER operators
  * (triangleStats and the fit/gate queries that execute inside the
  * builder) run their internal jobs before this spec sees a plan — the
  * returned relation is their materialized result, so their internal
  * join shapes are covered by their own plan-audit/property specs, not
  * by this sweep. */
class PlanSweepSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("no contract query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        Try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
          if (plan.contains("CartesianProduct")) Some(name -> plan)
          else None
        } match {
          case Success(hit) => hit
          case Failure(e) =>
            // planning must not throw either — surface it as an offender
            Some(name -> s"PLANNING FAILED: ${e.getMessage}")
        }
    }
    assert(offenders.isEmpty,
      offenders.map { case (n, p) =>
        s"$n:\n${p.linesIterator.take(25).mkString("\n")}"
      }.mkString("\n\n"))
  }
}
