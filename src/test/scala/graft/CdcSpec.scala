package graft

import graft.pipeline.Cdc
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "one", 10), (2L, "two", 20), (3L, "three", 30), (4L, "four", 40))
    .toDF("id", "txt", "v")

  test("upsert replaces, delete removes, new key inserts, untouched survive") {
    val changes = Seq(
      (2L, "two-v2", 21, 1L, "u"),  // update existing
      (3L, "x", 0, 1L, "d"),        // delete existing
      (9L, "nine", 90, 1L, "u"))    // brand-new key
      .toDF("id", "txt", "v", "seq", "op")
    val got = Cdc.applyChanges(base, changes, "id", "seq", "op")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(got.toSeq == Seq(
      (1L, "one", 10), (2L, "two-v2", 21), (4L, "four", 40),
      (9L, "nine", 90)))
  }

  test("latest change per key wins across seq order") {
    val changes = Seq(
      (2L, "gone", 0, 1L, "d"), (2L, "resurrected", 22, 2L, "u"),
      (4L, "four-v2", 41, 1L, "u"), (4L, "x", 0, 2L, "d"))
      .toDF("id", "txt", "v", "seq", "op")
    val got = Cdc.applyChanges(base, changes, "id", "seq", "op")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq(
      (1L, "one"), (2L, "resurrected"), (3L, "three")))
  }

  test("merge plan anti-joins the base with a broadcast, never shuffles it") {
    val changes = Seq((2L, "two-v2", 21, 1L, "u"))
      .toDF("id", "txt", "v", "seq", "op")
    val plan = Cdc.applyChanges(base, changes, "id", "seq", "op")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
