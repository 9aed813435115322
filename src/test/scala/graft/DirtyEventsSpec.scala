package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.{Profiling, Temporal}

/** Dirty event-stream and dirty metric robustness: real event tables
  * carry null timestamps and null keys (dropped tracking ids), and
  * metric columns carry null/NaN/Infinity (failed measurements).
  * Temporal and profiling operators must neither throw nor let a
  * corrupt row rewrite clean rows' answers. */
class DirtyEventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def events: DataFrame = Seq(
    ("u1", ts("2026-01-01 10:00:00"), 1L, "view"),
    ("u1", ts("2026-01-01 10:05:00"), 2L, "cart"),
    ("u1", ts("2026-01-01 12:00:00"), 3L, "view"),   // new session
    ("u2", ts("2026-01-01 09:00:00"), 4L, "view"),
    ("u2", null.asInstanceOf[Timestamp], 5L, "view"), // null ts
    (null.asInstanceOf[String], ts("2026-01-01 09:30:00"), 6L, "view"),
    ("u3", ts("1969-12-31 23:59:59"), 7L, "view"))    // pre-epoch
    .toDF("user_id", "event_ts", "event_id", "etype")

  test("sessionize/sessionStats survive null keys, null and pre-epoch ts") {
    val gapNs = 30L * 60 * 1_000_000_000L
    val s = Temporal.sessionize(events, "user_id", "event_ts", "event_id",
      gapNs).collect()
    assert(s.length == 7, "no rows dropped")
    val stats = Temporal.sessionStats(events, "user_id", "event_ts",
      "event_id", gapNs).collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(stats(Some("u1")) == 2L, "u1 splits into 2 sessions")
    // pre-epoch timestamps are legitimate times, not errors
    assert(stats(Some("u3")) == 1L)
  }

  test("asofJoin tolerates null timestamps on both sides") {
    val right = Seq(
      ("u1", ts("2026-01-01 09:59:00"), 101L, 10.0),
      ("u1", null.asInstanceOf[Timestamp], 102L, 99.0),
      ("u2", ts("2026-01-01 08:00:00"), 103L, 20.0))
      .toDF("user_id", "event_ts", "event_id", "price")
    val out = Temporal.asofJoin(events, right, "user_id", "event_ts",
      "event_id", Seq("price")).collect()
    assert(out.length == 7, "left-join semantics keep every left row")
    val byId = out.map(r => r.getAs[Long]("event_id") ->
      Option(r.getAs[Any]("asof_price"))).toMap
    assert(byId(1L).contains(10.0), "u1 10:00 matches 09:59 price")
    assert(byId(4L).contains(20.0))
  }

  test("profiling aggregates survive null/NaN/Infinity metrics") {
    val m = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0), ("b", 5.0),
      ("a", Double.NaN), ("b", Double.PositiveInfinity))
      .toDF("slice", "v")
      // the tuple encoder can't carry null primitives: null rows go
      // through Option
      .unionAll(Seq(("b", Option.empty[Double]), ("a", Option(6.0)))
        .toDF("slice", "v"))
    assert(Profiling.describe(m, Seq("v")).count() > 0)
    assert(Profiling.approxQuantiles(m, Seq("v"), Seq(0.5)).count() > 0)
    assert(Profiling.winsorizeBy(m, "v", "slice").count() > 0)
    assert(Profiling.madOutliersBy(m, "v", "slice").count() >= 0)
    assert(Profiling.welchT(m, "v", "slice", "a", "b").count() == 1)
    assert(Profiling.ksStatistic(m, "v", "slice", "a", "b").count() == 1)
    assert(Profiling.psiReport(m, "v", "slice", "a", "b",
      lo = 0.0, hi = 10.0, bins = 4).count() > 0)
  }
}
