package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStream

class StreamingSpec extends SparkSpec {

  test("windowed counts over a memory stream with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStream.startToMemory(
      EventStream.windowedCounts(df, "1 minute", "2 minutes"), "wc")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:10")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:30")
    val t2 = java.sql.Timestamp.valueOf("2024-01-01 00:01:10")
    mem.addData((1L, t0, 1L, "click", 1.0), (2L, t1, 2L, "click", 2.0),
      (3L, t2, 1L, "error", 5.0))
    q.processAllAvailable()
    val rows = spark.table("wc").collect()
    q.stop()
    assert(rows.nonEmpty)
    val click = rows.find(_.getString(1) == "click").get
    assert(click.getLong(2) == 2L)
    assert(click.getDouble(3) == 3.0)
  }

  test("windowed counts also run on the batch events table") {
    val out = EventStream.windowedCounts(
      sf("events").withColumn("ts", timestamp_seconds(col("ts").cast("double") / 1e9)))
    assert(out.count() > 0)
    assert(out.columns.toSeq == Seq("win_start", "event_type", "cnt", "sv"))
  }

  test("streaming dedup keeps first arrival per key within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = mem.toDF().toDF("event_id", "ts", "payload")
    val q = EventStream.startToMemory(
      EventStream.dedupStream(df, Seq("event_id"), "10 minutes"), "dd",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:10")
    mem.addData((1L, t, "first"), (2L, t, "two"))
    q.processAllAvailable()
    mem.addData((1L, t, "dup-suppressed"), (3L, t, "three"))
    q.processAllAvailable()
    val rows = spark.table("dd").collect()
    q.stop()
    assert(rows.length == 3)
    assert(rows.find(_.getLong(0) == 1L).get.getString(2) == "first")
    // batch fallback
    val b = EventStream.dedupStream(
      Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("event_id", "x"), Seq("event_id"))
    assert(b.count() == 2)
  }

  test("sessionization accumulates per-user state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.sessionize(mem.toDS(), gapMs = 60000,
      timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("sess")
      .outputMode("update").start()
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    mem.addData(
      EventStream.Event(1, ts, 7L, "click", 1.5),
      EventStream.Event(2, ts, 7L, "click", 2.5),
      EventStream.Event(3, ts, 8L, "view", 1.0))
    q.processAllAvailable()
    val rows = spark.table("sess").collect()
    q.stop()
    val u7 = rows.find(_.getLong(0) == 7L).get
    assert(u7.getLong(1) == 2L)
    assert(u7.getDouble(2) == 4.0)
  }
}
