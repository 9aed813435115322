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
    val out = EventStream.windowedCounts(sf("events"))
    assert(out.count() > 0)
    assert(out.columns.toSeq == Seq("win_start", "event_type", "cnt", "sv"))
  }

  test("session_window sessions run on the batch events table") {
    val out = EventStream.sessionWindows(sf("events"), gap = "30 minutes")
    assert(out.columns.toSeq == Seq("user_id", "session_start",
      "session_end", "n_events", "sv"))
    assert(out.count() > 0)
    // windows close at last-event + gap
    val bad = out.filter(col("session_end") <= col("session_start")).count()
    assert(bad == 0)
  }

  test("session_window merges within the gap and splits at >= gap on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = mem.toDF().toDF("user_id", "ts", "value")
    // session aggregations only support Append: a session emits once the
    // watermark passes its end, so a later batch must advance event time
    val q = EventStream.startToMemory(
      EventStream.sessionWindows(df, gap = "1 minute",
        watermark = "1 minute"), "sw",
      org.apache.spark.sql.streaming.OutputMode.Append())
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    mem.addData((1L, t("2024-01-01 00:00:00"), 1.0),
      (1L, t("2024-01-01 00:00:30"), 2.0), // merges (30s < 1m)
      (1L, t("2024-01-01 00:02:00"), 4.0)) // splits (90s >= 1m)
    q.processAllAvailable()
    mem.addData((1L, t("2024-01-01 00:30:00"), 8.0)) // advances watermark
    q.processAllAvailable()
    val rows = spark.table("sw")
      .select("n_events", "sv").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    q.stop()
    // both closed sessions flushed; the 00:30 session is still open
    assert(rows == Set((2L, 3.0), (1L, 4.0)))
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

  test("canary blocklist filters a live stream (the AC expression is stream-safe)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF().toDF("doc_id", "text")
    val q = graft.pipeline.Dedup.removeCanaries(df, "text",
        Seq("canary-guid-77"))
      .writeStream.format("memory").queryName("canstream")
      .outputMode("append").start()
    mem.addData((1L, "clean doc"), (2L, "has canary-guid-77 inside"),
      (3L, "also clean"))
    q.processAllAvailable()
    val kept = spark.table("canstream").collect()
      .map(_.getLong(0)).toSet
    q.stop()
    assert(kept == Set(1L, 3L)) // map-side filter, no state, no watermark
  }

  test("drift monitor: per-window PSI against a fixed reference mix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ref = Map("click" -> 0.5, "view" -> 0.5)
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = mem.toDF().toDF("event_id", "ts", "event_type")
    val q = EventStream.driftMonitor(df, "event_type", ref,
      windowLen = "1 minute", watermark = "0 seconds")
      .writeStream.format("memory").queryName("drift")
      .outputMode("update").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // window 1: exactly the reference mix → psi ≈ 0
    mem.addData((1L, t("2024-01-01 00:00:10"), "click"),
      (2L, t("2024-01-01 00:00:20"), "view"),
      (3L, t("2024-01-01 00:00:30"), "click"),
      (4L, t("2024-01-01 00:00:40"), "view"))
    // window 2: all one category + an unseen category → large psi
    mem.addData((5L, t("2024-01-01 00:01:10"), "click"),
      (6L, t("2024-01-01 00:01:20"), "click"),
      (7L, t("2024-01-01 00:01:30"), "purchase"))
    q.processAllAvailable()
    val rows = spark.table("drift").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    q.stop()
    assert(rows.length == 2, s"got ${rows.toSeq}")
    assert(rows(0)._2 == 4L && rows(0)._3 == 0.0, s"calm window: ${rows(0)}")
    assert(rows(1)._2 == 3L && rows(1)._3 > 0.25, s"drifted window: ${rows(1)}")
    // batch parity: same call, same numbers, no stream
    val batch = Seq(
      (1L, t("2024-01-01 00:00:10"), "click"),
      (2L, t("2024-01-01 00:00:20"), "view"))
      .toDF("event_id", "ts", "event_type")
    val b = EventStream.driftMonitor(batch, "event_type", ref,
      windowLen = "1 minute").head()
    assert(b.getDouble(3) == 0.0)
  }

  test("anomaly stream flags outliers prequentially with persistent state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.anomalyStream(mem.toDS(), minN = 5, zThresh = 3.0)
      .writeStream.format("memory").queryName("anom")
      .outputMode("append").start()
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // batch 1: an extreme value FIRST — below minN, never flagged (and
    // it must not poison later verdicts more than its moment share)
    mem.addData(
      EventStream.Event(1, ts, 7L, "m", 10.0),
      EventStream.Event(2, ts, 7L, "m", 12.0),
      EventStream.Event(3, ts, 7L, "m", 11.0),
      EventStream.Event(4, ts, 7L, "m", 9.0),
      EventStream.Event(5, ts, 7L, "m", 10.5))
    q.processAllAvailable()
    assert(spark.table("anom").count() == 0) // baseline only, no flags
    // batch 2: state carried over — the spike trips, the normal doesn't;
    // user 8 has no history, so its identical spike value stays silent
    mem.addData(
      EventStream.Event(6, ts, 7L, "m", 11.5),
      EventStream.Event(7, ts, 7L, "m", 100.0),
      EventStream.Event(8, ts, 8L, "m", 100.0))
    q.processAllAvailable()
    val hits = spark.table("anom").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(hits == Set((7L, 7L)), s"got $hits")
    // prequential: the spike's own mass is excluded from the deviation
    // it is judged against — recompute the expected z by hand
    val base = Seq(10.0, 12.0, 11.0, 9.0, 10.5, 11.5)
    val mean = base.sum / base.size
    val sd = math.sqrt(base.map(v => (v - mean) * (v - mean)).sum / base.size)
    val zRow = spark.sql("SELECT z FROM anom WHERE event_id = 7").head()
    assert(math.abs(zRow.getDouble(0) - (100.0 - mean) / sd) < 1e-9)
  }

  test("doc ingest: streaming dedup + quality gate + pii scrub") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val goodText = ("spark catalyst tungsten shuffle exchange broadcast " +
      "partition codegen plan optimizer executor driver stage task lineage " +
      "mail me at a@b.com sometime").trim
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = mem.toDF().toDF("doc_id", "ts", "text")
    val q = graft.streaming.DocStream.ingest(df, minQuality = 0.3)
      .writeStream.format("memory").queryName("ing")
      .outputMode("append").start()
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:10")
    mem.addData((1L, t, goodText), (2L, t, "low low low low"))
    q.processAllAvailable()
    // same content, different id: suppressed by the fingerprint dedup
    mem.addData((3L, t, goodText))
    q.processAllAvailable()
    val rows = spark.table("ing").collect()
    q.stop()
    // doc 2 fails the quality gate; doc 3 is a content dup of doc 1
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L))
    assert(rows.head.getAs[String]("text").contains("<EMAIL>"))
    assert(rows.head.getAs[Double]("quality") >= 0.3)
  }

  test("streaming minhash probe flags near-dups against the standing index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "completely different content about catalyst optimizer internals"),
      (3L, "another unrelated document mentioning vectors and similarity")
    ).toDF("doc_id", "text")
    val index = graft.pipeline.Dedup.minhashIndex(corpus, "text", "doc_id")
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF().toDF("doc_id", "text")
    // one changed word in an 13-word doc alters 3 of 11 3-shingles
    // (J ≈ 0.57), so probe at 0.5
    val q = graft.streaming.DocStream.probeStream(index, df,
      jaccardThreshold = 0.5) { (matches, _) =>
      seen.synchronized {
        seen ++= matches.collect().map(r => (r.getLong(0), r.getLong(1)))
      }
    }
    // 100: near-dup of corpus doc 1 (one word changed); 101: novel text
    mem.addData(
      (100L, "the quick brown fox jumps over the lazy dog near a river bank"),
      (101L, "novel text with no counterpart in the standing corpus at all"))
    q.processAllAvailable()
    // second batch: exact copy of corpus doc 2
    mem.addData((102L, "completely different content about catalyst optimizer internals"))
    q.processAllAvailable()
    q.stop()
    val matches = seen.toSet
    assert(matches.contains((100L, 1L)), s"near-dup missed: $matches")
    assert(matches.contains((102L, 2L)), s"exact dup missed: $matches")
    assert(!matches.exists(_._1 == 101L), s"novel doc flagged: $matches")
  }

  test("probe stream restarts from its checkpoint: committed batches not re-delivered, later data not missed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "completely different content about catalyst optimizer internals")
    ).toDF("doc_id", "text")
    val index = graft.pipeline.Dedup.minhashIndex(corpus, "text", "doc_id")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    // (batchId, probe doc, corpus doc) — batchId recorded so re-delivery
    // of an already-committed batch after restart is distinguishable
    // from a legitimate new match
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF().toDF("doc_id", "text")
    def start() = graft.streaming.DocStream.probeStream(index, df,
      jaccardThreshold = 0.5, checkpoint = Some(ckpt)) { (matches, bid) =>
      seen.synchronized {
        seen ++= matches.collect().map(r => (bid, r.getLong(0), r.getLong(1)))
      }
    }
    val q1 = start()
    mem.addData(
      (100L, "the quick brown fox jumps over the lazy dog near a river bank"),
      (101L, "novel text with no counterpart in the standing corpus at all"))
    q1.processAllAvailable()
    q1.stop()
    // data arriving while the query is DOWN, then a restart from the
    // same checkpoint over the same source
    mem.addData((102L, "completely different content about catalyst optimizer internals"))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val all = seen.toIndexedSeq
    // the pre-restart batch was committed: exactly one delivery of its
    // match, none after restart
    assert(all.count(_._2 == 100L) == 1, s"batch-1 match re-delivered: $all")
    // the while-down data is picked up by the restarted query
    assert(all.count(_._2 == 102L) == 1, s"post-restart batch missed: $all")
    assert(!all.exists(_._2 == 101L), s"novel doc flagged: $all")
    // offsets resumed, not reset: the restarted batch id advances past
    // the committed one
    val b1 = all.find(_._2 == 100L).get._1
    val b2 = all.find(_._2 == 102L).get._1
    assert(b2 > b1, s"batch ids did not advance across restart: $all")
  }

  test("streaming IVF-PQ encode stamps batches with the batch operator's cells/codes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = sf("embeddings")
    val coarse = graft.pipeline.Clustering.fitKMeans(emb, "embedding",
      "vec_id", k = 4, maxIter = 2)
    val pq = graft.pipeline.Clustering.fitPQ(emb, "embedding", "vec_id",
      m = 8, k = 8, maxIter = 2)
    val rows = emb.limit(6).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Seq[Int])]
    val mem = MemoryStream[(Long, Seq[Float])]
    val df = mem.toDF().toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val q = graft.streaming.DocStream.encodeStream(df, coarse, pq) {
      (encoded, _) =>
        got.synchronized {
          got ++= encoded.collect().map(r => (
            r.getLong(r.fieldIndex("vec_id")),
            r.getInt(r.fieldIndex("ivf_cell")),
            r.getSeq[Int](r.fieldIndex("pq_code"))))
        }
    }
    mem.addData(rows.take(3).toIndexedSeq)
    q.processAllAvailable()
    mem.addData(rows.drop(3).toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    // the stream's cells and codes must equal the batch operator's on
    // the same vectors — ingest and backfill cannot drift
    val batch = graft.pipeline.Clustering
      .buildIvfPq(emb.limit(6), "embedding", coarse, pq)
      .collect().map(r => (
        r.getLong(r.fieldIndex("vec_id")),
        r.getInt(r.fieldIndex("ivf_cell")),
        r.getSeq[Int](r.fieldIndex("pq_code")))).toSet
    assert(got.toSet == batch, s"stream/batch drift:\n${got.toSet}\nvs\n$batch")
    assert(got.size == 6)
  }

  test("doc ingest runs identically on batch input") {
    import spark.implicits._
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:10")
    val good = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val out = graft.streaming.DocStream.ingest(
      Seq((1L, t, good), (2L, t, good), (3L, t, "x x x x"))
        .toDF("doc_id", "ts", "text"), minQuality = 0.3)
    // batch dropDuplicates keeps ONE of the two identical docs (which one
    // is partitioning-dependent); the low-quality doc is always gone
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids.length == 1 && Set(1L, 2L).contains(ids.head), ids.toString)
  }

  test("stream-static enrichment broadcasts the dimension, stays stateless") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("click", "interactive"), ("view", "passive"))
      .toDF("event_type", "kind")
    val mem = MemoryStream[(Long, String)]
    val enriched = EventStream.enrichStream(
      mem.toDF().toDF("event_id", "event_type"), dim, Seq("event_type"))
    val q = EventStream.startToMemory(enriched, "enriched",
      org.apache.spark.sql.streaming.OutputMode.Append())
    mem.addData((1L, "click"), (2L, "view"), (3L, "error"))
    q.processAllAvailable()
    val rows = spark.table("enriched").collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("kind")).toMap
    q.stop()
    assert(rows == Map(1L -> "interactive", 2L -> "passive"))
  }

  test("stream-stream interval join attributes purchases to in-window views") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val views = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val buys = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val joined = EventStream.correlateStreams(
      views.toDF().toDF("user_id", "ts", "view_id"),
      buys.toDF().toDF("user_id", "ts", "buy_id"),
      "user_id", "ts", within = "1 minute", watermark = "1 minute",
      lCols = Seq("view_id"), rCols = Seq("buy_id"))
    val q = EventStream.startToMemory(joined, "attrib",
      org.apache.spark.sql.streaming.OutputMode.Append())
    // user 1: views at 30s (in-window) and purchase at 60s; a view at
    // 300s is AFTER the purchase; user 2's view must not cross users
    views.addData((1L, t(30), 101L), (1L, t(300), 102L), (2L, t(40), 201L))
    buys.addData((1L, t(60), 901L))
    q.processAllAvailable()
    // advance both watermarks past the window so results finalize
    // (distinct users, so the sentinels cannot join each other)
    views.addData((8L, t(4000), 999L))
    buys.addData((9L, t(4000), 998L))
    q.processAllAvailable()
    val rows = spark.table("attrib").collect()
      .map(r => (r.getAs[Long]("view_id"), r.getAs[Long]("buy_id")))
    q.stop()
    assert(rows.toSet == Set((101L, 901L)), rows.mkString(","))
  }

  test("streaming classifier gate scores a live stream identically to batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val labeled = ((1L to 20L).map(i =>
      (i, s"the experiment measured a clear signal in trial $i", 1)) ++
      (21L to 40L).map(i =>
        (i, s"click here free offer winner prize claim now $i", 0)))
      .toDF("doc_id", "text", "y")
    val model = graft.pipeline.Classify.fitNaiveBayes(labeled, "text",
      "doc_id", "y", buckets = 1024, alpha = 0.5)
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = EventStream.startToMemory(
      graft.streaming.DocStream.scoreStream(stream, model, minScore = 0.0),
      "scored")
    mem.addData((101L, "experiment measured a clear signal"),
      (102L, "free offer winner prize"))
    q.processAllAvailable()
    val rows = spark.table("scored").collect()
    q.stop()
    // only the positive-class doc clears the gate, with the BATCH score
    assert(rows.map(_.getLong(0)).toSeq == Seq(101L))
    val batchScore = graft.pipeline.Classify.score(
      Seq((101L, "experiment measured a clear signal")).toDF("doc_id", "text"),
      "text", "doc_id", model).select("score").head().getDouble(0)
    assert(rows.head.getAs[Double]("score") == batchScore)
  }
}
