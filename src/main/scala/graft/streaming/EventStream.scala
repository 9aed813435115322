package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators for the `events` stream shape
  * (event_id, ts, user_id, event_type, value).
  *
  * The reference is strictly batch (SURVEY §2.9) — this is part of the
  * beyond-reference pipeline surface: the same transforms run identically
  * on a batch DataFrame or a readStream DataFrame, the streaming-specific
  * parts being watermarks (bounded state under lateness) and keyed state
  * (sessionization). State is partitioned by key — scales with executor
  * count, never driver-bound.
  */
object EventStream {

  /** Tumbling-window counts + value sums per event type with a watermark
    * bounding state for late data. Works on both batch and streaming
    * inputs. */
  /** Accept `ts` as a timestamp OR as integral epoch-nanos: integral
    * columns convert to TIMESTAMP by micros truncation (a scalar
    * projection — window()/watermark need a real time type, and the
    * batch events table may carry either encoding; round-9 unit
    * contract, see [[graft.pipeline.Temporal.epochNanos]]). */
  private def withTimestampTs(events: DataFrame, tsCol: String): DataFrame =
    events.schema.fields.find(_.name == tsCol).map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType |
                org.apache.spark.sql.types.IntegerType) =>
        events.withColumn(tsCol, timestamp_micros(expr(s"`$tsCol` div 1000")))
      // absent tsCol: fine for paths that never touch time (batch dedup)
      case _ => events
    }

  def windowedCounts(
      events: DataFrame,
      windowLen: String = "1 minute",
      watermark: String = "5 minutes"): DataFrame = {
    val ev = withTimestampTs(events, "ts")
    val withTs =
      if (ev.isStreaming) ev.withWatermark("ts", watermark) else ev
    withTs
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).alias("cnt"), sum(col("value")).alias("sv"))
      .select(col("window.start").alias("win_start"), col("event_type"),
        col("cnt"), col("sv"))
  }

  /** Native session windows over event time: Spark's `session_window`
    * merges events of one key that fall within `gap` of each other; the
    * window closes at last-event + gap. Runs identically on a batch
    * DataFrame (one hash exchange on (key, window) with map-side
    * partial merge) and on a stream (watermark bounds the open-session
    * state, so state size tracks ACTIVE sessions, not history — the
    * 100 TB-stream shape). Boundary semantics: an event exactly `gap`
    * after the previous one starts a NEW session (windows are
    * half-open `[start, last + gap)`).
    *
    * Returns (`keyCol`, session_start, session_end, n_events, sv). */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "30 minutes", keyCol: String = "user_id",
      tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    val ev = withTimestampTs(events, tsCol)
    val wEv = if (ev.isStreaming) ev.withWatermark(tsCol, watermark) else ev
    wEv.groupBy(col(keyCol), session_window(col(tsCol), gap).as("__sw"))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sv"))
      .select(col(keyCol), col("__sw.start").as("session_start"),
        col("__sw.end").as("session_end"), col("n_events"), col("sv"))
  }

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(count: Long, totalValue: Double, lastTs: Long)
  case class Session(user_id: Long, n_events: Long, total_value: Double)

  /** Keyed sessionization via mapGroupsWithState: per-user running session
    * closed after `gapMs` of inactivity (processing-time timeout). Pass
    * GroupStateTimeout.NoTimeout for a pure running-aggregate session
    * (no timer-driven micro-batches — deterministic in tests). */
  def sessionize(events: Dataset[Event], gapMs: Long = 60000,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, Session](timeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Session(userId, s.count, s.totalValue)
          } else {
            val evs = batch.toSeq
            val prev = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
            val next = SessionState(
              prev.count + evs.size,
              prev.totalValue + evs.map(_.value).sum,
              math.max(prev.lastTs, evs.map(_.ts.getTime).foldLeft(0L)(math.max)))
            state.update(next)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              state.setTimeoutDuration(gapMs)
            Session(userId, next.count, next.totalValue)
          }
      }
  }

  case class MomentState(n: Long, mean: Double, m2: Double)
  case class AnomalyHit(user_id: Long, event_id: Long, value: Double,
      z: Double)

  /** Streaming per-key anomaly detection: each event's `value` scored
    * against the key's OWN running mean/deviation (Welford's online
    * moments — constant state per key: one count and two doubles,
    * regardless of stream length), emitting events with |z| > `zThresh`
    * once at least `minN` prior observations exist. The z-score is
    * PREQUENTIAL — computed against the state BEFORE the event updates
    * it, so an extreme value cannot mask itself by inflating the
    * deviation it is judged against, and re-running the same batches
    * reproduces the same hits.
    *
    * The streaming twin of [[graft.pipeline.Temporal.rollingZScore]]:
    * that one standardizes against a trailing TIME window in batch;
    * this one maintains lifetime moments incrementally so the monitor
    * never rescans history. flatMapGroupsWithState keyed by user —
    * state is partitioned across executors and checkpointable; events
    * within a micro-batch apply in (ts, event_id) order so arrival
    * interleaving inside a batch cannot flip a verdict. */
  def anomalyStream(events: Dataset[Event], minN: Int = 5,
      zThresh: Double = 3.0): Dataset[AnomalyHit] = {
    import events.sparkSession.implicits._
    require(minN >= 2, "minN must be >= 2 (deviation undefined below)")
    require(zThresh > 0, "zThresh must be positive")
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[MomentState, AnomalyHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[MomentState]) =>
          var s = state.getOption.getOrElse(MomentState(0L, 0.0, 0.0))
          val hits = scala.collection.mutable.ArrayBuffer.empty[AnomalyHit]
          batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            if (s.n >= minN) {
              val sd = math.sqrt(s.m2 / s.n)
              if (sd > 0) {
                val z = (e.value - s.mean) / sd
                if (math.abs(z) > zThresh)
                  hits += AnomalyHit(userId, e.event_id, e.value, z)
              }
            }
            val n1 = s.n + 1
            val d = e.value - s.mean
            val mean1 = s.mean + d / n1
            s = MomentState(n1, mean1, s.m2 + d * (e.value - mean1))
          }
          state.update(s)
          hits.iterator
      }
  }

  /** Streaming drift monitor: per event-time window, the PSI of the
    * live `catCol` mix against a FIXED reference distribution (e.g. the
    * trained-on corpus mix) — one row per closed window with its psi.
    * The alarm wire for "the incoming feed stopped looking like the
    * data the downstream model saw": psi < 0.1 calm, > 0.25 investigate.
    *
    * `refDist` fixes the category set up front (its keys; anything else
    * counts into `__other` with reference mass `eps`), which is what
    * lets the whole computation be ONE stateful windowed aggregate —
    * one conditional-count column per category, psi assembled map-side
    * from the single result row. No second aggregation, so ordinary
    * watermark/Append semantics apply and state is bounded by windows
    * in flight × (|refDist| + 2) longs. Reference shares are
    * renormalized (with `eps` floors) so callers may pass raw counts.
    * Runs identically on a batch frame (no watermark, all windows). */
  def driftMonitor(events: DataFrame, catCol: String,
      refDist: Map[String, Double], windowLen: String = "10 minutes",
      watermark: String = "10 minutes", tsCol: String = "ts",
      eps: Double = 1e-6): DataFrame = {
    require(refDist.nonEmpty, "refDist must be non-empty")
    require(refDist.values.forall(_ >= 0), "reference masses must be >= 0")
    val cats = refDist.keys.toSeq.sorted
    val refTotal = refDist.values.sum
    require(refTotal > 0, "reference distribution has no mass")
    val refP = cats.map(c => math.max(refDist(c) / refTotal, eps)) :+ eps
    val ev = withTimestampTs(events, tsCol)
    val wEv = if (ev.isStreaming) ev.withWatermark(tsCol, watermark) else ev
    val counts = cats.map(c =>
      sum(when(col(catCol) === c, 1L).otherwise(0L)).alias(s"__n_$c")) :+
      sum(when(!col(catCol).isin(cats.map(lit): _*), 1L).otherwise(0L))
        .alias("__n_other")
    val agg = wEv.groupBy(window(col(tsCol), windowLen).alias("__w"))
      .agg(counts.head, counts.tail: _*)
    val total = (cats.map(c => col(s"__n_$c")) :+ col("__n_other"))
      .reduce(_ + _)
    val terms = cats.zipWithIndex.map { case (c, i) =>
      val p = greatest(col(s"__n_$c") / total, lit(eps))
      (p - refP(i)) * log(p / refP(i))
    } :+ {
      val p = greatest(col("__n_other") / total, lit(eps))
      (p - refP.last) * log(p / refP.last)
    }
    agg.select(col("__w.start").alias("window_start"),
      col("__w.end").alias("window_end"),
      total.alias("n_events"),
      graft.pipeline.Rounding.halfUp(terms.reduce(_ + _), 6).alias("psi"))
  }

  /** Streaming exact dedup on a key column: keeps the first event per key,
    * with state bounded by the watermark (dropDuplicatesWithinWatermark —
    * a key's state is dropped once it is older than the watermark, so the
    * store never grows unboundedly; re-arrivals inside the window are
    * suppressed, the training-data contract). Batch inputs fall back to
    * plain dropDuplicates. */
  def dedupStream(
      events: DataFrame,
      keyCols: Seq[String],
      watermark: String = "10 minutes",
      tsCol: String = "ts"): DataFrame = {
    val ev = withTimestampTs(events, tsCol)
    if (ev.isStreaming)
      ev.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(keyCols)
    else ev.dropDuplicates(keyCols)
  }

  /** Stream-static enrichment: join an unbounded event stream to a
    * bounded dimension table. The dimension side broadcasts (explicit —
    * stream-static joins must never plan the static side as a
    * stream-blocking shuffle build), so the plan stays a stateless
    * per-batch projection: no watermark, no state store, append-safe.
    * The 100 TB shape: the stream partitions by source, the dimension
    * rides once per executor. */
  def enrichStream(events: DataFrame, dim: DataFrame,
      keyCols: Seq[String]): DataFrame =
    events.join(broadcast(dim), keyCols)

  /** Watermarked stream-stream interval join: match each `right` event
    * to `left` events of the same `keyCol` within
    * (right.ts − `within`, right.ts] — attribution over two live
    * streams ("which click preceded this purchase"). BOTH sides carry
    * watermarks and the join condition bounds the time skew, so
    * Structured Streaming can prove state eviction: each side's state
    * store holds only `watermark + within` of history per key — the
    * state-bounding contract stream-stream joins require (an unbounded
    * join condition would grow state forever and is rejected for
    * append output). `ts` columns accept timestamps or epoch-nanos
    * (the temporal unit contract). Output: key, left payload columns
    * (`lCols`), right payload columns (`rCols`), both ts columns as
    * `ts_left`/`ts_right`. */
  def correlateStreams(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, within: String, watermark: String,
      lCols: Seq[String], rCols: Seq[String]): DataFrame = {
    val l = withTimestampTs(left, tsCol).withWatermark(tsCol, watermark)
      .select((Seq(col(keyCol), col(tsCol).as("ts_left")) ++
        lCols.map(col)): _*)
    val r = withTimestampTs(right, tsCol).withWatermark(tsCol, watermark)
      .select((Seq(col(keyCol).as("__rk"), col(tsCol).as("ts_right")) ++
        rCols.map(col)): _*)
    l.join(r,
      col(keyCol) === col("__rk") &&
        col("ts_left") <= col("ts_right") &&
        col("ts_left") > col("ts_right") - expr(s"INTERVAL $within"))
      .drop("__rk")
  }

  /** Wire a streaming query to an in-memory sink (testing / demo). */
  def startToMemory(df: DataFrame, name: String,
      outputMode: OutputMode = OutputMode.Update()): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream.format("memory").queryName(name).outputMode(outputMode).start()
}
