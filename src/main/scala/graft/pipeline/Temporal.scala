package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Temporal operators over keyed event streams: sessionization, as-of
  * join, per-group top-k. Each is a single-shuffle-by-key plan — the
  * shapes that survive a 100 TB scale-up (no per-row range probe, no
  * self-join explosion, no global sort; every window and downstream
  * aggregate reuses the one hash exchange on the key).
  *
  * Unit contract: every operator here takes its time column in ANY
  * physical representation — integral epoch-nanos, TIMESTAMP,
  * TIMESTAMP_NTZ, or DATE — and normalizes it through [[epochNanos]]
  * before arithmetic, so gaps/grains/periods are ALWAYS epoch-nanosecond
  * quantities regardless of how the data landed on disk. (Round-8
  * lesson: the engine previously assumed integer time and silently
  * depended on `spark.sql.legacy.parquet.nanosAsLong` matching the
  * input's physical type; the moment the events table arrived as
  * `timestamp[us]` every gap comparison became interval-vs-bigint and
  * ANSI refused `cast(timestamp as bigint)`.) */
object Temporal {

  /** Epoch-nanoseconds BIGINT view of a time column, whatever its
    * physical type:
    *  - integral → passthrough (already epoch-nanos by contract);
    *  - TIMESTAMP → `unix_micros * 1000` (exact — no double round-trip);
    *  - TIMESTAMP_NTZ → wall-clock interpreted in the session timezone
    *    (graft sessions pin UTC, matching DuckDB's `epoch_ns` reading of
    *    the same parquet value) then as TIMESTAMP;
    *  - DATE → midnight UTC of that day.
    * Purely a scalar projection: adds no exchange, stays inside
    * whole-stage codegen, and a monotone function of the raw value — so
    * ordering by the raw column and by the normalized one agree. */
  def epochNanos(df: DataFrame, c: String): Column =
    epochNanosOf(df.schema(c).dataType, col(c), c)

  private[graft] def epochNanosOf(dt: DataType, c: Column, name: String): Column =
    dt match {
      case LongType | IntegerType | ShortType | ByteType => c.cast(LongType)
      case TimestampType => unix_micros(c) * lit(1000L)
      case TimestampNTZType => unix_micros(c.cast(TimestampType)) * lit(1000L)
      case DateType => unix_date(c).cast(LongType) * lit(86400L * 1000000000L)
      case other => throw new IllegalArgumentException(
        s"time column `$name` must be integral epoch-nanos, timestamp, " +
          s"timestamp_ntz, or date; got $other")
    }

  /** Assign per-key session ids (1-based, in time order): a new session
    * starts when the gap from the key's previous event exceeds `gap`
    * (epoch-nanoseconds; any [[epochNanos]]-normalizable `tsCol`).
    * `tieCol` makes the order total for deterministic ids under equal
    * timestamps.
    *
    * Plan: one hash exchange on `keyCol`; the lag and the running sum
    * share the window sort (single WindowExec). */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, gap: Long, sessionCol: String = "session_id"): DataFrame = {
    val tsNs = epochNanos(df, tsCol)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val prev = lag(tsNs, 1).over(w)
    val newSession =
      when(prev.isNull || tsNs - prev > gap, 1).otherwise(0)
    df.withColumn("__graft_ns", newSession)
      .withColumn(sessionCol, sum(col("__graft_ns"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__graft_ns")
  }

  /** Per-key session statistics: session count, event count, and the
    * largest session. Both aggregations run map-side relative to the
    * sessionize exchange (partitioning by key already clusters
    * (key, session_id)) — still ONE shuffle total. */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, gap: Long): DataFrame =
    sessionize(df, keyCol, tsCol, tieCol, gap)
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).alias("__graft_ev"))
      .groupBy(col(keyCol))
      .agg(
        max(col("session_id")).alias("n_sessions"),
        sum(col("__graft_ev")).alias("n_events"),
        max(col("__graft_ev")).alias("longest"))

  /** As-of join: for each left row, the nearest right row of the same
    * key in the requested `direction` (nulls when none — LEFT asof).
    * Output = all left columns + each requested right `payload` column
    * as `asof_<name>`.
    *
    *  - `direction = "backward"` (default): latest right with
    *    right.ts <= left.ts — the price-at-trade-time shape;
    *  - `"forward"`: earliest right with right.ts >= left.ts;
    *  - `"nearest"`: whichever of the two is closer in absolute time
    *    (ties prefer backward).
    *
    * `toleranceNs` (epoch-nanoseconds, default unlimited) nulls the
    * match when the time distance exceeds it — the pandas `merge_asof`
    * surface. Time columns normalize through [[epochNanos]], so the two
    * sides may even use different physical encodings.
    *
    * Implementation: tag and union the two sides, then ONE
    * key-partitioned window per needed direction carries the nearest
    * right ROW (a (ts, payloads…) struct via
    * `last/first(..., ignoreNulls)`); left rows read it, right rows are
    * dropped. A right row at exactly left.ts matches in every direction
    * (tag ordering places right rows on the inclusive side of the
    * frame). This is a SINGLE shuffle on the key — no per-row range
    * probe (O(n·m) join explosion) and no broadcast of either side;
    * both inputs stream through one exchange ("nearest" adds a second
    * in-partition sort, never a second exchange), so the shape is
    * identical at 100 TB. A right row whose payload value is null still
    * counts as an observation (the ROW matches, like SQL ASOF JOIN). */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, tieCol: String, payload: Seq[String],
      direction: String = "backward",
      toleranceNs: Long = Long.MaxValue): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    require(toleranceNs >= 0, "toleranceNs must be non-negative")
    val lrowType = org.apache.spark.sql.types.StructType(
      left.schema.fields.map(f => f.copy(nullable = true)))
    def rStruct(src: DataFrame): Column = struct(
      (epochNanos(src, tsCol).alias("__rts") +:
        payload.map(p => col(p).alias(s"__p_$p"))): _*)
    val rStructType = {
      val f = rStruct(right)
      right.select(f.alias("s")).schema("s").dataType
    }
    val l = left.select(
      col(keyCol).alias("__graft_k"),
      epochNanos(left, tsCol).alias("__graft_ns"),
      col(tieCol).cast("long").alias("__graft_tie"),
      lit(1).alias("__graft_tag"),
      struct(left.columns.map(col).toIndexedSeq: _*).alias("__graft_lrow"),
      lit(null).cast(rStructType).alias("__graft_r"))
    val r = right.select(
      col(keyCol).alias("__graft_k"),
      epochNanos(right, tsCol).alias("__graft_ns"),
      col(tieCol).cast("long").alias("__graft_tie"),
      lit(0).alias("__graft_tag"),
      lit(null).cast(lrowType).alias("__graft_lrow"),
      rStruct(right).alias("__graft_r"))
    val u = l.unionByName(r)
    val part = Window.partitionBy(col("__graft_k"))
    // backward: right (tag 0) sorts BEFORE an equal-ts left row, so the
    // preceding-inclusive frame sees it; forward: tag DESC puts right
    // AFTER the equal-ts left row, inside the following-inclusive frame.
    // Ties among equal-ts right rows resolve to the SMALLEST tieCol in
    // BOTH directions: `last` carries the final right row of the
    // winning ts group, so backward orders ties descending (its last =
    // smallest), while forward's `first` takes ties ascending.
    val wB = part
      .orderBy(col("__graft_ns"), col("__graft_tag"), col("__graft_tie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = part
      .orderBy(col("__graft_ns"), col("__graft_tag").desc, col("__graft_tie"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val needB = direction != "forward"
    val needF = direction != "backward"
    val withCarry = {
      var d = u
      if (needB) d = d.withColumn("__graft_b",
        last(col("__graft_r"), ignoreNulls = true).over(wB))
      if (needF) d = d.withColumn("__graft_f",
        first(col("__graft_r"), ignoreNulls = true).over(wF))
      d
    }
    val ns = col("__graft_ns")
    val bDelta = ns - col("__graft_b.__rts")
    val fDelta = col("__graft_f.__rts") - ns
    val bOk = if (needB) col("__graft_b").isNotNull && bDelta <= toleranceNs
      else lit(false)
    val fOk = if (needF) col("__graft_f").isNotNull && fDelta <= toleranceNs
      else lit(false)
    val chosen = direction match {
      case "backward" => when(bOk, col("__graft_b"))
      case "forward" => when(fOk, col("__graft_f"))
      case "nearest" =>
        when(bOk && (!fOk || bDelta <= fDelta), col("__graft_b"))
          .when(fOk, col("__graft_f"))
    }
    withCarry.filter(col("__graft_tag") === 1)
      .withColumn("__graft_m", chosen)
      .select(left.columns.map(c =>
        col("__graft_lrow").getField(c).alias(c)).toIndexedSeq ++
        payload.map(p =>
          col("__graft_m").getField(s"__p_$p").alias(s"asof_$p")): _*)
  }

  /** Floor-division bucket of the SQL fragment `x` (must evaluate to
    * BIGINT) at `grain`, computed entirely in 64-bit integer arithmetic.
    * `floor(x / grain)` is NOT equivalent: Spark promotes long/long
    * division to double, and epoch-nano timestamps (~1.7e18) exceed
    * double's 53-bit mantissa (ulp ≈ 256 ns there), so values within
    * half an ulp of a grain boundary get bucket ids that disagree with
    * the integer grain — boundaries drift, and bucket ids stop matching
    * what any exact-arithmetic consumer (z-order, retention, an external
    * system) computes for the same grain. (Double rounding is monotone,
    * so the join itself stays pair-complete either way — this is about
    * exact, portable bucket semantics, and long `div` is cheaper than
    * the long→double→floor→long round-trip.) SQL `div` truncates toward
    * zero, so negative values need the −1 adjustment to keep floor
    * semantics (same pattern as [[cohortRetention]]). */
  private def floorBucketSql(x: String, grain: Long): String =
    s"""CASE WHEN ($x) >= 0 OR ($x) % $grain = 0
         THEN ($x) div $grain
         ELSE ($x) div $grain - 1 END"""

  private def floorBucket(colName: String, grain: Long): Column =
    expr(floorBucketSql(s"`$colName`", grain))

  /** Interval join: each point row matched to every interval row whose
    * `[startCol, endCol]` (inclusive) contains its `ptCol`, optionally
    * under additional equi-`keys`. The event-enrichment shape: log line
    * → deployment window, event → campaign, reading → maintenance slot.
    *
    * Spark's native plan for a pure range predicate is
    * BroadcastNestedLoopJoin — O(points × intervals) compares, the
    * classic trap once the interval side no longer fits in memory. Here
    * both sides bucket time at `grain`: a point belongs to exactly ONE
    * bucket, an interval is exploded onto the buckets it covers, and the
    * join is an ordinary hash equi-join on (keys…, bucket) with the
    * residual containment filter — one shuffle pair, nested-loop-free
    * at ANY size, and each (point, interval) pair meets in at most one
    * bucket so no dedup pass is needed.
    *
    * `grain` trades interval replication (an interval explodes into
    * length/grain + 1 rows) against bucket selectivity (a too-coarse
    * grain puts unrelated rows in one bucket and pushes work into the
    * residual filter): pick it near the median interval length. Very
    * long outlier intervals replicate proportionally — cap or split
    * them upstream if the interval-length distribution is heavy-tailed. */
  def intervalJoin(points: DataFrame, intervals: DataFrame, ptCol: String,
      startCol: String, endCol: String, grain: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(grain > 0, "grain must be positive")
    // normalize each side to epoch-nanos FIRST: the two sides may use
    // different physical encodings (timestamp events vs long-typed
    // windows), and the bucket ids + residual filter must compare in one
    // unit, not across types
    val pb = points.withColumn("__graft_pt", epochNanos(points, ptCol))
      .withColumn("__graft_bucket", floorBucket("__graft_pt", grain))
    val ib = intervals
      .withColumn("__graft_s", epochNanos(intervals, startCol))
      .withColumn("__graft_e", epochNanos(intervals, endCol))
      .withColumn("__graft_bucket",
        explode(sequence(floorBucket("__graft_s", grain),
          floorBucket("__graft_e", grain))))
    pb.join(ib, (keys :+ "__graft_bucket").toIndexedSeq)
      .where(col("__graft_pt") >= col("__graft_s") &&
        col("__graft_pt") <= col("__graft_e"))
      .drop("__graft_bucket", "__graft_pt", "__graft_s", "__graft_e")
  }

  /** Interval-overlap join: every (left, right) interval pair with
    * `[lStart,lEnd] ∩ [rStart,rEnd] ≠ ∅` (inclusive ends), optionally
    * under equi-`keys`. Same bucketing idea as [[intervalJoin]], but both
    * sides explode onto covered buckets — so one overlapping pair can
    * meet in SEVERAL buckets. Instead of a dedup shuffle, each pair is
    * kept only in the canonical bucket of its overlap start
    * (`floor(max(lStart, rStart) / grain)`): emitted exactly once,
    * filtered map-side, no distinct pass. */
  def overlapJoin(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      grain: Long, keys: Seq[String] = Nil): DataFrame = {
    require(grain > 0, "grain must be positive")
    val lb = left
      .withColumn("__graft_ls", epochNanos(left, lStart))
      .withColumn("__graft_le", epochNanos(left, lEnd))
      .withColumn("__graft_bucket",
        explode(sequence(floorBucket("__graft_ls", grain),
          floorBucket("__graft_le", grain))))
    val rb = right
      .withColumn("__graft_rs", epochNanos(right, rStart))
      .withColumn("__graft_re", epochNanos(right, rEnd))
      .withColumn("__graft_bucket",
        explode(sequence(floorBucket("__graft_rs", grain),
          floorBucket("__graft_re", grain))))
    lb.join(rb, (keys :+ "__graft_bucket").toIndexedSeq)
      .where(col("__graft_ls") <= col("__graft_re") &&
        col("__graft_rs") <= col("__graft_le") &&
        col("__graft_bucket") === expr(floorBucketSql(
          "greatest(`__graft_ls`, `__graft_rs`)", grain)))
      .drop("__graft_bucket", "__graft_ls", "__graft_le",
        "__graft_rs", "__graft_re")
  }

  /** Merge each key's overlapping-or-touching intervals into maximal
    * disjoint spans (gaps-and-islands): interval `[s, e]` joins the
    * current span when `s <= max(end so far)` — inclusive ends, so
    * back-to-back intervals (`s == previous e`) coalesce. Returns
    * (`keyCol`, `span_start`, `span_end`, `n_merged`) in epoch-nanos.
    *
    * Plan: one hash exchange on the key; the running-max window, island
    * sum and final per-span aggregate all reuse that partitioning
    * (island id is key-local). The classic alternative — self-join on
    * overlap — is O(n·overlap) and needs a dedup pass; this is O(n log n)
    * in the partition sort. */
  def mergeIntervals(df: DataFrame, keyCol: String,
      startCol: String, endCol: String): DataFrame = {
    val d = df
      .withColumn("__graft_s", epochNanos(df, startCol))
      .withColumn("__graft_e", epochNanos(df, endCol))
    val ord = Window.partitionBy(col(keyCol))
      .orderBy(col("__graft_s"), col("__graft_e"))
    val prevMax = max(col("__graft_e"))
      .over(ord.rowsBetween(Window.unboundedPreceding, -1))
    val island = sum(
      when(prevMax.isNull || col("__graft_s") > prevMax, 1).otherwise(0))
      .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    d.withColumn("__graft_island", island)
      .groupBy(col(keyCol), col("__graft_island"))
      .agg(min(col("__graft_s")).as("span_start"),
        max(col("__graft_e")).as("span_end"),
        count(lit(1)).as("n_merged"))
      .drop("__graft_island")
  }

  /** Trailing time-window aggregates: each `aggs` entry (name, aggExpr)
    * is evaluated over the key's rows in `[ts − windowNs, ts]`
    * (inclusive — rows with EQUAL timestamps are frame peers and all
    * see each other, on any engine). The rate-counter / trailing-24h
    * activity shape.
    *
    * Plan: one hash exchange on `keyCol`; every aggregate shares the
    * single RANGE-frame WindowExec over the epoch-nanos order — a
    * range frame over normalized int64 time, NOT a self-join (the
    * O(n·window) explosion a `t1 JOIN t2 ON ts BETWEEN` formulation
    * pays). */
  def rollingAgg(df: DataFrame, keyCol: String, tsCol: String,
      windowNs: Long, aggs: Seq[(String, Column)]): DataFrame = {
    require(windowNs >= 0, "windowNs must be non-negative")
    require(aggs.nonEmpty, "at least one aggregate")
    val withNs = df.withColumn("__graft_rns", epochNanos(df, tsCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__graft_rns"))
      .rangeBetween(-windowNs, 0)
    aggs.foldLeft(withNs) { case (d, (n, a)) => d.withColumn(n, a.over(w)) }
      .drop("__graft_rns")
  }

  /** Top-k most frequent session journeys: sessionize, concatenate each
    * session's `typeCol` values in time order into a `path` string
    * (`>`-separated), count paths corpus-wide, keep the `k` most common
    * (count desc, path asc for determinism).
    *
    * Plan: the sessionize exchange on `keyCol` is the ONLY data-sized
    * shuffle — the per-(key, session) journey aggregate reuses that
    * partitioning (key is a subset of the grouping key, so Spark plans
    * no second exchange), the path count collapses map-side to the
    * distinct-path set, and the order/limit applies to that tiny
    * aggregate only — the corpus is never globally sorted.
    * Per-group state is one session's events (collect + sort inside the
    * aggregate) — bounded by session length, not by key volume; a
    * pathological never-idle key should be gap-split upstream. */
  def sessionPaths(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, typeCol: String, gap: Long, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val sess = sessionize(df, keyCol, tsCol, tieCol, gap)
    val ns = epochNanos(sess, tsCol)
    sess.groupBy(col(keyCol), col("session_id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(
            ns.alias("ns"), col(tieCol).alias("tie"),
            col(typeCol).alias("t")))),
          x => x.getField("t")),
        ">").alias("path"))
      .groupBy(col("path")).agg(count(lit(1)).alias("cnt"))
      .orderBy(col("cnt").desc, col("path"))
      .limit(k)
  }

  /** Association rules over session baskets (support / confidence /
    * lift): sessions are the transactions ([[sessionize]]), the
    * distinct event types inside one session its items, and every
    * ordered type pair (a → c, a ≠ c) a candidate rule:
    *
    *   support(a→c) = P(a,c)   confidence = P(a,c)/P(a)   lift = conf/P(c)
    *
    * probabilities over sessions. The within-session co-occurrence
    * screen behind "users who error also refresh" findings — PMI's
    * transactional sibling. Rules below `minSupport` are cut.
    *
    * Scale: the (session, item) table is session-bounded; the pair join
    * keys by session with fan-out ≤ item-types² per session (event-type
    * alphabets are small); marginals and totals are bounded aggregates
    * broadcast back. Output: (`ante`, `cons`, `n_sessions`, `support`,
    * `confidence`, `lift`), half-up 6. */
  def basketRules(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, typeCol: String, gap: Long,
      minSupport: Double = 0.0): DataFrame = {
    require(minSupport >= 0, "minSupport must be non-negative")
    val sess = sessionize(df, keyCol, tsCol, tieCol, gap)
    val items = sess.select(col(keyCol).as("__k"),
      col("session_id").as("__s"), col(typeCol).as("item")).distinct()
    val total = items.select(col("__k"), col("__s")).distinct()
      .agg(count(lit(1)).cast("double").as("__n"))
    val single = items.groupBy(col("item")).agg(count(lit(1)).as("__c1"))
    val pairCnt = items.alias("a")
      .join(items.alias("b"),
        col("a.__k") === col("b.__k") && col("a.__s") === col("b.__s") &&
          col("a.item") =!= col("b.item"))
      .groupBy(col("a.item").as("ante"), col("b.item").as("cons"))
      .agg(count(lit(1)).as("__c2"))
    pairCnt
      .join(broadcast(single.select(col("item").as("ante"),
        col("__c1").as("__ca"))), "ante")
      .join(broadcast(single.select(col("item").as("cons"),
        col("__c1").as("__cc"))), "cons")
      .crossJoin(broadcast(total))
      .filter(col("__c2").cast("double") / col("__n") >= minSupport)
      .select(col("ante"), col("cons"), col("__c2").as("n_sessions"),
        Rounding.halfUp(col("__c2").cast("double") / col("__n"), 6)
          .as("support"),
        Rounding.halfUp(col("__c2").cast("double") / col("__ca"), 6)
          .as("confidence"),
        Rounding.halfUp(col("__c2").cast("double") / col("__ca") /
          (col("__cc").cast("double") / col("__n")), 6).as("lift"))
  }

  /** [[activeUsers]]' 100 TB sibling: trailing-window distinct actives
    * from MERGEABLE per-day HLL sketches instead of exact (day, key)
    * rows. Sketch each day once (a few KB per day at lgK 12, regardless
    * of cardinality), then every trailing window is a union of ≤
    * `windowDays` sketches — the exact path's (day, key) table grows
    * with active keys; the sketch path's state does not, and persisted
    * day sketches make tomorrow's window an incremental union instead
    * of a rescan. Output per day: (`day` ISO, `dau_approx`,
    * `wau_approx`). Estimates carry HLL's ~1.6%/√(2^lgK·)… relative
    * error — gate against [[activeUsers]] on a bounded slice rather
    * than oracle-replaying the sketch bits. */
  def activeUsersSketch(df: DataFrame, keyCol: String, tsCol: String,
      windowDays: Int = 7, lgK: Int = 12): DataFrame = {
    require(windowDays > 0, "windowDays must be positive")
    val dayNs = 86400L * 1000000000L
    val daily = df
      .withColumn("__day", floor(epochNanos(df, tsCol) / dayNs).cast("long"))
      .groupBy(col("__day"))
      .agg(hll_sketch_agg(col(keyCol), lit(lgK)).as("__sk"))
    val dau = daily.select(col("__day"),
      hll_sketch_estimate(col("__sk")).cast("long").as("dau_approx"))
    val wau = daily
      .withColumn("__d2",
        explode(sequence(col("__day"), col("__day") + (windowDays - 1))))
      .groupBy(col("__d2").as("__day"))
      .agg(hll_sketch_estimate(hll_union_agg(col("__sk"), lit(false)))
        .cast("long").as("wau_approx"))
    dau.join(wau, Seq("__day"))
      .select(
        date_format(
          date_add(to_date(lit("1970-01-01")), col("__day").cast("int")),
          "yyyy-MM-dd").as("day"),
        col("dau_approx"), col("wau_approx"))
  }

  /** Day-of-week seasonal baseline per group: (`groupCol`, `dow`, `n`,
    * `mean`, `sd`) of `valueCol`, dow 0 = Monday, derived from
    * epoch-day arithmetic ((day + 3) mod 7 — 1970-01-01 was a
    * Thursday), NOT an engine day-of-week function: those disagree on
    * numbering and timezone defaults across engines, epoch math does
    * not. Subtracting this baseline is the first step of any seasonal
    * anomaly screen (compose with [[rollingZScore]] for the residual
    * view). One hash aggregate onto the groups×7 table. */
  def seasonalProfile(df: DataFrame, groupCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val day = 86400L * 1000000000L
    val dow = ((floor(epochNanos(df, tsCol) / day).cast("long") + 3) % 7)
      .cast("int")
    df.withColumn("__dow", dow)
      .groupBy(col(groupCol), col("__dow").as("dow"))
      .agg(count(lit(1)).as("n"),
        Rounding.halfUp(avg(col(valueCol)), 6).as("mean"),
        Rounding.halfUp(stddev_pop(col(valueCol)), 6).as("sd"))
  }

  /** Per-key OLS trend: regress `valueCol` on time with EXACT integer
    * moment sums — time quantized to whole epoch-seconds, value to 1e-6
    * units, every sum and cancellation (n·Σxy − Σx·Σy) carried in
    * DECIMAL(38,0):
    *
    *   slope = cov(x,y)/var(x),  intercept = ȳ − slope·x̄,  r² = corr²
    *
    * Exact sums, not streaming `covar_pop`/`var_pop` moments, because
    * the streaming accumulators are merge-order-dependent in their last
    * ulps: across engines (or even across partitionings) the rounded
    * 6-dp outputs flip whenever a value lands within float noise of a
    * rounding boundary — observed for `intercept`, where x̄ ≈ 2·10⁴
    * epoch-days amplifies the cov ulp error ~10⁴× (two q_trend rows
    * flipped at sf0.1 while sf0.01 was green). Exact decimals make the
    * per-key sums associative — partition- and engine-independent by
    * construction, at any scale. Decimal38 envelope: per-key
    * n·(Σ|x·y₆|)² needs n·x²·y₆² ≲ 10³⁸, i.e. ~10¹⁰ rows/key at
    * second-resolution epochs and |value| ≤ 10⁹ — far beyond any
    * per-key group a trend screen meets.
    *
    * `slope`/`r²` divide the exact sums as doubles (ratio ulp error
    * ~3·10⁻¹⁶ against a 6-dp grid — no boundary risk at their unit
    * scales); `intercept`, whose 1e6-scaled magnitude reaches ~10⁹, is
    * rounded in INTEGER arithmetic ((2a+b) quot (2b), truncation
    * toward zero in both Spark's `div` and DuckDB's `//`) so no
    * decimal→double conversion precedes the rounding.
    *
    * The metric-trend screen: which keys are drifting up/down, how
    * fast, and how linear. One hash aggregate on the key — constant
    * per-key state, no window, no sort. Keys with a degenerate time
    * axis (single timestamp) yield null slope/intercept/r2. `tsCol`
    * normalizes through [[epochNanos]]. Output: (`keyCol`, `n`,
    * `slope` per day, `intercept` at epoch, `r2`), half-up 6. */
  def trendSlopes(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    // ns → whole seconds through DOUBLE division then floor: ns exceeds
    // 2^53, so exact integer division would differ from the double
    // path — but both engines cast the same int64 to the same nearest
    // double and floor the same quotient, which is what hash-parity
    // needs (same 1-second quantization contract as the day bucketing
    // in activeUsers)
    val xs = floor(epochNanos(df, tsCol).cast("double") / lit(1e9)).cast(dec)
    val y6 = floor(col(valueCol).cast("double") * lit(1e6) + lit(0.5)).cast(dec)
    val agg = df.withColumn("__xs", xs).withColumn("__y6", y6)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col("__xs")).as("sx"), sum(col("__y6")).as("sy"),
        sum(col("__xs") * col("__xs")).as("sxx"),
        sum(col("__xs") * col("__y6")).as("sxy"),
        sum(col("__y6") * col("__y6")).as("syy"))
      .select(col(keyCol), col("n"),
        (col("n").cast(dec) * col("sxy") - col("sx") * col("sy")).as("covn"),
        (col("n").cast(dec) * col("sxx") - col("sx") * col("sx")).as("vxn"),
        (col("n").cast(dec) * col("syy") - col("sy") * col("sy")).as("vyn"),
        (col("sy") * col("sxx") - col("sx") * col("sxy")).as("intn"))
    val covD = col("covn").cast("double")
    val vxD = col("vxn").cast("double")
    val vyD = col("vyn").cast("double")
    // r² = cov²/(vx·vy), guarded on BOTH variances — a built-in corr()
    // divides by zero inside the aggregate under ANSI on degenerate
    // keys, and engines disagree (NaN vs NULL); the explicit form is
    // portable and null on any degenerate axis
    agg.select(col(keyCol), col("n"),
      when(col("vxn") > 0,
        Rounding.halfUp(covD / vxD * lit(86400.0) / lit(1e6), 6)).as("slope"),
      when(col("vxn") > 0,
        expr("(2 * intn + vxn) div (2 * vxn)").cast("double") / lit(1e6))
        .as("intercept"),
      when(col("vxn") > 0 && col("vyn") > 0,
        Rounding.halfUp(covD * covD / (vxD * vyD), 6)).as("r2"))
  }

  /** Daily/trailing-window active users with the stickiness ratio:
    * per UTC day, `dau` (distinct keys that day), `wau` (distinct keys
    * over the trailing `windowDays` ending that day, inclusive), and
    * `stickiness` = dau/wau — the engagement trio. Days inside the
    * first partial window use the days that exist (standard). `tsCol`
    * normalizes through [[epochNanos]], so any physical time encoding
    * works.
    *
    * Exact distincts at scale without a distinct-over-window (which SQL
    * windows cannot express): collapse once to the (day, key) activity
    * table — bounded by days·active-keys, map-side combine — then
    * explode each activity row to the ≤ `windowDays` trailing days it
    * serves and de-duplicate per (day, key). Every shuffle is keyed by
    * (day[, key]) — never the raw event stream. */
  def activeUsers(df: DataFrame, keyCol: String, tsCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays > 0, "windowDays must be positive")
    val dayNs = 86400L * 1000000000L
    val du = df
      .withColumn("__day", floor(epochNanos(df, tsCol) / dayNs).cast("long"))
      .select(col("__day"), col(keyCol)).distinct()
    val dau = du.groupBy(col("__day")).agg(count(lit(1)).as("dau"))
    val wau = du
      .withColumn("__d2",
        explode(sequence(col("__day"), col("__day") + (windowDays - 1))))
      .select(col("__d2").as("__day"), col(keyCol)).distinct()
      .groupBy(col("__day")).agg(count(lit(1)).as("wau"))
    // day as an ISO string: engine-neutral (a timestamp column hashes
    // differently across engines' physical resolutions, ns vs us)
    dau.join(wau, Seq("__day"))
      .select(
        date_format(
          date_add(to_date(lit("1970-01-01")), col("__day").cast("int")),
          "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"),
        Rounding.halfUp(col("dau").cast("double") / col("wau"), 6)
          .as("stickiness"))
  }

  /** Finite-memory exponentially-weighted moving average of `valueCol`
    * along each key's (`tsCol`, `tieCol`)-ordered stream: the last `k`
    * events weighted α(1−α)^j (j = 0 newest), normalized over the
    * weights actually present — so early rows (fewer than k
    * predecessors) average over what exists instead of decaying toward
    * an arbitrary seed. The smoothing baseline that pairs with
    * [[rollingZScore]]'s deviation view.
    *
    * Truncating at `k` makes the operator a fixed lag-combination — all
    * `k` lags share ONE WindowExec on the single `keyCol` exchange, stay
    * inside whole-stage codegen, and replay exactly in a SQL oracle (an
    * unbounded recursive EWMA would be engine-specific float recursion).
    * (1−α)^k is the tail mass dropped — for α=0.5, k=8 that is 0.4%. */
  def ewma(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      valueCol: String, alpha: Double = 0.5, k: Int = 8,
      outCol: String = "ewma"): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val terms = (0 until k).map { j =>
      val v = lag(col(valueCol), j).over(w)
      val wt = math.pow(1 - alpha, j)
      (when(v.isNotNull, v * wt).otherwise(lit(0.0)),
        when(v.isNotNull, lit(wt)).otherwise(lit(0.0)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    df.withColumn(outCol, Rounding.halfUp(num / den, 6))
  }

  /** First-order Markov transition matrix of `stateCol` along each key's
    * time-ordered event stream: (`prev_state`, `next_state`, `cnt`,
    * `prob`) where prob is row-normalized over prev_state — the
    * behavioral-model summary behind journey analysis (and the
    * generator check for synthetic event data). Ordering is
    * (`tsCol`, `tieCol`) within key, deterministic under timestamp
    * collisions; `tsCol` is ORDER-only, so any physical time encoding
    * works unmodified.
    *
    * Plan: one hash exchange on `keyCol` for the lag window (keys are
    * users — high cardinality, even spread), then a hash aggregate onto
    * the states² transition table; normalization windows over that
    * BOUNDED table, never the event stream. */
  def transitionMatrix(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val counts = df
      .withColumn("__prev", lag(col(stateCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_state"), col(stateCol).as("next_state"))
      .agg(count(lit(1)).as("cnt"))
    val norm = Window.partitionBy(col("prev_state"))
    counts.select(col("prev_state"), col("next_state"), col("cnt"),
      Rounding.halfUp(col("cnt").cast("double") /
        sum(col("cnt")).over(norm), 6).as("prob"))
  }

  /** Trailing z-score: each row's `valueCol` standardized against the
    * key's OWN trailing `[ts − windowNs, ts]` window (inclusive; equal
    * timestamps are frame peers) — `z = (v − mean) / stddev_pop`, null
    * when the window is constant (zero deviation carries no signal and
    * ±∞ would poison downstream filters). The self-referential rate /
    * metric anomaly shape: "is this event unusual for THIS key lately",
    * with no global model to train or broadcast.
    *
    * Plan: one hash exchange on `keyCol`; mean and deviation share a
    * single RANGE-frame WindowExec (constant per-row state — running
    * moments, not buffered rows beyond the frame). */
  def rollingZScore(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, windowNs: Long, zCol: String = "z"): DataFrame = {
    require(windowNs >= 0, "windowNs must be non-negative")
    val withNs = df.withColumn("__graft_zns", epochNanos(df, tsCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__graft_zns"))
      .rangeBetween(-windowNs, 0)
    val m = avg(col(valueCol)).over(w)
    val sd = stddev_pop(col(valueCol)).over(w)
    withNs.withColumn(zCol,
        when(sd > 0, (col(valueCol) - m) / sd))
      .drop("__graft_zns")
  }

  /** Top-k rows per group by the given ordering (rank column `rnCol`,
    * 1-based, long-typed). One shuffle on the group keys; row_number
    * needs no global sort and the filter prunes before any downstream
    * exchange. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
      ordering: Seq[Column], k: Int, rnCol: String = "rn"): DataFrame =
    df.withColumn(rnCol,
      row_number().over(
        Window.partitionBy(groupCols.map(col): _*).orderBy(ordering: _*))
        .cast("long"))
      .filter(col(rnCol) <= k)

  /** Funnel conversion: how many keys complete each prefix of `steps` in
    * order. A key reaches step i at the earliest `tsCol` of an
    * i-typed event at-or-after its step-(i−1) reach time. Returns one row
    * per step: (`step` 1-based, `step_name`, `n_keys`).
    *
    * Plan: step i's reach set joins step (i−1)'s — k−1 equi-joins on the
    * key plus k hash aggregates, every shuffle on the key column; the
    * counts are k single-row aggregates unioned into one plan (no driver
    * loop over data). The sequential-join formulation is deliberately
    * the same SQL a warehouse would run — the DuckDB oracle replays it
    * verbatim — rather than a one-shuffle array fold, whose per-key state
    * is opaque to SQL engines. k is small; the joins are on the key. */
  def funnel(df: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame =
    funnelWithin(df, keyCol, tsCol, typeCol, steps, stepWithinNs = -1L)

  /** [[funnel]] with a per-step conversion deadline: step i only counts
    * when it happens within `stepWithinNs` of the key's step-(i−1)
    * reach time (epoch-nanos; negative = unlimited, plain funnel). The
    * product-analytics form — "signed up, then purchased WITHIN 24h" —
    * where an unbounded funnel overstates conversion by crediting
    * actions months later. Same plan shape: k−1 key equi-joins + k hash
    * aggregates, the deadline is one more map-side predicate on each
    * join. Reach time per step stays the EARLIEST qualifying event, so
    * deadlines compose transitively down the funnel. */
  def funnelWithin(df: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], stepWithinNs: Long): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    val ns = epochNanos(df, tsCol)
    val first = df.filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(ns).alias("__graft_t"))
    val reached = steps.tail.zip(steps).foldLeft(Vector(first)) {
      case (acc, (s, prevStep)) =>
        val prev = acc.last
          .withColumnRenamed("__graft_t", "__graft_tprev")
        // a repeated step type needs a STRICTLY later event — otherwise
        // the step-(i-1) reach event satisfies its own successor and one
        // action counts as two
        val after = if (s == prevStep) ns > col("__graft_tprev")
                    else ns >= col("__graft_tprev")
        val within = if (stepWithinNs < 0) lit(true)
                     else ns - col("__graft_tprev") <= stepWithinNs
        acc :+ df.filter(col(typeCol) === s)
          .join(prev, keyCol)
          .filter(after && within)
          .groupBy(col(keyCol)).agg(min(ns).alias("__graft_t"))
    }
    reached.zip(steps).zipWithIndex.map { case ((st, name), i) =>
      st.agg(count(lit(1)).alias("n_keys"))
        .select(lit(i + 1).cast("int").alias("step"),
          lit(name).alias("step_name"), col("n_keys"))
    }.reduce(_ unionByName _)
  }

  /** Inter-event gap distribution: quantiles of the per-key gaps
    * between consecutive events (epoch-nanos; each key's first event
    * has no gap and contributes nothing) — the evidence for choosing
    * [[sessionize]]'s `gap`, a rolling window width, or a watermark:
    * pick the knee between the within-session mode and the
    * between-session tail instead of folklore ("30 minutes"). Returns
    * one row per requested quantile: (`p`, `gap_ns`, exact
    * interpolating percentile — engine-portable, like
    * [[Profiling.describe]]'s median).
    *
    * Plan: one hash exchange on the key for the lag window, then one
    * global aggregate whose state is the gap value-count map (gaps of
    * real event data cluster heavily — far fewer distinct values than
    * rows; for pathological continuous-gap corpora swap in
    * approx_percentile). */
  def gapQuantiles(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      "quantiles must be in [0,1]")
    val ns = epochNanos(df, tsCol)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val gaps = df.select(col(keyCol), ns.alias("__ns"),
        col(tsCol), col(tieCol))
      .withColumn("__gap", col("__ns") - lag(col("__ns"), 1).over(w))
      .filter(col("__gap").isNotNull)
    val agg = gaps.agg(percentile(col("__gap"),
      array(ps.map(lit): _*)).alias("__qs"))
    val rows = ps.zipWithIndex.map { case (p, i) =>
      struct(lit(p).alias("p"),
        element_at(col("__qs"), i + 1).cast("double").alias("gap_ns"))
    }
    agg.select(explode(array(rows: _*)).alias("s")).select(col("s.*"))
  }

  /** Single-changepoint detection per key: bucket events into
    * `periodNs` periods, and locate where each key's per-period event
    * rate shifts — the CUSUM statistic in its non-recursive prefix
    * form, `D_t = |C_t − (t/n)·C_n|` (C = running event count over the
    * key's ordered periods): a constant-rate series walks the diagonal
    * and D stays near 0, a rate shift bows the path and D peaks AT the
    * shift (Page 1954's test, as used for level-shift screening).
    * Returns one row per key: (`key`, `cp_period` — the period whose
    * prefix maximizes D, earliest on ties, `strength` = max D / total,
    * 0 when the rate never shifts, 6dp). The monitoring question — "did
    * this user/source/feed change behaviour, and when" — answered with
    * no model, no iteration, no parameter beyond the bucket size.
    *
    * Plan: two compact exchanges — the period aggregate on (key,
    * period) whose map-side partials collapse BEFORE the shuffle (the
    * wire carries distinct (key, period) counts, never events), then
    * one key exchange that all four windows AND the argmax rank share;
    * the rank filter compiles to WindowGroupLimit, so each task
    * forwards one row per key into the final pass. Per-key state is
    * bounded by the periods the key spans, not its events. */
  def changepoint(df: DataFrame, keyCol: String, tsCol: String,
      periodNs: Long): DataFrame = {
    require(periodNs > 0, "periodNs must be positive")
    val per = df.select(col(keyCol).alias("__graft_k"),
        epochNanos(df, tsCol).alias("__graft_ns"))
      .select(col("__graft_k"),
        floorBucket("__graft_ns", periodNs).alias("__graft_p"))
      .groupBy(col("__graft_k"), col("__graft_p"))
      .agg(count(lit(1)).alias("__graft_x"))
    val ord = Window.partitionBy(col("__graft_k")).orderBy(col("__graft_p"))
    val all = Window.partitionBy(col("__graft_k"))
    val cum = sum(col("__graft_x"))
      .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val t = row_number().over(ord)
    val n = count(lit(1)).over(all)
    val tot = sum(col("__graft_x")).over(all)
    val d = abs(cum.cast("double") -
      t.cast("double") / n.cast("double") * tot.cast("double"))
    val scored = per.select(col("__graft_k"), col("__graft_p"),
      d.alias("__graft_d"), tot.alias("__graft_tot"))
    scored.withColumn("__graft_rn", row_number().over(
        Window.partitionBy(col("__graft_k"))
          .orderBy(col("__graft_d").desc, col("__graft_p"))))
      .filter(col("__graft_rn") === 1)
      .select(col("__graft_k").alias(keyCol),
        col("__graft_p").alias("cp_period"),
        Rounding.halfUp(col("__graft_d") / col("__graft_tot"), 6)
          .alias("strength"))
  }

  /** Cohort retention: bucket integer time into `periodLen` periods,
    * cohort = each key's first active period, and count the keys of each
    * cohort active at each later period offset — (`cohort`, `offset`,
    * `n_active`), where offset 0 is the cohort's own period.
    *
    * Plan: one hash exchange on the key builds (first period, distinct
    * active-period set) per key; `collect_set` is bounded by the number
    * of periods the data spans (30 for a month of days — NOT by events
    * per key, the aggregate dedups first), so no hot key can blow up a
    * row. The final (cohort, offset) count is a second, tiny aggregate.
    * Bucketing is exact integer FLOOR division — a double division would
    * lose nanosecond precision above 2⁵³, and Spark's `div` alone
    * truncates toward zero, which would bucket pre-epoch (negative)
    * timestamps one period late relative to the floor semantics SQL
    * engines (and this operator's oracle) use. */
  def cohortRetention(df: DataFrame, keyCol: String, tsCol: String,
      periodLen: Long): DataFrame = {
    require(periodLen > 0, "periodLen must be positive")
    val per = df.select(col(keyCol).alias("__graft_k"),
      epochNanos(df, tsCol).alias("__graft_ns"))
      .select(col("__graft_k"),
        floorBucket("__graft_ns", periodLen).alias("__graft_p"))
    per.groupBy(col("__graft_k"))
      .agg(min(col("__graft_p")).alias("cohort"),
        collect_set(col("__graft_p")).alias("__graft_ps"))
      .select(col("cohort"), explode(col("__graft_ps")).alias("__graft_p"))
      .groupBy(col("cohort"),
        (col("__graft_p") - col("cohort")).alias("offset"))
      .agg(count(lit(1)).alias("n_active"))
  }
}
