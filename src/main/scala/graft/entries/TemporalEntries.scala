package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import EntryHelpers._

/** Event-time / sessionization / as-of contract queries + their DuckDB oracles, kept ADJACENT per
  * family (split from the former 5k-line SparkEntry maps — round-9
  * verdict #7: a mis-paired oracle edit was a 5k-line scroll).
  * [[SparkEntry]] aggregates every family and asserts name uniqueness. */
private[graft] object TemporalEntries {

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // sessionization: 30-minute-gap sessions per user, single shuffle
    // (gap in epoch-nanos; ts normalized whatever its physical type)
    "q_sessions" -> ((s, dir) => pipeline.Temporal.sessionStats(
      t(s, dir, "events"), "user_id", "ts", "event_id",
      gap = 30L * 60 * 1000000000L)
      .orderBy("user_id")),
    // top session journeys: sessionize → ordered per-session path →
    // corpus-wide count → top-k; ONE data-sized shuffle (the session key)
    "q_paths" -> ((s, dir) => pipeline.Temporal.sessionPaths(
      t(s, dir, "events"), "user_id", "ts", "event_id", "event_type",
      gap = 30L * 60 * 1000000000L, k = 10)),
    // association rules over 2-hour session baskets: support /
    // confidence / lift per ordered event-type pair (the 30-min gap
    // makes near-singleton sessions at this event density)
    "q_basket" -> ((s, dir) => pipeline.Temporal.basketRules(
      t(s, dir, "events"), "user_id", "ts", "event_id", "event_type",
      gap = 2L * 3600 * 1000000000L, minSupport = 0.01)
      .orderBy("ante", "cons")),
    // day-of-week seasonal baseline per event type (epoch-day dow —
    // engine-neutral, no timezone-dependent dayofweek())
    "q_seasonal" -> ((s, dir) => pipeline.Temporal.seasonalProfile(
      t(s, dir, "events"), "event_type", "ts", "value")
      .orderBy("event_type", "dow")),
    // conversion latency: click → most recent prior view (as-of), then
    // one-row latency quantiles — composition of certified parts
    "q_latency" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val j = pipeline.Temporal.asofJoin(
        ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts"),
        ev.filter(col("event_type") === "view")
          .select("event_id", "user_id", "ts"),
        "user_id", "ts", "event_id", payload = Seq("ts"))
        .filter(col("asof_ts").isNotNull)
      val lat = ((pipeline.Temporal.epochNanos(j, "ts") -
        pipeline.Temporal.epochNanos(j, "asof_ts")).cast("double") / 1e9)
      j.select(lat.as("__lat"))
        .agg(count(lit(1)).alias("n"),
          pipeline.Rounding.halfUp(percentile(col("__lat"), lit(0.5)), 6)
            .alias("p50"),
          pipeline.Rounding.halfUp(percentile(col("__lat"), lit(0.9)), 6)
            .alias("p90"),
          pipeline.Rounding.halfUp(percentile(col("__lat"), lit(0.99)), 6)
            .alias("p99"))
    }),
    // per-user metric trend: one-pass OLS of value on time-in-days
    // (covar_pop/var_pop/corr moments; no window, no sort)
    "q_trend" -> ((s, dir) => pipeline.Temporal.trendSlopes(
      t(s, dir, "events"), "user_id", "ts", "value")
      .orderBy("user_id")),
    // DAU/WAU/stickiness per UTC day: exact window distincts via the
    // bounded (day, user) activity table exploded to trailing days
    "q_dau" -> ((s, dir) => pipeline.Temporal.activeUsers(
      t(s, dir, "events"), "user_id", "ts", windowDays = 7)
      .orderBy("day")),
    // sketch-path DAU/WAU gated against the exact ledger: per-day HLL
    // sketches unioned over trailing windows must land within 5%
    // (recall-gate pattern — sketch bits are not SQL-replayable, the
    // accuracy contract is)
    "q_dau_sketch" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val approx = pipeline.Temporal.activeUsersSketch(ev, "user_id", "ts", 7)
      val exact = pipeline.Temporal.activeUsers(ev, "user_id", "ts", 7)
      approx.join(exact, Seq("day"))
        .select(col("day"),
          ((abs(col("dau_approx") - col("dau")).cast("double") /
            col("dau") <= 0.05) &&
           (abs(col("wau_approx") - col("wau")).cast("double") /
            col("wau") <= 0.05)).as("within_tol"))
        .orderBy("day")
    }),
    // first-order Markov transition matrix of event types along each
    // user's time-ordered stream, row-normalized over prev_state
    "q_markov" -> ((s, dir) => pipeline.Temporal.transitionMatrix(
      t(s, dir, "events"), "user_id", "ts", "event_id", "event_type")
      .orderBy("prev_state", "next_state")),
    // finite-memory EWMA of event values per user (k=8 lags, one shared
    // WindowExec; dyadic weights replay bit-exactly in the oracle)
    "q_ewma" -> ((s, dir) => pipeline.Temporal.ewma(
      t(s, dir, "events"), "user_id", "ts", "event_id", "value",
      alpha = 0.5, k = 8)
      .select(col("event_id"), col("user_id"), col("value"), col("ewma"))
      .orderBy("event_id")),
    // trailing per-key z-score anomalies: each event's value against the
    // user's own trailing-24h mean/deviation (one RANGE window), |z|>2
    "q_anomaly" -> ((s, dir) => pipeline.Temporal.rollingZScore(
      t(s, dir, "events"), "user_id", "ts", "value",
      windowNs = 24L * 3600 * 1000000000L)
      .filter(abs(col("z")) > 2)
      .select(col("event_id"), col("user_id"),
        pipeline.Rounding.halfUp(col("z"), 6).alias("z"))
      .orderBy("event_id")),
    // as-of join: each click matched to the user's most recent prior view
    "q_asof" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      pipeline.Temporal.asofJoin(
        ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts"),
        ev.filter(col("event_type") === "view")
          .select("event_id", "user_id", "ts"),
        "user_id", "ts", "event_id", payload = Seq("event_id"))
        .select(col("event_id"), col("user_id"),
          col("asof_event_id").alias("view_id"))
        .orderBy("event_id")
    }),
    // forward as-of with a 2-hour tolerance: each click matched to the
    // user's NEXT view within 2h (nulls beyond) — the merge_asof
    // direction/tolerance surface on the same single-shuffle plan
    "q_asof_fwd" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      pipeline.Temporal.asofJoin(
        ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts"),
        ev.filter(col("event_type") === "view")
          .select("event_id", "user_id", "ts"),
        "user_id", "ts", "event_id", payload = Seq("event_id"),
        direction = "forward", toleranceNs = 7200L * 1000000000L)
        .select(col("event_id"), col("user_id"),
          col("asof_event_id").alias("view_id"))
        .orderBy("event_id")
    }),
    // nearest as-of with a 1-hour tolerance: each click matched to the
    // user's time-closest view within 1h either way, ties preferring the
    // backward match — still the single-shuffle tag-union plan (the
    // "nearest" direction adds an in-partition sort, never an exchange)
    "q_asof_near" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      pipeline.Temporal.asofJoin(
        ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts"),
        ev.filter(col("event_type") === "view")
          .select("event_id", "user_id", "ts"),
        "user_id", "ts", "event_id", payload = Seq("event_id"),
        direction = "nearest", toleranceNs = 3600L * 1000000000L)
        .select(col("event_id"), col("user_id"),
          col("asof_event_id").alias("view_id"))
        .orderBy("event_id")
    }),
    // native session windows (session_window): 30-min-gap sessions with
    // event counts and value sums; the SAME call runs on a stream with
    // watermark-bounded state. Start emitted as epoch-nanos (the
    // driver's hasher compares scalars, not timestamps).
    "q_session_window" -> ((s, dir) =>
      streaming.EventStream.sessionWindows(
        t(s, dir, "events"), gap = "30 minutes")
        .select(col("user_id"),
          (unix_micros(col("session_start").cast("timestamp")) * 1000L)
            .alias("start_ns"),
          col("n_events"),
          pipeline.Rounding.halfUp(col("sv"), 6).alias("sv"))
        .orderBy("user_id", "start_ns")),
    // interval coalescing: each event opens a 1-hour activity interval;
    // per-user overlapping/touching intervals merge into maximal spans
    // (gaps-and-islands — one exchange, no overlap self-join)
    "q_merge_intervals" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val iv = ev.select(col("user_id"),
        pipeline.Temporal.epochNanos(ev, "ts").alias("s"))
        .withColumn("e", col("s") + lit(3600L * 1000000000L))
      pipeline.Temporal.mergeIntervals(iv, "user_id", "s", "e")
        .orderBy("user_id", "span_start")
    }),
    // trailing 24h rolling aggregates per user (RANGE frame over
    // epoch-nanos — one exchange, no time self-join)
    "q_rolling" -> ((s, dir) =>
      pipeline.Temporal.rollingAgg(
        t(s, dir, "events").select("event_id", "user_id", "ts", "value"),
        "user_id", "ts", windowNs = 86400L * 1000000000L,
        aggs = Seq(
          "n_24h" -> count(lit(1)),
          "__v" -> sum(col("value"))))
        .select(col("event_id"), col("user_id"), col("n_24h"),
          pipeline.Rounding.halfUp(col("__v"), 6).alias("v_24h"))
        .orderBy("event_id")),
    // funnel conversion over the events stream: signup -> view -> click
    // -> purchase, each step at-or-after the previous step's first time
    "q_funnel" -> ((s, dir) =>
      pipeline.Temporal.funnel(t(s, dir, "events"), "user_id", "ts",
        "event_type", Seq("signup", "view", "click", "purchase"))
        .orderBy("step")),
    // inter-event gap quantiles (the evidence behind the session gap)
    "q_gaps" -> ((s, dir) => pipeline.Temporal.gapQuantiles(
      t(s, dir, "events"), "user_id", "ts", "event_id",
      ps = Seq(0.5, 0.9, 0.99))
      .orderBy("p")),
    // per-user rate changepoint: prefix-form CUSUM over daily buckets,
    // all windows on ONE key exchange
    "q_changepoint" -> ((s, dir) =>
      pipeline.Temporal.changepoint(t(s, dir, "events"), "user_id", "ts",
        periodNs = 86400L * 1000000000L)
        .filter(col("user_id") < 50)
        .orderBy("user_id")),
    // windowed funnel: each step must convert within 24h of the previous
    // step's reach time — the realistic conversion measure
    "q_funnel_win" -> ((s, dir) =>
      pipeline.Temporal.funnelWithin(t(s, dir, "events"), "user_id", "ts",
        "event_type", Seq("signup", "view", "click", "purchase"),
        stepWithinNs = 24L * 3600 * 1000000000L)
        .orderBy("step")),
    // daily cohort retention over the events table (ts is epoch
    // nanoseconds; one period = 86400e9 ns)
    "q_retention" -> ((s, dir) =>
      pipeline.Temporal.cohortRetention(t(s, dir, "events"), "user_id", "ts",
        periodLen = 86400000000000L)
        .orderBy("cohort", "offset")),
    "q_topk_group" -> ((s, dir) => pipeline.Temporal.topKPerGroup(
      t(s, dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
      Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), k = 3)
      .orderBy("o_custkey", "rn")),
    // interval join: events enriched against 30 daily 6-hour windows
    // (bucketed equi-join — nested-loop-free; ts auto-normalized to
    // epoch nanos, windows are long-typed nanos already). The
    // aggregate certifies the containment semantics end-to-end.
    "q_interval" -> ((s, dir) => {
      val dayNs = 86400L * 1000000000L
      val sixHNs = 21600L * 1000000000L
      val baseNs = 1704067200L * 1000000000L // 2024-01-01T00:00Z
      val ev = t(s, dir, "events").select(col("event_id"), col("ts"), col("value"))
      val wins = s.range(0, 30).select(col("id").alias("win_id"),
        (lit(baseNs) + col("id") * lit(dayNs)).alias("w_start"),
        (lit(baseNs) + col("id") * lit(dayNs) + lit(sixHNs)).alias("w_end"))
      pipeline.Temporal.intervalJoin(ev, wins, "ts", "w_start", "w_end",
        grain = sixHNs)
        .groupBy("win_id")
        .agg(count(lit(1)).alias("n_events"),
          pipeline.Rounding.halfUp(sum(col("value")), 6).alias("sum_value"))
        .orderBy("win_id")
    }),
    // interval-overlap join: per-user activity spans × the same daily
    // windows — canonical-bucket dedup (each overlapping pair emitted
    // exactly once, no distinct pass)
    "q_overlap" -> ((s, dir) => {
      val dayNs = 86400L * 1000000000L
      val sixHNs = 21600L * 1000000000L
      val baseNs = 1704067200L * 1000000000L
      val spans = t(s, dir, "events").groupBy("user_id")
        .agg(min(col("ts")).alias("u_start"), max(col("ts")).alias("u_end"))
      val wins = s.range(0, 30).select(col("id").alias("win_id"),
        (lit(baseNs) + col("id") * lit(dayNs)).alias("w_start"),
        (lit(baseNs) + col("id") * lit(dayNs) + lit(sixHNs)).alias("w_end"))
      pipeline.Temporal.overlapJoin(spans, wins,
        "u_start", "u_end", "w_start", "w_end", grain = dayNs)
        .groupBy("win_id")
        .agg(count(lit(1)).alias("n_users"))
        .orderBy("win_id")
    }),
  )

  val oracles: Seq[(String, String)] = Seq(
    "q_paths" ->
      """WITH g AS (
           SELECT user_id, ts, event_id, event_type,
                  CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END AS ns
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ), s AS (
           SELECT user_id, ts, event_id, event_type,
                  sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
           FROM g
         ), p AS (
           SELECT user_id, sid,
                  string_agg(event_type, '>' ORDER BY ts, event_id) AS path
           FROM s GROUP BY user_id, sid
         )
         SELECT path, count(*)::BIGINT AS cnt FROM p
         GROUP BY path ORDER BY cnt DESC, path LIMIT 10""",
    "q_basket" ->
      """WITH g AS (
           SELECT user_id, ts, event_id, event_type,
                  CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 2 HOUR
                       THEN 1 ELSE 0 END AS ns
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ), s AS (
           SELECT user_id, event_type,
                  sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
           FROM g
         ), items AS (
           SELECT DISTINCT user_id, sid, event_type FROM s
         ), tot AS (
           SELECT count(*)::DOUBLE AS n FROM
             (SELECT DISTINCT user_id, sid FROM items)
         ), single AS (
           SELECT event_type, count(*)::BIGINT AS c1 FROM items
           GROUP BY event_type
         ), pc AS (
           SELECT a.event_type AS ante, b.event_type AS cons,
                  count(*)::BIGINT AS c2
           FROM items a JOIN items b
             ON a.user_id = b.user_id AND a.sid = b.sid
                AND a.event_type <> b.event_type
           GROUP BY 1, 2
         )
         SELECT pc.ante, pc.cons, pc.c2 AS n_sessions,
           floor(pc.c2::DOUBLE / tot.n * 1e6 + 0.5) / 1e6 AS support,
           floor(pc.c2::DOUBLE / sa.c1 * 1e6 + 0.5) / 1e6 AS confidence,
           floor(pc.c2::DOUBLE / sa.c1 / (sc.c1::DOUBLE / tot.n)
             * 1e6 + 0.5) / 1e6 AS lift
         FROM pc JOIN single sa ON pc.ante = sa.event_type
                 JOIN single sc ON pc.cons = sc.event_type, tot
         WHERE pc.c2::DOUBLE / tot.n >= 0.01
         ORDER BY ante, cons""",
    "q_seasonal" ->
      """WITH d AS (SELECT event_type, value,
             ((epoch_ns(ts) // 86400000000000 + 3) % 7)::INT AS dow
           FROM events)
         SELECT event_type, dow, count(*)::BIGINT AS n,
           floor(avg(value) * 1e6 + 0.5) / 1e6 AS mean,
           floor(stddev_pop(value) * 1e6 + 0.5) / 1e6 AS sd
         FROM d GROUP BY event_type, dow ORDER BY event_type, dow""",
    "q_latency" ->
      """WITH j AS (
           SELECT e.ts AS lts, v.ts AS rts
           FROM (SELECT * FROM events WHERE event_type = 'click') e
           ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
             ON e.user_id = v.user_id AND e.ts >= v.ts),
         l AS (SELECT (epoch_ns(lts) - epoch_ns(rts))::DOUBLE / 1e9 AS lat
               FROM j)
         SELECT count(*)::BIGINT AS n,
           floor(quantile_cont(lat, 0.5) * 1e6 + 0.5) / 1e6 AS p50,
           floor(quantile_cont(lat, 0.9) * 1e6 + 0.5) / 1e6 AS p90,
           floor(quantile_cont(lat, 0.99) * 1e6 + 0.5) / 1e6 AS p99
         FROM l""",
    // exact integer moment sums in HUGEINT (mirrors the Spark side's
    // DECIMAL(38,0) — see Temporal.trendSlopes: streaming covar_pop
    // moments are merge-order-dependent in their last ulps and flip
    // 6-dp rounding boundaries across engines at scale); intercept is
    // rounded in integer arithmetic ((2a+b)//(2b), truncation toward
    // zero in both engines) before any conversion to double
    "q_trend" ->
      """WITH t AS (SELECT user_id,
             CAST(floor(CAST(epoch_ns(ts) AS DOUBLE) / 1000000000)
               AS HUGEINT) AS xs,
             CAST(floor(value * 1000000 + 0.5) AS HUGEINT) AS y6
           FROM events),
         a AS (SELECT user_id, count(*)::HUGEINT AS n,
                 sum(xs) AS sx, sum(y6) AS sy, sum(xs*xs) AS sxx,
                 sum(xs*y6) AS sxy, sum(y6*y6) AS syy
               FROM t GROUP BY user_id),
         d AS (SELECT user_id, n, n*sxy - sx*sy AS covn,
                 n*sxx - sx*sx AS vxn, n*syy - sy*sy AS vyn,
                 sy*sxx - sx*sxy AS intn
               FROM a)
         SELECT user_id, n::BIGINT AS n,
           CASE WHEN vxn > 0 THEN
             floor(CAST(covn AS DOUBLE) / CAST(vxn AS DOUBLE)
               * 86400.0 / 1000000.0 * 1e6 + 0.5) / 1e6 END AS slope,
           CASE WHEN vxn > 0 THEN
             CAST((2 * intn + vxn) // (2 * vxn) AS DOUBLE) / 1000000.0
           END AS intercept,
           CASE WHEN vxn > 0 AND vyn > 0 THEN
             floor(CAST(covn AS DOUBLE) * CAST(covn AS DOUBLE)
               / (CAST(vxn AS DOUBLE) * CAST(vyn AS DOUBLE))
               * 1e6 + 0.5) / 1e6 END AS r2
         FROM d ORDER BY user_id""",
    "q_dau" ->
      """WITH du AS (SELECT DISTINCT
             floor(epoch_ns(ts) / 86400000000000)::BIGINT AS day, user_id
           FROM events),
         dau AS (SELECT day, count(*)::BIGINT AS dau FROM du GROUP BY day),
         w AS (SELECT DISTINCT day + g AS day, user_id
               FROM du, (SELECT unnest(generate_series(0, 6)) AS g)),
         wau AS (SELECT day, count(*)::BIGINT AS wau FROM w GROUP BY day)
         SELECT strftime(DATE '1970-01-01' + dau.day::INT, '%Y-%m-%d')
             AS day,
           dau.dau, wau.wau,
           floor(dau.dau::DOUBLE / wau.wau * 1e6 + 0.5) / 1e6 AS stickiness
         FROM dau JOIN wau ON dau.day = wau.day ORDER BY day""",
    "q_dau_sketch" ->
      """WITH du AS (SELECT DISTINCT
             floor(epoch_ns(ts) / 86400000000000)::BIGINT AS day, user_id
           FROM events)
         SELECT strftime(DATE '1970-01-01' + day::INT, '%Y-%m-%d') AS day,
           CAST(true AS BOOLEAN) AS within_tol
         FROM (SELECT DISTINCT day FROM du) ORDER BY day""",
    "q_markov" ->
      """WITH t AS (SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev
           FROM events),
         c AS (SELECT prev AS prev_state, event_type AS next_state,
                 count(*)::BIGINT AS cnt
               FROM t WHERE prev IS NOT NULL GROUP BY 1, 2),
         s AS (SELECT prev_state, sum(cnt)::DOUBLE AS tot FROM c
               GROUP BY prev_state)
         SELECT c.prev_state, c.next_state, c.cnt,
           floor(c.cnt::DOUBLE / s.tot * 1e6 + 0.5) / 1e6 AS prob
         FROM c JOIN s USING (prev_state)
         ORDER BY prev_state, next_state""",
    // dyadic weights (0.5^j) make every product exact, and the sum is
    // written in the engine's own left-to-right term order — bit-equal
    "q_ewma" ->
      """WITH t AS (SELECT event_id, user_id, value,
             lag(value, 0) OVER w AS v0, lag(value, 1) OVER w AS v1,
             lag(value, 2) OVER w AS v2, lag(value, 3) OVER w AS v3,
             lag(value, 4) OVER w AS v4, lag(value, 5) OVER w AS v5,
             lag(value, 6) OVER w AS v6, lag(value, 7) OVER w AS v7
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT event_id, user_id, value,
           floor((coalesce(v0 * 1.0, 0) + coalesce(v1 * 0.5, 0)
                + coalesce(v2 * 0.25, 0) + coalesce(v3 * 0.125, 0)
                + coalesce(v4 * 0.0625, 0) + coalesce(v5 * 0.03125, 0)
                + coalesce(v6 * 0.015625, 0) + coalesce(v7 * 0.0078125, 0))
             / (CASE WHEN v0 IS NULL THEN 0 ELSE 1.0 END
                + CASE WHEN v1 IS NULL THEN 0 ELSE 0.5 END
                + CASE WHEN v2 IS NULL THEN 0 ELSE 0.25 END
                + CASE WHEN v3 IS NULL THEN 0 ELSE 0.125 END
                + CASE WHEN v4 IS NULL THEN 0 ELSE 0.0625 END
                + CASE WHEN v5 IS NULL THEN 0 ELSE 0.03125 END
                + CASE WHEN v6 IS NULL THEN 0 ELSE 0.015625 END
                + CASE WHEN v7 IS NULL THEN 0 ELSE 0.0078125 END)
             * 1e6 + 0.5) / 1e6 AS ewma
         FROM t ORDER BY event_id""",
    "q_anomaly" ->
      """WITH z AS (
           SELECT event_id, user_id,
                  (value - avg(value) OVER w) /
                    nullif(stddev_pop(value) OVER w, 0) AS zraw
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)
                        RANGE BETWEEN 86400000000000 PRECEDING
                              AND CURRENT ROW)
         )
         SELECT event_id, user_id,
                floor(zraw * 1e6 + 0.5) / 1e6 AS z
         FROM z WHERE abs(zraw) > 2 ORDER BY event_id""",
    "q_sessions" ->
      """WITH g AS (
           SELECT user_id, ts, event_id,
                  CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END AS ns
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ), s AS (
           SELECT user_id,
                  sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
           FROM g
         ), per AS (
           SELECT user_id, sid, count(*) AS ev FROM s GROUP BY user_id, sid
         )
         SELECT user_id, max(sid)::BIGINT AS n_sessions,
                sum(ev)::BIGINT AS n_events, max(ev)::BIGINT AS longest
         FROM per GROUP BY user_id ORDER BY user_id""",
    "q_asof" ->
      """SELECT e.event_id, e.user_id, v.event_id AS view_id
         FROM (SELECT * FROM events WHERE event_type = 'click') e
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
           ON e.user_id = v.user_id AND e.ts >= v.ts
         ORDER BY e.event_id""",
    "q_merge_intervals" ->
      """WITH iv AS (SELECT user_id, epoch_ns(ts) AS s,
             epoch_ns(ts) + 3600000000000 AS e FROM events),
         o AS (SELECT user_id, s, e,
             max(e) OVER (PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
           FROM iv),
         g AS (SELECT user_id, s, e,
             CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS ni
           FROM o),
         s2 AS (SELECT user_id, s, e,
             sum(ni) OVER (PARTITION BY user_id ORDER BY s, e
               ROWS UNBOUNDED PRECEDING) AS island
           FROM g)
         SELECT user_id, min(s) AS span_start, max(e) AS span_end,
                count(*)::BIGINT AS n_merged
         FROM s2 GROUP BY user_id, island
         ORDER BY user_id, span_start""",
    "q_session_window" ->
      """WITH g AS (
           SELECT user_id, ts, event_id, value,
                  CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END AS ns
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ), s AS (
           SELECT user_id, ts, value,
                  sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS sid
           FROM g)
         SELECT user_id, epoch_ns(min(ts)) AS start_ns,
                count(*)::BIGINT AS n_events,
                floor(sum(value) * 1e6 + 0.5) / 1e6 AS sv
         FROM s GROUP BY user_id, sid
         ORDER BY user_id, start_ns""",
    "q_rolling" ->
      """SELECT event_id, user_id,
           count(*) OVER w AS n_24h,
           floor(sum(value) OVER w * 1e6 + 0.5) / 1e6 AS v_24h
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)
           RANGE BETWEEN 86400000000000 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    "q_asof_fwd" ->
      """SELECT e.event_id, e.user_id,
           CASE WHEN v.ts IS NOT NULL
                 AND epoch_ns(v.ts) - epoch_ns(e.ts) <= 7200000000000
                THEN v.event_id END AS view_id
         FROM (SELECT * FROM events WHERE event_type = 'click') e
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
           ON e.user_id = v.user_id AND e.ts <= v.ts
         ORDER BY e.event_id""",
    "q_asof_near" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events
             WHERE event_type = 'click'),
         v AS (SELECT event_id, user_id, ts FROM events
             WHERE event_type = 'view'),
         b AS (SELECT c.event_id, c.user_id, c.ts,
                 vb.event_id AS bid, vb.ts AS bts
               FROM c ASOF LEFT JOIN v vb
                 ON c.user_id = vb.user_id AND c.ts >= vb.ts),
         f AS (SELECT c.event_id, vf.event_id AS fid, vf.ts AS fts
               FROM c ASOF LEFT JOIN v vf
                 ON c.user_id = vf.user_id AND c.ts <= vf.ts)
         SELECT b.event_id, b.user_id,
           CASE WHEN bid IS NOT NULL
                     AND epoch_ns(b.ts) - epoch_ns(bts) <= 3600000000000
                     AND (fid IS NULL
                          OR epoch_ns(fts) - epoch_ns(b.ts) > 3600000000000
                          OR epoch_ns(b.ts) - epoch_ns(bts)
                             <= epoch_ns(fts) - epoch_ns(b.ts))
                THEN bid
                WHEN fid IS NOT NULL
                     AND epoch_ns(fts) - epoch_ns(b.ts) <= 3600000000000
                THEN fid END AS view_id
         FROM b JOIN f ON b.event_id = f.event_id
         ORDER BY b.event_id""",
    "q_gaps" ->
      """WITH g AS (
           SELECT epoch_ns(ts) - lag(epoch_ns(ts)) OVER
             (PARTITION BY user_id ORDER BY ts, event_id) AS gap
           FROM events),
         q AS (SELECT quantile_cont(gap, [0.5, 0.9, 0.99]) AS qs
               FROM g WHERE gap IS NOT NULL)
         SELECT 0.5 AS p, qs[1]::DOUBLE AS gap_ns FROM q
         UNION ALL SELECT 0.9, qs[2]::DOUBLE FROM q
         UNION ALL SELECT 0.99, qs[3]::DOUBLE FROM q
         ORDER BY p""",
    "q_changepoint" ->
      """WITH per AS (
           SELECT user_id, epoch_ns(ts) // 86400000000000 AS p,
                  count(*) AS x
           FROM events GROUP BY user_id, p),
         s AS (
           SELECT user_id, p,
             sum(x) OVER (PARTITION BY user_id ORDER BY p
                          ROWS UNBOUNDED PRECEDING) AS c,
             row_number() OVER (PARTITION BY user_id ORDER BY p) AS t,
             count(*) OVER (PARTITION BY user_id) AS n,
             sum(x) OVER (PARTITION BY user_id) AS tot
           FROM per),
         d AS (
           SELECT user_id, p,
             abs(c::DOUBLE - t::DOUBLE / n::DOUBLE * tot::DOUBLE) AS dd,
             tot,
             row_number() OVER (PARTITION BY user_id
               ORDER BY abs(c::DOUBLE - t::DOUBLE / n::DOUBLE * tot::DOUBLE)
                 DESC, p) AS rn
           FROM s)
         SELECT user_id, p AS cp_period,
                floor(dd / tot * 1e6 + 0.5) / 1e6 AS strength
         FROM d WHERE rn = 1 AND user_id < 50 ORDER BY user_id""",
    "q_funnel_win" ->
      """WITH u1 AS (SELECT user_id, min(epoch_ns(ts)) AS t FROM events
             WHERE event_type = 'signup' GROUP BY user_id),
         u2 AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS t FROM events e
             JOIN u1 ON e.user_id = u1.user_id
             WHERE e.event_type = 'view' AND epoch_ns(e.ts) >= u1.t
               AND epoch_ns(e.ts) - u1.t <= 86400000000000
             GROUP BY e.user_id),
         u3 AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS t FROM events e
             JOIN u2 ON e.user_id = u2.user_id
             WHERE e.event_type = 'click' AND epoch_ns(e.ts) >= u2.t
               AND epoch_ns(e.ts) - u2.t <= 86400000000000
             GROUP BY e.user_id),
         u4 AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS t FROM events e
             JOIN u3 ON e.user_id = u3.user_id
             WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) >= u3.t
               AND epoch_ns(e.ts) - u3.t <= 86400000000000
             GROUP BY e.user_id)
         SELECT 1::INT AS step, 'signup' AS step_name,
                count(*)::BIGINT AS n_keys FROM u1
         UNION ALL SELECT 2::INT, 'view', count(*)::BIGINT FROM u2
         UNION ALL SELECT 3::INT, 'click', count(*)::BIGINT FROM u3
         UNION ALL SELECT 4::INT, 'purchase', count(*)::BIGINT FROM u4
         ORDER BY step""",
    "q_funnel" ->
      """WITH u1 AS (SELECT user_id, min(ts) AS t FROM events
             WHERE event_type = 'signup' GROUP BY user_id),
         u2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
             JOIN u1 ON e.user_id = u1.user_id
             WHERE e.event_type = 'view' AND e.ts >= u1.t
             GROUP BY e.user_id),
         u3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
             JOIN u2 ON e.user_id = u2.user_id
             WHERE e.event_type = 'click' AND e.ts >= u2.t
             GROUP BY e.user_id),
         u4 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
             JOIN u3 ON e.user_id = u3.user_id
             WHERE e.event_type = 'purchase' AND e.ts >= u3.t
             GROUP BY e.user_id)
         SELECT 1::INT AS step, 'signup' AS step_name,
                count(*)::BIGINT AS n_keys FROM u1
         UNION ALL SELECT 2::INT, 'view', count(*)::BIGINT FROM u2
         UNION ALL SELECT 3::INT, 'click', count(*)::BIGINT FROM u3
         UNION ALL SELECT 4::INT, 'purchase', count(*)::BIGINT FROM u4
         ORDER BY step""",
    "q_retention" ->
      """WITH per AS (SELECT user_id,
             epoch_ns(ts) // 86400000000000 AS p FROM events),
         pk AS (SELECT user_id, min(p) AS cohort FROM per GROUP BY user_id),
         act AS (SELECT DISTINCT per.user_id, pk.cohort,
                   per.p - pk.cohort AS off
                 FROM per JOIN pk USING (user_id))
         SELECT cohort::BIGINT AS cohort, off::BIGINT AS "offset",
                count(*)::BIGINT AS n_active
         FROM act GROUP BY cohort, off ORDER BY cohort, "offset"""",
    "q_topk_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) t
         WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q_interval" ->
      """SELECT w.win_id, count(*)::BIGINT AS n_events,
           floor(sum(e.value) * 1e6 + 0.5) / 1e6 AS sum_value
         FROM (SELECT g AS win_id,
                 1704067200000000000 + g * 86400000000000 AS w_start,
                 1704067200000000000 + g * 86400000000000
                   + 21600000000000 AS w_end
               FROM generate_series(0, 29) t(g)) w
         JOIN events e ON epoch_ns(e.ts) BETWEEN w.w_start AND w.w_end
         GROUP BY w.win_id ORDER BY w.win_id""",
    "q_overlap" ->
      """WITH spans AS (
           SELECT user_id, min(epoch_ns(ts)) AS u_start,
                  max(epoch_ns(ts)) AS u_end
           FROM events GROUP BY user_id),
         w AS (SELECT g AS win_id,
                 1704067200000000000 + g * 86400000000000 AS w_start,
                 1704067200000000000 + g * 86400000000000
                   + 21600000000000 AS w_end
               FROM generate_series(0, 29) t(g))
         SELECT w.win_id, count(*)::BIGINT AS n_users
         FROM w JOIN spans s
           ON s.u_start <= w.w_end AND w.w_start <= s.u_end
         GROUP BY w.win_id ORDER BY w.win_id""",
  )
}
