package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Temporal

class TemporalSpec extends SparkSpec {

  // (user, ts, id) — user 1: three events with a >gap break before the
  // third; user 2: one event; gap unit is abstract (longs)
  private lazy val events = {
    import spark.implicits._
    Seq(
      (1L, 100L, 1L), (1L, 150L, 2L), (1L, 1000L, 3L),
      (2L, 500L, 4L)
    ).toDF("user_id", "ts", "event_id")
  }

  test("sessionize breaks on gap, ids are 1-based per key in time order") {
    val s = Temporal.sessionize(events, "user_id", "ts", "event_id", gap = 100L)
      .select("event_id", "session_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("sessionStats aggregates per key") {
    val stats = Temporal.sessionStats(events, "user_id", "ts", "event_id", 100L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(stats(1L) == ((2L, 3L, 2L))) // 2 sessions, 3 events, longest 2
    assert(stats(2L) == ((1L, 1L, 1L)))
  }

  test("sessionStats is a single-shuffle plan") {
    val plan = Temporal.sessionStats(events, "user_id", "ts", "event_id", 100L)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
  }

  test("asofJoin matches the latest right row at or before left.ts") {
    import spark.implicits._
    val clicks = Seq((1L, 10L, 100L), (1L, 20L, 101L), (1L, 5L, 102L))
      .toDF("user_id", "ts", "event_id")
    val views = Seq((1L, 10L, 200L), (1L, 15L, 201L), (2L, 1L, 202L))
      .toDF("user_id", "ts", "event_id")
    val out = Temporal.asofJoin(clicks, views, "user_id", "ts", "event_id",
      payload = Seq("event_id"))
      .select("event_id", "asof_event_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // ts=10 click matches ts=10 view (<= semantics); ts=20 matches ts=15;
    // ts=5 has no prior view -> null; user 2's view never leaks to user 1
    assert(out == Map(100L -> 200L, 101L -> 201L, 102L -> -1L))
  }

  test("asofJoin forward matches the earliest right row at or after left.ts") {
    import spark.implicits._
    val clicks = Seq((1L, 10L, 100L), (1L, 20L, 101L), (1L, 25L, 102L))
      .toDF("user_id", "ts", "event_id")
    val views = Seq((1L, 10L, 200L), (1L, 22L, 201L), (2L, 30L, 202L))
      .toDF("user_id", "ts", "event_id")
    val out = Temporal.asofJoin(clicks, views, "user_id", "ts", "event_id",
      payload = Seq("event_id"), direction = "forward")
      .select("event_id", "asof_event_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // ts=10 matches the EQUAL-ts view (inclusive); ts=20 matches ts=22;
    // ts=25 has no later view -> null; user 2 never leaks
    assert(out == Map(100L -> 200L, 101L -> 201L, 102L -> -1L))
  }

  test("asofJoin nearest picks the closer side, ties prefer backward") {
    import spark.implicits._
    val clicks = Seq((1L, 10L, 100L), (1L, 21L, 101L), (1L, 35L, 102L))
      .toDF("user_id", "ts", "event_id")
    val views = Seq((1L, 6L, 200L), (1L, 12L, 201L), (1L, 26L, 202L))
      .toDF("user_id", "ts", "event_id")
    val out = Temporal.asofJoin(clicks, views, "user_id", "ts", "event_id",
      payload = Seq("event_id"), direction = "nearest")
      .select("event_id", "asof_event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ts=10: back 6 (d=4) vs fwd 12 (d=2) -> 201; ts=21: back 12 (d=9)
    // vs fwd 26 (d=5) -> 202; ts=35: only backward 26 -> 202
    assert(out == Map(100L -> 201L, 101L -> 202L, 102L -> 202L))
    // tie: click at 9 is 3 from both 6 and 12 -> backward wins
    val tie = Temporal.asofJoin(
      Seq((1L, 9L, 103L)).toDF("user_id", "ts", "event_id"),
      views, "user_id", "ts", "event_id",
      payload = Seq("event_id"), direction = "nearest")
      .select("asof_event_id").head().getLong(0)
    assert(tie == 200L)
  }

  test("asofJoin tolerance nulls matches beyond the window") {
    import spark.implicits._
    val clicks = Seq((1L, 100L, 100L), (1L, 200L, 101L))
      .toDF("user_id", "ts", "event_id")
    val views = Seq((1L, 95L, 200L), (1L, 120L, 201L))
      .toDF("user_id", "ts", "event_id")
    val out = Temporal.asofJoin(clicks, views, "user_id", "ts", "event_id",
      payload = Seq("event_id"), toleranceNs = 10L)
      .select("event_id", "asof_event_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // ts=100: nearest-backward 95 is within 10 -> match; ts=200:
    // nearest-backward 120 is 80 away -> tolerance nulls it
    assert(out == Map(100L -> 200L, 101L -> -1L))
  }

  test("asofJoin matches a right row whose payload value is null") {
    import spark.implicits._
    val clicks = Seq((1L, 10L, 100L)).toDF("user_id", "ts", "event_id")
    val views = Seq((1L, 5L, Option.empty[Long]), (1L, 2L, Option(200L)))
      .toDF("user_id", "ts", "v")
      .withColumn("event_id", col("ts") * 10)
    val out = Temporal.asofJoin(clicks, views, "user_id", "ts", "event_id",
      payload = Seq("v"))
      .select("asof_v").head()
    // the ts=5 ROW is the asof match even though its payload is null —
    // row-observation semantics, not value-observation
    assert(out.isNullAt(0))
  }

  test("asofJoin is a single-shuffle plan over the union") {
    import spark.implicits._
    val clicks = Seq((1L, 10L, 100L)).toDF("user_id", "ts", "event_id")
    val views = Seq((1L, 5L, 200L)).toDF("user_id", "ts", "event_id")
    val plan = Temporal.asofJoin(clicks, views, "user_id", "ts", "event_id",
      Seq("event_id")).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
    // "nearest" needs both direction carries — a second in-partition
    // sort is fine, a second exchange is not
    val nPlan = Temporal.asofJoin(clicks, views, "user_id", "ts", "event_id",
      Seq("event_id"), direction = "nearest")
      .queryExecution.executedPlan.toString
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(nPlan).length
    assert(nExchanges == 1,
      s"nearest: expected 1 hash exchange, got $nExchanges:\n$nPlan")
  }

  test("mergeIntervals coalesces overlapping and touching spans per key") {
    import spark.implicits._
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 20L),   // overlap -> one span [0,20]
      (1L, 20L, 30L),                 // touching (s == prev e) -> merges
      (1L, 40L, 50L),                 // gap -> new span
      (2L, 0L, 5L))                   // other key isolated
      .toDF("k", "s", "e")
    val out = Temporal.mergeIntervals(iv, "k", "s", "e")
      .select("k", "span_start", "span_end", "n_merged").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out == Set((1L, 0L, 30L, 3L), (1L, 40L, 50L, 1L),
      (2L, 0L, 5L, 1L)))
  }

  test("mergeIntervals is a single-exchange plan") {
    import spark.implicits._
    val iv = Seq((1L, 0L, 10L)).toDF("k", "s", "e")
    val plan = Temporal.mergeIntervals(iv, "k", "s", "e")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
    assert(!plan.contains("Join"), s"no overlap self-join expected:\n$plan")
  }

  test("rollingAgg counts the trailing range inclusively, per key") {
    import spark.implicits._
    val df = Seq((1L, 0L, 1.0), (1L, 50L, 2.0), (1L, 100L, 4.0),
      (1L, 151L, 8.0), (2L, 100L, 16.0))
      .toDF("user_id", "ts", "value")
    val out = Temporal.rollingAgg(df, "user_id", "ts", windowNs = 100L,
      aggs = Seq("n" -> count(lit(1)), "s" -> sum(col("value"))))
      .select("user_id", "ts", "n", "s").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // ts=100 sees [0,100] inclusive both ends; ts=151 sees (51..151] =
    // {100, 151}; key 2 is isolated
    assert(out == Map(
      (1L, 0L) -> (1L, 1.0), (1L, 50L) -> (2L, 3.0),
      (1L, 100L) -> (3L, 7.0), (1L, 151L) -> (2L, 12.0),
      (2L, 100L) -> (1L, 16.0)))
  }

  test("rollingAgg is a single-exchange RANGE-frame plan") {
    import spark.implicits._
    val df = Seq((1L, 0L, 1.0)).toDF("user_id", "ts", "value")
    val plan = Temporal.rollingAgg(df, "user_id", "ts", 100L,
      Seq("n" -> count(lit(1))))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
    assert(!plan.contains("Join"), s"no self-join expected:\n$plan")
  }

  test("topKPerGroup keeps k rows per group in rank order") {
    import spark.implicits._
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0),
      ("b", 4L, 5.0)).toDF("g", "id", "v")
    val top = Temporal.topKPerGroup(df, Seq("g"),
      Seq(col("v").desc, col("id").asc), k = 2)
      .select("g", "id", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(top == Set(("a", 2L, 1L), ("a", 3L, 2L), ("b", 4L, 1L)))
  }

  test("funnel requires steps in time order") {
    import spark.implicits._
    val ev = Seq(
      // u1 completes signup(1) -> view(5) -> click(9)
      (1L, 1L, "signup"), (1L, 5L, "view"), (1L, 9L, "click"),
      // u2 viewed BEFORE signing up: stops after signup
      (2L, 5L, "signup"), (2L, 2L, "view"),
      // u3 signs up and views at the same instant (>= admits it), no click
      (3L, 4L, "signup"), (3L, 4L, "view"),
      // u4 never signs up
      (4L, 1L, "view"), (4L, 2L, "click")
    ).toDF("user_id", "ts", "event_type")
    val got = Temporal.funnel(ev, "user_id", "ts", "event_type",
      Seq("signup", "view", "click"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1, "signup", 3L), (2, "view", 2L), (3, "click", 1L)))
  }

  test("funnelWithin enforces the per-step conversion deadline") {
    import spark.implicits._
    // user 1 converts a→b in 50ns (within); user 2 in 500ns (late);
    // user 3 converts late to b but then b→c fast — still blocked,
    // because it never legally reached step b
    val ev = Seq(
      (1L, 100L, "a"), (1L, 150L, "b"),
      (2L, 100L, "a"), (2L, 600L, "b"),
      (3L, 100L, "a"), (3L, 600L, "b"), (3L, 610L, "c")
    ).toDF("user_id", "ts", "event_type")
    val bounded = Temporal.funnelWithin(ev, "user_id", "ts", "event_type",
        Seq("a", "b", "c"), stepWithinNs = 100L)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(bounded == Map(1 -> 3L, 2 -> 1L, 3 -> 0L))
    // unlimited deadline = the plain funnel
    val plain = Temporal.funnel(ev, "user_id", "ts", "event_type",
        Seq("a", "b", "c"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(plain == Map(1 -> 3L, 2 -> 3L, 3 -> 1L))
  }

  test("funnel repeated step types need strictly later events") {
    import spark.implicits._
    val ev = Seq(
      // u1 purchased once: must NOT count as buying twice
      (1L, 1L, "view"), (1L, 5L, "purchase"),
      // u2 purchased twice
      (2L, 1L, "view"), (2L, 3L, "purchase"), (2L, 9L, "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = Temporal.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "purchase", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got == Map(1 -> 2L, 2 -> 2L, 3 -> 1L))
  }

  test("cohortRetention counts distinct keys per cohort and offset") {
    import spark.implicits._
    // period length 10: u1 joins period 0, active 0 and 2 (twice — dedup);
    // u2 joins period 0, active 0 only; u3 joins period 1, active 1 and 2
    val ev = Seq(
      (1L, 1L), (1L, 5L), (1L, 25L), (1L, 27L),
      (2L, 3L),
      (3L, 12L), (3L, 22L)).toDF("user_id", "ts")
    val got = Temporal.cohortRetention(ev, "user_id", "ts", periodLen = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (0L, 0L) -> 2L, // u1, u2 in their joining period
      (0L, 2L) -> 1L, // u1 returns two periods later (deduped)
      (1L, 0L) -> 1L, // u3 joins
      (1L, 1L) -> 1L  // u3 returns
    ))
  }

  test("cohortRetention floors negative timestamps like SQL // division") {
    import spark.implicits._
    // ts = -1 belongs to period -1 under floor division (one ns before
    // the epoch), NOT period 0 (which truncation toward zero would give)
    val ev = Seq((1L, -1L), (1L, 5L), (2L, -10L)).toDF("user_id", "ts")
    val got = Temporal.cohortRetention(ev, "user_id", "ts", periodLen = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // u1 cohort -1 (ts=-1), active at -1 and 0 (ts=5); u2 cohort -1 (ts=-10
    // is exactly divisible: period -1)
    assert(got == Map((-1L, 0L) -> 2L, (-1L, 1L) -> 1L))
  }

  test("cohortRetention plan: two hash exchanges, key then cohort/offset") {
    import spark.implicits._
    val ev = Seq((1L, 1L), (2L, 3L)).toDF("user_id", "ts")
    val plan = Temporal.cohortRetention(ev, "user_id", "ts", 10L)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 hash exchanges, got $exchanges:\n$plan")
  }

  test("intervalJoin: inclusive containment, multi-bucket intervals, equi-keys") {
    import spark.implicits._
    val pts = Seq((1L, 0L), (2L, 10L), (3L, 25L), (4L, 30L), (5L, 31L),
      (6L, 100L)).toDF("pt_id", "t")
    // [10, 30] spans buckets 1..3 at grain 10; [25, 26] sits inside one
    val ivs = Seq((100L, 10L, 30L), (200L, 25L, 26L)).toDF("iv_id", "lo", "hi")
    val got = Temporal.intervalJoin(pts, ivs, "t", "lo", "hi", grain = 10L)
      .select("pt_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // both endpoints inclusive; each matching pair appears exactly once
    assert(got == Set((2L, 100L), (3L, 100L), (4L, 100L), (3L, 200L)))
    // additional equi-key: same times, keyed — only same-key pairs match
    val kpts = Seq(("a", 1L, 10L), ("b", 2L, 10L)).toDF("k", "pt_id", "t")
    val kivs = Seq(("a", 100L, 0L, 20L)).toDF("k", "iv_id", "lo", "hi")
    val kg = Temporal.intervalJoin(kpts, kivs, "t", "lo", "hi", 10L, Seq("k"))
      .select("pt_id").collect().map(_.getLong(0)).toSet
    assert(kg == Set(1L))
  }

  test("overlapJoin: each overlapping pair exactly once, no distinct pass") {
    import spark.implicits._
    // L [0,25] spans 3 buckets at grain 10 and overlaps R [5,40] in all
    // of them — canonical-bucket filtering must still emit the pair ONCE
    val l = Seq((1L, 0L, 25L), (2L, 50L, 60L)).toDF("l_id", "ls", "le")
    val r = Seq((10L, 5L, 40L), (20L, 60L, 70L), (30L, 90L, 99L))
      .toDF("r_id", "rs", "re")
    val got = Temporal.overlapJoin(l, r, "ls", "le", "rs", "re", grain = 10L)
      .select("l_id", "r_id").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    // (1,10) multi-bucket overlap; (2,20) touch at a single point (60)
    assert(got.sorted.toSeq == Seq((1L, 10L), (2L, 20L)))
    assert(got.length == got.distinct.length, "pairs must be emitted once")
    // no Distinct/dedup operator in the plan — the canonical-bucket
    // predicate replaces it
    val plan = Temporal.overlapJoin(l, r, "ls", "le", "rs", "re", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("distinct"), s"dedup pass crept in:\n$plan")
    // parity with the naive overlap predicate on denser data
    val dl = spark.range(0, 200).select(col("id").alias("l_id"),
      (col("id") * 7 % 500).alias("ls"),
      (col("id") * 7 % 500 + col("id") % 40).alias("le"))
    val dr = spark.range(0, 100).select(col("id").alias("r_id"),
      (col("id") * 13 % 480).alias("rs"),
      (col("id") * 13 % 480 + 25).alias("re"))
    val naive = dl.join(dr, col("ls") <= col("re") && col("rs") <= col("le"))
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val bucketed = Temporal.overlapJoin(dl, dr, "ls", "le", "rs", "re", 32L)
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(bucketed.length == bucketed.distinct.length)
    assert(bucketed.toSet == naive)
  }

  test("interval joins bucket in exact long arithmetic: negatives, nano scale") {
    import spark.implicits._
    // negative times: floor semantics, not div-truncation — [-12,-3]
    // covers buckets -2..-1 and must catch the point at -5 (bucket -1)
    val npts = Seq((1L, -5L), (2L, -15L), (3L, 0L)).toDF("pt_id", "t")
    val nivs = Seq((100L, -12L, -3L)).toDF("iv_id", "lo", "hi")
    val ng = Temporal.intervalJoin(npts, nivs, "t", "lo", "hi", grain = 10L)
      .select("pt_id").collect().map(_.getLong(0)).toSet
    assert(ng == Set(1L))
    // epoch-nanosecond magnitudes: 1.7e18 is where double's ulp is 256 ns
    // and floor(x/grain) in double misassigns boundary-adjacent values
    // (1.7e18-100 rounds UP to the 1.7e18 bucket). Exact long bucketing
    // keeps the pair AND the advertised one-bucket-per-point invariant.
    val base = 1700000000000000000L
    val hpts = Seq((1L, base - 100L), (2L, base + 100L)).toDF("pt_id", "t")
    val hivs = Seq((100L, base - 1000000000L, base - 50L),
      (200L, base, base + 500L)).toDF("iv_id", "lo", "hi")
    val hg = Temporal.intervalJoin(hpts, hivs, "t", "lo", "hi",
        grain = 1000000000L)
      .select("pt_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hg == Set((1L, 100L), (2L, 200L)))
    // overlap at the same magnitude: exactly-once via the canonical bucket
    val hl = Seq((1L, base - 300L, base - 100L)).toDF("l_id", "ls", "le")
    val hr = Seq((10L, base - 200L, base + 200L), (20L, base - 50L, base))
      .toDF("r_id", "rs", "re")
    val ho = Temporal.overlapJoin(hl, hr, "ls", "le", "rs", "re", 1000000000L)
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(ho.toSeq.sorted == Seq((1L, 10L)))
  }

  test("intervalJoin plans as a hash equi-join, never a nested loop") {
    import spark.implicits._
    // disable broadcast so the plan is the one a 100 TB interval side
    // gets: a naive range join would fall back to CartesianProduct here
    val noBc = spark.newSession()
    noBc.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import noBc.implicits._
    val pts = noBc.range(0, 1000).select(col("id").alias("pt_id"),
      (col("id") * 3).alias("t"))
    val ivs = noBc.range(0, 100).select(col("id").alias("iv_id"),
      (col("id") * 30).alias("lo"), (col("id") * 30 + 15).alias("hi"))
    val joined = Temporal.intervalJoin(pts, ivs, "t", "lo", "hi", grain = 16L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"interval join must stay an equi-join:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a shuffled equi-join without broadcast:\n$plan")
    // containment spot-check against the naive predicate
    val naive = pts.join(ivs, col("t") >= col("lo") && col("t") <= col("hi"))
      .select("pt_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = joined.select("pt_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive)
  }

  test("gapQuantiles measures per-key inter-event gaps, first events excluded") {
    import spark.implicits._
    // user 1 gaps: 50, 850; user 2: single event (no gap)
    val ev = Seq((1L, 100L, 1L), (1L, 150L, 2L), (1L, 1000L, 3L),
      (2L, 500L, 4L)).toDF("user_id", "ts", "event_id")
    val got = Temporal.gapQuantiles(ev, "user_id", "ts", "event_id",
        Seq(0.0, 0.5, 1.0))
      .orderBy("p").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    // gaps {50, 850}: min 50, interpolated median 450, max 850
    assert(got.toSeq == Seq((0.0, 50.0), (0.5, 450.0), (1.0, 850.0)))
  }

  test("changepoint finds the rate-shift period via the prefix CUSUM peak") {
    import spark.implicits._
    // user 1: 5 periods at rate 1, then 5 at rate 10 → the CUSUM path
    // bows maximally at the end of the low run (period 4);
    // user 2: constant rate → strength 0 (D is 0 at every prefix)
    val ev = (
      (0 until 5).map(p => Seq((1L, p * 100L))) ++                 // 1/period
      (5 until 10).map(p => (0 until 10).map(i => (1L, p * 100L + i))) ++
      (0 until 4).map(p => Seq((2L, p * 100L), (2L, p * 100L + 1)))
    ).flatten.zipWithIndex.map { case ((u, ts), i) => (u, ts, i.toLong) }
      .toDF("user_id", "ts", "event_id")
    val got = Temporal.changepoint(ev, "user_id", "ts", periodNs = 100L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    // D(t=5) = |5 - 5/10·55| = 22.5; strength = 22.5/55
    val s1 = BigDecimal(22.5 / 55)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((4L, s1)), s"got ${got(1L)}")
    assert(got(2L)._2 == 0.0)
    // two compact exchanges — the (key, period) aggregate (partials
    // collapse map-side; the wire never carries events) and one key
    // exchange shared by all windows; argmax compiles to WindowGroupLimit
    val plan = Temporal.changepoint(ev, "user_id", "ts", 100L)
      .queryExecution.executedPlan.toString
    val ex = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(ex == 2, s"expected 2 exchanges, got $ex:\n$plan")
    assert(plan.contains("partial_count"), s"no map-side combine:\n$plan")
    assert(plan.contains("WindowGroupLimit"), s"argmax not pruned:\n$plan")
  }

  test("sessionPaths: ordered journeys, corpus count, deterministic tiebreak") {
    import spark.implicits._
    // user 1 twice runs a>b (sessions split by gap); user 2 runs a>b
    // then a lone c; user 3 a lone c — paths: a>b ×3, c ×2
    val ev = Seq(
      (1L, 100L, 1L, "a"), (1L, 150L, 2L, "b"),
      (1L, 1000L, 3L, "a"), (1L, 1050L, 4L, "b"),
      (2L, 100L, 5L, "a"), (2L, 150L, 6L, "b"), (2L, 2000L, 7L, "c"),
      (3L, 100L, 8L, "c")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Temporal.sessionPaths(ev, "user_id", "ts", "event_id",
        "event_type", gap = 100L, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a>b", 3L), ("c", 2L)))
    // ORDER within a session comes from (ts, tie), not arrival: shuffle
    // the input rows and the paths must not change
    val shuffled = Temporal.sessionPaths(ev.orderBy(rand(7)), "user_id",
        "ts", "event_id", "event_type", gap = 100L, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(shuffled == got)
    // one data-sized exchange (the session key); the path count collapses
    // to the distinct-path set and top-k is TakeOrdered
    val plan = Temporal.sessionPaths(ev, "user_id", "ts", "event_id",
      "event_type", gap = 100L, k = 10).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, // key + tiny distinct-path exchange
      s"expected 2 hash exchanges (key, path), got $exchanges:\n$plan")
    // the ordering/limit applies ABOVE the final path-count aggregate —
    // only the distinct-path set is ever sorted, never the corpus
    // (planner may fuse it as TakeOrdered or CollectLimit over a sort)
    val sortAt = plan.indexOf("Sort [cnt")
    assert(plan.contains("TakeOrderedAndProject") ||
      (sortAt >= 0 && sortAt < plan.indexOf("HashAggregate")),
      s"order/limit must sit above the path aggregate:\n$plan")
  }

  test("rollingZScore standardizes against the key's trailing window only") {
    import spark.implicits._
    val ev = Seq(
      (1L, 100L, 10.0), (1L, 150L, 20.0), (1L, 1000L, 14.0),
      (2L, 100L, 5.0)
    ).toDF("user_id", "ts", "value")
    val z = Temporal.rollingZScore(ev, "user_id", "ts", "value",
        windowNs = 100L)
      .orderBy("user_id", "ts").collect()
      .map(r => if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    // row0: window {10} → sd 0 → null; row1: window {10,20} → mean 15,
    // sd 5 → z=1; row2: window {14} (1000-100 > 100ns back) → null;
    // row3: single event → null
    assert(z(0).isEmpty && z(2).isEmpty && z(3).isEmpty)
    assert(math.abs(z(1).get - 1.0) < 1e-12)
    // single window exchange; mean and deviation share one WindowExec
    val plan = Temporal.rollingZScore(ev, "user_id", "ts", "value", 100L)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1)
    assert("Window \\[".r.findAllIn(plan).length == 1,
      s"mean/sd must share one WindowExec:\n$plan")
  }

  test("transitionMatrix counts within-key adjacent transitions and row-normalizes") {
    import spark.implicits._
    // user 1: a→b→a ; user 2: a→b — transitions: a→b ×2, b→a ×1; no
    // cross-user transition (user 2's 'a' never follows user 1's 'a')
    val ev = Seq(
      (1L, 100L, 1L, "a"), (1L, 200L, 2L, "b"), (1L, 300L, 3L, "a"),
      (2L, 150L, 4L, "a"), (2L, 250L, 5L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Temporal.transitionMatrix(ev, "user_id", "ts", "event_id",
      "event_type").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(
      ("a", "b") -> ((2L, 1.0)),
      ("b", "a") -> ((1L, 1.0))))
  }

  test("transitionMatrix breaks timestamp ties by the tie column") {
    import spark.implicits._
    val ev = Seq(
      (1L, 100L, 1L, "x"), (1L, 100L, 2L, "y"), (1L, 100L, 3L, "z"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Temporal.transitionMatrix(ev, "user_id", "ts", "event_id",
      "event_type").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("x", "y"), ("y", "z")))
  }

  test("seasonalProfile: epoch-day dow with Monday=0; per-group moments") {
    import spark.implicits._
    val day = 86400L * 1000000000L
    // epoch day 0 = Thursday (dow 3); day 4 = Monday (dow 0)
    val ev = Seq(
      ("a", 0L * day + 5, 10.0), ("a", 0L * day + 9, 14.0),
      ("a", 4L * day + 1, 7.0), ("b", 4L * day + 2, 1.0))
      .toDF("g", "ts", "v")
    val got = Temporal.seasonalProfile(ev, "g", "ts", "v")
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got(("a", 3)) == ((2L, 12.0, 2.0)))
    assert(got(("a", 0)) == ((1L, 7.0, 0.0)))
    assert(got(("b", 0)) == ((1L, 1.0, 0.0)))
    assert(got.size == 3)
  }

  test("basketRules: support/confidence/lift on hand sessions") {
    import spark.implicits._
    // user1 s1 {a,b}; user1 s2 {a} (gap > 100); user2 s1 {a,b,c}
    val ev = Seq(
      (1L, 100L, 1L, "a"), (1L, 150L, 2L, "b"),
      (1L, 1000L, 3L, "a"),
      (2L, 100L, 4L, "a"), (2L, 110L, 5L, "b"), (2L, 120L, 6L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Temporal.basketRules(ev, "user_id", "ts", "event_id",
      "event_type", gap = 100L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    // 3 sessions; singles a:3 b:2 c:1
    assert(got(("a", "b")) == ((2L, r6(2.0 / 3), r6(2.0 / 3), 1.0)))
    assert(got(("b", "a")) == ((2L, r6(2.0 / 3), 1.0, 1.0)))
    assert(got(("b", "c")) == ((1L, r6(1.0 / 3), 0.5, 1.5)))
    assert(got(("c", "b")) == ((1L, r6(1.0 / 3), 1.0, 1.5)))
    assert(got.size == 6)
  }

  test("trendSlopes: exact line recovered; degenerate time axis nulls out") {
    import spark.implicits._
    val day = 86400L * 1000000000L
    val ev = Seq(
      (1L, 0L * day, 1.0), (1L, 1L * day, 3.0), (1L, 2L * day, 5.0),
      (2L, 5L * day, 7.0), (2L, 5L * day, 9.0))
      .toDF("user_id", "ts", "value")
    val got = Temporal.trendSlopes(ev, "user_id", "ts", "value")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))
      .toMap
    // user 1: y = 1 + 2·x(days), perfectly linear
    assert(got(1L) == ((3L, Some(2.0), Some(1.0), Some(1.0))))
    // user 2: both events at the same instant — no time axis
    assert(got(2L) == ((2L, None, None, None)))
  }

  test("activeUsers: dau/wau/stickiness on a hand fixture, long-ns input") {
    import spark.implicits._
    val day = 86400L * 1000000000L
    // user 1 active day0+day1, user 2 active day0 only
    val ev = Seq(
      (1L, 0L * day + 5L), (1L, 1L * day + 5L), (1L, 1L * day + 99L),
      (2L, 0L * day + 7L))
      .toDF("user_id", "ts")
    val got = Temporal.activeUsers(ev, "user_id", "ts", windowDays = 7)
      .orderBy("day").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    // day0: dau 2, wau 2 (window reaches back, nothing earlier) → 1.0
    // day1: dau 1, wau 2 (user 2 still inside trailing 7d) → 0.5
    assert(got.toSeq == Seq((2L, 2L, 1.0), (1L, 2L, 0.5)))
  }

  test("activeUsersSketch agrees with the exact ledger at small cardinality") {
    import spark.implicits._
    val day = 86400L * 1000000000L
    val ev = (for (d <- 0 until 5; u <- 1 to (d + 3))
      yield (u.toLong, d.toLong * day + u)).toDF("user_id", "ts")
    val exact = Temporal.activeUsers(ev, "user_id", "ts", 7)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = Temporal.activeUsersSketch(ev, "user_id", "ts", 7)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // HLL in sparse mode is exact at this cardinality
    assert(approx == exact)
  }

  test("ewma matches the closed form and renormalizes short prefixes") {
    import spark.implicits._
    val ev = Seq(
      (1L, 100L, 1L, 4.0), (1L, 200L, 2L, 8.0), (1L, 300L, 3L, 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    val got = Temporal.ewma(ev, "user_id", "ts", "event_id", "value",
      alpha = 0.5, k = 8)
      .select("event_id", "ewma").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    assert(got(1L) == 4.0)                            // lone value: itself
    assert(got(2L) == r6((8.0 + 0.5 * 4.0) / 1.5))    // two-term renormalized
    assert(got(3L) == r6((2.0 + 0.5 * 8.0 + 0.25 * 4.0) / 1.75))
  }

  test("ewma truncates at k lags and shares one WindowExec") {
    import spark.implicits._
    val ev = (1L to 10L).map(i => (1L, i * 100L, i, 1.0 * i))
      .toDF("user_id", "ts", "event_id", "value")
    val df = Temporal.ewma(ev, "user_id", "ts", "event_id", "value",
      alpha = 0.5, k = 2)
    val got = df.select("event_id", "ewma").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // k=2: ewma_i = (v_i + 0.5 v_{i-1}) / 1.5 — older lags dropped
    assert(got(10L) == math.floor((10.0 + 0.5 * 9.0) / 1.5 * 1e6 + 0.5) / 1e6)
    val plan = df.queryExecution.executedPlan.toString
    assert("Window \\[".r.findAllIn(plan).length == 1, plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
  }
}
