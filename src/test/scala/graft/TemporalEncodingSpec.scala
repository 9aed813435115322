package graft

import graft.pipeline.Temporal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The round-9 temporal unit contract, pinned as a golden matrix: every
  * temporal operator must produce IDENTICAL output whether its time
  * column arrives as integral epoch-nanos (the TIMESTAMP(NANOS) +
  * `nanosAsLong` read path), TIMESTAMP (ltz), or TIMESTAMP_NTZ (how the
  * driver's `timestamp[us]` parquet reads) — the break that took four
  * contract queries down in round 8 was exactly an encoding-dependent
  * code path. Values are micro-aligned so every encoding represents
  * them exactly. */
class TemporalEncodingSpec extends SparkSpec {
  import spark.implicits._

  // ~200 events over 3 users / 4 days, gaps straddling the session
  // threshold and the period boundary; micros-representable ns values
  private val baseNs = 1704067200L * 1000000000L // 2024-01-01T00:00Z
  private def rows: Seq[(Long, Long, Long)] =
    (0 until 200).map { i =>
      val user = i % 3
      val step = (i / 3).toLong
      // alternate small (5 min) and large (2 h) gaps, micros-aligned
      val ns = baseNs + user * 1000000L +
        step * 300000000000L + (step % 5) * 7200000000000L
      (i.toLong, user.toLong, ns)
    }

  private def longDf: DataFrame =
    rows.toDF("event_id", "user_id", "ts")
  private def ltzDf: DataFrame =
    longDf.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  private def ntzDf: DataFrame =
    ltzDf.withColumn("ts", col("ts").cast("timestamp_ntz"))

  private val encodings: Seq[(String, DataFrame)] =
    Seq("long_ns" -> longDf, "timestamp_ltz" -> ltzDf,
      "timestamp_ntz" -> ntzDf)

  /** Collect to a canonical sorted Seq of strings, normalizing any
    * carried-through ts column to its epoch-nanos value so outputs are
    * comparable across encodings. */
  private def canon(df: DataFrame): Seq[String] = {
    val d =
      if (df.columns.contains("ts"))
        df.withColumn("ts", Temporal.epochNanos(df, "ts"))
      else df
    d.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
  }

  test("epochNanos agrees bit-for-bit across all three encodings") {
    val Seq(a, b, c) = encodings.map { case (_, df) =>
      canon(df.select(col("event_id"), Temporal.epochNanos(df, "ts").as("ns")))
    }
    assert(a == b, "long vs ltz")
    assert(a == c, "long vs ntz")
    // and it is the literal input value on the integral passthrough
    assert(longDf.select(
      (Temporal.epochNanos(longDf, "ts") === col("ts")).as("eq"))
      .filter(!col("eq")).count() == 0)
  }

  test("sessionize assigns identical session ids under every encoding") {
    val expected = canon(Temporal.sessionize(
      longDf, "user_id", "ts", "event_id", gap = 1800L * 1000000000L)
      .select("event_id", "user_id", "session_id"))
    for ((name, df) <- encodings.tail) {
      val got = canon(Temporal.sessionize(
        df, "user_id", "ts", "event_id", gap = 1800L * 1000000000L)
        .select("event_id", "user_id", "session_id"))
      assert(got == expected, s"sessionize differs under $name")
    }
  }

  test("sessionStats is encoding-invariant") {
    val expected = canon(Temporal.sessionStats(
      longDf, "user_id", "ts", "event_id", gap = 1800L * 1000000000L))
    for ((name, df) <- encodings.tail)
      assert(canon(Temporal.sessionStats(
        df, "user_id", "ts", "event_id", gap = 1800L * 1000000000L))
        == expected, s"sessionStats differs under $name")
  }

  test("cohortRetention is encoding-invariant") {
    val expected = canon(Temporal.cohortRetention(
      longDf, "user_id", "ts", periodLen = 86400000000000L))
    for ((name, df) <- encodings.tail)
      assert(canon(Temporal.cohortRetention(
        df, "user_id", "ts", periodLen = 86400000000000L))
        == expected, s"cohortRetention differs under $name")
  }

  // interval sides may even use DIFFERENT encodings from each other —
  // windows stay long-typed while points sweep the matrix
  private def wins: DataFrame = {
    val dayNs = 86400L * 1000000000L
    spark.range(0, 8).select(col("id").alias("win_id"),
      (lit(baseNs) + col("id") * dayNs).alias("w_start"),
      (lit(baseNs) + col("id") * dayNs + dayNs / 4).alias("w_end"))
  }

  test("intervalJoin is encoding-invariant (mixed-encoding sides)") {
    val dayNs = 86400L * 1000000000L
    val expected = canon(Temporal.intervalJoin(
      longDf, wins, "ts", "w_start", "w_end", grain = dayNs / 4)
      .select("event_id", "win_id"))
    assert(expected.nonEmpty, "fixture must produce interval matches")
    for ((name, df) <- encodings.tail)
      assert(canon(Temporal.intervalJoin(
        df, wins, "ts", "w_start", "w_end", grain = dayNs / 4)
        .select("event_id", "win_id"))
        == expected, s"intervalJoin differs under $name")
  }

  test("overlapJoin is encoding-invariant (spans derived per encoding)") {
    val dayNs = 86400L * 1000000000L
    def spans(df: DataFrame): DataFrame = df.groupBy("user_id")
      .agg(min(col("ts")).alias("u_start"), max(col("ts")).alias("u_end"))
    val expected = canon(Temporal.overlapJoin(
      spans(longDf), wins, "u_start", "u_end", "w_start", "w_end",
      grain = dayNs).select("user_id", "win_id"))
    assert(expected.nonEmpty, "fixture must produce overlaps")
    for ((name, df) <- encodings.tail)
      assert(canon(Temporal.overlapJoin(
        spans(df), wins, "u_start", "u_end", "w_start", "w_end",
        grain = dayNs).select("user_id", "win_id"))
        == expected, s"overlapJoin differs under $name")
  }

  test("rollingAgg is encoding-invariant") {
    def run(df: DataFrame): DataFrame =
      Temporal.rollingAgg(df, "user_id", "ts",
        windowNs = 3600L * 1000000000L,
        aggs = Seq("n" -> count(lit(1))))
        .select("event_id", "n")
    val expected = canon(run(longDf))
    for ((name, df) <- encodings.tail)
      assert(canon(run(df)) == expected, s"rollingAgg differs under $name")
  }

  test("mergeIntervals is encoding-invariant") {
    def run(df: DataFrame): DataFrame = {
      val iv = df.select(col("user_id"), col("ts").as("s"), col("ts").as("e"))
      Temporal.mergeIntervals(iv, "user_id", "s", "e")
    }
    val expected = canon(run(longDf))
    for ((name, df) <- encodings.tail)
      assert(canon(run(df)) == expected, s"mergeIntervals differs under $name")
  }

  test("asofJoin is encoding-invariant") {
    def run(df: DataFrame): DataFrame = {
      val l = df.filter(col("event_id") % 2 === 0)
        .select("event_id", "user_id", "ts")
      val r = df.filter(col("event_id") % 2 === 1)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_id").as("rid"))
      Temporal.asofJoin(l, r, "user_id", "ts", "event_id", Seq("rid"))
        .select("event_id", "asof_rid")
    }
    val expected = canon(run(longDf))
    for ((name, df) <- encodings.tail)
      assert(canon(run(df)) == expected, s"asofJoin differs under $name")
  }

  test("date columns normalize to midnight UTC epoch-nanos") {
    val d = Seq("2024-01-01", "2024-01-02").toDF("d")
      .withColumn("d", to_date(col("d")))
    val got = d.select(Temporal.epochNanos(d, "d").as("ns"))
      .orderBy("ns").as[Long].collect().toSeq
    assert(got == Seq(1704067200L * 1000000000L,
      1704153600L * 1000000000L), s"got $got")
  }

  test("sessionPaths is encoding-invariant") {
    val ref = canon(Temporal.sessionPaths(longDf
        .withColumn("event_type", concat(lit("t"), col("event_id") % 4)),
      "user_id", "ts", "event_id", "event_type",
      gap = 1800L * 1000000000L, k = 10))
    for ((name, df) <- encodings.tail) {
      val got = canon(Temporal.sessionPaths(df
          .withColumn("event_type", concat(lit("t"), col("event_id") % 4)),
        "user_id", "ts", "event_id", "event_type",
        gap = 1800L * 1000000000L, k = 10))
      assert(got == ref, s"sessionPaths diverged under $name")
    }
  }

  test("rollingZScore is encoding-invariant") {
    def z(df: DataFrame): Seq[String] = canon(
      Temporal.rollingZScore(df
          .withColumn("value", (col("event_id") % 13).cast("double")),
        "user_id", "ts", "value", windowNs = 7200L * 1000000000L)
        .select(col("event_id"), col("z")))
    val ref = z(longDf)
    for ((name, df) <- encodings.tail)
      assert(z(df) == ref, s"rollingZScore diverged under $name")
  }

  test("round-9 additions are encoding-invariant (ewma, markov, activeUsers, trendSlopes)") {
    def withVal(df: DataFrame): DataFrame =
      df.withColumn("value", (col("event_id") % 13).cast("double"))
        .withColumn("event_type",
          concat(lit("t"), (col("event_id") % 4).cast("string")))
    val outs = encodings.map { case (name, df) =>
      val d = withVal(df)
      val parts = Seq(
        canon(Temporal.ewma(d, "user_id", "ts", "event_id", "value")
          .select("event_id", "ewma")),
        canon(Temporal.transitionMatrix(d, "user_id", "ts", "event_id",
          "event_type")),
        canon(Temporal.activeUsers(d, "user_id", "ts")),
        canon(Temporal.trendSlopes(d, "user_id", "ts", "value")))
      name -> parts
    }
    val ref = outs.head._2
    outs.tail.foreach { case (name, parts) =>
      parts.zip(ref).zipWithIndex.foreach { case ((got, want), i) =>
        assert(got == want, s"$name op#$i diverges from long_ns")
      }
    }
  }

  test("unsupported time types are rejected with a clear error") {
    val d = Seq(("a", 1.5)).toDF("k", "t")
    val e = intercept[IllegalArgumentException] {
      Temporal.epochNanos(d, "t")
    }
    assert(e.getMessage.contains("time column"))
  }
}
