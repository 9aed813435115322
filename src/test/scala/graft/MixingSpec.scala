package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Mixing, Sampling}

class MixingSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    // web: 100 docs × 10 tokens; books: 50 × 40; code: 10 × 5
    val rows =
      (0 until 100).map(i => (i.toLong, Seq.fill(10)("w").mkString(" "), "web")) ++
      (100 until 150).map(i => (i.toLong, Seq.fill(40)("b").mkString(" "), "books")) ++
      (150 until 160).map(i => (i.toLong, Seq.fill(5)("c").mkString(" "), "code"))
    rows.toDF("id", "text", "source")
  }

  test("sourceStats measures docs, tokens and share") {
    val st = Mixing.sourceStats(docs, "text", "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(st("web") == ((100L, 1000L, 0.327869)))   // 1000/3050
    assert(st("books") == ((50L, 2000L, 0.655738)))
    assert(st("code") == ((10L, 50L, 0.016393)))
  }

  test("temperaturePlan flattens the mix as alpha drops") {
    val stats = Mixing.sourceStats(docs, "text", "source")
    def plan(alpha: Double) = Mixing.temperaturePlan(stats, "source",
      alpha, tokenBudget = 1000L)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    // alpha=1 reproduces the natural token shares
    val nat = plan(1.0)
    assert(math.abs(nat("web")._1 - 0.327869) < 1e-6)
    assert(math.abs(nat("books")._1 - 0.655738) < 1e-6)
    // alpha=0.5 moves mass from the head to the tail: code's target
    // share rises above its natural 0.0164, books' falls below 0.6557
    val t05 = plan(0.5)
    assert(t05("code")._1 > 0.016393, t05.toString)
    assert(t05("books")._1 < 0.655738, t05.toString)
    // still a distribution
    assert(math.abs(t05.values.map(_._1).sum - 1.0) < 1e-5)
    // rates respect the cap
    assert(t05.values.forall { case (_, r) => r >= 0.0 && r <= 1.0 })
  }

  test("mixToTemperature realizes the flattened mix deterministically") {
    val once = Mixing.mixToTemperature(docs, "text", "id", "source",
      alpha = 0.5, tokenBudget = 1500L)
    val again = Mixing.mixToTemperature(docs.repartition(7), "text", "id",
      "source", alpha = 0.5, tokenBudget = 1500L)
    val a = once.select("id").collect().map(_.getLong(0)).toSet
    assert(a == again.select("id").collect().map(_.getLong(0)).toSet)
    assert(a.nonEmpty)
    // realized token mass lands near the budget (md5 sampling is
    // binomial around the rate; this fixture is small, so allow slack)
    val toks = once.select(
      sum(pipeline.TextAnalysis.tokenCount(col("text")).cast("long")))
      .head().getLong(0)
    assert(toks > 700 && toks < 2300, s"realized $toks of budget 1500")
    // the tail source must survive flattening
    assert(once.filter(col("source") === "code").count() > 0)
  }

  test("budgetRates hits targets and caps at 1.0") {
    val stats = Mixing.sourceStats(docs, "text", "source")
    val rates = Mixing.budgetRates(stats, "source",
      weights = Map("web" -> 0.5, "books" -> 0.5), tokenBudget = 1000L)
    // web slot = 500 of 1000 tokens → rate 0.5; books 500 of 2000 → 0.25
    assert(math.abs(rates("web") - 0.5) < 1e-12)
    assert(math.abs(rates("books") - 0.25) < 1e-12)
    assert(rates("code") == 0.0) // unweighted source drops
    // a budget larger than the source caps at keep-everything
    val big = Mixing.budgetRates(stats, "source",
      weights = Map("code" -> 1.0), tokenBudget = 100000L)
    assert(big("code") == 1.0)
  }

  test("mixToBudget equals stratifiedSample at the planned rates") {
    val weights = Map("web" -> 0.7, "books" -> 0.3)
    val got = Mixing.mixToBudget(docs, "text", "id", "source", weights, 800L)
      .select("id").collect().map(_.getLong(0)).toSet
    val rates = Mixing.budgetRates(
      Mixing.sourceStats(docs, "text", "source"), "source", weights, 800L)
    val want = Sampling.stratifiedSample(docs, "id", "source", rates, 0.0)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // realized mix stays on the web/books sources only
    val srcs = docs.filter(col("id").isin(got.toSeq.map(Long.box): _*))
      .select("source").distinct().collect().map(_.getString(0)).toSet
    assert(srcs.subsetOf(Set("web", "books")))
  }

  test("repeatToBudget repeats undersized sources, caps epochs, downsamples oversized") {
    // code: 50 tokens total. weights code=0.5, web=0.5, budget 250 →
    // code target 125 / 50 tokens = 2.5 epochs → 2 full + 0.5 partial;
    // web target 125 / 1000 tokens = 0.125 → 0 full + 0.125 partial
    val out = Mixing.repeatToBudget(docs, "text", "id", "source",
      Map("code" -> 0.5, "web" -> 0.5), tokenBudget = 250L, maxEpochs = 4)
    val byEpoch = out.groupBy("source", "epoch").count()
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(byEpoch(("code", 0)) == 10L && byEpoch(("code", 1)) == 10L)
    val codePartial = byEpoch.getOrElse(("code", 2), 0L)
    assert(codePartial > 0L && codePartial < 10L, s"partial: $codePartial")
    val webPartial = byEpoch.getOrElse(("web", 0), 0L)
    assert(webPartial > 0L && webPartial < 40L, s"web kept: $webPartial")
    assert(!byEpoch.keys.exists(_._1 == "books")) // unweighted → dropped
    // the epoch cap binds: a huge budget stops at maxEpochs full passes
    val capped = Mixing.repeatToBudget(docs, "text", "id", "source",
      Map("code" -> 1.0), tokenBudget = 100000L, maxEpochs = 3)
    val epochs = capped.select("epoch").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(epochs == Set(0, 1, 2))
    // determinism under repartitioning (same rows, same epochs)
    val again = Mixing.repeatToBudget(docs.repartition(7), "text", "id",
      "source", Map("code" -> 0.5, "web" -> 0.5), 250L, 4)
      .select("id", "epoch").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(again == out.select("id", "epoch").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet)
  }

  test("paretoReport: rank order, cumulative shares, 80-percent head") {
    import spark.implicits._
    // tokens: a=8, b=6, c=4, d=2 (total 20) → cum 0.4, 0.7, 0.9, 1.0;
    // head-80 = {a, b, c} (cumulative before c is 0.7 < 0.8; before d 0.9)
    val d = Seq(
      (1L, "w w w w w w w w", "a"), (2L, "w w w w w w", "b"),
      (3L, "w w w w", "c"), (4L, "w w", "d")).toDF("id", "text", "src")
    val got = graft.pipeline.Mixing.paretoReport(d, "text", "src")
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getInt(2), r.getDouble(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      ("a", 1, 0.4, true), ("b", 2, 0.7, true),
      ("c", 3, 0.9, true), ("d", 4, 1.0, false)))
  }

  test("concentrationReport: HHI, effective sources, and the top source") {
    import spark.implicits._
    // token shares: a = 6/12, b = 3/12, c = 3/12 →
    // HHI = 0.25 + 0.0625 + 0.0625 = 0.375; effective = 8/3
    val d = Seq(
      (1L, "w w w w w w", "a"),
      (2L, "w w w", "b"),
      (3L, "w w w", "c")).toDF("id", "text", "src")
    val r = graft.pipeline.Mixing.concentrationReport(d, "text", "src")
      .collect().head
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == 0.375)
    assert(r.getDouble(2) == r6(1.0 / 0.375))
    assert(r.getString(3) == "a" && r.getDouble(4) == 0.5)
    // exact share tie breaks by source name
    val tie = Seq((1L, "w w", "zz"), (2L, "w w", "aa")).toDF("id", "text", "src")
    assert(graft.pipeline.Mixing.concentrationReport(tie, "text", "src")
      .collect().head.getString(3) == "aa")
  }
}
