package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Sampling

class SamplingSpec extends SparkSpec {

  private lazy val ids = {
    import spark.implicits._
    (0L until 2000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
  }

  test("hexThreshold maps rates to the 32-bit prefix space") {
    assert(Sampling.hexThreshold(0.25) == "40000000")
    assert(Sampling.hexThreshold(0.5) == "80000000")
    assert(Sampling.hexThreshold(0.0) == "00000000")
    // rate 1.0 admits every 8-char hex prefix
    assert("ffffffff" < Sampling.hexThreshold(1.0))
  }

  test("deterministic sample is stable and approximately sized") {
    val a = Sampling.deterministicSample(ids, "id", 0.3)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(ids.repartition(7), "id", 0.3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b) // partitioning-independent
    assert(math.abs(a.size - 600) < 100, s"got ${a.size} of ~600")
    // monotone: a lower rate selects a subset of a higher rate
    val c = Sampling.deterministicSample(ids, "id", 0.1)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(c.subsetOf(a))
  }

  test("stratified rates apply per stratum") {
    val out = Sampling.stratifiedSample(ids, "id", "lang",
      rates = Map("en" -> 0.1), defaultRate = 0.9)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("en") < 200 && out("de") > 800, out.toString)
  }

  test("the sample filter is shuffle-free") {
    val p = Sampling.deterministicSample(ids, "id", 0.5)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("weighted sample favors heavy rows, deterministically, TakeOrdered plan") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 200 light rows (w=1) + 20 heavy rows (w=50): a k=40 sample should
    // pull in most of the heavy ids (u^(1/50) crowds toward 1)
    val rows = (0L until 200L).map((_, 1.0)) ++ (1000L until 1020L).map((_, 50.0))
    val df = rows.toDF("id", "w")
    val picked = Sampling.weightedSample(df, "id", col("w"), k = 40)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(picked.size == 40)
    val heavy = picked.count(_ >= 1000L)
    assert(heavy >= 15, s"only $heavy of 20 heavy rows sampled: $picked")
    // deterministic: same input, same sample
    val again = Sampling.weightedSample(df, "id", col("w"), k = 40)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == picked)
    // non-positive / null weights are excluded
    val withBad = df.union(Seq((5000L, 0.0), (5001L, -1.0)).toDF("id", "w"))
    val picked2 = Sampling.weightedSample(withBad, "id", col("w"), k = 300)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(!picked2.contains(5000L) && !picked2.contains(5001L))
    // top-k plans as TakeOrderedAndProject — no global sort
    val plan = Sampling.weightedSample(df, "id", col("w"), k = 40)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("per-group weighted sample takes k rows per group, one exchange") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = for (g <- Seq("en", "de"); i <- 0L until 50L)
      yield (g, g.hashCode.toLong * 1000 + i, 1.0 + i)
    val df = rows.toDF("lang", "id", "w")
    val out = Sampling.weightedSampleByGroup(df, Seq("lang"), "id", col("w"), 7)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang == Map("en" -> 7L, "de" -> 7L))
    // exactly one exchange (the group-key window), not a global sort
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1 && !plan.contains("rangepartitioning"), plan)
  }

  test("capPerGroup keeps at most n per group, stably, with group-limit pushdown") {
    import spark.implicits._
    // skewed: group "big" holds 1900 rows, "small" holds 3
    val rows = (0L until 1900L).map(i => ("big", i)) ++
      Seq(("small", 10000L), ("small", 10001L), ("small", 10002L))
    val df = rows.toDF("grp", "id")
    val out = Sampling.capPerGroup(df, "grp", "id", n = 10)
    val byGrp = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp == Map("big" -> 10L, "small" -> 3L), byGrp.toString)
    // deterministic under repartitioning: same survivors
    val a = out.select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.capPerGroup(df.repartition(13), "grp", "id", n = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // the rank filter compiles to WindowGroupLimit: each map task
    // forwards at most n rows per group into the exchange — the skew
    // property that matters when one domain holds 10^9 docs
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no group-limit pushdown:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, plan)
  }

  test("splitByHash: slices partition the input, sized by the weights") {
    val out = Sampling.splitByHash(ids, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s")
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000L) // every row in exactly one slice
    assert(math.abs(counts("train") - 1600L) < 120, counts.toString)
    assert(math.abs(counts.getOrElse("val", 0L) - 200L) < 80, counts.toString)
    assert(math.abs(counts.getOrElse("test", 0L) - 200L) < 80, counts.toString)
  }

  test("splitByHash is key-stable: same key → same slice, any partitioning or salt-fixed rerun") {
    val w = Seq("train" -> 0.9, "test" -> 0.1)
    val a = Sampling.splitByHash(ids, "id", w, salt = "x")
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.splitByHash(ids.repartition(11), "id", w, salt = "x")
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    // a different salt re-deals (at least some rows move)
    val c = Sampling.splitByHash(ids, "id", w, salt = "y")
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a != c)
  }

  test("splitByHash is a pure map-side projection (no exchange) and validates weights") {
    val out = Sampling.splitByHash(ids, "id", Seq("a" -> 0.5, "b" -> 0.5))
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    intercept[IllegalArgumentException] {
      Sampling.splitByHash(ids, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Sampling.splitByHash(ids, "id", Nil)
    }
  }

  test("shuffleShards: balanced shards, contiguous positions, repartition-stable") {
    import spark.implicits._
    val d = (1L to 100L).map(Tuple1(_)).toDF("id")
    val got = Sampling.shuffleShards(d, "id", shards = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byShard = got.groupBy(_._2)
    assert(byShard.keys.toSet == (0 until 8).toSet)
    // 100 over 8: four shards of 13, four of 12
    assert(byShard.values.map(_.size).toSeq.sorted ==
      Seq(12, 12, 12, 12, 13, 13, 13, 13))
    // positions within a shard are 0..n-1
    byShard.values.foreach(rows =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.size).toSeq))
    val again = Sampling.shuffleShards(d.repartition(7), "id", shards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(again == got.toSet)
  }

  test("clusterSafeSplit keeps every near-dup cluster on one side") {
    import spark.implicits._
    val docs = (1L to 40L).map(Tuple1(_)).toDF("doc_id")
    // clusters {1,2,3}, {10,11}; rest singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Sampling.clusterSafeSplit(docs, "doc_id", pairs,
      "id_a", "id_b", Seq("train" -> 0.8, "eval" -> 0.2))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(Set(got(1L), got(2L), got(3L)).size == 1,
      "cluster {1,2,3} split apart")
    assert(got(10L) == got(11L), "cluster {10,11} split apart")
    assert(got(1L)._1 == 1L && got(10L)._1 == 10L, "cluster key = min id")
    assert(got(20L)._1 == 20L, "singleton groups by own id")
    assert(got.values.map(_._2).toSet == Set("train", "eval"))
  }

  test("exactStratifiedSplit: every stratum lands exact proportional counts") {
    import spark.implicits._
    val d = ((1 to 20).map(i => (i.toLong, "big")) ++
      (21 to 25).map(i => (i.toLong, "small"))).toDF("id", "grp")
    val got = Sampling.exactStratifiedSplit(d, "grp", "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = got.groupBy("grp", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // big (n=20): ceil(16)/ceil(18) → 16/2/2; small (n=5): ceil(4)=4,
    // ceil(4.5)=5 → 4/1/0
    assert(counts == Map(
      ("big", "train") -> 16L, ("big", "val") -> 2L, ("big", "test") -> 2L,
      ("small", "train") -> 4L, ("small", "val") -> 1L))
    // deterministic under repartitioning
    val again = Sampling.exactStratifiedSplit(d.repartition(7), "grp", "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(again == got.collect().map(r => r.getLong(0) -> r.getString(2)).toMap)
  }

  test("classBalance keeps exactly min-class-count rows per class, deterministically") {
    import spark.implicits._
    val d = ((1 to 50).map(i => ("big", i.toLong)) ++
      (51 to 60).map(i => ("mid", i.toLong)) ++
      (61 to 65).map(i => ("small", i.toLong))).toDF("lab", "id")
    val got = Sampling.classBalance(d, "lab", "id")
    val sizes = got.groupBy("lab").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == Map("big" -> 5L, "mid" -> 5L, "small" -> 5L))
    // deterministic under repartitioning
    val again = Sampling.classBalance(d.repartition(7), "lab", "id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == got.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("uniformNegatives: k deterministic draws per anchor, no self-pick") {
    import spark.implicits._
    val corpus = (1L to 100L).map(i => Tuple1(i)).toDF("id")
    val anchors = Seq(1L, 2L, 3L).toDF("a_id")
    val got = Sampling.uniformNegatives(corpus, anchors, "id", "a_id", k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.length <= 12 && got.length >= 9) // ≤1-in-N self-collisions
    assert(got.forall { case (a, _, neg) => a != neg })
    assert(got.forall { case (_, _, neg) => neg >= 1 && neg <= 100 })
    // same picks after repartitioning the corpus
    val again = Sampling.uniformNegatives(corpus.repartition(9), anchors,
      "id", "a_id", k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(again.toSet == got.toSet)
    // draws spread across the corpus (not clumped on one rank)
    assert(got.map(_._3).distinct.length >= 6)
  }
}
