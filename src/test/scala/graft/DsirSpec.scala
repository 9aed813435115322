package graft

import graft.pipeline.Dsir
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // raw corpus: 10 physics-flavored docs (the target domain) mixed into
  // 40 generic filler docs with a disjoint vocabulary
  private def fixture = {
    val physics = (1L to 10L).map(i =>
      (i, s"quantum flux entangles the boson field lattice phase $i"))
    val filler = (11L to 50L).map(i =>
      (i, s"invoice number $i shipping address updated order total pending"))
    (physics ++ filler).toDF("doc_id", "text")
  }
  // the target sample is a SEPARATE draw from the physics domain, not a
  // subset of the raw corpus
  private def target = (101L to 105L).map(i =>
    (i, s"boson field lattice phase quantum flux entangles sample $i"))
    .toDF("doc_id", "text")

  test("importance weights rank target-domain docs above off-domain docs") {
    val w = Dsir.importanceWeights(fixture, target, "text", "doc_id",
      buckets = 1024, alpha = 0.5)
    assert(w.count() == 50)
    val byDomain = w.withColumn("dom", col("doc_id") <= 10)
      .groupBy("dom").agg(avg(col("iw")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byDomain(true) > byDomain(false) + 1.0,
      s"target-domain mean iw ${byDomain(true)} not above off-domain ${byDomain(false)}")
  }

  test("resample pulls overwhelmingly from the target domain") {
    val w = Dsir.importanceWeights(fixture, target, "text", "doc_id",
      buckets = 1024, alpha = 0.5)
    val picked = Dsir.resample(w, "doc_id", "iw", k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(picked.size == 10)
    // iw gaps on this fixture are far larger than Gumbel noise: the
    // physics docs must dominate the draw
    assert(picked.count(_ <= 10L) >= 8,
      s"only ${picked.count(_ <= 10L)}/10 picks from the target domain: $picked")
  }

  test("resample is deterministic and stable under repartitioning") {
    val w = Dsir.importanceWeights(fixture, target, "text", "doc_id",
      buckets = 1024, alpha = 0.5)
    val a = Dsir.resample(w, "doc_id", "iw", k = 7)
      .select("doc_id", "sample_key").collect().toSeq
    val b = Dsir.resample(w.repartition(13), "doc_id", "iw", k = 7)
      .orderBy(col("sample_key").desc, col("doc_id"))
      .select("doc_id", "sample_key").collect().toSeq
    assert(a == b)
  }

  test("featureless and edge documents pass through with zero weight") {
    val raw = Seq((1L, "   "), (2L, "one"), (3L, "alpha beta"))
      .toDF("doc_id", "text")
    val w = Dsir.importanceWeights(raw, target, "text", "doc_id",
      buckets = 64, alpha = 0.5)
      .orderBy("doc_id").collect()
    // doc 1: trim-empty still tokenizes to one empty-string unigram —
    // what matters is it neither crashes nor goes null
    assert(w.length == 3)
    assert(!w.exists(r => r.isNullAt(1) || r.isNullAt(2)))
    // doc 2: single token → 1 unigram feature, 0 bigrams
    assert(w(1).getLong(1) == 1L)
    // doc 3: 2 unigrams + 1 bigram
    assert(w(2).getLong(1) == 3L)
  }

  test("empty target sample still yields finite weights") {
    val w = Dsir.importanceWeights(fixture, target.filter(lit(false)),
      "text", "doc_id", buckets = 256, alpha = 0.5)
    assert(w.count() == 50)
    assert(w.filter(col("iw").isNull || isnan(col("iw"))).count() == 0)
  }

  test("plan shape: join-free LUT scoring, TakeOrdered resample, no corpus self-join") {
    // a parquet-backed corpus: a LocalRelation fixture constant-folds
    // the whole projection away and there is no plan left to audit
    val w = Dsir.importanceWeights(
      sf("documents").select(col("doc_id"), col("text")),
      target, "text", "doc_id",
      buckets = 1024, alpha = 0.5)
    val wPlan = w.queryExecution.executedPlan.toString
    // scoring is a per-row kernel over the n-gram array: no join of any
    // kind, ONE corpus pass. The only exchange permitted is the
    // scale-adaptive Scans.spread barrier (r15: parallelizes the
    // md5-per-gram kernel when the scan has fewer splits than cores;
    // a no-op on real multi-row-group tables) — a join- or
    // aggregate-keyed exchange would mean the corpus self-join came back
    assert(!wPlan.contains("Join"), s"scoring should be join-free:\n$wPlan")
    assert(
      "Exchange".r.findAllIn(wPlan).length <= 1 &&
        !wPlan.contains("ENSURE_REQUIREMENTS"),
      s"scoring grew a non-spread shuffle:\n$wPlan")
    assert(wPlan.contains("graft_dsir_score"),
      s"no DSIR kernel in plan:\n$wPlan")
    val rPlan = Dsir.resample(w, "doc_id", "iw", k = 5)
      .queryExecution.executedPlan.toString
    assert(rPlan.contains("TakeOrderedAndProject"),
      s"resample is not a TakeOrdered plan:\n$rPlan")
  }
}
