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
}
