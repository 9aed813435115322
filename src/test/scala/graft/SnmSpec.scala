package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

class SnmSpec extends SparkSpec {
  import spark.implicits._

  private def recs = Seq(
    (10L, "alpha corp"), (20L, "alpha corpp"), (30L, "beta gmbh"),
    (40L, "gamma llc"), (50L, "gamma llc."), (60L, "zeta inc"))
    .toDF("id", "name")

  /** Brute-force reference: all pairs within `w` positions of the global
    * (name, id) sort order. */
  private def expected(w: Int): Set[(Long, Long, Long)] = {
    val sorted = recs.collect().map(r => (r.getString(1), r.getLong(0)))
      .sortBy(identity).map(_._2)
    (for {
      i <- sorted.indices; j <- (i + 1) until math.min(i + w, sorted.length)
    } yield (sorted(i), sorted(j), (j - i).toLong)).toSet
  }

  test("pairs are exactly the rank-adjacent ones, with distances") {
    for (w <- Seq(2, 3, 5)) {
      val got = Dedup.sortedNeighborhoodPairs(recs, "name", "id", w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected(w), s"window $w")
    }
  }

  test("rank survives many partitions (distributed two-pass rank)") {
    val big = (1L to 500L).map(i => (i, f"key$i%05d")).toDF("id", "name")
      .repartition(13)
    val got = Dedup.sortedNeighborhoodPairs(big, "name", "id", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // keys sort in id order → adjacent pairs are (i, i+1)
    assert(got == (1L to 499L).map(i => (i, i + 1)).toSet)
  }

  test("no single-partition global window in the plan") {
    val plan = Dedup.sortedNeighborhoodPairs(recs, "name", "id", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }
}
