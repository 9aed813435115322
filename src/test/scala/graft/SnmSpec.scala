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

  test("editDistancePairs verifies SNM candidates with exact Levenshtein") {
    import org.apache.spark.sql.functions.col
    val recs2 = Seq(
      (1L, "acme corp"), (2L, "acme corpp"),   // dist 1, sort-adjacent
      (3L, "acme industries"),                 // far from both (>2)
      (4L, "zzz ltd"), (5L, "zzz ltd"))        // dist 0 duplicates
      .toDF("id", "name")
    val got = Dedup.editDistancePairs(recs2, "name", "id",
      maxDist = 2, window = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got((1L, 2L)) == 1)
    assert(got((4L, 5L)) == 0)
    assert(!got.keySet.exists { case (a, b) => a == 3L || b == 3L },
      s"far name matched: $got")
  }

  test("no single-partition global window in the plan") {
    val plan = Dedup.sortedNeighborhoodPairs(recs, "name", "id", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }
}
