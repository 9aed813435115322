package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions.{col, greatest, least}
import graft.pipeline.{Dedup, Graphs}

/** Connected-components correctness: structured graphs (chains, cycles,
  * stars, forests) plus randomized graphs checked against a brute-force
  * union-find, and the end-to-end pairs→clusters→dedup path. */
class GraphsSpec extends SparkSpec {

  /** localThreshold = 0 forces the distributed star rounds — the default
    * would route every test-sized graph through the driver fast path. */
  private def cc(edges: Seq[(Long, Long)], localThreshold: Long = 0L): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("src", "dst")
    Graphs.connectedComponents(df, "src", "dst", localThreshold = localThreshold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Brute-force union-find oracle. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("chain collapses to one component labeled by its minimum") {
    val labels = cc(Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("cycle, star and disjoint forest label independently") {
    val labels = cc(Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),       // cycle
      (10L, 11L), (10L, 12L), (10L, 13L), // star centered off-minimum
      (20L, 21L)))                        // isolated pair
    assert(labels.filter(_._1 < 10).values.toSet == Set(1L))
    assert(labels.filter(k => k._1 >= 10 && k._1 < 20).values.toSet == Set(10L))
    assert(labels(20L) == 20L && labels(21L) == 20L)
  }

  test("self-loops and duplicate/reversed edges are ignored") {
    val labels = cc(Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L)))
    assert(labels == Map(1L -> 1L, 2L -> 1L))
  }

  test("empty edge set yields empty labeling") {
    assert(cc(Seq.empty).isEmpty)
  }

  test("property: random graphs match brute-force union-find") {
    val edgeGen: Gen[Seq[(Long, Long)]] = for {
      n <- Gen.choose(2, 40)        // node universe
      m <- Gen.choose(1, 60)        // edge count
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong)
      } yield (a, b))
    } yield es
    (0 until 8).flatMap(i => edgeGen.apply(Gen.Parameters.default, Seed(42L + i)))
      .foreach { edges =>
        val expected = unionFind(edges.filter(e => e._1 != e._2))
        assert(cc(edges) == expected, s"mismatch on $edges")
        // the small-graph driver fast path must agree exactly
        assert(cc(edges, localThreshold = 1L << 20) == expected,
          s"local-path mismatch on $edges")
      }
  }

  test("distributed rounds converge with a durable checkpoint dir") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    try {
      val edges = Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L),
        (10L, 11L), (11L, 12L)).toDF("src", "dst")
      val labels = Graphs.connectedComponents(edges, "src", "dst",
        localThreshold = 0L, checkpointDir = Some(dir))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
        10L -> 10L, 11L -> 10L, 12L -> 10L))
      // durable mode actually wrote reliable checkpoint files
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .anyMatch(p => java.nio.file.Files.isRegularFile(p))
      assert(wrote, "no checkpoint files written under the durable dir")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("dedupByCluster keeps singletons and one representative per cluster") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "the quick brown fox jumps over the lazy dog near the river"),
      (3L, "the quick brown fox jumps over the lazy dog near a river"),
      (4L, "completely different content about catalyst optimizer internals"),
      (5L, "another unrelated doc mentioning vectors and similarity search")
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", k = 2, threshold = 0.5)
    val kept = Graphs.dedupByCluster(docs, "doc_id", pairs, "id_a", "id_b")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 1,2,3 form one near-dup cluster (1↔2 exact, 2↔3 near) → keep 1
    assert(kept == Set(1L, 4L, 5L))
  }

  test("dedupByClusterBest keeps the best-scoring doc per cluster, ties to the smaller id") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, 5.0), (2L, 9.0), (3L, 9.0), // cluster {1,2,3}: 2 and 3 tie → 2
      (4L, 1.0), (5L, 2.0),            // cluster {4,5}: 5 wins outright
      (6L, 0.0)                        // singleton, survives regardless
    ).toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val kept = Graphs.dedupByClusterBest(docs, "doc_id", col("quality"),
      pairs, "id_a", "id_b")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 5L, 6L))
    // contrast: min-id policy would have kept 1 and 4
    val minId = Graphs.dedupByCluster(docs, "doc_id", pairs, "id_a", "id_b")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(minId == Set(1L, 4L, 6L))
    // winner selection is ONE hash aggregate, no window sort
    val plan = Graphs.dedupByClusterBest(docs, "doc_id", col("quality"),
      pairs, "id_a", "id_b").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("dedupReportBy attributes cross-source duplicates to each source") {
    import spark.implicits._
    // 1 (srcA) and 2 (srcB) are near-dups ACROSS sources; representative
    // (min id = 1) sits in srcA, so the excess lands on srcB
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon", "srcA"),
      (2L, "alpha beta gamma delta epsilon", "srcB"),
      (3L, "totally different words here now", "srcA"),
      (4L, "unrelated content again entirely", "srcB")).toDF("doc_id", "text", "source")
    val got = Dedup.dedupReportBy(docs, "text", "doc_id", "source",
      k = 2, threshold = 0.8)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got("srcA") == ((2L, 1L, 0L, 1.0)))
    assert(got("srcB") == ((2L, 1L, 1L, 0.5)))
  }

  test("triangleStats: census of triangle-plus-pendant, ordering-robust") {
    import spark.implicits._
    // triangle {1,2,3} plus pendant 4 on node 3; edge (3,1) given in
    // NON-canonical order to exercise normalization... degrees 2,2,3,1
    // → triples 1+1+3+0 = 5, transitivity 3·1/5
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (1L, 2L))
      .toDF("id_a", "id_b")
    val got = Graphs.triangleStats(
      edges.select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b")),
      "id_a", "id_b").collect().head
    assert(got.getLong(0) == 4L, "n_nodes")
    assert(got.getLong(1) == 4L, "n_edges (dup edge collapsed)")
    assert(got.getLong(2) == 1L, "n_triangles")
    assert(got.getDouble(3) == 0.6, "transitivity")
  }

  test("dedupReport: yields on a corpus with planted exact and near dups") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),   // exact dup of 1
      (3L, "alpha beta gamma delta zeta"),      // near dup of 1/2
      (4L, "totally different words here now"),
      (5L, "unrelated content again entirely")).toDF("doc_id", "text")
    val r = Dedup.dedupReport(docs, "text", "doc_id", k = 2, threshold = 0.6)
      .collect().head
    assert(r.getAs[Long]("n_docs") == 5L)
    assert(r.getAs[Long]("n_exact_unique") == 4L)
    // {1,2,3} cluster together at J>=0.6; 4 and 5 are singletons
    assert(r.getAs[Long]("n_clusters") == 1L)
    assert(r.getAs[Long]("n_clustered_docs") == 3L)
    assert(r.getAs[Long]("near_dup_excess") == 2L)
    assert(r.getAs[Double]("dedup_yield") == 0.6)
  }

  test("triangleStats: triangle-free graph has zero transitivity") {
    import spark.implicits._
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val got = Graphs.triangleStats(path, "id_a", "id_b").collect().head
    assert(got.getLong(2) == 0L && got.getDouble(3) == 0.0)
  }

  test("triangleStats: hub middle vertex salts the wedge join, no straggler") {
    import spark.implicits._
    // hub 1000 with 200 neighbors below and 200 above (degree 400, ~√n
    // for the 40k-wedge graph): every one of the 200·200 wedges shares
    // the single middle key m=1000 — the power-law shape where an
    // unsalted wedge exchange does all the work in one task. Plus three
    // closing edges among below-neighbors (3 triangles through the hub)
    // and a 50-edge chain as non-skewed background.
    val below = (0 until 200).map(i => (i.toLong * 5, 1000L))
    val above = (0 until 200).map(i => (1000L, 1001L + i))
    val chain = (2000 until 2050).map(i => (i.toLong, i + 1L))
    val closing = Seq((0L, 5L), (10L, 15L), (20L, 25L))
    val edges = (below ++ above ++ chain ++ closing).toDF("id_a", "id_b")
    val p = spark.sessionState.conf.numShufflePartitions
    // decision rule: a degree-400 hub over this edge set must salt to p
    assert(Graphs.wedgeSalt(400.0, 161000.0, p) == p)
    assert(Graphs.wedgeSalt(4.0, 161000.0, p) == 1, "no salt without a hub")
    val e = edges.select(col("id_a").as("a"), col("id_b").as("b"))
      .filter(col("a") < col("b")).distinct()
    val plain = Graphs.wedgeJoin(e, 1)
    val salted = Graphs.wedgeJoin(e, p)
    // same wedge multiset either way (closing edges add wedges via
    // their endpoints' degree-2 middles)
    assert(salted.count() == plain.count())
    // the hub's wedges scatter: no output partition may hold a
    // straggler share (unsalted, one partition holds ~all 40k). AQE's
    // partition COALESCING is pinned off for the observation only — at
    // this toy scale it folds the kilobyte-sized shuffle back into one
    // partition, hiding exactly the key-level scatter under test (at
    // real scale those partitions are gigabytes and stay separate).
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    spark.conf.set(coalesceKey, "false")
    try {
      val counts = Graphs.wedgeJoin(e, p).rdd
        .mapPartitions(it => Iterator(it.size)).collect()
      val total = counts.sum
      assert(total > 40000, s"wedge volume sanity: $total")
      assert(counts.max <= total / 2,
        s"straggler partition: ${counts.toSeq.sorted.reverse.take(4)} of $total")
    } finally spark.conf.set(coalesceKey, "true")
    // census correctness through the salted path: exactly the 3 planted
    // triangles close
    val got = Graphs.triangleStats(edges, "id_a", "id_b").collect().head
    assert(got.getLong(2) == 3L, "n_triangles")
  }

  test("triangleStats: randomized census matches local brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xC3A5)
    for (trial <- 1 to 3) {
      val n = 25 + trial * 5
      val edges = (for {
        a <- 0 until n; b <- (a + 1) until n if rnd.nextDouble() < 0.15
      } yield (a.toLong, b.toLong)).toVector
      val es = edges.toSet
      val wantTri = (for {
        a <- 0L until n; b <- (a + 1) until n if es((a, b))
        c <- (b + 1) until n if es((a, c)) && es((b, c))
      } yield 1).size.toLong
      val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val wantTriples = deg.values.map(d => d * (d - 1) / 2).sum
      val got = Graphs.triangleStats(
        edges.toDF("id_a", "id_b"), "id_a", "id_b").collect().head
      assert(got.getLong(0) == deg.size.toLong, s"trial $trial n_nodes")
      assert(got.getLong(1) == edges.size.toLong, s"trial $trial n_edges")
      assert(got.getLong(2) == wantTri, s"trial $trial n_triangles")
      val wantTrans = if (wantTriples > 0)
        BigDecimal(3.0 * wantTri / wantTriples)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      else 0.0
      assert(got.getDouble(3) == wantTrans, s"trial $trial transitivity")
    }
  }
}
