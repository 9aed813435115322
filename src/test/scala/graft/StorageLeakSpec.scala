package graft

import org.apache.spark.sql.DataFrame
import graft.pipeline.{Dedup, Graphs, Profiling, Skyline}

/** Structural guard for the pinned-lineage leak class (round-10 root
  * cause of the r9 driver bench outliers): an operator that
  * `localCheckpoint`s intermediate state and returns without releasing
  * it leaks block-manager storage for the session's lifetime, and in a
  * ~190-query bench the accumulated blocks degrade LATER queries. The
  * guard also pins the `Checkpoints.release` mechanism itself —
  * `Dataset.unpersist` is a silent no-op on a checkpointed Dataset
  * (CacheManager only tracks `.cache()` entries), so release must
  * unpersist the RDD under the `LogicalRDD`; this spec is what catches
  * that regressing.
  *
  * Each test materializes the operator's full result and then asserts
  * that no NEW persistent-RDD ids remain registered (`RDD.unpersist`
  * deregisters synchronously; comparing id SETS keeps the assert stable
  * if the ContextCleaner concurrently reaps some other test's garbage).
  *
  * Two documented exceptions pin their contract instead: results that
  * are returned DISTRIBUTED while depending on truncated lineage
  * (connectedComponents' iterative path, skylineND's
  * frontier-exceeds-threshold early return) keep exactly their final
  * round pinned; unpersisting the result's plan RDD is the caller's
  * release lever.
  */
class StorageLeakSpec extends SparkSpec {
  import spark.implicits._

  private def pinnedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  private def newPins[A](body: => A): Set[Int] = {
    val before = pinnedIds
    body
    pinnedIds -- before
  }

  /** The caller-side release lever for distributed pinned results: drop
    * every checkpointed leaf under the result's plan (the early-return
    * shape is a projection OVER the pinned `LogicalRDD`, not the
    * `LogicalRDD` itself). */
  private def releaseResult(df: DataFrame): Unit = {
    val leaves = df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    assert(leaves.nonEmpty, "expected a LogicalRDD-backed result")
    leaves.foreach(_.unpersist(blocking = true))
  }

  test("skyline2D leaves no pinned storage") {
    val pts = (1 to 5000).map(i => (i.toDouble, ((i * 2654435761L) % 9973).toDouble))
    val leaked = newPins {
      assert(Skyline.skyline2D(pts.toDF("x", "y"), "x", "y").count() > 0)
    }
    assert(leaked.isEmpty, s"pinned RDDs leaked: $leaked")
  }

  test("skylineND fast path (single local pass) leaves no pinned storage") {
    val pts = (1 to 2000).map(i => (i.toDouble, ((i * 40503L) % 997).toDouble))
    val leaked = newPins {
      assert(Skyline.skylineND(pts.toDF("x", "y"), Seq("x"), Seq("y")).count() > 0)
    }
    assert(leaked.isEmpty, s"pinned RDDs leaked: $leaked")
  }

  test("skylineND shrink rounds + driver merge leave no pinned storage") {
    // random 2-D data: per-partition frontiers are ~ln(n), so the first
    // local pass lands ~8·ln(500) ≈ 50 candidates — above the threshold
    // (forcing ≥1 repartition shrink round with its truncate/release
    // pair) while the second pass converges below it (driver merge)
    val pts = (1 to 4000).map(i =>
      (i.toDouble, ((i * 2654435761L) % 9973).toDouble))
    val leaked = newPins {
      assert(Skyline.skylineND(pts.toDF("x", "y").repartition(8),
        Seq("x"), Seq("y"), localThreshold = 20).count() > 0)
    }
    assert(leaked.isEmpty, s"pinned RDDs leaked: $leaked")
  }

  test("skylineND distributed early return pins exactly the final round") {
    // fully-correlated data: under (minimize x, maximize y) every point
    // is incomparable with every other, so no pass shrinks below the
    // threshold — the operator returns the distributed frontier, which
    // necessarily depends on its final truncated round
    val pts = (1 to 3000).map(i => (i.toDouble, i.toDouble))
    val before = pinnedIds
    val res = Skyline.skylineND(pts.toDF("x", "y").repartition(8),
      Seq("x"), Seq("y"), localThreshold = 100)
    assert(res.count() == 3000)
    val pinned = pinnedIds -- before
    assert(pinned.size == 1,
      s"expected exactly the final-round candidates pinned, saw $pinned")
    releaseResult(res)
    assert((pinnedIds -- before).isEmpty)
  }

  test("ksStatistic two-pass leaves no pinned storage") {
    val d = (1 to 4000).map(i =>
      (i.toDouble % 311, if (i % 2 == 0) "a" else "b")).toDF("v", "side")
    val leaked = newPins {
      val r = Profiling.ksStatistic(d, "v", "side", "a", "b").head()
      assert(r.getDouble(r.fieldIndex("d")) >= 0.0)
    }
    assert(leaked.isEmpty, s"pinned RDDs leaked: $leaked")
  }

  test("connectedComponents fast path releases its truncated edge set") {
    val edges = (0L until 500L).map(i => (i, i + 1)).toDF("u", "v")
    val leaked = newPins {
      assert(Graphs.connectedComponents(edges, "u", "v").count() > 0)
    }
    assert(leaked.isEmpty, s"pinned RDDs leaked: $leaked")
  }

  test("connectedComponents iterative path pins exactly the final round") {
    val edges = (0L until 400L).map(i => (i, (i + 1) % 200)).toDF("u", "v")
    val before = pinnedIds
    // localThreshold = 0 forces the star-contraction loop
    val res = Graphs.connectedComponents(edges, "u", "v", localThreshold = 0)
    assert(res.count() > 0)
    val pinned = pinnedIds -- before
    assert(pinned.size == 1,
      s"expected exactly the final-round edge set pinned, saw $pinned")
  }

  test("snapshotDiff leaves no pinned storage") {
    val a = (1 to 300).map(i => (i.toLong, s"t$i")).toDF("k", "t")
    val b = (100 to 400).map(i => (i.toLong, s"t${i * 7 % 400}")).toDF("k", "t")
    val leaked = newPins {
      assert(Dedup.snapshotDiff(a, b, "k", Seq("t")).count() == 400)
    }
    assert(leaked.isEmpty, s"pinned RDDs leaked: $leaked")
  }

  test("piped NR over a shuffle-fed stage releases its two-pass persist") {
    // an agg output feeding a pipe stage that uses NR takes withNr's
    // persist path (a shuffle can legally reorder between the two NR
    // passes); the terminal surface (queryTable) must release exactly
    // what its own plan construction pinned
    val rows = (1 to 500).map(i => Seq(s"g${i % 7}", i.toString))
    val leaked = newPins {
      val got = Graft.queryTable(spark,
        "SELECT a1, COUNT(*) AS c GROUP BY a1 " +
          "| SELECT COUNT(*) AS n, SUM(NR) AS s, MAX(NR) AS m",
        rows)
      assert(got == Seq(Seq(7L, 28L, 7L)), got.toString)
    }
    assert(leaked.isEmpty, s"pinned RDDs leaked: $leaked")
  }

  test("triangleStats caches its edge list across actions and releases it") {
    // triangle {1,2,3} plus a short chain — enough to exercise the
    // probe action + census action against the shared cached edge list
    val edges = (Seq((1L, 2L), (2L, 3L), (1L, 3L)) ++
      (10 until 40).map(i => (i.toLong, i + 1L))).toDF("id_a", "id_b")
    val leaked = newPins {
      val got = Graphs.triangleStats(edges, "id_a", "id_b").collect().head
      assert(got.getLong(2) == 1L, "n_triangles")
    }
    assert(leaked.isEmpty, s"pinned RDDs leaked: $leaked")
  }
}
