package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Skyline

class SkylineSpec extends SparkSpec {

  /** Brute-force dominance reference. */
  private def reference(pts: Seq[(Double, Double)]): Set[(Double, Double)] =
    pts.distinct.filter { case (px, py) =>
      !pts.exists { case (qx, qy) =>
        qx <= px && qy >= py && (qx < px || qy > py)
      }
    }.toSet

  private def run(pts: Seq[(Double, Double)]): Set[(Double, Double)] = {
    import spark.implicits._
    Skyline.skyline2D(pts.toDF("x", "y"), "x", "y")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
  }

  test("frontier keeps min-x/max-y tradeoffs, drops dominated points") {
    val pts = Seq(
      (1.0, 5.0),  // frontier (cheapest)
      (2.0, 9.0),  // frontier
      (3.0, 9.0),  // dominated by (2,9)
      (3.0, 12.0), // frontier
      (4.0, 11.0), // dominated by (3,12)
      (9.0, 12.0), // dominated by (3,12)
      (9.0, 13.0)) // frontier
    assert(run(pts) == Set((1.0, 5.0), (2.0, 9.0), (3.0, 12.0), (9.0, 13.0)))
    assert(run(pts) == reference(pts))
  }

  test("property: random point sets match the brute-force reference") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      n <- Gen.choose(1, 60)
      ps <- Gen.listOfN(n, for {
        x <- Gen.choose(0, 20); y <- Gen.choose(0, 20)
      } yield (x.toDouble, y.toDouble))
    } yield ps
    (0 until 12).flatMap(i => gen.apply(Gen.Parameters.default, Seed(11L + i)))
      .foreach { pts => assert(run(pts) == reference(pts), pts.toString) }
  }

  test("single point and duplicate-heavy inputs") {
    assert(run(Seq((5.0, 5.0))) == Set((5.0, 5.0)))
    assert(run(Seq.fill(50)((1.0, 1.0))) == Set((1.0, 1.0)))
  }

  /** 3-D brute-force reference: minimize d1, maximize d2 and d3. */
  private def reference3(pts: Seq[(Double, Double, Double)]): Set[(Double, Double, Double)] =
    pts.distinct.filter { case (p1, p2, p3) =>
      !pts.exists { case (q1, q2, q3) =>
        q1 <= p1 && q2 >= p2 && q3 >= p3 &&
          (q1 < p1 || q2 > p2 || q3 > p3)
      }
    }.toSet

  private def run3(pts: Seq[(Double, Double, Double)],
      threshold: Int = 1 << 16): Set[(Double, Double, Double)] = {
    import spark.implicits._
    Skyline.skylineND(pts.toDF("a", "b", "c"),
      minimizeCols = Seq("a"), maximizeCols = Seq("b", "c"),
      localThreshold = threshold)
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2))).toSet
  }

  test("property: 3-D skyline matches brute-force, both merge paths") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      n <- Gen.choose(1, 80)
      ps <- Gen.listOfN(n, for {
        a <- Gen.choose(0, 8); b <- Gen.choose(0, 8); c <- Gen.choose(0, 8)
      } yield (a.toDouble, b.toDouble, c.toDouble))
    } yield ps
    (0 until 10).flatMap(i => gen.apply(Gen.Parameters.default, Seed(23L + i)))
      .foreach { pts =>
        val want = reference3(pts)
        assert(run3(pts) == want, s"driver-merge path: $pts")
        // threshold 0 forces the repartition-round path to one partition
        assert(run3(pts, threshold = 0) == want, s"round path: $pts")
      }
  }

  test("NaN dimension values are dropped, not frontier-shadowing") {
    import spark.implicits._
    // (2.0, NaN) would win the per-x max() (NaN sorts above every real
    // double) and then shadow the genuine max-y 9.0 at x=2 — the frontier
    // must still contain (2.0, 9.0) and never emit a NaN row
    val pts = Seq((1.0, 5.0), (2.0, 9.0), (2.0, Double.NaN),
      (Double.NaN, 50.0), (3.0, 12.0))
    assert(run(pts) == Set((1.0, 5.0), (2.0, 9.0), (3.0, 12.0)))
    // ND path: same tuples, same drop semantics, both merge paths
    val nd = Skyline.skylineND(pts.toDF("x", "y"), Seq("x"), Seq("y"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(nd == Set((1.0, 5.0), (2.0, 9.0), (3.0, 12.0)))
    val ndRounds = Skyline.skylineND(pts.toDF("x", "y"), Seq("x"), Seq("y"),
      localThreshold = 0)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(ndRounds == Set((1.0, 5.0), (2.0, 9.0), (3.0, 12.0)))
  }

  test("2D and ND agree on the shared case") {
    import spark.implicits._
    val pts = Seq((1.0, 5.0), (2.0, 9.0), (3.0, 12.0), (4.0, 11.0), (9.0, 13.0))
    val nd = Skyline.skylineND(pts.toDF("x", "y"), Seq("x"), Seq("y"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(nd == run(pts))
  }
}
