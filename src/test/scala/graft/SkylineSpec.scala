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
}
