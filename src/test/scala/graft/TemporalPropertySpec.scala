package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Classify, Ranks, Temporal}

/** Randomized brute-force equivalence for the distributed rank and
  * temporal-join formulations whose scalable plans (two-pass offsets,
  * bucketed equi-joins, per-step join chains) are farthest from their
  * specification — each checked against a sequential local oracle that
  * implements the documented semantics directly. */
class TemporalPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(0x9E3779B9L)

  test("property: withGlobalRank equals the local sorted index") {
    for (_ <- 1 to 3) {
      val data = Seq.fill(500)((rnd.nextInt(40).toDouble, rnd.nextLong()))
        .zipWithIndex.map { case ((v, _), i) => (i.toLong, v) }
      val df = data.toDF("id", "v").repartition(7)
      val got = Ranks.withGlobalRank(df, "r", col("v").asc, col("id").asc)
        .select(col("id"), col("r")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = data.sortBy { case (id, v) => (v, id) }
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
      assert(got == want)
    }
  }

  test("property: aucScore equals local tie-corrected Mann-Whitney") {
    for (_ <- 1 to 3) {
      // coarse scores force heavy ties — the average-rank correction path
      val data = (0 until 400).map(i =>
        (i.toLong, rnd.nextInt(12).toDouble, rnd.nextInt(2)))
      val df = data.toDF("id", "score", "y").repartition(5)
      val got = Classify.aucScore(df, "score", "y", "id").collect().head
      // local: average rank per tied score group over ascending order
      val sorted = data.sortBy(d => (d._2, d._1))
      val ranks = sorted.zipWithIndex.map { case (d, i) => (d, i + 1.0) }
      val avgRank = ranks.groupBy(_._1._2).map { case (s, g) =>
        s -> g.map(_._2).sum / g.size
      }
      val nPos = data.count(_._3 == 1).toLong
      val nNeg = data.size - nPos
      val sumRPos = data.filter(_._3 == 1).map(d => avgRank(d._2)).sum
      val want = (sumRPos - nPos.toDouble * (nPos + 1) / 2) / (nPos.toDouble * nNeg)
      assert(got.getLong(0) == nPos && got.getLong(1) == nNeg)
      assert(math.abs(got.getDouble(2) - want) < 1e-6,
        s"auc ${got.getDouble(2)} vs $want")
    }
  }

  test("property: rollingAgg equals a brute-force trailing window") {
    for (_ <- 1 to 3) {
      val data = (0 until 300).map(i =>
        (s"k${rnd.nextInt(5)}", rnd.nextLong().abs % 1000L, i.toLong))
      val df = data.toDF("k", "ts", "id")
      val got = Temporal.rollingAgg(df, "k", "ts", windowNs = 100L,
        Seq("s" -> sum(col("id")), "c" -> count(lit(1))))
        .select(col("k"), col("ts"), col("id"), col("s"), col("c"))
        .collect()
      got.foreach { r =>
        val (k, ts, id) = (r.getString(0), r.getLong(1), r.getLong(2))
        val in = data.filter(d => d._1 == k && d._2 <= ts && d._2 >= ts - 100L)
        assert(r.getLong(3) == in.map(_._3).sum, s"sum at ($k,$ts,$id)")
        assert(r.getLong(4) == in.size.toLong, s"count at ($k,$ts,$id)")
      }
    }
  }

  test("property: intervalJoin equals a nested-loop reference") {
    for (grain <- Seq(7L, 100L, 1000L)) {
      val pts = (0 until 200).map(i => (i.toLong, rnd.nextLong().abs % 500L))
      val ivs = (0 until 40).map { i =>
        val s = rnd.nextLong().abs % 500L
        (i.toLong, s, s + rnd.nextLong().abs % 80L)
      }
      val got = Temporal.intervalJoin(
        pts.toDF("pid", "pt"), ivs.toDF("iid", "s", "e"),
        "pt", "s", "e", grain)
        .select(col("pid"), col("iid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val want = (for {
        (pid, pt) <- pts; (iid, s, e) <- ivs if pt >= s && pt <= e
      } yield (pid, iid)).sorted
      assert(got == want, s"grain=$grain: ${got.size} vs ${want.size}")
    }
  }

  test("property: overlapJoin emits each overlapping pair exactly once") {
    for (grain <- Seq(7L, 100L, 1000L)) {
      def mk(n: Int) = (0 until n).map { i =>
        val s = rnd.nextLong().abs % 400L
        (i.toLong, s, s + rnd.nextLong().abs % 60L)
      }
      val l = mk(60); val r = mk(60)
      val got = Temporal.overlapJoin(
        l.toDF("lid", "ls", "le"), r.toDF("rid", "rs", "re"),
        "ls", "le", "rs", "re", grain)
        .select(col("lid"), col("rid")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      val want = (for {
        (lid, ls, le) <- l; (rid, rs, re) <- r
        if ls <= re && rs <= le
      } yield (lid, rid)).sorted
      assert(got == want, s"grain=$grain: ${got.size} vs ${want.size}")
    }
  }

  test("property: funnelWithin equals the sequential greedy fold") {
    val types = Seq("a", "b", "c")
    for (deadline <- Seq(-1L, 50L, 5L)) {
      val data = (0 until 600).map { i =>
        (s"u${rnd.nextInt(40)}", rnd.nextLong().abs % 300L, i.toLong,
          types(rnd.nextInt(3)))
      }
      val df = data.toDF("u", "ts", "id", "et")
      val steps = Seq("a", "b", "b") // repeated step: strict-after rule
      val got = Temporal.funnelWithin(df, "u", "ts", "et", steps, deadline)
        .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
      // sequential greedy: reach(0) = min ts of step-0; reach(i) = min ts
      // of qualifying step-i events (strictly after when the type
      // repeats, within the deadline of the previous reach)
      val byUser = data.groupBy(_._1)
      val reachCounts = Array.fill(steps.size)(0L)
      byUser.values.foreach { evs =>
        var prev = Option.empty[Long]
        var alive = true
        steps.zipWithIndex.foreach { case (st, i) =>
          if (alive) {
            val cand = evs.filter(_._4 == st).map(_._2).filter { t =>
              prev match {
                case None => true
                case Some(p) =>
                  val after = if (i > 0 && steps(i - 1) == st) t > p else t >= p
                  after && (deadline < 0 || t - p <= deadline)
              }
            }
            if (cand.isEmpty) alive = false
            else { prev = Some(cand.min); reachCounts(i) += 1 }
          }
        }
      }
      steps.indices.foreach { i =>
        assert(got.getOrElse(i + 1, 0L) == reachCounts(i),
          s"deadline=$deadline step ${i + 1}: " +
            s"${got.getOrElse(i + 1, 0L)} vs ${reachCounts(i)}")
      }
    }
  }

  test("property: ewma equals the local truncated normalized recursion") {
    for (alpha <- Seq(0.3, 0.5, 0.9)) {
      val k = 8
      val data = (0 until 250).map(i =>
        (s"k${rnd.nextInt(6)}", rnd.nextInt(100).toLong, i.toLong,
          rnd.nextInt(50).toDouble))
      val got = Temporal.ewma(data.toDF("key", "ts", "id", "v"),
        "key", "ts", "id", "v", alpha = alpha, k = k)
        .select(col("id"), col("ewma")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      data.groupBy(_._1).values.foreach { evs =>
        val s = evs.sortBy(e => (e._2, e._3))
        s.indices.foreach { i =>
          val terms = (0 until math.min(k, i + 1)).map { j =>
            (s(i - j)._4 * math.pow(1 - alpha, j), math.pow(1 - alpha, j))
          }
          val want = BigDecimal(terms.map(_._1).sum / terms.map(_._2).sum)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(math.abs(got(s(i)._3) - want) < 1e-6,
            s"id ${s(i)._3}: ${got(s(i)._3)} vs $want")
        }
      }
    }
  }

  test("property: gapQuantiles equals local interpolating percentiles") {
    for (_ <- 1 to 3) {
      val data = (0 until 300).map(i =>
        (s"k${rnd.nextInt(8)}", rnd.nextInt(2000).toLong, i.toLong))
      val ps = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
      val got = Temporal.gapQuantiles(data.toDF("key", "ts", "id"),
        "key", "ts", "id", ps).collect()
        .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      val gaps = data.groupBy(_._1).values.flatMap { evs =>
        val s = evs.sortBy(e => (e._2, e._3)).map(_._2)
        s.zip(s.tail).map { case (a, b) => (b - a).toDouble }
      }.toSeq.sorted
      ps.foreach { p =>
        // SQL percentile: linear interpolation at 0-based rank p*(n-1)
        val r = p * (gaps.size - 1)
        val lo = gaps(r.toInt)
        val hi = gaps(math.min(gaps.size - 1, r.toInt + 1))
        val want = lo + (r - r.toInt) * (hi - lo)
        assert(math.abs(got(p) - want) < 1e-9, s"p=$p: ${got(p)} vs $want")
      }
    }
  }

  test("property: transitionMatrix equals local consecutive-pair counts") {
    for (_ <- 1 to 3) {
      val states = Seq("s0", "s1", "s2")
      val data = (0 until 400).map(i =>
        (s"u${rnd.nextInt(15)}", rnd.nextInt(300).toLong, i.toLong,
          states(rnd.nextInt(3))))
      val got = Temporal.transitionMatrix(data.toDF("u", "ts", "id", "st"),
        "u", "ts", "id", "st").collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
      val pairs = data.groupBy(_._1).values.flatMap { evs =>
        val s = evs.sortBy(e => (e._2, e._3)).map(_._4)
        s.zip(s.tail)
      }.toSeq
      val cnt = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val rowTot = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      assert(got.keySet == cnt.keySet)
      cnt.foreach { case (k, c) =>
        assert(got(k)._1 == c, s"$k cnt")
        val want = BigDecimal(c.toDouble / rowTot(k._1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(got(k)._2 - want) < 1e-9, s"$k prob")
      }
    }
  }

  test("property: seasonalProfile equals local day-of-week statistics") {
    for (_ <- 1 to 3) {
      val day = 86400L * 1000000000L
      val data = (0 until 400).map { i =>
        (s"g${rnd.nextInt(3)}",
          (rnd.nextLong().abs % (60L * day)) - 10L * day, // spans pre-epoch
          rnd.nextInt(100).toDouble)
      }
      val got = Temporal.seasonalProfile(data.toDF("g", "ts", "v"),
        "g", "ts", "v").collect()
        .map(r => (r.getString(0), r.getInt(1)) ->
          ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val want = data.groupBy { d =>
        (d._1, ((Math.floorDiv(d._2, day) + 3) % 7).toInt)
      }
      assert(got.keySet == want.keySet)
      want.foreach { case (k, rows) =>
        val vs = rows.map(_._3)
        val mean = vs.sum / vs.size
        val sd = math.sqrt(vs.map(v => (v - mean) * (v - mean)).sum / vs.size)
        assert(got(k)._1 == vs.size.toLong, s"$k n")
        assert(math.abs(got(k)._2 - r6(mean)) < 1e-6, s"$k mean")
        assert(math.abs(got(k)._3 - r6(sd)) < 1e-6, s"$k sd")
      }
    }
  }
}
