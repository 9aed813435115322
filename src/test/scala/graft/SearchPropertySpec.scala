package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Search, Temporal}

/** Randomized local-oracle equivalence for BM25 scoring and the session
  * journey/top-k shapes — the retrieval and path formulations whose
  * distributed plans (broadcast corpus stats, sessionized aggregates,
  * window rank limits) are checked here against direct sequential
  * computations of the published formulas. */
class SearchPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(0x2545F491L)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta")

  test("property: bm25ScoreAll equals the local Robertson formula") {
    for (_ <- 1 to 3) {
      val docs = (0 until 80).map { i =>
        (i.toLong, Seq.fill(3 + rnd.nextInt(12))(
          vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val query = Seq("alpha", "theta")
      val (k1, b) = (1.2, 0.75)
      val got = Search.bm25ScoreAll(docs.toDF("doc_id", "text"),
        "text", "doc_id", query, k1, b).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val toks = docs.map { case (id, t) =>
        id -> t.toLowerCase.trim.split("\\s+").toSeq }.toMap
      val n = docs.size.toDouble
      val avgdl = toks.values.map(_.size).sum.toDouble / n
      val dfT = query.map(t => t -> toks.values.count(_.contains(t))).toMap
      docs.foreach { case (id, _) =>
        val dl = toks(id).size.toDouble
        val want = query.map { t =>
          val tf = toks(id).count(_ == t).toDouble
          val idf = math.log(1.0 + (n - dfT(t) + 0.5) / (dfT(t) + 0.5))
          idf * tf * (k1 + 1.0) /
            (tf + k1 * ((1.0 - b) + b * dl / avgdl))
        }.sum
        val rounded = BigDecimal(want)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(got(id) - rounded) < 1e-9,
          s"doc $id: ${got(id)} vs $rounded")
      }
    }
  }

  test("property: sessionPaths equals the local sessionize-and-count") {
    for (_ <- 1 to 3) {
      val data = (0 until 400).map { i =>
        (s"u${rnd.nextInt(25)}", rnd.nextInt(500).toLong, i.toLong,
          vocab(rnd.nextInt(3)))
      }
      val gap = 60L
      val got = Temporal.sessionPaths(data.toDF("u", "ts", "id", "et"),
        "u", "ts", "id", "et", gap, k = 10).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toSeq
      // local: per user sort by (ts, id), split where gap exceeded,
      // join each session's types with '>'
      val paths = data.groupBy(_._1).values.flatMap { evs =>
        val s = evs.sortBy(e => (e._2, e._3))
        val sessions = s.tail.foldLeft(Vector(Vector(s.head))) { (acc, e) =>
          if (e._2 - acc.last.last._2 > gap) acc :+ Vector(e)
          else acc.init :+ (acc.last :+ e)
        }
        sessions.map(_.map(_._4).mkString(">"))
      }
      val want = paths.groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy { case (p, c) => (-c, p) }.take(10)
      assert(got == want, s"$got\nvs\n$want")
    }
  }

  test("property: topKPerGroup equals the local per-group sort prefix") {
    for (_ <- 1 to 3) {
      val data = (0 until 300).map { i =>
        (s"g${rnd.nextInt(8)}", rnd.nextInt(50).toDouble, i.toLong)
      }
      val got = Temporal.topKPerGroup(data.toDF("g", "v", "id"),
        Seq("g"), Seq(col("v").desc, col("id").asc), k = 5)
        .select(col("g"), col("id"), col("rn")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      val want = data.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
        rows.sortBy(r => (-r._2, r._3)).take(5).zipWithIndex
          .map { case (r, i) => (g, r._3, i + 1L) }
      }.sorted
      assert(got == want)
    }
  }

  test("property: basketRules equals the local support/confidence/lift") {
    for (_ <- 1 to 3) {
      val data = (0 until 500).map { i =>
        (s"u${rnd.nextInt(20)}", rnd.nextInt(400).toLong, i.toLong,
          vocab(rnd.nextInt(4)))
      }
      val gap = 50L
      val got = Temporal.basketRules(data.toDF("u", "ts", "id", "et"),
        "u", "ts", "id", "et", gap).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
        .toMap
      // local: sessionize per user, distinct item sets per session
      val baskets = data.groupBy(_._1).values.flatMap { evs =>
        val s = evs.sortBy(e => (e._2, e._3))
        val sessions = s.tail.foldLeft(Vector(Vector(s.head))) { (acc, e) =>
          if (e._2 - acc.last.last._2 > gap) acc :+ Vector(e)
          else acc.init :+ (acc.last :+ e)
        }
        sessions.map(_.map(_._4).toSet)
      }.toSeq
      val n = baskets.size.toDouble
      val c1 = baskets.flatten.groupBy(identity).view.mapValues(_.size).toMap
      val pairs = for {
        b <- baskets; a <- b; c <- b if a != c
      } yield (a, c)
      val c2 = pairs.groupBy(identity).view.mapValues(_.size).toMap
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got.keySet == c2.keySet)
      c2.foreach { case ((a, c), cnt) =>
        val (gn, gs, gc, gl) = got((a, c))
        assert(gn == cnt.toLong)
        assert(gs == r6(cnt / n), s"support $a->$c")
        assert(gc == r6(cnt.toDouble / c1(a)), s"confidence $a->$c")
        assert(gl == r6(cnt.toDouble / c1(a) / (c1(c) / n)), s"lift $a->$c")
      }
    }
  }
}
