package graft

import org.apache.spark.sql.functions._
import graft.pipeline.LangModel

class LangModelSpec extends SparkSpec {

  private val corpus = Seq(
    (1L, "the cat sat"),
    (2L, "the cat ran"),
    (3L, "the dog sat"),
    (4L, "zx"), // single token: no bigram evidence
    (5L, "cat the cat")
  )

  private lazy val docs = {
    import spark.implicits._
    corpus.toDF("id", "text")
  }

  /** Independent reference scorer (plain Scala maps). */
  private def expected(alpha: Double = 0.5): Map[Long, (Long, Double)] = {
    val tokd = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
    val bgs = tokd.view.mapValues(tk =>
      if (tk.size < 2) Seq.empty[(String, String)]
      else tk.sliding(2).map(p => (p(0), p(1))).toSeq).toMap
    val cnt = bgs.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val ctx = cnt.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val v = tokd.values.flatten.toSet.size.toDouble
    tokd.map { case (id, _) =>
      val b = bgs(id)
      if (b.isEmpty) id -> (0L, 0.0)
      else {
        val lps = b.map(bg =>
          math.log((cnt(bg) + alpha) / (ctx(bg._1) + alpha * v)))
        id -> (b.size.toLong,
          math.floor(lps.sum / lps.size * 1e6 + 0.5) / 1e6)
      }
    }
  }

  test("bigram counts and context totals") {
    val bg = LangModel.bigramCounts(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bg("the cat") == 3L) // docs 1, 2 and 5
    assert(bg("cat sat") == 1L)
    val ctx = LangModel.contextCounts(LangModel.bigramCounts(docs, "text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ctx("the") == 4L) // the→cat ×3, the→dog ×1
    assert(ctx("cat") == 3L) // cat→sat, cat→ran, cat→the
  }

  test("scores match an independent implementation; short docs score 0") {
    val got = LangModel.scoreDocs(docs, "text", "id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val exp = expected()
    assert(got.keySet == exp.keySet)
    got.foreach { case (id, (nb, s)) =>
      assert(nb == exp(id)._1, s"doc $id bigram count")
      assert(math.abs(s - exp(id)._2) < 1e-9, s"doc $id: $s vs ${exp(id)._2}")
    }
    assert(got(4L) == ((0L, 0.0)))
  }

  test("plan: count joins are hash-based; only the 1-row vocab broadcasts") {
    val plan = LangModel.scoreDocs(docs, "text", "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the scalar vocab rides a BroadcastNestedLoopJoin by design (1 row);
    // the ngram/context joins must never nest-loop
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).length <= 1, plan)
  }

  test("common-transition docs outscore rare-transition docs") {
    val got = LangModel.scoreDocs(docs, "text", "id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // "the cat …" transitions are the corpus's most frequent; doc 3's
    // "the dog" appears once under the same high-fanout "the" context
    assert(got(1L) > got(3L))
  }

  test("stupid backoff selects the right level per trigram position") {
    import spark.implicits._
    val ref = Seq((1L, "a b c"), (2L, "a b c")).toDF("id", "text")
    // ref counts: tri(a b c)=2; bi(a b)=2,(b c)=2; uni a=b=c=2; N=6, V=3
    val probe = Seq(
      (10L, "a b c"),  // level 1: ln(2/2) = 0
      (11L, "x b c"),  // level 2: ln(0.4·2/2) = ln 0.4
      (12L, "x y z"),  // level 3: ln(0.16·0.5/(6+1.5))
      (13L, "a b"))    // too short: 0 trigrams
      .toDF("id", "text")
    val got = LangModel.scoreDocsBackoff(probe, ref, "text", "id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    assert(got(10L) == ((1L, 0.0)))
    assert(got(11L) == ((1L, r6(math.log(0.4)))))
    assert(got(12L) == ((1L, r6(math.log(0.4 * 0.4 * 0.5 / 7.5)))))
    assert(got(13L) == ((0L, 0.0)))
  }

  test("perplexity buckets are equal-count per group and rank by score") {
    import spark.implicits._
    // 6 docs in one group: tertiles must be exactly 2/2/2, with the
    // highest-score docs in bucket 1 (head)
    val d = Seq(
      (1L, "the cat sat", "g"), (2L, "the cat sat", "g"),
      (3L, "the cat ran", "g"), (4L, "the dog sat", "g"),
      (5L, "dog ran far", "g"), (6L, "zx qq ww", "g"))
      .toDF("id", "text", "grp")
    val got = LangModel.perplexityBuckets(d, "text", "id", "grp", buckets = 3)
      .collect().map(r => (r.getLong(0), r.getInt(4))).toMap
    assert(got.values.groupBy(identity).view.mapValues(_.size).toMap ==
      Map(1 -> 2, 2 -> 2, 3 -> 2))
    val scores = LangModel.scoreDocs(d, "text", "id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // every head doc scores >= every tail doc
    val head = got.filter(_._2 == 1).keys.map(scores)
    val tail = got.filter(_._2 == 3).keys.map(scores)
    assert(head.min >= tail.max)
  }
}
