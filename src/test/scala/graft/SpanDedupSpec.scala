package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, TextAnalysis}

class SpanDedupSpec extends SparkSpec {

  test("normalizeText: NFC + url/control strip + whitespace collapse") {
    import spark.implicits._
    def norm(x: String): String =
      Seq(Tuple1(x)).toDF("t")
        .select(TextAnalysis.normalizeText(col("t")).alias("n"))
        .head().getString(0)
    val composed = "caf\u00e9"
    val decomposed = "cafe\u0301"
    assert(norm(composed + "  visit https://x.y/z?a=1 now\tok ") ==
      composed + " visit now ok")
    assert(norm(decomposed) == composed) // NFC composes the accent
    assert(norm("a\u0007b") == "ab")    // control char stripped
  }

  // w=3 windows; docs 1 and 2 share "a b c d" (two overlapping duplicated
  // windows -> one merged span); doc 3 repeats "x y z" within itself;
  // doc 4 shares nothing; doc 5 is too short for any window
  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "p q a b c d r s"),
      (2L, "m a b c d n"),
      (3L, "x y z h h x y z"),
      (4L, "one two three four five"),
      (5L, "t u")
    ).toDF("id", "text")
  }

  private def spans(minOcc: Int = 2): Map[(Long, Long), Long] =
    Dedup.duplicatedSpans(docs, "text", "id", w = 3, minOccurrences = minOcc)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("cross-doc duplicated windows merge into maximal spans") {
    val got = spans()
    // doc 1: "a b c" at 2 and "b c d" at 3 merge -> [2, 6)
    assert(got((1L, 2L)) == 6L)
    // doc 2: same windows at 1 and 2 -> [1, 5)
    assert(got((2L, 1L)) == 5L)
  }

  test("within-doc repetition is caught; disjoint occurrences stay separate") {
    val got = spans()
    // doc 3: "x y z" at 0 and at 5 -> two spans [0,3) and [5,8)
    assert(got((3L, 0L)) == 3L)
    assert(got((3L, 5L)) == 8L)
  }

  test("unique docs and short docs emit no spans") {
    val ids = spans().keys.map(_._1).toSet
    assert(!ids.contains(4L) && !ids.contains(5L))
  }

  test("minOccurrences raises the repeat bar") {
    // every duplicated window occurs exactly twice -> nothing at >= 3
    assert(spans(minOcc = 3).isEmpty)
  }

  test("removeDuplicatedSpans cuts exactly the span tokens") {
    val got = Dedup.removeDuplicatedSpans(docs, "text", "id", w = 3)
      .select(col("id"), col("text"), col("n_kept"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) == (("p q r s", 4L)))
    assert(got(2L) == (("m n", 2L)))
    assert(got(3L) == (("h h", 2L)))
    assert(got(4L) == (("one two three four five", 5L)))
    assert(got(5L) == (("t u", 2L)))
  }

  test("property: random corpora match a brute-force span reference") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val vocab = Seq("a", "b", "c")
    val corpusGen: Gen[Seq[(Long, String)]] = for {
      nDocs <- Gen.choose(2, 8)
      docs <- Gen.listOfN(nDocs, for {
        len <- Gen.choose(0, 12)
        ws <- Gen.listOfN(len, Gen.oneOf(vocab))
      } yield ws.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

    def reference(corpus: Seq[(Long, String)], w: Int): Set[(Long, Long, Long)] = {
      val toks = corpus.map { case (id, t) => id -> t.split("\\s+").filter(_.nonEmpty).toSeq }
      val wins = toks.flatMap { case (id, tk) =>
        tk.sliding(w).zipWithIndex.collect {
          case (win, i) if win.size == w => (win.mkString(" "), id, i.toLong) }
      }
      val dupWins = wins.groupBy(_._1).filter(_._2.size >= 2).values.flatten
      dupWins.groupBy(_._2).flatMap { case (id, ws) =>
        // merge [pos, pos+w) intervals
        val sorted = ws.map(_._3).toSeq.sorted
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        sorted.foreach { p =>
          if (spans.nonEmpty && p <= spans.last._2) {
            val l = spans.remove(spans.size - 1); spans += ((l._1, math.max(l._2, p + w)))
          } else spans += ((p, p + w))
        }
        spans.map { case (s, e) => (id, s, e) }
      }.toSet
    }

    (0 until 10).flatMap(i =>
      corpusGen.apply(Gen.Parameters.default, Seed(7L + i))).foreach { corpus =>
      for (w <- Seq(2, 3)) {
        val got = Dedup.duplicatedSpans(corpus.toDF("id", "text"), "text", "id", w)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(got == reference(corpus, w), s"w=$w corpus=$corpus")
      }
    }
  }

  test("plan: every shuffle carries compact keys, never the text") {
    val plan = Dedup.duplicatedSpans(docs, "text", "id", w = 3)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning\\([^)]*\\)[^\\n]*"
      .r.findAllIn(plan).toList
    assert(exchanges.nonEmpty, plan)
    // shuffles partition on whash or doc_id — the text column never
    // crosses an exchange (windows are hashed before the first shuffle)
    exchanges.foreach(e => assert(!e.contains("text"), e))
    assert(plan.contains("graft_window_hashes"), plan)
  }
}
