package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

class TfidfSpec extends SparkSpec {
  import spark.implicits._

  test("identical documents pair at cosine 1.0") {
    val docs = Seq(
      (1L, "quantum flux lattice boson phase"),
      (2L, "quantum flux lattice boson phase"),
      (3L, "invoice shipping address order total")).toDF("doc_id", "text")
    val p = Dedup.tfidfCosinePairs(docs, "text", "doc_id", 0.9, 1000)
      .collect()
    assert(p.length == 1)
    assert(p.head.getAs[Long]("id_a") == 1L && p.head.getAs[Long]("id_b") == 2L)
    assert(math.abs(p.head.getAs[Double]("cosine") - 1.0) < 1e-9)
  }

  test("disjoint vocabularies never pair") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta")).toDF("doc_id", "text")
    assert(Dedup.tfidfCosinePairs(docs, "text", "doc_id", 0.1, 1000)
      .count() == 0)
  }

  test("rare shared terms outweigh shared boilerplate (vs raw overlap)") {
    // a/b share a RARE two-word core plus boilerplate; a/c share only the
    // boilerplate that appears in every doc (idf = ln(1) = 0). tf-idf
    // cosine must pair (a,b) and give (a,c) zero weight overlap.
    val docs = Seq(
      (1L, "the report the study zephyr quokka"),
      (2L, "the report the study zephyr quokka"),
      (3L, "the report the study common filler"),
      (4L, "the report the study other words")).toDF("doc_id", "text")
    val p = Dedup.tfidfCosinePairs(docs, "text", "doc_id", 0.9, 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p.contains((1L, 2L)))
    assert(!p.exists { case (a, b) => (a, b) != (1L, 2L) },
      s"boilerplate-only overlap paired: $p")
  }

  test("df cap removes ubiquitous terms from the similarity space") {
    // docs identical ONLY in a term shared by all four; with maxDf = 2
    // that term is outside the subspace, so no pairs survive
    val docs = Seq(
      (1L, "shared alpha"), (2L, "shared beta"),
      (3L, "shared gamma"), (4L, "shared delta")).toDF("doc_id", "text")
    assert(Dedup.tfidfCosinePairs(docs, "text", "doc_id", 0.01, 2)
      .count() == 0)
  }

  test("cosine matches a hand-computed two-doc value") {
    // docs: d1 = "x x y", d2 = "x y y"; corpus adds d3/d4 so idfs differ:
    // x in 3 docs, y in 2 docs of N=4 → idf_x = ln(4/3), idf_y = ln(2)
    val docs = Seq(
      (1L, "x x y"), (2L, "x y y"), (3L, "x z"), (4L, "w v")).toDF("doc_id", "text")
    val ix = math.log(4.0 / 3.0); val iy = math.log(2.0)
    val w1 = Array(2 * ix, 1 * iy); val w2 = Array(1 * ix, 2 * iy)
    val n1 = math.sqrt(w1.map(v => v * v).sum)
    val n2 = math.sqrt(w2.map(v => v * v).sum)
    val expected = (w1(0) * w2(0) + w1(1) * w2(1)) / (n1 * n2)
    val got = Dedup.tfidfCosinePairs(docs, "text", "doc_id", 0.1, 1000)
      .filter(col("id_a") === 1 && col("id_b") === 2)
      .select("cosine").as[Double].head()
    assert(math.abs(got - expected) < 1e-6, s"got $got expected $expected")
  }
}
