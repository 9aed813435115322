package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.{Classify, Dedup, Dsir, TextAnalysis}

/** Dirty-corpus robustness: real crawls contain null text, empty
  * strings, whitespace-only rows, unicode/emoji, and degenerate
  * repetition. Every text-family operator must survive such rows
  * without throwing and without corrupting results for the CLEAN rows
  * alongside them — at 100 TB a single NPE-ing row kills a stage.
  * Expressions are null-safe individually (nullSafeEval/-CodeGen);
  * this spec pins the OPERATOR compositions. */
class DirtyCorpusSpec extends SparkSpec {
  import spark.implicits._

  private def dirty: DataFrame = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "en"),
    (2L, "the quick brown fox jumps over the lazy dog", "en"), // exact dup
    (3L, null.asInstanceOf[String], "en"),
    (4L, "", "en"),
    (5L, "   \t\n  ", "en"),
    (6L, "café 😀 你好 über straße", "zh"),
    (7L, "word " * 200, "en"), // degenerate repetition
    (8L, "another perfectly normal document with enough words", "en"))
    .toDF("doc_id", "text", "lang")

  test("exact/template dedup survive null and empty text") {
    // null text: md5(null)=null groups nothing; empty and whitespace
    // are distinct legitimate values
    val g = Dedup.exactGroups(dirty, "text", "doc_id").collect()
    assert(g.nonEmpty)
    val kept = Dedup.exactDedup(dirty, "text", "doc_id").count()
    assert(kept >= 6, s"clean rows preserved: $kept")
    assert(Dedup.templateDedup(dirty, "text", "doc_id").count() >= 6)
  }

  test("pair generators survive dirty rows and still find the planted dup") {
    val mh = Dedup.minhashDupPairsAuto(dirty, "text", "doc_id",
      jaccardThreshold = 0.8)
    assert(mh.filter(col("id_a") === 1L && col("id_b") === 2L).count() == 1)
    val ng = Dedup.ngramJaccardPairs(dirty, "text", "doc_id",
      k = 2, threshold = 0.8)
    assert(ng.filter(col("id_a") === 1L && col("id_b") === 2L).count() == 1)
    val sh = Dedup.simhashDupPairs(dirty, "text", "doc_id", maxHamming = 3)
    assert(sh.filter(col("id_a") === 1L && col("id_b") === 2L).count() == 1)
    val tf = Dedup.tfidfCosinePairs(dirty, "text", "doc_id", threshold = 0.8)
    assert(tf.filter(col("id_a") === 1L && col("id_b") === 2L).count() == 1)
  }

  test("text-analysis columns yield null-or-sane values on dirty rows") {
    val out = dirty.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("tc"),
      TextAnalysis.qualityScore(col("text")).as("q"),
      TextAnalysis.langId(col("text")).as("lid"),
      TextAnalysis.charEntropy(col("text")).as("ent"),
      TextAnalysis.compressionRatio(col("text")).as("cr"),
      TextAnalysis.gopherReport(col("text")).as("gr"),
      TextAnalysis.fingerprint(col("text")).as("fp"),
      TextAnalysis.normalizeText(col("text")).as("norm"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // no exception is the main assertion; spot-check values
    assert(out(1).getAs[Int]("tc") == 9)
    val e7 = out(7).getAs[Double]("ent")
    assert(!e7.isNaN && e7 >= 0.0, "repetition entropy sane")
    assert(out.size == 8)
  }

  test("dedupReport and classifier training survive dirty rows") {
    val r = Dedup.dedupReport(dirty, "text", "doc_id", k = 2,
      threshold = 0.8).collect().head
    assert(r.getAs[Long]("n_docs") == 8L)
    assert(r.getAs[Long]("n_clusters") >= 1L)
    val labeled = dirty.withColumn("y", (col("lang") === "en").cast("int"))
    val model = Classify.fitNaiveBayes(labeled, "text", "doc_id", "y",
      buckets = 256, alpha = 0.5)
    val scored = Classify.score(dirty, "text", "doc_id", model)
    assert(scored.count() == 8, "every row scores (bias-only when empty)")
    val w = Dsir.importanceWeights(dirty, dirty.limit(4), "text", "doc_id",
      buckets = 256)
    assert(w.count() == 8)
  }
}
