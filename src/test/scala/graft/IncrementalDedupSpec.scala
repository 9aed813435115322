package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

class IncrementalDedupSpec extends SparkSpec {

  private lazy val corpus = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog by the river"),
      (2L, "spark builds a logical plan and catalyst optimizes it well"),
      (3L, "completely unrelated text about nothing in particular today")
    ).toDF("doc_id", "text")
  }

  private lazy val batch = {
    import spark.implicits._
    Seq(
      // exact copy of corpus doc 1
      (100L, "the quick brown fox jumps over the lazy dog by the river"),
      // near-copy of corpus doc 2 (one word changed)
      (101L, "spark builds a logical plan and catalyst optimizes it fast"),
      // novel document
      (102L, "a brand new document sharing no shingles with the corpus")
    ).toDF("doc_id", "text")
  }

  test("probe finds exact and near copies, not novel docs") {
    val index = Dedup.minhashIndex(corpus, "text", "doc_id")
    val got = Dedup.minhashProbe(index, batch, "text", "doc_id",
      jaccardThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == Set((100L, 1L), (101L, 2L)))
    assert(got((100L, 1L)) == 1.0)
    assert(got((101L, 2L)) > 0.5 && got((101L, 2L)) < 1.0)
  }

  test("appendToIndex folds a batch in; later probes match both generations") {
    import spark.implicits._
    val index = Dedup.minhashIndex(corpus, "text", "doc_id")
    val grown = Dedup.appendToIndex(index, batch, "text", "doc_id")
    assert((grown.k, grown.bands, grown.rows) == (index.k, index.bands, index.rows))
    // a probe doc near-matching one original and one appended member
    val probe = Seq(
      (200L, "the quick brown fox jumps over the lazy dog by the river"),
      (201L, "a brand new document sharing no shingles with the corpus")
    ).toDF("doc_id", "text")
    val got = Dedup.minhashProbe(grown, probe, "text", "doc_id",
      jaccardThreshold = 0.5)
      .select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 200 hits corpus doc 1 AND its appended exact copy 100; 201 hits the
    // appended novel doc 102 it duplicates
    assert(got == Set((200L, 1L), (200L, 100L), (201L, 102L)), got.toString)
  }

  test("probe agrees with the all-pairs operator on the union") {
    // union-corpus all-pairs, restricted to (batch, corpus) pairs, must
    // equal the incremental probe at the same parameters
    val all = Dedup.minhashDupPairs(corpus.unionByName(batch), "text",
      "doc_id", jaccardThreshold = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => a < 100L && b >= 100L }
      .map { case (a, b, j) => (b, a, j) }.toSet
    val index = Dedup.minhashIndex(corpus, "text", "doc_id")
    val probed = Dedup.minhashProbe(index, batch, "text", "doc_id",
      jaccardThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(probed == all)
  }

  test("a persisted index reloads with its band parameters and probes equal") {
    val dir = java.nio.file.Files.createTempDirectory("graft-idx").toString
    try {
      val index = Dedup.minhashIndex(corpus, "text", "doc_id",
        k = 2, bands = 8, rows = 2)
      Dedup.writeMinhashIndex(index, dir)
      val reloaded = Dedup.readMinhashIndex(spark, dir)
      assert((reloaded.k, reloaded.bands, reloaded.rows) == ((2, 8, 2)))
      val live = Dedup.minhashProbe(index, batch, "text", "doc_id", 0.5)
        .collect().map(_.toString).sorted.toSeq
      val fromDisk = Dedup.minhashProbe(reloaded, batch, "text", "doc_id", 0.5)
        .collect().map(_.toString).sorted.toSeq
      assert(live == fromDisk && live.nonEmpty)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("an index probes repeatedly and an empty batch yields nothing") {
    val index = Dedup.minhashIndex(corpus, "text", "doc_id")
    val first = Dedup.minhashProbe(index, batch, "text", "doc_id").count()
    val second = Dedup.minhashProbe(index, batch, "text", "doc_id").count()
    assert(first == second)
    val empty = Dedup.minhashProbe(index, batch.limit(0), "text", "doc_id")
    assert(empty.count() == 0)
  }
}
