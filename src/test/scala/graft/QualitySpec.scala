package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Packing, TextAnalysis}

/** Repetition quality signals, PII scrubbing, and sequence packing. */
class QualitySpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column, text: String): Any = {
    import spark.implicits._
    Seq(text).toDF("text").select(c).head().get(0)
  }

  test("duplicateWordFraction counts repeated word occurrences") {
    assert(one(TextAnalysis.duplicateWordFraction(col("text")), "a a b") == 0.333333)
    assert(one(TextAnalysis.duplicateWordFraction(col("text")), "a b c") == 0.0)
  }

  test("topBigramFraction finds the dominant bigram") {
    // bigrams: "x y","y x","x y","y x" → top 2/4
    assert(one(TextAnalysis.topBigramFraction(col("text")), "x y x y x") == 0.5)
    assert(one(TextAnalysis.topBigramFraction(col("text")), "solo") == 0.0)
  }

  test("stopwordFraction and meanWordLength") {
    assert(one(TextAnalysis.stopwordFraction(col("text")), "the cat and dog") == 0.5)
    assert(one(TextAnalysis.meanWordLength(col("text")), "ab cdef") == 3.0)
  }

  test("scrubPii replaces email, ip and phone with typed tokens") {
    val scrubbed = one(TextAnalysis.scrubPii(col("text")),
      "mail user.name+tag@sub.example.org ip 192.168.0.1 tel +1-555-123-4567 end")
    assert(scrubbed == "mail <EMAIL> ip <IP> tel <PHONE> end")
    import spark.implicits._
    val counts = TextAnalysis.piiCounts(
      Seq("a@b.co and c@d.io at 10.0.0.1").toDF("text"), "text")
      .select("n_email", "n_ip", "n_phone").head()
    assert((counts.getInt(0), counts.getInt(1), counts.getInt(2)) == ((2, 1, 0)))
  }

  test("scrubPii leaves plain text and bare version numbers intact") {
    val s = one(TextAnalysis.scrubPii(col("text")), "spark 4.1.2 at example.com")
    assert(s == "spark 4.1.2 at example.com") // 3-part version ≠ ipv4; no @
  }

  test("packDocs offsets are exact prefix sums within each shard") {
    import spark.implicits._
    val docs = (0L until 40L)
      .map(i => (i, Seq.fill((i % 7 + 1).toInt)("tok").mkString(" ")))
      .toDF("doc_id", "text")
    val packed = Packing.packDocs(docs, "doc_id", "text", seqLen = 10, shards = 4)
      .select("doc_id", "shard", "n_tokens", "start_off", "seq_id", "seq_off")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // brute-force: concatenate per shard in doc_id order
    val byShard = packed.groupBy(_._2)
    byShard.foreach { case (_, rows) =>
      var off = 0L
      rows.sortBy(_._1).foreach { case (_, _, n, start, seqId, seqOff) =>
        assert(start == off)
        assert(seqId == off / 10)
        assert(seqOff == off % 10)
        off += n
      }
    }
    val stats = Packing.shardStats(
      Packing.packDocs(docs, "doc_id", "text", 10, 4), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    stats.foreach { case (shard, nDocs, total, fullSeqs) =>
      val expected = packed.filter(_._2 == shard)
      assert(nDocs == expected.length)
      assert(total == expected.map(_._3).sum)
      assert(fullSeqs == total / 10)
    }
  }

  test("assembleSequences reconstructs each shard's exact token stream") {
    import spark.implicits._
    val docs = (0L until 10L)
      .map(i => (i, (0 until (i % 4 + 1).toInt).map(j => s"d${i}t$j").mkString(" ")))
      .toDF("doc_id", "text")
    val seqs = Packing.assembleSequences(docs, "doc_id", "text",
      seqLen = 3, shards = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[String](2)).toMap
    // reference: concatenate per shard in doc_id order, cut every 3 tokens
    for (shard <- 0L until 2L) {
      val stream = (0L until 10L).filter(_ % 2 == shard).flatMap(i =>
        (0 until (i % 4 + 1).toInt).map(j => s"d${i}t$j"))
      val expected = stream.grouped(3).zipWithIndex
        .map { case (g, i) => (shard, i.toLong) -> g }.toMap
      expected.foreach { case (k, toks) =>
        assert(seqs(k) == toks, s"seq $k")
      }
      // no phantom sequences beyond the stream's end
      assert(seqs.keys.count(_._1 == shard) == expected.size)
    }
  }
}
