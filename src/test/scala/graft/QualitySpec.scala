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

  test("lineRepStats computes all five signals in one struct pass") {
    import spark.implicits._
    // 6 raw lines: "dup" ×3 (one padded — trims equal), a bullet, an
    // ellipsis line, and one blank (excluded) → 5 counted lines
    val text = "dup\n  dup  \ndup\n- item\nwait for it...\n\n"
    val r = Seq(text).toDF("text")
      .select(TextAnalysis.lineRepStats(col("text")).alias("ls"))
      .select("ls.*").head()
    assert(r.getInt(0) == 5) // n_lines
    assert(math.abs(r.getDouble(1) - 2.0 / 5) < 1e-12) // dup beyond first
    // dup chars: 2 extra "dup" occurrences × 3 chars over 3+3+3+6+14 chars
    assert(math.abs(r.getDouble(2) - 6.0 / 29) < 1e-12)
    assert(math.abs(r.getDouble(3) - 1.0 / 5) < 1e-12) // "- item"
    assert(math.abs(r.getDouble(4) - 1.0 / 5) < 1e-12) // "wait for it..."
    // single-line no-repetition doc: everything zero but the count
    val z = Seq("just one line").toDF("text")
      .select(TextAnalysis.lineRepStats(col("text")).alias("ls"))
      .select("ls.*").head()
    assert(z.getInt(0) == 1 && z.getDouble(1) == 0.0 && z.getDouble(2) == 0.0)
    // all-blank doc: zero lines, fractions defined as 0
    val e = Seq("  \n \n").toDF("text")
      .select(TextAnalysis.lineRepStats(col("text")).alias("ls"))
      .select("ls.*").head()
    assert(e.getInt(0) == 0 && e.getDouble(1) == 0.0)
    // unicode bullet and ellipsis forms
    val u = Seq("• punkt\nhm…").toDF("text")
      .select(TextAnalysis.lineRepStats(col("text")).alias("ls"))
      .select("ls.*").head()
    assert(math.abs(u.getDouble(3) - 0.5) < 1e-12)
    assert(math.abs(u.getDouble(4) - 0.5) < 1e-12)
  }

  test("lineRepStats stays inside whole-stage codegen") {
    val df = sf("documents")
      .select(TextAnalysis.lineRepStats(col("text")).alias("ls"))
    // "*(n)" prefixes mark whole-stage-codegen'd operators in
    // executedPlan.toString; the project carrying the expression must
    // hold one, and nothing may fall back to interpreted eval
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("CodegenFallback"), plan)
  }

  test("charEntropy matches closed-form values and handles code points") {
    import spark.implicits._
    def h(s: String): Double = Seq(s).toDF("text")
      .select(TextAnalysis.charEntropy(col("text"))).head().getDouble(0)
    assert(h("aaaa") == 0.0)
    assert(h("") == 0.0)
    assert(h("ab") == 1.0)
    assert(h("aabb") == 1.0)
    assert(h("abcd") == 2.0)
    // astral-plane code points count once each, not as surrogate halves:
    // two distinct emoji = 1 bit exactly
    assert(h("😀😁") == 1.0)
    // prose sits between degenerate and uniform
    val p = h("the quick brown fox jumps over the lazy dog")
    assert(p > 3.0 && p < 4.5, p)
  }

  test("charEntropy stays inside whole-stage codegen") {
    val df = sf("documents")
      .select(TextAnalysis.charEntropy(col("text")).alias("h"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("CodegenFallback"), plan)
  }

  test("gopherReport passes clean prose and fails each rule's planted violator") {
    import spark.implicits._
    val clean = ("the quick brown fox jumps over the lazy dog and then " +
      "that other fox decided to have a rest with friends of his own " +
      "kind be cause the day was long and the sun was high and warm " +
      "so they stayed there until the evening came and went again ok")
    val cases = Seq(
      1L -> clean,                                    // passes all
      2L -> "too few words to pass the length rule",  // rule 1: < 50 words
      3L -> (Seq.fill(60)("a").mkString(" ")),        // rule 2: mwl 1 < 3 (also stops)
      4L -> (clean + " " + Seq.fill(20)("####").mkString(" ")), // rule 3: symbols
      5L -> clean.split(" ").map("- " + _).mkString("\n"),      // rule 4: bullets
      6L -> clean.split(" ").map(_ + "...").mkString("\n"),     // rule 5: ellipses
      7L -> (clean + " " + Seq.fill(40)("12345").mkString(" ")), // rule 6: non-alpha
      8L -> (Seq.fill(60)("word list without required stopwords here")
        .mkString(" ")))                              // rule 7: stops (also dup)
    val out = cases.toDF("id", "text")
      .select(col("id"),
        pipeline.TextAnalysis.gopherReport(col("text")).alias("g"))
      .orderBy("id")
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    assert(out(1L).getAs[Boolean]("passes"), out(1L).toString)
    assert(!out(2L).getAs[Boolean]("passes"))
    assert(out(2L).getAs[Long]("n_words") < 50)
    assert(!out(3L).getAs[Boolean]("passes"))
    assert(out(3L).getAs[Double]("mean_word_len") < 3.0)
    assert(!out(4L).getAs[Boolean]("passes"))
    assert(out(4L).getAs[Double]("symbol_ratio") > 0.1)
    assert(!out(5L).getAs[Boolean]("passes"))
    assert(out(5L).getAs[Double]("bullet_frac") > 0.9)
    assert(!out(6L).getAs[Boolean]("passes"))
    assert(out(6L).getAs[Double]("ellipsis_frac") > 0.3)
    assert(!out(7L).getAs[Boolean]("passes"))
    assert(out(7L).getAs[Double]("alpha_word_frac") < 0.8)
    assert(!out(8L).getAs[Boolean]("passes"))
    assert(out(8L).getAs[Long]("n_req_stops") < 2)
    // the composed filter keeps exactly the passer
    val kept = pipeline.TextAnalysis.gopherFilter(
      cases.toDF("id", "text"), "text")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L), kept.toString)
  }

  test("compressionRatio separates repetitive from varied text; codegen'd") {
    val rep = one(TextAnalysis.compressionRatio(
      org.apache.spark.sql.functions.col("text")), "ab " * 500).asInstanceOf[Double]
    val varied = one(TextAnalysis.compressionRatio(
      org.apache.spark.sql.functions.col("text")),
      (0 until 500).map(i => (i * 2654435761L % 99991).toString).mkString(" "))
      .asInstanceOf[Double]
    assert(rep < 0.05, s"looping text should crush: $rep")
    assert(varied > 0.3, s"high-variety text should resist: $varied")
    assert(rep < varied)
    // empty text → 1.0 by convention (no divide-by-zero)
    assert(one(TextAnalysis.compressionRatio(
      org.apache.spark.sql.functions.col("text")), "") == 1.0)
    // stays inside whole-stage codegen (no CodegenFallback)
    val plan = sf("documents")
      .select(TextAnalysis.compressionRatio(
        org.apache.spark.sql.functions.col("text")).alias("r"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("CodegenFallback"), plan)
  }

  test("topPmi scores collocations over doc frequencies, min-count pruned") {
    import spark.implicits._
    // "new york" always together (3 docs); "the" everywhere (4 docs);
    // "lone pair" co-occurs once — pruned by minPairCount=2
    val docs = Seq(
      "the new york times", "new york the city", "the new york subway",
      "the lone pair").toDF("text")
    val got = TextAnalysis.topPmi(docs, "text", minPairCount = 2L, k = 50)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    // pmi(new, york): n_ab=3, na=nb=3, N=4 → ln(3·4/9) = ln(4/3)
    val pNY = BigDecimal(math.log(3.0 * 4 / (3.0 * 3)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(("new", "york")) == ((3L, pNY)))
    // pmi(new, the): n_ab=3, na=3, nb=4 → ln(3·4/12) = 0
    assert(got(("new", "the")) == ((3L, 0.0)))
    // the once-only pair is pruned
    assert(!got.contains(("lone", "pair")))
    // highest-PMI pair ranks first (ordering check on a fresh call)
    val first = TextAnalysis.topPmi(docs, "text", 2L, 1).head()
    assert((first.getString(0), first.getString(1)) == (("new", "york")))
    // arrival order never affects the result
    val shuffled = TextAnalysis.topPmi(docs.orderBy(rand(3)), "text", 2L, 50)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(shuffled.toSet ==
      got.keySet.map(p => (p._1, p._2)))
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

  test("vocabCoverage: cumulative shares at cut points, monotone to 1") {
    import spark.implicits._
    // freqs: a=5, b=3, c=1, d=1 (total 10) → top1 0.5, top2 0.8, top4 1.0
    val docs = Seq((1L, "a a a a a b b b c d")).toDF("id", "text")
    val got = graft.pipeline.TextAnalysis.vocabCoverage(docs, "text",
      Seq(1, 2, 4, 100))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got == Map(1 -> 0.5, 2 -> 0.8, 4 -> 1.0, 100 -> 1.0))
  }

  test("zipfFit recovers the exponent of a planted power law") {
    import spark.implicits._
    // corpus where term tK appears round(1000/K) times → ln f ≈
    // ln 1000 − ln rank, slope ≈ −1 with near-perfect fit
    val words = (1 to 50).flatMap(k =>
      Seq.fill(math.round(1000.0 / k).toInt)(s"t${"%03d".format(k)}"))
    val docs = words.grouped(40).zipWithIndex
      .map { case (w, i) => (i.toLong, w.mkString(" ")) }.toSeq
      .toDF("id", "text")
    val r = graft.pipeline.TextAnalysis.zipfFit(docs, "text").collect().head
    assert(r.getLong(0) == 50L)
    val slope = r.getDouble(1)
    assert(slope > -1.1 && slope < -0.9, s"slope $slope")
    assert(r.getDouble(2) > 0.98, s"r2 ${r.getDouble(2)}")
  }

  test("scriptProfile: fractions by unicode script, whitespace ignored") {
    import spark.implicits._
    val d = Seq(
      (1L, "abc 12"),        // 3/5 latin, 2/5 digit
      (2L, "日本語 test"),    // 3/7 cjk, 4/7 latin
      (3L, "привет"),        // all cyrillic
      (4L, "   "),           // whitespace-only → all zero
      (5L, "a-b!"))          // punctuation → other
      .toDF("id", "text")
    val got = d.select(col("id"),
      graft.pipeline.TextAnalysis.scriptProfile(col("text")).as("sp"))
      .select("id", "sp.latin_frac", "sp.digit_frac", "sp.cjk_frac",
        "sp.cyrillic_frac", "sp.other_frac")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    assert(got(1L) == ((r6(3.0 / 5), r6(2.0 / 5), 0.0, 0.0,
      r6(1.0 - r6(3.0 / 5) - r6(2.0 / 5)))))
    assert(got(2L)._3 == r6(3.0 / 7) && got(2L)._1 == r6(4.0 / 7))
    assert(got(3L) == ((0.0, 0.0, 0.0, 1.0, 0.0)))
    assert(got(4L) == ((0.0, 0.0, 0.0, 0.0, 0.0)))
    assert(got(5L)._1 == 0.5 && got(5L)._5 == 0.5)
  }
}
