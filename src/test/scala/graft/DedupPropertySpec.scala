package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Randomized exactness properties for the banded dedup engines. The
  * pigeonhole (hamming) and AllPairs prefix-filter (n-gram Jaccard)
  * formulations are EXACT by theory — banding only prunes candidates
  * that cannot qualify — so both must equal a brute-force all-pairs
  * reference on random corpora. MinHash banding is probabilistic in
  * RECALL but its verify stage is exact, so its output must be a
  * SUBSET of the brute-force truth and must always contain identical
  * documents (identical signatures always collide). */
class DedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(0xB5297A4DL)
  private val vocab = Vector("red", "blue", "green", "amber", "teal",
    "coral", "olive", "ivory", "slate", "umber", "pearl", "onyx")

  private def randomDoc(len: Int): String =
    Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  /** Distinct word-bigram sets — the collision-free mirror of
    * shingle_hashes(k=2); docs shorter than k yield one whole-doc
    * shingle. */
  private def shingles(text: String, k: Int): Set[Seq[String]] = {
    val toks = text.toLowerCase.trim.split("\\s+").toSeq
    if (toks.length < k) Set(toks) else toks.sliding(k).map(_.toSeq).toSet
  }

  private def jaccard(a: Set[Seq[String]], b: Set[Seq[String]]): Double =
    (a & b).size.toDouble / (a | b).size

  test("property: hammingDupPairs equals brute force at several budgets") {
    for (maxH <- Seq(1, 3, 7)) {
      // clusters: base hashes plus variants with <= 9 flipped bits, so
      // pairs straddle the budget boundary
      val hashes = (0 until 30).flatMap { i =>
        val base = rnd.nextLong()
        val variants = (0 until 3).map { _ =>
          (0 until rnd.nextInt(10)).foldLeft(base)((h, _) =>
            h ^ (1L << rnd.nextInt(64)))
        }
        base +: variants
      }.zipWithIndex.map { case (h, id) => (id.toLong, h) }
      val got = Dedup.hammingDupPairs(hashes.toDF("id", "h"), "h", "id",
        maxHamming = maxH)
        .select(col("id_a"), col("id_b"), col("hamming")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).sorted.toSeq
      val want = (for {
        (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
        d = java.lang.Long.bitCount(ha ^ hb) if d <= maxH
      } yield (ia, ib, d.toLong)).sorted
      assert(got == want, s"maxH=$maxH: ${got.size} vs ${want.size}")
    }
  }

  test("property: ngramJaccardPairs equals brute-force exact Jaccard") {
    for (threshold <- Seq(0.5, 0.7, 0.9)) {
      // near-dup pressure: half the docs are mutations of earlier docs
      val docs = (0 until 50).foldLeft(Vector.empty[(Long, String)]) {
        case (acc, i) =>
          val text =
            if (acc.nonEmpty && rnd.nextBoolean()) {
              val base = acc(rnd.nextInt(acc.size))._2.split(" ").toVector
              val mut = base.updated(rnd.nextInt(base.size),
                vocab(rnd.nextInt(vocab.size)))
              mut.mkString(" ")
            } else randomDoc(6 + rnd.nextInt(10))
          acc :+ (i.toLong, text)
      }
      val got = Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"),
        "text", "doc_id", k = 2, threshold = threshold)
        .select(col("id_a"), col("id_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val want = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        if jaccard(shingles(ta, 2), shingles(tb, 2)) >= threshold
      } yield (ia, ib)).sorted
      assert(got == want, s"t=$threshold: ${got.size} vs ${want.size}; " +
        s"missing=${want.diff(got).take(3)} extra=${got.diff(want).take(3)}")
    }
  }

  test("property: bundled verify equals per-candidate path and brute force") {
    // the bundled path must be row-for-row identical to the default
    // verify (ids AND rounded jaccard values) at every bucket count,
    // including B=1 (one cell holds everything) — and both must equal
    // the brute-force truth
    for (threshold <- Seq(0.5, 0.7, 0.9); buckets <- Seq(1, 4, 16)) {
      val docs = (0 until 50).foldLeft(Vector.empty[(Long, String)]) {
        case (acc, i) =>
          val text =
            if (acc.nonEmpty && rnd.nextBoolean()) {
              val base = acc(rnd.nextInt(acc.size))._2.split(" ").toVector
              val mut = base.updated(rnd.nextInt(base.size),
                vocab(rnd.nextInt(vocab.size)))
              mut.mkString(" ")
            } else randomDoc(6 + rnd.nextInt(10))
          acc :+ (i.toLong, text)
      }
      def run(): Seq[(Long, Long, Double)] =
        Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"),
          "text", "doc_id", k = 2, threshold = threshold)
          .select(col("id_a"), col("id_b"), col("jaccard")).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
      val plain = run()
      val bundled =
        try {
          spark.conf.set("spark.graft.dedup.bundledVerify", "true")
          spark.conf.set("spark.graft.dedup.verifyBuckets", buckets.toString)
          run()
        } finally {
          spark.conf.unset("spark.graft.dedup.bundledVerify")
          spark.conf.unset("spark.graft.dedup.verifyBuckets")
        }
      assert(bundled == plain,
        s"t=$threshold B=$buckets: ${bundled.size} vs ${plain.size}; " +
          s"missing=${plain.diff(bundled).take(3)} " +
          s"extra=${bundled.diff(plain).take(3)}")
      val want = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        if jaccard(shingles(ta, 2), shingles(tb, 2)) >= threshold
      } yield (ia, ib)).sorted
      assert(bundled.map(p => (p._1, p._2)) == want,
        s"t=$threshold B=$buckets vs brute force: " +
          s"${bundled.size} vs ${want.size}")
    }
  }

  test("property: forced-bundled equals auto on string ids (hashed-id path)") {
    // non-integral ids exercise the xxhash64 bundling key + dictionary
    // join-back; output must be identical to the per-candidate path on
    // the ORIGINAL string ids
    val docs = (0 until 40).map { i =>
      val text =
        if (i % 2 == 1) randomDoc(6 + rnd.nextInt(8))
        else randomDoc(8)
      (f"doc-$i%03d", text)
    }
    def run(): Seq[(String, String, Double)] =
      Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"),
        "text", "doc_id", k = 2, threshold = 0.5)
        .select(col("id_a"), col("id_b"), col("jaccard")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        .sorted.toSeq
    val plain =
      try {
        spark.conf.set("spark.graft.dedup.bundledVerify", "false")
        run()
      } finally spark.conf.unset("spark.graft.dedup.bundledVerify")
    assert(Dedup.lastVerifyDecision ==
      Dedup.VerifyDecision("per-candidate", forced = true, -1.0))
    val bundled =
      try {
        spark.conf.set("spark.graft.dedup.bundledVerify", "true")
        run()
      } finally spark.conf.unset("spark.graft.dedup.bundledVerify")
    assert(Dedup.lastVerifyDecision ==
      Dedup.VerifyDecision("bundled", forced = true, -1.0))
    assert(bundled == plain,
      s"${bundled.size} vs ${plain.size}; " +
        s"missing=${plain.diff(bundled).take(3)} " +
        s"extra=${bundled.diff(plain).take(3)}")
    // auto mode must pick one of the two paths, record its estimate,
    // and produce the same rows either way
    val auto = run()
    val d = Dedup.lastVerifyDecision
    assert(!d.forced && d.estCandPerDoc >= 0.0, d.toString)
    assert(auto == plain)
  }

  test("auto verify-path estimator separates degenerate from diverse corpora") {
    // degenerate: every doc is the same sentence → one hot shingle set,
    // candidates/doc ≈ n → must pick bundled. Diverse: long random docs
    // over a large synthetic vocab → sparse prefixes → per-candidate.
    val hot = (0 until 900).map(i => (i.toLong, "alpha beta gamma delta"))
    Dedup.ngramJaccardPairs(hot.toDF("doc_id", "text"),
      "text", "doc_id", k = 2, threshold = 0.8).count()
    val dHot = Dedup.lastVerifyDecision
    assert(dHot.path == "bundled" && !dHot.forced &&
      dHot.estCandPerDoc > 256.0, dHot.toString)
    val wide = (0 until 300).map { i =>
      val words = Seq.fill(20)(s"w${rnd.nextInt(5000)}")
      (i.toLong, words.mkString(" "))
    }
    Dedup.ngramJaccardPairs(wide.toDF("doc_id", "text"),
      "text", "doc_id", k = 2, threshold = 0.8).count()
    val dWide = Dedup.lastVerifyDecision
    assert(dWide.path == "per-candidate" && !dWide.forced &&
      dWide.estCandPerDoc < 256.0, dWide.toString)
  }

  test("auto decisions are memoized per canonicalized plan + threshold") {
    val docs = (0 until 60).map(i => (i.toLong, randomDoc(10)))
    def build() = Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"),
      "text", "doc_id", k = 2, threshold = 0.6)
    val before = Dedup.estimatorRuns
    build()
    val afterFirst = Dedup.estimatorRuns
    assert(afterFirst == before + 1,
      s"first construction must run the estimator ($before -> $afterFirst)")
    build(); build()
    assert(Dedup.estimatorRuns == afterFirst,
      "re-constructions of the same query must hit the decision cache")
    // a different threshold is a different decision
    Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"),
      "text", "doc_id", k = 2, threshold = 0.9)
    assert(Dedup.estimatorRuns == afterFirst + 1)
  }

  test("property: minhash pairs are a sound subset and catch exact dups") {
    val docs = (0 until 40).map { i =>
      (i.toLong, randomDoc(8 + rnd.nextInt(8)))
    } ++ Seq((100L, "one two three four five six seven eight"),
      (101L, "one two three four five six seven eight")) // planted exact dup
    val threshold = 0.7
    val got = Dedup.minhashDupPairsAuto(docs.toDF("doc_id", "text"),
      "text", "doc_id", k = 2, jaccardThreshold = threshold)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      if jaccard(shingles(ta, 2), shingles(tb, 2)) >= threshold
    } yield (ia, ib)).toSet
    assert(got.subsetOf(truth), s"false positives: ${got.diff(truth)}")
    assert(got.contains((100L, 101L)), "identical docs must collide")
  }

  test("pair-kernel memo: hits across the client family, no eviction " +
      "under the row budget (r12 q_dedup_report determinism)") {
    // file-backed input — the memo key includes the file fingerprint,
    // so this exercises the exact contract-query path
    val dir = java.nio.file.Files.createTempDirectory("graft_memo")
    try {
      val docs = (0 until 60).map(i => (i.toLong, randomDoc(6 + i % 5)))
      docs.toDF("doc_id", "text").write.mode("overwrite")
        .parquet(s"$dir/docs.parquet")
      def read() = spark.read.parquet(s"$dir/docs.parquet")
      val expected = Dedup.ngramJaccardPairs(read(), "text", "doc_id",
        k = 2, threshold = 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val m0 = Dedup.reportPairsCacheMisses.get()
      val h0 = Dedup.reportPairsCacheHits.get()
      val first = Dedup.jaccardPairsMemo(read(), "text", "doc_id", 2, 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(Dedup.reportPairsCacheMisses.get() == m0 + 1)
      // the r12 failure shape: several sibling keys (other thresholds)
      // land in the cache between the first consumer and the next —
      // with the old 4-entry LRU this evicted the family's hot entry
      for (th <- Seq(0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.85, 0.9))
        Dedup.jaccardPairsMemo(read(), "text", "doc_id", 2, th).count()
      // a FRESH equal-plan DataFrame must still hit the original entry
      val hBefore = Dedup.reportPairsCacheHits.get()
      val second = Dedup.jaccardPairsMemo(read(), "text", "doc_id", 2, 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(Dedup.reportPairsCacheHits.get() == hBefore + 1,
        "hot family entry was evicted or the key was unstable")
      assert(first == expected && second == expected,
        "memoized results must equal the direct kernel")
      assert(Dedup.reportPairsCacheHits.get() >= h0 + 1)
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  test("property: counting-join crossContainment equals brute-force intersect") {
    // the r15 counting-join shape (match count of the postings join ==
    // |S_b ∩ S_t| because shingle sets are hashed-distinct) must equal
    // the definitional brute force — every pair, every threshold face,
    // including exact-boundary containments and short docs
    def containment(b: Set[Seq[String]], t: Set[Seq[String]]): Double =
      (b & t).size.toDouble / b.size
    val train = (1L to 60L).map(i => (i, randomDoc(3 + rnd.nextInt(12))))
    val bench = (100L to 130L).map { i =>
      // half the bench docs are subsets/near-subsets of a train doc so
      // true containments exist at and above the threshold
      val base = train((i % 60).toInt)._2.split(" ").toSeq
      val kept = base.take(math.max(2, base.length - rnd.nextInt(3)))
      (i, if (i % 2 == 0) kept.mkString(" ") else randomDoc(2 + rnd.nextInt(8)))
    }
    val trainDf = train.toDF("doc_id", "text")
    val benchDf = bench.toDF("doc_id", "text")
    for (th <- Seq(0.6, 0.8, 1.0)) {
      val expected = (for {
        (bid, btxt) <- bench
        (tid, ttxt) <- train
        c = containment(shingles(btxt, 2), shingles(ttxt, 2))
        if c >= th
      } yield (bid, tid, math.floor(c * 1e6 + 0.5) / 1e6)).toSet
      val got = Dedup.crossContainment(trainDf, benchDf, "text", "doc_id",
        k = 2, threshold = th).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected,
        s"t=$th missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
      val bloom = Dedup.crossContainmentBloom(trainDf, benchDf, "text",
        "doc_id", k = 2, threshold = th).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(bloom == expected, s"bloom t=$th diverged from exact")
    }
  }
}
