package graft

import org.apache.spark.sql.functions._
import graft.pipeline._

class PipelineSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
      (3L, "completely different content about spark catalyst optimizer internals and codegen"),
      (4L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
      (5L, "unrelated text mentioning embeddings vectors and similarity search topics")
    ).toDF("doc_id", "text")
  }

  test("exact dedup keeps lowest id per content group") {
    val groups = Dedup.exactGroups(docs, "text", "doc_id").collect()
    assert(groups.length == 4) // 1&4 collapse
    val dupGroup = groups.find(_.getLong(1) == 2).get
    assert(dupGroup.getLong(2) == 1L) // keep_id = min id
    val survivors = Dedup.exactDedup(docs, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 2L, 3L, 5L))
  }

  test("template dedup collapses digit-variant families, not genuinely distinct text") {
    import spark.implicits._
    val d = Seq(
      (1L, "error 404 at line 12"),
      (2L, "error 500 at line 7"),     // same template as 1 → dropped
      (3L, "error  9   at line 33"),   // whitespace runs collapse too
      (4L, "warning 404 at line 12"),  // different words → survives
      (5L, "no digits here")
    ).toDF("doc_id", "text")
    val kept = Dedup.templateDedup(d, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 5L))
    // the shuffle key is the md5 of the template, never the raw text
    val plan = Dedup.templateDedup(d, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1)
  }

  test("canaryScan: AC automaton matches overlapping/nested patterns like contains") {
    import spark.implicits._
    // patterns exercise the failure links: "aba" overlaps itself in
    // "ababa"; "ba" is a suffix of "aba"; "abc" shares a prefix
    val pats = Seq("aba", "ba", "abc", "zz")
    val docs = Seq(
      (1L, "ababa"),     // aba (twice, reported once) + ba
      (2L, "xxabcxx"),   // abc + ba? no — 'ba' not in "xxabcxx"
      (3L, "b a c"),     // none
      (4L, "zzz")        // zz
    ).toDF("doc_id", "text")
    val got = Dedup.canaryScan(docs, "text", "doc_id", pats)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // ground truth = contains() per (doc, pattern)
    val expect = (for {
      (id, tx) <- Seq((1L, "ababa"), (2L, "xxabcxx"), (3L, "b a c"), (4L, "zzz"))
      p <- pats if tx.contains(p)
    } yield (id, p)).toSet
    assert(got == expect, s"got $got expect $expect")
    // removal form drops exactly the matched docs
    val kept = Dedup.removeCanaries(docs, "text", pats)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L))
    // map-side: no exchange anywhere in the scan plan
    val plan = Dedup.canaryScan(docs, "text", "doc_id", pats)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"canary scan must not shuffle:\n$plan")
    // direct automaton check: unicode + early-exit safety
    val ac = new org.apache.spark.sql.graft.AcAutomaton(Seq("ключ", "é"))
    assert(ac.scan("a ключ b").toSeq == Seq(0))
    assert(ac.scan("café").toSeq == Seq(1))
    assert(ac.scan("none").isEmpty)
  }

  test("snapshotDiff classifies added/removed/changed; text never joins") {
    import spark.implicits._
    val a = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val b = Seq((2L, "beta"), (3L, "GAMMA"), (4L, "delta"))
      .toDF("doc_id", "text")
    val got = Dedup.snapshotDiff(a, b, "doc_id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
    val sums = Dedup.snapshotDiffSummary(a, b, "doc_id", Seq("text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums == Map("added" -> 1L, "removed" -> 1L,
      "changed" -> 1L, "unchanged" -> 1L))
    // the join's shuffle carries (key, digest) only — no string column
    // crosses the exchange
    val plan = Dedup.snapshotDiff(a, b, "doc_id", Seq("text"))
      .queryExecution.executedPlan.toString
    assert(!"Exchange hashpartitioning\\([^)]*text"
      .r.findFirstIn(plan).isDefined, s"text in a shuffle key:\n$plan")
    // each join input carries exactly (key, 8-byte digest) — the text
    // column never reaches the exchange
    assert(!plan.contains("text#"), s"text column crossed the join:\n$plan")
    assert("__h_a".r.findAllIn(plan).nonEmpty, s"no digest column:\n$plan")
  }

  test("shingles enumerate every k-window in order (zip_with form)") {
    import spark.implicits._
    val d = Seq(("A b c d", 1), ("a b", 2), ("solo", 3)).toDF("t", "i")
    val got = d.orderBy("i")
      .select(Dedup.shingles(col("t"), k = 3).alias("s"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("a b c", "b c d")) // lowercased, every window
    assert(got(1) == Seq("a b"))            // fewer than k -> one joined shingle
    assert(got(2) == Seq("solo"))
  }

  test("fuzzyKeyPairs links typo variants of short keys, leaves distinct names apart") {
    import spark.implicits._
    val names = Seq(
      (1L, "Jonathan Smith"), (2L, "Jonathon Smith"), // one-char typo
      (3L, "Jonathan  Smith"),                        // spacing variant
      (4L, "Alice Jones"), (5L, "Bob Brown"))
      .toDF("name", "n").toDF("id", "name")
    val pairs = Dedup.fuzzyKeyPairs(names, "name", "id",
        k = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)),
      s"typo/spacing variants not linked: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L || p._1 == 5L),
      s"distinct names linked: $pairs")
    // jaccard agrees with a brute-force char-gram computation
    def grams(s: String): Set[String] =
      (if (s.length < 3) Seq(s.toLowerCase)
       else s.toLowerCase.sliding(3).toSeq).toSet
    val j12 = {
      val (a, b) = (grams("Jonathan Smith"), grams("Jonathon Smith"))
      a.intersect(b).size.toDouble / a.union(b).size
    }
    val got = Dedup.fuzzyKeyPairs(names, "name", "id", 3, 0.5)
      .filter(col("id_a") === 1 && col("id_b") === 2)
      .head().getDouble(2)
    assert(math.abs(got - j12) < 1e-6, s"jaccard $got vs brute $j12")
  }

  test("minhash LSH finds planted near-dup and exact-dup pairs") {
    val pairs = Dedup.minhashDupPairs(docs, "text", "doc_id",
      k = 3, bands = 16, rows = 4, jaccardThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // exact dup: jaccard 1.0
    assert(pairs.contains((1L, 2L))) // near dup
    assert(pairs.contains((2L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("planBands tracks the threshold and the auto variant matches manual") {
    // (1/b)^(1/r) is the S-curve midpoint: the chosen plan's midpoint
    // must land near the requested threshold
    def midpoint(p: (Int, Int)): Double = math.pow(1.0 / p._1, 1.0 / p._2)
    val lo = Dedup.planBands(64, 0.3)
    val hi = Dedup.planBands(64, 0.9)
    assert(math.abs(midpoint(lo) - 0.3) < 0.15, s"$lo -> ${midpoint(lo)}")
    assert(math.abs(midpoint(hi) - 0.9) < 0.1, s"$hi -> ${midpoint(hi)}")
    // higher threshold → steeper-later curve → more rows per band
    assert(hi._2 > lo._2, s"lo=$lo hi=$hi")
    // both factorizations use the whole signature
    assert(lo._1 * lo._2 == 64 && hi._1 * hi._2 == 64)
    // the auto variant is exactly the manual call at the planned shape
    val (b, r) = Dedup.planBands(64, 0.5)
    val auto = Dedup.minhashDupPairsAuto(docs, "text", "doc_id",
      k = 3, n = 64, jaccardThreshold = 0.5)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val manual = Dedup.minhashDupPairs(docs, "text", "doc_id",
      k = 3, bands = b, rows = r, jaccardThreshold = 0.5)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(auto == manual)
    assert(auto.contains((1L, 4L)), auto.toString) // exact dup survives
  }

  test("simhash hamming distance separates dups from distinct docs") {
    val fp = docs.select(col("doc_id"), Dedup.simhash64(col("text")).alias("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(4L)) == 0) // identical text
    assert(ham(fp(1L), fp(2L)) <= 16) // near dup: close
    assert(ham(fp(1L), fp(3L)) > 16) // unrelated: far
    val pairs = Dedup.simhashDupPairs(docs, "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("ngram jaccard inverted-index join matches brute-force") {
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      k = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val asSet = pairs.map(p => (p._1, p._2)).toSet
    assert(asSet.contains((1L, 4L)))
    assert(pairs.find(p => p._1 == 1L && p._2 == 4L).get._3 == 1.0)
  }

  test("embedding dup pairs finds identical and near-identical vectors") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.5f)),
      (2L, Array(1.0f, 0.01f, 0.0f, 0.5f)), // near-dup of 1
      (3L, Array(-1.0f, 0.2f, 0.9f, -0.5f)),
      (4L, Array(1.0f, 0.0f, 0.0f, 0.5f)) // exact dup of 1
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingDupPairs(vecs, "embedding", "vec_id",
      threshold = 0.99).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("brute force topk returns query vector first") {
    val emb = sf("embeddings")
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0)
    val top = Similarity.bruteForceTopK(emb, "embedding", "vec_id", q, 5).collect()
    assert(top.head.getLong(0) == 0L) // self-match, score 1.0
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-6)
    val scores = top.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("lsh topk self-match recall") {
    val emb = sf("embeddings")
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0)
    val top = Similarity.lshTopK(emb, "embedding", "vec_id", q, 5).collect()
    assert(top.nonEmpty)
    assert(top.head.getLong(0) == 0L) // same bucket as itself always
  }

  test("text analysis measures") {
    val out = TextAnalysis.annotate(docs, "text").collect()
    val r1 = out.find(_.getLong(0) == 1L).get
    assert(r1.getAs[Int]("n_tokens") == 14)
    assert(r1.getAs[String]("lang_pred") == "en")
    val q = r1.getAs[Double]("quality")
    assert(q > 0 && q <= 1)
    // identical docs → identical fingerprints
    val fp1 = r1.getAs[String]("fp")
    val fp4 = out.find(_.getLong(0) == 4L).get.getAs[String]("fp")
    assert(fp1 == fp4)
  }

  test("token and subword counting pin their semantics") {
    import spark.implicits._
    val df = Seq(
      ("hello world", 2),
      ("  padded   out  ", 2),
      ("one", 1)).toDF("text", "expected")
    val got = df.select(col("expected"),
      TextAnalysis.tokenCount(col("text")).alias("n")).collect()
    got.foreach(r => assert(r.getInt(1) == r.getInt(0), r.toString))
    // BPE-ish subword count: split before punctuation, which sticks to
    // what follows, GPT-2-style ("can't stop" -> can | 't | stop)
    val sw = Seq("can't stop").toDF("text")
      .select(TextAnalysis.subwordCount(col("text"))).head().getInt(0)
    assert(sw == 3)
    val sw2 = Seq("abc123 x").toDF("text")
      .select(TextAnalysis.subwordCount(col("text"))).head().getInt(0)
    assert(sw2 >= 2) // word+digits boundary plus the second token
  }

  test("multimodal plumbing: binary payload, metadata, stub features, frames") {
    val media = Multimodal.attachFakeMedia(docs, "text")
    assert(media.schema("media").dataType.typeName == "binary")
    val feats = Multimodal.extractFeatures(media)
    val row = feats.filter(col("doc_id") === 1).head()
    val f1 = row.getSeq[Float](feats.schema.fieldIndex("media_feat"))
    assert(f1.length == 8)
    // deterministic: same text → same features
    val f4 = feats.filter(col("doc_id") === 4).head()
      .getSeq[Float](feats.schema.fieldIndex("media_feat"))
    assert(f1 == f4)
    val frames = Multimodal.sampleFrames(media, everyNBytes = 16)
    assert(frames.count() > docs.count())
    // an empty payload samples zero frames (not an illegal-sequence crash)
    import spark.implicits._
    val emptyMedia = Multimodal.attachFakeMedia(
      Seq((99L, "")).toDF("doc_id", "text"), "text")
    assert(Multimodal.sampleFrames(emptyMedia, everyNBytes = 16).count() == 0)
    // stub resize: payload length scales with the target pixel count and
    // the metadata tracks the new dimensions
    val resized = Multimodal.resizeMedia(media, newWidth = 8, newHeight = 6)
    val r = resized.filter(col("doc_id") === 1).head()
    val meta = r.getStruct(resized.schema.fieldIndex("media_meta"))
    assert(meta.getInt(1) == 8 && meta.getInt(2) == 6)
    assert(meta.getLong(3) ==
      r.getAs[Array[Byte]](resized.schema.fieldIndex("media")).length.toLong)
    // deterministic
    val r2 = Multimodal.resizeMedia(media, 8, 6).filter(col("doc_id") === 1).head()
    assert(r.getAs[Array[Byte]](resized.schema.fieldIndex("media")).toSeq ==
      r2.getAs[Array[Byte]](resized.schema.fieldIndex("media")).toSeq)
    // an empty payload resizes to an empty payload (no subsample source)
    import spark.implicits._
    val empty = Multimodal.attachFakeMedia(
      Seq((9L, "")).toDF("doc_id", "text"), "text")
    val er = Multimodal.resizeMedia(empty, 8, 6).head()
    assert(er.getAs[Array[Byte]](empty.schema.fieldIndex("media")).isEmpty)
  }

  test("real PNG payloads decode, feature-extract, and rescale via imageio") {
    import spark.implicits._
    // generate a real 4x2 PNG: left half red, right half blue
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if (x < w / 2) 0xFF0000 else 0x0000FF)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val bytes = png(4, 2)
    val media = Seq((1L, bytes)).toDF("doc_id", "media")
      .withColumn("media_meta", struct(
        lit("image/png").alias("format"), lit(4).alias("width"),
        lit(2).alias("height"), lit(bytes.length.toLong).alias("n_bytes")))
    val feats = Multimodal.extractFeatures(media)
    val f = feats.head().getSeq[Float](feats.schema.fieldIndex("media_feat"))
    // real pixel statistics, not byte-stub output: half red half blue
    assert(math.abs(f(0) - 0.5f) < 1e-6, s"mean R: ${f(0)}")
    assert(math.abs(f(1)) < 1e-6, s"mean G: ${f(1)}")
    assert(math.abs(f(2) - 0.5f) < 1e-6, s"mean B: ${f(2)}")
    assert(f(6) == 4.0f && f(7) == 2.0f, "pixel dims from the decode")
    // real rescale: the output payload is itself a decodable 8x6 PNG
    val resized = Multimodal.resizeMedia(media, newWidth = 8, newHeight = 6)
    val r = resized.head()
    val out = r.getAs[Array[Byte]](resized.schema.fieldIndex("media"))
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
    assert(back != null && back.getWidth == 8 && back.getHeight == 6)
    val meta = r.getStruct(resized.schema.fieldIndex("media_meta"))
    assert(meta.getInt(1) == 8 && meta.getInt(2) == 6)
    assert(meta.getLong(3) == out.length.toLong)
    // a corrupt image payload falls back to the stub instead of throwing
    val junk = Seq((2L, Array[Byte](1, 2, 3))).toDF("doc_id", "media")
      .withColumn("media_meta", struct(
        lit("image/png").alias("format"), lit(1).alias("width"),
        lit(1).alias("height"), lit(3L).alias("n_bytes")))
    val junkFeats = Multimodal.extractFeatures(junk)
    assert(junkFeats.head()
      .getSeq[Float](junkFeats.schema.fieldIndex("media_feat")).length == 8)
  }

  test("perceptual hash: same picture at different sizes is a near-dup, different picture is not") {
    import spark.implicits._
    // gradient pattern (stable under bilinear rescale) vs checkerboard
    def png(w: Int, h: Int, checker: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = if (checker) { if ((x / 4 + y / 4) % 2 == 0) 0xFFFFFF else 0 }
          else { val g = 255 * x / math.max(1, w - 1); (g << 16) | (g << 8) | g }
        img.setRGB(x, y, v)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    def mediaRow(id: Long, b: Array[Byte], w: Int, h: Int) = (id, b, w, h)
    val rows = Seq(
      mediaRow(1L, png(64, 64, checker = false), 64, 64),
      mediaRow(2L, png(32, 32, checker = false), 32, 32), // same scene, resized
      mediaRow(3L, png(64, 64, checker = true), 64, 64))  // different scene
    val df = rows.toDF("doc_id", "media", "w", "h")
      .select(col("doc_id"), col("media"), struct(
        lit("image/png").alias("format"), col("w").alias("width"),
        col("h").alias("height"),
        org.apache.spark.sql.functions.length(col("media")).cast("long")
          .alias("n_bytes")).alias("media_meta"))
    val hashed = Multimodal.perceptualHash(df)
      .select("doc_id", "phash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hashed(1L), hashed(2L)) <= 5,
      s"resized copy too far: ${ham(hashed(1L), hashed(2L))}")
    assert(ham(hashed(1L), hashed(3L)) > 10,
      s"distinct scenes too close: ${ham(hashed(1L), hashed(3L))}")
    // end-to-end pair join finds exactly the resized-copy pair
    val pairs = Multimodal.nearDupMedia(df, "doc_id", maxHamming = 5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
    // non-image payloads take the stub hash, never a decode failure
    val stub = Seq((9L, "plain bytes".getBytes("UTF-8"))).toDF("doc_id", "media")
      .withColumn("media_meta", struct(
        lit("video/mp4").alias("format"), lit(1).alias("width"),
        lit(1).alias("height"), lit(11L).alias("n_bytes")))
    assert(!Multimodal.perceptualHash(stub).head().isNullAt(2))
  }

  test("real WAV payloads decode and feature-extract via javax.sound.sampled") {
    import spark.implicits._
    // generate a real 16-bit PCM mono WAV: 440 Hz sine, 0.25 s at 8 kHz
    val rate = 8000f
    val n = 2000
    val amp = 0.5
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = (amp * math.sin(2 * math.Pi * 440 * i / rate) * 32767).toInt
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val bytes = baos.toByteArray
    val media = Seq((1L, bytes)).toDF("doc_id", "media")
      .withColumn("media_meta", struct(
        lit("audio/wav").alias("format"), lit(0).alias("width"),
        lit(0).alias("height"), lit(bytes.length.toLong).alias("n_bytes")))
    val feats = Multimodal.extractFeatures(media)
    val f = feats.head().getSeq[Float](feats.schema.fieldIndex("media_feat"))
    // real signal statistics, not byte-stub output
    assert(math.abs(f(1) - amp / math.sqrt(2)) < 0.01, s"RMS of a sine: ${f(1)}")
    assert(math.abs(f(2) - amp) < 0.01, s"peak: ${f(2)}")
    assert(math.abs(f(3) - 2 * 440 / rate) < 0.01, s"zero-crossing rate: ${f(3)}")
    assert(math.abs(f(4) - n / rate) < 1e-3, s"duration: ${f(4)}")
    assert(f(5) == rate && f(6) == 1.0f && f(7) == n.toFloat)
    // a corrupt audio payload falls back to the stub instead of throwing
    val junk = Seq((2L, Array[Byte](9, 9, 9))).toDF("doc_id", "media")
      .withColumn("media_meta", struct(
        lit("audio/wav").alias("format"), lit(1).alias("width"),
        lit(1).alias("height"), lit(3L).alias("n_bytes")))
    val junkFeats = Multimodal.extractFeatures(junk)
    assert(junkFeats.head()
      .getSeq[Float](junkFeats.schema.fieldIndex("media_feat")).length == 8)
  }

  test("stereo WAV: zero-crossing rate measures the downmix, not channel flips") {
    import spark.implicits._
    // interleaved stereo 16-bit PCM: R = -L at every frame. The mono
    // downmix is identically 0 (no crossings); a naive sign compare over
    // the raw interleaved samples would count ~2 flips per frame.
    val rate = 8000f
    val frames = 1000
    val pcm = new Array[Byte](frames * 4)
    for (i <- 0 until frames) {
      val v = (0.5 * math.sin(2 * math.Pi * 440 * i / rate) * 32767).toInt
      pcm(4 * i) = (v & 0xFF).toByte
      pcm(4 * i + 1) = ((v >> 8) & 0xFF).toByte
      val w = -v
      pcm(4 * i + 2) = (w & 0xFF).toByte
      pcm(4 * i + 3) = ((w >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 2, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val bytes = baos.toByteArray
    val media = Seq((1L, bytes)).toDF("doc_id", "media")
      .withColumn("media_meta", struct(
        lit("audio/wav").alias("format"), lit(0).alias("width"),
        lit(0).alias("height"), lit(bytes.length.toLong).alias("n_bytes")))
    val feats = Multimodal.extractFeatures(media)
    val f = feats.head().getSeq[Float](feats.schema.fieldIndex("media_feat"))
    assert(f(6) == 2.0f, s"channel count: ${f(6)}")
    assert(f(3) < 0.01, s"anti-phase stereo must have ~0 ZCR, got ${f(3)}")
    // in-phase stereo (R = L): downmix is the sine itself — the real ZCR,
    // normalized per FRAME (so mono and stereo of the same signal agree)
    val pcm2 = new Array[Byte](frames * 4)
    for (i <- 0 until frames) {
      val v = (0.5 * math.sin(2 * math.Pi * 440 * i / rate) * 32767).toInt
      pcm2(4 * i) = (v & 0xFF).toByte
      pcm2(4 * i + 1) = ((v >> 8) & 0xFF).toByte
      pcm2(4 * i + 2) = (v & 0xFF).toByte
      pcm2(4 * i + 3) = ((v >> 8) & 0xFF).toByte
    }
    val ais2 = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm2), fmt, frames.toLong)
    val baos2 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais2,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos2)
    val bytes2 = baos2.toByteArray
    val media2 = Seq((1L, bytes2)).toDF("doc_id", "media")
      .withColumn("media_meta", struct(
        lit("audio/wav").alias("format"), lit(0).alias("width"),
        lit(0).alias("height"), lit(bytes2.length.toLong).alias("n_bytes")))
    val f2 = Multimodal.extractFeatures(media2).head()
      .getSeq[Float](feats.schema.fieldIndex("media_feat"))
    assert(math.abs(f2(3) - 2 * 440 / rate) < 0.01,
      s"in-phase stereo ZCR should match the mono signal's: ${f2(3)}")
  }

  test("real MJPEG-AVI video payloads decode frame-wise through the RIFF parser") {
    import spark.implicits._
    def gray(w: Int, h: Int, level: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (level << 16) | (level << 8) | level
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      img
    }
    // 4 frames, brightening 40 -> 160: motion proxy must see the ramp
    val frames = Seq(40, 80, 120, 160).map(gray(32, 16, _))
    val avi = Multimodal.encodeMjpegAvi(frames, fps = 10)
    // container sanity: RIFF/AVI magic
    assert(new String(avi, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(avi, 8, 4, "US-ASCII") == "AVI ")
    val media = Seq((1L, avi)).toDF("doc_id", "media")
      .withColumn("media_meta", struct(
        lit("video/avi").alias("format"), lit(32).alias("width"),
        lit(16).alias("height"), lit(avi.length.toLong).alias("n_bytes")))
    val feats = Multimodal.extractFeatures(media)
    val f = feats.head().getSeq[Float](feats.schema.fieldIndex("media_feat"))
    assert(f(0) == 4.0f, s"frame count: ${f(0)}")
    assert(f(1) == 32.0f && f(2) == 16.0f, s"dims: ${f(1)}x${f(2)}")
    assert(f(3) == 10.0f, s"fps from avih: ${f(3)}")
    assert(math.abs(f(4) - 0.4f) < 1e-6, s"duration: ${f(4)}")
    // mean luma ~ (40+80+120+160)/4/255 = 0.392; JPEG DC quantization
    // keeps a solid frame within a few levels
    assert(math.abs(f(5) - 0.392f) < 0.03, s"mean luma: ${f(5)}")
    // motion: |delta| = 40/255 = 0.157 per step
    assert(math.abs(f(6) - 0.157f) < 0.03, s"motion: ${f(6)}")
    // corrupt payload degrades to the stub instead of throwing
    val junk = Seq((2L, Array[Byte](82, 73, 70, 70, 9, 9))).toDF("doc_id", "media")
      .withColumn("media_meta", struct(
        lit("video/avi").alias("format"), lit(1).alias("width"),
        lit(1).alias("height"), lit(6L).alias("n_bytes")))
    assert(Multimodal.extractFeatures(junk).head()
      .getSeq[Float](feats.schema.fieldIndex("media_feat")).length == 8)
    // perceptual hash: two clips sharing the same middle frame are
    // near-dups; a checkerboard clip is not
    def checker(w: Int, h: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if ((x / 4 + y / 4) % 2 == 0) 0xFFFFFF else 0)
      img
    }
    def grad(w: Int, h: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = 255 * x / math.max(1, w - 1)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      img
    }
    val clipA = Multimodal.encodeMjpegAvi(Seq.fill(3)(grad(32, 32)), 10)
    val clipB = Multimodal.encodeMjpegAvi(Seq.fill(5)(grad(64, 64)), 10)
    val clipC = Multimodal.encodeMjpegAvi(Seq.fill(3)(checker(32, 32)), 10)
    val clips = Seq((1L, clipA), (2L, clipB), (3L, clipC))
      .toDF("doc_id", "media")
      .withColumn("media_meta", struct(
        lit("video/avi").alias("format"), lit(0).alias("width"),
        lit(0).alias("height"), length(col("media")).cast("long").alias("n_bytes")))
    val pairs = Multimodal.nearDupMedia(clips, "doc_id", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"same-content clips must pair: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"checkerboard clip must not pair with gradients: $pairs")
  }

  test("null media format takes the stub path instead of NPE") {
    import spark.implicits._
    val media = Seq((1L, Array[Byte](1, 2, 3, 4))).toDF("doc_id", "media")
      .withColumn("media_meta", struct(
        lit(null).cast("string").alias("format"), lit(2).alias("width"),
        lit(2).alias("height"), lit(4L).alias("n_bytes")))
    val feats = Multimodal.extractFeatures(media)
    assert(feats.head()
      .getSeq[Float](feats.schema.fieldIndex("media_feat")).length == 8)
    val resized = Multimodal.resizeMedia(media, 4, 4)
    val r = resized.head()
    val meta = r.getStruct(resized.schema.fieldIndex("media_meta"))
    assert(meta.isNullAt(0) && meta.getInt(1) == 4)
  }

  test("crossContainment finds bench docs contained in train docs") {
    import spark.implicits._
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "completely unrelated training content here")).toDF("doc_id", "text")
    val bench = Seq(
      (10L, "alpha beta gamma delta"), // contained in doc 1
      (11L, "nothing shared at all")).toDF("doc_id", "text")
    val out = Dedup.crossContainment(train, bench, "text", "doc_id",
      k = 2, threshold = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((10L, 1L, 1.0)), out.mkString(","))
  }

  test("crossContainmentBloom matches crossContainment and gates the train side") {
    import spark.implicits._
    val train = (1L to 40L).map { i =>
      (i, if (i == 1L) "alpha beta gamma delta epsilon zeta"
          else s"filler document number $i about topic ${i % 7} entirely disjoint")
    }.toDF("doc_id", "text")
    val bench = Seq(
      (10L, "alpha beta gamma delta"), // contained in train doc 1
      (11L, "nothing shared at all")).toDF("doc_id", "text")
    val exact = Dedup.crossContainment(train, bench, "text", "doc_id",
      k = 2, threshold = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val bloom = Dedup.crossContainmentBloom(train, bench, "text", "doc_id",
      k = 2, threshold = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(bloom.sorted == exact.sorted, s"bloom=$bloom exact=$exact")
    assert(exact.contains((10L, 1L, 1.0)))
    // the gate itself: the filler docs share no bench shingles, so the
    // map-side count filter removes them before the postings join
    val bf = train.select(org.apache.spark.sql.graft.sketch
        .shingle_hashes(col("text"), 2).alias("sh"))
    val bcF = bench.select(explode(org.apache.spark.sql.graft.sketch
        .shingle_hashes(col("text"), 2)).alias("s"))
      .stat.bloomFilter("s", 100, 0.01)
    val bc = spark.sparkContext.broadcast(bcF)
    val survivors = bf.filter(org.apache.spark.sql.graft.sketch
      .bloom_contained_count(col("sh"), bc) >= 1).count()
    assert(survivors < 40, s"bloom gate pruned nothing ($survivors of 40)")
  }

  test("decontaminate drops exactly the containing train docs, anti-join broadcast") {
    import spark.implicits._
    val train = (1L to 40L).map { i =>
      (i, if (i == 1L) "alpha beta gamma delta epsilon zeta"
          else s"filler document number $i about topic ${i % 7} entirely disjoint")
    }.toDF("doc_id", "text")
    val bench = Seq(
      (10L, "alpha beta gamma delta"),
      (11L, "nothing shared at all")).toDF("doc_id", "text")
    val clean = Dedup.decontaminate(train, bench, "text", "doc_id",
      k = 2, threshold = 0.8)
    val kept = clean.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == (2L to 40L).toSet, s"kept $kept") // only doc 1 contains a bench doc
    val plan = clean.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"), s"anti-join not broadcast:\n$plan")
  }

  test("end-to-end corpus prep: quality gate -> dedup -> decontaminate -> mix -> pack") {
    // the full chain a pretraining pipeline runs, on the sf0.001 corpus —
    // every stage is its own certified operator; this asserts they
    // COMPOSE: schemas line up, determinism survives, nothing explodes
    val docs = sf("documents")
    // the FULL gopher conjunction correctly rejects this synthetic
    // corpus (its vocabulary carries one of the eight required stop
    // words), so the composition gate uses the length rule's evidence —
    // gopherFilter's all-rules path is covered by its own planted spec
    val gated = docs.filter(pipeline.TextAnalysis
      .gopherReport(col("text")).getField("n_words") >= 50)
    val gatedN = gated.count()
    assert(gatedN > 0 && gatedN < docs.count(),
      s"gopher gate kept $gatedN of ${docs.count()}")
    val deduped = pipeline.Dedup.exactDedup(gated, "text", "doc_id")
    assert(deduped.count() <= gatedN)
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val clean = pipeline.Dedup.decontaminate(
      deduped, bench, "text", "doc_id", k = 2, threshold = 0.8)
    val cleanN = clean.count()
    assert(cleanN <= deduped.count())
    val mixed = pipeline.Mixing.mixToTemperature(
      clean, "text", "doc_id", "source", alpha = 0.7, tokenBudget = 3000L)
    val mixedN = mixed.count()
    assert(mixedN > 0 && mixedN < cleanN, s"mix kept $mixedN of $cleanN")
    val packed = pipeline.Packing.packDocs(
      mixed, "doc_id", "text", seqLen = 512, shards = 4)
    assert(packed.count() == mixedN) // every mixed doc lands in a shard
    // deterministic end to end: the same chain re-run over a
    // repartitioned input selects the identical documents
    val again = pipeline.Packing.packDocs(
      pipeline.Mixing.mixToTemperature(
        pipeline.Dedup.decontaminate(
          pipeline.Dedup.exactDedup(
            docs.repartition(11).filter(pipeline.TextAnalysis
              .gopherReport(col("text")).getField("n_words") >= 50),
            "text", "doc_id"),
          bench, "text", "doc_id", k = 2, threshold = 0.8),
        "text", "doc_id", "source", alpha = 0.7, tokenBudget = 3000L),
      "doc_id", "text", seqLen = 512, shards = 4)
    val a = packed.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = again.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("ivf build + probe finds the query vector") {
    val emb = sf("embeddings")
    val ivf = Similarity.buildIvf(emb, "embedding", "vec_id", nCentroids = 8)
    assert(ivf.cells.columns.contains("ivf_cell"))
    assert(ivf.cells.count() == emb.count())
    assert(ivf.model.centroids.size == 8)
    assert(ivf.cells.select("ivf_cell").distinct().count() <= 8)
    val q = emb.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
    val top = Similarity.ivfTopK(ivf, "embedding", "vec_id", q, k = 5, nProbe = 3)
      .collect()
    assert(top.nonEmpty)
    assert(top.head.getLong(0) == 0L) // self-match lives in a probed cell
  }

  test("ivf default dial is k-means with k = ceil(sqrt(n))") {
    val emb = sf("embeddings")
    val n = emb.count()
    val ivf = Similarity.buildIvf(emb, "embedding", "vec_id")
    assert(ivf.model.centroids.size ==
      math.ceil(math.sqrt(n.toDouble)).toInt)
    assert(ivf.model.iterations >= 1, "auto dial must run the k-means fit")
    // every centroid is finite (model health, not just shape)
    assert(ivf.model.centroids.forall(c =>
      c.nonEmpty && c.forall(v => !v.isNaN && !v.isInfinite)))
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0)
    val top = Similarity.ivfTopK(ivf, "embedding", "vec_id", q, k = 5,
      nProbe = 2).collect()
    assert(top.nonEmpty && top.head.getLong(0) == 0L)
  }

  test("end-to-end corpus REFRESH: diff -> canary -> template dedup -> index probe -> drift gates") {
    // the recurring-ingest chain, composing the round-9 operators: what
    // changed since the last snapshot, is any of it blocklisted, which
    // new docs are templates or near-dups of the standing corpus, and
    // did the refresh move the distribution
    import spark.implicits._
    val docs = sf("documents")
    val standing = docs.filter(col("doc_id") < 300)
    // the refresh: half overlap (100-299 unchanged), 200 docs of new ids
    val refresh = docs.filter(col("doc_id") >= 100)
    // 1. what changed — counts classify without shuffling text
    val diff = pipeline.Dedup.snapshotDiffSummary(
        standing.select("doc_id", "text"), refresh.select("doc_id", "text"),
        "doc_id", Seq("text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(diff("removed") == 100L && diff("added") == 200L)
    assert(diff.getOrElse("unchanged", 0L) == 200L && !diff.contains("changed"))
    // 2. only the ADDED docs flow on (incremental, never the full corpus)
    val added = refresh.join(standing.select("doc_id"), Seq("doc_id"),
      "left_anti")
    assert(added.count() == 200)
    // 3. blocklist scan on the additions (no hits expected on clean data;
    //    a planted canary IS caught)
    val canaries = Seq("graft-canary-7b3f")
    assert(pipeline.Dedup.canaryScan(added, "text", "doc_id", canaries)
      .count() == 0)
    val planted = added.limit(1)
      .withColumn("text", concat(col("text"), lit(" graft-canary-7b3f")))
    assert(pipeline.Dedup.canaryScan(planted, "text", "doc_id", canaries)
      .count() == 1)
    // 4. template + near-dup screening against the STANDING index —
    //    probe cost scales with the batch, the index is not rebuilt
    val cleaned = pipeline.Dedup.templateDedup(added, "text", "doc_id")
    val idx = pipeline.Dedup.minhashIndex(standing, "text", "doc_id")
    val dups = pipeline.Dedup.minhashProbe(idx, cleaned, "text", "doc_id")
    val survivors = cleaned.join(
      dups.select(col("new_id").alias("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    assert(survivors.count() > 0 && survivors.count() <= 200)
    // 5. drift gates between the standing corpus and the survivors:
    //    this synthetic refresh draws from the same distribution, so
    //    both measures must read calm
    val both = standing.withColumn("__side", lit("old"))
      .unionByName(survivors.withColumn("__side", lit("new")))
    val ks = pipeline.Profiling.ksStatistic(both, "n_chars", "__side",
      "old", "new").head().getDouble(0)
    assert(ks < 0.25, s"KS read drift on an identically-drawn refresh: $ks")
    val psiTot = pipeline.Profiling.categoricalDrift(both, "lang", "__side",
      "old", "new").agg(sum(col("psi_term"))).head().getDouble(0)
    assert(psiTot < 0.25, s"PSI read drift: $psiTot")
    // determinism: the survivor set is identical under repartitioning
    val again = pipeline.Dedup.templateDedup(
      added.repartition(13), "text", "doc_id")
      .join(dups.select(col("new_id").alias("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == survivors.select("doc_id").collect()
      .map(_.getLong(0)).toSet)
  }

  test("crossNgramCoverage counts eval grams seen in train; train never shuffles") {
    import spark.implicits._
    val train = Seq((1L, "a b c d"), (2L, "x y")).toDF("doc_id", "text")
    val ev = Seq((10L, "a b q"), (11L, "x y")).toDF("doc_id", "text")
    // eval distinct 2-grams: {a b, b q, x y}; train has {a b, b c, c d,
    // x y} → hits {a b, x y} → 2/3
    val r = Dedup.crossNgramCoverage(train, ev, "text", k = 2).head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == BigDecimal(2.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // the train side joins via BROADCAST — no train-keyed exchange
    val plan = Dedup.crossNgramCoverage(train, ev, "text", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), s"eval side must broadcast:\n$plan")
  }

  test("bench gate persists: reloaded gate admits the identical train set") {
    val train = sf("documents").filter(col("doc_id") < 300)
    val bench = sf("documents").filter(col("doc_id") % 97 === 0)
    val gate = Dedup.buildBenchGate(bench, "text", k = 2).get
    val dir = java.nio.file.Files.createTempDirectory("graft_gate").toString
    Dedup.writeBenchGate(gate, dir, spark)
    val back = Dedup.readBenchGate(spark, dir)
    assert(back.minB == gate.minB && back.k == gate.k)
    def gated(g: Dedup.BenchGate): Set[Long] =
      Dedup.gateTrain(train, "text", g, threshold = 0.8)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = gated(gate)
    assert(a.nonEmpty && a == gated(back))
    // the refactored detection still equals the exact operator
    val viaBloom = Dedup.crossContainmentBloom(train, bench, "text",
        "doc_id", k = 2, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.crossContainment(train, bench, "text",
        "doc_id", k = 2, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaBloom == exact)
    // empty bench → no gate, detection returns empty
    assert(Dedup.buildBenchGate(bench.filter(lit(false)), "text").isEmpty)
  }

  test("salted join matches plain join result") {
    val li = sf("lineitem").select("l_orderkey", "l_quantity")
    val orders = sf("orders").select("o_orderkey", "o_totalprice")
    val plain = li.join(orders, li("l_orderkey") === orders("o_orderkey")).count()
    val salted = Skew.saltedJoin(li, orders, "l_orderkey", "o_orderkey",
      saltFactor = 4).count()
    assert(salted == plain)
    val hist = Skew.keyHistogram(li, "l_orderkey", topN = 5).collect()
    assert(hist.length == 5)
  }

  test("salted join tolerates map columns and honors explicit saltCols") {
    import spark.implicits._
    // map-typed payload: hash() rejects MapType, so the default salt
    // sources must skip it rather than fail analysis
    val big = Seq((1L, "x", Map("k" -> 1)), (1L, "y", Map("k" -> 2)),
      (2L, "z", Map("k" -> 3)))
      .toDF("k", "payload", "attrs")
    val small = Seq((1L, "one"), (2L, "two")).toDF("k2", "name")
    val joined = Skew.saltedJoin(big, small, "k", "k2", saltFactor = 4)
    assert(joined.count() == 3)
    // explicit saltCols restricted to the payload column
    val explicit = Skew.saltedJoin(big, small, "k", "k2", saltFactor = 4,
      saltCols = Seq("payload"))
    assert(explicit.count() == 3)
    // all-map big side (besides nothing hashable) must fail loudly
    val allMap = Seq(Map("k" -> 1), Map("k" -> 2)).toDF("attrs")
      .withColumn("k", lit(1L))
    // k is hashable, so this still works; drop it to trigger the guard
    val err = intercept[IllegalArgumentException] {
      Skew.saltedJoin(allMap.select("attrs"), small, "attrs", "k2")
    }
    assert(err.getMessage.contains("saltCols"))
  }
}
