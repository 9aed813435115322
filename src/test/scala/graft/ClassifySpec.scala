package graft

import graft.pipeline.Classify
import org.apache.spark.sql.functions._

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  // two linearly separable vocabularies: "science" prose vs spammy
  // boilerplate, 30 docs each, with per-doc salt so hashing sees
  // variety inside each class
  private def labeled = {
    val pos = (1L to 30L).map(i =>
      (i, s"the experiment measured a clear signal in trial $i results", 1))
    val neg = (31L to 60L).map(i =>
      (i, s"click here free offer winner prize claim now bonus $i", 0))
    (pos ++ neg).toDF("doc_id", "text", "y")
  }

  // held-out docs from the same two generators (ids disjoint)
  private def heldOut = {
    val pos = (101L to 110L).map(i =>
      (i, s"the experiment measured a clear signal in trial $i results", 1))
    val neg = (111L to 120L).map(i =>
      (i, s"click here free offer winner prize claim now bonus $i", 0))
    (pos ++ neg).toDF("doc_id", "text", "y")
  }

  private def accuracy(scored: org.apache.spark.sql.DataFrame): Double = {
    val joined = scored.join(heldOut.select(col("doc_id"), col("y")), "doc_id")
    joined.agg(avg((col("pred") === col("y")).cast("double"))).as[Double].head()
  }

  test("naive bayes separates held-out docs perfectly on separable classes") {
    val m = Classify.fitNaiveBayes(labeled, "text", "doc_id", "y",
      buckets = 2048, alpha = 0.5)
    assert(accuracy(Classify.score(heldOut, "text", "doc_id", m)) == 1.0)
  }

  test("logistic regression converges to a separating model") {
    val m = Classify.fitLogReg(labeled, "text", "doc_id", "y",
      buckets = 2048, lr = 0.5, iters = 50)
    assert(accuracy(Classify.score(heldOut, "text", "doc_id", m)) == 1.0)
  }

  test("one logistic step already orders classes by mean score") {
    // the q_lr_step contract: even a single closed-form step separates
    // the class MEANS (individual docs may still straddle zero)
    val m = Classify.fitLogReg(labeled, "text", "doc_id", "y",
      buckets = 2048, lr = 0.5, iters = 1)
    val by = Classify.score(heldOut, "text", "doc_id", m)
      .join(heldOut.select(col("doc_id"), col("y")), "doc_id")
      .groupBy("y").agg(avg("score").as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(by(1) > by(0),
      s"positive-class mean ${by(1)} not above negative ${by(0)}")
  }

  test("empty-text documents score the bare bias with zero features") {
    val m = Classify.fitNaiveBayes(labeled, "text", "doc_id", "y",
      buckets = 2048, alpha = 0.5)
    val r = Classify.score(Seq((999L, "")).toDF("doc_id", "text"),
      "text", "doc_id", m).collect().head
    assert(r.getAs[Long]("n_feats") >= 0L)
    assert(!r.isNullAt(r.fieldIndex("score")))
  }

  test("scoring plan is shuffle-free (no exchange, no join)") {
    val m = Classify.fitNaiveBayes(labeled, "text", "doc_id", "y",
      buckets = 2048, alpha = 0.5)
    val plan = Classify.score(sf("documents"), "text", "doc_id", m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring shuffles:\n$plan")
    assert(!plan.contains("Join"), s"scoring joins:\n$plan")
  }

  test("aucScore: separation 1.0, anti-separation 0.0, all-ties 0.5") {
    import org.apache.spark.sql.functions.col
    val perfect = Seq((1L, 0.9, 1), (2L, 0.8, 1), (3L, 0.2, 0), (4L, 0.1, 0))
      .toDF("id", "s", "y")
    assert(Classify.aucScore(perfect, "s", "y", "id")
      .collect().head.getDouble(2) == 1.0)
    val reversed = perfect.withColumn("s", -col("s"))
    assert(Classify.aucScore(reversed, "s", "y", "id")
      .collect().head.getDouble(2) == 0.0)
    // identical scores: average-rank correction must give exactly 0.5
    val ties = Seq((1L, 0.5, 1), (2L, 0.5, 1), (3L, 0.5, 0), (4L, 0.5, 0))
      .toDF("id", "s", "y")
    val t = Classify.aucScore(ties, "s", "y", "id").collect().head
    assert(t.getLong(0) == 2L && t.getLong(1) == 2L && t.getDouble(2) == 0.5)
    // single-class input → null
    val mono = Seq((1L, 0.5, 1), (2L, 0.7, 1)).toDF("id", "s", "y")
    assert(Classify.aucScore(mono, "s", "y", "id")
      .collect().head.isNullAt(2))
  }

  test("calibrationReport bins rounded probabilities against label rates") {
    // scores 0 → p=0.5 → bin 5; large score → p≈1 → bin 9
    val d = Seq((1L, 0.0, 1), (2L, 0.0, 0), (3L, 20.0, 1), (4L, 20.0, 1))
      .toDF("id", "s", "y")
    val got = Classify.calibrationReport(d, "s", "y", bins = 10)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got(5) == ((2L, 0.5, 0.5)))
    assert(got(9)._1 == 2L && got(9)._2 > 0.999 && got(9)._3 == 1.0)
    assert(got.size == 2)
  }

  test("confusionReport counts and rates on a hand matrix") {
    // tp=2 fp=1 fn=1 tn=2 → acc 4/6, prec 2/3, rec 2/3, f1 2/3
    val d = Seq(
      (1L, 1.0, 1), (2L, 2.0, 1), (3L, -1.0, 1),
      (4L, 3.0, 0), (5L, -2.0, 0), (6L, -0.5, 0))
      .toDF("id", "s", "y")
    val r = Classify.confusionReport(d, "s", "y").collect().head
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 1L, 1L, 2L)))
    assert(r.getDouble(4) == r6(4.0 / 6))
    assert(r.getDouble(5) == r6(2.0 / 3) && r.getDouble(6) == r6(2.0 / 3))
    assert(r.getDouble(7) == r6(2.0 / 3))
    // degenerate: nothing predicted positive → precision/f1 null
    val allNeg = Seq((1L, -1.0, 1), (2L, -1.0, 0)).toDF("id", "s", "y")
    val n = Classify.confusionReport(allNeg, "s", "y").collect().head
    assert(n.isNullAt(5) && n.isNullAt(7))
  }

  test("model persistence roundtrip scores bit-identically") {
    val m = Classify.fitNaiveBayes(labeled, "text", "doc_id", "y",
      buckets = 2048, alpha = 0.5)
    val dir = java.nio.file.Files.createTempDirectory("graft_nb").toString
    try {
      Classify.writeModel(m, dir, spark)
      val m2 = Classify.readModel(spark, dir)
      assert(m2.buckets == m.buckets && m2.bias == m.bias)
      assert(m2.weights.sameElements(m.weights))
      val a = Classify.score(heldOut, "text", "doc_id", m)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
      val b = Classify.score(heldOut, "text", "doc_id", m2)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
      assert(a == b)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("fit rejects single-class input") {
    intercept[IllegalArgumentException] {
      Classify.fitNaiveBayes(labeled.filter(col("y") === 1), "text",
        "doc_id", "y", buckets = 512, alpha = 0.5)
    }
  }

  test("classifier fits are memoized: repeat fit serves the identical " +
      "model, opt-out fits fresh and bit-identically (r13 verdict)") {
    import graft.pipeline.FitMemo
    val m0 = FitMemo.misses.get()
    val a = Classify.fitNaiveBayes(labeled, "text", "doc_id", "y")
    val h1 = FitMemo.hits.get()
    val b = Classify.fitNaiveBayes(labeled, "text", "doc_id", "y")
    assert(FitMemo.misses.get() >= m0 + 1, "first fit must miss")
    assert(FitMemo.hits.get() >= h1 + 1, "second fit must hit the memo")
    assert(a.weights.sameElements(b.weights) && a.bias == b.bias)
    // memoized ≡ direct (the DedupPropertySpec discipline): the opt-out
    // path fits from scratch and must reproduce the memoized model bit
    // for bit — seeded/closed-form determinism is the memo's license
    spark.conf.set("spark.graft.ann.fitCache", "false")
    try {
      val c = Classify.fitNaiveBayes(labeled, "text", "doc_id", "y")
      assert(c.weights.sameElements(a.weights) && c.bias == a.bias)
      val l1 = Classify.fitLogReg(labeled, "text", "doc_id", "y", iters = 3)
      spark.conf.unset("spark.graft.ann.fitCache")
      val l2 = Classify.fitLogReg(labeled, "text", "doc_id", "y", iters = 3)
      val l3 = Classify.fitLogReg(labeled, "text", "doc_id", "y", iters = 3)
      assert(l2.weights.sameElements(l1.weights) && l2.bias == l1.bias)
      assert(l3.weights.sameElements(l2.weights), "memo hit must be stable")
      // different hyper-parameters key separately — never served stale
      val l4 = Classify.fitLogReg(labeled, "text", "doc_id", "y", iters = 4)
      assert(!l4.weights.sameElements(l2.weights))
    } finally spark.conf.unset("spark.graft.ann.fitCache")
  }

  test("aucScore segment combine: any insertion order equals the ordered fold") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 20) {
      val p = 1 + rnd.nextInt(40)
      val parts = (0 until p).map { pid =>
        val cnt = rnd.nextInt(50).toLong
        val npos = if (cnt == 0) 0L else rnd.nextInt(cnt.toInt + 1).toLong
        val nneg = cnt - npos
        // lsum is a sum of g·(base + (m+1)/2) terms — any half-integer
        val lsum = rnd.nextInt(1000) / 2.0
        (pid, cnt, npos, nneg, lsum)
      }
      // reference: the sequential pid-ordered fold
      var offset = 0L; var srpRef = 0.0
      parts.foreach { case (_, cnt, npos, _, lsum) =>
        srpRef += lsum + offset.toDouble * npos
        offset += cnt
      }
      // segment insertion in a random order must reproduce it exactly
      val shuffled = rnd.shuffle(parts.toList)
      val segs = shuffled.foldLeft(List.empty[Classify.AucSeg]) { (acc, e) =>
        Classify.insertAucSeg(acc,
          Classify.AucSeg(e._1, e._1, e._2, e._3, e._4, e._5))
      }
      assert(segs.size == 1, s"contiguous pids must merge to one segment: $segs")
      assert(segs.head.srp == srpRef, "exact half-integer arithmetic")
      assert(segs.head.cnt == parts.map(_._2).sum)
      assert(segs.head.npos == parts.map(_._3).sum)
      // with a gap the pieces stay separate and the driver fold bridges it
      val gappy = parts.filter(_._1 != p / 2)
      val segs2 = rnd.shuffle(gappy.toList)
        .foldLeft(List.empty[Classify.AucSeg]) { (acc, e) =>
          Classify.insertAucSeg(acc,
            Classify.AucSeg(e._1, e._1, e._2, e._3, e._4, e._5))
        }
      assert(segs2.size == (if (p >= 3 && p / 2 > 0 && p / 2 < p - 1) 2 else 1)
        || gappy.isEmpty, s"gap must split segments: $segs2")
      assert(segs2.map(_.start).sorted == segs2.map(_.start),
        "list stays sorted")
    }
  }
}
