package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Embeddings, Similarity}

class EmbeddingsSpec extends SparkSpec {

  private lazy val emb = sf("embeddings")

  test("l2Normalize yields unit vectors; zero vectors pass through") {
    import spark.implicits._
    val norms = emb.limit(50)
      .select(Embeddings.l2Normalize(col("embedding")).alias("n"))
      .select(sqrt(aggregate(col("n"), lit(0.0),
        (a, x) => a + x.cast("double") * x.cast("double"))).alias("len"))
      .collect().map(_.getDouble(0))
    norms.foreach(l => assert(math.abs(l - 1.0) < 1e-5, l.toString))
    val z = Seq((1L, Seq(0f, 0f, 0f))).toDF("id", "v")
      .select(Embeddings.l2Normalize(col("v")).alias("n"))
      .head().getSeq[Float](0)
    assert(z == Seq(0f, 0f, 0f))
  }

  test("SQ8 round-trip error is bounded by half a quantization step") {
    val q = Embeddings.scalarQuantize(emb.limit(100), "embedding")
    val err = q.select(aggregate(
      zip_with(col("embedding"),
        Embeddings.dequantize(col("codes"), col("q_min"), col("q_max")),
        (x, d) => abs(x.cast("double") - d.cast("double"))),
      lit(0.0), (a, e) => greatest(a, e)).alias("maxerr"),
      ((col("q_max") - col("q_min")) / 255.0 / 2.0 + 1e-7).alias("halfstep"))
    assert(err.filter(col("maxerr") > col("halfstep")).count() == 0)
    // codes stay in [0, 255]
    val rng = q.select(array_min(col("codes")).alias("lo"),
      array_max(col("codes")).alias("hi"))
    assert(rng.filter(col("lo") < 0 || col("hi") > 255).count() == 0)
  }

  test("constant vectors quantize to all-zero codes") {
    import spark.implicits._
    val q = Embeddings.scalarQuantize(
      Seq((1L, Seq(0.5f, 0.5f, 0.5f))).toDF("id", "v"), "v")
    assert(q.select("codes").head().getSeq[Int](0) == Seq(0, 0, 0))
  }

  test("random projection is deterministic, seed-sensitive, k-dimensional") {
    val p1 = emb.limit(10).select(col("vec_id"),
      Embeddings.randomProject(col("embedding"), 16).alias("p"))
    assert(p1.select(size(col("p"))).head().getInt(0) == 16)
    val again = emb.limit(10).select(col("vec_id"),
      Embeddings.randomProject(col("embedding"), 16).alias("p"))
    assert(p1.collect().map(_.toString).toSeq ==
      again.collect().map(_.toString).toSeq)
    val other = emb.limit(10).select(col("vec_id"),
      Embeddings.randomProject(col("embedding"), 16, seed = 7L).alias("p"))
    assert(p1.collect().map(_.toString).toSeq !=
      other.collect().map(_.toString).toSeq)
  }

  test("chunkDocs windows with overlap; short and empty docs chunk once") {
    import spark.implicits._
    val d = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b"),                                    // shorter than chunk
      (3L, "")                                        // empty
    ).toDF("id", "text")
    val got = graft.pipeline.TextAnalysis.chunkDocs(d, "id", "text",
      chunkTokens = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3)))).toMap
    // stride 3: chunks at 0,3,6 cover tokens 1-4, 4-7, 7-10
    assert(got((1L, 0L)) == (("t1 t2 t3 t4", 4L)))
    assert(got((1L, 1L)) == (("t4 t5 t6 t7", 4L)))
    assert(got((1L, 2L)) == (("t7 t8 t9 t10", 4L)))
    assert(!got.contains((1L, 3L)))
    assert(got((2L, 0L)) == (("a b", 2L)))
    assert(got((3L, 0L)) == (("", 1L))) // the empty token, like tokenCount
    // chunking is narrow: no shuffle
    val plan = graft.pipeline.TextAnalysis.chunkDocs(d, "id", "text", 4, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("meanPool averages element-wise per group in dimension order") {
    import spark.implicits._
    val d = Seq(
      ("a", Seq(1.0f, 2.0f, 3.0f)),
      ("a", Seq(3.0f, 0.0f, 1.0f)),
      ("b", Seq(10.0f, 20.0f, 30.0f))
    ).toDF("g", "v")
    val got = graft.pipeline.Embeddings.meanPool(d, Seq("g"), "v")
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got("a") == Seq(2.0, 1.0, 2.0))
    assert(got("b") == Seq(10.0, 20.0, 30.0))
  }

  test("SQ8-compressed search preserves brute-force top-k recall") {
    val q = emb.filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0)
    val exact = Similarity.bruteForceTopK(emb, "embedding", "vec_id", q, 10)
      .collect().map(_.getLong(0)).toSet
    val dequant = Embeddings.scalarQuantize(emb, "embedding")
      .withColumn("embedding",
        Embeddings.dequantize(col("codes"), col("q_min"), col("q_max")))
    val compressed = Similarity.bruteForceTopK(dequant, "embedding", "vec_id", q, 10)
      .collect().map(_.getLong(0)).toSet
    assert(exact.intersect(compressed).size >= 8,
      s"overlap ${exact.intersect(compressed).size}: $exact vs $compressed")
  }

  test("sq8TopK: int-code scan + exact re-rank matches brute force; scan never reads floats for scoring") {
    val q = emb.filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0)
    val quant = Embeddings.scalarQuantize(emb, "embedding")
    val got = Similarity.sq8TopK(quant, "embedding", "vec_id", q, k = 10,
      shortlist = 100)
    // exact re-rank over a 100-shortlist on this corpus recovers the
    // exact top-10 and its exact scores
    val exact = Similarity.bruteForceTopK(emb, "embedding", "vec_id", q, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      == exact)
    // decomposition identity check: approx score equals the dot of the
    // dequantized vector on a sample row
    val row = quant.filter(col("vec_id") === 7L).head()
    val codes = row.getSeq[Int](row.fieldIndex("codes"))
    val (mn, mx) = (row.getDouble(row.fieldIndex("q_min")),
      row.getDouble(row.fieldIndex("q_max")))
    val sumQ = q.map(_.toDouble).sum
    val dotCodes = codes.zip(q).map { case (c, x) => c * x.toDouble }.sum
    val viaDecomp = mn * sumQ + (mx - mn) / 255.0 * dotCodes
    val direct = codes.zip(q).map { case (c, x) =>
      (mn + c * (mx - mn) / 255.0) * x }.sum
    assert(math.abs(viaDecomp - direct) < 1e-9)
  }

  test("projection approximately preserves cosine structure") {
    // JL with k=32 on d=64: per-pair cosine error concentrates around
    // 1/sqrt(k) ≈ 0.18; assert a loose deterministic bound on fixed pairs
    val both = emb.filter(col("vec_id").isin(0L, 1L, 7L, 42L))
      .select(col("vec_id"), col("embedding"),
        Embeddings.randomProject(col("embedding"), 32).alias("proj"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Float](1), r.getSeq[Float](2)))).toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    for (Seq(i, j) <- Seq(Seq(0L, 1L), Seq(0L, 7L), Seq(7L, 42L), Seq(1L, 42L))) {
      val orig = cos(both(i)._1, both(j)._1)
      val proj = cos(both(i)._2, both(j)._2)
      assert(math.abs(orig - proj) < 0.45, s"($i,$j): $orig vs $proj")
    }
  }

  test("PCA: one-pass fit finds the variance axes; subspace data projects losslessly") {
    import spark.implicits._
    // 3-D points confined to the span of (1,1,0) and (0,0,1): PCA-2
    // must recover that plane, so pairwise L2 distances survive exactly
    val pts = Seq(
      (0.0, 0.0, 0.0), (1.0, 1.0, 0.0), (2.0, 2.0, 1.0),
      (3.0, 3.0, -1.0), (-1.0, -1.0, 2.0), (0.5, 0.5, -2.0))
    val df = pts.map { case (x, y, z) =>
      Tuple1(Array(x.toFloat, y.toFloat, z.toFloat)) }.toDF("embedding")
    val m = Embeddings.fitPca(df, "embedding", k = 2)
    // components are orthonormal
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (p, q) => p * q }.sum
    assert(math.abs(dot(m.components(0), m.components(0)) - 1.0) < 1e-9)
    assert(math.abs(dot(m.components(1), m.components(1)) - 1.0) < 1e-9)
    assert(math.abs(dot(m.components(0), m.components(1))) < 1e-9)
    // explained variance is descending and exhausts the total (the third
    // eigenvalue is 0: the data has no variance off the plane)
    assert(m.explained(0) >= m.explained(1) && m.explained(1) > 0)
    val proj = df.select(Embeddings.applyPca(col("embedding"), m))
      .collect().map(_.getSeq[Float](0).toArray.map(_.toDouble))
    def l2(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.zip(b).map { case (p, q) => (p - q) * (p - q) }.sum)
    val orig = pts.map { case (x, y, z) => Array(x, y, z) }
    for (i <- pts.indices; j <- (i + 1) until pts.size) {
      assert(math.abs(l2(orig(i), orig(j)) - l2(proj(i), proj(j))) < 1e-4,
        s"distance distorted for pair ($i,$j)")
    }
    // fit is partition-count independent (bounded partial combine is
    // ordered by partition id, and the maths is associative here)
    val m2 = Embeddings.fitPca(df.repartition(5), "embedding", k = 2)
    assert(m.explained.zip(m2.explained)
      .forall { case (a, b) => math.abs(a - b) < 1e-9 })
    // real corpus: PCA-32 beats the JL projection it complements — mean
    // absolute cosine distortion over a fixed probe set must not be worse
    val probe = emb.filter(col("vec_id") < 30)
    val pm = Embeddings.fitPca(emb, "embedding", k = 32)
    val rows = probe.select(col("embedding"),
        Embeddings.applyPca(col("embedding"), pm).alias("p"),
        Embeddings.randomProject(col("embedding"), 32).alias("r"))
      .collect().map(r => (r.getSeq[Float](0).toArray,
        r.getSeq[Float](1).toArray, r.getSeq[Float](2).toArray))
    def cosF(a: Array[Float], b: Array[Float]): Double = {
      var (d0, na, nb) = (0.0, 0.0, 0.0)
      for (i <- a.indices) { d0 += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      if (na == 0 || nb == 0) 0.0 else d0 / math.sqrt(na * nb)
    }
    var (errP, errR, nPairs) = (0.0, 0.0, 0)
    for (i <- rows.indices; j <- (i + 1) until rows.length) {
      val o = cosF(rows(i)._1, rows(j)._1)
      errP += math.abs(o - cosF(rows(i)._2, rows(j)._2))
      errR += math.abs(o - cosF(rows(i)._3, rows(j)._3))
      nPairs += 1
    }
    assert(errP / nPairs <= errR / nPairs + 1e-6,
      s"PCA distortion ${errP / nPairs} vs JL ${errR / nPairs}")
    // persistence round-trip: reloaded model projects bit-identically
    val dir = java.nio.file.Files.createTempDirectory("graft_pca").toString
    Embeddings.writePcaModel(pm, dir, spark)
    val back = Embeddings.readPcaModel(spark, dir)
    val p1 = probe.select(Embeddings.applyPca(col("embedding"), pm))
      .collect().map(_.getSeq[Float](0))
    val p2 = probe.select(Embeddings.applyPca(col("embedding"), back))
      .collect().map(_.getSeq[Float](0))
    assert(p1.zip(p2).forall { case (a, b) => a == b })
  }

  test("OPQ-lite: balanced PCA rotation does not degrade PQ quantization error") {
    import graft.pipeline.Clustering
    // greedy balance on [8,4,2,1], m=2: products 8·1 vs 4·2 — equal
    val ord = Embeddings.balancedOrder(Seq(8.0, 4.0, 2.0, 1.0), m = 2)
    assert(ord == Seq(0, 3, 1, 2), s"got $ord")
    assert(ord.sorted == Seq(0, 1, 2, 3)) // a permutation, nothing lost
    // end-to-end on the real corpus: rotate (full-d PCA), permute to
    // balanced subspaces, quantize — total squared reconstruction error
    // must not exceed the raw-space PQ's (rotation is orthonormal, so
    // errors are comparable in one space)
    val m = 8
    val pca = Embeddings.fitPca(emb, "embedding", k = 64)
    val rotated = emb.select(col("vec_id"),
      Embeddings.reorderDims(
        Embeddings.applyPca(col("embedding"), pca),
        Embeddings.balancedOrder(pca.explained.toIndexedSeq, m))
        .alias("embedding"))
    def pqMse(df: org.apache.spark.sql.DataFrame): Double = {
      val model = Clustering.fitPQ(df, "embedding", "vec_id", m = m, k = 16)
      val rows = Clustering.assignPQ(df, "embedding", model)
        .select("embedding", "pq_code").limit(200).collect()
      rows.map { r =>
        val v = r.getSeq[Float](0)
        val codes = r.getSeq[Int](1)
        (0 until m).map { s =>
          val cb = model.codebooks(s)(codes(s))
          (0 until model.dSub).map { j =>
            val d0 = v(s * model.dSub + j) - cb(j); d0 * d0
          }.sum.toDouble
        }.sum
      }.sum / rows.length
    }
    val rawErr = pqMse(emb.select("vec_id", "embedding"))
    val rotErr = pqMse(rotated)
    assert(rotErr <= rawErr * 1.05,
      s"balanced-rotated PQ error $rotErr vs raw $rawErr")
  }

  test("centroidDrift: aligned slices cos 1, opposed slices cos -1") {
    import spark.implicits._
    // slice a and b share a centroid direction; slice c points opposite
    val d = Seq(
      ("a", Array(1f, 0f)), ("a", Array(3f, 0f)),
      ("b", Array(2f, 0f)),
      ("c", Array(-1f, 0f)), ("c", Array(-5f, 0f))).toDF("s", "v")
    val got = graft.pipeline.Embeddings.centroidDrift(d, "s", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(got(("a", "b")) == 1.0)
    assert(got(("a", "c")) == -1.0)
    assert(got(("b", "c")) == -1.0)
    assert(got.size == 3)
  }
}
