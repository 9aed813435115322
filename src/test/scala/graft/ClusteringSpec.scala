package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Clustering, Similarity}

/** Spherical k-means + semantic-dedup correctness: separation on planted
  * direction clusters, determinism, bounded convergence, and the
  * cluster-then-dedup recall path on planted near-identical vectors. */
class ClusteringSpec extends SparkSpec {

  /** 60 vectors in three orthogonal direction groups with small seeded
    * jitter — group g = ids [g*100, g*100+19]. */
  private def directionData() = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val bases = Seq(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f), Array(0f, 0f, 1f, 0f))
    val rows = for (g <- 0 until 3; i <- 0 until 20) yield (
      g * 100L + i,
      bases(g).map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f).toSeq)
    rows.toDF("vec_id", "embedding")
  }

  test("kmeans separates direction clusters (with restart), deterministically") {
    val df = directionData()
    // k-means is init-sensitive (a seed can drop two inits into one
    // group); restarts over a handful of seeds are standard practice.
    // Everything is deterministic, so the winning seed never changes.
    val perfect = (1L to 6L).find { seed =>
      val model = Clustering.fitKMeans(df, "embedding", "vec_id", k = 3,
        maxIter = 8, seed = seed)
      val assigned = Clustering.assign(df, "embedding", model)
      val purity = assigned
        .select((col("vec_id") / 100).cast("int").alias("g"), col("cluster"))
        .groupBy("g").agg(countDistinct(col("cluster")).alias("nc"))
        .collect()
      purity.length == 3 && purity.forall(_.getLong(1) == 1L) &&
        assigned.select("cluster").distinct().count() == 3
    }
    assert(perfect.nonEmpty, "no seed in 1..6 separated 3 orthogonal groups")
    // determinism: same seed, same model
    val m1 = Clustering.fitKMeans(df, "embedding", "vec_id", k = 3, seed = perfect.get)
    val m2 = Clustering.fitKMeans(df, "embedding", "vec_id", k = 3, seed = perfect.get)
    assert(m1.centroids == m2.centroids && m1.iterations == m2.iterations)
    // convergence: the early-exit fired (shift under tol) within maxIter
    assert(m1.shift <= 1e-6 || m1.iterations == 8)
  }

  test("assignment is argmax-cosine against the model centroids") {
    val df = directionData()
    val model = Clustering.fitKMeans(df, "embedding", "vec_id", k = 3, maxIter = 4)
    val assigned = Clustering.assign(df, "embedding", model)
    val withSims = model.centroids.zipWithIndex.foldLeft(assigned) {
      case (d, (c, i)) => d.withColumn(s"s$i",
        Similarity.cosine(col("embedding"), array(c.map(lit): _*)))
    }
    // verify per-row: the assigned cell's similarity is the max
    val rows = withSims.collect()
    val simIdx = model.centroids.indices.map(i => withSims.schema.fieldIndex(s"s$i"))
    val cellIdx = withSims.schema.fieldIndex("cluster")
    rows.foreach { r =>
      val sims = simIdx.map(r.getDouble)
      assert(sims(r.getInt(cellIdx)) >= sims.max - 1e-12)
    }
  }

  test("assignment is a map-side pass: no exchange in the assign plan") {
    val df = directionData()
    val model = Clustering.fitKMeans(df, "embedding", "vec_id", k = 3, maxIter = 2)
    val plan = Clustering.assign(df, "embedding", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"assign must not shuffle (centroids ride in the expression):\n$plan")
  }

  test("kmeans IVF search reaches brute-force recall on the sf corpus") {
    val emb = sf("embeddings")
    val model = Clustering.fitKMeans(emb, "embedding", "vec_id", k = 8, maxIter = 4)
    val ivf = Clustering.buildIvf(emb, "embedding", model)
    // plan shape: scan -> filter -> TakeOrdered, no exchange before top-k
    // and no join (the probe cells were chosen driver-side)
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    val top = Clustering.ivfTopK(ivf, "embedding", "vec_id", q, model,
      k = 10, nProbe = 3)
    val plan = top.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"kmeans IVF probe must be join-free:\n$plan")
    val approx = top.collect().map(_.getLong(0)).toSet
    assert(approx.contains(0L), "self-match must be found")
    val brute = Similarity.bruteForceTopK(emb, "embedding", "vec_id", q, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert((approx & brute).size >= 8, s"recall@10 too low: ${(approx & brute).size}")
  }

  test("model round-trip: persisted centroids reload bit-exact, IVF search works on a reloaded corpus") {
    val emb = sf("embeddings")
    val model = Clustering.fitKMeans(emb, "embedding", "vec_id", k = 8, maxIter = 4)
    val tmp = java.nio.file.Files.createTempDirectory("graft_km_spec").toString
    Clustering.writeKMeansModel(model, s"$tmp/model", spark)
    val re = Clustering.readKMeansModel(spark, s"$tmp/model")
    // bit-exact round trip: centroids, iteration count, final shift
    assert(re.centroids == model.centroids)
    assert(re.iterations == model.iterations && re.shift == model.shift)
    // the assigned IVF corpus persists as plain parquet; a reloaded
    // corpus + reloaded model serve search with no refit/reassignment
    Clustering.buildIvf(emb, "embedding", model)
      .write.mode("overwrite").parquet(s"$tmp/corpus")
    val corpus = spark.read.parquet(s"$tmp/corpus")
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    val fresh = Clustering.ivfTopK(
      Clustering.buildIvf(emb, "embedding", model), "embedding", "vec_id",
      q, model, k = 10, nProbe = 3).collect().map(_.getLong(0)).toSeq
    val reloaded = Clustering.ivfTopK(corpus, "embedding", "vec_id",
      q, re, k = 10, nProbe = 3).collect().map(_.getLong(0)).toSeq
    assert(reloaded == fresh, "reloaded model+corpus must reproduce the search")
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(tmp))
    try walk.sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
    finally walk.close()
  }

  test("large centroid tables (k=1024) take the broadcast path, same assignment") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // 1024 centroids × 64 dims = 65536 floats > InlineCentroidLimit (2^15)
    val centroids = IndexedSeq.tabulate(1024)(_ =>
      Seq.fill(64)(rnd.nextFloat() * 2f - 1f))
    assert(centroids.iterator.map(_.length.toLong).sum >
      Clustering.InlineCentroidLimit)
    val big = Clustering.KMeansModel(centroids, 1, 0.0)
    // range source (not a LocalRelation — the optimizer would eagerly
    // fold a local Seq and leave no plan to inspect)
    val data = spark.range(0, 200).select(col("id").alias("vec_id"),
      transform(sequence(lit(0), lit(63)),
        i => (pmod(xxhash64(col("id"), i), lit(1000)).cast("float") / 500f)
          - 1f).cast("array<float>").alias("embedding"))
    val viaBc = Clustering.assign(data, "embedding", big)
    // the plan carries the broadcast HANDLE, not the embedded table
    val plan = viaBc.queryExecution.executedPlan.toString
    assert(plan.contains("graft_nearest_centroid_bc"),
      s"expected the broadcast expression at k=1024:\n$plan")
    assert(!plan.contains("Exchange"), "assignment must stay map-side")
    // identical assignment to the inline expression (same arithmetic)
    val inline = data.withColumn("cluster",
      org.apache.spark.sql.graft.sketch.nearest_centroid(
        col("embedding"), centroids))
    val got = viaBc.select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = inline.select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == want)
    // a small model still takes the inline path (no broadcast churn)
    val small = Clustering.KMeansModel(centroids.take(4), 1, 0.0)
    val smallPlan = Clustering.assign(data, "embedding", small)
      .queryExecution.executedPlan.toString
    assert(smallPlan.contains("graft_nearest_centroid") &&
      !smallPlan.contains("graft_nearest_centroid_bc"))
  }

  test("PQ: codes are deterministic, ADC+rerank recovers neighbors, plan is map-side") {
    val emb = sf("embeddings")
    val model = Clustering.fitPQ(emb, "embedding", "vec_id", m = 16, k = 16,
      maxIter = 4)
    assert(model.m == 16 && model.dSub == 4)
    assert(model.codebooks.forall(_.forall(_.length == 4)))
    // deterministic: same data + seed → same codebooks and codes
    val model2 = Clustering.fitPQ(emb, "embedding", "vec_id", m = 16, k = 16,
      maxIter = 4)
    assert(model.codebooks == model2.codebooks)
    val codes = Clustering.assignPQ(emb, "embedding", model)
      .select("vec_id", "pq_code")
    // encoding is a map-side pass (codebooks ride in the expressions)
    val encPlan = codes.queryExecution.executedPlan.toString
    assert(!encPlan.contains("Exchange"), s"assignPQ must not shuffle:\n$encPlan")
    // every code is a valid codebook index
    val flat = codes.select(explode(col("pq_code")).alias("c"))
      .agg(min("c"), max("c")).head()
    assert(flat.getInt(0) >= 0 && flat.getInt(1) < 16)
    // raw ADC search: scan → project → TakeOrdered, join-free; the
    // self-match must surface despite 64-bit quantization
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    val top = Clustering.pqTopK(codes, "vec_id", model, q, k = 10)
    val searchPlan = top.queryExecution.executedPlan.toString
    assert(!searchPlan.contains("Join"), s"ADC must be join-free:\n$searchPlan")
    assert(searchPlan.contains("TakeOrderedAndProject"),
      s"ADC top-k must TakeOrdered:\n$searchPlan")
    val got = top.collect().map(_.getLong(0))
    assert(got.contains(0L), "self-match must be in the ADC top-10")
    // shortlist + exact re-rank (the production shape): near-exact
    // recall where raw ADC cannot separate near-tied scores
    val brute = Similarity.bruteForceTopK(emb, "embedding", "vec_id", q, k = 10)
      .collect().map(_.getLong(0)).toSet
    val rr = Clustering.pqTopKRerank(codes, emb, "embedding", "vec_id",
      model, q, k = 10, shortlist = 100)
    val rrPlan = rr.queryExecution.executedPlan.toString
    assert(rrPlan.contains("BroadcastHashJoin"),
      s"rerank must broadcast the shortlist:\n$rrPlan")
    val rrIds = rr.collect().map(_.getLong(0)).toSet
    assert((rrIds & brute).size >= 8,
      s"rerank recall@10 too low: ${(rrIds & brute).size}")
    // codebook round-trip: persisted model reloads bit-exact
    val tmp = java.nio.file.Files.createTempDirectory("graft_pq_spec").toString
    Clustering.writePQModel(model, tmp, spark)
    val re = Clustering.readPQModel(spark, tmp)
    assert(re.codebooks == model.codebooks && re.dSub == model.dSub)
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(tmp))
    try walk.sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
    finally walk.close()
  }

  test("IVF-PQ: probed-cell ADC + rerank reaches brute-force recall") {
    val emb = sf("embeddings")
    val coarse = Clustering.fitKMeans(emb, "embedding", "vec_id", k = 8,
      maxIter = 4)
    val pq = Clustering.fitPQ(emb, "embedding", "vec_id", m = 16, k = 16,
      maxIter = 4)
    val corpus = Clustering.buildIvfPq(emb, "embedding", coarse, pq)
    // the combined layout is one map-side projection: no exchange
    val buildPlan = corpus.queryExecution.executedPlan.toString
    assert(!buildPlan.contains("Exchange"), s"buildIvfPq must not shuffle:\n$buildPlan")
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    val got = Clustering.ivfPqTopK(corpus, "embedding", "vec_id", coarse, pq,
      q, k = 10, nProbe = 4, shortlist = 100)
      .collect().map(_.getLong(0)).toSet
    assert(got.contains(0L), "self-match must surface")
    val brute = Similarity.bruteForceTopK(emb, "embedding", "vec_id", q, k = 10)
      .collect().map(_.getLong(0)).toSet
    // recall is bounded by cell pruning (nProbe=4 of 8 cells) + PQ; on
    // this corpus the probed cells hold most true neighbors
    assert((got & brute).size >= 7, s"IVF-PQ recall@10: ${(got & brute).size}")
  }

  test("residual IVF-PQ: residual codes + const-corrected ADC reach brute-force recall") {
    val emb = sf("embeddings")
    val coarse = Clustering.fitKMeans(emb, "embedding", "vec_id", k = 8,
      maxIter = 4)
    val pq = Clustering.fitResidualPQ(emb, "embedding", "vec_id", coarse,
      m = 16, k = 16, maxIter = 4)
    val corpus = Clustering.buildIvfPqResidual(emb, "embedding", coarse, pq)
    // residual encode is still one map-side projection: no exchange
    val buildPlan = corpus.queryExecution.executedPlan.toString
    assert(!buildPlan.contains("Exchange"),
      s"buildIvfPqResidual must not shuffle:\n$buildPlan")
    // the residual expression is exact arithmetic: x − centroid[cell]
    val sample = Clustering.assign(emb, "embedding", coarse, "ivf_cell")
      .withColumn("res", org.apache.spark.sql.graft.sketch
        .centroid_residual(col("embedding"), col("ivf_cell"),
          coarse.centroids))
      .select("embedding", "ivf_cell", "res").head()
    val (v, cell, res) = (sample.getSeq[Float](0), sample.getInt(1),
      sample.getSeq[Float](2))
    v.indices.foreach { i =>
      assert(math.abs(res(i) - (v(i) - coarse.centroids(cell)(i))) < 1e-6f)
    }
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    val got = Clustering.ivfPqResidualTopK(corpus, "embedding", "vec_id",
      coarse, pq, q, k = 10, nProbe = 4, shortlist = 100)
      .collect().map(_.getLong(0)).toSet
    assert(got.contains(0L), "self-match must surface")
    val brute = Similarity.bruteForceTopK(emb, "embedding", "vec_id", q, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert((got & brute).size >= 7, s"residual IVF-PQ recall@10: ${(got & brute).size}")
  }

  test("knnJoin: per-query top-k in one pass; exact at full probe; corpus never shuffles") {
    val emb = sf("embeddings")
    val coarse = Clustering.fitKMeans(emb, "embedding", "vec_id", k = 8,
      maxIter = 4)
    val corpus = Clustering.assign(emb, "embedding", coarse, "ivf_cell")
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").alias("q_id"), col("embedding").alias("q_vec"))
    // nProbe = all cells → no pruning → must equal per-query brute force
    val full = Clustering.knnJoin(corpus, queries, "embedding", "vec_id",
      "q_id", "q_vec", coarse, k = 5, nProbe = 8)
    val got = full.collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    (0L until 3L).foreach { qid =>
      val q = emb.filter(col("vec_id") === qid)
        .select("embedding").head().getSeq[Float](0)
      val brute = Similarity.bruteForceTopK(emb, "embedding", "vec_id", q, 5)
        .collect().map(_.getLong(0)).toSeq
      val mine = (1 to 5).map(rn => got((qid, rn)))
      assert(mine == brute, s"q$qid: $mine vs $brute")
    }
    // pruned probe keeps recall on the self-neighborhood
    val pruned = Clustering.knnJoin(corpus, queries, "embedding", "vec_id",
      "q_id", "q_vec", coarse, k = 5, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 3L).foreach(qid =>
      assert(pruned.contains((qid, qid)), s"self-match lost for q$qid"))
    // plan shape: the corpus reaches the join without an exchange
    // (broadcast query side); the only exchange keys candidate rows by
    // query id for the window
    // AdaptiveSparkPlan.toString prints Final AND Initial sections —
    // count only the final one
    val plan = full.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 candidate exchange, got $exchanges:\n$plan")
    assert(plan.contains("hashpartitioning(q_id"),
      s"exchange not keyed by query id:\n$plan")
    // Spark 4's rank-limit pushdown prunes candidates to k per query
    // BEFORE the exchange — the candidate shuffle carries ≤ k·|queries|
    // rows, not the joined volume
    assert(plan.contains("WindowGroupLimit"), s"no group-limit pushdown:\n$plan")
  }

  test("cell-partitioned corpus serves probes via partition pruning, no row lost") {
    val emb = sf("embeddings")
    val coarse = Clustering.fitKMeans(emb, "embedding", "vec_id", k = 8,
      maxIter = 4)
    val corpus = Clustering.assign(emb, "embedding", coarse, "ivf_cell")
      .select(col("vec_id"), col("ivf_cell"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfp_spec")
    try {
      Clustering.writeIvfPartitioned(corpus, s"$tmp/c")
      val back = spark.read.parquet(s"$tmp/c")
      val pruned = back.filter(col("ivf_cell").isin(0, 1))
      // the probe filter must land in the scan's PARTITION filters —
      // directory-level pruning, not a post-read row filter
      val scan = pruned.queryExecution.executedPlan.toString
      val pf = scan.linesIterator.find(_.contains("PartitionFilters"))
      assert(pf.exists(_.contains("ivf_cell")),
        s"probe filter not a partition filter:\n$scan")
      // pruning loses nothing: row parity with the pre-write corpus
      val expect = corpus.filter(col("ivf_cell").isin(0, 1)).count()
      assert(pruned.count() == expect)
      // and the scan opens strictly fewer files than the full corpus
      val totalFiles = back.select(input_file_name()).distinct().count()
      val prunedFiles = pruned.select(input_file_name()).distinct().count()
      assert(prunedFiles < totalFiles,
        s"no file-level pruning: $prunedFiles of $totalFiles")
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(tmp)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  test("appendIvfPartitioned grows the store batch-proportionally, search intact") {
    import spark.implicits._
    val emb = sf("embeddings")
    val coarse = Clustering.fitKMeans(emb, "embedding", "vec_id", k = 8,
      maxIter = 4)
    val base = Clustering.assign(emb, "embedding", coarse, "ivf_cell")
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfa_spec")
    try {
      Clustering.writeIvfPartitioned(base, s"$tmp/c")
      val filesBefore = spark.read.parquet(s"$tmp/c")
        .select(input_file_name()).distinct().collect()
        .map(_.getString(0)).toSet
      // new batch: clones of vec_id 0..4 under fresh ids
      val batch = emb.filter(col("vec_id") < 5)
        .withColumn("vec_id", col("vec_id") + 100000L)
      Clustering.appendIvfPartitioned(batch, "embedding", coarse, s"$tmp/c")
      val back = spark.read.parquet(s"$tmp/c")
      // every base row and every batch row present, exactly once
      assert(back.count() == emb.count() + 5)
      assert(back.filter(col("vec_id") >= 100000L).count() == 5)
      // appended rows sit in the SAME cell their clone source occupies —
      // assignment used the standing model, not a refit
      val cellOf = Clustering.assign(emb.filter(col("vec_id") < 5),
        "embedding", coarse, "ivf_cell")
        .select("vec_id", "ivf_cell").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      back.filter(col("vec_id") >= 100000L)
        .select("vec_id", "ivf_cell").collect()
        .foreach(r => assert(r.getInt(1) == cellOf(r.getLong(0) - 100000L)))
      // the standing files were not rewritten: old files all survive,
      // new files only added
      val filesAfter = back.select(input_file_name()).distinct().collect()
        .map(_.getString(0)).toSet
      assert(filesBefore.subsetOf(filesAfter),
        "append rewrote standing files")
      assert(filesAfter.size > filesBefore.size)
      // probe search over the grown store finds the appended clone first
      val qv = emb.filter(col("vec_id") === 2).select("embedding")
        .head().getSeq[Float](0)
      val top = Clustering.ivfTopK(back, "embedding", "vec_id", qv,
        coarse, k = 2, nProbe = 2)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(top == Set(2L, 100002L), top.toString)
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(tmp)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  test("semantic dedup catches planted near-identical vectors, keeps the rest") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val base = (0L until 40L).map(id =>
      (id, Array.fill(8)(rnd.nextFloat() * 2f - 1f).toSeq))
    // five planted clones: +0.001 on every component of ids 0..4
    val clones = base.take(5).map { case (id, v) =>
      (id + 1000L, v.map(x => x + 0.001f)) }
    val df = (base ++ clones).toDF("vec_id", "embedding")
    val pairs = Clustering.semanticDupPairs(df, "embedding", "vec_id",
      k = 4, threshold = 0.999)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (0L until 5L).map(id => (id, id + 1000L)).toSet)
    val kept = Clustering.semanticDedup(df, "embedding", "vec_id",
      k = 4, threshold = 0.999)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == (0L until 40L).toSet)
  }

  test("hardNegatives: top-k among label-mismatched only, exact at full probe") {
    val emb = sf("embeddings")
    val coarse = Clustering.fitKMeans(emb, "embedding", "vec_id", k = 8,
      maxIter = 4)
    val corpus = Clustering.assign(emb, "embedding", coarse, "ivf_cell")
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").alias("q_id"), col("embedding").alias("q_vec"),
        col("label").alias("q_label"))
    val got = Clustering.hardNegatives(corpus, queries, "embedding",
      "vec_id", "label", "q_id", "q_vec", "q_label", coarse,
      k = 5, nProbe = 8).collect()
    val qLabels = emb.filter(col("vec_id") < 3)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label"))
      .toMap
    // every returned negative carries a different label than its query
    got.foreach(r =>
      assert(r.getInt(2) != qLabels(r.getLong(0)),
        s"same-label row leaked: $r"))
    // exactness: equals brute force restricted to label-mismatched rows
    (0L until 3L).foreach { qid =>
      val q = emb.filter(col("vec_id") === qid)
        .select("embedding").head().getSeq[Float](0)
      val brute = Similarity.bruteForceTopK(
        emb.filter(col("label") =!= qLabels(qid)),
        "embedding", "vec_id", q, 5)
        .collect().map(_.getLong(0)).toSeq
      val mine = got.filter(_.getLong(0) == qid).sortBy(_.getInt(4))
        .map(_.getLong(1)).toSeq
      assert(mine == brute, s"q$qid: $mine vs $brute")
    }
  }
  test("buildIvf fit memo: unchanged corpus reuses the fitted model; " +
      "results identical; opt-out bypasses (r12 q_ivf_topk amortization)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfmemo")
    try {
      val emb = (0 until 600).map { i =>
        (i.toLong, (0 until 8).map(j =>
          ((i * 31 + j * 17) % 97 / 97.0f) - 0.5f))
      }
      emb.toDF("vec_id", "embedding").write.mode("overwrite")
        .parquet(s"$dir/emb.parquet")
      def read() = spark.read.parquet(s"$dir/emb.parquet")
      val q = emb.head._2
      val m0 = Similarity.ivfFitCacheMisses.get()
      val i1 = Similarity.buildIvf(read(), "embedding", "vec_id")
      assert(Similarity.ivfFitCacheMisses.get() == m0 + 1)
      val h0 = Similarity.ivfFitCacheHits.get()
      val i2 = Similarity.buildIvf(read(), "embedding", "vec_id")
      assert(Similarity.ivfFitCacheHits.get() == h0 + 1,
        "second build over an unchanged corpus must reuse the fit")
      assert(i2.model eq i1.model, "cached model should be the same instance")
      def top(ix: Similarity.IvfIndex) =
        Similarity.ivfTopK(ix, "embedding", "vec_id", q, k = 5, nProbe = 2)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(top(i2) == top(i1))
      // a different dial is a different key, not a stale hit
      val mA = Similarity.ivfFitCacheMisses.get()
      Similarity.buildIvf(read(), "embedding", "vec_id", nCentroids = 4)
      assert(Similarity.ivfFitCacheMisses.get() == mA + 1)
      // rewriting the file invalidates the memo (fingerprint changes)
      emb.map { case (id, v) => (id, v.map(_ + 1.0f)) }.toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(s"$dir/emb.parquet")
      val mB = Similarity.ivfFitCacheMisses.get()
      Similarity.buildIvf(read(), "embedding", "vec_id")
      assert(Similarity.ivfFitCacheMisses.get() == mB + 1,
        "overwritten corpus must refit, not serve the stale model")
      // opt-out: no counter movement, fresh fit every call
      spark.conf.set("spark.graft.ann.fitCache", "false")
      try {
        val h1 = Similarity.ivfFitCacheHits.get()
        val m1 = Similarity.ivfFitCacheMisses.get()
        val i3 = Similarity.buildIvf(read(), "embedding", "vec_id")
        assert(Similarity.ivfFitCacheHits.get() == h1)
        assert(Similarity.ivfFitCacheMisses.get() == m1)
        assert(top(i3).map(_._1) == top(i3).map(_._1)) // sane output
      } finally spark.conf.unset("spark.graft.ann.fitCache")
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }
}
