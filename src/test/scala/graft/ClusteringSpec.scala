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
}
