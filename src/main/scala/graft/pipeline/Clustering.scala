package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed embedding clustering: spherical k-means (Lloyd's
  * iterations under cosine similarity) and the cluster-then-dedup
  * "semantic dedup" shape built on it (SemDeDup, Abbas et al. 2023:
  * near-duplicate semantics live inside clusters, so the quadratic
  * pair search runs per-cell instead of corpus-wide).
  *
  * Scale shape per iteration: assignment is ONE map-side pass — the
  * centroid table (k vectors, a few KB) rides inside the native
  * argmax-cosine expression ([[org.apache.spark.sql.graft.sketch.nearest_centroid]]),
  * so there is no corpus×k expansion, no shuffle, no window. The
  * centroid update is [[Embeddings.meanPool]]'s (cell, dim) hash
  * aggregate — partial aggregation collapses each partition to ≤ k·dims
  * rows before the exchange, so the shuffle is centroid-sized, not
  * corpus-sized. Driver state is exactly the k centroids (same bounded
  * pattern as [[Similarity.buildIvf]]'s centroid fetch).
  *
  * Determinism: seeded hash-spread init (k smallest xxhash64(id, seed)),
  * half-up-rounded centroid means, ties in assignment keep the lowest
  * centroid index — repeated runs produce identical models.
  */
object Clustering {

  /** A fitted model: `centroids(i)` is cluster i's mean vector;
    * `iterations` actually run; `shift` = max centroid movement (L∞ over
    * all components) in the final iteration. */
  case class KMeansModel(centroids: IndexedSeq[Seq[Float]],
      iterations: Int, shift: Double)

  /** Above this many total centroid floats (k·d), assignment reads the
    * centroid table from a Spark broadcast instead of embedding it in
    * the serialized plan: an embedded table is copied into every task's
    * plan (hundreds of MB at k≈10⁵, d≈768), a broadcast ships once per
    * executor and the plan carries only the handle. 2¹⁵ floats = 128 KB
    * inline worst case — well under task-serialization noise. */
  val InlineCentroidLimit: Long = 1L << 15

  /** Nearest-centroid column: inline table below [[InlineCentroidLimit]]
    * total floats, Spark broadcast above it. Identical arithmetic and
    * tie-breaking either way. */
  private def nearestCentroidCol(df: DataFrame,
      vec: org.apache.spark.sql.Column,
      centroids: IndexedSeq[Seq[Float]]): org.apache.spark.sql.Column = {
    val total = centroids.iterator.map(_.length.toLong).sum
    if (total <= InlineCentroidLimit)
      org.apache.spark.sql.graft.sketch.nearest_centroid(vec, centroids)
    else {
      val bc = df.sparkSession.sparkContext
        .broadcast(centroids.map(_.toArray).toArray)
      org.apache.spark.sql.graft.sketch.nearest_centroid_bc(vec, bc)
    }
  }

  /** Fit spherical k-means. `tol` stops early when no centroid component
    * moved more than it between iterations (compared driver-side — free,
    * the centroids are already there). Empty cells keep their previous
    * centroid. */
  def fitKMeans(df: DataFrame, vecCol: String, idCol: String, k: Int,
      maxIter: Int = 8, tol: Double = 1e-6, seed: Long = 42L): KMeansModel = {
    require(k > 0, "k must be positive")
    // hash-spread init: the k corpus vectors with smallest seeded hash —
    // deterministic, order-insensitive, and spread across the data
    // (lowest-id init inherits whatever locality ids encode). One
    // TakeOrdered job, k rows to the driver.
    var centroids: IndexedSeq[Seq[Float]] = df
      .select(col(vecCol), xxhash64(col(idCol), lit(seed)).alias("__h"))
      .where(col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .orderBy(col("__h").asc)
      .limit(k)
      .collect()
      .map(_.getSeq[Float](0))
      .toIndexedSeq
    require(centroids.nonEmpty, "no non-empty vectors to cluster")
    var iter = 0
    var shift = Double.PositiveInfinity
    while (iter < maxIter && shift > tol) {
      val assigned = df.withColumn("__cell",
        nearestCentroidCol(df, col(vecCol), centroids))
      // (cell, dim) hash-agg mean, reassembled per cell — centroid-sized
      // shuffle; k rows back to the driver
      val meansByCell = Embeddings.meanPool(assigned, Seq("__cell"), vecCol)
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).map(_.toFloat))
        .toMap
      val next = centroids.indices.map(i => meansByCell.get(i) match {
        case Some(m) => m
        case None    => centroids(i) // empty cell: keep the old centroid
      })
      shift = centroids.indices.map { i =>
        val (a, b) = (centroids(i), next(i))
        if (a.length != b.length) Double.PositiveInfinity
        else if (a.isEmpty) 0.0
        else a.indices.map(j => math.abs(a(j) - b(j)).toDouble).max
      }.foldLeft(0.0)(math.max)
      centroids = next
      iter += 1
    }
    KMeansModel(centroids, iter, shift)
  }

  /** Assign every row to its nearest centroid (cosine argmax, ties to
    * the lowest index): map-side, no shuffle. Large centroid tables
    * (k·d > [[InlineCentroidLimit]]) ride a Spark broadcast instead of
    * the serialized plan. */
  def assign(df: DataFrame, vecCol: String, model: KMeansModel,
      outCol: String = "cluster"): DataFrame =
    df.withColumn(outCol, nearestCentroidCol(df, col(vecCol), model.centroids))

  /** Persist a fitted model: `<path>/centroids` parquet (one row per
    * centroid, index + vector) plus `<path>/meta` (iterations, shift).
    * At 100 TB you fit ONCE and reuse the model across sessions — same
    * round-trip contract as [[Dedup.writeMinhashIndex]]; the assigned
    * IVF corpus itself persists as ordinary parquet (`ivf_cell` is a
    * plain int column), so a reloaded corpus + reloaded model serve
    * [[ivfTopK]] with no refit and no reassignment. */
  def writeKMeansModel(model: KMeansModel, path: String,
      spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    model.centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toDF("cluster", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    Seq((model.iterations, model.shift)).toDF("iterations", "shift")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Reload a persisted model. Centroid order is restored from the
    * stored index, so cell ids of a reloaded model match the session
    * that fitted it — reassignment-free by construction. Bounded driver
    * state: k vectors, the same as fitting. */
  def readKMeansModel(spark: org.apache.spark.sql.SparkSession,
      path: String): KMeansModel = {
    val cs = spark.read.parquet(s"$path/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1))
      .sortBy(_._1).map(_._2).toIndexedSeq
    val meta = spark.read.parquet(s"$path/meta").head()
    KMeansModel(cs, meta.getInt(0), meta.getDouble(1))
  }

  /** IVF index from a fitted k-means model: `ivf_cell` is the centroid
    * INDEX (map-side argmax assignment — no shuffle). Trained centroids
    * beat [[Similarity.buildIvf]]'s lowest-id sampling on cell balance,
    * which is what bounds the per-probe scan cost. */
  def buildIvf(df: DataFrame, vecCol: String, model: KMeansModel): DataFrame =
    assign(df, vecCol, model, "ivf_cell")

  /** Search a k-means IVF corpus: the probe cells are the `nProbe`
    * centroids closest to the query, chosen DRIVER-SIDE from the model —
    * zero jobs — then one map-side `isin` filter + TakeOrdered. Unlike
    * [[Similarity.ivfTopK]] there is no centroid-row scan and no
    * broadcast join: the whole plan is scan → filter → top-k. */
  def ivfTopK(ivf: DataFrame, vecCol: String, idCol: String,
      query: Seq[Float], model: KMeansModel, k: Int,
      nProbe: Int = 4): DataFrame = {
    def cos(c: Seq[Float]): Double = {
      var dot = 0.0; var cn = 0.0; var qn = 0.0
      val n = math.min(c.length, query.length)
      var i = 0
      while (i < n) {
        dot += c(i).toDouble * query(i); cn += c(i).toDouble * c(i)
        qn += query(i).toDouble * query(i); i += 1
      }
      dot / (math.sqrt(cn) * math.sqrt(qn))
    }
    val cells = model.centroids.indices
      .sortBy(i => (-cos(model.centroids(i)), i)).take(nProbe)
    val q = array(query.map(v => lit(v)): _*)
    ivf.filter(col("ivf_cell").isin(cells.map(Int.box): _*))
      .withColumn("score", Similarity.cosine(col(vecCol), q))
      .select(col(idCol), Rounding.halfUp(col("score"), 6).alias("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Semantic near-duplicate pairs: cluster, then exact-cosine all-pairs
    * WITHIN each cluster — (`id_a`, `id_b`, `cosine`) with id_a < id_b
    * and cosine ≥ `threshold` (half-up rounded to 6 digits).
    *
    * The cluster key bounds the quadratic term: the self-join shuffles on
    * `cluster`, so each cell compares only its own members (SemDeDup's
    * core trade — a duplicate pair SPLIT across cells is missed, the
    * probability of which shrinks as the pair's cosine approaches 1,
    * since near-identical vectors share an argmax cell unless they
    * straddle a boundary). Recall is data-dependent, like every
    * bucketed dedup here ([[Dedup.minhashProbe]]). */
  def semanticDupPairs(df: DataFrame, vecCol: String, idCol: String,
      k: Int, threshold: Double, maxIter: Int = 8,
      seed: Long = 42L): DataFrame = {
    val model = fitKMeans(df, vecCol, idCol, k, maxIter, seed = seed)
    val assigned = assign(df, vecCol, model, "__cell")
      .select(col("__cell"), col(idCol), col(vecCol))
    val a = assigned.select(col("__cell"), col(idCol).alias("id_a"),
      col(vecCol).alias("__va"))
    val b = assigned.select(col("__cell"), col(idCol).alias("id_b"),
      col(vecCol).alias("__vb"))
    a.join(b, Seq("__cell"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosine(col("__va"), col("__vb")))
      .where(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"),
        Rounding.halfUp(col("cosine"), 6).alias("cosine"))
  }

  /** Semantic dedup survivors: drop every non-representative member of
    * each semantic-duplicate cluster (transitive closure of the pair
    * graph via [[Graphs.dedupByCluster]]; representative = minimum id). */
  def semanticDedup(df: DataFrame, vecCol: String, idCol: String,
      k: Int, threshold: Double, maxIter: Int = 8,
      seed: Long = 42L): DataFrame = {
    val pairs = semanticDupPairs(df, vecCol, idCol, k, threshold, maxIter, seed)
    Graphs.dedupByCluster(df, idCol, pairs, "id_a", "id_b")
  }
}
