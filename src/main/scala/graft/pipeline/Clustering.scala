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

  /** One-slot holder for a centroid-table broadcast: fills on first use,
    * so a model (or one fit iteration) broadcasts its centroids at most
    * ONCE however many assignment columns are built from it, and
    * `destroy()` releases a superseded iteration's executor copies
    * eagerly instead of leaving them to accumulate until ContextCleaner
    * happens to run — at k≈10⁵, d≈768 each table is ~300 MB of executor
    * memory per undying broadcast. */
  private[pipeline] final class CentroidBroadcast {
    @transient @volatile
    private var handle: org.apache.spark.broadcast.Broadcast[Array[Array[Float]]] = _
    def getOrBroadcast(df: DataFrame, centroids: IndexedSeq[Seq[Float]])
        : org.apache.spark.broadcast.Broadcast[Array[Array[Float]]] =
      synchronized {
        if (handle == null)
          handle = df.sparkSession.sparkContext
            .broadcast(centroids.map(_.toArray).toArray)
        handle
      }
    def destroy(): Unit = synchronized {
      if (handle != null) { handle.destroy(); handle = null }
    }
  }

  /** A fitted model: `centroids(i)` is cluster i's mean vector;
    * `iterations` actually run; `shift` = max centroid movement (L∞ over
    * all components) in the final iteration. */
  case class KMeansModel(centroids: IndexedSeq[Seq[Float]],
      iterations: Int, shift: Double) {
    /** The model's own broadcast slot: every [[assign]]/[[buildIvf]] call
      * against this model reuses one executor-side copy. Transient lazy —
      * a deserialized or reloaded model re-broadcasts on first use. */
    @transient private[pipeline] lazy val bcSlot = new CentroidBroadcast
  }

  /** Above this many total centroid floats (k·d), assignment reads the
    * centroid table from a Spark broadcast instead of embedding it in
    * the serialized plan: an embedded table is copied into every task's
    * plan (hundreds of MB at k≈10⁵, d≈768), a broadcast ships once per
    * executor and the plan carries only the handle. 2¹⁵ floats = 128 KB
    * inline worst case — well under task-serialization noise. */
  val InlineCentroidLimit: Long = 1L << 15

  /** Nearest-centroid column: inline table below [[InlineCentroidLimit]]
    * total floats, Spark broadcast above it. Identical arithmetic and
    * tie-breaking either way. `metric` is `"cosine"` (spherical k-means)
    * or `"l2"` (squared-distance argmin — the PQ codebook metric; PQ
    * codebooks are small by construction, so l2 is always inline). */
  private def nearestCentroidCol(df: DataFrame,
      vec: org.apache.spark.sql.Column,
      centroids: IndexedSeq[Seq[Float]],
      metric: String = "cosine",
      slot: CentroidBroadcast = null): org.apache.spark.sql.Column =
    metric match {
      case "l2" =>
        org.apache.spark.sql.graft.sketch.nearest_centroid_l2(vec, centroids)
      case "cosine" =>
        val total = centroids.iterator.map(_.length.toLong).sum
        if (total <= InlineCentroidLimit)
          org.apache.spark.sql.graft.sketch.nearest_centroid(vec, centroids)
        else {
          val s = if (slot == null) new CentroidBroadcast else slot
          org.apache.spark.sql.graft.sketch.nearest_centroid_bc(
            vec, s.getOrBroadcast(df, centroids))
        }
      case other => throw new IllegalArgumentException(
        s"metric must be cosine or l2, got $other")
    }

  /** Fit spherical k-means. `tol` stops early when no centroid component
    * moved more than it between iterations (compared driver-side — free,
    * the centroids are already there). Empty cells keep their previous
    * centroid. */
  def fitKMeans(df: DataFrame, vecCol: String, idCol: String, k: Int,
      maxIter: Int = 8, tol: Double = 1e-6, seed: Long = 42L,
      metric: String = "cosine"): KMeansModel =
    FitMemo.cached(df, Seq(idCol, vecCol),
      ("kmeans", k, maxIter, tol, seed, metric)) {
      fitKMeansImpl(df, vecCol, idCol, k, maxIter, tol, seed, metric)
    }

  private def fitKMeansImpl(df: DataFrame, vecCol: String, idCol: String,
      k: Int, maxIter: Int, tol: Double, seed: Long,
      metric: String): KMeansModel = {
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
      // each iteration's centroid table is live for exactly one job:
      // broadcast at most once (the slot), destroy as soon as the means
      // are collected — superseded tables never pile up on executors
      val iterSlot = new CentroidBroadcast
      val assigned = df.withColumn("__cell",
        nearestCentroidCol(df, col(vecCol), centroids, metric, iterSlot))
      // (cell, dim) hash-agg mean, reassembled per cell — centroid-sized
      // shuffle; k rows back to the driver
      val meansByCell =
        try Embeddings.meanPool(assigned, Seq("__cell"), vecCol)
          .collect()
          .map(r => r.getInt(0) -> r.getSeq[Double](1).map(_.toFloat))
          .toMap
        finally iterSlot.destroy()
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
    df.withColumn(outCol,
      nearestCentroidCol(df, col(vecCol), model.centroids,
        slot = model.bcSlot))

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
    * which is what bounds the per-probe scan cost.
    *
    * Centroid-scaling rule: k should GROW with the corpus, k ≈ ⌈√n⌉ —
    * per-probe scan cost is ~n/k rows and probe selection is k
    * centroid distances, so √n balances the two and keeps BOTH
    * sublinear as the corpus scales (fixed k degrades to n/k-linear
    * scans). Measured on clustered 200k-vector geometry
    * (SCALE100X_ANN.json `ann_clustered_200k`): k=⌈√n⌉=448 reaches
    * cross-query recall@10 = 1.00 at nProbe=1 (~n/448 ≈ 450 rows
    * scanned), while a fixed k=64 needs nProbe=8 (~n/8 = 25k rows —
    * 56× the scan) for the same recall. On the structureless isotropic
    * testdata no k helps — recall ≈ probed fraction is that geometry's
    * honest ceiling. */
  def buildIvf(df: DataFrame, vecCol: String, model: KMeansModel): DataFrame =
    assign(df, vecCol, model, "ivf_cell")

  /** Search a k-means IVF corpus: the probe cells are the `nProbe`
    * centroids closest to the query, chosen DRIVER-SIDE from the model —
    * zero jobs — then one map-side `isin` filter + TakeOrdered. Unlike
    * [[Similarity.ivfTopK]] there is no centroid-row scan and no
    * broadcast join: the whole plan is scan → filter → top-k. */
  /** The `nProbe` probe cells for one query — the nProbe centroids
    * closest by cosine, index-tie-broken; pure driver-side model math
    * shared by [[ivfTopK]] and the batched gate searches. */
  def probeCells(model: KMeansModel, query: Seq[Float],
      nProbe: Int): Seq[Int] = {
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
    model.centroids.indices
      .sortBy(i => (-cos(model.centroids(i)), i)).take(nProbe)
  }

  def ivfTopK(ivf: DataFrame, vecCol: String, idCol: String,
      query: Seq[Float], model: KMeansModel, k: Int,
      nProbe: Int = 4): DataFrame = {
    val cells = probeCells(model, query, nProbe)
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
    // Scans.spread (no-op at scale): the assignment kernel and the
    // within-cell cosine pairing are CPU-dense over few bytes
    val assigned = assign(Scans.spread(df, col(idCol)), vecCol, model, "__cell")
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

  // ---------------------------------------------------------------------
  // Product quantization (Jégou, Douze, Schmid, "Product Quantization
  // for Nearest Neighbor Search", TPAMI 2011): split d dims into m
  // subspaces, k-means each independently under L2, store per-vector
  // only the m codebook indices. With k=256 a 768-dim float vector
  // (3 KB) compresses to m bytes — the memory layout that makes
  // billion-vector ANN (IVF-PQ) feasible. Search is asymmetric distance
  // computation (ADC): the query precomputes one inner-product
  // lookup-table per subspace DRIVER-SIDE (m·k doubles), and scoring a
  // vector is m table lookups — no float vector is ever read.
  // ---------------------------------------------------------------------

  /** A fitted PQ codebook: `codebooks(s)(c)` is subspace s's centroid c
    * (each of `dSub` dims); m = codebooks.length. */
  case class PQModel(codebooks: IndexedSeq[IndexedSeq[Seq[Float]]], dSub: Int) {
    def m: Int = codebooks.length
  }

  /** Fit a PQ codebook: m independent L2 k-means over the subvector
    * slices, ALL SUBSPACES PER PASS — per iteration, one map-side
    * projection computes every row's m codes and one (subspace, cell,
    * dim) hash aggregate updates every codebook entry, so the whole fit
    * costs 1 + maxIter jobs regardless of m (a fit-per-subspace loop
    * costs m× that in pure job-launch overhead — measured 9.2 s vs
    * ~1.5 s at m=16 on the bench corpus). Partial aggregation collapses
    * each partition to ≤ m·k·dSub = d·k rows before the exchange;
    * driver state is the m·k codebook vectors. Deterministic: seeded
    * hash-spread init (shared row sample, sliced per subspace),
    * half-up-rounded means, empty cells keep their previous centroid. */
  def fitPQ(df: DataFrame, vecCol: String, idCol: String, m: Int,
      k: Int, maxIter: Int = 4, seed: Long = 42L): PQModel =
    FitMemo.cached(df, Seq(idCol, vecCol), ("pq", m, k, maxIter, seed)) {
      fitPQImpl(df, vecCol, idCol, m, k, maxIter, seed)
    }

  private def fitPQImpl(df: DataFrame, vecCol: String, idCol: String,
      m: Int, k: Int, maxIter: Int, seed: Long): PQModel = {
    require(m > 0 && k > 0, "m and k must be positive")
    // dimensionality = the MODAL size among non-null vectors (one tiny
    // aggregate): probing an arbitrary first row would let a truncated
    // leading vector silently refit the codebooks on the corrupt minority
    val dRow = df.where(col(vecCol).isNotNull)
      .groupBy(size(col(vecCol)).as("__d")).count()
      .orderBy(col("count").desc, col("__d").asc).take(1)
    require(dRow.nonEmpty, "no non-null vectors to quantize")
    val d = dRow.head.getInt(0)
    require(d % m == 0, s"vector dims $d not divisible by m=$m subspaces")
    val dSub = d / m
    // NaN-poisoned rows excluded everywhere: one NaN component would
    // otherwise NaN the mean of its assigned cell and garbage every code
    val clean = col(vecCol).isNotNull && size(col(vecCol)) === d &&
      !exists(col(vecCol), x => isnan(x))
    val initRows = df
      .select(col(vecCol), xxhash64(col(idCol), lit(seed)).alias("__h"))
      .where(clean)
      .orderBy(col("__h").asc)
      .limit(k)
      .collect()
      .map(_.getSeq[Float](0))
    require(initRows.nonEmpty, "no full-dimension vectors to quantize")
    // corpora smaller than k (production k=256 on a small fixture):
    // cycle the sample so every cell has an init centroid — duplicate
    // centroids lose every argmin tie to their first copy, stay empty,
    // and keep their init vector, which is harmless
    var books: IndexedSeq[IndexedSeq[Seq[Float]]] = (0 until m).map(s =>
      (0 until k).map(c => initRows(c % initRows.length)
        .slice(s * dSub, (s + 1) * dSub)))
    var iter = 0
    while (iter < maxIter) {
      val coded = df
        .where(clean)
        .withColumn("__codes", array((0 until m).map { s =>
          org.apache.spark.sql.graft.sketch.nearest_centroid_l2(
            slice(col(vecCol), s * dSub + 1, dSub), books(s))
        }: _*))
      val sCol = (col("__dim") / dSub).cast("int")
      val means = coded
        .select(posexplode(col(vecCol)).as(Seq("__dim", "__x")), col("__codes"))
        .select(sCol.alias("__s"),
          element_at(col("__codes"), sCol + 1).alias("__cell"),
          pmod(col("__dim"), lit(dSub)).cast("int").alias("__d"),
          col("__x").cast("double").alias("__x"))
        .groupBy("__s", "__cell", "__d")
        .agg(Rounding.halfUp(avg(col("__x")), 6).alias("__mean"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3))
        .toMap
      books = (0 until m).map(s => (0 until k).map { c =>
        val prev = books(s)(c)
        prev.indices.map(dd =>
          means.get((s, c, dd)).map(_.toFloat).getOrElse(prev(dd)))
      })
      iter += 1
    }
    PQModel(books, dSub)
  }

  /** Persist a PQ codebook — same fit-once contract as
    * [[writeKMeansModel]]: `<path>/codebooks` (one row per subspace ×
    * cluster) + `<path>/meta`. A persisted codebook plus the encoded
    * corpus (plain parquet — `pq_code` is an int array) serve
    * [[pqTopK]]/[[pqTopKRerank]] across sessions without refitting. */
  def writePQModel(model: PQModel, path: String,
      spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    model.codebooks.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.map { case (c, ci) => (s, ci, c) }
    }.toDF("subspace", "cluster", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    Seq(model.dSub).toDF("d_sub")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Reload a persisted PQ codebook; (subspace, cluster) order restored
    * from the stored indices, so codes from the fitting session remain
    * valid. Bounded driver state: m·k vectors. */
  def readPQModel(spark: org.apache.spark.sql.SparkSession,
      path: String): PQModel = {
    val rows = spark.read.parquet(s"$path/codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2)))
    val m = rows.iterator.map(_._1).max + 1
    val codebooks = (0 until m).map(s =>
      rows.filter(_._1 == s).sortBy(_._2).map(_._3).toIndexedSeq)
    val dSub = spark.read.parquet(s"$path/meta").head().getInt(0)
    PQModel(codebooks.toIndexedSeq, dSub)
  }

  /** Encode every vector as its m codebook indices (`outCol`:
    * array<int> of length m) — one map-side pass, no shuffle; the
    * per-row work is the same k×d centroid scan a single full-space
    * assignment costs. */
  def assignPQ(df: DataFrame, vecCol: String, model: PQModel,
      outCol: String = "pq_code"): DataFrame =
    df.withColumn(outCol, array((0 until model.m).map { s =>
      org.apache.spark.sql.graft.sketch.nearest_centroid_l2(
        slice(col(vecCol), s * model.dSub + 1, model.dSub),
        model.codebooks(s))
    }: _*))

  /** ADC top-k over a PQ-encoded corpus: approximate inner-product
    * scores from codes alone. The query builds one flat lookup table
    * driver-side (`lut[s·k + c]` = ⟨query_s, codebook_s(c)⟩ — m·k
    * doubles, zero jobs); scoring is m array lookups per row inside
    * whole-stage codegen (the native
    * [[org.apache.spark.sql.graft.PqAdcScore]] expression — an
    * `aggregate()` higher-order function here would be CodegenFallback,
    * an interpreted per-row loop on the hottest scan of the search
    * path) and the plan is scan → project → TakeOrdered, exactly
    * [[ivfTopK]]'s join-free shape. Scores approximate ⟨query, x⟩ —
    * l2-normalize the corpus at encode time to make that cosine. */
  def pqTopK(codes: DataFrame, idCol: String, model: PQModel,
      query: Seq[Float], k: Int, codeCol: String = "pq_code"): DataFrame = {
    val kPer = model.codebooks.head.length
    val lut = new Array[Double](model.m * kPer)
    for (s <- 0 until model.m; c <- 0 until kPer) {
      val cent = model.codebooks(s)(c)
      var dot = 0.0
      var j = 0
      while (j < model.dSub) {
        dot += query(s * model.dSub + j).toDouble * cent(j); j += 1
      }
      lut(s * kPer + c) = dot
    }
    codes
      .withColumn("score", org.apache.spark.sql.graft.sketch
        .pq_adc_score(col(codeCol), lut.toIndexedSeq, kPer))
      .select(col(idCol), Rounding.halfUp(col("score"), 6).alias("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Build an IVF-PQ corpus: coarse k-means cell (`ivf_cell`) + PQ code
    * (`pq_code`) per row, both map-side — the canonical billion-vector
    * ANN layout (Jégou et al. 2011): the cell prunes the scan, the code
    * replaces the float vector for scoring. Persist as plain parquet
    * (ideally partitioned by `ivf_cell` so a probe touches only its
    * cells' files). */
  def buildIvfPq(df: DataFrame, vecCol: String, coarse: KMeansModel,
      pq: PQModel): DataFrame =
    assignPQ(assign(df, vecCol, coarse, "ivf_cell"), vecCol, pq)

  /** Batched k-NN join: EVERY query row gets its k nearest corpus
    * neighbors in one pass — the linking shape (dedup a new shard
    * against the corpus, attach citations, build a similarity graph)
    * where running the single-query search per row would launch one job
    * per query.
    *
    * Shape: each query row picks its `nProbe` probe cells with the
    * codegen'd per-row top-n centroid expression (queries are DATA, so
    * the single-query drivers' driver-side cell ranking cannot run),
    * explodes to (cell, query), and equi-joins the IVF-assigned corpus
    * on the cell — with a broadcast query side the corpus is scanned
    * exactly once, map-side, no corpus shuffle. Exact cosine scores the
    * surviving (corpus row × query) candidates — a nProbe/nCells
    * fraction of the cross product — and a per-query window keeps the
    * top k. The single exchange in the plan carries candidates keyed by
    * query id, never the corpus. Query batches beyond broadcast size
    * shift the equi-join to a cell-keyed shuffle — same plan, still no
    * cross product.
    *
    * Returns (`qIdCol`, `idCol`, `score`, `rn` 1-based). Approximate
    * exactly like [[ivfTopK]]: recall bounded by cell pruning;
    * `nProbe` = number of centroids makes it exact. */
  def knnJoin(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, qIdCol: String, qVecCol: String,
      coarse: KMeansModel, k: Int, nProbe: Int = 4,
      cellCol: String = "ivf_cell"): DataFrame = {
    require(k > 0 && nProbe > 0, "k and nProbe must be positive")
    import org.apache.spark.sql.expressions.Window
    val probes = queries
      .select(col(qIdCol), col(qVecCol).alias("__graft_qvec"))
      .withColumn(cellCol, explode(
        org.apache.spark.sql.graft.sketch.nearest_centroids_topn(
          col("__graft_qvec"), coarse.centroids, nProbe)))
    val w = Window.partitionBy(col(qIdCol))
      .orderBy(col("score").desc, col(idCol).asc)
    corpus
      .join(broadcast(probes), cellCol)
      .withColumn("score", Rounding.halfUp(
        Similarity.cosine(col(vecCol), col("__graft_qvec")), 6))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col(qIdCol), col(idCol), col("score"), col("rn"))
  }

  /** Hard-negative mining for contrastive training: for each query, the
    * `k` most-similar corpus vectors whose label DIFFERS from the
    * query's — the informative negatives (a random negative is usually
    * trivially far; the near-miss with the wrong label is what moves a
    * contrastive loss). Same batched shape as [[knnJoin]] — queries ride
    * a broadcast with their probed cells, the corpus NEVER shuffles, and
    * the label-mismatch filter runs BEFORE the per-query rank so the
    * output is the top-k among negatives, not the negatives among the
    * top-k. WindowGroupLimit prunes per-query groups map-side. Output:
    * (`qIdCol`, `idCol`, label, `score`, `rn`). */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, labelCol: String, qIdCol: String, qVecCol: String,
      qLabelCol: String, coarse: KMeansModel, k: Int, nProbe: Int = 4,
      cellCol: String = "ivf_cell"): DataFrame = {
    require(k > 0 && nProbe > 0, "k and nProbe must be positive")
    import org.apache.spark.sql.expressions.Window
    val probes = queries
      .select(col(qIdCol), col(qVecCol).alias("__graft_qvec"),
        col(qLabelCol).alias("__graft_qlab"))
      .withColumn(cellCol, explode(
        org.apache.spark.sql.graft.sketch.nearest_centroids_topn(
          col("__graft_qvec"), coarse.centroids, nProbe)))
    val w = Window.partitionBy(col(qIdCol))
      .orderBy(col("score").desc, col(idCol).asc)
    corpus
      .join(broadcast(probes), cellCol)
      .filter(col(labelCol) =!= col("__graft_qlab"))
      .withColumn("score", Rounding.halfUp(
        Similarity.cosine(col(vecCol), col("__graft_qvec")), 6))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col(qIdCol), col(idCol), col(labelCol), col("score"), col("rn"))
  }

  /** Fit a PQ codebook on coarse-cell RESIDUALS (x − centroid[cell]) —
    * the IVFADC layout of Jégou 2011 §IV-A. The coarse quantizer already
    * localizes a vector to its cell; quantizing the residual spends the
    * whole code budget on the within-cell detail, which is what raw-x
    * codes waste re-encoding the cell position. Same fit machinery as
    * [[fitPQ]], run over a residual column computed map-side by the
    * codegen'd `graft_centroid_residual` expression. */
  def fitResidualPQ(df: DataFrame, vecCol: String, idCol: String,
      coarse: KMeansModel, m: Int, k: Int, maxIter: Int = 4,
      seed: Long = 42L): PQModel = {
    val withRes = assign(df, vecCol, coarse, "__graft_cell")
      .withColumn("__graft_res", org.apache.spark.sql.graft.sketch
        .centroid_residual(col(vecCol), col("__graft_cell"),
          coarse.centroids))
    fitPQ(withRes, "__graft_res", idCol, m, k, maxIter, seed)
  }

  /** Encode an IVF-PQ corpus with RESIDUAL codes: `ivf_cell` +
    * `pq_code` of (x − centroid[cell]). Map-side like [[buildIvfPq]];
    * search with [[ivfPqResidualTopK]] (plain [[ivfPqTopK]] would score
    * residual codes against a raw-query LUT and rank garbage). */
  def buildIvfPqResidual(df: DataFrame, vecCol: String,
      coarse: KMeansModel, pq: PQModel): DataFrame = {
    val celled = assign(df, vecCol, coarse, "ivf_cell")
    assignPQ(
      celled.withColumn("__graft_res", org.apache.spark.sql.graft.sketch
        .centroid_residual(col(vecCol), col("ivf_cell"), coarse.centroids)),
      "__graft_res", pq)
      .drop("__graft_res")
  }

  /** Residual IVF-PQ search. Inner-product decomposition keeps the scan
    * single-pass: ⟨q, x⟩ = ⟨q, centroid_cell⟩ + ⟨q, residual⟩, so the
    * ADC lookup table over residual codebooks is CELL-INDEPENDENT (it
    * contracts q, not q − centroid, with the codebooks) and the cell
    * contributes one driver-computed constant — score = const[cell] +
    * ADC(code), all inside whole-stage codegen, no per-cell branches.
    * (Classic L2-metric IVFADC needs a LUT per probed cell; the
    * inner-product form does not.) Shortlist then re-ranks exactly on
    * the float vectors, same as [[ivfPqTopK]]. */
  def ivfPqResidualTopK(corpus: DataFrame, vecCol: String, idCol: String,
      coarse: KMeansModel, pq: PQModel, query: Seq[Float], k: Int,
      nProbe: Int = 4, shortlist: Int = 100): DataFrame = {
    require(shortlist >= k, "shortlist must be at least k")
    def dotc(c: Seq[Float]): Double = {
      var d = 0.0
      val n = math.min(c.length, query.length)
      var i = 0
      while (i < n) { d += c(i).toDouble * query(i); i += 1 }
      d
    }
    def cos(c: Seq[Float]): Double = {
      var cn = 0.0; var qn = 0.0
      c.foreach(x => cn += x.toDouble * x)
      query.foreach(x => qn += x.toDouble * x)
      val den = math.sqrt(cn) * math.sqrt(qn)
      if (den == 0.0) 0.0 else dotc(c) / den
    }
    val cells = coarse.centroids.indices
      .sortBy(i => (-cos(coarse.centroids(i)), i)).take(nProbe)
    val consts = coarse.centroids.map(dotc) // k doubles, driver-side
    val kPer = pq.codebooks.head.length
    val lut = new Array[Double](pq.m * kPer)
    for (s <- 0 until pq.m; c <- 0 until kPer) {
      val cent = pq.codebooks(s)(c)
      var dot = 0.0
      var j = 0
      while (j < pq.dSub) {
        dot += query(s * pq.dSub + j).toDouble * cent(j); j += 1
      }
      lut(s * kPer + c) = dot
    }
    val probed = corpus.filter(col("ivf_cell").isin(cells.map(Int.box): _*))
    val cand = probed
      .withColumn("__adc", org.apache.spark.sql.graft.sketch
        .pq_adc_score(col("pq_code"), lut.toIndexedSeq, kPer) +
        element_at(typedlit(consts), col("ivf_cell") + 1))
      .orderBy(col("__adc").desc, col(idCol).asc)
      .limit(shortlist)
      .select(col(idCol))
    val qLit = array(query.map(v => lit(v)): _*)
    probed
      .join(broadcast(cand), idCol)
      .withColumn("score", Similarity.cosine(col(vecCol), qLit))
      .select(col(idCol), Rounding.halfUp(col("score"), 6).alias("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Persist an IVF(-PQ) corpus PARTITIONED BY CELL — one directory per
    * `cellCol` value, so a probe's `ivf_cell IN (…)` filter becomes a
    * partition filter and the scan READS ONLY the probed cells' files
    * (file-level pruning, before any row is touched). This is the
    * at-rest layout that turns nProbe/nCells from a row-filter ratio
    * into an I/O ratio — on a 100 TB corpus the search opens
    * nProbe/nCells of the bytes. Cell counts are k-means-balanced-ish;
    * a skewed cell shows up in [[Profiling.topValues]] on `cellCol` and
    * wants a larger k, not a different writer. */
  def writeIvfPartitioned(corpus: DataFrame, path: String,
      cellCol: String = "ivf_cell"): Unit =
    corpus.write.partitionBy(cellCol).mode("overwrite").parquet(path)

  /** Incremental maintenance for a cell-partitioned IVF store: encode
    * the new batch with the STANDING coarse model (one map-side argmax
    * assignment — no refit, no shuffle) and append its files into the
    * matching cell directories. Only the cells the batch lands in gain
    * files; the standing corpus is never read, moved, or rewritten, so
    * the maintenance cost is proportional to the batch — the property
    * that keeps a 100 TB index serviceable under a daily ingest. Probe
    * pruning keeps working unchanged: appended files live under the
    * same `cellCol=` partition keys the search's isin filter prunes on.
    * (Cell balance drifts as the corpus outgrows the model; refit +
    * [[writeIvfPartitioned]] when recall or balance gates flag it.) */
  def appendIvfPartitioned(batch: DataFrame, vecCol: String,
      model: KMeansModel, path: String, cellCol: String = "ivf_cell"): Unit =
    assign(batch, vecCol, model, cellCol)
      .write.partitionBy(cellCol).mode("append").parquet(path)

  /** IVF-PQ search: probe cells chosen DRIVER-SIDE from the coarse
    * model (zero jobs, like [[ivfTopK]]), ADC scores codes inside the
    * probed cells only, and the shortlist re-ranks exactly. Plan: scan →
    * isin filter → code lookup → TakeOrdered → broadcast re-rank — the
    * float corpus is touched only for the `shortlist` candidates. */
  def ivfPqTopK(corpus: DataFrame, vecCol: String, idCol: String,
      coarse: KMeansModel, pq: PQModel, query: Seq[Float], k: Int,
      nProbe: Int = 4, shortlist: Int = 100): DataFrame = {
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
    val cells = coarse.centroids.indices
      .sortBy(i => (-cos(coarse.centroids(i)), i)).take(nProbe)
    val probed = corpus.filter(col("ivf_cell").isin(cells.map(Int.box): _*))
    pqTopKRerank(probed, probed, vecCol, idCol, pq, query, k, shortlist)
  }

  /** PQ search with exact re-ranking — the standard production shape:
    * ADC produces a `shortlist`-sized candidate set from codes alone
    * (never touching a float vector), then ONLY those candidates fetch
    * their vectors for an exact cosine re-rank. The shortlist rides a
    * broadcast semi-join against the corpus (shortlist ≪ corpus), so
    * the expensive exact math runs on `shortlist` rows, not n — at
    * quantization-blurred score margins this recovers the exact top-k
    * that raw ADC ranking cannot separate. */
  def pqTopKRerank(codes: DataFrame, corpus: DataFrame, vecCol: String,
      idCol: String, model: PQModel, query: Seq[Float], k: Int,
      shortlist: Int = 100, codeCol: String = "pq_code"): DataFrame = {
    require(shortlist >= k, "shortlist must be at least k")
    val cand = pqTopK(codes, idCol, model, query, shortlist, codeCol)
      .select(col(idCol))
    val qLit = array(query.map(v => lit(v)): _*)
    corpus
      .join(broadcast(cand), idCol)
      .withColumn("score", Similarity.cosine(col(vecCol), qLit))
      .select(col(idCol), Rounding.halfUp(col("score"), 6).alias("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
