package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding storage operators: normalization, scalar quantization, and
  * random projection.
  *
  * At corpus scale the embedding table dominates storage (a 100 TB text
  * corpus with 64–1024-dim float vectors carries terabytes of floats);
  * int8 scalar quantization cuts it 4× with bounded recall loss, and
  * random projection (Johnson–Lindenstrauss) cuts dimensionality itself.
  * All ops are per-row column expressions — map-side, shuffle-free,
  * pipeline-safe between a scan and any [[Similarity]] consumer.
  *
  * Determinism: quantization uses the floor(x+0.5) rounding shared with
  * [[Rounding]] so a SQL engine replays identical codes; projection
  * components derive from the same seeded hash as
  * [[Similarity.hyperplaneSignature]].
  */
object Embeddings {

  /** L2-normalized copy of the vector (zero vectors pass through).
    * Native expression: a transform lambda dividing by a captured
    * sqrt-of-aggregate would re-evaluate the norm per element — the
    * O(d²) HOF-capture trap — and no projection boundary prevents the
    * inline; the primitive loop is the reliable shape. */
  def l2Normalize(vec: Column): Column =
    org.apache.spark.sql.graft.sketch.l2_normalize(vec)

  /** Per-vector int8 scalar quantization: (`codes` array<int> in [0,255],
    * `q_min`, `q_max`). code = floor((x−min)/(max−min)·255 + 0.5);
    * constant vectors map to code 0. The per-vector (min,max) pair is the
    * classic SQ8 trade: 2 floats of overhead, no codebook training, no
    * cross-row state — embarrassingly parallel at any scale. */
  def scalarQuantize(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val mn = array_min(v).cast("double")
    val mx = array_max(v).cast("double")
    df.withColumn("q_min", mn)
      .withColumn("q_max", mx)
      .withColumn("codes",
        when(col("q_max") === col("q_min"), transform(v, _ => lit(0)))
          .otherwise(transform(v, x =>
            floor((x.cast("double") - col("q_min")) /
              (col("q_max") - col("q_min")) * 255.0 + 0.5).cast("int"))))
  }

  /** Reconstruct a float vector from SQ8 codes. */
  def dequantize(codes: Column, qMin: Column, qMax: Column): Column =
    transform(codes, c =>
      (qMin + c.cast("double") * (qMax - qMin) / 255.0).cast("float"))

  /** Element-wise mean of vectors per group — the chunk→document pooling
    * step (chunk embeddings in, one document embedding out). Output:
    * group columns + `vec` (array<double>, element-wise mean, half-up
    * rounded to 6 digits for engine-portable comparison).
    *
    * Plan: posexplode to (group, dim, value), hash-aggregate per
    * (group, dim), then re-assemble the vector per group with a sorted
    * collect — two shuffles, both on compact keys; no custom Aggregator,
    * no driver state; partial aggregation absorbs the ×dims explode. */
  def meanPool(df: DataFrame, groupCols: Seq[String], vecCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val ex = df.select(
      (groupCols.map(col) :+ posexplode(col(vecCol)).as(Seq("__i", "__v"))): _*)
    ex.groupBy((groupCols.map(col) :+ col("__i")): _*)
      .agg(Rounding.halfUp(avg(col("__v").cast("double")), 6).alias("__m"))
      .groupBy(groupCols.map(col): _*)
      .agg(transform(
        array_sort(collect_list(struct(col("__i"), col("__m")))),
        s => s.getField("__m")).alias("vec"))
  }

  /** Embedding-space drift between slices (time windows, sources,
    * pipeline versions): pairwise cosine of the slice CENTROIDS. A
    * centroid that rotates away from the others is the cheapest
    * whole-space alarm that a slice's embedding distribution moved —
    * the vector-space sibling of [[Profiling.psiReport]] (which sees
    * only scalar columns). Output: (`slice_a`, `slice_b`, `cosine`),
    * slice_a < slice_b, half-up 6.
    *
    * Plan: one [[meanPool]] pass (per-dimension partial aggregate —
    * the shuffle carries slices·dim rows, not vectors), then the
    * pairwise cosine runs on the slices-sized centroid table with
    * double-precision array folds — never the corpus. */
  def centroidDrift(df: DataFrame, sliceCol: String,
      vecCol: String): DataFrame = {
    val cent = meanPool(df, Seq(sliceCol), vecCol)
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    val a = cent.select(col(sliceCol).as("slice_a"), col("vec").as("__va"))
    val b = cent.select(col(sliceCol).as("slice_b"), col("vec").as("__vb"))
    a.crossJoin(b).filter(col("slice_a") < col("slice_b"))
      .select(col("slice_a"), col("slice_b"),
        Rounding.halfUp(
          dot(col("__va"), col("__vb")) /
            (sqrt(dot(col("__va"), col("__va"))) *
             sqrt(dot(col("__vb"), col("__vb")))), 6).as("cosine"))
  }

  /** Deterministic seeded ±1 random projection to `k` dimensions
    * (Johnson–Lindenstrauss; Achlioptas 2003 sign variant):
    * out_j = Σ_i v_i·sign(h(j,i,seed)) / √k. Distance-preserving in
    * expectation; pair with [[Similarity.cosine]] on the projected
    * vectors. The projection matrix is implicit in the hash — nothing to
    * train, broadcast, or version. */
  /** Fitted PCA rotation: per-dimension mean, top-k row-major components
    * (orthonormal, variance-descending), and each component's explained
    * variance. Model-sized driver state, like a k-means codebook. */
  case class PcaModel(mean: Array[Double],
      components: Array[Array[Double]], explained: Array[Double])

  /** ONE-pass PCA fit over a float-vector column: every partition
    * accumulates (n, Σv, Σv·vᵀ) in a single sequential scan — constant
    * d + d² doubles of state per partition, the same shape MLlib's
    * RowMatrix uses — and the bounded per-partition partials (P rows,
    * never the data) combine on the driver, where the d×d covariance
    * eigendecomposes by cyclic Jacobi (classical symmetric-matrix
    * algorithm; d is the embedding width, so O(d³) driver work is
    * microseconds). Unlike [[randomProject]]'s data-free JL rotation,
    * the PCA basis concentrates the corpus' ACTUAL variance in the
    * leading k coordinates — tighter distance preservation at the same
    * k on clustered embedding corpora.
    *
    * mapPartitions here is the genuine per-partition imperative case:
    * the accumulator is a mutable d² buffer no SQL aggregate expresses
    * without a d²-way explode of every row. */
  def fitPca(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    require(k > 0, "k must be positive")
    // dimensionality = the MODAL size among non-null vectors (one tiny
    // aggregate): probing an arbitrary first row would let a truncated
    // leading vector silently refit the model on the corrupt minority
    val dRow = df.where(col(vecCol).isNotNull)
      .groupBy(size(col(vecCol)).as("__d")).count()
      .orderBy(col("count").desc, col("__d").asc).take(1)
    require(dRow.nonEmpty, "cannot fit PCA on an empty corpus")
    val d = dRow.head.getInt(0)
    require(k <= d, s"k=$k exceeds dimensionality $d")
    import org.apache.spark.sql.Encoders
    val enc = Encoders.tuple(Encoders.scalaLong,
      Encoders.BINARY, Encoders.BINARY)
    // null / wrong-dimension / NaN-poisoned rows are excluded from the
    // moment pass — one NaN component would otherwise spread through the
    // covariance into every eigenvector
    val partials = df
      .where(col(vecCol).isNotNull && size(col(vecCol)) === d &&
        !exists(col(vecCol), x => isnan(x)))
      .select(col(vecCol)).mapPartitions { it =>
      var n = 0L
      val s = new Array[Double](d)
      val g = new Array[Double](d * d)
      while (it.hasNext) {
        val v = it.next().getSeq[Float](0)
        n += 1
        var i = 0
        while (i < d) {
          val vi = v(i).toDouble
          s(i) += vi
          var j = i
          while (j < d) { g(i * d + j) += vi * v(j); j += 1 }
          i += 1
        }
      }
      if (n == 0) Iterator.empty
      else Iterator((n, doublesToBytes(s), doublesToBytes(g)))
    }(enc).collect()
    require(partials.nonEmpty, "cannot fit PCA on an empty corpus")
    val n = partials.map(_._1).sum
    val s = new Array[Double](d)
    val g = new Array[Double](d * d)
    partials.foreach { case (_, sb, gb) =>
      val sa = bytesToDoubles(sb); val ga = bytesToDoubles(gb)
      var i = 0
      while (i < d) { s(i) += sa(i); i += 1 }
      i = 0
      while (i < d * d) { g(i) += ga(i); i += 1 }
    }
    val mean = s.map(_ / n)
    // covariance (population): E[vvᵀ] − mean·meanᵀ, symmetrized from the
    // upper triangle the scan accumulated
    val cov = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val c = g(i * d + j) / n - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c
    }
    val (values, vectors) = jacobiEigen(cov)
    val order = values.zipWithIndex.sortBy(-_._1).map(_._2).take(k)
    PcaModel(mean,
      order.map(c => Array.tabulate(d)(r => vectors(r)(c))).toArray,
      order.map(values(_)).toArray)
  }

  /** Project onto a fitted [[PcaModel]] — codegen'd centered mat-vec,
    * model rides inline (k·d doubles), zero shuffle. */
  def applyPca(vec: Column, model: PcaModel): Column =
    org.apache.spark.sql.graft.sketch.project_centered(vec,
      model.mean.toIndexedSeq, model.components.map(_.toIndexedSeq).toIndexedSeq)

  /** Eigenvalue-balanced dimension order for PQ subspacing after a PCA
    * rotation — parametric OPQ (Ge et al., "Optimized Product
    * Quantization", CVPR 2013 §4): PCA concentrates variance in the
    * leading dims while PQ spends the SAME byte budget on every
    * dSub-slice, so feeding PCA output to PQ unpermuted starves the
    * heavy subspace and wastes codes on the empty tail. Greedy balance:
    * walk dims in descending explained variance, always assigning to
    * the non-full subspace with the smallest log-variance product.
    * Returns the dim order whose consecutive dSub-slices are the
    * balanced subspaces — feed it to [[reorderDims]] and then fit PQ
    * as usual. */
  def balancedOrder(explained: Seq[Double], m: Int): Seq[Int] = {
    require(m > 0 && explained.nonEmpty && explained.size % m == 0,
      s"dims ${explained.size} not divisible by m=$m")
    val dSub = explained.size / m
    val buckets = Array.fill(m)(Vector.empty[Int])
    val logSum = Array.fill(m)(0.0)
    explained.zipWithIndex.sortBy(-_._1).foreach { case (e, dim) =>
      val b = (0 until m).filter(buckets(_).size < dSub)
        .minBy(logSum(_))
      buckets(b) :+= dim
      logSum(b) += math.log(math.max(e, 1e-12))
    }
    buckets.toIndexedSeq.flatten
  }

  /** Permute a float vector's dimensions into `order` — a codegen'd
    * array-of-element_at projection, shuffle-free. */
  def reorderDims(vec: Column, order: Seq[Int]): Column =
    array(order.map(i => element_at(vec, i + 1)): _*)

  /** Persist a fitted [[PcaModel]] (fit once, reuse across jobs — the
    * same contract as the k-means codebook IO): one row per component
    * (index, vector, explained variance) + the mean. */
  def writePcaModel(model: PcaModel, path: String,
      spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    model.components.zip(model.explained).zipWithIndex
      .map { case ((c, e), i) => (i, c.toSeq, e) }.toSeq
      .toDF("component", "vector", "explained")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/components")
    Seq(Tuple1(model.mean.toSeq)).toDF("mean")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/mean")
  }

  /** Reload a persisted PCA model; component order restored from the
    * stored index, so reloaded projections are bit-identical. */
  def readPcaModel(spark: org.apache.spark.sql.SparkSession,
      path: String): PcaModel = {
    val comps = spark.read.parquet(s"$path/components")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray,
        r.getDouble(2)))
      .sortBy(_._1)
    val mean = spark.read.parquet(s"$path/mean")
      .head().getSeq[Double](0).toArray
    PcaModel(mean, comps.map(_._2), comps.map(_._3))
  }

  private def doublesToBytes(a: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(a.length * 8)
    a.foreach(bb.putDouble)
    bb.array()
  }

  private def bytesToDoubles(b: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(b)
    Array.fill(b.length / 8)(bb.getDouble)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (Golub & Van
    * Loan §8.5): rotate away the largest off-diagonal entries sweep by
    * sweep until convergence. Returns (eigenvalues, eigenvectors as
    * COLUMNS). Deterministic for a given input; d is an embedding
    * width, so the O(d³) cost is driver-trivial. */
  private def jacobiEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * a(p)(q))
            // stable tan of the annihilating rotation (smaller root)
            val t = if (theta == 0.0) 1.0
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1))
            val c = 1.0 / math.sqrt(t * t + 1)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    s
  }

  def randomProject(vec: Column, k: Int, seed: Long = 42L): Column = {
    require(k > 0, "k must be positive")
    val scale = 1.0 / math.sqrt(k.toDouble)
    transform(sequence(lit(0), lit(k - 1)), j =>
      (aggregate(
        zip_with(vec, transform(sequence(lit(0), size(vec) - 1), i =>
          when(hash(j, i, lit(seed)) >= 0, lit(1.0)).otherwise(lit(-1.0))),
          (x, s) => x.cast("double") * s),
        lit(0.0), (acc, t) => acc + t) * scale).cast("float"))
  }
}
