package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — a single scan + TakeOrdered, the
  * right shape for one-off queries at any scale.
  * Scale path: LSH (random hyperplanes) bucketing so repeated queries and
  * all-pairs workloads only touch matching buckets (an IVF-style coarse
  * quantization would slot in the same way: replace the signature with a
  * centroid id).
  * All math is codegen'd column expressions (zip_with/aggregate) — no UDFs.
  */
object Similarity {

  /** Dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Native expression (graft CosineSimilarity): double accumulation in
    * array order — bit-identical to the composable dot/norm formulation
    * but one primitive loop per row. Inputs must be array<float>.
    *
    * Zero-norm or NaN-poisoned vectors yield NULL, not NaN: Spark sorts
    * NaN GREATER than every double, so a single corrupt embedding would
    * otherwise outrank every real neighbor in the `.desc` top-k paths —
    * null sinks (desc default is NULLS LAST), which is the correct
    * dirty-corpus behavior at any scale. */
  def cosine(a: Column, b: Column): Column =
    nanvl(org.apache.spark.sql.graft.sketch.cosine(a, b),
      lit(null).cast("double"))

  // Plane components are murmur3(hash(plane, dim, seed)) / Int.MaxValue in
  // [-1, 1) — the formula lives in the native expression
  // (GraftHashOps.hyperplaneSignature); the former composable
  // planeComponent helper was unused and invited silent drift.

  /** Sign signature under `planes` random hyperplanes → one integer bucket
    * id. Buckets split the corpus ~2^planes ways; cosine-close vectors
    * land in the same bucket with high probability. Native expression
    * (graft.functions.HyperplaneSignature) — tight primitive loop. */
  def hyperplaneSignature(vec: Column, planes: Int, seed: Long): Column =
    org.apache.spark.sql.graft.sketch.hyperplane_signature(vec, planes, seed, 0)

  /** Brute-force cosine scores of every row against one query vector.
    * Filter/top-k compose on the result (Catalyst turns orderBy+limit into
    * TakeOrdered — no global sort materialization). */
  def scoreAll(df: DataFrame, vecCol: String, query: Seq[Float]): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    df.withColumn("score", cosine(col(vecCol), q))
  }

  /** Brute-force exact top-k neighbors. */
  def bruteForceTopK(
      df: DataFrame, vecCol: String, idCol: String,
      query: Seq[Float], k: Int): DataFrame =
    scoreAll(df, vecCol, query)
      .select(col(idCol), Rounding.halfUp(col("score"), 6).alias("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)

  /** Brute-force top-k over an SQ8-quantized corpus (codes from
    * [[Embeddings.scalarQuantize]]): the full-corpus scan reads INT
    * codes, never float vectors — with x̂_i = min + code_i·(max−min)/255,
    * ⟨q, x̂⟩ = min·Σq + (max−min)/255 · Σ q_i·code_i, where Σq is one
    * driver-side constant and the code contraction is the codegen'd
    * `graft_sq8_dot` loop. The affine correction is plain column
    * arithmetic. A `shortlist` of approximate winners then re-ranks
    * with exact cosine on the float vectors (broadcast semi-join —
    * float data touched for `shortlist` rows only). The 4×-smaller scan
    * footprint (and parquet's bit-packed int encoding) is the
    * memory-bandwidth lever for corpus-wide scans when an IVF/PQ index
    * isn't built; unit-norm corpus makes the approximate ranking track
    * cosine. */
  def sq8TopK(quantized: DataFrame, vecCol: String, idCol: String,
      query: Seq[Float], k: Int, shortlist: Int = 100,
      codesCol: String = "codes", minCol: String = "q_min",
      maxCol: String = "q_max"): DataFrame = {
    require(shortlist >= k, "shortlist must be at least k")
    val sumQ = query.foldLeft(0.0)(_ + _.toDouble)
    // nanvl: NaN-poisoned rows carry NaN q_min/q_max through the affine
    // correction; as NULL they sink instead of flooding the shortlist
    val approx = nanvl(col(minCol) * lit(sumQ) +
      (col(maxCol) - col(minCol)) / lit(255.0) *
        org.apache.spark.sql.graft.sketch.sq8_dot(col(codesCol), query),
      lit(null).cast("double"))
    val cand = quantized
      .withColumn("__approx", approx)
      .orderBy(col("__approx").desc, col(idCol).asc)
      .limit(shortlist)
      .select(col(idCol))
    val q = array(query.map(v => lit(v)): _*)
    quantized
      .join(broadcast(cand), idCol)
      .withColumn("score", cosine(col(vecCol), q))
      .select(col(idCol), Rounding.halfUp(col("score"), 6).alias("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF-style ANN: coarse quantization by nearest sampled centroid.
    *
    * `buildIvf` samples `nCentroids` corpus vectors deterministically (by
    * lowest id — a stand-in for k-means; centroid quality affects recall,
    * not correctness) and assigns every vector to its nearest centroid via
    * a broadcast of the tiny centroid table. The assignment column
    * partitions the corpus; `ivfTopK` scores only the `nProbe` centroids
    * closest to the query — the classic inverted-file search shape, where
    * scan cost drops from O(corpus) to O(corpus · nProbe / nCentroids). */
  def buildIvf(df: DataFrame, vecCol: String, idCol: String,
      nCentroids: Int = 16): DataFrame = {
    // the centroid table is tiny by construction — fetch it driver-side
    // (one nCentroids-row job) and ship it inside a native argmax
    // expression: assignment becomes a single map-side pass over the
    // corpus, with no ×nCentroids expansion, no shuffle, no window.
    // Null/empty/NaN-poisoned vectors are never centroids (a low-id
    // corrupt row would otherwise occupy a codebook slot whose cell can
    // never self-assign or be probed); corpus-side they assign a null
    // cell and drop out of every probe join.
    val cRows = df.where(col(vecCol).isNotNull && size(col(vecCol)) > 0 &&
        !exists(col(vecCol), x => isnan(x)))
      .orderBy(col(idCol).asc).limit(nCentroids)
      .select(col(idCol), col(vecCol)).collect()
    val cids = cRows.map(_.get(0))
    val cvecs: Seq[Seq[Float]] = cRows.map(_.getSeq[Float](1)).toSeq
    val idx = org.apache.spark.sql.graft.sketch.nearest_centroid(col(vecCol), cvecs)
    df.withColumn("ivf_cell",
      element_at(array(cids.map(c => lit(c)).toIndexedSeq: _*), idx + 1))
  }

  /** Search an IVF-assigned corpus: probe the nProbe nearest cells.
    * Centroid rows are self-assigned (their nearest centroid is
    * themselves), so the probe-cell choice is a map-side filter + top-n —
    * no distinct/self-join shuffle of the corpus. */
  def ivfTopK(ivf: DataFrame, vecCol: String, idCol: String,
      query: Seq[Float], k: Int, nProbe: Int = 4): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    val cells = ivf.filter(col(idCol) === col("ivf_cell"))
      .withColumn("__csim", cosine(col(vecCol), q))
      .orderBy(col("__csim").desc).limit(nProbe)
      .select(col("ivf_cell"))
    ivf.join(broadcast(cells), "ivf_cell")
      .withColumn("score", cosine(col(vecCol), q))
      .select(col(idCol), Rounding.halfUp(col("score"), 6).alias("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** LSH-bucketed ANN top-k over `tables` independent hyperplane tables:
    * per table, probe the query's bucket plus all 1-bit (Hamming-1) flips;
    * candidates are the union across tables, exact-cosine-scored, top-k.
    *
    * Multi-table is what makes the recall dial real: per-table collision
    * probability for a neighbor at angle θ is Binom(planes, θ/π ≤ 1 flip),
    * and T independent tables turn recall r into 1-(1-r)^T. Scan cost stays
    * proportional to probed buckets (tables × (planes+1) buckets), not the
    * corpus — the 100 TB path (signatures would be precomputed/bucketed
    * once for a production index; this computes them in-plan). */
  def lshTopK(
      df: DataFrame, vecCol: String, idCol: String,
      query: Seq[Float], k: Int,
      planes: Int = 6, tables: Int = 8, seed: Long = 42): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    val spark = df.sparkSession
    // the probe set (query signature + 1-bit flips, per table) is tiny and
    // known up front — fetch it with one 1-row job and push it into a
    // map-side isin filter: no corpus × tables explode, no join, no
    // shuffle. The OR short-circuits in codegen, so most rows compute one
    // signature. (A standing index would precompute/bucket signatures;
    // this is the one-off-query path.)
    val sigRow = spark.range(1).select((0 until tables).map(t =>
      org.apache.spark.sql.graft.sketch.hyperplane_signature(q, planes, seed, t)
        .alias(s"s$t")): _*).head()
    val keep = (0 until tables).map { t =>
      val s = sigRow.getInt(t)
      val probes = s +: (0 until planes).map(p => s ^ (1 << p))
      org.apache.spark.sql.graft.sketch.hyperplane_signature(col(vecCol), planes, seed, t)
        .isin(probes.map(Int.box): _*)
    }.reduce(_ || _)
    df.filter(keep)
      .withColumn("score", cosine(col(vecCol), q))
      .select(col(idCol), Rounding.halfUp(col("score"), 6).alias("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
