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

  /** Deterministic seeded ±1 random projection to `k` dimensions
    * (Johnson–Lindenstrauss; Achlioptas 2003 sign variant):
    * out_j = Σ_i v_i·sign(h(j,i,seed)) / √k. Distance-preserving in
    * expectation; pair with [[Similarity.cosine]] on the projected
    * vectors. The projection matrix is implicit in the hash — nothing to
    * train, broadcast, or version. */
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
