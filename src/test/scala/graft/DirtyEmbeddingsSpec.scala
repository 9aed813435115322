package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.{Clustering, Embeddings, Similarity}

/** Dirty-embedding robustness: encoder failures produce null rows,
  * zero vectors, NaN components, and truncated (wrong-dimension)
  * vectors. The ANN/quantization/PCA stack must neither throw on them
  * nor let them OUTRANK real neighbors — Spark sorts NaN greater than
  * every double, so an unguarded NaN cosine would put the one corrupt
  * row at the top of every similarity answer in the corpus. */
class DirtyEmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private val query = Seq(1f, 0f, 0f, 0f)

  private def dirty: DataFrame = Seq(
    (1L, Seq(1f, 0f, 0f, 0f)),
    (2L, Seq(0.9f, 0.1f, 0f, 0f)),
    (3L, null.asInstanceOf[Seq[Float]]),
    (4L, Seq.empty[Float]),
    (5L, Seq(0f, 0f, 0f, 0f)),                 // zero vector: cos = 0/0
    (6L, Seq(Float.NaN, 1f, 0f, 0f)),          // NaN poisoned
    (7L, Seq(0.5f, 0.5f)),                     // truncated dimension
    (8L, Seq(0f, 1f, 0f, 0f)))
    .toDF("vec_id", "vec")

  test("cosine yields null, never NaN, on zero/NaN/null vectors") {
    val out = dirty.select(col("vec_id"),
      Similarity.cosine(col("vec"), array(query.map(lit): _*)).as("c"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1).exists(c => math.abs(c - 1.0) < 1e-9))
    assert(out(3).isEmpty && out(4).isEmpty && out(5).isEmpty &&
      out(6).isEmpty, s"dirty rows must score null: $out")
    assert(!out.values.flatten.exists(_.isNaN), "no NaN escapes")
  }

  test("bruteForceTopK ranks only real neighbors; corrupt rows sink") {
    val top = Similarity.bruteForceTopK(dirty, "vec", "vec_id", query, 3)
      .collect()
    assert(top.map(_.getLong(0)).take(2).toSeq == Seq(1L, 2L),
      s"clean nearest first: ${top.toSeq}")
    assert(!top.exists(r => !r.isNullAt(1) && r.getDouble(1).isNaN))
    assert(!top.map(_.getLong(0)).toSet.intersect(Set(3L, 4L, 5L, 6L))
      .nonEmpty, "corrupt rows out of the top-k")
  }

  test("IVF build+probe skip corrupt centroids and corrupt rows") {
    val ivf = Similarity.buildIvf(dirty, "vec", "vec_id", nCentroids = 2)
    val top = Similarity.ivfTopK(ivf, "vec", "vec_id", query, k = 2,
      nProbe = 2).collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(1L, 2L), s"${top.toSeq}")
  }

  test("IVF fit excludes corrupt vectors from the codebook (model health)") {
    // many NaN-poisoned rows so hash-spread init would almost surely
    // sample one if the fit saw the unfiltered corpus — the invariant is
    // the MODEL's (every centroid finite), not any one hash ordering
    val noisy = dirty.unionAll((100L to 140L).map(i =>
      (i, Seq(Float.NaN, i.toFloat, 0f, 0f))).toDF("vec_id", "vec"))
    val idx = Similarity.buildIvf(noisy, "vec", "vec_id", nCentroids = 4)
    assert(idx.model.centroids.nonEmpty)
    assert(idx.model.centroids.forall(c =>
      c.nonEmpty && c.forall(v => !v.isNaN && !v.isInfinite)),
      s"NaN centroid escaped the fit: ${idx.model.centroids}")
    val top = Similarity.ivfTopK(idx, "vec", "vec_id", query, k = 2,
      nProbe = 4).collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(1L, 2L), top.toSeq.toString)
  }

  test("SQ8 quantize+search survive corrupt rows and keep exact ranking") {
    val q8 = Embeddings.scalarQuantize(dirty, "vec")
    val top = Similarity.sq8TopK(q8, "vec", "vec_id", query, k = 2,
      shortlist = 8).collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(1L, 2L), s"${top.toSeq}")
  }

  test("PQ and PCA fits probe dimensionality past corrupt leading rows") {
    // null vector FIRST: the d-probe must skip it; the NaN row (id 6)
    // and the truncated row (id 7) must not poison either model
    val nullFirst = Seq((0L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "vec").unionAll(dirty)
    val pq = Clustering.fitPQ(nullFirst, "vec", "vec_id", m = 2, k = 2)
    assert(pq.codebooks.nonEmpty)
    assert(!pq.codebooks.flatten.flatten.exists(_.isNaN),
      "NaN row must not reach a codebook cell")
    val pca = Embeddings.fitPca(nullFirst, "vec", k = 1)
    assert(!pca.mean.exists(_.isNaN), "NaN row must not reach the moments")
    val proj = dirty.where(col("vec_id") === 1L)
      .select(Embeddings.applyPca(col("vec"), pca).as("p")).collect().head
    val p = proj.getSeq[Float](0)
    assert(p.length == 1 && !p.head.isNaN,
      "clean rows project to finite values")
  }

  test("a truncated LEADING vector must not redefine the corpus dimension") {
    // corrupt dim-2 row first in id order; the modal-dimension probe
    // must still fit on the dim-4 majority
    val truncFirst = Seq((0L, Seq(0.1f, 0.2f)))
      .toDF("vec_id", "vec").unionAll(dirty)
    val pca = Embeddings.fitPca(truncFirst, "vec", k = 1)
    assert(pca.mean.length == 4, "dimension comes from the majority")
    val pq = Clustering.fitPQ(truncFirst, "vec", "vec_id", m = 2, k = 2)
    assert(pq.dSub == 2, "4 dims / 2 subspaces")
  }

  test("meanPool and centroidDrift drop null vectors, keep clean groups") {
    val grouped = dirty.withColumn("g",
      when(col("vec_id") <= 4, "a").otherwise("b"))
    val pooled = Embeddings.meanPool(grouped, Seq("g"), "vec").collect()
    assert(pooled.nonEmpty)
    assert(Embeddings.centroidDrift(grouped, "g", "vec").count() >= 0)
  }
}
