package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import EntryHelpers._

/** Embedding ops, ANN and layout contract queries + their DuckDB oracles, kept ADJACENT per
  * family (split from the former 5k-line SparkEntry maps — round-9
  * verdict #7: a mis-paired oracle edit was a 5k-line scroll).
  * [[SparkEntry]] aggregates every family and asserts name uniqueness. */
private[graft] object EmbeddingEntries {

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // z-order WRITE gate: a z-ordered layout must shrink the mean
    // per-file min/max span to <70% of a hash-scattered layout on BOTH
    // curve columns at once (single-column sort can only tighten one) —
    // the property that makes parquet footer pruning multi-dimensional.
    // Write/measure run eagerly at plan-build (q_kmeans_reload pattern);
    // spans come from ONE pass per layout via input_file_name().
    "q_zorder_gate" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_quantity")
      val zCols = Seq("l_orderkey", "l_partkey")
      val tmp = java.nio.file.Files.createTempDirectory("graft_zg")
      val ratios = try {
        li.repartition(8, col("l_quantity"))
          .write.mode("overwrite").parquet(s"$tmp/plain")
        pipeline.Layout.writeZOrdered(li, zCols, s"$tmp/zorder", numFiles = 8)
        def meanSpans(path: String): Map[String, Double] = {
          val perFile = s.read.parquet(path)
            .groupBy(input_file_name().alias("__f"))
            .agg(zCols.head -> "min", zCols.head -> "max",
              zCols(1) -> "min", zCols(1) -> "max")
            .drop("__f").collect()
          zCols.zipWithIndex.map { case (c, i) =>
            c -> perFile.map(r =>
              r.getLong(2 * i + 1).toDouble - r.getLong(2 * i)).sum /
              perFile.length
          }.toMap
        }
        val (z, p) = (meanSpans(s"$tmp/zorder"), meanSpans(s"$tmp/plain"))
        zCols.map(c => c -> z(c) / p(c))
      } finally {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(tmp)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
      import s.implicits._
      ratios.map { case (c, r) => (c, r < 0.7) }
        .toDF("column", "within_tol").orderBy("column")
    }),
    // Hilbert WRITE gate: same contract as q_zorder_gate but with the
    // CONTINUOUS curve — range-partitioned Hilbert positions must
    // shrink the mean per-file min/max span to <70% of a hash-scattered
    // layout on BOTH curve columns at once. One pass per layout.
    "q_hilbert_gate" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_quantity")
      val zCols = Seq("l_orderkey", "l_partkey")
      val tmp = java.nio.file.Files.createTempDirectory("graft_hg")
      val ratios = try {
        li.repartition(8, col("l_quantity"))
          .write.mode("overwrite").parquet(s"$tmp/plain")
        pipeline.Layout.writeHilbertOrdered(li, zCols, s"$tmp/hilbert",
          numFiles = 8)
        def meanSpans(path: String): Map[String, Double] = {
          val perFile = s.read.parquet(path)
            .groupBy(input_file_name().alias("__f"))
            .agg(zCols.head -> "min", zCols.head -> "max",
              zCols(1) -> "min", zCols(1) -> "max")
            .drop("__f").collect()
          zCols.zipWithIndex.map { case (c, i) =>
            c -> perFile.map(r =>
              r.getLong(2 * i + 1).toDouble - r.getLong(2 * i)).sum /
              perFile.length
          }.toMap
        }
        val (h, p) = (meanSpans(s"$tmp/hilbert"), meanSpans(s"$tmp/plain"))
        zCols.map(c => c -> h(c) / p(c))
      } finally {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(tmp)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
      import s.implicits._
      ratios.map { case (c, r) => (c, r < 0.7) }
        .toDF("column", "within_tol").orderBy("column")
    }),
    // IVF cell-partitioned persistence gate: a corpus written
    // partitionBy(ivf_cell) must serve a probe's `ivf_cell IN (…)`
    // via PARTITION pruning — the scan's file set shrinks to the probed
    // cells' directories (I/O-level nProbe/nCells, the at-rest half of
    // the IVF story) — and pruning must lose no rows. Eager at
    // plan-build (q_zorder_gate pattern), booleans pinned by the oracle.
    "q_ivf_prune" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val coarse = pipeline.Clustering.fitKMeans(emb, "embedding", "vec_id",
        k = 8, maxIter = 4)
      val corpus = pipeline.Clustering.assign(emb, "embedding", coarse,
        "ivf_cell").select(col("vec_id"), col("ivf_cell"))
      val tmp = java.nio.file.Files.createTempDirectory("graft_ivfp")
      val (filesPruned, rowsOk) = try {
        pipeline.Clustering.writeIvfPartitioned(corpus, s"$tmp/corpus")
        val back = s.read.parquet(s"$tmp/corpus")
        val cells = Seq(0, 1, 2, 3).map(Int.box)
        val pruned = back.filter(col("ivf_cell").isin(cells: _*))
        val totalFiles = back.select(input_file_name()).distinct().count()
        val prunedFiles = pruned.select(input_file_name()).distinct().count()
        val expect = corpus.filter(col("ivf_cell").isin(cells: _*)).count()
        (prunedFiles < totalFiles, pruned.count() == expect)
      } finally {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(tmp)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
      import s.implicits._
      Seq((filesPruned, rowsOk)).toDF("files_pruned", "rows_ok")
    }),
    // Morton z-value (the z-order layout key): pure bit arithmetic, so
    // the oracle replays it exactly — certifies the interleave the
    // writeZOrdered layout path range-partitions on
    "q_zvalue" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          pipeline.Layout.zvalue(Seq(col("l_orderkey"), col("l_partkey")))
            .alias("z"))
        // full-row tiebreaker: (l_orderkey, l_linenumber) is NOT unique in
        // the synthetic lineitem at sf0.1 (118k duplicate pairs), so the
        // bare two-key ORDER BY made the LIMIT nondeterministic between
        // engines (caught by the r14 fresh sf0.1 oracle pass)
        .orderBy("l_orderkey", "l_linenumber", "l_partkey")
        .limit(100)),
    // small-file compaction gate: 64 shards of the documents table
    // rewritten at a 4 MB target must come back as fewer files with the
    // identical row multiset (xor-of-row-hashes + count compare; order
    // is explicitly NOT preserved — parquet dirs are row bags)
    "q_compact_gate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tmp = java.nio.file.Files.createTempDirectory("graft_cg")
      val (nRows, contentOk, compacted) = try {
        docs.repartition(64).write.mode("overwrite").parquet(s"$tmp/small")
        val nOut = pipeline.Layout.compact(s, s"$tmp/small", s"$tmp/compact",
          targetFileBytes = 4L << 20)
        val sig = (p: String) => s.read.parquet(p)
          .agg(count(lit(1)), expr("bit_xor(xxhash64(doc_id, text, lang, source, n_chars))"))
          .head()
        val (a, b) = (sig(s"$tmp/small"), sig(s"$tmp/compact"))
        (a.getLong(0), a == b, nOut < 64)
      } finally {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(tmp)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
      import s.implicits._
      Seq((nRows, contentOk, compacted))
        .toDF("n_rows", "content_ok", "compacted")
    }),
    // chunk->document pooling: element-wise mean embedding per label.
    // Emitted long-form (label, i, mv) — the driver's checker sorts cells
    // and cannot hash array-typed columns, so the pooled vector is
    // exploded back to scalars for comparison (operator output unchanged).
    // embedding-space drift: pairwise centroid cosine between label
    // slices — one meanPool pass, cosines on the bounded centroid table
    "q_embed_drift" -> ((s, dir) =>
      pipeline.Embeddings.centroidDrift(t(s, dir, "embeddings"), "label",
        "embedding")
        .orderBy("slice_a", "slice_b")),
    "q_pool" -> ((s, dir) =>
      pipeline.Embeddings.meanPool(t(s, dir, "embeddings"),
        Seq("label"), "embedding")
        .select(col("label"), posexplode(col("vec")).as(Seq("i", "mv")))
        .select(col("label"), col("i").cast("long").alias("i"), col("mv"))
        .orderBy("label", "i")),
    // SQ8 embedding quantization: per-vector (min,max) + int codes, exact
    // floor-half-up arithmetic replayed by the oracle. Codes emitted as a
    // comma-joined string (driver checker can't hash array cells).
    "q_sq" -> ((s, dir) =>
      pipeline.Embeddings.scalarQuantize(t(s, dir, "embeddings"), "embedding")
        .select(col("vec_id"), col("q_min"), col("q_max"),
          array_join(col("codes"), ",").alias("codes"))
        .orderBy("vec_id")),
    // Johnson-Lindenstrauss gate: seeded +-1 projection to k=32 preserves
    // pairwise cosine within a deterministic bound on fixed vector pairs
    // (the projection hash is engine-specific, so the oracle pins the
    // booleans, recall-gate style)
    "q_rp_gate" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
        .filter(col("vec_id").isin(0L, 1L, 7L, 42L))
        .select(col("vec_id"), col("embedding"),
          pipeline.Embeddings.randomProject(col("embedding"), 32).alias("proj"))
      val a = emb.select(col("vec_id").alias("ia"),
        col("embedding").alias("ea"), col("proj").alias("pa"))
      val b = emb.select(col("vec_id").alias("ib"),
        col("embedding").alias("eb"), col("proj").alias("pb"))
      a.join(b, col("ia") < col("ib"))
        .select(col("ia"), col("ib"),
          (abs(pipeline.Similarity.cosine(col("ea"), col("eb")) -
            pipeline.Similarity.cosine(col("pa"), col("pb"))) < 0.45)
            .alias("within_bound"))
        .orderBy("ia", "ib")
    }),
    // PCA gate: data-fit rotation must hold the same per-pair cosine
    // distortion bound as the JL projection (q_rp_gate) at equal k —
    // the basis is learned in ONE bounded-state corpus pass
    "q_pca_gate" -> ((s, dir) => {
      val full = t(s, dir, "embeddings")
      val model = pipeline.Embeddings.fitPca(full, "embedding", k = 32)
      val emb = full.filter(col("vec_id").isin(0L, 1L, 7L, 42L))
        .select(col("vec_id"), col("embedding"),
          pipeline.Embeddings.applyPca(col("embedding"), model).alias("proj"))
      val a = emb.select(col("vec_id").alias("ia"),
        col("embedding").alias("ea"), col("proj").alias("pa"))
      val b = emb.select(col("vec_id").alias("ib"),
        col("embedding").alias("eb"), col("proj").alias("pb"))
      a.join(b, col("ia") < col("ib"))
        .select(col("ia"), col("ib"),
          (abs(pipeline.Similarity.cosine(col("ea"), col("eb")) -
            pipeline.Similarity.cosine(col("pa"), col("pb"))) < 0.45)
            .alias("within_bound"))
        .orderBy("ia", "ib")
    }),
    // embedding cosine scores vs the vec_id=0 vector (brute-force baseline)
    "q_embed_scores" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0)
      pipeline.Similarity.scoreAll(emb, "embedding", q)
        .filter(col("vec_id") < 200)
        .select(col("vec_id"), pipeline.Rounding.halfUp(col("score"), 6).alias("score"))
        .orderBy("vec_id")
    }),
    // Batched k-NN join: every query row gets its top-5 corpus
    // neighbors in ONE corpus pass (per-row probe-cell expression →
    // cell equi-join with broadcast queries → windowed top-k with
    // group-limit pushdown). nProbe = all 8 cells ⇒ no pruning ⇒ the
    // result is exact and the oracle replays it as a per-query cosine
    // window in SQL.
    "q_knn_join" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val coarse = pipeline.Clustering.fitKMeans(emb, "embedding", "vec_id",
        k = 8, maxIter = 4)
      val corpus = pipeline.Clustering.assign(emb, "embedding", coarse,
        "ivf_cell")
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").alias("q_id"), col("embedding").alias("q_vec"))
      pipeline.Clustering.knnJoin(corpus, queries, "embedding", "vec_id",
        "q_id", "q_vec", coarse, k = 5, nProbe = 8)
        .orderBy("q_id", "rn")
    }),
    // contrastive hard negatives: per query, top-5 most-similar vectors
    // with a DIFFERENT label (filter before rank); nProbe=8 covers all
    // cells → exact, so the brute-force oracle replays it
    "q_hardneg" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val coarse = pipeline.Clustering.fitKMeans(emb, "embedding", "vec_id",
        k = 8, maxIter = 4)
      val corpus = pipeline.Clustering.assign(emb, "embedding", coarse,
        "ivf_cell")
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").alias("q_id"), col("embedding").alias("q_vec"),
          col("label").alias("q_label"))
      pipeline.Clustering.hardNegatives(corpus, queries, "embedding",
        "vec_id", "label", "q_id", "q_vec", "q_label", coarse,
        k = 5, nProbe = 8)
        .orderBy("q_id", "rn")
    }),
    // SQ8 compressed-scan top-k: the full-corpus scan reads int8 codes
    // only (codegen'd Σ q_i·code_i + affine min/max correction); a
    // 100-candidate shortlist re-ranks with exact cosine on floats.
    // SQ8 quantization error (64 dims, per-vector min/max) is far too
    // small to push a true top-10 vector out of the approx top-100, so
    // the result is EXACT — the oracle replays the exact cosine top-10
    // in SQL, no pinned boolean needed.
    "q_sq8_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0)
      val quant = pipeline.Embeddings.scalarQuantize(emb, "embedding")
      pipeline.Similarity.sq8TopK(quant, "embedding", "vec_id", q,
        k = 10, shortlist = 100)
    }),
    // ANN recall gates: overlap@10 of the approximate result vs the exact
    // brute-force top-k, emitted as a quality boolean the oracle pins —
    // turns the approximate operators into checked signals
    // Multi-point gates (round-2 verdict #8): three query vectors, each
    // must individually reach overlap@10 ≥ 8 — a regression on any one
    // point flips its row and fails the oracle compare.
    // Batched protocol (r15 verdict item 5): the per-point loop ran one
    // driver head() and one corpus-scan subtree PER probe point — N
    // driver round-trips and a union of N scans. The probe set is data:
    // ONE collect fetches every query vector, the brute-force and LSH
    // sides each run as ONE scan over all points (per-query
    // window-group-limit top-k), and a left join against the point list
    // restores the always-one-row-per-point certification contract.
    // Per-point rows are identical (same ordering, rounding, tie-break,
    // ≥8 bar) — the protocol changed shape, not semantics.
    "q_ann_recall" -> ((s, dir) => {
      val emb = certGuard(t(s, dir, "embeddings"), "q_ann_recall")
      val qvecs = recallQueryVecs(emb)
      val brute = pipeline.Similarity.bruteForceTopKBatch(
        emb, "embedding", "vec_id", qvecs, k = 10)
        .select(col("query_id"), col("vec_id"))
      val ann = pipeline.Similarity.lshTopKBatch(
        emb, "embedding", "vec_id", qvecs, k = 10)
        .select(col("query_id"), col("vec_id"))
      val counts = ann.join(brute, Seq("query_id", "vec_id"))
        .groupBy("query_id").agg(count(lit(1)).as("__cnt"))
      recallPointList(s).join(broadcast(counts), Seq("query_id"), "left")
        .select(col("query_id"), lit(10).alias("k"),
          (coalesce(col("__cnt"), lit(0L)) >= 8).alias("recall_ok"))
        .orderBy("query_id")
    }),
    "q_ivf_recall" -> ((s, dir) => {
      val emb = certGuard(t(s, dir, "embeddings"), "q_ivf_recall")
      // default dial: k-means centroids, k = ceil(sqrt(n)) — the gate
      // certifies the production path, not a hand-tuned k. The output is
      // the EXACT overlap@10 per query point (the whole pipeline is
      // deterministic), golden-pinned: any drift in the fit, the
      // assignment or the probe selection flips a row. On this corpus
      // (isotropic random vectors, no cluster structure) the absolute
      // numbers are fraction-bound — the clustered-geometry recall
      // evidence lives in SCALE100X_ANN.json / the bench ann_frontier.
      // Batched like q_ann_recall: one collect, one scan per side.
      val ivf = pipeline.Similarity.buildIvf(emb, "embedding", "vec_id")
      val qvecs = recallQueryVecs(emb)
      val brute = pipeline.Similarity.bruteForceTopKBatch(
        emb, "embedding", "vec_id", qvecs, k = 10)
        .select(col("query_id"), col("vec_id"))
      val approx = pipeline.Similarity.ivfTopKBatch(
        ivf, "embedding", "vec_id", qvecs, k = 10, nProbe = 4)
        .select(col("query_id"), col("vec_id"))
      val counts = approx.join(brute, Seq("query_id", "vec_id"))
        .groupBy("query_id").agg(count(lit(1)).as("__cnt"))
      recallPointList(s).join(broadcast(counts), Seq("query_id"), "left")
        .select(col("query_id"), lit(10).alias("k"),
          coalesce(col("__cnt"), lit(0L)).cast("int").alias("overlap10"))
        .orderBy("query_id")
    }),
    // spherical k-means over the embedding corpus: per-cluster histogram
    // (size + min-id representative). Hash-seeded init + bounded
    // iterations make the model deterministic; the oracle golden-pins
    // the histogram (assignment itself is argmax-cosine, not SQL-replayable)
    "q_kmeans" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val model = pipeline.Clustering.fitKMeans(emb, "embedding", "vec_id",
        k = 8, maxIter = 4)
      pipeline.Clustering.assign(emb, "embedding", model)
        .groupBy(col("cluster"))
        .agg(count(lit(1)).alias("n"), min(col("vec_id")).alias("rep"))
        .orderBy("cluster")
    }),
    // k-means model persistence gate: fit → write → reload must
    // reproduce the fitted model's assignment EXACTLY (at 100 TB you fit
    // once and reuse the model across sessions — cell-id stability after
    // a round trip is the property that makes a persisted IVF corpus
    // valid without reassignment). Write/read are eager, so the temp
    // model dir is deleted before the gate plan even runs.
    "q_kmeans_reload" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val model = pipeline.Clustering.fitKMeans(emb, "embedding", "vec_id",
        k = 8, maxIter = 4)
      val tmp = java.nio.file.Files.createTempDirectory("graft_kmeans")
      val re = try {
        pipeline.Clustering.writeKMeansModel(model, tmp.toString, s)
        pipeline.Clustering.readKMeansModel(s, tmp.toString)
      } finally {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(tmp)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
      val a1 = pipeline.Clustering.assign(emb, "embedding", model)
        .select(col("vec_id"), col("cluster").alias("c1"))
      val a2 = pipeline.Clustering.assign(emb, "embedding", re)
        .select(col("vec_id"), col("cluster").alias("c2"))
      a1.join(a2, "vec_id")
        .agg((count(lit(1)) > 0 &&
          sum(when(col("c1") === col("c2"), 0L).otherwise(1L)) === 0L)
          .alias("reload_ok"))
    }),
    // PQ recall gate: ADC shortlist-100 + exact re-rank must overlap the
    // exact cosine top-10 in ≥8 of 10 (m=16 subspaces × 16 centroids =
    // 64-bit codes; corpus vectors are unit-norm so inner-product ADC
    // approximates cosine directly). Raw ADC ranking cannot separate
    // this corpus's near-tied scores — which is exactly why the
    // production shape is shortlist + re-rank, and what this gate
    // certifies end-to-end. Boolean pinned by the oracle.
    "q_pq_recall" -> ((s, dir) => {
      val emb = certGuard(t(s, dir, "embeddings"), "q_pq_recall")
      val model = pipeline.Clustering.fitPQ(emb, "embedding", "vec_id",
        m = 16, k = 16, maxIter = 4)
      val codes = pipeline.Clustering.assignPQ(emb, "embedding", model)
        .select("vec_id", "pq_code")
      val q = emb.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0)
      val rr = pipeline.Clustering.pqTopKRerank(codes, emb, "embedding",
        "vec_id", model, q, k = 10, shortlist = 100).select(col("vec_id"))
      val brute = pipeline.Similarity.bruteForceTopK(emb, "embedding",
        "vec_id", q, k = 10).select(col("vec_id"))
      rr.join(brute, "vec_id")
        .agg((count(lit(1)) >= 8).alias("recall_ok"))
        .select(lit(0L).alias("query_id"), lit(10).alias("k"), col("recall_ok"))
    }),
    // PQ at PRODUCTION parameters: k=256 centroids per subspace (8-bit
    // codes; with m=8 over d=64 that's the standard 64-bit PQ code of
    // Jégou 2011 §V) — the k=16 gate above cannot see k-dependent bugs
    // (code packing past signed-byte range, duplicate-centroid
    // tie-breaking when k approaches the training-set size), this one
    // can. Same end-to-end shape: ADC shortlist + exact re-rank vs the
    // exact cosine top-10. Boolean pinned by the oracle.
    "q_pq256_recall" -> ((s, dir) => {
      val emb = certGuard(t(s, dir, "embeddings"), "q_pq256_recall")
      val model = pipeline.Clustering.fitPQ(emb, "embedding", "vec_id",
        m = 8, k = 256, maxIter = 4)
      val codes = pipeline.Clustering.assignPQ(emb, "embedding", model)
        .select("vec_id", "pq_code")
      val q = emb.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0)
      val rr = pipeline.Clustering.pqTopKRerank(codes, emb, "embedding",
        "vec_id", model, q, k = 10, shortlist = 100).select(col("vec_id"))
      val brute = pipeline.Similarity.bruteForceTopK(emb, "embedding",
        "vec_id", q, k = 10).select(col("vec_id"))
      rr.join(brute, "vec_id")
        .agg((count(lit(1)) >= 8).alias("recall_ok"))
        .select(lit(0L).alias("query_id"), lit(10).alias("k"), col("recall_ok"))
    }),
    // IVF-PQ recall gate: the full billion-vector-ANN layout end-to-end
    // — coarse cells prune the scan (nProbe=4 of 8), ADC scores codes
    // inside the probed cells, shortlist re-ranks exactly; ≥7 of the
    // exact cosine top-10 must survive BOTH the cell pruning and the
    // quantization. Boolean pinned by the oracle.
    "q_ivfpq_recall" -> ((s, dir) => {
      val emb = certGuard(t(s, dir, "embeddings"), "q_ivfpq_recall")
      val coarse = pipeline.Clustering.fitKMeans(emb, "embedding", "vec_id",
        k = 8, maxIter = 4)
      val pq = pipeline.Clustering.fitPQ(emb, "embedding", "vec_id",
        m = 16, k = 16, maxIter = 4)
      val corpus = pipeline.Clustering.buildIvfPq(emb, "embedding", coarse, pq)
      val q = emb.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0)
      val got = pipeline.Clustering.ivfPqTopK(corpus, "embedding", "vec_id",
        coarse, pq, q, k = 10, nProbe = 4, shortlist = 100)
        .select(col("vec_id"))
      val brute = pipeline.Similarity.bruteForceTopK(emb, "embedding",
        "vec_id", q, k = 10).select(col("vec_id"))
      got.join(brute, "vec_id")
        .agg((count(lit(1)) >= 7).alias("recall_ok"))
        .select(lit(0L).alias("query_id"), lit(10).alias("k"), col("recall_ok"))
    }),
    // RESIDUAL IVF-PQ (IVFADC, Jégou 2011 §IV-A): codes quantize
    // x − centroid[cell], so the code budget covers within-cell detail
    // instead of re-encoding cell position; search corrects ADC with the
    // per-cell ⟨q, centroid⟩ constant (inner-product decomposition — one
    // LUT, one scan, no per-cell branches). Same ≥7/10 bar as the raw
    // layout through the same pruning and quantization.
    "q_ivfpq_res_recall" -> ((s, dir) => {
      val emb = certGuard(t(s, dir, "embeddings"), "q_ivfpq_res_recall")
      val coarse = pipeline.Clustering.fitKMeans(emb, "embedding", "vec_id",
        k = 8, maxIter = 4)
      val pq = pipeline.Clustering.fitResidualPQ(emb, "embedding", "vec_id",
        coarse, m = 16, k = 16, maxIter = 4)
      val corpus = pipeline.Clustering.buildIvfPqResidual(
        emb, "embedding", coarse, pq)
      val q = emb.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0)
      val got = pipeline.Clustering.ivfPqResidualTopK(corpus, "embedding",
        "vec_id", coarse, pq, q, k = 10, nProbe = 4, shortlist = 100)
        .select(col("vec_id"))
      val brute = pipeline.Similarity.bruteForceTopK(emb, "embedding",
        "vec_id", q, k = 10).select(col("vec_id"))
      got.join(brute, "vec_id")
        .agg((count(lit(1)) >= 7).alias("recall_ok"))
        .select(lit(0L).alias("query_id"), lit(10).alias("k"), col("recall_ok"))
    }),
    // ANN top-k (LSH multiprobe; approximate by design — the exact result
    // on this dataset is deterministic, so the oracle golden-pins it)
    "q_ann_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0)
      pipeline.Similarity.lshTopK(emb, "embedding", "vec_id", q, k = 10)
    }),
    // IVF ANN: coarse cells + nProbe search (approximate — deterministic
    // on this dataset, golden-pinned like q_ann_topk)
    "q_ivf_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0)
      val ivf = pipeline.Similarity.buildIvf(emb, "embedding", "vec_id")
      pipeline.Similarity.ivfTopK(ivf, "embedding", "vec_id", q, k = 10, nProbe = 4)
    }),
  )

  val oracles: Seq[(String, String)] = Seq(
    "q_zvalue" ->
      """SELECT l_orderkey, l_linenumber, l_partkey,
           list_sum(list_transform(generate_series(0, 31), i ->
             (((l_orderkey >> i) & 1) << (2*i))
             + (((l_partkey >> i) & 1) << (2*i + 1))))::BIGINT AS z
         FROM lineitem
         ORDER BY l_orderkey, l_linenumber, l_partkey LIMIT 100""",
    "q_compact_gate" ->
      """SELECT count(*)::BIGINT AS n_rows, true AS content_ok,
           true AS compacted
         FROM documents""",
    "q_embed_scores" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         SELECT vec_id, floor((
           list_sum(list_transform(generate_series(1, len(embedding)),
             i -> embedding[i]::DOUBLE * qe[i]::DOUBLE)) /
           (sqrt(list_sum(list_transform(generate_series(1, len(embedding)),
             i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) *
            sqrt(list_sum(list_transform(generate_series(1, len(qe)),
             i -> qe[i]::DOUBLE * qe[i]::DOUBLE))))) * 1e6 + 0.5) / 1e6 AS score
         FROM embeddings, q WHERE vec_id < 200 ORDER BY vec_id""",
    "q_knn_join" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS qe
                    FROM embeddings WHERE vec_id < 3),
         scored AS (
           SELECT q.q_id, e.vec_id, floor((
             list_sum(list_transform(generate_series(1, len(e.embedding)),
               i -> e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE)) /
             (sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)),
               i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))) *
              sqrt(list_sum(list_transform(generate_series(1, len(q.qe)),
               i -> q.qe[i]::DOUBLE * q.qe[i]::DOUBLE))))) * 1e6 + 0.5) / 1e6 AS score
           FROM embeddings e, q)
         SELECT q_id, vec_id, score, rn FROM (
           SELECT *, row_number() OVER (PARTITION BY q_id
             ORDER BY score DESC, vec_id ASC)::INT AS rn FROM scored)
         WHERE rn <= 5 ORDER BY q_id, rn""",
    "q_hardneg" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS qe, label AS ql
                    FROM embeddings WHERE vec_id < 3),
         scored AS (
           SELECT q.q_id, e.vec_id, e.label, floor((
             list_sum(list_transform(generate_series(1, len(e.embedding)),
               i -> e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE)) /
             (sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)),
               i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))) *
              sqrt(list_sum(list_transform(generate_series(1, len(q.qe)),
               i -> q.qe[i]::DOUBLE * q.qe[i]::DOUBLE))))) * 1e6 + 0.5) / 1e6 AS score
           FROM embeddings e, q WHERE e.label <> q.ql)
         SELECT q_id, vec_id, label, score, rn FROM (
           SELECT *, row_number() OVER (PARTITION BY q_id
             ORDER BY score DESC, vec_id ASC)::INT AS rn FROM scored)
         WHERE rn <= 5 ORDER BY q_id, rn""",
    "q_sq8_topk" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         scored AS (
           SELECT vec_id, floor((
             list_sum(list_transform(generate_series(1, len(embedding)),
               i -> embedding[i]::DOUBLE * qe[i]::DOUBLE)) /
             (sqrt(list_sum(list_transform(generate_series(1, len(embedding)),
               i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) *
              sqrt(list_sum(list_transform(generate_series(1, len(qe)),
               i -> qe[i]::DOUBLE * qe[i]::DOUBLE))))) * 1e6 + 0.5) / 1e6 AS score
           FROM embeddings, q)
         SELECT vec_id, score FROM scored
         ORDER BY score DESC, vec_id ASC LIMIT 10""",
    "q_ann_recall" ->
      """SELECT * FROM (VALUES (0, 10, CAST(true AS BOOLEAN)),
                              (7, 10, CAST(true AS BOOLEAN)),
                              (42, 10, CAST(true AS BOOLEAN)))
         AS t(query_id, k, recall_ok) ORDER BY query_id""",
    "q_kmeans_reload" ->
      """SELECT CAST(true AS BOOLEAN) AS reload_ok""",
    "q_pq_recall" ->
      """SELECT 0::BIGINT AS query_id, 10 AS k,
           CAST(true AS BOOLEAN) AS recall_ok""",
    "q_pq256_recall" ->
      """SELECT 0::BIGINT AS query_id, 10 AS k,
           CAST(true AS BOOLEAN) AS recall_ok""",
    "q_ivfpq_recall" ->
      """SELECT 0::BIGINT AS query_id, 10 AS k,
           CAST(true AS BOOLEAN) AS recall_ok""",
    "q_ivfpq_res_recall" ->
      """SELECT 0::BIGINT AS query_id, 10 AS k,
           CAST(true AS BOOLEAN) AS recall_ok""",
    "q_ivf_prune" ->
      """SELECT CAST(true AS BOOLEAN) AS files_pruned,
                CAST(true AS BOOLEAN) AS rows_ok""",
    "q_zorder_gate" ->
      """SELECT c AS "column", CAST(true AS BOOLEAN) AS within_tol
         FROM (SELECT unnest(['l_orderkey', 'l_partkey']) AS c)
         ORDER BY "column"""",
    "q_hilbert_gate" ->
      """SELECT c AS "column", CAST(true AS BOOLEAN) AS within_tol
         FROM (SELECT unnest(['l_orderkey', 'l_partkey']) AS c)
         ORDER BY "column"""",
    "q_ann_topk" ->
      """SELECT * FROM (VALUES
           (0::BIGINT, 1.0::DOUBLE),
           (365::BIGINT, 0.369994::DOUBLE),
           (334::BIGINT, 0.362722::DOUBLE),
           (387::BIGINT, 0.331139::DOUBLE),
           (73::BIGINT, 0.295434::DOUBLE),
           (7::BIGINT, 0.292842::DOUBLE),
           (320::BIGINT, 0.287861::DOUBLE),
           (190::BIGINT, 0.281795::DOUBLE),
           (464::BIGINT, 0.276628::DOUBLE),
           (483::BIGINT, 0.2567::DOUBLE))
         AS t(vec_id, score) ORDER BY score DESC, vec_id""",
    "q_ivf_topk" ->
      """SELECT * FROM (VALUES
           (0::BIGINT, 1.0::DOUBLE),
           (365::BIGINT, 0.369994::DOUBLE),
           (334::BIGINT, 0.362722::DOUBLE),
           (387::BIGINT, 0.331139::DOUBLE),
           (423::BIGINT, 0.296934::DOUBLE),
           (73::BIGINT, 0.295434::DOUBLE),
           (320::BIGINT, 0.287861::DOUBLE),
           (190::BIGINT, 0.281795::DOUBLE),
           (464::BIGINT, 0.276628::DOUBLE),
           (388::BIGINT, 0.276301::DOUBLE))
         AS t(vec_id, score) ORDER BY score DESC, vec_id""",
    "q_ivf_recall" ->
      """SELECT * FROM (VALUES (0, 10, 9),
                              (7, 10, 7),
                              (42, 10, 3))
         AS t(query_id, k, overlap10) ORDER BY query_id""",
    "q_embed_drift" ->
      """WITH e AS (SELECT label, unnest(embedding) AS v,
             unnest(generate_series(1, len(embedding)))::BIGINT AS i
           FROM embeddings),
         c AS (SELECT label, i, floor(avg(v::DOUBLE) * 1e6 + 0.5) / 1e6 AS m
               FROM e GROUP BY label, i),
         vv AS (SELECT label, list(m ORDER BY i) AS vec FROM c GROUP BY label),
         p AS (SELECT a.label AS slice_a, b.label AS slice_b,
                 list_sum(list_transform(generate_series(1, len(a.vec)),
                   i -> a.vec[i] * b.vec[i])) AS dt,
                 sqrt(list_sum(list_transform(generate_series(1, len(a.vec)),
                   i -> a.vec[i] * a.vec[i]))) AS na,
                 sqrt(list_sum(list_transform(generate_series(1, len(b.vec)),
                   i -> b.vec[i] * b.vec[i]))) AS nb
               FROM vv a, vv b WHERE a.label < b.label)
         SELECT slice_a, slice_b,
           floor(dt / (na * nb) * 1e6 + 0.5) / 1e6 AS cosine
         FROM p ORDER BY slice_a, slice_b""",
    "q_pool" ->
      """WITH e AS (SELECT label, unnest(embedding) AS v,
             unnest(generate_series(1, len(embedding)))::BIGINT AS i
           FROM embeddings)
         SELECT label, i - 1 AS i,
           floor(avg(v::DOUBLE) * 1e6 + 0.5) / 1e6 AS mv
         FROM e GROUP BY label, i ORDER BY label, i""",
    "q_sq" ->
      """SELECT vec_id, list_min(embedding)::DOUBLE AS q_min,
           list_max(embedding)::DOUBLE AS q_max,
           array_to_string(CASE WHEN list_max(embedding) = list_min(embedding)
             THEN list_transform(embedding, x -> 0)
             ELSE list_transform(embedding, x ->
               floor((x::DOUBLE - list_min(embedding)::DOUBLE) /
                 (list_max(embedding)::DOUBLE - list_min(embedding)::DOUBLE)
                 * 255.0 + 0.5)::INT) END, ',') AS codes
         FROM embeddings ORDER BY vec_id""",
    "q_pca_gate" ->
      """SELECT * FROM (VALUES
           (0::BIGINT, 1::BIGINT, CAST(true AS BOOLEAN)),
           (0::BIGINT, 7::BIGINT, CAST(true AS BOOLEAN)),
           (0::BIGINT, 42::BIGINT, CAST(true AS BOOLEAN)),
           (1::BIGINT, 7::BIGINT, CAST(true AS BOOLEAN)),
           (1::BIGINT, 42::BIGINT, CAST(true AS BOOLEAN)),
           (7::BIGINT, 42::BIGINT, CAST(true AS BOOLEAN)))
         AS t(ia, ib, within_bound) ORDER BY ia, ib""",
    "q_rp_gate" ->
      """SELECT * FROM (VALUES
           (0::BIGINT, 1::BIGINT, CAST(true AS BOOLEAN)),
           (0::BIGINT, 7::BIGINT, CAST(true AS BOOLEAN)),
           (0::BIGINT, 42::BIGINT, CAST(true AS BOOLEAN)),
           (1::BIGINT, 7::BIGINT, CAST(true AS BOOLEAN)),
           (1::BIGINT, 42::BIGINT, CAST(true AS BOOLEAN)),
           (7::BIGINT, 42::BIGINT, CAST(true AS BOOLEAN)))
         AS t(ia, ib, within_bound) ORDER BY ia, ib""",
    // golden pin (sf0.01): the deterministic k-means cluster histogram —
    // argmax-cosine assignment is not SQL-replayable, the pin catches drift
    "q_kmeans" ->
      """SELECT * FROM (VALUES
           (0::INTEGER, 62::BIGINT, 3::BIGINT),
           (1::INTEGER, 64::BIGINT, 11::BIGINT),
           (2::INTEGER, 70::BIGINT, 1::BIGINT),
           (3::INTEGER, 65::BIGINT, 4::BIGINT),
           (4::INTEGER, 67::BIGINT, 0::BIGINT),
           (5::INTEGER, 61::BIGINT, 21::BIGINT),
           (6::INTEGER, 53::BIGINT, 8::BIGINT),
           (7::INTEGER, 58::BIGINT, 10::BIGINT))
         AS t(cluster, n, rep) ORDER BY cluster""",
  )
}
