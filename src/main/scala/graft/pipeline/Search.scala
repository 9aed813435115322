package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text relevance search (BM25) over a document corpus.
  *
  * Okapi BM25 (Robertson & Zaragoza, "The Probabilistic Relevance
  * Framework: BM25 and Beyond", FnTIR 2009):
  *
  *   score(d, q) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
  *   idf(t)      = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))
  *
  * Plan shape (the part that matters at 100 TB): the query's term set is a
  * tiny literal, so there is no inverted-index join at all — per-term
  * `tf` is a map-side array fold over the document's own tokens, and the
  * only corpus-wide facts the formula needs (N, avgdl, per-term df) fit in
  * ONE row, computed by a single partial-aggregated pass and broadcast
  * back with a 1-row nested-loop join. Net: two corpus scans (stats +
  * score), zero shuffles of document data, and the final top-k is
  * TakeOrderedAndProject — no global sort. A standing search service
  * would precompute postings; this is the right shape for ad-hoc scoring
  * inside a pipeline.
  *
  * Determinism: N, df are longs; doc lengths are integers, so `sum(dl)` is
  * exact and avgdl = sum/count is one IEEE division — every engine
  * computes bit-identical stats, and the per-row score is a fixed-order
  * sum over the query terms (the DuckDB oracle replays the identical
  * arithmetic).
  */
object Search {

  /** Score every document against a bag-of-words query; columns
    * (`idCol`, `score`). Tokenization is lowercased whitespace split —
    * the corpus-wide baseline in [[TextAnalysis.tokens]]. */
  def bm25ScoreAll(
      df: DataFrame, textCol: String, idCol: String,
      query: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "query must contain at least one term")
    val terms = query.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    // Scans.spread (no-op at scale, r16): the tokenize feeding BOTH the
    // stats pass and the scoring pass otherwise runs twice on the scan's
    // single local split. Stats are exact integer aggregates and scores
    // are rounded per row, so results are partition-invariant.
    val base = Scans.spread(
        df.select(col(idCol), col(textCol).as("__btx")), col(idCol))
      .select(col(idCol),
        TextAnalysis.tokens(lower(col("__btx"))).as("__tk"))
      .withColumn("__dl", size(col("__tk")).cast("long"))
    // one row: N, Σdl, df per query term (integer partial aggregates —
    // map-side combine makes the stats pass one tiny shuffle of counters)
    val dfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(array_contains(col("__tk"), t), 1L).otherwise(0L)).as(s"__df$i")
    }
    val stats = base.agg(
      count(lit(1)).as("__n"),
      (sum(col("__dl")).as("__sumdl") +: dfCols): _*)
    val n = col("__n").cast("double")
    val avgdl = col("__sumdl").cast("double") / n
    val score = terms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(col("__tk"), x => x === lit(t))).cast("double")
      val dft = col(s"__df$i").cast("double")
      val idf = log(lit(1.0) + (n - dft + 0.5) / (dft + 0.5))
      // evaluation order is pinned left-to-right so the DuckDB oracle can
      // replay bit-identical IEEE arithmetic
      idf * tf * (k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl").cast("double") / avgdl))
    }.reduce(_ + _)
    base.crossJoin(broadcast(stats))
      .select(col(idCol), Rounding.halfUp(score, 6).as("score"))
  }

  /** Top-k BM25 hits (score-descending, id tiebreak). Only documents
    * containing at least one query term score above zero; zero-score rows
    * are dropped so k never pads with non-matches. */
  def bm25TopK(
      df: DataFrame, textCol: String, idCol: String,
      query: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25ScoreAll(df, textCol, idCol, query, k1, b)
      .filter(col("score") > 0.0)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)

  /** md5-prefix bucket of a term — deterministic across sessions, so a
    * probe can compute which partitions hold its terms without reading
    * anything. */
  private def termBucket(t: String, buckets: Int): Int =
    (java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(t).substring(0, 8),
      16) % buckets).toInt

  private def termBucketCol(c: Column, buckets: Int): Column =
    (conv(substring(md5(c), 1, 8), 16, 10).cast("long") % buckets).cast("int")

  /** Build a PERSISTED inverted text index: postings (doc, dl, term,
    * tf) and the per-term document frequencies, both written
    * partitioned by a term-hash bucket, plus a 1-row corpus-stats
    * table — the text sibling of the IVF cell-partitioned vector store
    * ([[Clustering]]): build once over the 100 TB corpus, then serve
    * every query from the few bucket partitions its terms hash to
    * (file-level partition pruning; no corpus rescans, ever). Postings
    * are one explode + (doc, term) hash aggregate — the same shape as
    * every n-gram count in this library. */
  def buildTextIndex(df: DataFrame, textCol: String, idCol: String,
      path: String, buckets: Int = 64): Unit = {
    require(buckets > 0, "buckets must be positive")
    // Scans.spread before the tokenize kernel (no-op at scale); outer
    // explode + null-filter avoids the inferred Generate guard
    // re-tokenizing at the scan (see Dedup)
    val toks = Scans.spread(
        df.select(col(idCol).as("doc_id"), col(textCol).as("__ti")),
        col("doc_id"))
      .select(col("doc_id"),
        TextAnalysis.tokens(lower(col("__ti"))).as("__tk"))
      .withColumn("dl", size(col("__tk")).cast("long"))
    val postings = toks
      .select(col("doc_id"), col("dl"),
        explode_outer(col("__tk")).as("term"))
      .filter(col("term").isNotNull)
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bkt", termBucketCol(col("term"), buckets))
    // cluster each bucket's rows before the partitioned write (r15
    // optimization round, guide §6): an unclustered partitionBy fans
    // every shuffle partition across every bucket directory — up to
    // (shuffle partitions × buckets) tiny files, paid again by every
    // probe's listing/open. After the bkt repartition a bucket is one
    // task → one file per bucket (a real deployment additionally caps
    // file size via spark.sql.files.maxRecordsPerFile; the layout stays
    // correct either way — the probe prunes on the directory key).
    postings.repartition(col("bkt")).write.partitionBy("bkt")
      .mode("overwrite").parquet(s"$path/postings")
    // derive per-term df from the JUST-WRITTEN postings instead of
    // re-running the corpus scan + explode + (doc, dl, term) aggregate a
    // second time (guide §1.2 — don't recompute what is already on
    // disk): the read-back prunes to (term, bkt) and arrives already
    // clustered by bucket. PRECONDITION (r15 advice): this trusts the
    // just-committed directory listing, which is exact on HDFS/local
    // (atomic rename; `overwrite` cleared the dir first). On an
    // object store without atomic visibility, or if a concurrent writer
    // could leave stray files under $path/postings, stray rows would
    // inflate df — build to a fresh path there, or derive df from the
    // postings DataFrame at the cost of the second corpus scan.
    df.sparkSession.read.parquet(s"$path/postings")
      .groupBy(col("term"), col("bkt"))
      .agg(count(lit(1)).as("df"))
      .repartition(col("bkt")).write.partitionBy("bkt")
      .mode("overwrite").parquet(s"$path/df")
    toks.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"),
        lit(buckets).as("buckets"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Append a document batch to a standing [[buildTextIndex]] store —
    * the nightly-ingest path: cost ∝ the BATCH (its postings/df rows
    * append into the same bucket partitions; the 1-row stats table is
    * the only rewrite). df rows are ADDITIVE by design — the probe sums
    * them per term, so a term's document frequency is correct across
    * any number of appended batches without ever compacting. Batch doc
    * ids must be disjoint from the store's (same contract as
    * [[Clustering.appendIvfPartitioned]]). */
  def appendTextIndex(df: DataFrame, textCol: String, idCol: String,
      path: String): Unit = {
    val spark = df.sparkSession
    val st = spark.read.parquet(s"$path/stats").head()
    val buckets = st.getAs[Int]("buckets")
    val toks = Scans.spread(
        df.select(col(idCol).as("doc_id"), col(textCol).as("__ti")),
        col("doc_id"))
      .select(col("doc_id"),
        TextAnalysis.tokens(lower(col("__ti"))).as("__tk"))
      .withColumn("dl", size(col("__tk")).cast("long"))
    val postings = toks
      .select(col("doc_id"), col("dl"),
        explode_outer(col("__tk")).as("term"))
      .filter(col("term").isNotNull)
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bkt", termBucketCol(col("term"), buckets))
    // cluster by bucket before the partitioned append (one new file per
    // bucket per batch, not one per task per bucket — guide §6). The df
    // delta re-aggregates the batch subtree (batch-sized, cheap): unlike
    // buildTextIndex it must NOT read back the postings dir, which after
    // the append also holds every previous batch's rows.
    postings.repartition(col("bkt")).write.partitionBy("bkt")
      .mode("append").parquet(s"$path/postings")
    postings.groupBy(col("term"), col("bkt"))
      .agg(count(lit(1)).as("df"))
      .repartition(col("bkt")).write.partitionBy("bkt")
      .mode("append").parquet(s"$path/df")
    val batch = toks.agg(count(lit(1)).as("n"), sum(col("dl")).as("s"))
      .head()
    val statsOut = s"$path/stats"
    spark.createDataFrame(java.util.List.of(
      org.apache.spark.sql.Row(
        st.getAs[Long]("n_docs") + batch.getLong(0),
        st.getAs[Long]("sum_dl") + batch.getLong(1), buckets)),
      spark.read.parquet(statsOut).schema)
      .coalesce(1).write.mode("overwrite").parquet(statsOut)
  }

  /** Serve a BM25 query from a [[buildTextIndex]] store. Reads ONLY the
    * bucket partitions the query's terms hash to (plan-asserted
    * PartitionFilters) — probe cost scales with posting-list sizes, not
    * the corpus. Per-term tf columns pivot out of the postings and the
    * scoring arithmetic replays [[bm25ScoreAll]]'s pinned left-to-right
    * evaluation in query-term order with the SAME corpus statistics —
    * scores are bit-identical to scoring from raw text (spec-pinned),
    * so the index is a pure serving layout, not an approximation.
    * Output: (`idCol`, `score`), top `k`, score-desc with id
    * tie-break. */
  def probeTextIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, query: Seq[String], k: Int,
      idCol: String = "doc_id", k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "query must contain at least one term")
    val st = spark.read.parquet(s"$path/stats").head()
    val nD = st.getAs[Long]("n_docs").toDouble
    val avgdl = st.getAs[Long]("sum_dl").toDouble / nD
    val nBkt = st.getAs[Int]("buckets")
    val terms = query.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    val bkts = terms.map(termBucket(_, nBkt)).distinct
    val posts = spark.read.parquet(s"$path/postings")
      .filter(col("bkt").isin(bkts: _*) && col("term").isin(terms: _*))
    // SUM per term: df rows are additive across appended batches
    val dfts = spark.read.parquet(s"$path/df")
      .filter(col("bkt").isin(bkts: _*) && col("term").isin(terms: _*))
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
      .collect().map(r => r.getAs[String]("term") -> r.getAs[Long]("df"))
      .toMap
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, col("tf"))).as(s"__tf$i")
    }
    val pivoted = posts.groupBy(col("doc_id"), col("dl"))
      .agg(tfCols.head, tfCols.tail: _*)
    val score = terms.zipWithIndex.map { case (t, i) =>
      val tf = coalesce(col(s"__tf$i"), lit(0L)).cast("double")
      val dft = dfts.getOrElse(t, 0L).toDouble
      val idf = math.log(1.0 + (nD - dft + 0.5) / (dft + 0.5))
      lit(idf) * tf * (k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) +
          lit(b) * col("dl").cast("double") / lit(avgdl)))
    }.reduce(_ + _)
    pivoted.select(col("doc_id").as(idCol),
        Rounding.halfUp(score, 6).as("score"))
      .filter(col("score") > 0.0)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * merge any number of top-k rankings into one by
    * `rrf(d) = Σ_lists 1/(c + rank_list(d))` — THE standard hybrid-search
    * combiner (lexical BM25 + semantic ANN, or relevance + quality
    * prior), robust because it uses only ranks, never incomparable raw
    * scores. Each input must carry (`idCol`, `rn`) with `rn` assigned on
    * ROUNDED scores with an id tie-break, so ranks are engine-portable.
    * Output: top `k` of (`idCol`, `rrf` half-up 6, `n_lists`).
    *
    * Scale: inputs are top-k lists — bounded by construction — so the
    * union/group/sort all run on k·lists rows; fusing never touches the
    * corpus (the per-list retrieval already did). */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, c: Int = 60,
      k: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(c > 0 && k > 0, "c and k must be positive")
    val union = rankings.map(_.select(col(idCol), col("rn")))
      .reduce(_ unionByName _)
    union.groupBy(col(idCol))
      .agg(Rounding.halfUp(sum(lit(1.0) / (lit(c) + col("rn"))), 6).as("rrf"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf").desc, col(idCol).asc)
      .limit(k)
  }

  /** Rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010) of two
    * top-k rankings, truncated at depth `k`:
    *
    *   RBO@k = (1−p) Σ_{d=1..k} p^(d−1) · |A_1..d ∩ T_1..d| / d
    *
    * The ranking-similarity companion to [[rrfFuse]]: how much did the
    * list CHANGE between yesterday's index and today's, between the
    * lexical and semantic retrievers, between two scorer versions —
    * top-weighted (p controls how fast depth discounts), 1 = identical
    * prefixes, 0 = disjoint. Inputs carry (`idCol`, `rn`) like rrfFuse.
    * Everything runs on the bounded k-item lists (an item join + a k-row
    * depth explode); output one row (`rbo`, half-up 6).
    *
    * This is the truncated prefix sum — a lower bound of the
    * infinite-list RBO, the standard reported form for fixed-depth
    * lists. */
  def rankBiasedOverlap(a: DataFrame, b: DataFrame, idCol: String,
      p: Double = 0.9, k: Int = 20): DataFrame = {
    require(p > 0 && p < 1, "p must be in (0, 1)")
    require(k > 0, "k must be positive")
    val shared = a.select(col(idCol), col("rn").as("__ra"))
      .join(b.select(col(idCol), col("rn").as("__rb")), idCol)
      .select(greatest(col("__ra"), col("__rb")).as("__depth"))
    val depths = a.sparkSession.range(1, k + 1).select(col("id").as("__d"))
    val terms = depths.join(shared, col("__depth") <= col("__d"), "left")
      .groupBy(col("__d"))
      .agg(count(col("__depth")).as("__ov"))
      .select((lit(1.0 - p) * pow(lit(p), col("__d") - 1) *
        col("__ov").cast("double") / col("__d")).as("__t"))
    terms.agg(Rounding.halfUp(sum(col("__t")), 6).as("rbo"))
  }

  /** Per-document keyword extraction: the `k` highest tf·idf terms of
    * each document (idf = ln N/df over the corpus), ranked by the
    * ROUNDED weight (half-up 6) with the term string as tie-break — the
    * rank is thereby engine-portable (a raw float rank could flip on a
    * last-ulp `ln` difference between engines). Output: (`idCol`,
    * `term`, `weight`, `rk` ≤ k).
    *
    * Plan: one (id, term) hash aggregate with map-side combine (the
    * corpus-keyed exchange), the vocabulary-bounded df table joined back
    * on term, then a per-document window — keyed by the document id,
    * high cardinality, no skew. The WindowGroupLimit pushdown prunes to
    * the top k per document before the full sort materializes. */
  def topTfidfTerms(df: DataFrame, textCol: String, idCol: String,
      k: Int = 3): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    // Scans.spread (no-op at scale, r16): the tokenize kernel otherwise
    // runs on the local scan's single split (~0.8 s serial across this
    // query's 1-task jobs); the weight arithmetic is exact counts +
    // one rounded product, so results are partition-invariant
    val tf = Scans.spread(
        df.select(col(idCol), col(textCol).as("__ktx")), col(idCol))
      .select(col(idCol),
        explode_outer(TextAnalysis.tokens(lower(col("__ktx")))).as("term"))
      .filter(col("term").isNotNull)
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = df.select(count(lit(1)).cast("double").as("__n"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("weight").desc, col("term").asc)
    tf.join(dfreq, "term").crossJoin(broadcast(nDocs))
      .select(col(idCol), col("term"),
        Rounding.halfUp(col("tf") * log(col("__n") / col("df").cast("double")), 6)
          .as("weight"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }
}
