package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (Xie et al., NeurIPS 2023):
  * pick raw-corpus documents whose n-gram distribution looks like a
  * small TARGET domain sample, by (1) fitting two bag-of-hashed-ngram
  * unigram models — one on the target sample, one on the raw corpus —
  * (2) scoring every raw document with its log-likelihood ratio
  *
  *   iw(d) = Σ over feature occurrences f∈d of  ln p_t(f) − ln p_r(f)
  *
  * and (3) resampling without replacement with Gumbel-top-k on iw.
  *
  * Features are unigrams + bigrams hashed into `buckets` cells (the
  * paper's hashing trick): the model is `buckets` counts per side no
  * matter how large the corpus, so the ratio table stays broadcast-sized
  * at 100 TB where a raw vocabulary would not. Probabilities are
  * add-α-smoothed over the bucket space:
  * p_S(f) = (cnt_S(f) + α) / (N_S + α·B).
  *
  * Determinism is engine-portable end to end: the feature hash is the
  * md5-prefix trick shared with [[Sampling]] (same text, same bucket, on
  * any engine with md5), and the resample draws its Gumbel noise from
  * the md5 of the document id, so the DuckDB oracle replays the
  * identical arithmetic.
  *
  * Plan shape at scale: both count tables are one explode +
  * hash-aggregate with map-side partial combine (each mapper emits at
  * most B partial rows, so the Zipf head never skews the shuffle), then
  * collapse into a driver-side log-ratio LUT of exactly B doubles —
  * bounded driver state, like a PQ codebook. Scoring is a SECOND plain
  * scan with a native per-row kernel (`graft_dsir_score`: walk the
  * doc's n-gram array, md5-bucket, accumulate lut[bucket]) — zero
  * shuffle, zero join, never a corpus self-join; the resample is a
  * map-side key + TakeOrderedAndProject. Two text scans total, and the
  * only shuffle anywhere is the B-bounded counts aggregate.
  */
object Dsir {

  /** 32-bit md5-prefix of a feature string, as a numeric column. */
  private def hash32(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** The n-gram array of one document: unigrams ++ bigrams of the
    * lower-cased, whitespace-split text. ONE definition feeds both the
    * exploded counts pass and the per-row scoring kernel, so their
    * tokenizations cannot drift. */
  private def grams(textCol: String): org.apache.spark.sql.Column =
    concat(TextAnalysis.tokens(lower(col(textCol))),
      TextAnalysis.bigrams(col(textCol)))

  /** Per-document feature stream: [[grams]] hashed into `buckets`. */
  private def features(df: DataFrame, textCol: String, idCol: String,
      buckets: Int): DataFrame =
    df.select(col(idCol), explode_outer(grams(textCol)).as("__g"))
      .filter(col("__g").isNotNull)
      .select(col(idCol), (hash32(col("__g")) % buckets).as("f"))

  /** Importance weight per raw document: (`idCol`, `n_feats`, `iw`).
    * Documents whose text yields no features (empty after trim) pass
    * through with n_feats = 0, iw = 0.0. `target` is the small domain
    * sample — thousands of documents next to a 100 TB raw corpus.
    *
    * The two count tables are BOUNDED at `buckets` rows (one explode +
    * hash-aggregate each, map-side combine), collected once and folded
    * into a driver-side log-ratio LUT (the PQ codebook pattern —
    * O(buckets) driver state). Scoring then needs NO second explode:
    * a native per-row kernel (`graft_dsir_score`) walks each document's
    * n-gram array once, md5-buckets each gram and accumulates
    * `lut[bucket]` — zero shuffle, zero join, plain corpus scan.
    * (Round-8 lesson: featurizing raw separately for counts and for
    * scoring paid the explode+md5 pass — the single dominant CPU
    * cost — twice per query; under driver-machine CPU contention that
    * doubled pass showed up as a 39–64× bench blowup. An intermediate
    * (id, f, cnt)-histogram rewrite measured SLOWER on a quiet machine:
    * the corpus-keyed groupBy(id, f) shuffle + rematerialization cost
    * more than the explode it saved. The kernel keeps one explode for
    * the bounded counts and makes the second pass shuffle-free.) */
  def importanceWeights(raw: DataFrame, target: DataFrame, textCol: String,
      idCol: String, buckets: Int = 8192, alpha: Double = 0.5): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(alpha > 0, "alpha must be positive (zero counts divide by zero)")
    // the count tables are deterministic bounded model fits (B longs per
    // side — the DSIR unigram models), so they ride the same
    // fit-once-serve-many memo as the k-means/PQ/NB fits (FitMemo):
    // re-deriving weights over an UNCHANGED corpus (q_dsir_weights,
    // q_dsir_sample, repeated pipeline runs) pays the two count scans
    // once per session instead of once per query construction
    def bucketCounts(df: DataFrame): Array[Long] =
      FitMemo.cached(df, Seq(textCol), ("dsir_counts", buckets)) {
        val out = Array.fill[Long](buckets)(0L)
        features(df, textCol, idCol, buckets)
          .groupBy(col("f")).agg(count(lit(1)).as("cnt"))
          .collect() // ≤ buckets rows — map-side combine bounds the shuffle
          .foreach(r => out(r.getLong(0).toInt) = r.getLong(1))
        out
      }
    val cntR = bucketCounts(raw)
    val cntT = bucketCounts(target)
    val nR = cntR.sum.toDouble
    val nT = cntT.sum.toDouble
    val aB = alpha * buckets
    val lut = Array.tabulate(buckets)(i =>
      math.log((cntT(i) + alpha) / (nT + aB)) -
        math.log((cntR(i) + alpha) / (nR + aB)))
    // Scans.spread before the scoring kernel (no-op at scale): the
    // md5-per-gram scoring pass otherwise runs serially on a
    // single-split local input
    Scans.spread(raw, col(idCol)).select(col(idCol),
      org.apache.spark.sql.graft.sketch
        .dsir_score(grams(textCol), lut, buckets).as("__s"))
      .select(col(idCol),
        coalesce(col("__s.n_feats"), lit(0L)).as("n_feats"),
        Rounding.halfUp(coalesce(col("__s.iw"), lit(0.0)), 6).as("iw"))
  }

  /** Gumbel-top-k resample without replacement: key = iw + g where the
    * Gumbel draw g = −ln(−ln u) takes its uniform from the md5 of the
    * document id — deterministic (same id, same fate), stable under
    * repartitioning, and replayable by the oracle. Selection probability
    * is proportional to exp(iw) (Gumbel-max), i.e. DSIR's importance
    * resampling, without ever exponentiating a large iw. Output: input
    * columns + `sample_key` (half-up 6), key-descending. */
  def resample(weighted: DataFrame, idCol: String, iwCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (hash32(col(idCol).cast("string")).cast("double") + 0.5) /
      4294967296.0
    // guard caller-supplied weights: a null/NaN iw row would otherwise
    // outrank every real key in the desc sort (NaN sorts greatest)
    weighted.filter(col(iwCol).isNotNull && !isnan(col(iwCol)))
      .withColumn("__key", col(iwCol) - log(-log(u)))
      .orderBy(col("__key").desc, col(idCol).asc)
      .limit(k)
      .withColumn("sample_key", Rounding.halfUp(col("__key"), 6))
      .drop("__key")
  }
}
