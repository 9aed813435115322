package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-statistics language-model scoring for quality filtering.
  *
  * The CCNet recipe (Wenzek et al., "CCNet: Extracting High Quality
  * Monolingual Datasets from Web Crawl Data", LREC 2020) ranks documents
  * by perplexity under a small n-gram LM and keeps the low-perplexity
  * head. This is the in-corpus variant: train an add-α-smoothed bigram
  * model on the corpus itself and score every document by its mean bigram
  * log-probability
  *
  *   score(d) = mean over bigrams (w1,w2) of ln (c(w1 w2) + α) / (ctx(w1) + α·V)
  *
  * where c = corpus bigram count, ctx(w1) = Σ_w c(w1 w),
  * V = corpus unigram vocabulary size. Low scores flag documents whose
  * word transitions the corpus has never seen — gibberish, boilerplate,
  * wrong-language content.
  *
  * Plan shape at scale: counts are vocabulary-bounded tables built with
  * one explode + hash-aggregate each (map-side partial combine absorbs
  * the Zipf head, so hot n-grams like "of the" do NOT skew the shuffle —
  * each mapper emits one partial row per distinct n-gram). Scoring joins
  * the exploded corpus against the counts on the n-gram key; each
  * exploded row matches exactly one count row, AQE handles residual key
  * skew. V is a scalar (one count-distinct). No driver-side state: the
  * model "artifact" is a DataFrame, reusable across scoring runs.
  */
object LangModel {

  /** Corpus bigram counts: (`ngram`, `w1`, `cnt`). */
  def bigramCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.bigrams(col(textCol))).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("w1", split(col("ngram"), " ").getItem(0))

  /** Context totals ctx(w1) = Σ over bigrams starting with w1 — derived
    * from the (already vocabulary-sized) bigram table, not the corpus. */
  def contextCounts(bigrams: DataFrame): DataFrame =
    bigrams.groupBy(col("w1")).agg(sum(col("cnt")).as("ctx"))

  /** Mean smoothed bigram log-probability per document; columns
    * (`idCol`, `n_bigrams`, `lm_score`). Documents with fewer than two
    * tokens carry no transition evidence: n_bigrams = 0, lm_score = 0.0
    * (they pass through for the caller to filter on length instead). */
  def scoreDocs(
      df: DataFrame, textCol: String, idCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, "alpha must be positive (unsmoothed zero counts divide by zero)")
    val bg = bigramCounts(df, textCol)
    val ctx = contextCounts(bg)
    val vocab = df
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("__t"))
      .agg(countDistinct(col("__t")).as("__v"))
    val exploded = df.select(col(idCol),
      explode(TextAnalysis.bigrams(col(textCol))).as("ngram"))
    val scored = exploded
      .join(bg.select(col("ngram"), col("cnt"), col("w1")), Seq("ngram"))
      .join(ctx, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        log((col("cnt").cast("double") + alpha) /
          (col("ctx").cast("double") + lit(alpha) * col("__v").cast("double")))
          .as("__lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        Rounding.halfUp(avg(col("__lp")), 6).as("lm_score"))
    // short docs (no bigrams) re-enter with a zero score
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_score"), lit(0.0)).as("lm_score"))
  }

  /** CCNet's head/middle/tail split (Wenzek 2020 §4.4): equal-count
    * perplexity buckets per `byCol` group (their per-language split).
    * `ppl_bucket` 1 = head (highest mean log-probability = lowest
    * perplexity) … `buckets` = tail. Exact equal-rank tertiles via
    * `ntile` over (lm_score desc, id) — deterministic under ties and
    * replayable by a SQL oracle with integer-rank arithmetic (no
    * float-boundary comparisons).
    *
    * Scale note: exact equal-count buckets NEED a per-group global rank,
    * so this windows by `byCol` — a per-language sort, the one
    * irreducible exchange. CCNet's production shortcut (fixed cutoffs
    * from a sampled quantile, broadcast-compared) trades exactness for a
    * scan; compose [[Profiling.exactQuantiles]] + a broadcast join for
    * that variant. */
  def perplexityBuckets(df: DataFrame, textCol: String, idCol: String,
      byCol: String, buckets: Int = 3, alpha: Double = 0.5): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    import org.apache.spark.sql.expressions.Window
    val scored = scoreDocs(df, textCol, idCol, alpha)
    val tagged = scored.join(df.select(col(idCol), col(byCol)), Seq(idCol))
    val w = Window.partitionBy(col(byCol))
      .orderBy(col("lm_score").desc, col(idCol).asc)
    tagged.select(col(idCol), col(byCol), col("n_bigrams"), col("lm_score"),
      ntile(buckets).over(w).as("ppl_bucket"))
  }
}
