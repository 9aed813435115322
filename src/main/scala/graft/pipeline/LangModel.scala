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
    // Scans.spread before the bigram kernel (no-op at scale and when the
    // caller already spread the input)
    Scans.spread(df, col(textCol))
      .select(explode_outer(TextAnalysis.bigrams(col(textCol))).as("ngram"))
      .filter(col("ngram").isNotNull)
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
    // one spread barrier shared by all three corpus consumers (counts,
    // vocabulary, scoring explode) — ReusedExchange serves them from one
    // materialization; no-op at scale
    val sprd = Scans.spread(df, col(idCol))
    val bg = bigramCounts(sprd, textCol)
    val ctx = contextCounts(bg)
    val vocab = sprd
      .select(explode_outer(TextAnalysis.tokens(lower(col(textCol)))).as("__t"))
      .filter(col("__t").isNotNull)
      .agg(countDistinct(col("__t")).as("__v"))
    val exploded = sprd.select(col(idCol),
        explode_outer(TextAnalysis.bigrams(col(textCol))).as("ngram"))
      .filter(col("ngram").isNotNull)
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

  /** Word trigrams "w1 w2 w3" of the lowercased whitespace-split text
    * (empty below three tokens). Nested zip_with like
    * [[TextAnalysis.bigrams]] — array args evaluate once per row. */
  private[pipeline] def trigrams(text: Column): Column = {
    val toks = TextAnalysis.tokens(lower(text))
    val n = size(toks)
    when(n < 3, array().cast("array<string>"))
      .otherwise(zip_with(
        zip_with(slice(toks, lit(1), n - 2), slice(toks, lit(2), n - 2),
          (a, b) => concat_ws(" ", a, b)),
        slice(toks, lit(3), n - 2),
        (ab, c) => concat_ws(" ", ab, c)))
  }

  /** Trigram LM with stupid backoff (Brants et al., "Large Language
    * Models in Machine Translation", EMNLP 2007 §4) scored against a
    * separate REFERENCE corpus — per trigram position:
    *
    *   ln c(w123)/c(w12)                     if the reference saw w123
    *   ln λ·c(w23)/c(w2)                     else if it saw w23
    *   ln λ²·(c(w3)+α)/(N+α·V)               else (smoothed unigram floor
    *                                          — unseen words stay finite)
    *
    * Unlike [[scoreDocs]]' in-corpus bigram model, the reference split
    * makes the backoff path REAL: documents outside `ref` contain
    * transitions the reference never saw. Columns: (`idCol`,
    * `n_trigrams`, `bo_score` = mean ln-prob, half-up 6; docs under
    * three tokens score 0 with n_trigrams 0).
    *
    * Plan shape: all count tables are vocabulary-bounded hash aggregates
    * of the REFERENCE (map-side combine absorbs the Zipf head); scoring
    * joins the exploded doc positions against those bounded tables on
    * n-gram keys. N and V are one scalar row, broadcast. */
  def scoreDocsBackoff(df: DataFrame, ref: DataFrame, textCol: String,
      idCol: String, lambda: Double = 0.4,
      alpha: Double = 0.5): DataFrame = {
    require(lambda > 0 && lambda <= 1, "lambda must be in (0, 1]")
    require(alpha > 0, "alpha must be positive")
    val refS = Scans.spread(ref, col(textCol))
    val tri = refS.select(explode_outer(trigrams(col(textCol))).as("g3"))
      .filter(col("g3").isNotNull)
      .groupBy("g3").agg(count(lit(1)).as("c3"))
    val bi = refS.select(explode_outer(TextAnalysis.bigrams(col(textCol))).as("g2"))
      .filter(col("g2").isNotNull)
      .groupBy("g2").agg(count(lit(1)).as("c2"))
    val uni = refS
      .select(explode_outer(TextAnalysis.tokens(lower(col(textCol)))).as("g1"))
      .filter(col("g1").isNotNull)
      .groupBy("g1").agg(count(lit(1)).as("c1"))
    val scalars = refS
      .select(explode_outer(TextAnalysis.tokens(lower(col(textCol)))).as("__t"))
      .filter(col("__t").isNotNull)
      .agg(count(lit(1)).as("__n"), countDistinct(col("__t")).as("__v"))
    val pos = df.select(col(idCol),
        explode_outer(trigrams(col(textCol))).as("g3"))
      .filter(col("g3").isNotNull)
      .withColumn("__p", split(col("g3"), " "))
      .withColumn("w12", concat_ws(" ",
        col("__p").getItem(0), col("__p").getItem(1)))
      .withColumn("w23", concat_ws(" ",
        col("__p").getItem(1), col("__p").getItem(2)))
      .withColumn("w2", col("__p").getItem(1))
      .withColumn("w3", col("__p").getItem(2))
    val joined = pos
      .join(tri, Seq("g3"), "left")
      .join(bi.select(col("g2").as("w12"), col("c2").as("c12")),
        Seq("w12"), "left")
      .join(bi.select(col("g2").as("w23"), col("c2").as("c23")),
        Seq("w23"), "left")
      .join(uni.select(col("g1").as("w2"), col("c1").as("cu2")),
        Seq("w2"), "left")
      .join(uni.select(col("g1").as("w3"), col("c1").as("cu3")),
        Seq("w3"), "left")
      .crossJoin(broadcast(scalars))
    val lp =
      when(col("c3").isNotNull,
        log(col("c3").cast("double") / col("c12").cast("double")))
      .when(col("c23").isNotNull,
        log(lit(lambda) * col("c23").cast("double") /
          col("cu2").cast("double")))
      .otherwise(
        log(lit(lambda * lambda) *
          (coalesce(col("cu3"), lit(0L)).cast("double") + alpha) /
          (col("__n").cast("double") + lit(alpha) * col("__v").cast("double"))))
    val scored = joined.select(col(idCol), lp.as("__lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"),
        Rounding.halfUp(avg(col("__lp")), 6).as("bo_score"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("bo_score"), lit(0.0)).as("bo_score"))
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
