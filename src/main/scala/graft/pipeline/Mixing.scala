package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus mixing: per-source statistics and deterministic down-sampling
  * to hit target mixture weights under a token budget.
  *
  * Pretraining mixes weight sources (web, books, code, …) by token share,
  * not document count. `sourceStats` measures what the corpus actually
  * contains; `budgetRates` turns target weights + a token budget into
  * per-source keep-rates; the rates feed [[Sampling.stratifiedSample]],
  * whose md5-threshold filter keeps the realized sample deterministic
  * across reruns and engines.
  *
  * Scale: `sourceStats` is one hash-aggregate on the (low-cardinality)
  * source key with map-side combine; the share column comes from a 1-row
  * broadcast of the totals, not a window over the corpus. Rate planning
  * runs on the per-source summary — O(#sources) driver work, corpus
  * untouched. */
object Mixing {

  /** Per-source (`n_docs`, `n_tokens`, `token_share`), token_share
    * half-up-rounded to 6 digits for engine-portable comparison. */
  def sourceStats(df: DataFrame, textCol: String, sourceCol: String): DataFrame = {
    val per = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(textCol)).cast("long")).as("n_tokens"))
    val total = per.agg(sum(col("n_tokens")).as("__total"))
    per.crossJoin(broadcast(total))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"),
        Rounding.halfUp(
          col("n_tokens").cast("double") / col("__total").cast("double"), 6)
          .as("token_share"))
  }

  /** Keep-rates that realize `weights` (source → target share, need not
    * sum to 1; normalized here) within `tokenBudget` total tokens.
    * rate(s) = min(1, budget·w(s) / tokens(s)) — a source too small to
    * fill its slot caps at 1.0 (no upsampling; callers wanting epochs >1
    * handle repetition explicitly). Input is the `sourceStats` output,
    * already per-source — collecting it is O(#sources). */
  def budgetRates(
      stats: DataFrame, sourceCol: String,
      weights: Map[String, Double], tokenBudget: Long): Map[String, Double] = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    val wSum = weights.values.sum
    require(wSum > 0, "weights must have positive mass")
    stats.select(col(sourceCol).cast("string"), col("n_tokens").cast("long"))
      .collect()
      .map { r =>
        val (src, toks) = (r.getString(0), r.getLong(1))
        val w = weights.getOrElse(src, 0.0) / wSum
        src -> (if (toks <= 0L) 0.0
                else math.min(1.0, tokenBudget * w / toks.toDouble))
      }.toMap
  }

  /** One-call mixing: measure, plan, and deterministically sample to the
    * target mixture. Sources absent from `weights` get rate 0 (dropped). */
  def mixToBudget(
      df: DataFrame, textCol: String, idCol: String, sourceCol: String,
      weights: Map[String, Double], tokenBudget: Long): DataFrame = {
    val rates = budgetRates(
      sourceStats(df, textCol, sourceCol), sourceCol, weights, tokenBudget)
    Sampling.stratifiedSample(df, idCol, sourceCol, rates, defaultRate = 0.0)
  }
}
