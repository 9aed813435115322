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

  /** Temperature-scaled mixture plan (the XLM-R/mT5 multinomial
    * sampling rule, Conneau 2020 §3.1): target share q(s) ∝ p(s)^alpha
    * where p(s) is the corpus's own token share. alpha = 1 reproduces
    * the natural mix; alpha → 0 flattens toward uniform, upweighting
    * tail sources at the head's expense. Returns one row per source:
    * (`sourceCol`, n_tokens, `q_weight`, `keep_rate`) with
    * rate(s) = min(1, budget·q(s)/tokens(s)) — no upsampling, as in
    * [[budgetRates]]. Input is the [[sourceStats]] output; both scalar
    * normalizers (total tokens, Σ p^alpha) ride 1-row broadcasts, so the
    * plan never windows or collects the summary. */
  def temperaturePlan(stats: DataFrame, sourceCol: String, alpha: Double,
      tokenBudget: Long): DataFrame = {
    require(alpha > 0, "alpha must be positive (0 would weight empty sources)")
    require(tokenBudget > 0, "tokenBudget must be positive")
    val tot = stats.agg(sum(col("n_tokens")).as("__tot"))
    val p = stats.crossJoin(broadcast(tot))
      .withColumn("__pa",
        pow(col("n_tokens").cast("double") / col("__tot").cast("double"), alpha))
    val qsum = p.agg(sum(col("__pa")).as("__qsum"))
    p.crossJoin(broadcast(qsum))
      .select(col(sourceCol), col("n_tokens"),
        Rounding.halfUp(col("__pa") / col("__qsum"), 6).as("q_weight"),
        Rounding.halfUp(
          least(lit(1.0), lit(tokenBudget.toDouble) *
            (col("__pa") / col("__qsum")) / col("n_tokens").cast("double")), 6)
          .as("keep_rate"))
  }

  /** Temperature weights as a map for [[budgetRates]] composition —
    * unnormalized p(s)^alpha (budgetRates normalizes). O(#sources). */
  def temperatureWeights(stats: DataFrame, sourceCol: String,
      alpha: Double): Map[String, Double] = {
    require(alpha > 0, "alpha must be positive")
    val rows = stats.select(col(sourceCol).cast("string"),
      col("n_tokens").cast("long")).collect()
    val total = rows.map(_.getLong(1)).sum.toDouble.max(1.0)
    rows.map(r =>
      r.getString(0) -> math.pow(r.getLong(1) / total, alpha)).toMap
  }

  /** One-call temperature mixing: measure, temperature-plan, and
    * deterministically sample. */
  def mixToTemperature(
      df: DataFrame, textCol: String, idCol: String, sourceCol: String,
      alpha: Double, tokenBudget: Long): DataFrame = {
    val stats = sourceStats(df, textCol, sourceCol)
    val rates = budgetRates(stats, sourceCol,
      temperatureWeights(stats, sourceCol, alpha), tokenBudget)
    Sampling.stratifiedSample(df, idCol, sourceCol, rates, defaultRate = 0.0)
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

  /** Data-constrained mixing WITH REPETITION (Muennighoff et al. 2023,
    * "Scaling Data-Constrained Language Models"): [[mixToBudget]] can
    * only downsample — when a source's slot (budget·weight) EXCEEDS its
    * token count, the realized mix silently under-delivers that source.
    * Here an undersized source repeats: up to `maxEpochs` full passes
    * (the paper finds repeated data near-free to ~4 epochs and decaying
    * after — the cap keeps plans honest) plus one deterministic
    * md5-sampled partial epoch; oversized sources downsample exactly
    * like mixToBudget (partial epoch of epoch 0). Output = input rows
    * with an `epoch` column (0-based; a doc appears once per planned
    * epoch) — feed to packing/shuffling downstream.
    *
    * Plan: the stats aggregate is bounded, the plan is #sources
    * driver arithmetic, and application is ONE map-side explode of a
    * per-source epoch sequence + the stratified md5 filter on the
    * final partial epoch — no shuffle, deterministic under
    * repartitioning, same doc set on every engine. */
  def repeatToBudget(
      df: DataFrame, textCol: String, idCol: String, sourceCol: String,
      weights: Map[String, Double], tokenBudget: Long,
      maxEpochs: Int = 4): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(tokenBudget > 0, "tokenBudget must be positive")
    require(maxEpochs >= 1, "maxEpochs must be >= 1")
    val wSum = weights.values.sum
    require(wSum > 0, "weights must have positive mass")
    val stats = sourceStats(df, textCol, sourceCol)
      .select(col(sourceCol), col("n_tokens")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // per source: full epochs + the partial-epoch keep rate
    val plan: Map[String, (Int, Double)] = weights.flatMap {
      case (s, w) =>
        stats.get(s).filter(_ > 0).map { tok =>
          val target = tokenBudget.toDouble * (w / wSum)
          val ratio = target / tok
          val full = math.min(maxEpochs.toDouble, math.floor(ratio)).toInt
          val frac = if (full >= maxEpochs) 0.0
            else math.min(1.0, ratio - full)
          s -> ((full, frac))
        }
    }
    // epochs column: sequence(0, n_epochs-1); the LAST epoch of a
    // source with frac > 0 is partial (md5-gated), earlier ones full
    val nEpochs = plan.foldLeft(when(lit(false), lit(0))) {
      case (acc, (s, (full, frac))) =>
        acc.when(col(sourceCol) === s, lit(full + (if (frac > 0) 1 else 0)))
    }.otherwise(lit(0))
    val fullEpochs = plan.foldLeft(when(lit(false), lit(0))) {
      case (acc, (s, (full, _))) => acc.when(col(sourceCol) === s, lit(full))
    }.otherwise(lit(0))
    val fracThreshold = plan.foldLeft(when(lit(false), lit(""))) {
      case (acc, (s, (_, frac))) =>
        acc.when(col(sourceCol) === s, lit(Sampling.hexThreshold(frac)))
    }.otherwise(lit(Sampling.hexThreshold(0.0)))
    df.filter(nEpochs > 0)
      .withColumn("epoch",
        explode(sequence(lit(0), nEpochs - 1)))
      .filter(col("epoch") < fullEpochs ||
        substring(md5(col(idCol).cast("string")), 1, 8) < fracThreshold)
  }

  /** Pareto coverage of the source mix: sources ranked by token volume
    * with cumulative share and the 80%-head flag (`in_head_80` — the
    * cumulative share BEFORE this source is < 0.8, i.e. the minimal
    * prefix that covers 80% of tokens). The concentration detail view
    * behind [[concentrationReport]]'s single number. Windows over the
    * SOURCE table — bounded by source cardinality, never the corpus;
    * the cumulative sum accumulates in rank order on both the engine
    * and any SQL replay, so the rounded shares are portable. */
  def paretoReport(df: DataFrame, textCol: String,
      sourceCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stats = sourceStats(df, textCol, sourceCol)
    val tot = stats.agg(sum(col("n_tokens")).cast("double").as("__t"))
    val w = Window.orderBy(col("n_tokens").desc, col(sourceCol).asc)
    stats.crossJoin(broadcast(tot))
      .withColumn("__share", col("n_tokens").cast("double") / col("__t"))
      .withColumn("rank", row_number().over(w))
      .withColumn("__cum", sum(col("__share")).over(w))
      .select(col(sourceCol), col("n_tokens"), col("rank"),
        Rounding.halfUp(col("__cum"), 6).as("cum_share"),
        (col("__cum") - col("__share") < 0.8).as("in_head_80"))
  }

  /** Mixture-concentration health of a corpus: the Herfindahl–Hirschman
    * index over token shares (HHI = Σ share², 1/n = perfectly even,
    * 1 = one source is everything), the effective source count 1/HHI,
    * and the top source with its share — the one-row answer to "is this
    * mix actually diverse or is it one crawl wearing twenty names".
    * All reductions on the [[sourceStats]]-sized table; tie on the top
    * share breaks by source name. */
  def concentrationReport(df: DataFrame, textCol: String,
      sourceCol: String): DataFrame = {
    val stats = sourceStats(df, textCol, sourceCol)
    val tot = stats.agg(sum(col("n_tokens")).cast("double").as("__t"))
    val shares = stats.crossJoin(broadcast(tot))
      .select(col(sourceCol),
        (col("n_tokens").cast("double") / col("__t")).as("__s"))
    val hhiAgg = shares.agg(count(lit(1)).as("n_sources"),
      sum(col("__s") * col("__s")).as("__hhi"))
    // winner by exact share equality (shares are one exact long/long
    // division — equality is engine-safe); name tie-break via min
    val mx = shares.agg(max(col("__s")).as("__mx"))
    val top = shares.crossJoin(broadcast(mx))
      .filter(col("__s") === col("__mx"))
      .agg(min(col(sourceCol)).as("top_source"), max(col("__s")).as("__ts"))
    hhiAgg.crossJoin(top).select(col("n_sources"),
      Rounding.halfUp(col("__hhi"), 6).as("hhi"),
      Rounding.halfUp(lit(1.0) / col("__hhi"), 6).as("effective_sources"),
      col("top_source"), Rounding.halfUp(col("__ts"), 6).as("top_share"))
  }
}
