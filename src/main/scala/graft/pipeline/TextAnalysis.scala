package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  * All pure Catalyst column expressions — codegen'd, no UDFs, scan-parallel
  * (no shuffle at all for the per-document measures).
  */
object TextAnalysis {

  /** Whitespace tokenization (the baseline used across the pipeline ops). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count approximation: words + punctuation clusters +
    * digit runs counted separately (regex-only, deterministic). */
  def subwordCount(text: Column): Column =
    size(split(trim(text), "(?=[^A-Za-z0-9])|\\s+"))

  /** Quality score in [0,1]:
    * 0.4·min(1, tokens/100) + 0.3·(distinct/total) + 0.3·min(1, avgLen/8).
    * Length, diversity and word-size signals — the shape of the
    * length/punct/stopword-ratio heuristics used in open-data pipelines. */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val distinctRatio = size(array_distinct(toks)).cast("double") / n
    val avgLen = (length(regexp_replace(trim(text), "\\s+", "")).cast("double")) / n
    val raw = lit(0.4) * least(lit(1.0), n / 100.0) +
      lit(0.3) * distinctRatio +
      lit(0.3) * least(lit(1.0), avgLen / 8.0)
    // floor-based half-up rounding: identical across engines regardless of
    // their round() tie-break mode (the formula lands on exact .5
    // boundaries often since its terms are terminating decimals)
    floor(raw * 1e6 + 0.5) / 1e6
  }

  /** Language-marker stopword sets (tiny, deterministic n-gram heuristic).
    * Kept SQL-expressible so the duckdb oracle can replicate scoring. */
  val Markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "la", "de", "los", "que"),
    "de" -> Seq("der", "die", "und", "das", "ist"))

  /** Marker-count per language; argmax wins, 'und' (undetermined) if no
    * marker hits. Ties break by language-code order (deterministic). */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scores = Markers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      (lang, ms.map(m => when(array_contains(toks, m), 1).otherwise(0))
        .reduce(_ + _))
    }
    // argmax via fold over (bestLang, bestScore)
    scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bl, bs), (lang, s)) =>
        (when(s > bs, lit(lang)).otherwise(bl), greatest(s, bs))
    } match {
      case (bestLang, bestScore) =>
        when(bestScore > 0, bestLang).otherwise(lit("und"))
    }
  }

  /** Document fingerprint: md5 of case/whitespace-normalized text.
    * (The SQL-oracle-comparable half of fingerprinting; see
    * Dedup.simhash for the rolling/bitwise variant.) */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Token-set key: md5 over the sorted distinct token list — a
    * normalization key for near-dup grouping that survives token
    * reordering and repetition. */
  def tokenSetKey(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(lower(text)))), " "))

  /** Convenience: annotate a document DataFrame with all measures. */
  def annotate(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("lang_pred", langId(col(textCol)))
      .withColumn("fp", fingerprint(col(textCol)))
}
