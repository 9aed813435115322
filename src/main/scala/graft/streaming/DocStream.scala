package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.TextAnalysis

/** Streaming training-data ingest: the batch pipeline's cleaning stages
  * applied to a document stream (doc_id, ts, text, …).
  *
  * Stages (all per-row codegen'd column expressions except the dedup
  * state):
  *   1. exact near-dup suppression — first-wins on the normalized content
  *      fingerprint, state bounded by the watermark
  *      (dropDuplicatesWithinWatermark: a fingerprint's state ages out
  *      once older than the watermark, so the store never grows with the
  *      stream);
  *   2. quality gate — [[TextAnalysis.qualityScore]] threshold;
  *   3. PII scrubbing — [[TextAnalysis.scrubPii]] rewrite.
  *
  * The same call runs identically on a batch DataFrame (dedup falls back
  * to plain dropDuplicates) — one definition for backfill and ingest,
  * which is what keeps the two paths from drifting. State is partitioned
  * by fingerprint key across executors; nothing is driver-bound. */
object DocStream {

  def ingest(
      docs: DataFrame,
      textCol: String = "text",
      tsCol: String = "ts",
      watermark: String = "1 hour",
      minQuality: Double = 0.3): DataFrame = {
    val fingerprinted = docs
      .withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
    EventStream.dedupStream(fingerprinted, Seq("__fp"), watermark, tsCol)
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .filter(col("quality") >= minQuality)
      .withColumn(textCol, TextAnalysis.scrubPii(col(textCol)))
      .drop("__fp")
  }
}
