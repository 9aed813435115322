package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.pipeline.{Classify, Clustering, Dedup, TextAnalysis}

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

  /** Streaming model-based quality gate: score every arriving document
    * under a batch-fitted [[Classify.LinearTextModel]] and keep rows
    * whose score clears `minScore`. Stream-safe BY CONSTRUCTION: the
    * scoring kernel is a stateless per-row expression (no window, no
    * aggregate, no join — the model rides into codegen as a `double[]`),
    * so the plan is a pure projection+filter that Structured Streaming
    * accepts in append mode with no watermark, and the batch and stream
    * scoring paths are ONE function ([[Classify.withScore]]) that cannot
    * drift. Output: input columns + `n_feats`, `score`, `pred`. */
  def scoreStream(
      docs: DataFrame,
      model: Classify.LinearTextModel,
      textCol: String = "text",
      minScore: Double = 0.0): DataFrame =
    Classify.withScore(docs, textCol, model)
      .filter(col("score") >= minScore)

  /** Streaming NEAR-dup detection against a standing [[Dedup.MinhashIndex]]:
    * every micro-batch runs the batch [[Dedup.minhashProbe]] verbatim —
    * batch docs are sketched map-side, band hashes join the STATIC
    * postings (the corpus is never re-sketched), candidates verify by
    * exact Jaccard — and the matches go to `sink`.
    *
    * foreachBatch is the deliberate integration: per-batch semantics
    * need no cross-batch streaming state (the standing index IS the
    * state, maintained by the batch pipeline), and reusing the batch
    * operator keeps the ingest and backfill paths from drifting — the
    * same property [[ingest]] pins for the cleaning stages. The sink
    * callback receives (matches, batchId); production would append to
    * the quarantine table and fold confirmed dups into the index.
    *
    * `checkpoint`, when set, makes the query RESTARTABLE: offsets commit
    * there after each micro-batch, so a stopped (or killed) query
    * resumed from the same checkpoint replays only uncommitted batches —
    * committed ones are never re-delivered to `sink`, in-flight ones are
    * retried with the SAME batchId (foreachBatch's at-least-once
    * contract; an idempotent-by-batchId sink makes it exactly-once). */
  def probeStream(
      index: Dedup.MinhashIndex,
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      jaccardThreshold: Double = 0.7,
      checkpoint: Option[String] = None)
      (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val w = docs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        sink(Dedup.minhashProbe(index, batch.toDF(), textCol, idCol,
          jaccardThreshold), batchId)
      }
    checkpoint.foreach(w.option("checkpointLocation", _))
    w.start()
  }

  /** Streaming ANN-index maintenance: every micro-batch of embedding
    * rows is stamped with its coarse IVF cell and PQ code by the SAME
    * batch operator ([[Clustering.buildIvfPq]] — map-side, per-row,
    * no cross-batch state) against models fitted ONCE by the batch
    * pipeline (typically via [[Clustering.readKMeansModel]] /
    * [[Clustering.readPQModel]]). The sink appends the encoded rows to
    * the standing IVF-PQ corpus — ingest keeps the index searchable
    * without ever refitting or touching the existing corpus, and the
    * batch/stream encode paths cannot drift because they are one
    * function. */
  def encodeStream(
      embeddings: DataFrame,
      coarse: Clustering.KMeansModel,
      pq: Clustering.PQModel,
      vecCol: String = "embedding",
      checkpoint: Option[String] = None)
      (sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val w = embeddings.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        sink(Clustering.buildIvfPq(batch.toDF(), vecCol, coarse, pq), batchId)
      }
    checkpoint.foreach(w.option("checkpointLocation", _))
    w.start()
  }
}
