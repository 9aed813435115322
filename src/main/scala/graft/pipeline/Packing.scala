package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining batches.
  *
  * Production pretraining pipelines concatenate documents into one token
  * stream and cut it at fixed `seqLen` boundaries (documents may straddle a
  * cut; attention masks handle the seams). This operator computes, fully
  * declaratively, where each document lands in that stream: its shard, its
  * start offset, the sequence index `floor(start / seqLen)` it begins in,
  * and its offset inside that sequence.
  *
  * Scale design: the stream is sharded (`shard = id % shards`) and the
  * running offset is a window cumsum per shard — one hash-partitioned
  * shuffle, then each shard's prefix sum is an independent sorted task.
  * `shards` is the parallelism unit: at 100 TB pick shards ≫ executor
  * count (e.g. 4096) so no single shard's stream serializes the job.
  * Deterministic: ordering is (id) within shard, no RNG anywhere.
  */
object Packing {

  /** Per-document packed-stream coordinates. Output columns:
    * `shard`, `n_tokens`, `start_off`, `seq_id`, `seq_off` (+ the id). */
  def packDocs(
      df: DataFrame, idCol: String, textCol: String,
      seqLen: Int, shards: Int): DataFrame = {
    require(seqLen > 0 && shards > 0, "seqLen and shards must be positive")
    val id = col(idCol)
    val w = Window.partitionBy(col("shard")).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", pmod(id, lit(shards))) // pmod: negative ids stay in [0, shards)
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)).cast("long"))
      .withColumn("start_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_id", floor(col("start_off") / seqLen).cast("long"))
      .withColumn("seq_off", col("start_off") % seqLen)
  }

  /** Shard-level packing summary: total tokens and the number of full
    * `seqLen` sequences each shard's stream yields. */
  def shardStats(packed: DataFrame, seqLen: Int): DataFrame =
    packed.groupBy(col("shard"))
      .agg(count(lit(1)).alias("n_docs"),
        sum(col("n_tokens")).alias("total_tokens"))
      .withColumn("n_full_seqs", floor(col("total_tokens") / seqLen).cast("long"))

  /** Materialize the packed stream: one row per (`shard`, `seq_id`) with
    * the in-order `tokens` slice (a shard's last sequence may be short;
    * documents straddling a cut contribute to both neighbors).
    *
    * Plan: the packDocs cumsum (one shard shuffle), then tokens explode
    * with their global offset and reassemble by (shard, seq_id) — one
    * more shuffle on the compact key, sorted collect per sequence.
    * Offsets bucket with integer `div` (a 100 TB stream's offsets exceed
    * nothing — 25T tokens ≪ 2⁵³ — but div keeps the arithmetic exact on
    * principle and mirrors the SQL oracle). */
  def assembleSequences(
      df: DataFrame, idCol: String, textCol: String,
      seqLen: Int, shards: Int): DataFrame = {
    val packed = packDocs(df, idCol, textCol, seqLen, shards)
    packed.select(col("shard"), col("start_off"),
        posexplode_outer(TextAnalysis.tokens(col(textCol)))
          .as(Seq("__i", "__tok")))
      .filter(col("__tok").isNotNull)
      .select(col("shard"),
        (col("start_off") + col("__i")).alias("__off"), col("__tok"))
      .select(col("shard"), expr(s"__off div $seqLen").alias("seq_id"),
        (col("__off") % seqLen).alias("__o"), col("__tok"))
      .groupBy(col("shard"), col("seq_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("__o"), col("__tok")))),
        s => s.getField("__tok")).alias("tokens"))
  }
}
