package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed dense global rank — the scalable substitute for a
  * single-partition `row_number() OVER (ORDER BY …)`.
  *
  * Range-repartition on the sort keys, sort within partitions, then the
  * two-pass offset trick (per-partition counts → prefix offsets;
  * in-partition position from `monotonically_increasing_id`'s low 33
  * bits — the engine's NR machinery, PlanBuilder.withNr). Both passes
  * see identical content and order: the range sampler is deterministic
  * (seeded per partition) over deterministic input, and the in-partition
  * sort imposes a total order when `keys` end in a unique id. The counts
  * pass collects one long per partition — bounded driver state. */
object Ranks {

  /** `df` plus `rankCol` = 1-based position in the global ascending sort
    * order of `keys`. Include a unique tiebreaker as the last key — rank
    * assignment under genuinely tied keys would be partition-dependent. */
  def withGlobalRank(df: DataFrame, rankCol: String,
      keys: Column*): DataFrame = {
    require(keys.nonEmpty, "at least one sort key required")
    val sorted = df.repartitionByRange(keys: _*).sortWithinPartitions(keys: _*)
    val counts = sorted.groupBy(spark_partition_id().as("__p"))
      .agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val maxPid = counts.lastOption.map(_._1).getOrElse(0)
    val offsets = new Array[Long](maxPid + 1)
    var acc = 0L
    counts.foreach { case (pid, c) => offsets(pid) = acc; acc += c }
    val offsetCol = element_at(
      array(offsets.map(o => lit(o)).toIndexedSeq: _*),
      spark_partition_id() + 1)
    sorted.withColumn(rankCol,
      offsetCol + monotonically_increasing_id().bitwiseAND((1L << 33) - 1) + 1L)
  }
}
