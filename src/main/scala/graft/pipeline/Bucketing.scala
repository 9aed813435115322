package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-shuffled) tables for co-located joins — the standing
  * answer to "this join shuffles 100 TB every night". Writing both sides
  * bucketed by the join key with the same bucket count moves the shuffle
  * to WRITE time, once; every subsequent join on that key plans with NO
  * exchange on either side (SortMergeJoin over bucket-aligned scans —
  * asserted in BucketingSpec).
  *
  * Bucketing is a table-catalog feature: tables are written with
  * `saveAsTable` into the session catalog (works with the default
  * in-memory catalog; no Hive needed).
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally sorted) parquet table.
    * Sorting within buckets additionally removes the join-time sort. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, sorted: Boolean = true): Unit = {
    var w = df.write.format("parquet").mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
    if (sorted) w = w.sortBy(bucketCol)
    w.saveAsTable(table)
  }

  /** Join two tables bucketed on their join keys. When both sides have
    * the same bucket count, Catalyst plans the join without any exchange
    * (bucket-aligned scans). This is ordinary `join` — the method exists
    * to document and test the contract, not to add machinery. */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String,
      joinType: String = "inner"): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey), joinType)
  }
}
